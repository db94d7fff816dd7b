"""Compat shim: the reference ships an EMPTY src/utils.py; kept so
``import src.utils`` resolves for reference users."""
