"""Drop-in import compatibility with the reference repo's flat `src/` package.

Reference users write ``from src.load_model import load_model_from_directory``
etc.; these shims re-export the TPU-native implementations under the same
module paths so existing scripts and notebooks keep working unchanged.
"""
