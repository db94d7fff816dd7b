"""Log-directory checkpoint ABI.

The reference's de-facto checkpoint format is a log directory containing
``encoder/`` + ``decoder/`` Keras SavedModels plus ``config.yml``
(train.py:127-128, abstract_cvae.py:95-106, load_model.py:74-83). We preserve
the directory layout — ``<log_dir>/encoder``, ``<log_dir>/decoder``,
``<log_dir>/config.yml`` — but the weight payloads are Orbax checkpoints
(TPU-native, sharding-aware), and we additionally persist optimizer state
under ``<log_dir>/optimizer`` (the reference never checkpoints Adam moments —
SURVEY.md section 5.4 — which breaks continual-learning resume; fixed here).
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import orbax.checkpoint as ocp


def _checkpointer() -> ocp.StandardCheckpointer:
    return ocp.StandardCheckpointer()


def save_checkpoint(log_dir: str, params: dict, opt_state: Any = None) -> None:
    """Write encoder/ decoder/ (+ optimizer/) checkpoints into log_dir."""
    os.makedirs(log_dir, exist_ok=True)
    ck = _checkpointer()
    enc_path = os.path.abspath(os.path.join(log_dir, "encoder"))
    dec_path = os.path.abspath(os.path.join(log_dir, "decoder"))
    ck.save(enc_path, params["encoder"], force=True)
    ck.save(dec_path, params["decoder"], force=True)
    if opt_state is not None:
        opt_path = os.path.abspath(os.path.join(log_dir, "optimizer"))
        ck.save(opt_path, opt_state, force=True)
    ck.wait_until_finished()


def restore_checkpoint(
    log_dir: str, params_like: dict, opt_state_like: Any = None
) -> Tuple[dict, Optional[Any]]:
    """Restore params (and optimizer state if both present and requested).

    ``params_like`` / ``opt_state_like`` provide the pytree structure
    (abstract shapes), as produced by ``AbstractCVAE.init`` /
    ``optimizer.init``. Mirrors the reference's load path assertions
    (abstract_cvae.py:95-103).
    """
    assert os.path.exists(log_dir)
    assert os.path.isdir(log_dir)
    enc_path = os.path.abspath(os.path.join(log_dir, "encoder"))
    dec_path = os.path.abspath(os.path.join(log_dir, "decoder"))
    assert os.path.exists(enc_path), f"missing encoder checkpoint: {enc_path}"
    assert os.path.exists(dec_path), f"missing decoder checkpoint: {dec_path}"
    ck = _checkpointer()
    params = {
        "encoder": ck.restore(enc_path, params_like["encoder"]),
        "decoder": ck.restore(dec_path, params_like["decoder"]),
    }
    opt_state = None
    opt_path = os.path.abspath(os.path.join(log_dir, "optimizer"))
    if opt_state_like is not None and os.path.exists(opt_path):
        opt_state = ck.restore(opt_path, opt_state_like)
    return params, opt_state
