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
import warnings
from typing import Any, NamedTuple, Optional, Tuple

import orbax.checkpoint as ocp


def _checkpointer() -> ocp.StandardCheckpointer:
    return ocp.StandardCheckpointer()


def _is_structure_mismatch(err: Exception) -> bool:
    """True when an orbax restore failed because the checkpoint's pytree
    structure differs from the target (the only failure it is safe to paper
    over with a fresh optimizer). Transient I/O errors or corrupt payloads
    must propagate — silently zeroing 1.3B Adam moments on a *compatible*
    checkpoint because a read flaked would degrade the resumed run."""
    msg = str(err).lower()
    # Bare "mismatch" would also match corrupt-payload errors ("checksum
    # mismatch", "CRC-32C mismatch" from tensorstore) — exactly the class
    # that must propagate. Reject those outright, then require the
    # structure-specific phrasings orbax emits ("Tree structures do not
    # match: treedef: Source: MISSING", "... does not match the current ...").
    if "checksum" in msg or "crc" in msg:
        return False
    return any(
        marker in msg
        for marker in (
            "source: missing",
            "destination: missing",
            "structures do not match",
            "not match the current",
            "structure mismatch",
        )
    )


class _LegacyAdamFp8State(NamedTuple):
    """Pre-round-3 ``AdamFp8State`` layout: a 4th ``treedef`` field (always
    None) that later builds dropped. Only used as a restore target for old
    optimizer checkpoints."""

    count: Any
    mu: Any
    nu: Any
    treedef: Any


def _restore_optimizer_with_fallback(ck, opt_path: str, opt_state_like: Any) -> Optional[Any]:
    """Restore optimizer state, tolerating the legacy adam_fp8 layout.

    Optimizer checkpoints written before AdamFp8State dropped its ``treedef``
    field fail orbax structure matching against the current 3-field state
    ("treedef: Source: MISSING"). Retry those with a treedef-augmented target
    and strip the stale field; any other STRUCTURE mismatch warns and returns
    None so the caller resumes with a freshly initialized optimizer instead
    of crashing ``train.py --resume``. Non-structure failures (I/O errors,
    corrupt payloads) re-raise: the checkpoint may be perfectly compatible.
    """
    import jax

    try:
        return ck.restore(opt_path, opt_state_like)
    except Exception as err:  # noqa: BLE001 — orbax raises bare ValueError
        if not _is_structure_mismatch(err):
            raise
        first_err = err

    try:
        from trustedai_cl_vae_ad_tpu.ops.adam8 import AdamFp8State

        def _is_fp8(n):
            return isinstance(n, AdamFp8State)

        def _is_legacy(n):
            return isinstance(n, _LegacyAdamFp8State)

        legacy_like = jax.tree_util.tree_map(
            lambda n: _LegacyAdamFp8State(n.count, n.mu, n.nu, None) if _is_fp8(n) else n,
            opt_state_like,
            is_leaf=_is_fp8,
        )
        has_fp8 = any(
            _is_fp8(n)
            for n in jax.tree_util.tree_leaves(opt_state_like, is_leaf=_is_fp8)
        )
        if has_fp8:
            restored = ck.restore(opt_path, legacy_like)
            return jax.tree_util.tree_map(
                lambda n: AdamFp8State(n.count, n.mu, n.nu) if _is_legacy(n) else n,
                restored,
                is_leaf=_is_legacy,
            )
    except Exception as retry_err:  # noqa: BLE001 — orbax raises bare ValueError
        # Only a structure mismatch on the legacy target too means the
        # checkpoint genuinely doesn't fit either layout -> fresh optimizer.
        # A transient I/O error during the retry must propagate: the legacy
        # checkpoint may be perfectly restorable on the next attempt.
        if not _is_structure_mismatch(retry_err):
            raise

    warnings.warn(
        f"optimizer checkpoint at {opt_path} does not match the current "
        f"optimizer state structure ({first_err}); resuming with a fresh "
        "optimizer (params are restored; Adam moments restart from zero)",
        stacklevel=3,
    )
    return None


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


class AsyncSaver:
    """Non-blocking checkpoint writes (``training.async_checkpoint``).

    The periodic mid-run saves (``training.checkpoint_every_epochs``) block
    training for the full disk write of params + Adam moments — ~8 GB at
    flagship scale. orbax's ``AsyncCheckpointer`` performs the device->host
    copy in the BLOCKING portion of ``save()`` and only the file write on a
    background thread, so the step after a save may DONATE the very buffers
    being checkpointed (verified empirically: buffers ``.delete()``d the
    moment ``save()`` returned restore bit-correct — the donation pattern of
    our train step). Training therefore resumes after the D2H copy instead
    of after the disk write.

    One ``AsyncCheckpointer`` per subtree (encoder/decoder/optimizer) lets
    the three writes overlap each other as well. At most one save round is
    in flight: ``save()`` first waits out the previous round. Commit
    callbacks (the train_state.json sidecar) run only once every subtree of
    that round has durably landed — the sidecar must never record progress
    the weights don't have (same invariant as the sync path).

    Single-process only: the multi-host save path gathers + coordinates
    through orbax's cross-process barriers, which we keep on the validated
    synchronous path (callers fall back; see VAEModel.save_model).
    """

    def __init__(self):
        self._cks: dict = {}
        self._pending_callbacks: list = []

    def _ck(self, name: str) -> "ocp.AsyncCheckpointer":
        if name not in self._cks:
            self._cks[name] = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
        return self._cks[name]

    def save(self, log_dir: str, params: dict, opt_state: Any = None) -> None:
        """Start a background checkpoint write; returns after the D2H copy."""
        self.wait()  # one round in flight; also commits the previous round
        os.makedirs(log_dir, exist_ok=True)
        trees = {"encoder": params["encoder"], "decoder": params["decoder"]}
        if opt_state is not None:
            trees["optimizer"] = opt_state
        for name, tree in trees.items():
            path = os.path.abspath(os.path.join(log_dir, name))
            self._ck(name).save(path, args=ocp.args.StandardSave(tree), force=True)

    def add_commit_callback(self, cb) -> None:
        """Run ``cb`` once the in-flight round has fully landed on disk."""
        self._pending_callbacks.append(cb)

    def wait(self) -> None:
        """Block until the in-flight round (if any) lands; run its callbacks."""
        for ck in self._cks.values():
            ck.wait_until_finished()
        callbacks, self._pending_callbacks = self._pending_callbacks, []
        for cb in callbacks:
            cb()

    def close(self) -> None:
        self.wait()
        for ck in self._cks.values():
            ck.close()
        self._cks = {}


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
        opt_state = _restore_optimizer_with_fallback(ck, opt_path, opt_state_like)
    return params, opt_state
