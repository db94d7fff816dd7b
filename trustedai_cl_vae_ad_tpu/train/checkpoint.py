"""Log-directory checkpoint ABI.

The reference's de-facto checkpoint format is a log directory containing
``encoder/`` + ``decoder/`` Keras SavedModels plus ``config.yml``
(train.py:127-128, abstract_cvae.py:95-106, load_model.py:74-83). We preserve
the directory layout — ``<log_dir>/encoder``, ``<log_dir>/decoder``,
``<log_dir>/config.yml`` — but the weight payloads are Orbax checkpoints
(TPU-native, sharding-aware), and we additionally persist optimizer state
under ``<log_dir>/optimizer`` (the reference never checkpoints Adam moments —
SURVEY.md section 5.4 — which breaks continual-learning resume; fixed here).

Crash atomicity (round layout)
------------------------------
Overwriting ``encoder/``/``decoder/``/``optimizer/`` in place is NOT
crash-safe: orbax's ``force=True`` rmtrees the existing directory before
writing the replacement, and the three subtrees would commit independently —
a SIGKILL/OOM landing mid-save could destroy the only copy, or leave a torn
logdir (encoder from round N, decoder from N−1) that restores without error.
Saves therefore stage every round in a sibling directory and commit it with
single atomic renames:

    <log_dir>/rounds/.tmp-00000007/   # staging: orbax writes land here
    <log_dir>/rounds/00000007/        # os.rename(.tmp-N, N): round durable
    <log_dir>/current -> rounds/00000007        # atomic symlink swap
    <log_dir>/encoder -> current/encoder        # stable ABI symlinks,
    <log_dir>/decoder -> current/decoder        # created once (legacy
    <log_dir>/optimizer -> current/optimizer    # in-place dirs upgraded)

No code path ever deletes the newest complete round: a kill at ANY point
leaves either the previous round (staging/commit unfinished) or the new one
(pointer swapped) fully intact and mutually consistent across all three
subtrees. The last TWO complete rounds are kept (one rollback step); older
rounds and stale ``.tmp-*`` staging dirs from crashed saves are swept at the
next save. ``restore_checkpoint`` follows ``current`` when it points at a
complete round and otherwise falls back to the newest complete round, and
still reads pre-round ("legacy") logdirs whose subtrees are real in-place
directories.
"""

from __future__ import annotations

import os
import shutil
import time
import warnings
from typing import Any, NamedTuple, Optional, Tuple

import orbax.checkpoint as ocp

ROUNDS_SUBDIR = "rounds"
CURRENT_LINK = "current"
_TMP_PREFIX = ".tmp-"
_SUBTREES = ("encoder", "decoder", "optimizer")


def _checkpointer() -> ocp.StandardCheckpointer:
    return ocp.StandardCheckpointer()


def _test_pause(point: str) -> None:
    """Crash-injection hook for the kill-during-save tests (no-op unless
    TCVAE_CKPT_TEST_PAUSE is set, e.g. "before_commit:10"). Prints a marker
    and sleeps so the test harness can SIGKILL deterministically inside a
    specific save/commit window."""
    spec = os.environ.get("TCVAE_CKPT_TEST_PAUSE")
    if not spec:
        return
    for part in spec.split(","):
        name, _, secs = part.partition(":")
        if name.strip() == point:
            print(f"CKPT-PAUSE:{point}", flush=True)
            time.sleep(float(secs or 5.0))


def _round_name(n: int) -> str:
    return f"{n:08d}"


def _complete_rounds(rounds_path: str) -> list:
    """Sorted [(n, name)] of committed (atomically renamed) rounds."""
    out = []
    try:
        names = os.listdir(rounds_path)
    except OSError:
        return out
    for name in names:
        if name.startswith(_TMP_PREFIX):
            continue
        try:
            out.append((int(name), name))
        except ValueError:
            continue
    out.sort()
    return out


def _atomic_symlink(target: str, link_path: str) -> None:
    """Replace ``link_path`` with a symlink to ``target`` atomically
    (symlink at a temp name + os.replace — readers never see a missing or
    half-written link)."""
    tmp = link_path + ".swp"
    if os.path.lexists(tmp):
        os.remove(tmp)
    os.symlink(target, tmp)
    os.replace(tmp, link_path)


def _stage_round(log_dir: str) -> Tuple[str, int]:
    """Allocate the next round number and its staging dir path.

    Primary-only filesystem work (mkdir + sweeping stale ``.tmp-*`` staging
    left by crashed/failed saves — nothing can be in flight here: sync saves
    are serial and AsyncSaver drains the previous round before staging a new
    one). On multi-host runs the round number is broadcast so every process
    stages into the same path (orbax coordinates the write internally).
    """
    import jax

    log_dir = os.path.abspath(log_dir)
    rounds_path = os.path.join(log_dir, ROUNDS_SUBDIR)
    n = 1
    if jax.process_index() == 0:
        os.makedirs(rounds_path, exist_ok=True)
        for name in os.listdir(rounds_path):
            if name.startswith(_TMP_PREFIX):
                shutil.rmtree(os.path.join(rounds_path, name), ignore_errors=True)
        rounds = _complete_rounds(rounds_path)
        if rounds:
            n = rounds[-1][0] + 1
    if jax.process_count() > 1:
        import numpy as np
        from jax.experimental import multihost_utils

        n = int(multihost_utils.broadcast_one_to_all(np.asarray(n, np.int32)))
    return os.path.join(rounds_path, _TMP_PREFIX + _round_name(n)), n


def _commit_round(log_dir: str, tmp_path: str, n: int) -> None:
    """Atomically publish a fully-written staging dir as round ``n``.

    Three ordered steps, each individually atomic, so a kill between any two
    leaves a consistent logdir: (1) rename staging -> round (the round is now
    durable); (2) swap the ``current`` symlink (restore now prefers it);
    (3) housekeeping — stable ABI symlinks (upgrading legacy in-place dirs,
    which are only removed now that a complete round supersedes them) and
    garbage collection of all but the last two rounds.
    """
    log_dir = os.path.abspath(log_dir)
    rounds_path = os.path.dirname(tmp_path)
    name = _round_name(n)
    os.rename(tmp_path, os.path.join(rounds_path, name))
    _test_pause("mid_commit")
    cur = os.path.join(log_dir, CURRENT_LINK)
    if os.path.isdir(cur) and not os.path.islink(cur):
        # a symlink-following copy (cp/rsync/copytree without symlink
        # preservation) materializes 'current' as a real directory; the new
        # round is already durable, so replacing the artifact is safe
        shutil.rmtree(cur)
    _atomic_symlink(os.path.join(ROUNDS_SUBDIR, name), cur)
    _test_pause("after_pointer")
    for sub in _SUBTREES:
        p = os.path.join(log_dir, sub)
        if os.path.islink(p):
            continue
        if os.path.isdir(p):
            shutil.rmtree(p)  # legacy in-place subtree, superseded by the round
        _atomic_symlink(os.path.join(CURRENT_LINK, sub), p)
    # retention: each round is a full checkpoint copy (~11 GB at flagship
    # scale with moments), so disk-constrained deploys can drop the rollback
    # copy with TCVAE_CKPT_KEEP_ROUNDS=1 — crash safety is unaffected (old
    # rounds are only deleted AFTER the new one is durable and pointed at)
    keep = max(1, int(os.environ.get("TCVAE_CKPT_KEEP_ROUNDS", "2")))
    for rn, rname in _complete_rounds(rounds_path)[:-keep]:
        shutil.rmtree(os.path.join(rounds_path, rname), ignore_errors=True)


def resolve_round_dir(log_dir: str) -> str:
    """Directory holding the subtrees to restore: the round ``current``
    points at when that round is complete, else the newest complete round,
    else ``log_dir`` itself (legacy in-place layout)."""
    log_dir = os.path.abspath(log_dir)
    rounds_path = os.path.join(log_dir, ROUNDS_SUBDIR)
    rounds = _complete_rounds(rounds_path)
    if not rounds:
        return log_dir
    names = {rname for _, rname in rounds}
    cur = os.path.join(log_dir, CURRENT_LINK)
    if os.path.islink(cur):
        tname = os.path.basename(os.readlink(cur).rstrip("/"))
        if tname in names:
            return os.path.join(rounds_path, tname)
    return os.path.join(rounds_path, rounds[-1][1])


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
    """Write one crash-atomic checkpoint round into log_dir (see module
    docstring): stage encoder/ decoder/ (+ optimizer/) under rounds/.tmp-N,
    then commit with atomic renames. A kill at any point preserves the
    previous complete round."""
    import jax

    log_dir = os.path.abspath(log_dir)
    os.makedirs(log_dir, exist_ok=True)
    tmp_path, n = _stage_round(log_dir)
    ck = _checkpointer()
    ck.save(os.path.join(tmp_path, "encoder"), params["encoder"], force=True)
    _test_pause("between_subtrees")
    ck.save(os.path.join(tmp_path, "decoder"), params["decoder"], force=True)
    if opt_state is not None:
        ck.save(os.path.join(tmp_path, "optimizer"), opt_state, force=True)
    ck.wait_until_finished()
    _test_pause("before_commit")
    if jax.process_index() == 0:
        _commit_round(log_dir, tmp_path, n)


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
    the three writes overlap each other. At most one save round is in
    flight: ``save()`` first waits out (and commits) the previous round.
    Rounds use the same staging + atomic-commit layout as the sync path —
    the commit happens inside ``wait()``, only after every subtree's
    background write landed. Commit callbacks (the train_state.json sidecar)
    run only after the commit: the sidecar must never record progress the
    weights don't durably have. If ANY subtree's background write failed,
    the round never commits, its callbacks are dropped (a later round or the
    final sync save rewrites a consistent pair), and the first error
    re-raises; the orphaned staging dir is swept by the next save.

    Single-process only: the multi-host save path gathers + coordinates
    through orbax's cross-process barriers, which we keep on the validated
    synchronous path (callers fall back; see VAEModel.save_model).
    """

    def __init__(self):
        self._cks: dict = {}
        self._pending_callbacks: list = []
        self._pending_commit: Optional[Tuple[str, str, int]] = None

    def _ck(self, name: str) -> "ocp.AsyncCheckpointer":
        if name not in self._cks:
            self._cks[name] = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
        return self._cks[name]

    def save(self, log_dir: str, params: dict, opt_state: Any = None) -> None:
        """Start a background checkpoint write; returns after the D2H copy."""
        self.wait()  # one round in flight; also commits the previous round
        log_dir = os.path.abspath(log_dir)
        os.makedirs(log_dir, exist_ok=True)
        tmp_path, n = _stage_round(log_dir)
        trees = {"encoder": params["encoder"], "decoder": params["decoder"]}
        if opt_state is not None:
            trees["optimizer"] = opt_state
        for name, tree in trees.items():
            path = os.path.join(tmp_path, name)
            self._ck(name).save(path, args=ocp.args.StandardSave(tree), force=True)
        self._pending_commit = (log_dir, tmp_path, n)

    def add_commit_callback(self, cb) -> None:
        """Run ``cb`` once the in-flight round has fully landed on disk."""
        self._pending_callbacks.append(cb)

    def wait(self) -> None:
        """Block until the in-flight round (if any) lands, commit it, then
        run its callbacks. On a failed background write the round is
        abandoned (no commit, callbacks dropped) and the first error raises
        — after draining every checkpointer so no writer thread is left
        running against the staging dir."""
        callbacks, self._pending_callbacks = self._pending_callbacks, []
        commit, self._pending_commit = self._pending_commit, None
        errs = []
        for ck in self._cks.values():
            try:
                ck.wait_until_finished()
            except Exception as e:  # noqa: BLE001 — collect, drain the rest
                errs.append(e)
        if errs:
            raise errs[0]
        if commit is not None:
            _commit_round(*commit)
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
    (abstract_cvae.py:95-103). Reads the newest complete round (see module
    docstring) and falls back to the legacy in-place layout.
    """
    assert os.path.exists(log_dir)
    assert os.path.isdir(log_dir)
    base = resolve_round_dir(log_dir)
    enc_path = os.path.abspath(os.path.join(base, "encoder"))
    dec_path = os.path.abspath(os.path.join(base, "decoder"))
    assert os.path.exists(enc_path), f"missing encoder checkpoint: {enc_path}"
    assert os.path.exists(dec_path), f"missing decoder checkpoint: {dec_path}"
    ck = _checkpointer()
    params = {
        "encoder": ck.restore(enc_path, params_like["encoder"]),
        "decoder": ck.restore(dec_path, params_like["decoder"]),
    }
    opt_state = None
    opt_path = os.path.abspath(os.path.join(base, "optimizer"))
    if opt_state_like is not None and os.path.exists(opt_path):
        opt_state = _restore_optimizer_with_fallback(ck, opt_path, opt_state_like)
    return params, opt_state
