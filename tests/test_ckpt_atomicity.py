"""Crash-atomic checkpoint rounds (train/checkpoint.py round layout).

The reference overwrites its SavedModels in place (train.py:127-128) — a
kill mid-save corrupts the only copy. Our save path stages each round under
``rounds/.tmp-N`` and commits with atomic renames, so a SIGKILL at ANY point
(the exact scenario periodic checkpoints exist for: OOM killer, preemption)
must leave a restorable logdir whose encoder/decoder/optimizer all come from
the SAME round. The kill sweep drives a real subprocess through injected
crash windows (TCVAE_CKPT_TEST_PAUSE) and SIGKILLs it inside each."""

import os
import select
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
VICTIM = os.path.join(REPO, "tests", "ckpt_kill_victim.py")


def _tree(v):
    return {"encoder": {"w": np.full((8, 8), v, np.float32)},
            "decoder": {"w": np.full((8, 8), v, np.float32)}}


def _opt(v):
    return {"count": np.full((), int(v), np.int32),
            "mu": np.full((8, 8), v, np.float32)}


def _restore(d):
    from trustedai_cl_vae_ad_tpu.train.checkpoint import restore_checkpoint

    params, opt = restore_checkpoint(d, _tree(0.0), opt_state_like=_opt(0.0))
    return params, opt


def test_round_layout_symlinks_and_gc(tmp_path):
    """Saves create complete rounds; the ABI paths become stable symlinks;
    only the last two rounds are kept; restore reads the newest."""
    from trustedai_cl_vae_ad_tpu.train.checkpoint import (
        ROUNDS_SUBDIR, save_checkpoint)

    d = str(tmp_path / "log")
    for v in (1.0, 2.0, 3.0):
        save_checkpoint(d, _tree(v), opt_state=_opt(v))
    rounds = sorted(n for n in os.listdir(os.path.join(d, ROUNDS_SUBDIR))
                    if not n.startswith("."))
    assert rounds == ["00000002", "00000003"]  # GC keeps the last two
    for sub in ("encoder", "decoder", "optimizer"):
        p = os.path.join(d, sub)
        assert os.path.islink(p) and os.path.isdir(p)  # ABI path resolves
    assert os.path.islink(os.path.join(d, "current"))
    params, opt = _restore(d)
    assert float(np.asarray(params["encoder"]["w"])[0, 0]) == 3.0
    assert float(np.asarray(opt["mu"])[0, 0]) == 3.0


def test_keep_rounds_knob(tmp_path, monkeypatch):
    """TCVAE_CKPT_KEEP_ROUNDS=1 (disk-constrained deploys): only the newest
    round survives each commit; restore still works and crash windows still
    never delete the only copy (deletion is post-commit)."""
    from trustedai_cl_vae_ad_tpu.train.checkpoint import (
        ROUNDS_SUBDIR, save_checkpoint)

    monkeypatch.setenv("TCVAE_CKPT_KEEP_ROUNDS", "1")
    d = str(tmp_path / "log")
    for v in (1.0, 2.0, 3.0):
        save_checkpoint(d, _tree(v), opt_state=_opt(v))
    rounds = sorted(n for n in os.listdir(os.path.join(d, ROUNDS_SUBDIR))
                    if not n.startswith("."))
    assert rounds == ["00000003"]
    params, _ = _restore(d)
    assert float(np.asarray(params["encoder"]["w"])[0, 0]) == 3.0


def test_legacy_inplace_logdir_restores_and_upgrades(tmp_path):
    """Pre-round logdirs (real encoder/ decoder/ optimizer/ dirs in place,
    as every earlier build and the TF importer wrote) still restore; the
    first new save upgrades them to the round layout without any window
    where neither copy exists."""
    import orbax.checkpoint as ocp

    from trustedai_cl_vae_ad_tpu.train.checkpoint import save_checkpoint

    d = str(tmp_path / "legacy")
    ck = ocp.StandardCheckpointer()
    legacy = _tree(7.0)
    ck.save(os.path.join(d, "encoder"), legacy["encoder"])
    ck.save(os.path.join(d, "decoder"), legacy["decoder"])
    ck.save(os.path.join(d, "optimizer"), _opt(7.0))
    ck.wait_until_finished()

    params, opt = _restore(d)
    assert float(np.asarray(params["decoder"]["w"])[0, 0]) == 7.0
    assert float(np.asarray(opt["mu"])[0, 0]) == 7.0

    save_checkpoint(d, _tree(8.0), opt_state=_opt(8.0))
    assert os.path.islink(os.path.join(d, "encoder"))  # upgraded
    params, opt = _restore(d)
    assert float(np.asarray(params["encoder"]["w"])[0, 0]) == 8.0


def test_symlink_following_copy_still_saves(tmp_path):
    """A logdir copied WITHOUT symlink preservation (cp -r / rsync without
    -l / shutil.copytree default) materializes current/ and the ABI paths as
    real directories — restore and further saves must still work."""
    import shutil

    from trustedai_cl_vae_ad_tpu.train.checkpoint import save_checkpoint

    src = str(tmp_path / "src")
    save_checkpoint(src, _tree(1.0), opt_state=_opt(1.0))
    dst = str(tmp_path / "copy")
    shutil.copytree(src, dst)  # follows symlinks: current/ becomes a real dir
    params, _ = _restore(dst)
    assert float(np.asarray(params["encoder"]["w"])[0, 0]) == 1.0
    save_checkpoint(dst, _tree(2.0), opt_state=_opt(2.0))
    params, opt = _restore(dst)
    assert float(np.asarray(params["encoder"]["w"])[0, 0]) == 2.0
    assert os.path.islink(os.path.join(dst, "current"))


# Expected surviving round per crash window: the pointer swap is the commit
# point — anything killed before it restores round 1, after it round 2.
_KILL_POINTS = [
    ("between_subtrees", 1.0),  # encoder of round 2 staged, decoder not
    ("before_commit", 1.0),     # round 2 fully staged, not yet renamed
    ("mid_commit", 1.0),        # round 2 durable, pointer still at round 1
    ("after_pointer", 2.0),     # pointer at round 2, housekeeping unfinished
]


@pytest.mark.parametrize("point,expected", _KILL_POINTS, ids=[p for p, _ in _KILL_POINTS])
def test_sigkill_during_save_restores_consistent_round(tmp_path, point, expected):
    d = str(tmp_path / "log")
    proc = subprocess.Popen(
        [sys.executable, VICTIM, d, point],
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    try:
        deadline = time.time() + 120
        saw_round1 = False
        buf = ""
        while time.time() < deadline:
            r, _, _ = select.select([proc.stdout], [], [], 1.0)
            if not r:
                if proc.poll() is not None:
                    pytest.fail(f"victim exited before pause marker:\n{buf}")
                continue
            line = proc.stdout.readline()
            if not line:
                pytest.fail(f"victim EOF before pause marker:\n{buf}")
            buf += line
            if "ROUND1-DONE" in line:
                saw_round1 = True
            if f"CKPT-PAUSE:{point}" in line:
                break
        else:
            pytest.fail(f"timed out waiting for pause marker:\n{buf}")
        assert saw_round1
        os.kill(proc.pid, signal.SIGKILL)  # the OOM-killer scenario
        proc.wait(timeout=30)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait(timeout=30)

    # the logdir must restore, and ALL THREE subtrees must come from the
    # same round — a torn mix (encoder N, decoder N-1) restores without
    # error in the old in-place layout, which is exactly the bug class
    params, opt = _restore(d)
    enc = float(np.asarray(params["encoder"]["w"])[0, 0])
    dec = float(np.asarray(params["decoder"]["w"])[0, 0])
    mu = float(np.asarray(opt["mu"])[0, 0])
    assert enc == dec == mu == expected, (point, enc, dec, mu)

    # the logdir stays writable: the next save sweeps any stale staging and
    # commits a fresh round on top
    from trustedai_cl_vae_ad_tpu.train.checkpoint import save_checkpoint

    save_checkpoint(d, _tree(3.0), opt_state=_opt(3.0))
    params, opt = _restore(d)
    assert float(np.asarray(params["encoder"]["w"])[0, 0]) == 3.0


def test_sigkill_during_async_background_write(tmp_path):
    """AsyncSaver: a kill while the background write is in flight must leave
    round 1 as the restore point — an uncommitted round (wait() never ran)
    is never selected, whether or not its bytes finished landing."""
    d = str(tmp_path / "log")
    proc = subprocess.Popen(
        [sys.executable, VICTIM, d, "async_inflight"],
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    try:
        deadline = time.time() + 120
        buf = ""
        while time.time() < deadline:
            r, _, _ = select.select([proc.stdout], [], [], 1.0)
            if not r:
                if proc.poll() is not None:
                    pytest.fail(f"victim exited early:\n{buf}")
                continue
            line = proc.stdout.readline()
            buf += line
            if "ASYNC-STARTED" in line:
                break
        else:
            pytest.fail(f"timed out:\n{buf}")
        os.kill(proc.pid, signal.SIGKILL)
        proc.wait(timeout=30)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait(timeout=30)
    params, opt = _restore(d)
    assert float(np.asarray(params["encoder"]["w"])[0, 0]) == 1.0
    assert float(np.asarray(params["decoder"]["w"])[0, 0]) == 1.0
    assert float(np.asarray(opt["mu"])[0, 0]) == 1.0


def test_doctor_reports_round_state(tmp_path):
    """validate_logdir on a rounds-layout dir: reports layout/round info,
    warns (never errors) on stale staging and a lagging 'current' pointer."""
    import shutil

    from trustedai_cl_vae_ad_tpu.config import save_config
    from trustedai_cl_vae_ad_tpu.registry import load_model_from_config
    from trustedai_cl_vae_ad_tpu.train.checkpoint import ROUNDS_SUBDIR

    sys.path.insert(0, os.path.join(REPO, "tools"))
    try:
        from validate_logdir import validate_logdir
    finally:
        sys.path.pop(0)

    config = {
        "data": {"image_size": [16, 16, 3]},
        "loss": {"kurtosis": 1.8, "w_kl_divergence": 0.0, "w_kurtosis": 1e-4,
                 "w_mse": 1.0, "w_skew": 0.0, "w_z_l1_reg": 0.0},
        "model": {"type": "KurtosisSingle", "decoder_dense_filters": 4,
                  "latent_dimensions": 8, "layers": [4]},
        "training": {"batch_size": 8, "beta": 1e-6, "learning_rate": 1e-3,
                     "max_epochs": 1},
    }
    d = tmp_path / "log"
    d.mkdir()
    save_config(config, str(d / "config.yml"))
    model = load_model_from_config(config)
    model.save_model(str(d))
    model.save_model(str(d))

    report = validate_logdir(str(d))
    assert not report["errors"], report
    assert report["info"]["layout"] == "rounds"
    assert report["info"]["rounds_complete"] == 2
    assert report["info"]["round_selected"] == "00000002"

    # stale staging (a killed save) -> warning, not error
    os.makedirs(d / ROUNDS_SUBDIR / ".tmp-00000003")
    report = validate_logdir(str(d))
    assert not report["errors"]
    assert any("interrupted save round" in w for w in report["warnings"])

    # pointer lagging the newest complete round (kill between commit and
    # swap) -> warning; restore still resolves the pointer's round
    cur = d / "current"
    cur.unlink()
    os.symlink(os.path.join(ROUNDS_SUBDIR, "00000001"), cur)
    report = validate_logdir(str(d))
    assert not report["errors"]
    assert any("pointer" in w for w in report["warnings"])
    assert report["info"]["round_selected"] == "00000001"
    shutil.rmtree(d / ROUNDS_SUBDIR / ".tmp-00000003")


def test_quantized_sidecar_replace_is_crash_safe(tmp_path):
    """quantized/ replacement never rmtrees the only copy: a kill between
    the two commit renames leaves either a complete staging dir or the
    displaced previous copy, and the loaders heal both states."""
    import os
    import shutil

    import jax.numpy as jnp

    from trustedai_cl_vae_ad_tpu.ops.quant import (
        PROVENANCE_FILE, QUANTIZED_SUBDIR, has_quantized_checkpoint,
        load_quantized_checkpoint, save_quantized_checkpoint)

    d = str(tmp_path / "log")
    os.makedirs(d)
    q1 = {"scale": jnp.full((4,), 1.0, jnp.float32)}
    save_quantized_checkpoint(d, q1)
    qdir = os.path.join(d, QUANTIZED_SUBDIR)

    # window 1: killed after renaming the old copy aside, before promoting
    # staging — simulate by reconstructing that exact state
    q2 = {"scale": jnp.full((4,), 2.0, jnp.float32)}
    save_quantized_checkpoint(d, q2)
    shutil.move(qdir, qdir + ".staging")  # complete staging (has provenance)
    assert os.path.isfile(os.path.join(qdir + ".staging", PROVENANCE_FILE))
    assert has_quantized_checkpoint(d)  # heals: staging promoted
    assert float(np.asarray(load_quantized_checkpoint(d)["scale"])[0]) == 2.0

    # window 2: killed with only the displaced previous copy present
    shutil.move(qdir, qdir + ".old")
    assert has_quantized_checkpoint(d)  # heals: old restored
    assert float(np.asarray(load_quantized_checkpoint(d)["scale"])[0]) == 2.0

    # an INCOMPLETE staging dir (no provenance: orbax payload landed but the
    # stamp didn't) must lose to the displaced old copy
    save_quantized_checkpoint(d, {"scale": jnp.full((4,), 3.0, jnp.float32)})
    shutil.move(qdir, qdir + ".old")
    os.makedirs(qdir + ".staging")
    assert has_quantized_checkpoint(d)
    assert float(np.asarray(load_quantized_checkpoint(d)["scale"])[0]) == 3.0


def test_failed_async_round_never_commits_and_drops_sidecar(tmp_path, monkeypatch):
    """ADVICE r4 (medium): a failed background write must drop that round's
    sidecar callbacks — a later wait()/close() must not fire them — and the
    round must never commit; the next save still works (fresh staging)."""
    import jax.numpy as jnp

    from trustedai_cl_vae_ad_tpu.train.checkpoint import AsyncSaver

    d = str(tmp_path / "log")
    saver = AsyncSaver()
    commits = []
    try:
        p1 = {"encoder": {"w": jnp.zeros((8, 8))}, "decoder": {"w": jnp.zeros((8, 8))}}
        saver.save(d, p1)
        saver.add_commit_callback(lambda: commits.append(1))
        saver.wait()
        assert commits == [1]

        p2 = {"encoder": {"w": jnp.ones((8, 8))}, "decoder": {"w": jnp.ones((8, 8))}}
        saver.save(d, p2)
        saver.add_commit_callback(lambda: commits.append(2))
        # inject a background-write failure on one subtree
        monkeypatch.setattr(
            saver._cks["decoder"], "wait_until_finished",
            lambda: (_ for _ in ()).throw(OSError("disk full")))
        with pytest.raises(OSError, match="disk full"):
            saver.wait()
        monkeypatch.undo()
        # the failed round's callback is gone for good; round 1 still the
        # newest complete round
        saver.wait()
        assert commits == [1]
        params, _ = _restore(d)
        assert float(np.asarray(params["encoder"]["w"])[0, 0]) == 0.0

        p3 = {"encoder": {"w": jnp.full((8, 8), 3.0)},
              "decoder": {"w": jnp.full((8, 8), 3.0)}}
        saver.save(d, p3)
        saver.add_commit_callback(lambda: commits.append(3))
        saver.wait()
        assert commits == [1, 3]
    finally:
        saver.close()
    params, _ = _restore(d)
    assert float(np.asarray(params["encoder"]["w"])[0, 0]) == 3.0
