"""Multi-host (2-process) distributed training equivalence.

Validates the DCN-ready claims end to end: two OS processes, 4 virtual CPU
devices each, gloo collectives, initialize_distributed + global_batch_from
_local per-host ingest — the dp train step must produce exactly the same
loss/params as the same step run on a single 8-device process.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _parse(out: str):
    loss = checksum = None
    for line in out.splitlines():
        if line.startswith("LOSS "):
            loss = float(line.split()[1])
        if line.startswith("CHECKSUM "):
            checksum = float(line.split()[1])
    assert loss is not None and checksum is not None, out
    return loss, checksum


def test_two_process_matches_single_process():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "mp_worker.py")
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen([sys.executable, worker, str(i), "2", str(port)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, cwd=repo, env=env)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
        assert p.returncode == 0, out[-3000:]
    (l0, c0), (l1, c1) = _parse(outs[0]), _parse(outs[1])
    # both processes observe the identical global result
    np.testing.assert_allclose(l0, l1, rtol=1e-7)
    np.testing.assert_allclose(c0, c1, rtol=1e-7)

    # single-process 8-device reference (this pytest process)
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices for the reference run")
    from tests.mp_worker import CONFIG
    from trustedai_cl_vae_ad_tpu.models import KurtosisGlobalCVAE, make_optimizer
    from trustedai_cl_vae_ad_tpu.parallel.dp import build_train_step
    from trustedai_cl_vae_ad_tpu.parallel.mesh import make_mesh, replicate, shard_batch

    core = KurtosisGlobalCVAE(CONFIG)
    optimizer = make_optimizer(1e-3)
    mesh = make_mesh(n_data=8, n_model=1)
    params = replicate(core.init(jax.random.PRNGKey(0)), mesh)
    opt_state = replicate(optimizer.init(params), mesh)
    batch = shard_batch(
        np.random.RandomState(0).random((16, 16, 16, 3)).astype(np.float32), mesh
    )
    step = build_train_step(core, optimizer, mesh)
    params, opt_state, loss, _ = step(params, opt_state, batch, jax.random.PRNGKey(7))
    ref_loss = float(loss["loss"])
    ref_checksum = float(np.sum(np.abs(np.asarray(jax.tree_util.tree_leaves(params)[0]))))
    np.testing.assert_allclose(l0, ref_loss, rtol=1e-6)
    np.testing.assert_allclose(c0, ref_checksum, rtol=1e-6)


def test_train_cli_two_process(tmp_path):
    """The REAL train.py CLI over 2 gloo processes (--coordinator flags):
    both exit 0, process 0 stamps ONE logdir that process 1 receives via
    broadcast_str, the gathered checkpoint (params + optimizer) and the
    schedule sidecar land, and the checkpoint restores in a single process."""
    import json

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    port = _free_port()
    cfg = tmp_path / "cfg.yml"
    cfg.write_text(
        "loss: {w_mse: 1., kurtosis: 1.8, w_kurtosis: 1.0e-4, w_skew: 0.0, "
        "w_kl_divergence: 0.0, w_z_l1_reg: 0.0}\n"
        "data: {dataset: synthetic, n_train: 16, n_val: 8, image_size: [16, 16, 3]}\n"
        "training: {beta: 1.0e-6, learning_rate: 1.0e-4, batch_size: 8, max_epochs: 2}\n"
        "model: {type: KurtosisGlobal, latent_dimensions: 8, layers: [4], "
        "decoder_dense_filters: 4}\n"
    )
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env.update(TCVAE_PLATFORM="cpu", TCVAE_CPU_DEVICES="4",
               TCVAE_CPU_COLLECTIVES="gloo", PYTHONPATH=repo)
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(repo, "train.py"), str(cfg),
             "--coordinator", f"localhost:{port}",
             "--num-processes", "2", "--process-id", str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=str(tmp_path), env=env)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
        assert p.returncode == 0, out[-3000:]
    # both processes agree on the one stamped logdir
    logdirs = set()
    for out in outs:
        for line in out.splitlines():
            if line.startswith("Log dir: "):
                logdirs.add(line.split("Log dir: ")[1].strip())
    assert len(logdirs) == 1, logdirs
    logdir = logdirs.pop()
    # full resume point from the gathered save
    for sub in ("encoder", "decoder", "optimizer"):
        assert os.path.isdir(os.path.join(logdir, sub)), sub
    state = json.load(open(os.path.join(logdir, "train_state.json")))
    assert state["epochs_completed"] == 2
    np.testing.assert_allclose(state["beta"], 1e-6 * 0.98**2, rtol=1e-6)
    # exactly one process wrote metrics
    lines = [json.loads(l) for l in open(os.path.join(logdir, "metrics.jsonl"))]
    assert any("train/loss" in l for l in lines)
    # the multi-host checkpoint restores in THIS (single) process
    from trustedai_cl_vae_ad_tpu.registry import load_model_from_directory

    model, _cfg = load_model_from_directory(logdir, restore_optimizer=True)
    assert model.opt_state is not None
    loss = model.test_step(
        np.random.RandomState(0).rand(4, 16, 16, 3).astype(np.float32))
    assert np.isfinite(float(loss["loss"]))


def test_train_cli_two_process_contended_host(tmp_path):
    """Teardown under host load (VERDICT r4 #7): with the host CPU-saturated,
    the primary's post-train work (metrics flush, checkpoint commit) lags the
    worker — which previously hit the coordination-service shutdown barrier's
    fixed timeout and turned a SUCCESSFUL run into nonzero exits. train.py now
    synchronizes all processes and shuts the service down tolerantly
    (parallel/mesh.distributed_teardown), so both processes must exit 0 even
    with competing load."""
    import json

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    port = _free_port()
    cfg = tmp_path / "cfg.yml"
    cfg.write_text(
        "loss: {w_mse: 1., kurtosis: 1.8, w_kurtosis: 1.0e-4, w_skew: 0.0, "
        "w_kl_divergence: 0.0, w_z_l1_reg: 0.0}\n"
        "data: {dataset: synthetic, n_train: 16, n_val: 0, image_size: [16, 16, 3]}\n"
        "training: {beta: 1.0e-6, learning_rate: 1.0e-4, batch_size: 8, max_epochs: 1}\n"
        "model: {type: KurtosisGlobal, latent_dimensions: 8, layers: [4], "
        "decoder_dense_filters: 4}\n"
    )
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env.update(TCVAE_PLATFORM="cpu", TCVAE_CPU_DEVICES="4",
               TCVAE_CPU_COLLECTIVES="gloo", PYTHONPATH=repo)
    # load the (1-core) host DURING training + teardown — this is what made
    # the in-suite run blow the shutdown barrier before the teardown fix.
    # The load starts after gloo connection setup (sleep) and runs niced:
    # saturating the core during the connect phase fails startup instead,
    # which is a different (environment-only) failure than the one under test
    burners = [
        subprocess.Popen(
            ["sh", "-c",
             f"sleep 20; exec nice -n 5 {sys.executable} -c "
             "'\nwhile True: sum(range(10000))'"],
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        for _ in range(2)
    ]
    try:
        procs = [
            subprocess.Popen(
                [sys.executable, os.path.join(repo, "train.py"), str(cfg),
                 "--coordinator", f"localhost:{port}",
                 "--num-processes", "2", "--process-id", str(i)],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
                cwd=str(tmp_path), env=env)
            for i in range(2)
        ]
        outs = []
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
        for p, out in zip(procs, outs):
            assert p.returncode == 0, out[-3000:]
    finally:
        for b in burners:
            b.kill()
        for b in burners:
            b.wait(timeout=30)
    logdir = None
    for line in outs[0].splitlines():
        if line.startswith("Log dir: "):
            logdir = line.split("Log dir: ")[1].strip()
    assert logdir and os.path.isdir(os.path.join(logdir, "encoder")), outs[0][-2000:]
    state = json.load(open(os.path.join(logdir, "train_state.json")))
    assert state["epochs_completed"] == 1


def test_train_cli_two_process_zero1(tmp_path):
    """Multi-host + training.zero1: the Adam moments are data-sharded across
    processes during training, the save's per-leaf resharding jit all-gathers
    them, and the checkpoint (params + FULL moments) restores single-process.
    The encoder dense kernel (1024x128 = 131k elems) crosses zero1's
    min_elems so at least one moment leaf is genuinely sharded."""
    import json

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    port = _free_port()
    cfg = tmp_path / "cfg.yml"
    cfg.write_text(
        "loss: {w_mse: 1., kurtosis: 1.8, w_kurtosis: 1.0e-4, w_skew: 0.0, "
        "w_kl_divergence: 0.0, w_z_l1_reg: 0.0}\n"
        "data: {dataset: synthetic, n_train: 16, n_val: 0, image_size: [32, 32, 3]}\n"
        "training: {beta: 1.0e-6, learning_rate: 1.0e-4, batch_size: 8, "
        "max_epochs: 1, zero1: true}\n"
        "model: {type: KurtosisGlobal, latent_dimensions: 64, layers: [4], "
        "decoder_dense_filters: 4}\n"
    )
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env.update(TCVAE_PLATFORM="cpu", TCVAE_CPU_DEVICES="4",
               TCVAE_CPU_COLLECTIVES="gloo", PYTHONPATH=repo)
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(repo, "train.py"), str(cfg),
             "--coordinator", f"localhost:{port}",
             "--num-processes", "2", "--process-id", str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=str(tmp_path), env=env)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
        assert p.returncode == 0, out[-3000:]
    logdir = None
    for line in outs[0].splitlines():
        if line.startswith("Log dir: "):
            logdir = line.split("Log dir: ")[1].strip()
    assert logdir and os.path.isdir(os.path.join(logdir, "optimizer")), outs[0][-2000:]
    state = json.load(open(os.path.join(logdir, "train_state.json")))
    assert state["epochs_completed"] == 1
    # the gathered moments restore into a single-process model
    import jax

    from trustedai_cl_vae_ad_tpu.registry import load_model_from_directory

    model, _cfg = load_model_from_directory(logdir, restore_optimizer=True)
    assert model.opt_state is not None
    inner = model.opt_state.inner_state[0]
    # the post-step moments are non-zero (a fresh init would be all-zero)
    total = sum(float(np.abs(np.asarray(l)).sum())
                for l in jax.tree_util.tree_leaves(inner.mu))
    assert total > 0.0
