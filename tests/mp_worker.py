"""Worker process for the 2-process distributed training test.

Invoked as: python tests/mp_worker.py <process_id> <num_processes> <port>
Each process owns 4 virtual CPU devices; the global mesh is 8-wide on 'data'
with cross-process collectives over gloo. Prints LOSS/CHECKSUM lines the
parent test compares across processes and against a single-process run.

Import-safe: tests import CONFIG from here; the jax/distributed bootstrap
only runs under __main__ (backend config must precede any jax use).
"""

CONFIG = {
    "data": {"image_size": [16, 16, 3]},
    "loss": {"kurtosis": 1.8, "w_kl_divergence": 0.0, "w_kurtosis": 1e-4,
             "w_mse": 1.0, "w_skew": 0.0, "w_z_l1_reg": 1e-3},
    "model": {"decoder_dense_filters": 4, "latent_dimensions": 8, "layers": [4]},
    "training": {"batch_size": 16, "beta": 1e-6, "learning_rate": 1e-3,
                 "max_epochs": 1},
}


def main(pid: int, nproc: int, port: int) -> None:
    import jax
    import numpy as np

    from trustedai_cl_vae_ad_tpu.models import KurtosisGlobalCVAE, make_optimizer
    from trustedai_cl_vae_ad_tpu.parallel.dp import build_train_step
    from trustedai_cl_vae_ad_tpu.parallel.mesh import (
        global_batch_from_local,
        make_mesh,
        replicated_from_local,
    )

    assert len(jax.devices()) == 4 * nproc, jax.devices()
    core = KurtosisGlobalCVAE(CONFIG)
    optimizer = make_optimizer(1e-3)
    mesh = make_mesh(n_data=4 * nproc, n_model=1)

    params_np = jax.device_get(core.init(jax.random.PRNGKey(0)))
    params = replicated_from_local(params_np, mesh)
    opt_state = replicated_from_local(
        jax.device_get(optimizer.init(params_np)), mesh
    )

    # global batch: 16 rows over 8 devices -> 2 rows/device, 8 rows/process
    full = np.random.RandomState(0).random((16, 16, 16, 3)).astype(np.float32)
    local = full[pid * 8:(pid + 1) * 8]
    batch = global_batch_from_local(local, mesh)

    step = build_train_step(core, optimizer, mesh)
    rng = jax.random.PRNGKey(7)
    params, opt_state, loss, _x_hat = step(params, opt_state, batch, rng)
    leaf = jax.tree_util.tree_leaves(params)[0]
    # fully-addressable replicated output: read the local replica
    local_leaf = np.asarray(leaf.addressable_data(0))
    print(f"LOSS {float(loss['loss']):.10f}", flush=True)
    # abs-sum: a plain sum of a post-step bias leaf cancels to ~1e-7 and
    # amplifies gloo-vs-psum reduction-order noise beyond any useful rtol
    print(f"CHECKSUM {float(np.sum(np.abs(local_leaf))):.10f}", flush=True)


if __name__ == "__main__":
    import os
    import sys

    _pid = int(sys.argv[1])
    _nproc = int(sys.argv[2])
    _port = int(sys.argv[3])

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

    import jax

    jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    from trustedai_cl_vae_ad_tpu.parallel.mesh import initialize_distributed

    initialize_distributed(coordinator_address=f"localhost:{_port}",
                           num_processes=_nproc, process_id=_pid)
    jax.config.update("jax_num_cpu_devices", 4)
    main(_pid, _nproc, _port)
