#!/usr/bin/env python3
"""Offline training CLI: ``python train.py config.yml [--dry-run]``.

Parity with reference train.py:50-213 — same CLI surface, same 4-section YAML
config, logs/fit_<timestamp> log-dir stamping with a config.yml copy, epoch
training with per-epoch beta annealing (x0.98), checkpoint save to
<logdir>/encoder + <logdir>/decoder, and post-train evaluation artifacts
(original/reconstruction grids, image + latent histograms).

TPU-native internals: jit/pjit data-parallel train step over a device mesh,
device-prefetched ingest, Orbax checkpoints (weights + optimizer state).
"""

import argparse

import trustedai_cl_vae_ad_tpu  # noqa: F401  (applies the TCVAE_PLATFORM override)
import jax


def get_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("config_filename", type=str, help="YAML configuration file")
    parser.add_argument("--dry-run", action="store_true", help="Quit before executing training")
    parser.add_argument("--no-parallel", action="store_true", help="Disable data-parallel mesh")
    parser.add_argument(
        "--resume", type=str, default=None, metavar="LOGDIR",
        help="Resume from a previous log dir (weights AND Adam moments — a "
             "capability the reference lacks: it re-inits the optimizer on load)",
    )
    parser.add_argument(
        "--distributed", action="store_true",
        help="Multi-host training: initialize jax.distributed from the "
             "cluster environment (auto-detected on Cloud TPU pods); the "
             "'data' mesh axis then spans hosts and each process feeds its "
             "own local batches",
    )
    parser.add_argument("--coordinator", type=str, default=None, metavar="HOST:PORT",
                        help="Multi-host coordinator address (implies --distributed; "
                             "requires --num-processes and --process-id)")
    parser.add_argument("--num-processes", type=int, default=None)
    parser.add_argument("--process-id", type=int, default=None)
    return parser.parse_args()


def main():
    args = get_args()

    if args.distributed or args.coordinator is not None:
        # must run before ANYTHING initializes the XLA backend (even the
        # backend print below)
        from trustedai_cl_vae_ad_tpu.parallel.mesh import initialize_distributed

        initialize_distributed(coordinator_address=args.coordinator,
                               num_processes=args.num_processes,
                               process_id=args.process_id)

    print(f"JAX backend: {jax.default_backend()}, devices: {jax.device_count()} "
          f"(process {jax.process_index()}/{jax.process_count()})")

    from trustedai_cl_vae_ad_tpu.config import load_config, stamp_logdir, validate_config
    from trustedai_cl_vae_ad_tpu.data.loader import load_data
    from trustedai_cl_vae_ad_tpu.registry import load_model_from_config
    from trustedai_cl_vae_ad_tpu.train.loop import evaluate, train_model

    config = validate_config(load_config(args.config_filename))
    if jax.process_count() > 1:
        # one timestamped logdir for the whole job: process 0 stamps it (and
        # writes the config copy), everyone else receives the path — per-
        # process stamping would scatter the run over near-identical dirs
        from trustedai_cl_vae_ad_tpu.parallel.mesh import broadcast_str

        if jax.process_index() == 0:
            stamp_logdir(config)
        config["logdir"] = broadcast_str(config.get("logdir", ""))
    else:
        stamp_logdir(config)
    print(f"Log dir: {config['logdir']}")

    # training.compiler_options ("k=v,k=v") ships per-compile XLA options to
    # the (possibly remote) TPU compiler — XLA_FLAGS cannot (utils/compile.py).
    # Measured: xla_tpu_scoped_vmem_limit_kib=98304 is +5.4% on the flagship
    # step (BENCH_NOTES r10). Env var set explicitly wins over the config.
    copts = (config.get("training") or {}).get("compiler_options")
    if copts:
        import os

        os.environ.setdefault("TCVAE_COMPILER_OPTIONS", str(copts))

    # training shuffles per epoch (reference fit(shuffle=True)); the analysis
    # CLIs use load_data's deterministic default
    config["data"].setdefault("shuffle", True)

    data = load_data(config)
    model = load_model_from_config(config)
    initial_epoch = initial_step = 0
    if args.resume:
        import os

        from trustedai_cl_vae_ad_tpu.train.loop import load_train_state

        from trustedai_cl_vae_ad_tpu.train.checkpoint import resolve_round_dir

        print(f"Resuming from: {args.resume}")
        if not os.path.exists(os.path.join(resolve_round_dir(args.resume), "optimizer")):
            print("WARNING: no optimizer/ checkpoint in the resume dir — "
                  "weights restored, Adam moments start fresh")
        model.load_model(args.resume, restore_optimizer=True)
        # continue the training schedule where the previous run stopped:
        # remaining epochs only, beta at its annealed value, metric steps
        # numbered continuously (train_state.json sidecar; absent on
        # pre-feature log dirs -> reference behavior, full restart)
        state = load_train_state(args.resume)
        if state is not None:
            initial_epoch, initial_step = state["epochs_completed"], state["step"]
            if state["beta"] is not None:
                model.beta = state["beta"]
            total = int(config["training"]["max_epochs"])
            print(f"Resume state: {initial_epoch} epochs done, step {initial_step}, "
                  f"beta {model.beta:.6g} — training {max(total - initial_epoch, 0)} more")
    if args.dry_run:
        return
    model = train_model(config, model, data, parallel=not args.no_parallel,
                        initial_epoch=initial_epoch, initial_step=initial_step)
    if jax.process_count() > 1:
        # the eval figures run single-device jits, which can't consume the
        # non-addressable multi-host params; the checkpoint is saved — run
        # the latent/recon tooling against the logdir afterwards
        if jax.process_index() == 0:
            print("multi-host run: skipping in-process eval artifacts "
                  "(run output_reconstructions.py / the latent tools on "
                  f"{config['logdir']})")
        # synchronize + shut the coordination service down HERE, tolerantly:
        # leaving it to interpreter exit races a slow primary against the
        # workers' fixed shutdown barrier and fails successful runs
        from trustedai_cl_vae_ad_tpu.parallel.mesh import distributed_teardown

        distributed_teardown()
        return
    evaluate(config, model, data)


if __name__ == "__main__":
    main()
