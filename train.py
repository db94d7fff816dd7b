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
    return parser.parse_args()


def main():
    args = get_args()

    print(f"JAX backend: {jax.default_backend()}, devices: {jax.device_count()}")

    from trustedai_cl_vae_ad_tpu.config import load_config, stamp_logdir, validate_config
    from trustedai_cl_vae_ad_tpu.data.loader import load_data
    from trustedai_cl_vae_ad_tpu.registry import load_model_from_config
    from trustedai_cl_vae_ad_tpu.train.loop import evaluate, train_model

    config = validate_config(load_config(args.config_filename))
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

        print(f"Resuming from: {args.resume}")
        if not os.path.exists(os.path.join(args.resume, "optimizer")):
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
    evaluate(config, model, data)


if __name__ == "__main__":
    main()
