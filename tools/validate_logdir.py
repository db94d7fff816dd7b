#!/usr/bin/env python3
"""Log-directory doctor: diagnose a checkpoint dir against the full ABI.

The log dir is the framework's (and the reference's) de-facto checkpoint
format — ``encoder/ decoder/ config.yml`` (reference train.py:127-128,
load_model.py:74-83) plus this framework's additions: ``optimizer/`` (Adam
moments for true resume), ``train_state.json`` (schedule resume sidecar),
``quantized/`` (int8 serving boot), ``replay_buffer_paths.csv`` (CL replay
provenance). A dir can drift in ways each tool only discovers at boot time
(minutes into a flagship upload): missing pieces, a config that no longer
builds, weight shapes that don't match the config, a stale int8 sidecar
after a retrain. This CLI checks everything up front, without loading the
(possibly multi-GB) weight payloads.

Usage: python tools/validate_logdir.py <log_dir> [--strict]

Exit code 0 = usable for inference (errors empty); --strict also fails on
warnings (missing optimizer state, stale quantized sidecar, ...).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def validate_logdir(log_dir: str) -> dict:
    """Return {"errors": [...], "warnings": [...], "info": {...}}.

    Errors make the dir unusable for inference; warnings degrade a specific
    capability (resume, int8 boot, schedule continuation) but scoring works.
    Weight payloads are NOT read — shape checks go through orbax metadata.
    """
    errors: list = []
    warnings: list = []
    info: dict = {}
    report = {"errors": errors, "warnings": warnings, "info": info}

    if not os.path.isdir(log_dir):
        errors.append(f"not a directory: {log_dir}")
        return report

    # -- config.yml must parse AND build the model (shape source of truth)
    config_path = os.path.join(log_dir, "config.yml")
    if not os.path.exists(config_path):
        errors.append("config.yml missing (every loader needs it: "
                      "registry.load_model_from_directory)")
        return report
    try:
        from trustedai_cl_vae_ad_tpu.config import load_config
        from trustedai_cl_vae_ad_tpu.registry import build_core_from_config

        config = load_config(config_path)
        core = build_core_from_config(config)
        info["model_type"] = config.get("model", {}).get("type", "KurtosisGlobal")
        info["latent_dimensions"] = int(config["model"]["latent_dimensions"])
        info["image_size"] = list(config["data"]["image_size"])
    except Exception as e:
        errors.append(f"config.yml does not build a model: {e!r}")
        return report

    # -- expected leaf shapes from the config (no device arrays: eval_shape)
    import jax

    # the key must stay ABSTRACT: jax.random.PRNGKey(0) creates a real device
    # array, initializing the accelerator backend — on a single-client TPU
    # tunnel that makes the metadata-only doctor a second TPU client (breaks
    # or hangs next to a live training/serving process)
    key_shape = jax.eval_shape(jax.random.PRNGKey, 0)
    params_shape = jax.eval_shape(core.init, key_shape)
    expected = {
        sub: {path: leaf for path, leaf in _flat(params_shape[sub])}
        for sub in ("encoder", "decoder")
    }

    # -- checkpoint-round layout (crash-atomic saves): restore reads the
    # newest COMPLETE round; report which, and flag interrupted saves
    from trustedai_cl_vae_ad_tpu.train.checkpoint import (
        ROUNDS_SUBDIR,
        _complete_rounds,
        resolve_round_dir,
    )

    base = resolve_round_dir(log_dir)
    rounds_path = os.path.join(log_dir, ROUNDS_SUBDIR)
    rounds = _complete_rounds(rounds_path)
    if rounds:
        info["layout"] = "rounds"
        info["rounds_complete"] = len(rounds)
        info["round_selected"] = os.path.basename(base)
        stale_tmp = [n for n in os.listdir(rounds_path) if n.startswith(".tmp-")]
        if stale_tmp:
            warnings.append(
                f"{len(stale_tmp)} interrupted save round(s) in rounds/ "
                f"(e.g. {stale_tmp[0]}) — a save was killed or failed "
                "mid-write; harmless (never selected by restore, swept at "
                "the next save)")
        cur = os.path.join(log_dir, "current")
        newest = rounds[-1][1]
        if os.path.isdir(cur) and not os.path.islink(cur):
            # a symlink-following copy (cp -r / rsync without -l /
            # copytree) materializes 'current' as a real directory — a
            # healthy copy, not an interrupted save; the next save swaps a
            # fresh symlink in (train/checkpoint._commit_round)
            warnings.append(
                "'current' is an in-place directory (symlink-following "
                "copy) — restore uses the newest complete round "
                f"({newest}); the next save restores the pointer")
        else:
            cur_name = (os.path.basename(os.readlink(cur).rstrip("/"))
                        if os.path.islink(cur) else None)
            if cur_name != newest:
                warnings.append(
                    f"'current' pointer is {cur_name or 'missing'} but the "
                    f"newest complete round is {newest} — a save was "
                    "interrupted between commit and pointer swap; restore "
                    f"uses {os.path.basename(base)} (the pointer's round "
                    "when valid, else the newest complete round)")
        for sub in ("encoder", "decoder", "optimizer"):
            p = os.path.join(log_dir, sub)
            if os.path.isdir(p) and not os.path.islink(p):
                warnings.append(
                    f"{sub}/ is an in-place directory but rounds/ also "
                    "exists — restore prefers the newest complete round; "
                    "the next save upgrades this to a symlink")
    else:
        info["layout"] = "legacy"

    # -- encoder/ decoder/ orbax checkpoints: present + metadata shape match
    import orbax.checkpoint as ocp

    ck = ocp.StandardCheckpointer()
    for sub in ("encoder", "decoder"):
        path = os.path.abspath(os.path.join(base, sub))
        if not os.path.isdir(path):
            errors.append(f"{sub}/ checkpoint missing")
            continue
        try:
            meta = ck.metadata(path).item_metadata  # tree of ArrayMetadata
        except Exception as e:
            errors.append(f"{sub}/ checkpoint unreadable: {e!r}")
            continue
        got = {p: l for p, l in _flat(meta)}
        dtype_drift = []
        for p, want in expected[sub].items():
            if p not in got:
                errors.append(f"{sub}: leaf {p} missing from checkpoint")
            else:
                g = got[p]
                gshape = tuple(getattr(g, "shape", ()) or ())
                if gshape != tuple(want.shape):
                    errors.append(
                        f"{sub}: {p} shape {gshape} != config-derived "
                        f"{tuple(want.shape)} (config/weights drift)")
                else:
                    gdtype = getattr(g, "dtype", None)
                    if gdtype is not None and str(gdtype) != str(want.dtype):
                        dtype_drift.append((p, str(gdtype), str(want.dtype)))
        if dtype_drift:
            p0, got0, want0 = dtype_drift[0]
            warnings.append(
                f"{sub}: {len(dtype_drift)} leaf dtype(s) differ from the "
                f"config-derived tree (e.g. {p0}: checkpoint {got0} vs config "
                f"{want0}) — saved under a different training.precision; "
                "loaders restore the checkpoint dtype")
        extra = set(got) - set(expected[sub])
        if extra:
            warnings.append(f"{sub}: {len(extra)} extra leaves not in the "
                            f"config-derived tree (e.g. {sorted(extra)[:2]})")

    # -- optimizer/ (resume capability)
    if os.path.isdir(os.path.join(base, "optimizer")):
        info["optimizer_state"] = True
    else:
        info["optimizer_state"] = False
        warnings.append("optimizer/ missing — --resume restarts Adam moments "
                        "(reference behavior; harmless for inference)")

    # -- train_state.json (schedule-resume sidecar)
    ts_path = os.path.join(log_dir, "train_state.json")
    if os.path.exists(ts_path):
        try:
            with open(ts_path) as f:
                ts = json.load(f)
            if not isinstance(ts, dict):
                raise ValueError(f"top level is {type(ts).__name__}, not an object")
            info["train_state"] = {k: ts.get(k) for k in
                                   ("epochs_completed", "step", "beta")}
            max_epochs = int(config.get("training", {}).get("max_epochs", 0))
            if max_epochs and int(ts.get("epochs_completed", 0) or 0) > max_epochs:
                warnings.append(
                    f"train_state.json epochs_completed "
                    f"{ts['epochs_completed']} > training.max_epochs "
                    f"{max_epochs} — --resume will train 0 epochs")
        except (ValueError, KeyError, TypeError, OSError) as e:
            warnings.append(f"train_state.json unreadable ({e!r}) — "
                            "--resume falls back to a full restart")
    else:
        warnings.append("train_state.json missing — --resume restores weights "
                        "but restarts the epoch/beta schedule")

    # -- quantized/ int8 serving sidecar: staleness vs float weights.
    # Shared verdict (ops/quant.quantized_staleness): content-based evidence
    # first (provenance stamp, orbax commit timestamps — survives cp -p /
    # rsync -a / tar, which preserve mtimes), filesystem mtimes as the
    # no-evidence last resort with soft "MAY be stale" wording. The int8
    # boot path (load_int8_serving_model) runs the same check.
    from trustedai_cl_vae_ad_tpu.ops.quant import (
        QUANTIZED_SUBDIR,
        quantized_staleness,
    )

    qdir = os.path.join(log_dir, QUANTIZED_SUBDIR)
    if os.path.isdir(qdir):
        info["quantized"] = True
        stale_msg = ("— --quantize boots/serves pre-retrain weights; re-run "
                     "tools/quantize_checkpoint.py")
        verdict = quantized_staleness(log_dir)
        if verdict is not None:
            warnings.append(f"{verdict[1]} {stale_msg}")
    else:
        info["quantized"] = False

    # -- replay provenance (CL resume)
    rp = os.path.join(log_dir, "replay_buffer_paths.csv")
    if os.path.exists(rp):
        # csv, first column — the writer is csv.writer (stream/engine.py
        # save_model_dir), so a raw line read would keep csv quoting on
        # paths containing commas and report them falsely missing. (The
        # canonical reader parse_replay_file can't be used here: it FILTERS
        # to existing files, which is exactly what this check diagnoses.)
        import csv

        with open(rp, newline="") as f:
            paths = [row[0] for row in csv.reader(f) if row and row[0].strip()]
        missing = [p for p in paths if not os.path.exists(p)]
        info["replay_paths"] = len(paths)
        if missing:
            warnings.append(f"replay provenance lists {len(missing)} missing "
                            f"file(s) (e.g. {missing[0]}) — CL resume will "
                            "skip them")
    return report


def _flat(tree):
    import jax

    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    for path, leaf in flat:
        yield jax.tree_util.keystr(path), leaf


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("log_dir")
    ap.add_argument("--strict", action="store_true",
                    help="non-zero exit on warnings too")
    ap.add_argument("--json", action="store_true", help="machine-readable")
    args = ap.parse_args(argv)

    report = validate_logdir(args.log_dir)
    if args.json:
        print(json.dumps(report, indent=1, default=str))
    else:
        for e in report["errors"]:
            print(f"ERROR: {e}")
        for w in report["warnings"]:
            print(f"warning: {w}")
        for k, v in report["info"].items():
            print(f"{k}: {v}")
        verdict = ("UNUSABLE" if report["errors"] else
                   "usable (with warnings)" if report["warnings"] else "healthy")
        print(f"=> {args.log_dir}: {verdict}")
    bad = bool(report["errors"]) or (args.strict and report["warnings"])
    return 2 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
