"""Int8 weight quantization for the serving/streaming forward path.

Rationale (TPU-native, measured in BENCH_NOTES.md): at serving batch sizes
(1-16 frames/tick) the flagship forward is *weight-streaming* bound, not
MXU bound — the 268800x4000 encoder dense kernel alone is 2.15 GB in bf16,
~2.6 ms/tick at the v5e's 819 GB/s HBM roofline, i.e. a third to a half of
the whole multicam tick. Storing the big dense kernels as int8 with
per-output-channel scales halves their HBM traffic; with dynamic per-row
activation quantization the matmul itself runs int8 x int8 -> int32 on the
MXU (2x bf16 peak on v5e).

This is an inference-only, opt-in path (serve.py --quantize,
MultiCameraEngine(quantize=True)). Training and the CL stream keep full
precision: the reference has no analogue of this (its serving path is the
same float Keras model, camera_streamer_qt.py:1263-1408); it is a new
TPU-native capability. Fidelity is validated in tests/test_quant.py:
the quantized reconstruction stays within a small MSE of the float path
and anomaly z-score decisions match on synthetic scenes.

Two modes:
  * "w8a8"  — int8 weights AND dynamic int8 activations; the dot runs in
              int8 (preferred_element_type=int32). Default.
  * "w8"    — int8 weights dequantized in-kernel to the compute dtype;
              activations stay bf16/f32. Fallback if a backend's int8
              matmul lowering is slow.

Only Dense kernels with >= min_elems elements are quantized (default 2^25:
the flagship's 1.08B encoder dense and 0.27B decoder dense qualify; small
heads and all convs stay in the compute dtype — the convs are lane-padding
bound, not bandwidth bound, so int8 buys them nothing).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from trustedai_cl_vae_ad_tpu.ops.convt import conv_transpose_same

Array = jax.Array

DEFAULT_MIN_ELEMS = 1 << 25


def quantize_dense_kernel(kernel: Array) -> Tuple[Array, Array]:
    """Symmetric per-output-channel int8 quantization of a (in, out) kernel.

    Returns (kernel_i8 int8 (in, out), scale f32 (out,)) with
    kernel ~= kernel_i8 * scale.
    """
    k = kernel.astype(jnp.float32)
    scale = jnp.max(jnp.abs(k), axis=0) / 127.0
    scale = jnp.maximum(scale, jnp.finfo(jnp.float32).tiny)
    k_i8 = jnp.clip(jnp.round(k / scale), -127, 127).astype(jnp.int8)
    return k_i8, scale


def _is_qdense(p: Any) -> bool:
    return isinstance(p, dict) and "kernel_i8" in p


def quantize_params(core, params: dict, min_elems: int | None = None) -> dict:
    """Return a copy of the param tree with large Dense kernels quantized.

    Quantized entries are dicts {kernel_i8, scale, bias}; everything else is
    kept by reference. Works on the trees produced by AbstractCVAE.init /
    checkpoint restore (models/cvae.py layout). min_elems defaults to
    DEFAULT_MIN_ELEMS (resolved at call time, so tests can patch it).
    """
    if min_elems is None:
        import os

        min_elems = int(os.environ.get("TCVAE_QUANT_MIN_ELEMS", DEFAULT_MIN_ELEMS))

    # jit so the bf16 -> int8 rounding fuses into one streaming kernel: the
    # eager path materializes f32 temps of the full kernel (4.3 GB x3 for
    # the flagship's 1.08B dense — OOMs a 16 GB chip)
    quantize_j = jax.jit(quantize_dense_kernel)

    def convert(sub: dict) -> dict:
        out = {}
        for name, p in sub.items():
            if (
                name.startswith("Dense_")
                and isinstance(p, dict)
                and "kernel" in p
                and p["kernel"].size >= min_elems
            ):
                k_i8, scale = quantize_j(p["kernel"])
                out[name] = {"kernel_i8": k_i8, "scale": scale, "bias": p["bias"]}
            else:
                out[name] = p
        return out

    return {"encoder": convert(params["encoder"]), "decoder": convert(params["decoder"])}


# largest contraction length whose worst-case int8 x int8 accumulation
# (127*127 per element) provably fits int32: floor(2^31 / 127^2) = 133152
_I32_SAFE_K = 1 << 17  # 131072


def _dense(p: dict, x: Array, dtype: Any, mode: str) -> Array:
    """Apply a Dense layer from a (possibly quantized) param entry.

    Float path matches flax nn.Dense(dtype=dtype): inputs/params cast to
    dtype, y = x @ W + b.
    """
    if mode not in ("w8", "w8a8"):
        raise ValueError(f"unknown quantization mode {mode!r} (w8 | w8a8)")
    if not _is_qdense(p):
        return x.astype(dtype) @ p["kernel"].astype(dtype) + p["bias"].astype(dtype)
    bias = p["bias"].astype(jnp.float32)
    if mode == "w8":
        w = (p["kernel_i8"].astype(dtype) * p["scale"].astype(dtype)[None, :])
        return (x.astype(dtype) @ w + bias.astype(dtype)).astype(dtype)
    # w8a8: dynamic symmetric per-row activation quantization
    xf = x.astype(jnp.float32)
    sx = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
    sx = jnp.maximum(sx, jnp.finfo(jnp.float32).tiny)
    x_i8 = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    k_i8 = p["kernel_i8"]
    K = k_i8.shape[0]
    dims = (((x.ndim - 1,), (0,)), ((), ()))
    if K <= _I32_SAFE_K:
        acc = lax.dot_general(x_i8, k_i8, dims, preferred_element_type=jnp.int32).astype(
            jnp.float32
        )
    else:
        # int32-headroom guard: the encoder dense contracts over K=268800,
        # where a worst-case all-saturated row (post-ReLU activations are
        # non-negative) could wrap int32. Split the contraction into
        # provably-safe chunks and accumulate the partials in f32 — each
        # chunk still runs int8 on the MXU and the kernel slice is streamed
        # exactly once in total.
        n = -(-K // _I32_SAFE_K)
        acc = None
        for c in range(n):
            s, e = c * _I32_SAFE_K, min((c + 1) * _I32_SAFE_K, K)
            part = lax.dot_general(
                lax.slice_in_dim(x_i8, s, e, axis=x.ndim - 1),
                lax.slice_in_dim(k_i8, s, e, axis=0),
                dims,
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
            acc = part if acc is None else acc + part
    y = acc * sx * p["scale"][None, :] + bias
    return y.astype(dtype)


def serving_forward(core, params: dict, quantize: bool = False, mode: str = "w8a8",
                    qparams: dict | None = None):
    """One-stop forward selection for the serving/scoring integrations.

    Returns ``(forward_fn, serve_params)``: the float eval forward over the
    given params, or (with ``quantize``) call_quantized over a quantized
    copy. All serving surfaces (serve.py, stream/engine.py,
    stream/multicam.py, anomaly/offline.py) route through this so precision
    selection lives in exactly one place.

    ``qparams`` supplies a pre-quantized tree (load_quantized_checkpoint):
    the bf16 ``params`` are then not touched at all — the int8-checkpoint
    serving boot path, which skips both the multi-GB float upload and the
    on-device quantization pass.
    """
    if qparams is not None:
        return (lambda p, x: call_quantized(core, p, x, mode=mode)), qparams
    if quantize:
        qparams = quantize_params(core, params)
        return (lambda p, x: call_quantized(core, p, x, mode=mode)), qparams
    return (lambda p, x: core.call(p, x, training=False)), params


QUANTIZED_SUBDIR = "quantized"
PROVENANCE_FILE = "float_provenance.json"


def float_checkpoint_stamp(log_dir: str) -> dict:
    """Content-based identity of the float checkpoint: orbax's
    ``commit_timestamp_nsecs`` from encoder/ and decoder/ ``_CHECKPOINT_METADATA``
    (file CONTENT, so it survives mtime-preserving copies — cp -p, rsync -a,
    tar — unlike filesystem mtimes). Missing pieces map to None."""
    import json
    import os

    stamp = {}
    for sub in ("encoder", "decoder"):
        meta_path = os.path.join(log_dir, sub, "_CHECKPOINT_METADATA")
        try:
            with open(meta_path) as f:
                stamp[sub] = json.load(f).get("commit_timestamp_nsecs")
        except (OSError, ValueError):
            stamp[sub] = None
    return stamp


def quantized_staleness(log_dir: str):
    """Did ``<log_dir>/quantized`` come from the CURRENT float checkpoint?

    Returns ``None`` (no evidence of staleness) or ``(code, message)``.
    Evidence is content-based first — the provenance stamp
    save_quantized_checkpoint writes, then orbax commit timestamps — because
    filesystem mtimes lie under mtime-preserving copies (cp -p, rsync -a,
    tar) and clock skew; mtimes are the last resort with soft wording.
    Shared by tools/validate_logdir.py and load_int8_serving_model so the
    two staleness checks can never diverge."""
    import json
    import os

    qdir = os.path.join(log_dir, QUANTIZED_SUBDIR)
    float_stamp = float_checkpoint_stamp(log_dir)
    prov = None
    prov_path = os.path.join(qdir, PROVENANCE_FILE)
    if os.path.exists(prov_path):
        try:
            with open(prov_path) as f:
                prov = json.load(f).get("float_checkpoint")
        except (OSError, ValueError):
            prov = None
    # an all-None stamp (orbax metadata files absent at quantization time)
    # carries no content evidence — comparing it against an equally-blank
    # current stamp would certify a stale sidecar as fresh; fall through to
    # commit stamps / mtimes instead
    if isinstance(prov, dict) and not any(v is not None for v in prov.values()):
        prov = None
    if prov is not None:
        if prov != float_stamp:
            return ("provenance_mismatch",
                    "quantized/ was built from a DIFFERENT float checkpoint "
                    "(provenance mismatch)")
        return None
    q_commit = None
    try:
        with open(os.path.join(qdir, "_CHECKPOINT_METADATA")) as f:
            q_commit = json.load(f).get("commit_timestamp_nsecs")
    except (OSError, ValueError):
        pass
    float_commits = [v for v in float_stamp.values() if v is not None]
    if q_commit is not None and float_commits:
        if max(float_commits) > q_commit:
            return ("commit_older",
                    "quantized/ was committed BEFORE the float checkpoint")
        return None
    # no content evidence at all: mtimes (can lie — soft wording)
    def _tree_mtime(root):
        return max((os.path.getmtime(os.path.join(r, f))
                    for r, _d, fs in os.walk(root) for f in fs), default=0.0)

    float_mtime = max((_tree_mtime(os.path.join(log_dir, s))
                       for s in ("encoder", "decoder")
                       if os.path.isdir(os.path.join(log_dir, s))),
                      default=0.0)
    if float_mtime > _tree_mtime(qdir):
        return ("mtime_older",
                "quantized/ MAY be stale (older filesystem mtime than the "
                "float checkpoint; no content provenance found)")
    return None


def save_quantized_checkpoint(log_dir: str, qparams: dict) -> str:
    """Persist a quantized param tree under ``<log_dir>/quantized``.

    Serving motivation (BENCH_NOTES r4): the flagship serve.py cold boot is
    dominated by uploading the 1.6 GB bf16 checkpoint through the
    host->device link; the int8 tree is ~0.8 GB and already quantized, so a
    ``--quantize`` boot that finds this directory uploads half the bytes and
    skips the on-device quantization pass. Produced by
    ``tools/quantize_checkpoint.py`` (or any caller of quantize_params).
    """
    import os

    import numpy as np
    import orbax.checkpoint as ocp

    import json
    import shutil

    # Crash-safe replace (same principle as train/checkpoint.py's round
    # layout): orbax ``force=True`` would rmtree the existing sidecar BEFORE
    # writing its replacement — a kill mid-write destroys the only copy.
    # Stage the new tree in a sibling dir (orbax's own tmp+rename makes the
    # staging dir appear only when complete), stamp provenance (the staging
    # completion marker), then swap with two renames; loaders heal a kill
    # between the renames (_heal_quantized).
    # heal BEFORE sweeping: if the previous save was killed between its two
    # commit renames, .staging/.old may hold the ONLY copy — promoting it
    # first means the sweep below never deletes the last recoverable state
    _heal_quantized(log_dir)
    path = os.path.abspath(os.path.join(log_dir, QUANTIZED_SUBDIR))
    staging, old = path + ".staging", path + ".old"
    for leftover in (staging, old):
        if os.path.isdir(leftover):
            shutil.rmtree(leftover)
    host = jax.tree_util.tree_map(np.asarray, qparams)
    ck = ocp.StandardCheckpointer()
    ck.save(staging, host)
    ck.wait_until_finished()
    # record WHICH float checkpoint this sidecar came from (content-based;
    # tools/validate_logdir.py's staleness check reads it — mtimes lie under
    # mtime-preserving copies)
    with open(os.path.join(staging, PROVENANCE_FILE), "w") as f:
        json.dump({"float_checkpoint": float_checkpoint_stamp(log_dir)}, f)
    if os.path.isdir(path):
        os.rename(path, old)
    os.rename(staging, path)
    if os.path.isdir(old):
        shutil.rmtree(old)
    return path


def _heal_quantized(log_dir: str) -> None:
    """Recover ``quantized/`` after a save killed between its two commit
    renames: prefer a COMPLETE staging dir (provenance stamp present — it is
    written last), else the displaced previous copy. No-op when healthy."""
    import os

    path = os.path.abspath(os.path.join(log_dir, QUANTIZED_SUBDIR))
    staging, old = path + ".staging", path + ".old"
    if not os.path.isdir(path):
        if os.path.isdir(staging) and os.path.isfile(
                os.path.join(staging, PROVENANCE_FILE)):
            os.rename(staging, path)
        elif os.path.isdir(old):
            os.rename(old, path)


def load_quantized_checkpoint(log_dir: str) -> dict:
    """Load ``<log_dir>/quantized`` (dtypes/structure come from the
    checkpoint itself — int8 kernels, f32 scales, float biases/convs)."""
    import os

    import orbax.checkpoint as ocp

    _heal_quantized(log_dir)
    path = os.path.abspath(os.path.join(log_dir, QUANTIZED_SUBDIR))
    assert os.path.isdir(path), f"no quantized checkpoint at {path}"
    ck = ocp.StandardCheckpointer()
    host = ck.restore(path)
    # commit to device ONCE — a host tree passed to a jitted forward would
    # re-upload the whole ~0.8 GB every dispatch
    return jax.device_put(host)


def has_quantized_checkpoint(log_dir: str) -> bool:
    import os

    _heal_quantized(log_dir)
    return os.path.isdir(os.path.join(log_dir, QUANTIZED_SUBDIR))


class QuantizedServingModel:
    """Inference-only model shell for int8-checkpoint boots.

    Stands in for VAEModel on serving surfaces that booted straight from
    ``<log_dir>/quantized`` (load_int8_serving_model): ``params`` is None —
    the float tree is never materialized — and ``qparams`` holds the int8
    serving tree. ``save_model`` re-persists the quantized tree, so engine
    snapshots (recording instance dirs, autosave) of an int8 boot remain
    loadable by every ``--quantize`` surface; the snapshot intentionally
    contains no float ``encoder/``/``decoder/`` (there is nothing to write).
    """

    optimizer = None
    opt_state = None

    def __init__(self, core, qparams: dict):
        self.core = core
        self.params = None
        self.qparams = qparams

    def save_model(self, log_dir: str, include_optimizer: bool = True) -> None:
        save_quantized_checkpoint(log_dir, self.qparams)


def load_int8_serving_model(model_dir: str):
    """Boot an inference-only model from ``<model_dir>/quantized``.

    Returns ``(QuantizedServingModel, config)`` — the shared int8-boot path
    for serve.py, camera_streamer.py, and do_anomaly_detection.py: the
    float checkpoint is never read or uploaded (half the boot bytes, no
    on-device quantization pass; BENCH_NOTES r5/r7).
    """
    import os

    from trustedai_cl_vae_ad_tpu.config import load_config
    from trustedai_cl_vae_ad_tpu.registry import build_core_from_config

    config = load_config(os.path.join(model_dir, "config.yml"))
    core = build_core_from_config(config)
    qparams = load_quantized_checkpoint(model_dir)
    print(f"int8 boot: loaded quantized checkpoint from "
          f"{os.path.join(model_dir, QUANTIZED_SUBDIR)}")
    # staleness check: a retrain that didn't re-run
    # tools/quantize_checkpoint.py would silently serve old weights.
    # Content-based (provenance stamp / orbax commit timestamps) with mtimes
    # only as the no-evidence fallback — mtime-preserving copies (cp -p,
    # rsync -a, tar) defeat a pure-mtime check.
    try:
        verdict = quantized_staleness(model_dir)
        if verdict is not None:
            print(f"WARNING: {verdict[1]} — serving may use pre-retrain "
                  "weights; re-run tools/quantize_checkpoint.py to refresh")
    except OSError:
        pass
    return QuantizedServingModel(core, qparams), config


def call_quantized(core, qparams: dict, x: Array, mode: str = "w8a8") -> Array:
    """Eval-mode forward (== core.call(params, x, training=False)) over a
    quantized param tree.

    Transcribes Encoder/Decoder (models/cvae.py:46-139) with the Dense
    layers swapped for their quantized evaluation; with an unquantized tree
    (min_elems=inf) it reproduces core.call exactly (tests/test_quant.py) —
    including the uint8 input contract (raw 0-255 pixels normalize on
    device, models/cvae.normalize_image_input), so a caller may hand either
    path the same batch.
    """
    from trustedai_cl_vae_ad_tpu.models.cvae import normalize_image_input

    dtype = core.dtype
    enc = qparams["encoder"]

    if x.dtype == jnp.uint8:
        x = normalize_image_input(x)
    h = x.astype(dtype)
    for i, _ in enumerate(core.conv_filters):
        p = enc[f"Conv_{i}"]
        h = (
            lax.conv_general_dilated(
                h,
                p["kernel"].astype(dtype),
                (2, 2),
                "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            + p["bias"].astype(dtype)
        )
        h = jax.nn.relu(h)
    h = h.reshape((h.shape[0], -1))
    j = 0
    if core.encoder_dense_filters:
        h = _dense(enc[f"Dense_{j}"], h, dtype, mode)
        j += 1
    out = _dense(enc[f"Dense_{j}"], h, dtype, mode).astype(jnp.float32)
    mean, logvar = jnp.split(out, 2, axis=1)

    # eval-mode reparameterize: z = mean + 0.5*logvar (eps = 0)
    z = mean + 0.5 * logvar

    dec = qparams["decoder"]
    dw, dh, df = core.dense_shape
    g = _dense(dec["Dense_0"], z, dtype, mode)
    g = jax.nn.relu(g).reshape((g.shape[0], dw, dh, df))
    filters = list(reversed(list(core.conv_filters)))
    for i, _ in enumerate(filters):
        p = dec[f"ConvTranspose_{i}"]
        g = conv_transpose_same(g, p["kernel"].astype(dtype), (2, 2)) + p["bias"].astype(dtype)
        g = jax.nn.relu(g)
    p = dec[f"ConvTranspose_{len(filters)}"]
    g = conv_transpose_same(g, p["kernel"].astype(dtype), (1, 1)) + p["bias"].astype(dtype)
    return jax.nn.sigmoid(g.astype(jnp.float32))
