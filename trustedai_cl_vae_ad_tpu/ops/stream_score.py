"""Fused streaming anomaly scorer: per-pixel EMA statistics -> scalar score.

Exact math parity with the reference's live scoring block
(camera_streamer_qt.py:1366-1400):
  * err = sum_ch (x - x_hat)^2                       (per-pixel map)
  * EMA min/max -> normalized error image (uint8)    (:1372-1376)
  * EMA of err and err^2 -> per-pixel variance -> per-pixel z-scores
    z = (err - ema)/sqrt(|ema2 - ema^2| + 1e-10)     (:1386-1389)
  * z-of-z: standardize z over the frame, count pixels with zz > 3 (:1391-1395)
  * EMA of that count and its square -> standardized scalar anomaly score
    score = (count - ema_c)/sqrt(ema_c2 - ema_c^2)   (:1397-1400)

The reference computes this as ~15 separate TF ops with host round-trips per
tick; here the whole update is ONE fused Pallas kernel over the (H, W) maps
(jnp fallback off-TPU), with the EMA state kept on device. State layout:

  maps:    (2, H, W) float32 — [err_ema, err_sq_ema]
  scalars: (6,) float32 — [err_min_ema, err_max_ema, count_ema, count_sq_ema,
                           initialized, unused]

All outputs (new state, norm-err map, score, count) come back from one call.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_INTERPRET = False


class StreamScoreState(NamedTuple):
    maps: Array     # (2, H, W): [err_sum_ma, err_sum_2_ma]
    scalars: Array  # (6,): [min_ema, max_ema, as_sum, as_sum_2, initialized, 0]


def init_state(height: int, width: int) -> StreamScoreState:
    return StreamScoreState(
        maps=jnp.zeros((2, height, width), jnp.float32),
        scalars=jnp.zeros((6,), jnp.float32),
    )


def _score_math(err, maps, scalars, alpha):
    """Shared update math (used by both the jnp path and the Pallas kernel).

    ``scalars`` is a 6-tuple of scalar values (SMEM allows only scalar loads,
    so the kernel reads them individually).
    """
    initialized = scalars[4]
    e_min = jnp.min(err)
    e_max = jnp.max(err)
    # EMA min/max for display normalization (:1372-1373)
    min_ema = alpha * scalars[0] + (1.0 - alpha) * e_min
    max_ema = alpha * scalars[1] + (1.0 - alpha) * e_max
    denom = max_ema - min_ema
    norm = (err - min_ema) / jnp.where(denom == 0, 1.0, denom)

    # first frame: seed the map EMAs with the frame itself (:1381-1384)
    prev_ema = jnp.where(initialized > 0, maps[0], err)
    prev_ema2 = jnp.where(initialized > 0, maps[1], err * err)
    err_ema = alpha * prev_ema + (1.0 - alpha) * err
    err_ema2 = alpha * prev_ema2 + (1.0 - alpha) * err * err
    var = jnp.abs(err_ema2 - err_ema * err_ema)
    z = (err - err_ema) * jax.lax.rsqrt(var + 1e-10)

    z_mean = jnp.mean(z)
    z_std = jnp.std(z)
    zz = (z - z_mean) / jnp.where(z_std == 0, 1.0, z_std)
    count = jnp.sum((zz > 3.0).astype(jnp.float32))

    as_sum = alpha * scalars[2] + (1.0 - alpha) * count
    as_sum2 = alpha * scalars[3] + (1.0 - alpha) * count * count
    # parity note: the reference takes sqrt of the RAW variance estimate
    # (camera_streamer_qt.py:1399-1400) — NaN when it rounds negative; NaN is
    # filtered downstream exactly as the reference does (:1407).
    a_var = as_sum2 - as_sum * as_sum
    score = (count - as_sum) / jnp.sqrt(a_var)

    new_maps = jnp.stack([err_ema, err_ema2])
    new_scalars = (min_ema, max_ema, as_sum, as_sum2, jnp.float32(1.0), jnp.float32(0.0))
    return new_maps, new_scalars, norm, score, count


def _stream_jnp(img, rec, maps, scalars, alpha):
    err = jnp.sum((img - rec) ** 2, axis=-1)
    scalar_tuple = tuple(scalars[i] for i in range(6))
    maps_o, scal_o, norm, score, count = _score_math(err, maps, scalar_tuple, alpha)
    return maps_o, jnp.stack(scal_o), norm, score, count


def _stream_kernel(img_ref, rec_ref, maps_ref, scal_ref, alpha_ref,
                   out_maps_ref, out_scal_ref, norm_ref, score_ref):
    # img/rec arrive channel-major (C, H, W): with HWC the 3-channel lane dim
    # would pad to 128 lanes (34 MB per buffer at 224x300) and blow VMEM.
    img = img_ref[:]
    rec = rec_ref[:]
    alpha = alpha_ref[0]
    err = jnp.sum((img - rec) ** 2, axis=0)
    scalar_tuple = tuple(scal_ref[i] for i in range(6))  # SMEM: scalar loads only
    new_maps, new_scalars, norm, score, count = _score_math(
        err, maps_ref[:], scalar_tuple, alpha
    )
    out_maps_ref[:] = new_maps
    for i in range(6):
        out_scal_ref[i] = new_scalars[i]
    norm_ref[:] = norm
    score_ref[0] = score
    score_ref[1] = count


def _stream_pallas(img, rec, maps, scalars, alpha):
    h, w = img.shape[0], img.shape[1]
    img = jnp.transpose(img, (2, 0, 1))  # HWC -> CHW (see kernel note)
    rec = jnp.transpose(rec, (2, 0, 1))
    out_maps, out_scal, norm, score_count = pl.pallas_call(
        _stream_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((2, h, w), jnp.float32),
            jax.ShapeDtypeStruct((6,), jnp.float32),
            jax.ShapeDtypeStruct((h, w), jnp.float32),
            jax.ShapeDtypeStruct((2,), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            # ~15 (H, W) f32 intermediates live on the kernel stack at 224x300;
            # raise the scoped-vmem ceiling from the 16 MiB default (v5e has
            # 128 MiB VMEM per core).
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_INTERPRET,
    )(img, rec, maps, scalars, jnp.reshape(alpha, (1,)))
    return out_maps, out_scal, norm, score_count[0], score_count[1]


def stream_score_step(
    state: StreamScoreState, img: Array, rec: Array, alpha
) -> Tuple[StreamScoreState, Array, Array, Array]:
    """One scorer update. img/rec: (H, W, C) f32 in [0,1]; alpha: EMA weight.

    Returns (new_state, norm_err_map f32 [~0,1], anomaly_score, pixel_count).
    """
    alpha = jnp.asarray(alpha, jnp.float32)
    use_pallas = _INTERPRET or (
        jax.default_backend() == "tpu" and img.size * 4 * 6 <= 12 * 1024 * 1024
    )
    if use_pallas:
        maps, scalars, norm, score, count = _stream_pallas(
            img, rec, state.maps, state.scalars, alpha
        )
    else:
        maps, scalars, norm, score, count = _stream_jnp(
            img, rec, state.maps, state.scalars, alpha
        )
    return StreamScoreState(maps, scalars), norm, score, count


def stream_score_step_reference(state, img, rec, alpha):
    """Pure-jnp path, for kernel validation."""
    maps, scalars, norm, score, count = _stream_jnp(
        img, rec, state.maps, state.scalars, jnp.asarray(alpha, jnp.float32)
    )
    return StreamScoreState(maps, scalars), norm, score, count
