"""Chunked image-space loss reductions shared by both CVAE families.

Evaluates every full-resolution reduction (MSE, per-pixel batch std, min/max,
optional softmax-over-everything cross-entropy) in ``chunks`` sequential batch
slices via ``lax.map`` + ``jax.checkpoint``, accumulating in float32. No
float32 [B, H, W, C] tensor is ever materialized: ``x`` keeps its input dtype
(uint8 stays uint8) and ``x_hat`` keeps the compute dtype; each chunk's f32
view lives only inside a fused reduction — including in the backward pass,
where checkpointing recomputes the chunk from its slices.

Why: at the flagship shape the f32 loss tensors hit XLA's 2 GiB single-buffer
limit at batch 896 (BENCH_NOTES.md round 3 — the batch sweep itself turned out
activation-bound, but the chunked path is the correct tool for larger-frame
configs where even small batches cross the wall).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax


class ChunkedImageStats(NamedTuple):
    mse: jnp.ndarray
    x_std_loss: jnp.ndarray
    r_min: jnp.ndarray
    r_max: jnp.ndarray
    cross_entropy: Optional[jnp.ndarray]  # None unless requested


def _norm(xu):
    if xu.dtype == jnp.uint8:
        return xu.astype(jnp.float32) / 255.0
    return xu.astype(jnp.float32)


def chunked_image_stats(x, x_hat, chunks: int,
                        with_cross_entropy: bool = False) -> ChunkedImageStats:
    """x: [B, H, W, C] (uint8 or float); x_hat: [B, H, W, C] (any float)."""
    b = x.shape[0]
    if b % chunks != 0:
        raise ValueError(f"batch {b} not divisible by chunks {chunks}")
    h, w, c = x.shape[1], x.shape[2], x.shape[3]
    n_el = float(b * h * w * c)

    xc = x.reshape(chunks, b // chunks, h, w, c)
    xhc = x_hat.reshape(chunks, b // chunks, h, w, c)

    # pass 1: every reduction with no cross-batch prerequisite
    @jax.checkpoint
    def _pass1(args):
        xu, xh = args
        xf = _norm(xu)
        xhf = xh.astype(jnp.float32)
        ce_terms = (
            (jnp.sum(jnp.exp(xf)), jnp.sum(xhf * xf), jnp.sum(xhf))
            if with_cross_entropy
            else (jnp.float32(0), jnp.float32(0), jnp.float32(0))
        )
        return ce_terms + (
            jnp.sum((xf - xhf) ** 2),   # mse numerator (the grad path)
            jnp.sum(xf, axis=0),        # per-pixel batch sums for std
            jnp.sum(xhf, axis=0),
            jnp.min(xhf),
            jnp.max(xhf),
        )

    (s_exp, s_xh_x, s_xh, s_sq, s_x_pix, s_xh_pix, mins, maxs) = lax.map(
        _pass1, (xc, xhc)
    )
    mse = jnp.sum(s_sq) / n_el
    r_min = jnp.min(mins)
    r_max = jnp.max(maxs)

    cross_entropy = None
    if with_cross_entropy:
        # -mean(x_hat * (x - log S)) == -mean(x_hat * log(exp(x)/S))
        log_s = jnp.log(jnp.sum(s_exp))
        cross_entropy = -(jnp.sum(s_xh_x) - log_s * jnp.sum(s_xh)) / n_el

    # pass 2: per-pixel std over the batch axis (two-pass, as jnp.std)
    x_mean_pix = jnp.sum(s_x_pix, axis=0) / b
    xh_mean_pix = jnp.sum(s_xh_pix, axis=0) / b

    @jax.checkpoint
    def _pass2(args):
        xu, xh = args
        xf = _norm(xu)
        xhf = xh.astype(jnp.float32)
        return (
            jnp.sum((xf - x_mean_pix) ** 2, axis=0),
            jnp.sum((xhf - xh_mean_pix) ** 2, axis=0),
        )

    s2_x, s2_xh = lax.map(_pass2, (xc, xhc))
    x_std = jnp.sqrt(jnp.sum(s2_x, axis=0) / b)
    x_hat_std = jnp.sqrt(jnp.sum(s2_xh, axis=0) / b)
    x_std_loss = jnp.mean((x_std - x_hat_std) ** 2)

    return ChunkedImageStats(mse, x_std_loss, r_min, r_max, cross_entropy)


def encoder_view(x, dtype):
    """The normalized cast chain the encoder consumes — identical numerics to
    feeding the unchunked path a pre-normalized f32 tensor (single consumer:
    XLA fuses the u8->f32->/255->dtype chain into the first conv)."""
    if x.dtype == jnp.uint8:
        return _norm(x).astype(dtype)
    return x
