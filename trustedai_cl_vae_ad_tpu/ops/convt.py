"""Transposed conv (gradient-of-conv) with a reverse-free custom VJP.

The decoder's stride-2/stride-1 SAME transposed convs (cvae.py Decoder,
mirroring reference abstract_cvae.py:83-88) autodiff into HLO that spatially
REVERSES the full activation tensors before the dW convolutions — ~10 ms/step
of pure data movement on the flagship at batch 512 (round-2 trace,
benchmarks/traces/train_step_b512_summary.json: %reverse.2 on
bf16[512,224,300,32] alone is 6.6 ms). Because a transposed conv is itself
the adjoint of a strided conv, both of its gradients are expressible as
plain (dilated) convolutions with NO reversal of either operand:

  y = convT_s(x, P)                       P: (kh, kw, O, I), NHWC, TF-SAME
  dX = conv_s^SAME(dy, P)                 P read as HWIO with I=O_y, O=I_x
  dW[t,o,i] = sum_{b,q} x[b,q,i] dy[b, s*q + t - pl, o]
            = conv(lhs=dy, rhs=x, stride 1, rhs_dilation s,
                   pads (pl, k - s - pl), dims ("CHWN","IHWO","CHWN"))
              transposed (1,2,3,0), with pl = (k - s)//2  [TF-SAME split]

Validated against autodiff of flax nn.ConvTranspose(transpose_kernel=True)
to 1e-5 over strides/odd sizes/channel combos (tests/test_convt.py).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

import flax.linen as nn

Array = jax.Array


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv_transpose_same(x: Array, kernel: Array, strides: Tuple[int, int]) -> Array:
    """NHWC TF-SAME transposed conv, kernel (kh, kw, out, in) —
    identical to flax nn.ConvTranspose(transpose_kernel=True) sans bias."""
    return lax.conv_transpose(x, kernel, strides, "SAME", transpose_kernel=True)


def _fwd(x, kernel, strides):
    return conv_transpose_same(x, kernel, strides), (x, kernel)


def _same_pads(k: int, s: int) -> Tuple[int, int]:
    total = k - s
    lo = total // 2
    return lo, total - lo


def _bwd(strides, res, dy):
    x, kernel = res
    kh, kw = kernel.shape[0], kernel.shape[1]
    sh, sw = strides
    # dX: the adjoint of the adjoint is the strided conv itself; the kernel's
    # (O, I) slots already line up with (dy channels, x channels) under HWIO
    dx = lax.conv_general_dilated(
        dy, kernel, (sh, sw), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    # dW: batch-contracting dilated conv; no operand is reversed
    ph = _same_pads(kh, sh)
    pw = _same_pads(kw, sw)
    dw = lax.conv_general_dilated(
        dy, x, (1, 1), (ph, pw), rhs_dilation=(sh, sw),
        dimension_numbers=("CHWN", "IHWO", "CHWN"),
    )
    dw = dw.transpose(1, 2, 3, 0).astype(kernel.dtype)
    return dx.astype(x.dtype), dw


conv_transpose_same.defvjp(_fwd, _bwd)

_glorot = nn.initializers.glorot_uniform()


class ConvTransposeG(nn.Module):
    """Drop-in for nn.ConvTranspose(transpose_kernel=True, padding='SAME')
    with the reverse-free VJP. Same parameter tree (kernel (kh,kw,out,in),
    bias) — pass ``name="ConvTranspose_i"`` to keep checkpoint keys identical.
    """

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (2, 2)
    dtype: object = jnp.float32
    param_dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        ci = x.shape[-1]
        kernel = self.param(
            "kernel", _glorot, (*self.kernel_size, self.features, ci), self.param_dtype
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), self.param_dtype)
        y = conv_transpose_same(
            x.astype(self.dtype), kernel.astype(self.dtype), tuple(self.strides)
        )
        return y + bias.astype(self.dtype)
