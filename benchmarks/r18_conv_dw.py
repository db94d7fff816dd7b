#!/usr/bin/env python3
"""r18 probe: hand Pallas implicit-GEMM kernel for the channel-narrow conv dW.

The one unprobed lever class after r14 (VERDICT r4 #4): encoder conv1/conv2
weight gradients contract batch x spatial into a tiny (3,3,CI,CO) output with
CI = 3 / 32 input lanes — XLA's fused dW+Adam ops sit at 0.88 roofline
attainment (traces/train_step_b768_vmem96m_roofline.json: 5.0 ms + 6.8 ms of
the 126.6 ms step). This kernel contracts over batch x spatial as an
implicit GEMM per image: build the 9-tap im2col matrix A (P, 9*CI) from
static shifted slices IN VMEM (no lane-padded conv layout), one
dot_general((9*CI, P) @ (P, CO)) per image, f32 accumulation across the
sequential grid.

A priori roofline note (recorded before measuring): with a tiny output tile
the MXU is K-streaming-bound — cycles >= total contracted samples
(12.9M for conv1 at b768 ~ 13.7 ms at 940 MHz), so the MXU mapping is
predicted to LOSE to XLA's VPU-style fused reduction; the probe exists to
put a NUMBER on the lever either way (BENCH_NOTES r18).

Modes:
  --check   CPU interpret-mode correctness vs jax.grad of the same conv
  --bench   full flagship train+score step A/B at b768 on TPU
            (baseline / conv1-patched / conv1+conv2-patched)

Run foreground from the repo root (single TPU client).
"""

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

os.environ.setdefault(
    "TCVAE_COMPILE_CACHE",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".xla_cache"),
)
os.environ.setdefault("TCVAE_COMPILER_OPTIONS", "xla_tpu_scoped_vmem_limit_kib=98304")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

_INTERPRET = False


def _dw_kernel(pee_ref, peo_ref, poe_ref, poo_ref, dy_ref, out_ref, *,
               oh, ow, ci, co):
    """One grid step = one image. The stride-2 tap selection arrives
    pre-decomposed into 4 parity planes (built by XLA — in-kernel strided
    gathers made the Mosaic compile blow up/hang at 226x302); tap (kh, kw)
    is then a CONTIGUOUS static slice of plane (kh%2, kw%2). im2col
    A (P, 9*CI) -> one (9*CI, P) @ (P, CO) dot, f32 accumulation into the
    shared output block (sequential TPU grid)."""
    b = pl.program_id(0)
    planes = {(0, 0): pee_ref[0], (0, 1): peo_ref[0],
              (1, 0): poe_ref[0], (1, 1): poo_ref[0]}  # (OH+1, OW+1, CI)
    dy = dy_ref[0]                                     # (OH, OW, CO)
    parts = []
    for kh in range(3):
        for kw in range(3):
            p = planes[(kh % 2, kw % 2)]
            s = p[kh // 2:kh // 2 + oh, kw // 2:kw // 2 + ow, :]
            parts.append(s.reshape(oh * ow, ci))
    a = jnp.concatenate(parts, axis=1)              # (P, 9*CI)
    dyf = dy.reshape(oh * ow, co)
    partial = jax.lax.dot_general(
        a, dyf, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )                                               # (9*CI, CO) f32

    @pl.when(b == 0)
    def _init():
        out_ref[:] = partial

    @pl.when(b != 0)
    def _acc():
        out_ref[:] += partial


def conv_dw_pallas(x, dy):
    """dW for a 3x3 stride-2 SAME NHWC conv (even H, W), contracting
    batch x spatial without the conv layout's lane padding.

    Returns (3, 3, CI, CO) float32. SAME for k=3,s=2,even dims pads
    (0 top, 1 bottom, 0 left, 1 right); the parity planes carry one extra
    row/col (the pad) so every tap is a contiguous in-bounds slice."""
    b, h, w, ci = x.shape
    _, oh, ow, co = dy.shape
    assert (h, w) == (2 * oh, 2 * ow), (x.shape, dy.shape)
    xp = jnp.pad(x, ((0, 0), (0, 2), (0, 2), (0, 0)))
    # parity planes (B, OH+1, OW+1, CI): [kh%2][kw%2] selects the residue
    planes = [xp[:, r::2, c::2, :] for r in (0, 1) for c in (0, 1)]
    plane_shape = (1, oh + 1, ow + 1, ci)
    out = pl.pallas_call(
        functools.partial(_dw_kernel, oh=oh, ow=ow, ci=ci, co=co),
        grid=(b,),
        in_specs=[pl.BlockSpec(plane_shape, lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)] * 4 +
                 [pl.BlockSpec((1, oh, ow, co), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((9 * ci, co), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((9 * ci, co), jnp.float32),
        interpret=_INTERPRET,
    )(*planes, dy)
    return out.reshape(3, 3, ci, co)


def _conv_fwd(x, kernel):
    return jax.lax.conv_general_dilated(
        x, kernel, (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


@jax.custom_vjp
def conv2d_s2_pallas_dw(x, kernel):
    return _conv_fwd(x, kernel)


def _vjp_fwd(x, kernel):
    return _conv_fwd(x, kernel), (x, kernel)


def _vjp_bwd(res, dy):
    x, kernel = res
    # dx: the standard transposed-conv data gradient (unchanged — XLA's);
    # dW: the Pallas implicit GEMM under probe
    _, pullback = jax.vjp(lambda xx: _conv_fwd(xx, kernel), x)
    (dx,) = pullback(dy)
    dw = conv_dw_pallas(x, dy).astype(kernel.dtype)
    return dx, dw


conv2d_s2_pallas_dw.defvjp(_vjp_fwd, _vjp_bwd)


def check():
    global _INTERPRET
    _INTERPRET = True
    rng = np.random.RandomState(0)
    for (b, h, w, ci, co) in [(2, 8, 12, 3, 8), (3, 16, 16, 5, 4)]:
        x = jnp.asarray(rng.standard_normal((b, h, w, ci)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((3, 3, ci, co)) * 0.1, jnp.float32)
        dy_seed = jnp.asarray(rng.standard_normal((b, h // 2, w // 2, co)),
                              jnp.float32)
        ref = jax.grad(lambda kk: jnp.sum(_conv_fwd(x, kk) * dy_seed))(k)
        got = conv_dw_pallas(x, dy_seed)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)
        # the custom-vjp wrapper reproduces BOTH gradients
        f = lambda xx, kk: jnp.sum(conv2d_s2_pallas_dw(xx, kk) * dy_seed)
        gx, gk = jax.grad(f, argnums=(0, 1))(x, k)
        rx, rk = jax.grad(
            lambda xx, kk: jnp.sum(_conv_fwd(xx, kk) * dy_seed),
            argnums=(0, 1))(x, k)
        np.testing.assert_allclose(np.asarray(gk), np.asarray(rk), rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), rtol=1e-4, atol=1e-4)
    print("check ok")


def bench(batch=768, steps=20, warmup=3):
    import optax

    sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))
    from bench import _flagship_config, build_bench_step

    from trustedai_cl_vae_ad_tpu.models.kurtosis_global import KurtosisGlobalCVAE
    from trustedai_cl_vae_ad_tpu.ops.adam import adam_lean

    results = []
    for label, patch in [("baseline", 0), ("conv1_pallas_dw", 1),
                         ("conv12_pallas_dw", 2)]:
        core = KurtosisGlobalCVAE(_flagship_config(), dtype=jnp.bfloat16,
                                  param_dtype=jnp.bfloat16)
        if patch:
            core.encoder = _patched_encoder(core.encoder, patch)
        params = core.init(jax.random.PRNGKey(0))
        optimizer = adam_lean(1e-4)
        opt_state = optimizer.init(params)
        step_fn = build_bench_step(core, optimizer)
        x = jnp.asarray(np.random.RandomState(0).randint(
            0, 256, (batch, 224, 300, 3), np.uint8))
        mu, sigma = jnp.float32(100.0), jnp.float32(10.0)
        rngs = jax.random.split(jax.random.PRNGKey(1), warmup + steps)
        for i in range(warmup):
            params, opt_state, loss, z = step_fn(params, opt_state, x, rngs[i], mu, sigma)
        float(loss)  # device fence (block_until_ready lies on this runtime)
        t0 = time.perf_counter()
        for i in range(steps):
            params, opt_state, loss, z = step_fn(params, opt_state, x,
                                                 rngs[warmup + i], mu, sigma)
        last = float(loss)
        dt = time.perf_counter() - t0
        assert np.isfinite(last)
        fps = batch * steps / dt
        row = {"probe": "r18_conv_dw", "variant": label, "batch": batch,
               "fps": round(fps, 1), "ms_per_step": round(1000 * dt / steps, 2)}
        print(json.dumps(row), flush=True)
        results.append(row)
        del params, opt_state, step_fn
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "r18_results.jsonl")
    with open(out, "a") as f:
        for row in results:
            f.write(json.dumps(row) + "\n")


def _patched_encoder(base, patch_convs):
    """Encoder clone routing the first ``patch_convs`` convs' dW through the
    Pallas kernel. Same param tree (Conv_i kernel/bias)."""
    import flax.linen as nn

    from trustedai_cl_vae_ad_tpu.models.cvae import Encoder, _glorot

    class ProbeEncoder(Encoder):
        @nn.compact
        def __call__(self, x):
            x = x.astype(self.dtype)
            for i, filters in enumerate(self.conv_filters):
                if i < patch_convs and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
                    ci = x.shape[-1]
                    kernel = self.param(f"probe_conv_{i}", _glorot,
                                        (3, 3, ci, filters), self.param_dtype)
                    bias = self.param(f"probe_bias_{i}", nn.initializers.zeros,
                                      (filters,), self.param_dtype)
                    x = conv2d_s2_pallas_dw(x, kernel.astype(self.dtype))
                    x = x + bias.astype(self.dtype)
                else:
                    x = nn.Conv(features=filters, kernel_size=(3, 3),
                                strides=(2, 2), padding="SAME", dtype=self.dtype,
                                param_dtype=self.param_dtype,
                                kernel_init=_glorot, name=f"Conv_{i}")(x)
                x = nn.relu(x)
            x = x.reshape((x.shape[0], -1))
            if self.encoder_dense_filters:
                x = nn.Dense(int(self.encoder_dense_filters), dtype=self.dtype,
                             param_dtype=self.param_dtype, kernel_init=_glorot)(x)
            x = nn.Dense(2 * self.latent_size, dtype=self.dtype,
                         param_dtype=self.param_dtype, kernel_init=_glorot)(x)
            return x.astype(jnp.float32)

    return ProbeEncoder(
        conv_filters=base.conv_filters, latent_size=base.latent_size,
        encoder_dense_filters=base.encoder_dense_filters, dtype=base.dtype,
        param_dtype=base.param_dtype)


def kernel_only(batch=768, steps=10):
    """Standalone kernel timing at the flagship conv1/conv2 shapes: a LOWER
    bound on the integrated cost (standalone jits materialize inputs the
    real step would fuse — CLAUDE.md r11) — if this alone is >= the fused
    XLA dW+Adam op it replaces (5.0 / 6.8 ms, roofline report), the lever
    is a dead end without needing the full-step integration to compile."""
    rng = np.random.RandomState(0)
    for label, (h, w, ci, co) in [("conv1", (224, 300, 3, 32)),
                                  ("conv2", (112, 150, 32, 64))]:
        x = jnp.asarray(rng.standard_normal((batch, h, w, ci)), jnp.bfloat16)
        dy = jnp.asarray(rng.standard_normal((batch, h // 2, w // 2, co)),
                         jnp.bfloat16)
        f = jax.jit(conv_dw_pallas)
        out = f(x, dy)
        s = float(jnp.sum(out))  # fence
        t0 = time.perf_counter()
        for _ in range(steps):
            out = f(x, dy)
        float(jnp.sum(out))
        dt = (time.perf_counter() - t0) / steps
        row = {"probe": "r18_conv_dw", "variant": f"kernel_only_{label}",
               "batch": batch, "ms": round(dt * 1e3, 2),
               "fused_xla_baseline_ms": 5.0 if label == "conv1" else 6.8}
        print(json.dumps(row), flush=True)
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "r18_results.jsonl"), "a") as fjl:
            fjl.write(json.dumps(row) + "\n")
        assert np.isfinite(s)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--bench", action="store_true")
    ap.add_argument("--kernel", action="store_true")
    ap.add_argument("--batch", type=int, default=768)
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()
    if args.check:
        check()
    if args.kernel:
        kernel_only(batch=args.batch)
    if args.bench:
        bench(batch=args.batch, steps=args.steps)


if __name__ == "__main__":
    main()
