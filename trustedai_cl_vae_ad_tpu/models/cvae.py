"""Convolutional VAE core, TPU-native.

Functional JAX re-architecture of the reference AbstractCVAE
(/root/reference/src/abstract_cvae.py:7-178). The reference is a Keras
``tf.keras.Model`` with mutable submodels; here the network is a pair of
flax.linen modules with pure apply functions, so the whole forward/loss/train
step can be jit/pjit-compiled once and sharded over a device mesh.

Behavioral parity notes (quirks intentionally preserved):
  * reparameterize is ``z = mean + 0.5 * logvar + eps`` — NOT the textbook
    ``mean + exp(0.5*logvar) * eps`` (abstract_cvae.py:124-129). eps ~ N(0,1)
    only when training, zeros otherwise.
  * ``encode(x, training=True)`` adds N(0, beta) input noise
    (abstract_cvae.py:115-118), but call_detailed/call never forward
    ``training`` into encode (abstract_cvae.py:139-149), so the input-noise
    path is dead during loss computation — exactly as in the reference.
  * decode applies sigmoid only when asked (abstract_cvae.py:131-137);
    call/call_detailed always request sigmoid.
  * encoder: stride-2 3x3 SAME convs with relu, flatten, optional dense,
    dense(2*latent) (abstract_cvae.py:22-48). decoder: dense(relu) ->
    reshape(floor(W/2^L), floor(H/2^L), ddf) -> stride-2 3x3 SAME transposed
    convs with relu -> stride-1 3x3 SAME transposed conv, linear
    (abstract_cvae.py:51-92), including the width/height collapse RuntimeErrors
    (abstract_cvae.py:65-68).

TF 'same' padding semantics are matched exactly: lax 'SAME' convolutions use
the identical asymmetric-padding formula, and transposed convs use
``transpose_kernel=True`` (gradient-of-conv), which is what Keras
Conv2DTranspose computes.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

Array = jax.Array

_glorot = nn.initializers.glorot_uniform()


def normalize_image_input(x: Array) -> Array:
    """uint8 frames are raw 0-255 pixels: normalize on device (the ingest
    contract — data/ingest.py, reference data_loader.py:10-14). Float inputs
    are already normalized and widen to float32 for the loss statistics.

    Applied at every loss/encode entry so a uint8 batch means the same thing
    on every path (chunked, unchunked, data-parallel, direct API) — under jit
    the u8->f32->/255 chain fuses into the first consumer, so keeping batches
    uint8 up to this point is also the 4x-smaller-transfer fast path."""
    if x.dtype == jnp.uint8:
        return x.astype(jnp.float32) / 255.0
    return x.astype(jnp.float32)


def _conv1_s2d(x: Array, kernel: Array, bias: Array) -> Array:
    """Space-to-depth evaluation of the encoder's first stride-2 3x3 SAME conv
    (abstract_cvae.py:22-29): 2x2 input pixels pack into channels (3 -> 12 of
    the 128 MXU lanes), the stride-2 3x3 conv becomes a stride-1 2x2 conv on
    the packed grid. Bit-identical to nn.Conv(strides=2, padding='SAME') for
    even H, W — the TF SAME pad here is (top 0, bottom 1): output (i, j)
    reads input rows 2i..2i+2, so after padding H+2 (one SAME pad row + one
    block-parity row, both zero) tap (dy, dx) lands in block (dy//2, dx//2)
    at within-block offset (dy%2, dx%2).

    Rationale: encoder conv1's RGB input uses 3/128 input lanes; its dW
    backward is one of the lane-padded residuals in the roofline trace
    (BENCH_NOTES r14 measures the full-step effect).
    """
    B, H, W, C = x.shape
    Co = kernel.shape[-1]
    xp = jnp.pad(x, ((0, 0), (0, 2), (0, 2), (0, 0)))
    Hb, Wb = (H + 2) // 2, (W + 2) // 2
    xs = (
        xp.reshape(B, Hb, 2, Wb, 2, C)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(B, Hb, Wb, 4 * C)
    )
    K2 = jnp.zeros((2, 2, 4 * C, Co), kernel.dtype)
    for dy in range(3):
        for dx in range(3):
            base = (dy % 2) * 2 * C + (dx % 2) * C
            K2 = K2.at[dy // 2, dx // 2, base : base + C, :].set(kernel[dy, dx])
    y = jax.lax.conv_general_dilated(
        xs, K2, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    return y + bias.astype(y.dtype)


class _ConvS2D(nn.Module):
    """Stride-2 3x3 SAME conv with nn.Conv's parameter tree (kernel
    (3,3,Ci,Co), bias) so checkpoints are interchangeable; evaluates via the
    space-to-depth fast path when H, W are even, plain nn.Conv otherwise."""

    features: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        ci = x.shape[-1]
        kernel = self.param("kernel", _glorot, (3, 3, ci, self.features), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), self.param_dtype)
        x = x.astype(self.dtype)
        if x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
            return _conv1_s2d(x, kernel.astype(self.dtype), bias)
        return (
            jax.lax.conv_general_dilated(
                x,
                kernel.astype(self.dtype),
                (2, 2),
                "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            + bias.astype(self.dtype)
        )


class Encoder(nn.Module):
    """Conv encoder producing the concatenated (mean, logvar) vector.

    Mirrors reference abstract_cvae.py:22-48.
    """

    conv_filters: Sequence[int]
    latent_size: int
    encoder_dense_filters: Optional[int] = None
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    # evaluate the first conv (channel-narrow RGB input) via space-to-depth
    # packing (_conv1_s2d). Off by default pending the r14 measurement.
    s2d_input: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = x.astype(self.dtype)
        for i, filters in enumerate(self.conv_filters):
            if self.s2d_input and i == 0:
                x = _ConvS2D(
                    features=filters,
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name="Conv_0",  # keep checkpoint keys
                )(x)
                x = nn.relu(x)
                continue
            x = nn.Conv(
                features=filters,
                kernel_size=(3, 3),
                strides=(2, 2),
                padding="SAME",
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                kernel_init=_glorot,
                name=f"Conv_{i}",  # flax auto-naming restarts per class:
                # with _ConvS2D holding "Conv_0", the first nn.Conv would
                # otherwise ALSO claim Conv_0
            )(x)
            x = nn.relu(x)
        x = x.reshape((x.shape[0], -1))  # row-major HWC flatten, as Keras Flatten
        if self.encoder_dense_filters:
            x = nn.Dense(
                int(self.encoder_dense_filters),
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                kernel_init=_glorot,
            )(x)
        x = nn.Dense(
            2 * self.latent_size, dtype=self.dtype, param_dtype=self.param_dtype, kernel_init=_glorot
        )(x)
        return x.astype(jnp.float32)


class Decoder(nn.Module):
    """Transposed-conv decoder producing reconstruction logits.

    Mirrors reference abstract_cvae.py:51-92.
    """

    conv_filters: Sequence[int]  # encoder order; applied reversed
    dense_shape: Tuple[int, int, int]  # (dense_width, dense_height, dense_filters)
    output_channels: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    # reverse-free custom VJP for the transposed convs (ops/convt.py):
    # bit-identical forward and checkpoint tree; autodiff's HLO reverses the
    # full activations in the dW path — measured 110.9 -> 94.9 ms/step on the
    # flagship at batch 512 (+17%). model.fast_vjp: false opts out.
    fast_vjp: bool = True

    @nn.compact
    def __call__(self, z: Array) -> Array:
        dw, dh, df = self.dense_shape
        x = nn.Dense(
            dw * dh * df, dtype=self.dtype, param_dtype=self.param_dtype, kernel_init=_glorot
        )(z.astype(self.dtype))
        x = nn.relu(x)
        x = x.reshape((x.shape[0], dw, dh, df))

        def upconv(x, features, strides, idx):
            if self.fast_vjp:
                from trustedai_cl_vae_ad_tpu.ops.convt import ConvTransposeG

                return ConvTransposeG(
                    features=features,
                    strides=strides,
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name=f"ConvTranspose_{idx}",  # keep checkpoint keys
                )(x)
            return nn.ConvTranspose(
                features=features,
                kernel_size=(3, 3),
                strides=strides,
                padding="SAME",
                transpose_kernel=True,  # gradient-of-conv == Keras Conv2DTranspose
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                kernel_init=_glorot,
            )(x)

        filters = list(reversed(list(self.conv_filters)))
        for i, f in enumerate(filters):
            x = upconv(x, f, (2, 2), i)
            x = nn.relu(x)
        x = upconv(x, self.output_channels, (1, 1), len(filters))
        return x.astype(jnp.float32)


def _rgb_head_s2d(x: Array, P: Array, bias: Array, s: int = 4) -> Array:
    """Space-to-depth evaluation of the decoder's final stride-1 3x3 SAME
    transposed conv (abstract_cvae.py:88): one stride-s conv producing
    s*s*C_out channel groups + depth-to-space, packing the 3-channel output
    into MXU lanes. Bit-identical to nn.ConvTranspose(transpose_kernel=True)
    incl. both gradients (tests/test_tf_semantics.py).

    NOTE: measured perf-neutral vs XLA's native lowering on TPU v5e (15.3 ms
    vs 14.4 ms decoder fwd at 224x300 batch 256), so the Decoder uses plain
    nn.ConvTranspose; kept as a validated alternate for hardware where the
    narrow-output conv is the bottleneck.

    P is the flax ConvTranspose kernel, layout (kh, kw, out, in).
    """
    B, H, W, Ci = x.shape
    Co = P.shape[2]
    # gradient-of-conv == plain conv with spatially flipped, (in,out)-swapped kernel
    Keff = jnp.flip(P, (0, 1)).transpose(0, 1, 3, 2)  # (3, 3, Ci, Co)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    ks = s + 2
    Kbig = jnp.zeros((ks, ks, Ci, s, s, Co), x.dtype)
    for sy in range(s):
        for sx in range(s):
            Kbig = Kbig.at[sy : sy + 3, sx : sx + 3, :, sy, sx, :].add(Keff.astype(x.dtype))
    Kbig = Kbig.reshape(ks, ks, Ci, s * s * Co)
    yb = jax.lax.conv_general_dilated(
        xp, Kbig, (s, s), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    y = (
        yb.reshape(B, H // s, W // s, s, s, Co)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(B, H, W, Co)
    )
    return y + bias.astype(x.dtype)


def _upconv2x_subpixel(x: Array, P: Array, bias: Array) -> Array:
    """Sub-pixel evaluation of a stride-2 3x3 SAME transposed conv
    (abstract_cvae.py:83).

    The same map decomposes exactly into ONE stride-1 2x2 conv producing
    (2, 2, C_out) channel groups (the four output parities) followed by a
    depth-to-space reshape: no input dilation, 4x channel width. Validated
    bit-exact (~1e-6) vs nn.ConvTranspose(transpose_kernel=True) incl. both
    gradients (tests/test_tf_semantics.py).

    NOTE: measured SLOWER than XLA's native conv_transpose lowering on TPU
    v5e (19.9 ms vs 14.4 ms decoder fwd at 224x300 batch 256 — the extra
    depth-to-space data movement outweighs the dilation savings), so the
    Decoder uses plain nn.ConvTranspose; kept as a validated alternate.

    Derivation (gradient-of-conv, TF SAME stride-2 k=3 => pad (0,1)):
    output row p = 2Y'+ry draws from input rows {Y'-1, Y'} with kernel taps
    dy = 2 (w=0), 0 (w=1) for ry=0 and dy = 1 (w=1) for ry=1; same per axis.
    P layout: (kh, kw, out, in) — the flax transpose_kernel convention.
    """
    B, h, w, Ci = x.shape
    Co = P.shape[2]
    taps = {(0, 0): 2, (0, 1): 0, (1, 1): 1}
    Kbig = jnp.zeros((2, 2, Ci, 2, 2, Co), x.dtype)
    for ry in range(2):
        for wy in range(2):
            dy = taps.get((ry, wy))
            if dy is None:
                continue
            for rx in range(2):
                for wx in range(2):
                    dx = taps.get((rx, wx))
                    if dx is None:
                        continue
                    Kbig = Kbig.at[wy, wx, :, ry, rx, :].set(P[dy, dx].T.astype(x.dtype))
    Kbig = Kbig.reshape(2, 2, Ci, 4 * Co)
    out = jax.lax.conv_general_dilated(
        x, Kbig, (1, 1), ((1, 0), (1, 0)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    y = out.reshape(B, h, w, 2, 2, Co).transpose(0, 1, 3, 2, 4, 5).reshape(B, 2 * h, 2 * w, Co)
    return y + bias.astype(x.dtype)


class _UpConv2x(nn.Module):
    """Stride-2 transposed conv with nn.ConvTranspose's parameter tree
    (kernel (3,3,out,in), bias), evaluated via the sub-pixel fast path."""

    out_channels: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        ci = x.shape[-1]
        kernel = self.param("kernel", _glorot, (3, 3, self.out_channels, ci), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (self.out_channels,), self.param_dtype)
        return _upconv2x_subpixel(x.astype(self.dtype), kernel.astype(self.dtype), bias)


class _RGBHead(nn.Module):
    """Final decoder layer with the same parameter tree as nn.ConvTranspose
    (kernel (3,3,out,in), bias) so checkpoints are interchangeable; evaluates
    via the space-to-depth fast path when shapes allow."""

    out_channels: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    block: int = 4

    @nn.compact
    def __call__(self, x: Array) -> Array:
        ci = x.shape[-1]
        kernel = self.param("kernel", _glorot, (3, 3, self.out_channels, ci), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (self.out_channels,), self.param_dtype)
        x = x.astype(self.dtype)
        k = kernel.astype(self.dtype)
        b = bias.astype(self.dtype)
        s = self.block
        if x.shape[1] % s == 0 and x.shape[2] % s == 0:
            return _rgb_head_s2d(x, k, b, s)
        # general fallback: equivalent plain conv
        keff = jnp.flip(k, (0, 1)).transpose(0, 1, 3, 2)
        y = jax.lax.conv_general_dilated(
            x, keff, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        return y + b


def compute_dense_shape(config: dict) -> Tuple[int, int, int]:
    """floor(dim / 2^L) dense reshape, with the reference's collapse errors.

    Mirrors abstract_cvae.py:59-68 including the exact error messages'
    semantics (RuntimeError on width/height collapse to zero).
    """
    image_size = config["data"]["image_size"]
    image_width, image_height = image_size[0], image_size[1]
    layer_count = len(config["model"]["layers"])
    dense_width = int(float(image_width) / float(2**layer_count))
    dense_height = int(float(image_height) / float(2**layer_count))
    if dense_width == 0:
        raise RuntimeError(
            f"Error: Build Decoder: Width Collapse: Too many layers, check configuration file: "
            f"{image_width} -> {dense_width}: {layer_count} Layers"
        )
    if dense_height == 0:
        raise RuntimeError(
            f"Error: Build Decoder: Height Collapse: Too many layers, check configuration file: "
            f"{image_height} -> {dense_height}: {layer_count} Layers"
        )
    return dense_width, dense_height, int(config["model"]["decoder_dense_filters"])


@dataclasses.dataclass
class AbstractCVAE:
    """Functional CVAE: hyperparameters + pure apply methods.

    Unlike the reference Keras class, this object owns no parameters; params
    live in a pytree ``{'encoder': ..., 'decoder': ...}`` threaded through
    every method, so methods are jit/pjit/vmap/grad-compatible. A stateful
    convenience wrapper with the reference's exact mutable API lives in
    trustedai_cl_vae_ad_tpu.models.wrapper.VAEModel.
    """

    config: dict
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    def __post_init__(self):
        cfg = self.config
        self.beta = float(cfg["training"]["beta"])
        self.encoder_input_shape = tuple(cfg["data"]["image_size"])
        self.latent_size = int(cfg["model"]["latent_dimensions"])
        self.conv_filters = tuple(int(f) for f in cfg["model"]["layers"])
        edf = cfg["model"].get("encoder_dense_filters")
        self.encoder_dense_filters = int(edf) if edf else None
        self.dense_shape = compute_dense_shape(cfg)
        self.encoder = Encoder(
            conv_filters=self.conv_filters,
            latent_size=self.latent_size,
            encoder_dense_filters=self.encoder_dense_filters,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            s2d_input=bool(cfg["model"].get("s2d_input", False)),
        )
        self.decoder = Decoder(
            conv_filters=self.conv_filters,
            dense_shape=self.dense_shape,
            output_channels=int(self.encoder_input_shape[2]),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            fast_vjp=bool(cfg["model"].get("fast_vjp", True)),
        )

    # -- parameter initialization -------------------------------------------------
    def init(self, rng: Array, batch_size: int = 1) -> dict:
        enc_rng, dec_rng = jax.random.split(rng)
        x = jnp.zeros((batch_size, *self.encoder_input_shape), jnp.float32)
        z = jnp.zeros((batch_size, self.latent_size), jnp.float32)
        return {
            "encoder": self.encoder.init(enc_rng, x)["params"],
            "decoder": self.decoder.init(dec_rng, z)["params"],
        }

    # -- forward pieces (abstract_cvae.py:109-149) --------------------------------
    def encode(
        self,
        params: dict,
        x: Array,
        training: bool = False,
        rng: Optional[Array] = None,
        beta: Optional[Array] = None,
    ) -> Tuple[Array, Array]:
        """Split encoder output into (mean, logvar); optional input fuzz.

        Mirrors abstract_cvae.py:115-122: ``fuzz_x = x + N(0, beta)`` when
        training. (As in the reference, the standard loss path never sets
        training=True here.)
        """
        if x.dtype == jnp.uint8:
            x = normalize_image_input(x)
        fuzz_x = x
        if training:
            if rng is None:
                raise ValueError("encode(training=True) requires rng")
            b = self.beta if beta is None else beta
            fuzz_x = x + b * jax.random.normal(rng, x.shape, x.dtype)
        out = self.encoder.apply({"params": params["encoder"]}, fuzz_x)
        mean, logvar = jnp.split(out, 2, axis=1)
        return mean, logvar

    def reparameterize(
        self, mean: Array, logvar: Array, training: bool = False, rng: Optional[Array] = None
    ) -> Array:
        """z = mean + 0.5*logvar + eps (abstract_cvae.py:124-129)."""
        if training:
            if rng is None:
                raise ValueError("reparameterize(training=True) requires rng")
            eps = jax.random.normal(rng, mean.shape, mean.dtype)
        else:
            eps = jnp.zeros_like(mean)
        return mean + (logvar * 0.5) + eps

    def decode(self, params: dict, z: Array, apply_sigmoid: bool = False) -> Array:
        logits = self.decoder.apply({"params": params["decoder"]}, z)
        if apply_sigmoid:
            return jax.nn.sigmoid(logits)
        return logits

    def sample(self, params: dict, rng: Array, eps: Optional[Array] = None, n: int = 100) -> Array:
        """Decode n ~ N(0, 1) latents with sigmoid (abstract_cvae.py:109-113)."""
        if eps is None:
            eps = jax.random.normal(rng, (n, self.latent_size))
        return self.decode(params, eps, apply_sigmoid=True)

    def call_detailed(
        self, params: dict, x: Array, training: bool = False, rng: Optional[Array] = None
    ) -> Tuple[Array, Array, Array, Array]:
        """(x_prob, z, mean, logvar). Mirrors abstract_cvae.py:139-144.

        NOTE: as in the reference, ``training`` gates only the latent eps, not
        the encoder input noise (encode is called without training).
        """
        mean, logvar = self.encode(params, x)
        z = self.reparameterize(mean, logvar, training=training, rng=rng)
        x_prob = self.decode(params, z, apply_sigmoid=True)
        return x_prob, z, mean, logvar

    def call(self, params: dict, x: Array, training: bool = False, rng: Optional[Array] = None) -> Array:
        mean, logvar = self.encode(params, x, training=False)
        z = self.reparameterize(mean, logvar, training=training, rng=rng)
        return self.decode(params, z, apply_sigmoid=True)

    # -- loss: subclass responsibility (abstract_cvae.py:151-152) -----------------
    def compute_loss(self, params, x, training=False, return_inf=False, rng=None):
        raise NotImplementedError("Error, compute_loss must be implemented")
