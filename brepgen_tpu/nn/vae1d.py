"""Edge VAE: 1D convolutional KL-autoencoder over 32x3 curve point grids.

Effective architecture re-derived from the reference's custom 1D VAE
(``network.py:86-299,316-687``; block config at ``trainer.py:146-157``):

  encoder: conv_in(3->128, k3) -> 3x [FIR-downsample(cubic) -> 3x ResConv]
           with channels 128,256,512 -> mid(6x ResConv+SelfAttn)
           -> GroupNorm(32)/SiLU/conv_out(->6, double_z)    32 -> 4 samples
  decoder: conv_in(3->512) -> mid -> 3x [3x ResConv -> FIR-upsample(cubic)]
           with channels 512,256,128 -> GroupNorm(32)/SiLU/conv_out(->3)

Building blocks follow diffusers' unet_1d_blocks semantics that the
reference composes (``network.py:13,30-83``):
  * ResConvBlock: conv(k5) -> GroupNorm(1) -> GELU -> conv(k5) ->
    GroupNorm(1) -> GELU, + skip (1x1 conv, no bias, if channels change)
  * SelfAttention1d over the length axis, heads = channels // 32
  * Down/Upsample1d: fixed antialiasing FIR filter ("cubic" taps from
    k-diffusion), reflect padding, stride/dilation 2

Layout is channels-last [B, L, C] (TPU-friendly; the reference permutes to
torch's NCL). Norm statistics in float32.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from brepgen_tpu.nn.layers import DiagonalGaussian
from brepgen_tpu.nn.vae2d import _groups

# Bicubic antialiasing FIR taps (k-diffusion / diffusers "cubic" kernel).
CUBIC_KERNEL = np.array(
    [-0.01171875, -0.03515625, 0.11328125, 0.43359375,
     0.43359375, 0.11328125, -0.03515625, -0.01171875],
    dtype=np.float32,
)


def fir_downsample_1d(x: jnp.ndarray, kernel: np.ndarray = CUBIC_KERNEL) -> jnp.ndarray:
    """[B, L, C] -> [B, L//2, C]: reflect-pad then stride-2 depthwise FIR."""
    K = len(kernel)
    pad = K // 2 - 1
    x = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="reflect")
    C = x.shape[-1]
    w = jnp.zeros((K, 1, C, C), x.dtype).at[:, 0, jnp.arange(C), jnp.arange(C)].set(
        jnp.asarray(kernel, x.dtype)[:, None]
    )
    # lax conv with NHWC-style ("NWC") layout
    return jax.lax.conv_general_dilated(
        x[:, :, None, :],  # [B, L, 1, C]
        w,                 # [K, 1, C, C]
        window_strides=(2, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=1,
    )[:, :, 0, :]


def fir_upsample_1d(x: jnp.ndarray, kernel: np.ndarray = CUBIC_KERNEL) -> jnp.ndarray:
    """[B, L, C] -> [B, 2L, C]: zero-stuff x2 then FIR with 2x-scaled taps.

    Equivalent to the transposed-conv formulation: insert a zero between
    samples, convolve with the (doubled) FIR kernel, crop to exactly 2L.
    """
    K = len(kernel)
    pad = K // 2 - 1
    x = jnp.pad(x, ((0, 0), ((pad + 1) // 2,) * 2, (0, 0)), mode="reflect")
    B, L, C = x.shape
    w = jnp.zeros((K, 1, C, C), x.dtype).at[:, 0, jnp.arange(C), jnp.arange(C)].set(
        jnp.asarray(2.0 * kernel, x.dtype)[:, None]
    )
    out = jax.lax.conv_transpose(
        x[:, :, None, :],
        w,
        strides=(2, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )[:, :, 0, :]
    # conv_transpose VALID output length = (L-1)*2 + K; crop the (2*pad+1, ...)
    # boundary introduced by padding so the result is exactly 2x the
    # pre-reflect-pad length.
    target = 2 * (L - 2 * ((pad + 1) // 2))
    start = (out.shape[1] - target) // 2
    return jax.lax.dynamic_slice_in_dim(out, start, target, axis=1)


class ResConvBlock1D(nn.Module):
    mid_channels: int
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_channels = x.shape[-1]
        residual = x
        if in_channels != self.out_channels:
            residual = nn.Conv(
                self.out_channels, (1,), use_bias=False, dtype=self.dtype, name="conv_skip"
            )(x)
        h = nn.Conv(self.mid_channels, (5,), padding=2, dtype=self.dtype, name="conv1")(x)
        h = nn.GroupNorm(1, epsilon=1e-5, dtype=jnp.float32, name="norm1")(h)
        h = nn.gelu(h, approximate=False).astype(self.dtype)
        h = nn.Conv(self.out_channels, (5,), padding=2, dtype=self.dtype, name="conv2")(h)
        h = nn.GroupNorm(1, epsilon=1e-5, dtype=jnp.float32, name="norm2")(h)
        h = nn.gelu(h, approximate=False).astype(self.dtype)
        return h + residual


class SelfAttention1D(nn.Module):
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, L, C = x.shape
        h = nn.GroupNorm(1, epsilon=1e-5, dtype=jnp.float32, name="norm")(x).astype(self.dtype)
        q = nn.Dense(C, dtype=self.dtype, name="q")(h)
        k = nn.Dense(C, dtype=self.dtype, name="k")(h)
        v = nn.Dense(C, dtype=self.dtype, name="v")(h)
        D = C // self.num_heads
        split = lambda a: a.reshape(B, L, self.num_heads, D).transpose(0, 2, 1, 3)
        q, k, v = split(q), split(k), split(v)
        scale = 1.0 / jnp.sqrt(jnp.asarray(D, self.dtype))
        attn = jax.nn.softmax(
            (jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale).astype(jnp.float32), axis=-1
        ).astype(self.dtype)
        h = jnp.einsum("bhqk,bhkd->bhqd", attn, v).transpose(0, 2, 1, 3).reshape(B, L, C)
        h = nn.Dense(C, dtype=self.dtype, name="proj")(h)
        return x + h


class MidBlock1D(nn.Module):
    """6x (ResConv -> SelfAttention), reference ``network.py:51-83``."""

    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        heads = max(1, self.channels // 32)
        for i in range(6):
            x = ResConvBlock1D(self.channels, self.channels, self.dtype, name=f"res{i}")(x)
            x = SelfAttention1D(heads, self.dtype, name=f"attn{i}")(x)
        return x


class DownBlock1D(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = fir_downsample_1d(x)
        mid = self.out_channels
        x = ResConvBlock1D(mid, mid, self.dtype, name="res0")(x)
        x = ResConvBlock1D(mid, mid, self.dtype, name="res1")(x)
        x = ResConvBlock1D(mid, self.out_channels, self.dtype, name="res2")(x)
        return x


class UpBlock1D(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        mid = x.shape[-1]
        x = ResConvBlock1D(mid, mid, self.dtype, name="res0")(x)
        x = ResConvBlock1D(mid, mid, self.dtype, name="res1")(x)
        x = ResConvBlock1D(mid, self.out_channels, self.dtype, name="res2")(x)
        return fir_upsample_1d(x)


class Encoder1D(nn.Module):
    block_out_channels: Sequence[int] = (128, 256, 512)
    latent_channels: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        ch = self.block_out_channels
        x = nn.Conv(ch[0], (3,), padding=1, dtype=self.dtype, name="conv_in")(x)
        for i, c in enumerate(ch):
            x = DownBlock1D(c, self.dtype, name=f"down{i}")(x)
        x = MidBlock1D(ch[-1], self.dtype, name="mid")(x)
        x = nn.GroupNorm(_groups(x.shape[-1]), epsilon=1e-6, dtype=jnp.float32, name="norm_out")(x)
        x = nn.silu(x).astype(self.dtype)
        x = nn.Conv(2 * self.latent_channels, (3,), padding=1, dtype=self.dtype, name="conv_out")(x)
        return x  # [B, 4, 2*latent]


class Decoder1D(nn.Module):
    block_out_channels: Sequence[int] = (128, 256, 512)
    out_channels: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        ch = list(reversed(self.block_out_channels))  # [512, 256, 128]
        x = nn.Conv(ch[0], (3,), padding=1, dtype=self.dtype, name="conv_in")(z)
        x = MidBlock1D(ch[0], self.dtype, name="mid")(x)
        for i, c in enumerate(ch):
            x = UpBlock1D(c, self.dtype, name=f"up{i}")(x)
        x = nn.GroupNorm(_groups(x.shape[-1]), epsilon=1e-6, dtype=jnp.float32, name="norm_out")(x)
        x = nn.silu(x).astype(self.dtype)
        x = nn.Conv(self.out_channels, (3,), padding=1, dtype=self.dtype, name="conv_out")(x)
        return x


class EdgeVAE(nn.Module):
    """KL-VAE over edge u-grids; [B, 32, 3] <-> latent [B, 4, 3]."""

    block_out_channels: Tuple[int, ...] = (128, 256, 512)
    latent_channels: int = 3
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder1D(self.block_out_channels, self.latent_channels, self.dtype)
        self.decoder = Decoder1D(self.block_out_channels, 3, self.dtype)
        self.quant_conv = nn.Conv(2 * self.latent_channels, (1,), dtype=self.dtype)
        self.post_quant_conv = nn.Conv(self.latent_channels, (1,), dtype=self.dtype)

    def encode(self, x: jnp.ndarray) -> DiagonalGaussian:
        moments = self.quant_conv(self.encoder(x))
        return DiagonalGaussian(moments.astype(jnp.float32))

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        return self.decoder(self.post_quant_conv(z.astype(self.dtype))).astype(jnp.float32)

    def __call__(self, x, rng=None, sample_posterior=False):
        posterior = self.encode(x)
        z = posterior.sample(rng) if sample_posterior else posterior.mode()
        return self.decode(z), posterior
