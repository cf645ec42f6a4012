"""Surface VAE: 2D convolutional KL-autoencoder over 32x32x3 UV grids.

Effective architecture matches the reference's diffusers ``AutoencoderKL``
config (reference ``trainer.py:20-30`` / ``sample.py:72-82``): channels
[128, 256, 512, 512], 2 resnet layers per block, GroupNorm(32, eps 1e-6),
SiLU, a single-head spatial attention in the mid blocks, latent_channels=3,
double_z encoder output. 32x32x3 <-> 4x4x3 (48-D flattened token).

TPU-first choices: channels-last (NHWC) layouts end to end -- the UV grid
arrives as [B, 32, 32, 3] and is consumed directly (no NCHW permutes);
GroupNorm statistics in float32; compute dtype configurable (bf16 on TPU).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from brepgen_tpu.nn.layers import DiagonalGaussian


def _groups(channels: int, target: int = 32) -> int:
    """Largest divisor of ``channels`` not exceeding ``target`` (the real
    model always uses multiples of 32; this keeps tiny test configs valid)."""
    g = min(target, channels)
    while channels % g:
        g -= 1
    return g


class ResnetBlock2D(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_channels = x.shape[-1]
        h = nn.GroupNorm(_groups(x.shape[-1]), epsilon=1e-6, dtype=jnp.float32, name="norm1")(x)
        h = nn.silu(h).astype(self.dtype)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        h = nn.GroupNorm(_groups(h.shape[-1]), epsilon=1e-6, dtype=jnp.float32, name="norm2")(h)
        h = nn.silu(h).astype(self.dtype)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        if in_channels != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut")(x)
        return x + h


class AttnBlock2D(nn.Module):
    """Single-head spatial self-attention (VAE mid-block style)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = nn.GroupNorm(_groups(x.shape[-1]), epsilon=1e-6, dtype=jnp.float32, name="norm")(x)
        h = h.astype(self.dtype).reshape(B, H * W, C)
        q = nn.Dense(C, dtype=self.dtype, name="q")(h)
        k = nn.Dense(C, dtype=self.dtype, name="k")(h)
        v = nn.Dense(C, dtype=self.dtype, name="v")(h)
        scale = 1.0 / jnp.sqrt(jnp.asarray(C, self.dtype))
        attn = jax.nn.softmax(
            (jnp.einsum("bqc,bkc->bqk", q, k) * scale).astype(jnp.float32), axis=-1
        ).astype(self.dtype)
        h = jnp.einsum("bqk,bkc->bqc", attn, v)
        h = nn.Dense(C, dtype=self.dtype, name="proj")(h)
        return x + h.reshape(B, H, W, C)


class Downsample2D(nn.Module):
    """Stride-2 conv with diffusers' asymmetric (0,1,0,1) padding."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(
            self.out_channels, (3, 3), strides=(2, 2), padding="VALID",
            dtype=self.dtype, name="conv",
        )(x)


class Upsample2D(nn.Module):
    """Nearest-neighbor 2x + 3x3 conv."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        x = jax.image.resize(x, (B, 2 * H, 2 * W, C), method="nearest")
        return nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv")(x)


class MidBlock2D(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = ResnetBlock2D(self.channels, self.dtype, name="res1")(x)
        x = AttnBlock2D(self.dtype, name="attn")(x)
        x = ResnetBlock2D(self.channels, self.dtype, name="res2")(x)
        return x


class Encoder2D(nn.Module):
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        ch = self.block_out_channels
        x = nn.Conv(ch[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(x)
        for i, c in enumerate(ch):
            for j in range(self.layers_per_block):
                x = ResnetBlock2D(c, self.dtype, name=f"down{i}_res{j}")(x)
            if i < len(ch) - 1:
                x = Downsample2D(c, self.dtype, name=f"down{i}_downsample")(x)
        x = MidBlock2D(ch[-1], self.dtype, name="mid")(x)
        x = nn.GroupNorm(_groups(x.shape[-1]), epsilon=1e-6, dtype=jnp.float32, name="norm_out")(x)
        x = nn.silu(x).astype(self.dtype)
        x = nn.Conv(2 * self.latent_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(x)
        return x  # [B, 4, 4, 2*latent]


class Decoder2D(nn.Module):
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    out_channels: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        ch = list(reversed(self.block_out_channels))  # [512, 512, 256, 128]
        x = nn.Conv(ch[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(z)
        x = MidBlock2D(ch[0], self.dtype, name="mid")(x)
        for i, c in enumerate(ch):
            for j in range(self.layers_per_block + 1):
                x = ResnetBlock2D(c, self.dtype, name=f"up{i}_res{j}")(x)
            if i < len(ch) - 1:
                x = Upsample2D(c, self.dtype, name=f"up{i}_upsample")(x)
        x = nn.GroupNorm(_groups(x.shape[-1]), epsilon=1e-6, dtype=jnp.float32, name="norm_out")(x)
        x = nn.silu(x).astype(self.dtype)
        x = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(x)
        return x


class SurfVAE(nn.Module):
    """KL-VAE over surface UV grids; NHWC; latent [B, 4, 4, 3]."""

    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 3
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder2D(
            self.block_out_channels, self.layers_per_block, self.latent_channels, self.dtype
        )
        self.decoder = Decoder2D(
            self.block_out_channels, self.layers_per_block, 3, self.dtype
        )
        self.quant_conv = nn.Conv(2 * self.latent_channels, (1, 1), dtype=self.dtype)
        self.post_quant_conv = nn.Conv(self.latent_channels, (1, 1), dtype=self.dtype)

    def encode(self, x: jnp.ndarray) -> DiagonalGaussian:
        moments = self.quant_conv(self.encoder(x))
        return DiagonalGaussian(moments.astype(jnp.float32))

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        return self.decoder(self.post_quant_conv(z.astype(self.dtype))).astype(jnp.float32)

    def __call__(self, x, rng=None, sample_posterior=False):
        posterior = self.encode(x)
        z = posterior.sample(rng) if sample_posterior else posterior.mode()
        return self.decode(z), posterior
