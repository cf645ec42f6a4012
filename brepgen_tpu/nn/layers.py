"""Shared layers: sinusoidal embeddings, MLP stream embedders, KL posterior.

Behavioral spec from the reference:
  * ``sincos_embedding`` -- cos first, then sin (reference ``network.py:1043-1063``).
  * stream embedder / output head -- Linear -> LayerNorm -> SiLU -> Linear
    (reference ``network.py:1080-1099`` and the analogous blocks in every
    denoiser).
  * ``DiagonalGaussian`` -- diffusers-style posterior: moments split into
    (mean, logvar), logvar clamped to [-30, 20]; KL against N(0, I).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = jnp.dtype


def sincos_embedding(t: jnp.ndarray, dim: int, max_period: float = 10000.0) -> jnp.ndarray:
    """Sinusoidal timestep embedding, [..., dim] with cos in the first half."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t.astype(jnp.float32)[..., None] * freqs
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[..., :1])], axis=-1)
    return emb


class MLPEmbedder(nn.Module):
    """Linear -> LayerNorm -> SiLU -> Linear. Used for every input stream,
    the time embedding, and (with ``out_dim``) the output head."""

    width: int
    out_dim: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out = self.out_dim if self.out_dim is not None else self.width
        x = nn.Dense(self.width, dtype=self.dtype, name="fc1")(x)
        x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        x = nn.silu(x)
        x = nn.Dense(out, dtype=self.dtype, name="fc2")(x)
        return x


class DiagonalGaussian:
    """Diagonal Gaussian posterior over channel-last moments.

    ``moments``: [..., 2*C] = concat(mean, logvar) on the last axis.
    """

    def __init__(self, moments: jnp.ndarray):
        mean, logvar = jnp.split(moments, 2, axis=-1)
        self.mean = mean
        self.logvar = jnp.clip(logvar, -30.0, 20.0)
        self.std = jnp.exp(0.5 * self.logvar)
        self.var = jnp.exp(self.logvar)

    def sample(self, key: jax.Array) -> jnp.ndarray:
        eps = jax.random.normal(key, self.mean.shape, dtype=self.mean.dtype)
        return self.mean + self.std * eps

    def mode(self) -> jnp.ndarray:
        return self.mean

    def kl(self) -> jnp.ndarray:
        """KL(q || N(0,I)) summed over all non-batch dims -> [B]."""
        axes = tuple(range(1, self.mean.ndim))
        return 0.5 * jnp.sum(
            jnp.square(self.mean) + self.var - 1.0 - self.logvar, axis=axes
        )
