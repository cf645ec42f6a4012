"""Fused padded-set attention as a Pallas TPU kernel.

Why: the denoiser's hot stage runs full attention over up to ~1800 tokens
(max_face x max_edge). The XLA path materializes the [B, H, S, S] f32
probability tensor in HBM (~2.5 GB per layer at the bench shape) -- the
sampling cascade is HBM-bandwidth-bound on it. This kernel keeps each
query block's logits/probabilities entirely in VMEM: per (batch*head,
q-block) program it computes q @ k^T, adds the key-padding bias, softmaxes
in f32, and applies @ v -- only inputs and the [S, D] output touch HBM.

Sequences here are short enough (<= ~2k) that a whole [block_q, S] logit
row fits comfortably in VMEM, so no online-softmax carry is needed --
simpler and faster than a flash-style streaming kernel at these shapes.

Training uses a custom VJP whose backward recomputes through the XLA
attention (correct gradients; the Pallas speedup matters most in the
sampling cascade where there is no backward).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu is TPU-only at trace time; interpret mode works anywhere
    from jax.experimental.pallas import tpu as pltpu

    _MEMSPACE = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _MEMSPACE = None

NEG_INF = -1e9


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale):
    # q [1, bq, D]; k, v [1, S, D]; bias [1, 1, S]; o [1, bq, D]
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale                                    # [bq, S] f32 in VMEM
    logits = logits + bias_ref[0]  # [1, S] broadcasts over rows
    probs = jax.nn.softmax(logits, axis=-1)
    o_ref[0] = jax.lax.dot_general(
        probs.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_set_attention(
    q: jnp.ndarray,  # [B, H, S, D]
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_padding_mask: Optional[jnp.ndarray] = None,  # [B, S] True = pad
    block_q: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    return _forward(q, k, v, key_padding_mask, block_q, interpret)


def _forward(q, k, v, key_padding_mask, block_q=128, interpret=False):
    B, H, S, D = q.shape
    S_pad = _round_up(S, block_q)
    D_pad = _round_up(D, 128)

    if key_padding_mask is None:
        key_padding_mask = jnp.zeros((B, S), bool)
    # pad sequence; padded keys masked out, padded queries sliced off
    pad_s = S_pad - S
    if pad_s:
        zp = lambda a: jnp.pad(a, ((0, 0), (0, 0), (0, pad_s), (0, 0)))
        q, k, v = zp(q), zp(k), zp(v)
        key_padding_mask = jnp.pad(
            key_padding_mask, ((0, 0), (0, pad_s)), constant_values=True
        )
    if D_pad != D:
        dp = lambda a: jnp.pad(a, ((0, 0), (0, 0), (0, 0), (0, D_pad - D)))
        q, k, v = dp(q), dp(k), dp(v)

    bias = jnp.where(key_padding_mask, NEG_INF, 0.0).astype(jnp.float32)
    bias = bias[:, None, :]  # [B, 1, S_pad] (TPU blocks need >=2 trailing dims)

    qf = q.reshape(B * H, S_pad, D_pad)
    kf = k.reshape(B * H, S_pad, D_pad)
    vf = v.reshape(B * H, S_pad, D_pad)

    grid = (B * H, S_pad // block_q)
    kwargs = dict(memory_space=_MEMSPACE) if _MEMSPACE is not None else {}
    scale = 1.0 / (D ** 0.5)  # true head dim, not the padded one
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((B * H, S_pad, D_pad), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, D_pad), lambda bh, iq: (bh, iq, 0), **kwargs),
            pl.BlockSpec((1, S_pad, D_pad), lambda bh, iq: (bh, 0, 0), **kwargs),
            pl.BlockSpec((1, S_pad, D_pad), lambda bh, iq: (bh, 0, 0), **kwargs),
            pl.BlockSpec((1, 1, S_pad), lambda bh, iq: (bh // H, 0, 0), **kwargs),
        ],
        out_specs=pl.BlockSpec((1, block_q, D_pad), lambda bh, iq: (bh, iq, 0), **kwargs),
        interpret=interpret,
    )(qf, kf, vf, bias)

    out = out.reshape(B, H, S_pad, D_pad)
    return out[:, :, :S, :D]


def _xla_attention(q, k, v, key_padding_mask):
    scale = 1.0 / jnp.sqrt(jnp.asarray(q.shape[-1], q.dtype))
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    if key_padding_mask is not None:
        bias = jnp.where(key_padding_mask[:, None, None, :], NEG_INF, 0.0)
        logits = logits + bias.astype(logits.dtype)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def _fwd(q, k, v, key_padding_mask, block_q, interpret):
    out = _forward(q, k, v, key_padding_mask, block_q, interpret)
    return out, (q, k, v, key_padding_mask)


def _bwd(block_q, interpret, residuals, g):
    q, k, v, key_padding_mask = residuals
    _, vjp = jax.vjp(lambda q, k, v: _xla_attention(q, k, v, key_padding_mask), q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


fused_set_attention.defvjp(_fwd, _bwd)
