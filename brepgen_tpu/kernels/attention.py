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

Three forward variants, length-routed by the caller (``nn/transformer.py``):
the packed resident kernel (consumes the fused [B,S,3W] QKV projection
directly, full-S K/V column-blocks in VMEM — wins through ABC scale,
13.2 ms/layer at S=4096 vs the per-head kernel's 21, round-3 sweep in
BASELINE.md), the per-head kernel (HBM head transposes but simple
[bq,S] logit rows; routed between the residency threshold, default 8 MB
of K/V, and 8k tokens), and a K-chunked online-softmax streaming kernel
(bk=2048) beyond 8k. Training uses a custom VJP with a Pallas flash-style backward
in the packed layout (``_packed_bwd``); only the never-trained streaming
lengths fall back to recompute-through-XLA gradients.
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
    # post-normalized softmax: dividing the [bq, D] PV result instead of
    # the [bq, S] probabilities saves a full-width VPU pass per program
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = (o / denom).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def default_block_q(S: int, packed: bool = True) -> int:
    """Measured-optimal q-block size (v5e sweeps, scan-based timing).

    Packed all-heads kernel at S=1800: bq 384 -> 54.2 ms edge step vs
    640 -> 59.1 and full-S 1920 -> 55.9; at S=4096 bq 256 -> 13.2
    ms/layer vs 384 -> 16.5 and 512 -> 14.3 (round-3 sweep,
    scripts/attn_sweep_r3.py). Per-head kernel at S=4000: bq 512 ->
    14.3 ms/layer vs 128 -> 15.5. Small sets just round up -- one
    program covers everything.
    """
    if not packed:
        return 512 if S > 512 else max(_round_up(S, 128), 128)
    if S <= 384:
        return max(_round_up(S, 128), 128)
    return 384 if S <= 2700 else 256


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_set_attention(
    q: jnp.ndarray,  # [B, H, S, D]
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_padding_mask: Optional[jnp.ndarray] = None,  # [B, S] True = pad
    block_q: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    return _forward(q, k, v, key_padding_mask, block_q, interpret)


def _forward(q, k, v, key_padding_mask, block_q=None, interpret=False):
    B, H, S, D = q.shape
    if block_q is None:
        block_q = default_block_q(S, packed=False)
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


def _packed_kernel(qkv_q_ref, qkv_k_ref, qkv_v_ref, bias_ref, o_ref, *, scale, H):
    """All-heads attention for one (batch, q-block) program, packed layout.

    qkv_q [1, bq, W] (query rows), qkv_k/v [1, S, W] (full key/value rows),
    all three column-blocks of the SAME [B, S, 3W] projection output --
    no transpose, split, or head-dim padding ever materializes in HBM.
    Heads run as an unrolled loop on [*, D=W/H] column slices; the K=64
    contraction runs the MXU at half rate, which costs exactly the same
    as the zero-padded K=128 contraction but avoids the padding copies.
    """
    q = qkv_q_ref[0]
    k = qkv_k_ref[0]
    v = qkv_v_ref[0]
    bias = bias_ref[0]  # [1, S]
    W = q.shape[-1]
    D = W // H
    for h in range(H):
        sl = slice(h * D, (h + 1) * D)  # static per unrolled iteration
        logits = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale + bias
        # post-normalized softmax (divide the [bq, D] PV result, not the
        # [bq, S] probabilities): one fewer full-width VPU pass per head
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, :, sl] = (o / denom).astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 3, 4))
def fused_set_attention_packed(
    qkv: jnp.ndarray,  # [B, S, 3W] = concat(q, k, v) feature-wise
    num_heads: int,
    key_padding_mask: Optional[jnp.ndarray] = None,  # [B, S] True = pad
    block_q: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Masked set attention straight off the QKV projection: [B,S,3W] -> [B,S,W]."""
    return _packed_forward(qkv, num_heads, key_padding_mask, block_q, interpret)


def _needs_kv_streaming(S, W, itemsize):
    return S * W * itemsize > PACKED_RESIDENT_BYTES


def _packed_forward(qkv, num_heads, key_padding_mask, block_q, interpret):
    B, S, W3 = qkv.shape
    W = W3 // 3
    if _needs_kv_streaming(S, W, qkv.dtype.itemsize) and pltpu is not None:
        return _packed_flash_forward(
            qkv, num_heads, key_padding_mask, None, None, interpret
        )
    if block_q is None:
        block_q = default_block_q(S)
    S_pad = _round_up(S, block_q)

    if key_padding_mask is None:
        key_padding_mask = jnp.zeros((B, S), bool)
    if S_pad != S:
        qkv = jnp.pad(qkv, ((0, 0), (0, S_pad - S), (0, 0)))
        key_padding_mask = jnp.pad(
            key_padding_mask, ((0, 0), (0, S_pad - S)), constant_values=True
        )
    bias = jnp.where(key_padding_mask, NEG_INF, 0.0).astype(jnp.float32)[:, None, :]

    kwargs = dict(memory_space=_MEMSPACE) if _MEMSPACE is not None else {}
    scale = 1.0 / ((W // num_heads) ** 0.5)
    extra = {}
    if pltpu is not None and not interpret:
        # the double-buffered full-S K/V blocks exceed the compiler's 16MB
        # scoped-vmem default at S ~2k; v5e has headroom beyond it
        extra["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        )
    out = pl.pallas_call(
        functools.partial(_packed_kernel, scale=scale, H=num_heads),
        out_shape=jax.ShapeDtypeStruct((B, S_pad, W), qkv.dtype),
        grid=(B, S_pad // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, W), lambda b, iq: (b, iq, 0), **kwargs),
            pl.BlockSpec((1, S_pad, W), lambda b, iq: (b, 0, 1), **kwargs),
            pl.BlockSpec((1, S_pad, W), lambda b, iq: (b, 0, 2), **kwargs),
            pl.BlockSpec((1, 1, S_pad), lambda b, iq: (b, 0, 0), **kwargs),
        ],
        out_specs=pl.BlockSpec((1, block_q, W), lambda b, iq: (b, iq, 0), **kwargs),
        interpret=interpret,
        **extra,
    )(qkv, qkv, qkv, bias)
    return out[:, :S, :]


# Largest single full-S K (or V) column-block, in bytes, that the resident
# packed kernel keeps in VMEM; above this the K-chunked (online-softmax)
# variant streams K/V instead. Round-3 v5e sweep (scripts/attn_sweep_r3
# .py): the resident kernel WINS at S=4096 (13.2 ms/layer at bq=256 vs
# the per-head kernel's 21 and flash-bk2048's 14.2) — its 6.3 MB K/V
# column-blocks sit comfortably inside the 100 MB scoped-vmem budget —
# so the default keeps residency through ABC scale (8 MB ~= S 5460 at
# W=768 bf16). Override per deployment with BREPGEN_PACKED_RESIDENT_MB.
import os as _os

PACKED_RESIDENT_BYTES = (
    int(_os.environ.get("BREPGEN_PACKED_RESIDENT_MB", "8")) * 1024 * 1024
)


def _packed_flash_kernel(
    q_ref, k_ref, v_ref, bias_ref, o_ref, acc_ref, m_ref, l_ref, *, scale, H, nk
):
    """K-chunked online-softmax variant for sequences whose full-S K/V rows
    exceed VMEM. Same packed layout as ``_packed_kernel`` (column-blocks of
    the [B, S, 3W] projection output, heads looped in-kernel), but the grid
    gains a minor k-chunk axis and softmax runs as a streaming reduction:
    per-head running max ``m`` and normalizer ``l`` (f32 scratch, lanes are
    broadcast copies) rescale the f32 accumulator between chunks.
    """
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -1e30)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0]          # [bq, W]
    k = k_ref[0]          # [bk, W]
    v = v_ref[0]
    bias = bias_ref[0]    # [1, bk]
    W = q.shape[-1]
    D = W // H
    for h in range(H):
        sl = slice(h * D, (h + 1) * D)
        s = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale + bias                                   # [bq, bk] f32
        m_prev = m_ref[h]                                  # [bq, 128]
        m_cur = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_cur)                    # [bq, 128]
        p = jnp.exp(s - m_cur[:, :1])                      # [bq, bk]
        l_ref[h] = l_ref[h] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        m_ref[h] = m_cur
        acc_ref[:, sl] = acc_ref[:, sl] * alpha[:, :1] + jax.lax.dot_general(
            p.astype(v.dtype), v[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(ik == nk - 1)
    def _emit():
        for h in range(H):
            sl = slice(h * D, (h + 1) * D)
            o_ref[0, :, sl] = (acc_ref[:, sl] / l_ref[h][:, :1]).astype(o_ref.dtype)


def _packed_flash_forward(qkv, num_heads, key_padding_mask, block_q, block_k,
                          interpret):
    B, S, W3 = qkv.shape
    W = W3 // 3
    if block_q is None:
        block_q = 512
    if block_k is None:
        # larger k-chunks amortize per-contraction fixed cost: round-3
        # sweep at S=4096 measured 26.1 / 15.9 / 14.2 ms/layer for
        # block_k 512 / 1024 / 2048
        block_k = 2048
    # one padded length must tile both the q- and k-grids
    step = max(block_q, block_k)
    assert step % min(block_q, block_k) == 0
    S_pad = _round_up(S, step)

    if key_padding_mask is None:
        key_padding_mask = jnp.zeros((B, S), bool)
    if S_pad != S:
        qkv = jnp.pad(qkv, ((0, 0), (0, S_pad - S), (0, 0)))
        key_padding_mask = jnp.pad(
            key_padding_mask, ((0, 0), (0, S_pad - S)), constant_values=True
        )
    bias = jnp.where(key_padding_mask, NEG_INF, 0.0).astype(jnp.float32)[:, None, :]

    kwargs = dict(memory_space=_MEMSPACE) if _MEMSPACE is not None else {}
    extra = {}
    if pltpu is not None and not interpret:
        extra["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        )
    scale = 1.0 / ((W // num_heads) ** 0.5)
    nk = S_pad // block_k
    out = pl.pallas_call(
        functools.partial(
            _packed_flash_kernel, scale=scale, H=num_heads, nk=nk
        ),
        out_shape=jax.ShapeDtypeStruct((B, S_pad, W), qkv.dtype),
        grid=(B, S_pad // block_q, nk),
        in_specs=[
            pl.BlockSpec((1, block_q, W), lambda b, iq, ik: (b, iq, 0), **kwargs),
            pl.BlockSpec((1, block_k, W), lambda b, iq, ik: (b, ik, 1), **kwargs),
            pl.BlockSpec((1, block_k, W), lambda b, iq, ik: (b, ik, 2), **kwargs),
            pl.BlockSpec((1, 1, block_k), lambda b, iq, ik: (b, 0, ik), **kwargs),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, W), lambda b, iq, ik: (b, iq, 0), **kwargs
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, W), jnp.float32),
            pltpu.VMEM((num_heads, block_q, 128), jnp.float32),
            pltpu.VMEM((num_heads, block_q, 128), jnp.float32),
        ],
        interpret=interpret,
        **extra,
    )(qkv, qkv, qkv, bias)
    return out[:, :S, :]


def _packed_reference(qkv, num_heads, key_padding_mask):
    B, S, W3 = qkv.shape
    W = W3 // 3
    q, k, v = jnp.split(qkv, 3, axis=-1)
    split = lambda a: a.reshape(B, S, num_heads, W // num_heads).transpose(0, 2, 1, 3)
    out = _xla_attention(split(q), split(k), split(v), key_padding_mask)
    return out.transpose(0, 2, 1, 3).reshape(B, S, W)


def _packed_bwd_kernel(
    q_ref, k_ref, v_ref, do_ref, bias_ref, dq_ref, dk_ref, dv_ref, *, scale, H
):
    """Flash-style backward for the packed layout, one (batch, q-block)
    program: recompute P in VMEM, emit dQ for this block and accumulate
    dK/dV (f32) across q-blocks into the revisited full-S output blocks.
    """
    q = q_ref[0]      # [bq, W]
    k = k_ref[0]      # [S, W]
    v = v_ref[0]
    do = do_ref[0]    # [bq, W]
    bias = bias_ref[0]  # [1, S]
    W = q.shape[-1]
    D = W // H

    @pl.when(pl.program_id(1) == 0)
    def _init():
        dk_ref[...] = jnp.zeros_like(dk_ref)
        dv_ref[...] = jnp.zeros_like(dv_ref)

    for h in range(H):
        sl = slice(h * D, (h + 1) * D)
        logits = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale + bias
        p = jax.nn.softmax(logits, axis=-1)              # [bq, S] f32
        p_lo = p.astype(v.dtype)
        # dV_h = P^T dO_h
        dv_ref[0, :, sl] += jax.lax.dot_general(
            p_lo, do[:, sl], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # dP = dO_h V_h^T ; dL = P*(dP - rowsum(dP*P))
        dp = jax.lax.dot_general(
            do[:, sl], v[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                 # [bq, S]
        dl = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dl_lo = dl.astype(q.dtype)
        # dQ_h = s * dL K_h ; dK_h = s * dL^T Q_h
        dq_ref[0, :, sl] = (
            jax.lax.dot_general(
                dl_lo, k[:, sl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
        ).astype(dq_ref.dtype)
        dk_ref[0, :, sl] += jax.lax.dot_general(
            dl_lo, q[:, sl], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale


def _packed_backward(qkv, g, num_heads, key_padding_mask, block_q, interpret):
    B, S, W3 = qkv.shape
    W = W3 // 3
    if block_q is None:
        block_q = default_block_q(S)
    S_pad = _round_up(S, block_q)

    if key_padding_mask is None:
        key_padding_mask = jnp.zeros((B, S), bool)
    if S_pad != S:
        qkv = jnp.pad(qkv, ((0, 0), (0, S_pad - S), (0, 0)))
        g = jnp.pad(g, ((0, 0), (0, S_pad - S), (0, 0)))
        key_padding_mask = jnp.pad(
            key_padding_mask, ((0, 0), (0, S_pad - S)), constant_values=True
        )
    bias = jnp.where(key_padding_mask, NEG_INF, 0.0).astype(jnp.float32)[:, None, :]

    kwargs = dict(memory_space=_MEMSPACE) if _MEMSPACE is not None else {}
    extra = {}
    if pltpu is not None and not interpret:
        extra["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        )
    scale = 1.0 / ((W // num_heads) ** 0.5)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_packed_bwd_kernel, scale=scale, H=num_heads),
        out_shape=(
            jax.ShapeDtypeStruct((B, S_pad, W), qkv.dtype),
            jax.ShapeDtypeStruct((B, S_pad, W), jnp.float32),
            jax.ShapeDtypeStruct((B, S_pad, W), jnp.float32),
        ),
        grid=(B, S_pad // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, W), lambda b, iq: (b, iq, 0), **kwargs),
            pl.BlockSpec((1, S_pad, W), lambda b, iq: (b, 0, 1), **kwargs),
            pl.BlockSpec((1, S_pad, W), lambda b, iq: (b, 0, 2), **kwargs),
            pl.BlockSpec((1, block_q, W), lambda b, iq: (b, iq, 0), **kwargs),
            pl.BlockSpec((1, 1, S_pad), lambda b, iq: (b, 0, 0), **kwargs),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, W), lambda b, iq: (b, iq, 0), **kwargs),
            # dK/dV: one full-S block per batch, revisited (hence
            # accumulated) across the minor q-block grid axis
            pl.BlockSpec((1, S_pad, W), lambda b, iq: (b, 0, 0), **kwargs),
            pl.BlockSpec((1, S_pad, W), lambda b, iq: (b, 0, 0), **kwargs),
        ),
        interpret=interpret,
        **extra,
    )(qkv, qkv, qkv, g, bias)
    dqkv = jnp.concatenate(
        [dq.astype(qkv.dtype), dk.astype(qkv.dtype), dv.astype(qkv.dtype)], axis=-1
    )
    return dqkv[:, :S, :]


def _packed_fwd(qkv, num_heads, key_padding_mask, block_q, interpret):
    out = _packed_forward(qkv, num_heads, key_padding_mask, block_q, interpret)
    return out, (qkv, key_padding_mask)


def _packed_bwd(num_heads, block_q, interpret, residuals, g):
    qkv, mask = residuals
    B, S, W3 = qkv.shape
    if _needs_kv_streaming(S, W3 // 3, qkv.dtype.itemsize):
        # training never reaches these lengths (max 60x30 tokens); keep a
        # correct recompute-through-XLA fallback rather than a second
        # streaming kernel nothing exercises
        _, vjp = jax.vjp(lambda x: _packed_reference(x, num_heads, mask), qkv)
        (dqkv,) = vjp(g)
        return (dqkv, None)
    dqkv = _packed_backward(qkv, g, num_heads, mask, block_q, interpret)
    return (dqkv, None)


fused_set_attention_packed.defvjp(_packed_fwd, _packed_bwd)


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
