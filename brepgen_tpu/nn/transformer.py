"""Pre-LN transformer encoder for padded token *sets*.

Matches the effective architecture of the reference denoiser backbone
(``network.py:1076-1078``): 12 layers, d_model 768, 12 heads, FFN 1024 with
ReLU, dropout 0.1, norm_first (pre-LN), a final LayerNorm, and a key-padding
mask (True = padded) that removes padded tokens from attention keys. There
is deliberately no positional encoding -- tokens are a set.

The attention inner loop can run through a fused Pallas TPU kernel
(``brepgen_tpu.kernels.attention``) or plain XLA einsums; both share the
same mask semantics. Sequences here are short (<= max_face * max_edge =
1500 tokens), so a single non-blocked fused kernel per (batch, head) is the
right shape on TPU; XLA already fuses the QKV projections into MXU matmuls.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

NEG_INF = -1e9


def masked_attention_xla(
    q: jnp.ndarray,  # [B, H, S, D]
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_padding_mask: Optional[jnp.ndarray],  # [B, S] True = pad
) -> jnp.ndarray:
    scale = 1.0 / jnp.sqrt(jnp.asarray(q.shape[-1], q.dtype))
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    if key_padding_mask is not None:
        bias = jnp.where(key_padding_mask[:, None, None, :], NEG_INF, 0.0)
        logits = logits + bias.astype(logits.dtype)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


class MultiHeadSelfAttention(nn.Module):
    width: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"  # "xla" | "pallas"

    @nn.compact
    def __call__(self, x, key_padding_mask=None):
        B, S, _ = x.shape
        H = self.num_heads
        D = self.width // H
        qkv = nn.Dense(3 * self.width, dtype=self.dtype, name="qkv")(x)

        if self.attn_impl in ("pallas", "pallas_interpret"):
            from brepgen_tpu.kernels.attention import (
                PACKED_RESIDENT_BYTES,
                fused_set_attention,
                fused_set_attention_packed,
            )

            interp = self.attn_impl == "pallas_interpret"
            # resident K (or V) column-block size in the COMPUTE dtype --
            # must match _needs_kv_streaming's check inside the kernel, or
            # f32 mid-range sequences get routed to the slower streaming
            # variant despite passing a bf16-sized test here
            kv_bytes = S * self.width * jnp.dtype(self.dtype).itemsize
            if kv_bytes <= PACKED_RESIDENT_BYTES or S > 8192:
                # packed kernel consumes the projection output directly --
                # no head transpose/split/D-padding in HBM. Short sets keep
                # full-S K/V resident; very long ones stream K/V in chunks
                # (online softmax) inside the same entry point.
                out = fused_set_attention_packed(
                    qkv, H, key_padding_mask, None, interp
                )
            else:
                # mid-range (ABC-scale, ~3-8k tokens): the per-head kernel
                # wins -- a full [block_q, S] logits row still fits VMEM,
                # so no online-softmax bookkeeping, and per-head
                # [bq,64]@[64,S] contractions pipeline better than the
                # flash variant's chunked ones (measured 21 vs 54 ms/layer
                # at B=16, S=4000); worth the HBM head transposes.
                q, k, v = jnp.split(qkv, 3, axis=-1)
                split = lambda a: a.reshape(B, S, H, D).transpose(0, 2, 1, 3)
                out = fused_set_attention(
                    split(q), split(k), split(v), key_padding_mask, None, interp
                )
                out = out.transpose(0, 2, 1, 3).reshape(B, S, self.width)
        else:
            q, k, v = jnp.split(qkv, 3, axis=-1)
            split = lambda a: a.reshape(B, S, H, D).transpose(0, 2, 1, 3)
            out = masked_attention_xla(split(q), split(k), split(v), key_padding_mask)
            out = out.transpose(0, 2, 1, 3).reshape(B, S, self.width)

        return nn.Dense(self.width, dtype=self.dtype, name="proj")(out)


class EncoderLayer(nn.Module):
    width: int
    num_heads: int
    ffn_width: int
    dropout: float
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, x, key_padding_mask=None, deterministic=True):
        # Self-attention sub-block (pre-LN)
        h = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        h = MultiHeadSelfAttention(
            self.width, self.num_heads, self.dtype, self.attn_impl, name="attn"
        )(h, key_padding_mask)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        x = x + h
        # FFN sub-block (pre-LN, ReLU like torch's default activation)
        h = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        h = nn.Dense(self.ffn_width, dtype=self.dtype, name="fc1")(h)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.width, dtype=self.dtype, name="fc2")(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return x + h


class TransformerEncoder(nn.Module):
    width: int = 768
    num_heads: int = 12
    ffn_width: int = 1024
    num_layers: int = 12
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"
    # False = save everything; True/"full" = per-layer recompute (only layer
    # boundaries live); "dots" = selective checkpointing: save every Dense
    # output (dot_generals with no batch dims — qkv/proj/fc1/fc2) and
    # recompute only the cheap elementwise rest + attention (whose probs are
    # the HBM hog and whose Pallas backward recomputes them blockwise
    # anyway). "dots" keeps ~60% of the saved-activation footprint of
    # no-remat while recomputing ~0 matmul FLOPs, vs "full" which recomputes
    # the entire forward (~1/3 of step FLOPs).
    remat: object = False

    @nn.compact
    def __call__(self, x, key_padding_mask=None, deterministic=True):
        layer_cls = EncoderLayer
        if self.remat:
            policy = (jax.checkpoint_policies.dots_with_no_batch_dims_saveable
                      if self.remat == "dots" else None)
            layer_cls = nn.remat(EncoderLayer, static_argnums=(3,),
                                 policy=policy)
        for i in range(self.num_layers):
            x = layer_cls(
                self.width,
                self.num_heads,
                self.ffn_width,
                self.dropout,
                self.dtype,
                self.attn_impl,
                name=f"layer_{i}",
            )(x, key_padding_mask, deterministic)
        return nn.LayerNorm(dtype=self.dtype, name="final_norm")(x)
