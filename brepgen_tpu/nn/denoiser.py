"""The four cascaded denoisers as ONE parameterized transformer.

The reference implements four near-identical modules (``network.py:1066-1393``:
SurfPosNet / SurfZNet / EdgePosNet / EdgeZNet). Each embeds a handful of
per-token input streams with the same MLP embedder, sums them with a
sinusoidal time embedding (and an optional class embedding with 10% label
dropout for classifier-free guidance), runs a 12-layer pre-LN transformer
over the padded token set, and projects to the prediction dimension.

Here that is a single ``DenoiserTransformer`` with a stream spec; the four
nets are factory configurations. Face-level conditioning for the edge
stages is broadcast per-edge and flattened by the helpers below (the
reference does the same with repeat+flatten at ``network.py:1265-1268``).

Stream layouts (B = batch, nf = max faces, ne = max edges/face):
  surfpos: streams (surfPos[B,nf,6])                          -> eps[B,nf,6]
  surfz:   streams (surfZ[B,nf,48], surfPos[B,nf,6])          -> eps[B,nf,48]
  edgepos: streams (edgePos, surfPos*, surfZ*) [B,nf*ne,...]  -> eps[B,nf*ne,6]
  edgez:   streams (edgeZ, vertPos, edgePos, surfPos*, surfZ*)-> eps[B,nf*ne,18]
(* broadcast from faces to edges)
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from brepgen_tpu.nn.layers import MLPEmbedder, sincos_embedding
from brepgen_tpu.nn.transformer import TransformerEncoder


def broadcast_face_to_edge(x: jnp.ndarray, num_edges: int) -> jnp.ndarray:
    """[B, nf, d] -> [B, nf*ne, d] by repeating each face token per edge slot."""
    B, nf, d = x.shape
    return jnp.broadcast_to(x[:, :, None, :], (B, nf, num_edges, d)).reshape(
        B, nf * num_edges, d
    )


def flatten_face_edge(x: jnp.ndarray) -> jnp.ndarray:
    """[B, nf, ne, d] -> [B, nf*ne, d]."""
    B, nf, ne, d = x.shape
    return x.reshape(B, nf * ne, d)


class DenoiserTransformer(nn.Module):
    stream_dims: Tuple[int, ...]
    stream_names: Tuple[str, ...]
    out_dim: int
    use_cf: bool = False
    num_classes: int = 11
    width: int = 768
    num_heads: int = 12
    ffn_width: int = 1024
    num_layers: int = 12
    dropout: float = 0.1
    label_dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        streams: Sequence[jnp.ndarray],
        timesteps: jnp.ndarray,
        key_padding_mask: Optional[jnp.ndarray] = None,
        class_label: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        assert len(streams) == len(self.stream_dims)
        B = streams[0].shape[0]

        tokens = 0.0
        for name, dim, s in zip(self.stream_names, self.stream_dims, streams):
            assert s.shape[-1] == dim, f"stream {name}: {s.shape} != {dim}"
            tokens = tokens + MLPEmbedder(self.width, dtype=self.dtype, name=f"{name}_embed")(
                s.astype(self.dtype)
            )

        t = jnp.broadcast_to(jnp.atleast_1d(timesteps), (B,))
        t_emb = MLPEmbedder(self.width, dtype=self.dtype, name="time_embed")(
            sincos_embedding(t, self.width).astype(self.dtype)
        )
        tokens = tokens + t_emb[:, None, :]

        if self.use_cf:
            assert class_label is not None
            label = class_label.reshape(B)
            if train:
                # 10% label dropout to the uncond class (reference
                # network.py:1115-1117) -- explicit rng stream "cfg".
                u = jax.random.uniform(self.make_rng("cfg"), (B,))
                label = jnp.where(u <= self.label_dropout, 0, label)
            c_emb = nn.Embed(
                self.num_classes,
                self.width,
                dtype=self.dtype,
                embedding_init=nn.initializers.variance_scaling(
                    2.0, "fan_in", "normal"
                ),
                name="class_embed",
            )(label)
            tokens = tokens + c_emb[:, None, :]

        out = TransformerEncoder(
            width=self.width,
            num_heads=self.num_heads,
            ffn_width=self.ffn_width,
            num_layers=self.num_layers,
            dropout=self.dropout,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            remat=self.remat,
            name="encoder",
        )(tokens, key_padding_mask, deterministic=not train)

        pred = MLPEmbedder(self.width, out_dim=self.out_dim, dtype=self.dtype, name="head")(out)
        return pred.astype(jnp.float32)


def make_surfpos_net(use_cf: bool = False, **kw) -> DenoiserTransformer:
    return DenoiserTransformer(
        stream_dims=(6,), stream_names=("surfpos",), out_dim=6, use_cf=use_cf, **kw
    )


def make_surfz_net(use_cf: bool = False, **kw) -> DenoiserTransformer:
    return DenoiserTransformer(
        stream_dims=(48, 6),
        stream_names=("surfz", "surfpos"),
        out_dim=48,
        use_cf=use_cf,
        **kw,
    )


def make_edgepos_net(use_cf: bool = False, **kw) -> DenoiserTransformer:
    return DenoiserTransformer(
        stream_dims=(6, 6, 48),
        stream_names=("edgepos", "surfpos", "surfz"),
        out_dim=6,
        use_cf=use_cf,
        **kw,
    )


def make_edgez_net(use_cf: bool = False, **kw) -> DenoiserTransformer:
    return DenoiserTransformer(
        stream_dims=(12, 6, 6, 6, 48),
        stream_names=("edgez", "vertpos", "edgepos", "surfpos", "surfz"),
        out_dim=18,
        use_cf=use_cf,
        **kw,
    )
