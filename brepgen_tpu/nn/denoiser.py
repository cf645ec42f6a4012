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

Sampling-path optimization: conditioning streams are constant across the
whole denoise loop, so ``embed_streams`` can pre-compute their summed token
embedding once per stage and ``denoise`` adds it each step -- only the
noisy streams' embedders run inside the scan.

Stream layouts (B = batch, nf = max faces, ne = max edges/face):
  surfpos: streams (surfPos[B,nf,6])                          -> eps[B,nf,6]
  surfz:   streams (surfZ[B,nf,48], surfPos[B,nf,6])          -> eps[B,nf,48]
  edgepos: streams (edgePos, surfPos*, surfZ*) [B,nf*ne,...]  -> eps[B,nf*ne,6]
  edgez:   streams (edgeZ, vertPos, edgePos, surfPos*, surfZ*)-> eps[B,nf*ne,18]
(* broadcast from faces to edges)
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

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
    remat: object = False  # False | True ("full") | "dots" (see transformer.py)

    def setup(self):
        # attribute names define the param-tree keys; keep them stable
        # (checkpoint layout + torch converter depend on them)
        for name in self.stream_names:
            setattr(
                self, f"{name}_embed", MLPEmbedder(self.width, dtype=self.dtype)
            )
        self.time_embed = MLPEmbedder(self.width, dtype=self.dtype)
        if self.use_cf:
            self.class_embed = nn.Embed(
                self.num_classes,
                self.width,
                dtype=self.dtype,
                embedding_init=nn.initializers.variance_scaling(2.0, "fan_in", "normal"),
            )
        self.encoder = TransformerEncoder(
            width=self.width,
            num_heads=self.num_heads,
            ffn_width=self.ffn_width,
            num_layers=self.num_layers,
            dropout=self.dropout,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            remat=self.remat,
        )
        self.head = MLPEmbedder(self.width, out_dim=self.out_dim, dtype=self.dtype)

    def embed_streams(self, named_streams: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        """Sum the embedder outputs of the given (sub)set of streams.

        Used by the sampler to precompute the constant conditioning
        embedding once per stage, outside the denoise scan.
        """
        dims = dict(zip(self.stream_names, self.stream_dims))
        tokens = 0.0
        for name, s in named_streams.items():
            assert name in dims, f"unknown stream {name}"
            assert s.shape[-1] == dims[name], f"stream {name}: {s.shape}"
            tokens = tokens + getattr(self, f"{name}_embed")(s.astype(self.dtype))
        return tokens

    def denoise(
        self,
        noisy_streams: Dict[str, jnp.ndarray],
        timesteps: jnp.ndarray,
        cond_embed: Optional[jnp.ndarray] = None,
        key_padding_mask: Optional[jnp.ndarray] = None,
        class_label: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        example = next(iter(noisy_streams.values()))
        B = example.shape[0]

        tokens = self.embed_streams(noisy_streams)
        if cond_embed is not None:
            tokens = tokens + cond_embed

        t = jnp.broadcast_to(jnp.atleast_1d(timesteps), (B,))
        t_emb = self.time_embed(sincos_embedding(t, self.width).astype(self.dtype))
        tokens = tokens + t_emb[:, None, :]

        if self.use_cf:
            assert class_label is not None
            label = class_label.reshape(B)
            if train:
                # 10% label dropout to the uncond class (reference
                # network.py:1115-1117) -- explicit rng stream "cfg".
                u = jax.random.uniform(self.make_rng("cfg"), (B,))
                label = jnp.where(u <= self.label_dropout, 0, label)
            tokens = tokens + self.class_embed(label)[:, None, :]

        out = self.encoder(tokens, key_padding_mask, deterministic=not train)
        return self.head(out).astype(jnp.float32)

    def __call__(
        self,
        streams: Sequence[jnp.ndarray],
        timesteps: jnp.ndarray,
        key_padding_mask: Optional[jnp.ndarray] = None,
        class_label: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        assert len(streams) == len(self.stream_dims)
        named = dict(zip(self.stream_names, streams))
        return self.denoise(named, timesteps, None, key_padding_mask, class_label, train)


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
