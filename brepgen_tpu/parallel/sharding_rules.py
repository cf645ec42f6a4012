"""Parameter sharding rules for the denoiser transformer.

The denoisers are ~85M params, so pure data parallelism (params
replicated, batch over 'data') is the production setting -- but the
'model' axis is wired end-to-end so the same train step scales by tensor
sharding the FFN / attention projections:

  qkv kernel   [d, 3d]      -> P(None, 'model')   (head-sharded QKV)
  attn proj    [d, d]       -> P('model', None)   (row-parallel; psum)
  ffn fc1      [d, ffn]     -> P(None, 'model')   (column-parallel)
  ffn fc2      [ffn, d]     -> P('model', None)   (row-parallel; psum)
  embeddings / norms / head -> replicated

XLA inserts the all-gathers/psums across ICI from these annotations --
the Megatron pattern without hand-written collectives.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _spec_for_path(path: tuple) -> P:
    names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    joined = "/".join(str(n) for n in names)
    leaf = names[-1] if names else ""
    if leaf != "kernel":
        return P()
    if "attn" in joined and "qkv" in joined:
        return P(None, "model")
    if "attn" in joined and "proj" in joined:
        return P("model", None)
    if "fc1" in joined and "layer_" in joined:
        return P(None, "model")
    if "fc2" in joined and "layer_" in joined:
        return P("model", None)
    return P()


def denoiser_param_shardings(params: Any, mesh: Mesh):
    """NamedSharding tree for a DenoiserTransformer param pytree."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _spec_for_path(path)), params
    )
