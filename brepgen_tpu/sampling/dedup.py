"""On-device duplicate-bbox detection with static shapes.

The reference deduplicates generated face/edge bboxes on the host with
python loops and dynamic shapes (``sample.py:159-183,242-261``): greedy
first-occurrence scan, where a bbox is a duplicate if its max corner
deviation from any already-kept bbox (in either corner order) is below the
threshold; kept bboxes are compacted and the rest masked.

TPU version: identical greedy semantics as a masked ``lax.scan`` over the
(<=100) token slots, vmapped over batch -- no host synchronization, no
dynamic shapes. We keep tokens in place and return a keep-mask instead of
compacting; the denoisers are permutation-invariant set models with
key-padding masks, so in-place masking is mathematically equivalent to the
reference's compaction (masked tokens are excluded from attention keys and
from every downstream loss/output).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _round4(x):
    """Reference rounds to 4 decimals before comparing (``sample.py:162``)."""
    return jnp.round(x * 1e4) / 1e4


def _greedy_keep(bboxes: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """bboxes [S, 6] -> keep [S] bool. Greedy first-occurrence scan."""
    S = bboxes.shape[0]
    b = _round4(bboxes).reshape(S, 2, 3)
    b_rev = b[:, ::-1, :]

    # pairwise max-abs corner deviation, both orientations: [S, S]
    diff = jnp.max(jnp.abs(b[:, None] - b[None, :]), axis=(-1, -2))
    diff_rev = jnp.max(jnp.abs(b[:, None] - b_rev[None, :]), axis=(-1, -2))
    near = (diff < threshold) | (diff_rev < threshold)  # near[i, j]

    idx = jnp.arange(S)

    def body(keep, i):
        conflict = jnp.any(near[i] & keep & (idx < i))
        keep = keep.at[i].set((i == 0) | ~conflict)
        return keep, None

    keep0 = jnp.zeros(S, bool)
    keep, _ = jax.lax.scan(body, keep0, idx)
    return keep


def dedup_bboxes(bboxes: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """[B, S, 6] -> keep mask [B, S] (True = keep). Slot 0 always kept."""
    return jax.vmap(lambda b: _greedy_keep(b, threshold))(bboxes)


def dedup_edges_per_face(
    edge_bboxes: jnp.ndarray, surf_keep: jnp.ndarray, threshold: float
) -> jnp.ndarray:
    """[B, nf, ne, 6] + face keep [B, nf] -> edge keep [B, nf, ne].

    Per face, same greedy scan over its edge slots; edges of dropped faces
    are all masked; the first edge slot of a valid face is always kept
    (reference forces it at ``sample.py:261``).
    """
    keep = jax.vmap(jax.vmap(lambda b: _greedy_keep(b, threshold)))(edge_bboxes)
    return keep & surf_keep[:, :, None]
