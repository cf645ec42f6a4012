"""Host-side frozen-VAE latent cache for LDM training.

The LDM trainers encode conditioning geometry through the frozen VAEs
every step (reference ``trainer.py:519-524,919-929``). The encoders are
deterministic (posterior mode, ``network.py:944``), so with rotation
augmentation OFF the same face/edge grid always maps to the same latent
— per-sample grids repeat every epoch, and ``pad_repeat`` / mating
duplication repeat them within every batch. This cache keys latents by
grid content and encodes only misses, padded to fixed-size buckets so
every device call reuses one compiled XLA program.

With augmentation ON the rotated grids change every epoch
(``dataset.py:322,499-500`` rotates surf_ncs/edge_ncs) and caching is
invalid — callers must gate on ``data_aug`` (SURVEY §7 hard part 4:
"caching is only valid with --data_aug off; keep both paths").
"""

from __future__ import annotations

import hashlib
from typing import Callable, Tuple

import jax.numpy as jnp
import numpy as np


class LatentCache:
    """Content-keyed grids -> latents map backed by a frozen encoder.

    encode(params, grids[N, *grid_shape]) must be deterministic; its
    output is flattened to [N, latent_dim] and stored as f32.
    """

    def __init__(
        self,
        encode: Callable,
        params,
        grid_shape: Tuple[int, ...],
        latent_dim: int,
        bucket: int = 1024,
    ):
        self.encode = encode
        self.params = params
        self.grid_shape = tuple(grid_shape)
        self.latent_dim = latent_dim
        self.bucket = bucket
        self._store = {}
        self.hits = 0
        self.misses = 0

    def __call__(self, grids: np.ndarray) -> np.ndarray:
        """[N, *grid_shape] -> [N, latent_dim] f32."""
        grids = np.ascontiguousarray(grids, np.float32)
        assert grids.shape[1:] == self.grid_shape, grids.shape
        keys = [
            hashlib.blake2b(row.tobytes(), digest_size=16).digest()
            for row in grids.reshape(len(grids), -1)
        ]
        miss_idx, first_of = [], {}
        for i, k in enumerate(keys):
            if k not in self._store and k not in first_of:
                first_of[k] = i
                miss_idx.append(i)
        if miss_idx:
            self.misses += len(miss_idx)
            miss = grids[miss_idx]
            pad = (-len(miss)) % self.bucket
            if pad:
                miss = np.concatenate(
                    [miss, np.zeros((pad,) + self.grid_shape, np.float32)]
                )
            outs = [
                np.asarray(
                    self.encode(self.params, jnp.asarray(miss[s : s + self.bucket])),
                    np.float32,
                )
                for s in range(0, len(miss), self.bucket)
            ]
            z = np.concatenate(outs)[: len(miss_idx)].reshape(len(miss_idx), -1)
            assert z.shape[1] == self.latent_dim, z.shape
            for j, i in enumerate(miss_idx):
                self._store[keys[i]] = z[j]
        self.hits += len(keys) - len(miss_idx)
        return np.stack([self._store[k] for k in keys])

    def __len__(self):
        return len(self._store)
