"""Host-side batching: shuffled epochs of assembled numpy batches.

The reference uses torch DataLoader worker processes (``trainer.py:51-58``).
Here batches are assembled by pure functions (``assembly.py``) over
in-memory samples or pkl paths, optionally in a thread pool, and the
training loop overlaps host assembly with device compute via simple
lookahead prefetch (``prefetch_to_device``).
"""

from __future__ import annotations

import pickle
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Optional, Sequence, Union

import numpy as np

Sample = Union[dict, str]


def _load(sample: Sample) -> dict:
    if isinstance(sample, dict):
        return sample
    with open(sample, "rb") as f:
        return pickle.load(f)


class Batcher:
    """Shuffled epoch iterator yielding tuples of stacked numpy arrays.

    assemble_fn(sample_dict, rng) -> array or tuple of arrays.
    class_labels: optional per-sample int labels (furniture); when given,
    each batch gets a trailing [B, 1] int32 array of label+1 (0 = uncond),
    matching reference ``dataset.py:276``.
    """

    def __init__(
        self,
        samples: Sequence[Sample],
        assemble_fn: Callable,
        batch_size: int,
        seed: int = 0,
        drop_last: bool = True,
        class_labels: Optional[Sequence[int]] = None,
        num_workers: int = 0,
    ):
        self.samples = list(samples)
        self.assemble_fn = assemble_fn
        self.batch_size = batch_size
        self.drop_last = drop_last
        self.class_labels = class_labels
        self.num_workers = num_workers
        self._rng = np.random.default_rng(seed)
        self._pool = ThreadPoolExecutor(num_workers) if num_workers > 0 else None

    def __len__(self):
        n = len(self.samples) // self.batch_size
        if not self.drop_last and len(self.samples) % self.batch_size:
            n += 1
        return n

    def _assemble_one(self, idx: int, seed: int):
        rng = np.random.default_rng(seed)
        out = self.assemble_fn(_load(self.samples[idx]), rng)
        return out if isinstance(out, tuple) else (out,)

    def __iter__(self):
        order = self._rng.permutation(len(self.samples))
        seeds = self._rng.integers(0, 2**63 - 1, size=len(order))
        for start in range(0, len(order), self.batch_size):
            idxs = order[start : start + self.batch_size]
            if self.drop_last and len(idxs) < self.batch_size:
                break
            if self._pool is not None:
                items = list(self._pool.map(self._assemble_one, idxs, seeds[start:start + len(idxs)]))
            else:
                items = [self._assemble_one(i, s) for i, s in zip(idxs, seeds[start:start + len(idxs)])]
            batch = tuple(np.stack([it[k] for it in items]) for k in range(len(items[0])))
            if self.class_labels is not None:
                labels = np.asarray(
                    [[self.class_labels[i] + 1] for i in idxs], np.int32
                )
                batch = batch + (labels,)
            yield batch


def flat_vae_batcher(
    grids: np.ndarray, batch_size: int, seed: int = 0, aug_fn=None
):
    """Epoch iterator over a flat array of deduplicated VAE training items
    (reference trains VAEs on flat dedup arrays, ``dataset.py:145-151``)."""
    rng = np.random.default_rng(seed)

    def gen():
        order = rng.permutation(len(grids))
        for start in range(0, len(order) - batch_size + 1, batch_size):
            batch = grids[order[start : start + batch_size]]
            if aug_fn is not None:
                batch = aug_fn(batch, rng)
            yield batch

    return gen


def prefetch_to_device(iterator, lookahead: int = 2, sharding=None,
                       background: bool = False):
    """Wrap a host batch iterator with device-transfer lookahead.

    Keeps ``lookahead`` batches in flight on device while the train step
    consumes the current one (the torch-DataLoader-worker analog; transfers
    overlap compute because device_put is async). With ``background=True``
    a producer thread pulls and transfers batches, so host-side batch
    assembly itself also overlaps device compute instead of running on the
    consumer thread between steps.
    """
    import collections

    import jax

    def put(batch):
        if sharding is not None:
            return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
        return jax.tree.map(jax.device_put, batch)

    if background:
        import queue as queue_mod
        import threading

        q: "queue_mod.Queue" = queue_mod.Queue(maxsize=max(lookahead, 1))
        done = object()
        err: list = []

        def producer():
            try:
                for batch in iterator:
                    q.put(put(batch))
            except BaseException as e:  # noqa: BLE001 -- re-raised on consumer
                err.append(e)
            finally:
                q.put(done)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        while True:
            item = q.get()
            if item is done:
                if err:
                    raise err[0]
                return
            yield item

    queue = collections.deque()
    for batch in iterator:
        queue.append(put(batch))
        if len(queue) > lookahead:
            yield queue.popleft()
    while queue:
        yield queue.popleft()
