"""Host-side batching: shuffled epochs of assembled numpy batches.

The reference feeds training from torch DataLoader worker *processes*
(``trainer.py:51-58,314``). Batches here are assembled by pure, picklable
functions (``assembly.py``) over in-memory samples or pkl paths; with
``num_workers > 0`` the work runs in a spawned process pool (each worker
holds its own copy of the sample list, tasks ship only ``(idx, seed)``) —
threads are GIL-negative for this numpy-heavy assembly (measured in
``scripts/io_bench.py``). The training loop overlaps host assembly with
device compute via lookahead prefetch (``prefetch_to_device``).

Workers never touch JAX: assembly is numpy-only, so no second device
process/client is ever created (critical on the axon backend).
"""

from __future__ import annotations

import pickle
import warnings
from typing import Callable, Optional, Sequence, Union

import numpy as np

Sample = Union[dict, str]


def _load(sample: Sample) -> dict:
    if isinstance(sample, dict):
        return sample
    with open(sample, "rb") as f:
        return pickle.load(f)


# Per-worker state, installed once by the pool initializer so that tasks
# are just (idx, seed) pairs — the torch-DataLoader-worker pattern.
_WORKER: dict = {}


def _pool_init(samples, assemble_fn):
    _WORKER["samples"] = samples
    _WORKER["assemble_fn"] = assemble_fn


def _pool_assemble(task):
    idx, seed = task
    rng = np.random.default_rng(seed)
    out = _WORKER["assemble_fn"](_load(_WORKER["samples"][idx]), rng)
    return out if isinstance(out, tuple) else (out,)


class Batcher:
    """Shuffled epoch iterator yielding tuples of stacked numpy arrays.

    assemble_fn(sample_dict, rng) -> array or tuple of arrays.
    class_labels: optional per-sample int labels (furniture); when given,
    each batch gets a trailing [B, 1] int32 array of label+1 (0 = uncond),
    matching reference ``dataset.py:276``.

    num_workers > 0 assembles in a spawned process pool (requires a
    picklable assemble_fn — module function or functools.partial); a
    non-picklable assemble_fn falls back to in-process assembly with a
    warning.

    batch_assemble_fn(samples, seeds) -> tuple of stacked [B, ...] arrays
    (``batch_assembly.py``): when given it replaces per-sample assembly
    with one vectorized call per batch — same distributions, exact same
    per-(sample, seed) draws — and the worker pool is not used (the
    vectorized path is faster than per-sample assembly on any core count).
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
        clamp_to_cpus: bool = True,
        batch_assemble_fn: Optional[Callable] = None,
    ):
        self.samples = list(samples)
        self.assemble_fn = assemble_fn
        self.batch_assemble_fn = batch_assemble_fn
        if batch_assemble_fn is not None:
            num_workers = 0  # vectorized path; no pool
        self.batch_size = batch_size
        self.drop_last = drop_last
        self.class_labels = class_labels
        # A pool cannot beat in-process assembly without spare cores: clamp
        # to cpu_count-1 (one core stays with the consumer/device threads).
        # On a 1-core host (this dev container) the pool is pure IPC +
        # context-switch overhead, measured 8x SLOWER than in-process
        # (scripts/io_bench.py) — real TPU hosts have 100+ cores.
        import os

        avail = max((os.cpu_count() or 1) - 1, 0)
        self.num_workers = min(num_workers, avail) if clamp_to_cpus else num_workers
        self._rng = np.random.default_rng(seed)
        self._pool = None
        if self.num_workers > 0:
            try:
                pickle.dumps(assemble_fn)
            except Exception:
                warnings.warn(
                    "assemble_fn is not picklable; falling back to "
                    "in-process batch assembly (pass a module-level "
                    "function or functools.partial to use worker processes)"
                )
            else:
                # spawn (not fork): the parent holds a live TPU client and
                # XLA threads; forked children could deadlock or inherit the
                # device tunnel. Spawned workers import numpy-only modules.
                import multiprocessing
                from concurrent.futures import ProcessPoolExecutor

                self._pool = ProcessPoolExecutor(
                    self.num_workers,
                    mp_context=multiprocessing.get_context("spawn"),
                    initializer=_pool_init,
                    initargs=(self.samples, assemble_fn),
                )

    def close(self):
        if self._pool is not None:
            self._pool.shutdown(wait=False, cancel_futures=True)
            self._pool = None

    def __del__(self):  # best-effort; explicit close() preferred
        try:
            self.close()
        except Exception:
            pass

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
            batch_seeds = seeds[start : start + len(idxs)]
            if self.batch_assemble_fn is not None:
                batch = self.batch_assemble_fn(
                    [_load(self.samples[i]) for i in idxs], batch_seeds
                )
                if self.class_labels is not None:
                    labels = np.asarray(
                        [[self.class_labels[i] + 1] for i in idxs], np.int32
                    )
                    batch = tuple(batch) + (labels,)
                yield tuple(batch)
                continue
            if self._pool is not None:
                chunk = max(1, len(idxs) // (2 * self.num_workers))
                items = list(
                    self._pool.map(
                        _pool_assemble,
                        [(int(i), int(s)) for i, s in zip(idxs, batch_seeds)],
                        chunksize=chunk,
                    )
                )
            else:
                items = [
                    self._assemble_one(i, s) for i, s in zip(idxs, batch_seeds)
                ]
            batch = tuple(
                np.stack([it[k] for it in items]) for k in range(len(items[0]))
            )
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
    consumer thread between steps. If the consumer abandons the generator
    early (break / exception / close), the producer is signalled to stop so
    it never blocks forever on a full queue.
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
        stop = threading.Event()
        err: list = []

        def producer():
            try:
                for batch in iterator:
                    item = put(batch)
                    while not stop.is_set():
                        try:
                            q.put(item, timeout=0.2)
                            break
                        except queue_mod.Full:
                            continue
                    if stop.is_set():
                        return
            except BaseException as e:  # noqa: BLE001 -- re-raised on consumer
                err.append(e)
            finally:
                while not stop.is_set():
                    try:
                        q.put(done, timeout=0.2)
                        break
                    except queue_mod.Full:
                        continue

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()

        def consume():
            try:
                while True:
                    item = q.get()
                    if item is done:
                        if err:
                            raise err[0]
                        return
                    yield item
            finally:
                stop.set()  # runs on break/exception/close of THIS generator

        yield from consume()
        return

    queue = collections.deque()
    for batch in iterator:
        queue.append(put(batch))
        if len(queue) > lookahead:
            yield queue.popleft()
    while queue:
        yield queue.popleft()
