"""Epoch-based training loop driver shared by all stages.

Mirrors the reference's trainer loop structure (``vae.py:31-39`` /
``ldm.py:44-52``): train ``train_nepoch`` epochs, run validation every
``test_nepoch``, checkpoint every ``save_nepoch`` (named ``epoch_N`` for
artifact parity) -- plus full resumable train-state checkpoints, which the
reference lacks.
"""

from __future__ import annotations

import time
from typing import Callable, Iterable, Optional

import jax

from brepgen_tpu.train.checkpoint import save_checkpoint, save_params
from brepgen_tpu.train.common import TrainState
from brepgen_tpu.train.logging import MetricsLogger


def run_training(
    train_step: Callable,
    make_epoch_iter: Callable[[], Iterable],
    state: TrainState,
    *,
    epochs: int,
    rng: jax.Array,
    logger: MetricsLogger,
    ckpt_dir: str,
    val_fn: Optional[Callable[[TrainState], dict]] = None,
    test_nepoch: int = 10,
    save_nepoch: int = 20,
    log_every: int = 10,
    to_batch: Callable = None,
) -> TrainState:
    step_count = int(state.step)
    for epoch in range(1, epochs + 1):
        t0 = time.time()
        for batch in make_epoch_iter():
            if to_batch is not None:
                batch = to_batch(batch)
            rng, sub = jax.random.split(rng)
            state, metrics = train_step(state, batch, sub)
            if step_count % log_every == 0:
                logger.log({k: float(v) for k, v in metrics.items()}, step_count)
            step_count += 1
        logger.log({"epoch": epoch, "epoch_seconds": time.time() - t0}, step_count)

        if val_fn is not None and epoch % test_nepoch == 0:
            val_metrics = val_fn(state)
            logger.log(val_metrics, step_count)

        if epoch % save_nepoch == 0 or epoch == epochs:
            save_params(ckpt_dir, state.params, f"epoch_{epoch}")
            save_checkpoint(ckpt_dir, state, "latest")
    return state
