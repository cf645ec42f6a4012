"""Orbax checkpointing: params + optimizer state + step (resumable).

The reference saves only model weights (``torch.save(state_dict)`` every
``save_nepoch``, ``trainer.py:132-133``) -- training cannot resume. Here
full train state is checkpointed; the public ``epoch_N`` naming convention
is preserved so downstream tooling (sampling config files) keeps working.
"""

from __future__ import annotations

import os
from typing import Optional

import orbax.checkpoint as ocp

from brepgen_tpu.train.common import TrainState


def save_checkpoint(ckpt_dir: str, state: TrainState, name: str = "latest") -> str:
    path = os.path.abspath(os.path.join(ckpt_dir, name))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, {"params": state.params, "opt_state": state.opt_state, "step": state.step},
               force=True)
    ckptr.wait_until_finished()
    return path


def load_checkpoint(path: str, template: Optional[TrainState] = None) -> TrainState:
    ckptr = ocp.StandardCheckpointer()
    target = None
    if template is not None:
        target = {
            "params": template.params,
            "opt_state": template.opt_state,
            "step": template.step,
        }
    restored = ckptr.restore(os.path.abspath(path), target)
    return TrainState(restored["params"], restored["opt_state"], restored["step"])


def save_params(ckpt_dir: str, params, name: str) -> str:
    """Weights-only artifact (the ``epoch_N`` equivalent of the reference)."""
    path = os.path.abspath(os.path.join(ckpt_dir, name))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, {"params": params}, force=True)
    ckptr.wait_until_finished()
    return path


def load_params(path: str, template=None):
    ckptr = ocp.StandardCheckpointer()
    target = {"params": template} if template is not None else None
    return ckptr.restore(os.path.abspath(path), target)["params"]
