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


def save_params_npz(ckpt_dir: str, params, name: str) -> str:
    """Single-file weights artifact (committable evidence checkpoints).

    Orbax directories are many-file trees that the round artifacts
    gitignore; quality-evidence checkpoints are packed to one compressed
    ``.npz`` per stage instead (VERDICT r4 item 3: demo checkpoints must
    survive workspace resets). Loading goes through ``load_params`` which
    dispatches on the file extension.
    """
    import jax
    import numpy as np
    from flax import traverse_util

    def to_np(v):
        v = np.asarray(jax.device_get(v))
        # bf16 numpy arrays don't np.save without pickle; params are
        # float32 in training (bf16 is the COMPUTE dtype) — normalize
        return v if np.issubdtype(v.dtype, np.integer) else v.astype(np.float32)

    flat = traverse_util.flatten_dict(params, sep="/")
    path = os.path.abspath(os.path.join(ckpt_dir, name + ".npz"))
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(path, **{k: to_np(v) for k, v in flat.items()})
    return path


def load_params(path: str, template=None):
    path = os.path.abspath(path)
    npz = path if path.endswith(".npz") else path + ".npz"
    if not os.path.isdir(path) and os.path.isfile(npz):
        import numpy as np
        from flax import traverse_util

        raw = np.load(npz)
        return traverse_util.unflatten_dict(
            {tuple(k.split("/")): raw[k] for k in raw.files})
    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        return ckptr.restore(path, {"params": template})["params"]
    try:
        return ckptr.restore(path, None)["params"]
    except ValueError:
        # Template-less restore replays the SAVED shardings, which name the
        # device the checkpoint was written on — restoring a TPU-written
        # tree in a CPU process (pack_ckpt.py) raises "Device ... was not
        # found in jax.local_devices()". Rebuild an abstract target from
        # the checkpoint's own metadata with a local-device sharding.
        import jax

        meta = ckptr.metadata(path)
        # Checkpointer.metadata wraps the tree: StepMetadata.item_metadata
        # is the TreeMetadata, whose .tree is the raw pytree of
        # ArrayMetadata leaves (orbax 0.11 layering)
        meta = getattr(meta, "item_metadata", meta)
        meta = getattr(meta, "tree", meta)
        sharding = jax.sharding.SingleDeviceSharding(jax.local_devices()[0])
        target = jax.tree.map(
            lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype, sharding=sharding),
            meta,
            is_leaf=lambda m: hasattr(m, "shape") and hasattr(m, "dtype"),
        )
        return ckptr.restore(path, target)["params"]
