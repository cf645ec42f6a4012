"""Device mesh + sharding helpers.

The reference's only multi-device mechanism is single-process
``nn.DataParallel`` over <=2 GPUs (``trainer.py:279`` etc.). The TPU-native
replacement: one jitted train step over a ``jax.sharding.Mesh`` with the
batch sharded on the ``data`` axis and parameters replicated (or sharded on
the ``model`` axis for larger configs); XLA inserts the gradient
all-reduce over ICI. Multi-host scale-out uses the same annotations over a
``jax.distributed``-initialized global mesh.

Axes:
  data   -- batch sharding (gradient all-reduce over ICI)
  model  -- optional tensor sharding of FFN/attention-head dims; the
            denoisers (~85M params) never need it, but the axis is wired
            through so the same code scales.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    axis_shape: Optional[Tuple[int, ...]] = None,
    axis_names: Sequence[str] = ("data", "model"),
    devices=None,
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if axis_shape is None:
        axis_shape = (n,) + (1,) * (len(axis_names) - 1)
    assert int(np.prod(axis_shape)) == n, f"{axis_shape} != {n} devices"
    dev_array = np.asarray(devices).reshape(axis_shape)
    return Mesh(dev_array, axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis over 'data', rest replicated."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a pytree of host arrays with the batch axis over 'data'."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def replicate(tree, mesh: Mesh):
    s = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)
