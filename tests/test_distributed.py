"""Multi-host (DCN) data parallelism: 2 processes x 4 CPU devices each run
the real train step over the global 8-device mesh (collectives cross the
process boundary through the distributed runtime — the same code path as
multi-host TPU over DCN) and must reproduce the single-process 8-device
result exactly. Covers SURVEY §2.3 'Multi-host DCN' (VERDICT r1: untested).
"""

import os
import pickle
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest

from tests.dist_common import make_global_batches, make_step

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_matches_single_process(tmp_path):
    port = _free_port()
    procs, outs = [], []
    for pid in (0, 1):
        out = str(tmp_path / f"worker{pid}.pkl")
        outs.append(out)
        env = dict(os.environ)
        kept = [f for f in env.get("XLA_FLAGS", "").split()
                if "xla_force_host_platform_device_count" not in f]
        env["XLA_FLAGS"] = " ".join(kept + ["--xla_force_host_platform_device_count=4"])
        env.update(
            COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            NUM_PROCESSES="2",
            PROCESS_ID=str(pid),
            JAX_PLATFORMS="cpu",
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, os.path.join(REPO, "tests", "dist_worker.py"),
                 "--out", out],
                cwd=REPO, env=env,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
        )
    logs = [p.communicate(timeout=600)[0] for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-3000:]

    results = []
    for out in outs:
        with open(out, "rb") as f:
            results.append(pickle.load(f))

    assert results[0]["device_count"] == 8
    # both processes observed the identical global state
    np.testing.assert_allclose(results[0]["losses"], results[1]["losses"], rtol=1e-6)
    np.testing.assert_allclose(results[0]["param_l1"], results[1]["param_l1"], rtol=1e-6)

    # single-process 8-device reference (conftest provides the mesh)
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.array(jax.devices()).reshape(8, 1), ("data", "model"))
    repl = NamedSharding(mesh, P())
    data_sh = NamedSharding(mesh, P("data"))
    model, step_fn, init_args, opt, init_state = make_step()
    params = jax.jit(model.init, out_shardings=repl)(*init_args)
    state = init_state(params, opt)
    state = state._replace(
        opt_state=jax.device_put(state.opt_state, repl),
        step=jax.device_put(state.step, repl),
    )
    rng = jax.random.PRNGKey(7)
    losses = []
    for global_np in make_global_batches():
        batch = {k: jax.device_put(jnp.asarray(v), data_sh) for k, v in global_np.items()}
        rng, sub = jax.random.split(rng)
        state, m = step_fn(state, batch, sub)
        losses.append(float(m["loss"]))

    np.testing.assert_allclose(results[0]["losses"], losses, rtol=1e-5, atol=1e-6)
    want_l1 = [float(jnp.sum(jnp.abs(x))) for x in jax.tree.leaves(state.params)]
    # cross-process all-reduce (Gloo) accumulates in a different order than
    # the single-process reduction; allow f32 summation-order noise
    np.testing.assert_allclose(results[0]["param_l1"], want_l1, rtol=5e-3, atol=1e-5)
