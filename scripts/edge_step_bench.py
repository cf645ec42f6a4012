"""Edge-step timing with a scan harness (immune to remote result caching)."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from brepgen_tpu.nn import make_edgez_net

B, NS, NE = 16, 60, 30
S = NS * NE
N_STEPS = 30


def measure(net, params, streams, t, mask):
    @jax.jit
    def run(zv):
        def body(zv, _):
            out = net.apply(params, (zv[..., :12], zv[..., 12:]) + streams[2:], t, mask)
            return out.astype(zv.dtype), ()

        zv, _ = jax.lax.scan(body, zv, None, length=N_STEPS)
        return zv

    zv0 = jax.random.normal(jax.random.PRNGKey(1), (B, S, 18))
    out = run(zv0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run(out)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / N_STEPS
    assert bool(jnp.isfinite(out).all())
    return dt


def main():
    key = jax.random.PRNGKey(0)
    t = jnp.full((B,), 500, jnp.int32)
    mask = jnp.zeros((B, S), bool)
    streams = tuple(
        jax.random.normal(key, (B, S, d)) for d in (12, 6, 6, 6, 48)
    )
    report = {}
    import brepgen_tpu.kernels.attention as ka

    ka_default = ka.default_block_q
    for impl, bq in (("pallas", 384), ("pallas", 640), ("pallas", 1920)):
        if bq is not None:
            ka.default_block_q = lambda s, _bq=bq: _bq
        try:
            net = make_edgez_net(dtype=jnp.bfloat16, attn_impl=impl)
            p = net.init(key, streams, t, mask)
            dt = measure(net, p, streams, t, mask)
            report[f"{impl}_{bq}_ms"] = round(dt * 1e3, 2)
        except Exception as e:  # noqa: BLE001
            report[f"{impl}_{bq}_ms"] = f"err: {str(e)[:90]}"
        finally:
            ka.default_block_q = ka_default
        print(json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
