"""Sweep Pallas attention q-block sizes at the cascade's hot shapes.

Times a lax.scan of N chained attention steps inside ONE jit program --
the same shape of work as the cascade's denoise loops, and immune to the
remote backend's per-call result caching (identical repeated jit calls get
cached; see CLAUDE.md).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from brepgen_tpu.kernels.attention import fused_set_attention
from brepgen_tpu.nn.transformer import masked_attention_xla

N_STEPS = 50


def scan_time(fn, x0, n=N_STEPS):
    """Seconds per step of x <- fn(x) inside one compiled scan."""

    @jax.jit
    def run(x):
        def body(x, _):
            return fn(x), ()

        x, _ = jax.lax.scan(body, x, None, length=n)
        return x

    out = run(x0)
    jax.block_until_ready(out)  # compile + first run
    t0 = time.perf_counter()
    out = run(out)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    assert bool(jnp.isfinite(out).all()), "diverged"
    return dt


def main():
    key = jax.random.PRNGKey(0)
    report = {}
    for S in (1800, 4000):
        q = jax.random.normal(key, (16, 12, S, 64), jnp.bfloat16) * 0.05

        def step(x, impl):
            if impl == "xla":
                o = masked_attention_xla(x, x, x, None)
            else:
                o = fused_set_attention(x, x, x, None, impl, False)
            # normalize so the chain neither explodes nor collapses
            return (o / (jnp.abs(o).max() + 1e-6) * 0.05).astype(x.dtype)

        for impl in ("xla", 128, 256, 384, 512):
            try:
                t = scan_time(lambda x, impl=impl: step(x, impl), q)
            except Exception as e:  # noqa: BLE001
                report[f"S{S}_{impl}"] = f"err: {str(e)[:90]}"
                continue
            fl = 2 * 2 * 16 * 12 * S * S * 128
            report[f"S{S}_{impl}_ms"] = round(t * 1e3, 2)
            report[f"S{S}_{impl}_tf_s"] = round(fl / t / 1e12, 1)
        print(json.dumps(report, indent=1), flush=True)


if __name__ == "__main__":
    main()
