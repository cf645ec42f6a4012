"""One-off probe: where does the edge-step's 95 ms go on the real chip?

Ablates the bench edge step (B=16, S=1800, d768/12L bf16):
  * chip matmul calibration (chained bf16 matmuls at a few shapes)
  * full edge step, XLA vs Pallas attention
  * linears-only step (attention replaced by identity)
  * attention-only microbench at the layer shape
Prints a small JSON report. Not part of the test suite.
"""

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


def timeit(step, x0, iters=20, warmup=2):
    x = x0
    for _ in range(warmup):
        x = step(x)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(iters):
        x = step(x)
    jax.block_until_ready(x)
    return (time.perf_counter() - t0) / iters


def matmul_calibration(report):
    key = jax.random.PRNGKey(0)
    for n in (2048, 4096, 8192):
        a = jax.random.normal(key, (n, n), jnp.bfloat16)
        b = jax.random.normal(key, (n, n), jnp.bfloat16)

        @jax.jit
        def mm(a, b=b):
            # chain 4 matmuls so dispatch overhead amortizes
            for _ in range(4):
                a = jnp.dot(a, b)
            return a

        t = timeit(lambda a: mm(a), a, iters=10)
        tf = 4 * 2 * n**3 / t / 1e12
        report[f"matmul_{n}_tf_s"] = round(tf, 1)
    # low-K matmul (attention QK^T shape): [1800,64]x[64,1800] batched 192
    q = jax.random.normal(key, (192, 1800, 64), jnp.bfloat16)
    k = jax.random.normal(key, (192, 1800, 64), jnp.bfloat16)

    @jax.jit
    def qk(q):
        lg = jnp.einsum("bqd,bkd->bqk", q, k)
        return jnp.einsum("bqk,bkd->bqd", lg.astype(jnp.bfloat16), k)

    t = timeit(qk, q, iters=10)
    fl = 2 * 2 * 192 * 1800 * 1800 * 64
    report["attn_matmuls_xla_ms"] = round(t * 1e3, 2)
    report["attn_matmuls_xla_tf_s"] = round(fl / t / 1e12, 1)


def edge_step_variants(report):
    key = jax.random.PRNGKey(0)
    t = jnp.full((B,), 500, jnp.int32)
    mask = jnp.zeros((B, S), bool)
    streams = (
        jax.random.normal(key, (B, S, 12)),
        jax.random.normal(key, (B, S, 6)),
        jax.random.normal(key, (B, S, 6)),
        jax.random.normal(key, (B, S, 6)),
        jax.random.normal(key, (B, S, 48)),
    )

    for impl in ("xla", "pallas"):
        net = make_edgez_net(dtype=jnp.bfloat16, attn_impl=impl)
        p = net.init(key, streams, t, mask)

        @jax.jit
        def step(zv, p=p, net=net):
            return net.apply(p, (zv[..., :12], zv[..., 12:]) + streams[2:], t, mask)

        tt = timeit(step, jax.random.normal(key, (B, S, 18)), iters=20)
        report[f"edge_step_{impl}_ms"] = round(tt * 1e3, 2)

    # linears-only: monkeypatch attention to identity
    import brepgen_tpu.nn.transformer as tr

    orig = tr.masked_attention_xla
    tr.masked_attention_xla = lambda q, k, v, m: v
    try:
        net = make_edgez_net(dtype=jnp.bfloat16, attn_impl="xla")
        p = net.init(key, streams, t, mask)

        @jax.jit
        def step2(zv):
            return net.apply(p, (zv[..., :12], zv[..., 12:]) + streams[2:], t, mask)

        tt = timeit(step2, jax.random.normal(key, (B, S, 18)), iters=20)
        report["edge_step_noattn_ms"] = round(tt * 1e3, 2)
    finally:
        tr.masked_attention_xla = orig

    # attention-only at layer shape, both impls
    from brepgen_tpu.kernels.attention import fused_set_attention
    from brepgen_tpu.nn.transformer import masked_attention_xla

    q = jax.random.normal(key, (B, 12, S, 64), jnp.bfloat16)

    @jax.jit
    def attn_x(q):
        o = masked_attention_xla(q, q, q, None)
        return o + q  # keep chain

    @jax.jit
    def attn_p(q):
        o = fused_set_attention(q, q, q, None, 128, False)
        return o + q

    report["attn_only_xla_ms"] = round(timeit(attn_x, q, iters=20) * 1e3, 2)
    report["attn_only_pallas_ms"] = round(timeit(attn_p, q, iters=20) * 1e3, 2)


def main():
    report = {
        "backend": jax.default_backend(),
        "device_kind": jax.devices()[0].device_kind,
    }
    matmul_calibration(report)
    edge_step_variants(report)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
