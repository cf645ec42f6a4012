"""ABC-scale (S=4096) attention variant sweep — round-3 kernel work.

Times per-layer attention for every candidate at the graded config's edge
shape (B=16, W=768, H=12, S=4096):

  * per-head kernel, bq 512 (round-2 routing choice, 21 ms/layer then)
  * packed RESIDENT kernel at full-S K/V residency (6.3 MB blocks; round 2
    never measured it past its 4 MB threshold), bq in {256, 384, 512}
  * packed flash (K-chunked online softmax), block_k in {512, 1024, 2048}

Methodology per CLAUDE.md: chained lax.scan steps inside one jit (immune
to the remote result cache), salted inputs per process, in-process jit
outputs synchronize under block_until_ready.

Usage: python scripts/attn_sweep_r3.py [out.json]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

import brepgen_tpu.kernels.attention as A

B, H, W, S = 16, 12, 768, 4096
N_STEPS = 20


def scan_time(fn, x0, n=N_STEPS):
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
    seed = int.from_bytes(os.urandom(4), "little")
    key = jax.random.PRNGKey(seed)
    qkv0 = jax.random.normal(key, (B, S, 3 * W), jnp.bfloat16) * 0.05
    report = {"backend": jax.default_backend(), "B": B, "S": S, "W": W, "H": H}

    def renorm(o):
        # [B,S,W] -> fresh [B,S,3W] carry, bounded
        o = o / (jnp.abs(o).max() + 1e-6) * 0.05
        return jnp.concatenate([o, o * 1.01, o * 0.99], axis=-1).astype(jnp.bfloat16)

    # --- per-head kernel (routing splits/transposes like the model does) ---
    def perhead_step(qkv):
        q, k, v = jnp.split(qkv, 3, axis=-1)
        split = lambda a: a.reshape(B, S, H, W // H).transpose(0, 2, 1, 3)
        o = A.fused_set_attention(split(q), split(k), split(v), None, 512, False)
        return renorm(o.transpose(0, 2, 1, 3).reshape(B, S, W))

    try:
        dt = scan_time(perhead_step, qkv0)
        report["perhead_bq512_ms"] = round(dt * 1e3, 3)
        print(f"per-head bq=512: {dt*1e3:.2f} ms/layer", flush=True)
    except Exception as e:  # noqa: BLE001
        report["perhead_bq512_ms"] = f"FAILED: {e}"
        print(f"per-head FAILED: {e}", flush=True)

    # --- packed resident at full-S (force residency past the threshold) ---
    old = A.PACKED_RESIDENT_BYTES
    A.PACKED_RESIDENT_BYTES = 1 << 30
    try:
        for bq in (256, 384, 512):
            name = f"packed_resident_bq{bq}_ms"
            try:
                dt = scan_time(
                    lambda qkv, bq=bq: renorm(
                        A.fused_set_attention_packed(qkv, H, None, bq, False)
                    ),
                    qkv0,
                )
                report[name] = round(dt * 1e3, 3)
                print(f"packed resident bq={bq}: {dt*1e3:.2f} ms/layer", flush=True)
            except Exception as e:  # noqa: BLE001
                report[name] = f"FAILED: {type(e).__name__}"
                print(f"packed resident bq={bq} FAILED: {e}", flush=True)
    finally:
        A.PACKED_RESIDENT_BYTES = old

    # --- packed flash, k-chunk sweep ---
    for bk in (512, 1024, 2048):
        name = f"packed_flash_bk{bk}_ms"
        try:
            dt = scan_time(
                lambda qkv, bk=bk: renorm(
                    A._packed_flash_forward(qkv, H, None, 512, bk, False)
                ),
                qkv0,
            )
            report[name] = round(dt * 1e3, 3)
            print(f"packed flash bk={bk}: {dt*1e3:.2f} ms/layer", flush=True)
        except Exception as e:  # noqa: BLE001
            report[name] = f"FAILED: {type(e).__name__}"
            print(f"packed flash bk={bk} FAILED: {e}", flush=True)

    out_path = sys.argv[1] if len(sys.argv) > 1 else "artifacts/attn_sweep_r3.json"
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
