"""Benchmark: denoise-step throughput of the full-size cascade on one chip.

Measures the two workloads that dominate generation wall-clock (see
SURVEY.md section 3.3 -- ~1216 sequential denoiser forwards per batch):

  * surf stage: SurfPosNet/SurfZNet-shaped forward, batch 16, 60 tokens
    (DeepCAD num_surfaces=30 doubled by the late increase);
  * edge stage: EdgeZNet-shaped forward, batch 16, 60x30=1800 tokens --
    the heavy stage (packed Pallas attention);

both with the production d=768/12L/12h architecture in bf16 on the real
device. Timing runs the step as the body of a lax.scan -- exactly how the
production cascade executes its denoise loops -- so per-dispatch overhead
and any backend-side result caching of repeated identical calls (see
CLAUDE.md) cannot distort the number; the scan carry chains each step's
output into the next step's input.

The headline metric extrapolates full-cascade B-reps/min/chip from the
measured per-step times and the reference's step counts (408 surf-pos +
209 surf-z + 408 edge-pos + 209 edge-z evals). The independently measured
end-to-end cascade (scripts/bench_cascade.py) tracks this estimate to
within a few percent (BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is relative to the estimated reference throughput on A100
(see BASELINE.md for the derivation; the reference publishes no numbers).
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

from brepgen_tpu.nn import make_edgez_net, make_surfpos_net


def _backend_with_retry() -> str:
    """First device touch, surviving transient backend unavailability.

    The tunneled axon backend intermittently reports UNAVAILABLE at
    session acquisition (observed minutes-to-hours outages). A failed
    init is cached inside the process, so retry by re-exec'ing fresh;
    BREPGEN_BENCH_RETRY caps the attempts (default 5 x 180 s pauses).
    """
    try:
        return jax.default_backend()
    except RuntimeError as e:
        if "UNAVAILABLE" not in str(e):
            raise
        n = int(os.environ.get("_BREPGEN_BENCH_ATTEMPT", "0"))
        if n >= int(os.environ.get("BREPGEN_BENCH_RETRY", "5")):
            raise
        print(f"backend unavailable (attempt {n + 1}); re-exec in 180s",
              file=sys.stderr, flush=True)
        time.sleep(180)
        os.environ["_BREPGEN_BENCH_ATTEMPT"] = str(n + 1)
        os.execv(sys.executable, [sys.executable] + sys.argv)

# Estimated reference cascade throughput on A100 (BASELINE.md): ~17.5
# B-reps/min for batch-16 eager fp16 torch. The repo publishes no numbers;
# this anchors vs_baseline until a measured A100 run replaces it.
REFERENCE_BREPS_PER_MIN = 17.5

B = 16
NS = 60          # 30 faces doubled by the late increase (deepcad mode)
NE = 30
SURF_EVALS = 408 + 209   # surfpos (158 pndm + 250 ddpm) + surfz (209)
EDGE_EVALS = 408 + 209   # edgepos + edgez

# v5e peak bf16 matmul throughput; the chip's measured sustained matmul
# rate here is ~164 TF/s (BASELINE.md "chip calibration") -- MFU is
# reported against nominal peak so it is comparable across machines.
V5E_PEAK_TFLOPS = 197.0


def denoiser_flops_per_eval(batch, seq, stream_dims, out_dim,
                            width=768, ffn=1024, layers=12):
    """Nominal matmul FLOPs of ONE full denoiser apply (fwd only).

    Per token per encoder layer: qkv 6d^2 + proj 2d^2 + attention 4*S*d
    (scores + weighted sum) + ffn 4*d*f. Stream embedders and the output
    head are Linear->LN->SiLU->Linear (layers.py:MLPEmbedder): per token
    2*s_i*d + 2*d^2 each, head 2*d^2 + 2*d*o. LayerNorms/softmax excluded
    (not matmul FLOPs; MXU-bound MFU is the regression signal wanted).
    Attention is counted at the nominal head_dim=64 -- the TPU pads the
    MXU tile to 128, so attention's achievable ceiling is half its
    speed-of-light; see BASELINE.md.
    """
    enc = layers * (8 * width**2 + 4 * seq * width + 4 * width * ffn)
    emb = sum(2 * s * width + 2 * width**2 for s in stream_dims)
    head = 2 * width**2 + 2 * width * out_dim
    return batch * seq * (enc + emb + head)


def _progress(msg: str) -> None:
    """Stderr progress marker (stdout stays the single JSON line)."""
    print(f"[bench +{time.perf_counter() - _T0:.0f}s] {msg}",
          file=sys.stderr, flush=True)


_T0 = time.perf_counter()


def _scan_time(step, x0, n_steps, label=""):
    """Seconds per step of x <- step(x) inside one compiled lax.scan."""

    @jax.jit
    def run(x):
        def body(x, _):
            return step(x), ()

        x, _ = jax.lax.scan(body, x, None, length=n_steps)
        return x

    _progress(f"{label}: compiling {n_steps}-step scan")
    out = run(x0)                     # compile + first run
    jax.block_until_ready(out)
    _progress(f"{label}: compiled; timing")
    t0 = time.perf_counter()
    out = run(out)                    # carry chains into the second run
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n_steps
    assert bool(jnp.isfinite(out).all()), "scan diverged"
    return dt


def main():
    on_tpu = _backend_with_retry() not in ("cpu",)
    _progress(f"backend acquired: {jax.default_backend()}")
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    n_steps = 30 if on_tpu else 2

    key = jax.random.PRNGKey(0)
    t = jnp.full((B,), 500, jnp.int32)

    # --- surf stage (60-token set) ---
    surf_net = make_surfpos_net(dtype=dtype, attn_impl="xla")  # short seqs
    x_s = jax.random.normal(key, (B, NS, 6))
    p_s = surf_net.init(key, (x_s,), t)

    def surf_step(x):
        out = surf_net.apply(p_s, (x,), t)
        return (out / (jnp.abs(out).max() + 1e-6)).astype(x.dtype)

    t_surf = _scan_time(surf_step, x_s, n_steps, label="surf")

    # --- edge stages ---
    attn = "pallas" if on_tpu else "xla"
    edge_net = make_edgez_net(dtype=dtype, attn_impl=attn)
    S = NS * NE
    p_e = edge_net.init(
        key,
        tuple(jax.random.normal(key, (B, S, d)) for d in (12, 6, 6, 6, 48)),
        t, jnp.zeros((B, S), bool))

    def edge_time(seq, label, steps):
        streams = tuple(
            jax.random.normal(key, (B, seq, d)) for d in (6, 6, 48)
        )
        mask = jnp.zeros((B, seq), bool)

        def edge_step(zv):
            out = edge_net.apply(
                p_e, (zv[..., :12], zv[..., 12:]) + streams, t, mask
            )
            return (out / (jnp.abs(out).max() + 1e-6)).astype(zv.dtype)

        return _scan_time(edge_step, jax.random.normal(key, (B, seq, 18)),
                          steps, label=label)

    # headline: full-slot deepcad edge stage (series-comparable, rounds 1+)
    t_edge = edge_time(S, "edge", n_steps)
    # production-compacted edge stages (the `--compact` sampling default):
    # deepcad dedups ~30-60 of 60 slots -> @32 bucket x 30 edge slots;
    # ABC ~30-60 of 100 -> @48 bucket x 40 edge slots (BASELINE.md tables)
    t_edge_dc = edge_time(32 * 30, "edge-compact-deepcad@32", n_steps)
    t_edge_abc = edge_time(48 * 40, "edge-compact-abc@48", n_steps)

    cascade_seconds = SURF_EVALS * t_surf + EDGE_EVALS * t_edge
    breps_per_min = B / cascade_seconds * 60.0
    # compacted estimates reuse t_surf for the (sub-1%) surf stages; the
    # ABC surf stage runs 100 tokens vs 60 but is launch-bound either way
    # (measured e2e: 0.63 vs 0.54 s/stage, BASELINE.md)
    dc_compact_s = SURF_EVALS * t_surf + EDGE_EVALS * t_edge_dc
    abc_compact_s = SURF_EVALS * t_surf + EDGE_EVALS * t_edge_abc

    surf_tflops = denoiser_flops_per_eval(B, NS, (6,), 6) / 1e12
    edge_tflops = denoiser_flops_per_eval(B, S, (12, 6, 6, 6, 48), 18) / 1e12
    abc_edge_tflops = denoiser_flops_per_eval(
        B, 48 * 40, (12, 6, 6, 6, 48), 18) / 1e12

    result = {
        "metric": "breps/min/chip (est. full deepcad cascade, batch 16)",
        "value": round(breps_per_min, 3),
        "unit": "breps/min",
        "vs_baseline": round(breps_per_min / REFERENCE_BREPS_PER_MIN, 3),
        "detail": {
            "baseline_note": (
                "denominator is a first-principles A100 FLOP estimate "
                "(BASELINE.md 'Reference A100 estimate'), not a measured "
                "run — no GPU in this environment"
            ),
            "backend": jax.default_backend(),
            "surf_step_ms": round(t_surf * 1e3, 3),
            "edge_step_ms": round(t_edge * 1e3, 3),
            "edge_steps_per_s": round(1.0 / t_edge, 2),
            "cascade_s_per_batch16": round(cascade_seconds, 2),
            "surf_model_tflops_per_eval": round(surf_tflops, 3),
            "edge_model_tflops_per_eval": round(edge_tflops, 3),
            "surf_mfu_vs_peak": round(surf_tflops / t_surf / V5E_PEAK_TFLOPS, 4),
            "edge_mfu_vs_peak": round(edge_tflops / t_edge / V5E_PEAK_TFLOPS, 4),
            "mfu_peak_tflops": V5E_PEAK_TFLOPS,
            # production configuration (`--compact` is the sampling
            # default): compacted edge stages at the representative
            # post-dedup buckets; headline stays full-slot for series
            # continuity across rounds (BASELINE.md round-4 note)
            "deepcad_compact32_edge_step_ms": round(t_edge_dc * 1e3, 3),
            "deepcad_compact32_breps_per_min": round(B / dc_compact_s * 60, 3),
            "abc_compact48_edge_step_ms": round(t_edge_abc * 1e3, 3),
            "abc_compact48_breps_per_min": round(B / abc_compact_s * 60, 3),
            "abc_edge_model_tflops_per_eval": round(abc_edge_tflops, 3),
            "abc_edge_mfu_vs_peak": round(
                abc_edge_tflops / t_edge_abc / V5E_PEAK_TFLOPS, 4),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
