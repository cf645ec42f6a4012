"""Pairwise point-cloud Chamfer distance as a Pallas TPU kernel.

The eval protocol (reference ``pc_metric.py:45-95``) needs the full
[N_sample, N_ref] Chamfer matrix over ~3M cloud pairs of 2000 points each
— the reference runs a CUDA kernel pair-by-pair. The XLA tiling
(``eval/metrics.py``) materializes a [s, r, P, P] distance tensor in HBM
per tile, which bounds tiles to ~16 pairs and grinds on dispatch overhead.

Kernel shape, driven by two Mosaic constraints measured the hard way:
  * no dynamic_slice on VALUES inside a kernel (this jax version), so
    every in-kernel index is static and ALL loops that would need a
    traced index live in the GRID, walked by BlockSpec index maps;
  * compile time scales with (IR ops x vregs/op) — a body that unrolls
    rows x ref-subblocks x chunks (~2.5k ops on 16 MB slabs) sits in the
    backend Mosaic compiler for >15 min. One sample ROW per grid step
    (grid dims: ref-block, sample-block, row-in-block, point-chunk)
    keeps the body at ~300 ops on [sub, chunk, P] slabs and compiles in
    seconds.

Clouds are stored coord-major ([8, P] rows, points on lanes); squared
distances are built by VPU broadcasts (K=3 matmuls are dead weight on a
128-deep MXU — this workload is vector, not matrix), reduced with a
lane-axis min, and accumulated into the revisited [bs, br] output tile
via a one-hot row update. HBM traffic is just the cloud blocks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # pltpu is TPU-only at trace time; interpret mode works anywhere
    from jax.experimental.pallas import tpu as pltpu

    _MEMSPACE = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _MEMSPACE = None

BIG = 1e30


def _chamfer_kernel(
    sc_ref, sf_ref, rc_ref, rf_ref, o_ref, *, bs, br, n_pts, chunk, sub=8
):
    """One (sample row, point chunk) step of a [bs, br] output tile.

    Grid dims: (ref block j, sample block, row-in-block a, chunk c).
    sc/rc hold the current ``chunk``-point slices of the row / ref block,
    sf/rf the full point range. Forward direction: this row's x-chunk
    against ALL ref points; reverse: each ref's r-chunk against ALL x
    points — both are sums over chunk points of a full-P lane min, so
    they accumulate exactly across c. Refs are processed in static
    ``sub``-cloud slices to bound the [sub, chunk, P] distance slab; the
    row's [br] result lands in the output tile by one-hot accumulate
    (o_ref rows can't be indexed by a traced value).
    """
    sub = min(sub, br)
    assert br % sub == 0, (br, sub)
    a = pl.program_id(2)
    c = pl.program_id(3)
    n = jnp.int32(n_pts)

    @pl.when((a == 0) & (c == 0))
    def _init():
        o_ref[...] = jnp.zeros_like(o_ref)

    x_full = sf_ref[0]   # [8, P] f32 (rows 0..2 = x,y,z)
    x_chunk = sc_ref[0]  # [8, chunk]
    rf = rf_ref[...]     # [br, 8, P]
    rc = rc_ref[...]     # [br, 8, chunk]
    P = x_full.shape[-1]

    pad_cols = jax.lax.broadcasted_iota(jnp.int32, (1, 1, P), 2) >= n
    rows = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1) + c * chunk
    row_valid = (rows < n).astype(jnp.float32)  # [1, chunk]

    parts = []
    for j in range(br // sub):  # static ref sub-blocks
        rj_full = rf[j * sub : (j + 1) * sub]   # [sub, 8, P]
        rj_chunk = rc[j * sub : (j + 1) * sub]  # [sub, 8, chunk]

        # forward: chunk of x's points vs ALL rj points, per cloud
        d2 = jnp.zeros((sub, chunk, P), jnp.float32)
        for d in range(3):
            xd = x_chunk[d][None, :, None]       # [1, chunk, 1]
            yd = rj_full[:, d, :][:, None, :]    # [sub, 1, P]
            diff = xd - yd                        # [sub, chunk, P]
            d2 = d2 + diff * diff
        d2 = jnp.where(pad_cols, BIG, d2)
        fwd = jnp.sum(jnp.min(d2, axis=2) * row_valid, axis=1)  # [sub]

        # reverse: chunk of each rj's points vs ALL x points
        d2 = jnp.zeros((sub, chunk, P), jnp.float32)
        for d in range(3):
            yd = rj_chunk[:, d, :][:, :, None]   # [sub, chunk, 1]
            xd = x_full[d][None, None, :]        # [1, 1, P]
            diff = yd - xd                        # [sub, chunk, P]
            d2 = d2 + diff * diff
        d2 = jnp.where(pad_cols, BIG, d2)
        rev = jnp.sum(jnp.min(d2, axis=2) * row_valid, axis=1)

        parts.append(fwd + rev)

    row_out = jnp.concatenate(parts) / n.astype(jnp.float32)     # [br]
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (bs, 1), 0) == a
    ).astype(jnp.float32)
    o_ref[...] += onehot * row_out[None, :]


@functools.partial(jax.jit, static_argnames=("chunk", "n_pts"))
def _scan_tile(x, y, chunk: int, n_pts: int) -> jnp.ndarray:
    """[s, 3, P] x [r, 3, P] -> [s, r] chamfer via chunked running min.

    XLA formulation for backends where the Pallas kernel's Mosaic compile
    is pathological (see ``chamfer_matrix_scan``). A lax.scan walks one
    side's points in ``chunk``-slices keeping a [s, r, P] running min —
    the [s, r, P, chunk] distance slab is loop-fused into the min reduce
    and never materializes (verified up to ~128x256 tiles; at 64x256
    vec-minor layout XLA materializes it and OOMs, hence the coord-major
    [n, 3, P] layout: points on the minor dim vectorize, the measured win
    is ~1.8x). Both directions come from one primitive, arguments swapped.
    """
    P = x.shape[-1]
    n = jnp.float32(n_pts)

    def direction(a, b):
        # min over b's points, summed over a's valid points -> [sa, sb]
        def step(carry, q0):
            d2 = jnp.zeros(
                (a.shape[0], b.shape[0], P, chunk), jnp.float32
            )
            for d in range(3):
                ad = a[:, d, :]                                   # [sa, P]
                bdc = jax.lax.dynamic_slice_in_dim(
                    b[:, d, :], q0, chunk, axis=1
                )                                                 # [sb, chunk]
                diff = ad[:, None, :, None] - bdc[None, :, None, :]
                d2 = d2 + diff * diff
            qv = (q0 + jnp.arange(chunk))[None, None, None, :] < n_pts
            d2 = jnp.where(qv, d2, BIG)
            return jnp.minimum(carry, jnp.min(d2, -1)), None

        init = jnp.full((a.shape[0], b.shape[0], P), BIG, jnp.float32)
        m, _ = jax.lax.scan(step, init, jnp.arange(0, P, chunk))
        pv = (jnp.arange(P) < n_pts)[None, None, :]
        return jnp.sum(jnp.where(pv, m, 0.0), -1) / n

    return direction(x, y) + direction(y, x).T


def chamfer_matrix_scan(
    sample_pcs,  # [S, P, 3]
    ref_pcs,     # [R, P, 3]
    tile_s: int = 128,
    tile_r: int = 256,
    chunk: int = 512,
) -> jnp.ndarray:
    """Full [S, R] chamfer matrix through the XLA scan tile.

    Host loops walk [tile_s x tile_r] pair tiles (one bounded ~1 s device
    dispatch each — remote backends kill >60 s executions); ragged edges
    are padded to the tile shape so every dispatch reuses one compiled
    executable. Defaults measured on-chip at protocol shape (BASELINE.md
    round 3): 128x256 c512 = 87.3 s steady per 3000x1000x2000pt repeat
    (14.6 min for the 10-repeat protocol); bigger tiles break XLA's slab
    fusion.
    """
    sample_pcs = np.asarray(sample_pcs, np.float32)
    ref_pcs = np.asarray(ref_pcs, np.float32)
    S, P, _ = sample_pcs.shape
    R = ref_pcs.shape[0]
    chunk = min(chunk, P)
    P_pad = -(-P // chunk) * chunk

    def prep(a, n_tile):
        n_pad = -(-a.shape[0] // n_tile) * n_tile
        a = np.pad(a, ((0, n_pad - a.shape[0]), (0, P_pad - P), (0, 0)))
        return np.ascontiguousarray(a.transpose(0, 2, 1))  # [N, 3, P]

    sp = prep(sample_pcs, tile_s)
    rp = prep(ref_pcs, tile_r)
    out = np.empty((len(sp), len(rp)), np.float32)
    for i in range(0, len(sp), tile_s):
        for j in range(0, len(rp), tile_r):
            out[i : i + tile_s, j : j + tile_r] = np.asarray(
                _scan_tile(sp[i : i + tile_s], rp[j : j + tile_r], chunk, P)
            )
    return jnp.asarray(out[:S, :R])


def chamfer_matrix(
    sample_pcs,  # [S, P, 3]
    ref_pcs,     # [R, P, 3]
    block_s: int = 8,
    block_r: int = 128,
    chunk: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Full [S, R] chamfer matrix (sum of both mean-sq directions).

    ``block_r`` is the output tile's lane width — Mosaic requires a
    multiple of 128 (refs are processed internally in 8-cloud slices, so
    VMEM slabs stay small regardless of block_r). Interpret mode accepts
    any block sizes (tests use tiny ragged blocks).
    """
    if not interpret:
        assert block_s % 8 == 0 and block_r % 128 == 0, (block_s, block_r)
    sample_pcs = jnp.asarray(sample_pcs, jnp.float32)
    ref_pcs = jnp.asarray(ref_pcs, jnp.float32)
    S, P, _ = sample_pcs.shape
    R = ref_pcs.shape[0]
    P_pad = -(-P // chunk) * chunk
    S_pad = -(-S // block_s) * block_s
    R_pad = -(-R // block_r) * block_r
    n_chunks = P_pad // chunk

    def prep(a, n_pad):
        # [N, P, 3] -> [N_pad, 8, P_pad] f32, coord-major, points on lanes
        a = a.transpose(0, 2, 1)  # [N, 3, P]
        return jnp.pad(a, ((0, n_pad - a.shape[0]), (0, 5), (0, P_pad - P)))

    sp = prep(sample_pcs, S_pad)
    rp = prep(ref_pcs, R_pad)

    kwargs = dict(memory_space=_MEMSPACE) if _MEMSPACE is not None else {}
    extra = {}
    if pltpu is not None and not interpret:
        extra["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        )
    # Grid order: ref block outermost (rf/rc stay resident across a whole
    # sample sweep), then sample block, row-in-block, chunk. The output
    # tile's block index is constant across the two inner dims, so it is
    # revisited in VMEM and written back once per (j, sb).
    out = pl.pallas_call(
        functools.partial(
            _chamfer_kernel, bs=block_s, br=block_r, n_pts=P, chunk=chunk
        ),
        out_shape=jax.ShapeDtypeStruct((S_pad, R_pad), jnp.float32),
        grid=(R_pad // block_r, S_pad // block_s, block_s, n_chunks),
        in_specs=[
            pl.BlockSpec(
                (1, 8, chunk),
                lambda j, sb, a, c, _bs=block_s: (sb * _bs + a, 0, c),
                **kwargs,
            ),
            pl.BlockSpec(
                (1, 8, P_pad),
                lambda j, sb, a, c, _bs=block_s: (sb * _bs + a, 0, 0),
                **kwargs,
            ),
            pl.BlockSpec((block_r, 8, chunk), lambda j, sb, a, c: (j, 0, c), **kwargs),
            pl.BlockSpec((block_r, 8, P_pad), lambda j, sb, a, c: (j, 0, 0), **kwargs),
        ],
        out_specs=pl.BlockSpec((block_s, block_r), lambda j, sb, a, c: (sb, j)),
        interpret=interpret,
        **extra,
    )(sp, sp, rp, rp)
    return out[:S, :R]
