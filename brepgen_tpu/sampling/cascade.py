"""The four-stage generation cascade as one jitted device program.

Mirrors ``sample.py:120-299`` stage by stage:

  1-1  surfPos:  [B, ns, 6]   ~ N(0,1); 158 PNDM calls (of a 200-step
       schedule) then 250 DDPM steps with x0-clip +/-3; CFG w=0.6 by
       batch doubling when class-conditional. For unconditional modes the
       face set is doubled between the phases ("late increase",
       ``sample.py:140-142``) -- here a static concat, shapes stay fixed.
  1-2  face dedup -> keep mask (on device, see ``dedup.py``).
  1-3  surfZ:    [B, ns, 48]; full 200-step PNDM schedule, face-masked.
  2-1  edgePos:  [B, ns, ne, 6]; 158 PNDM + 250 DDPM, face-masked.
  2-2  per-face edge dedup -> edge keep mask.
  2-3  edgeZV:   [B, ns, ne, 18]; full PNDM; masked slots zeroed.
  VAE decode of all face/edge latents; bboxes un-scaled by /3.

Everything through VAE decode is a single jit-compiled function per
(batch, ns, ne) configuration: the denoise loops are lax.scans over static
plans, dedup is a masked scan, and the only host transfer is the final
pytree fetch for post-processing. Per-chip throughput then scales by
sharding the batch over the mesh 'data' axis (sampling is embarrassingly
parallel across CAD solids).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from brepgen_tpu.diffusion import (
    ddim_scan,
    ddpm_scan,
    make_ddim_plan,
    make_ddpm_plan,
    make_pndm_plan,
    pndm_init_carry,
    pndm_scan_carry,
)
from brepgen_tpu.nn.denoiser import broadcast_face_to_edge, flatten_face_edge
from brepgen_tpu.sampling.dedup import dedup_bboxes, dedup_edges_per_face

TEXT2INT = {
    "uncond": 0, "bathtub": 1, "bed": 2, "bench": 3, "bookshelf": 4,
    "cabinet": 5, "chair": 6, "couch": 7, "lamp": 8, "sofa": 9, "table": 10,
}

# Bump when compiled stage-program CODE changes (kernel routing, scan
# structure, ...): the AOT cache key otherwise only sees config + arg
# signatures and would happily reload stale executables.
PROGRAM_VERSION = 2

# eval_config.yaml parity (reference eval_config.yaml:1-47)
MODE_PRESETS = {
    "abc": dict(num_surfaces=50, num_edges=40, use_cf=False),
    "deepcad": dict(num_surfaces=30, num_edges=30, use_cf=False),
    "furniture": dict(num_surfaces=60, num_edges=40, use_cf=True),
}


@dataclasses.dataclass(frozen=True)
class CascadeConfig:
    batch_size: int = 16
    num_surfaces: int = 30
    num_edges: int = 30
    use_cf: bool = False
    class_label: int = 0
    cfg_weight: float = 0.6
    z_threshold: float = 0.2
    bbox_threshold: float = 0.08
    bbox_scaled: float = 3.0
    pndm_steps: int = 200
    pos_pndm_calls: int = 158
    ddpm_tail: int = 250
    ddpm_clip: float = 3.0
    # fast mode: replace the PNDM+DDPM protocol with N-step DDIM per stage
    fast_steps: int = 0
    # max model evals per device dispatch: denoise schedules run as
    # host-driven chains of <= seg_calls-step scan programs (remote
    # backends kill single executions past ~60 s; ABC edge evals are
    # ~0.33 s each, so 64 keeps a wide margin)
    seg_calls: int = 64
    # face-token compaction: after face dedup, gather kept faces to the
    # front and run the (quadratic-in-tokens) edge stages on a shortened
    # face bucket — a multiple of compact_granularity, one compiled
    # program per bucket — then scatter back. Trained models dedup the
    # doubled face set heavily (ABC: 100 slots -> ~#real faces), roughly
    # halving edge-stage sequence length at production scale; untrained/
    # random weights dedup nothing and compaction is a no-op. Kept-face
    # PNDM trajectories are bit-comparable to the uncompacted run (init
    # noise is drawn at full shape and gathered); DDPM tails draw
    # in-scan noise shaped by the bucket, so kept-face outputs there are
    # a different-but-equally-valid sample.
    compact: bool = False
    compact_granularity: int = 8

    @classmethod
    def for_mode(cls, mode: str, batch_size: int = 16, class_label: str = "uncond"):
        p = MODE_PRESETS[mode]
        return cls(
            batch_size=batch_size,
            num_surfaces=p["num_surfaces"],
            num_edges=p["num_edges"],
            use_cf=p["use_cf"],
            class_label=TEXT2INT.get(class_label, 0) if p["use_cf"] else 0,
        )


def build_cascade(
    nets: Dict[str, Any],       # 'surfpos', 'surfz', 'edgepos', 'edgez' modules
    net_params: Dict[str, Any],
    surf_decode: Callable,      # (params, z[N,4,4,3]) -> [N,32,32,3]
    surf_vae_params: Any,
    edge_decode: Callable,      # (params, z[N,4,3]) -> [N,32,3]
    edge_vae_params: Any,
    config: CascadeConfig,
    mesh: Optional[Mesh] = None,
    aot_cache_dir: Optional[str] = None,
    stage_times: Optional[Dict[str, float]] = None,
) -> Callable:
    """Returns jitted fn(key) -> dict of device arrays for postprocessing.

    With a ``mesh``, the batch axis is sharded over 'data' (sampling is
    embarrassingly parallel across CAD solids) -- the constraint on the
    initial noise propagates through the whole cascade, so N chips run N
    independent shards with no collectives.
    """
    cfg = config

    def _shard(x):
        if mesh is None:
            return x
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, P("data", *([None] * (x.ndim - 1))))
        )
    B = cfg.batch_size
    ns0 = cfg.num_surfaces
    # late increase doubles the face set for unconditional modes
    ns = ns0 if cfg.use_cf else 2 * ns0
    ne = cfg.num_edges

    fast = cfg.fast_steps > 0
    if fast:
        ddim_plan = make_ddim_plan(cfg.fast_steps)
        # surfpos late-increase split, computed statically at build time
        _n_hi = max(cfg.fast_steps * 3 // 4, 1)
        ddim_plan_hi = jax.tree.map(lambda a: a[:_n_hi], ddim_plan)
        _t_resume = int(ddim_plan_hi.t[-1])
        ddpm_tail_plan = make_ddpm_plan(num_steps=max(_t_resume, 1))
    else:
        pndm_pos_plan = make_pndm_plan(cfg.pndm_steps, max_calls=cfg.pos_pndm_calls)
        pndm_full_plan = make_pndm_plan(cfg.pndm_steps)
        ddpm_plan = make_ddpm_plan(num_steps=cfg.ddpm_tail)

    def make_stage_eps(stage, params, noisy_of, cond_named, tok_mask):
        """Build an eps(x, t) closure with the CONSTANT conditioning
        streams pre-embedded ONCE (outside the denoise scan) -- only the
        noisy streams' embedders run per step. Handles CFG batch doubling.

        ``params`` flows in as a traced jit argument (never a closure
        constant: captured constants are serialized into the compile
        payload, which breaks remote compilation for 50M-param models).
        """
        net = nets[stage]
        labels = None
        if cfg.use_cf:
            Bc = next(iter(cond_named.values())).shape[0] if cond_named else B
            cond_named = {k: jnp.concatenate([v, v]) for k, v in cond_named.items()}
            if tok_mask is not None:
                tok_mask = jnp.concatenate([tok_mask, tok_mask])
            labels = jnp.concatenate(
                [jnp.full((Bc, 1), cfg.class_label, jnp.int32),
                 jnp.zeros((Bc, 1), jnp.int32)]
            )
        cond_embed = (
            net.apply(params, cond_named, method="embed_streams")
            if cond_named else None
        )

        def eps(x, t):
            noisy = noisy_of(x)
            if cfg.use_cf:
                noisy = {k: jnp.concatenate([v, v]) for k, v in noisy.items()}
            pred = net.apply(
                params, noisy, t, cond_embed, tok_mask, labels, method="denoise"
            )
            if cfg.use_cf:
                w = cfg.cfg_weight
                pred = pred[:B] * (1 + w) - pred[B:] * w
            return pred

        return eps

    # The cascade runs as FIVE independently-jitted stage programs composed
    # in Python. A single monolithic jit is semantically identical but its
    # one huge XLA program compiles far slower (especially with remote
    # compilation); per-stage jits keep every tensor device-resident, so
    # the only extra cost is 4 dispatches per generated batch.

    # --- schedule segmentation -------------------------------------------
    # Every denoise schedule is sliced into chunks of <= cfg.seg_calls model
    # evals; each chunk is its own jitted program (the plan slice is a
    # traced argument, so all equal-length chunks share ONE executable and
    # only the remainder compiles separately) and the scan state stays
    # device-resident between chunks. Two reasons: (a) remote/tunneled
    # backends kill any single execution past ~60 s, which ABC-scale edge
    # stages exceed; (b) bounded dispatches are preemption-friendly.
    # PNDM/DDIM chunks are bit-identical to the unsegmented scan
    # (deterministic, full state in the carry); DDPM chunks draw their
    # per-step noise from per-segment folded keys.
    def _chunks(plan):
        n = int(jax.tree.leaves(plan)[0].shape[0])
        L = cfg.seg_calls
        return [
            jax.tree.map(lambda a, i=i: a[i : i + L], plan) for i in range(0, n, L)
        ]

    if fast:
        ddim_hi_chunks = _chunks(ddim_plan_hi)
        ddim_chunks = _chunks(ddim_plan)
        ddpm_tail_chunks = _chunks(ddpm_tail_plan)
    else:
        pndm_pos_chunks = _chunks(pndm_pos_plan)
        pndm_full_chunks = _chunks(pndm_full_plan)
        ddpm_chunks = _chunks(ddpm_plan)

    # --- surfPos ----------------------------------------------------------
    def _surfpos_eps(params):
        return make_stage_eps("surfpos", params, lambda x: {"surfpos": x}, {}, None)

    @jax.jit
    def prog_surfpos_noise(key):
        return _shard(jax.random.normal(key, (B, ns0, 6)))

    @jax.jit
    def prog_surfpos_pndm(params, carry, plan_seg):
        return pndm_scan_carry(_surfpos_eps(params), carry, plan_seg)

    @jax.jit
    def prog_surfpos_ddim(params, x, plan_seg):
        return ddim_scan(_surfpos_eps(params), x, plan_seg, clip_range=cfg.ddpm_clip)

    @jax.jit
    def prog_surfpos_ddpm(params, x, plan_seg, key):
        return ddpm_scan(_surfpos_eps(params), x, plan_seg, key, cfg.ddpm_clip)

    # --- surfZ ------------------------------------------------------------
    def _surfz_eps(params, surfpos, surf_mask):
        return make_stage_eps(
            "surfz", params, lambda x: {"surfz": x}, {"surfpos": surfpos}, surf_mask
        )

    @jax.jit
    def prog_surfz_prep(key, surfpos):
        surf_keep = dedup_bboxes(surfpos, cfg.bbox_threshold)   # True = keep
        surf_mask = ~surf_keep                                   # True = pad
        surfpos = jnp.where(surf_mask[:, :, None], 0.0, surfpos)
        surfz0 = _shard(jax.random.normal(key, (B, ns, 48)))
        return surfpos, surf_mask, surf_keep, surfz0

    @jax.jit
    def prog_surfz_pndm(params, carry, plan_seg, surfpos, surf_mask):
        return pndm_scan_carry(_surfz_eps(params, surfpos, surf_mask), carry, plan_seg)

    @jax.jit
    def prog_surfz_ddim(params, x, plan_seg, surfpos, surf_mask):
        return ddim_scan(_surfz_eps(params, surfpos, surf_mask), x, plan_seg)

    def _make_edge_programs(ns_cur: int):
        """Edge-stage programs for a face count of ``ns_cur``.

        ``ns_cur == ns`` is the normal full-shape path; compaction
        (cfg.compact) instantiates additional shortened buckets.
        """

        def _edgepos_eps(params, surfpos, surfz, surf_mask):
            raw_eps = make_stage_eps(
                "edgepos",
                params,
                lambda x: {"edgepos": x},
                {
                    "surfpos": broadcast_face_to_edge(surfpos, ne),
                    "surfz": broadcast_face_to_edge(surfz, ne),
                },
                jnp.repeat(surf_mask, ne, axis=1),
            )

            def edgepos_eps(x, t):
                return raw_eps(flatten_face_edge(x), t).reshape(B, ns_cur, ne, 6)

            return edgepos_eps

        @jax.jit
        def prog_edgepos_noise(key):
            return _shard(jax.random.normal(key, (B, ns_cur, ne, 6)))

        @jax.jit
        def prog_edgepos_pndm(params, carry, plan_seg, surfpos, surfz, surf_mask):
            eps = _edgepos_eps(params, surfpos, surfz, surf_mask)
            return pndm_scan_carry(eps, carry, plan_seg)

        @jax.jit
        def prog_edgepos_ddim(params, x, plan_seg, surfpos, surfz, surf_mask):
            eps = _edgepos_eps(params, surfpos, surfz, surf_mask)
            return ddim_scan(eps, x, plan_seg, clip_range=cfg.ddpm_clip)

        @jax.jit
        def prog_edgepos_ddpm(params, x, plan_seg, key, surfpos, surfz, surf_mask):
            eps = _edgepos_eps(params, surfpos, surfz, surf_mask)
            return ddpm_scan(eps, x, plan_seg, key, cfg.ddpm_clip)

        # --- edgeZ --------------------------------------------------------
        def _edgez_eps(params, edgepos, surfpos, surfz, edge_mask):
            raw_eps = make_stage_eps(
                "edgez",
                params,
                lambda x: {"edgez": x[..., :12], "vertpos": x[..., 12:]},
                {
                    "edgepos": flatten_face_edge(edgepos),
                    "surfpos": broadcast_face_to_edge(surfpos, ne),
                    "surfz": broadcast_face_to_edge(surfz, ne),
                },
                edge_mask.reshape(B, ns_cur * ne),
            )

            def edgez_eps(x, t):
                flat = x.reshape(B, ns_cur * ne, 18)
                return raw_eps(flat, t).reshape(B, ns_cur, ne, 18)

            return edgez_eps

        @jax.jit
        def prog_edgez_prep(key, edgepos, surf_keep):
            edge_keep = dedup_edges_per_face(edgepos, surf_keep, cfg.bbox_threshold)
            edge_mask = ~edge_keep
            z0 = _shard(jax.random.normal(key, (B, ns_cur, ne, 18)))
            return edge_mask, z0

        @jax.jit
        def prog_edgez_noise(key):
            return _shard(jax.random.normal(key, (B, ns_cur, ne, 18)))

        @jax.jit
        def prog_edgez_mask(edgepos, surf_keep):
            return ~dedup_edges_per_face(edgepos, surf_keep, cfg.bbox_threshold)

        @jax.jit
        def prog_edgez_pndm(params, carry, plan_seg, edgepos, surfpos, surfz, edge_mask):
            eps = _edgez_eps(params, edgepos, surfpos, surfz, edge_mask)
            return pndm_scan_carry(eps, carry, plan_seg)

        @jax.jit
        def prog_edgez_ddim(params, x, plan_seg, edgepos, surfpos, surfz, edge_mask):
            eps = _edgez_eps(params, edgepos, surfpos, surfz, edge_mask)
            return ddim_scan(eps, x, plan_seg)

        return dict(
            noise=prog_edgepos_noise,
            ep_pndm=prog_edgepos_pndm,
            ep_ddim=prog_edgepos_ddim,
            ep_ddpm=prog_edgepos_ddpm,
            ez_prep=prog_edgez_prep,
            ez_noise=prog_edgez_noise,
            ez_mask=prog_edgez_mask,
            ez_pndm=prog_edgez_pndm,
            ez_ddim=prog_edgez_ddim,
        )

    # --- face-token compaction helpers (cfg.compact) ----------------------
    @jax.jit
    def prog_compact_order(surf_keep):
        # stable argsort: kept faces first, original relative order intact
        order = jnp.argsort(~surf_keep, axis=1, stable=True)  # [B, ns]
        count = jnp.max(jnp.sum(surf_keep, axis=1))
        return order, count

    @functools.lru_cache(maxsize=None)
    def _compact_helpers(ns_c: int):
        idx_of = lambda order: order[:, :ns_c]

        @jax.jit
        def gather(order, *arrays):
            idx = idx_of(order)
            out = []
            for a in arrays:
                ix = idx.reshape(B, ns_c, *([1] * (a.ndim - 2)))
                out.append(jnp.take_along_axis(a, ix.astype(jnp.int32), axis=1))
            return tuple(out)

        @jax.jit
        def scatter_edges(order, edgepos_c, edge_mask_c, edgezv_c):
            idx = idx_of(order)
            rows = jnp.arange(B)[:, None]
            edgepos = jnp.zeros((B, ns, ne, 6), edgepos_c.dtype)
            edgezv = jnp.zeros((B, ns, ne, 18), edgezv_c.dtype)
            edge_mask = jnp.ones((B, ns, ne), bool)  # True = pad
            return (
                edgepos.at[rows, idx].set(edgepos_c),
                edge_mask.at[rows, idx].set(edge_mask_c),
                edgezv.at[rows, idx].set(edgezv_c),
            )

        return gather, scatter_edges

    @jax.jit
    def stage_decode(sp, ep, surfz, edgezv):
        # decode in bounded chunks: ABC-size batches have B*ns*ne = 64k edge
        # curves; one monolithic decode overflows HBM with conv activations
        edge_z = edgezv[..., :12]

        def chunked(decode, params, z, chunk):
            n = z.shape[0]
            n_pad = -(-n // chunk) * chunk
            z = jnp.pad(z, ((0, n_pad - n),) + ((0, 0),) * (z.ndim - 1))
            out = jax.lax.map(
                lambda zc: decode(params, zc), z.reshape((n_pad // chunk, chunk) + z.shape[1:])
            )
            return out.reshape((n_pad,) + out.shape[2:])[:n]

        surf_ncs = chunked(surf_decode, sp, surfz.reshape(B * ns, 4, 4, 3),
                           min(1024, B * ns)).reshape(B, ns, 32, 32, 3)
        edge_ncs = chunked(edge_decode, ep, edge_z.reshape(B * ns * ne, 4, 3),
                           min(8192, B * ns * ne)).reshape(B, ns, ne, 32, 3)
        return surf_ncs, edge_ncs

    # optional AOT: serialize each segment program's compiled executable so
    # later processes skip the (remote, minutes-long at ABC scale) compile.
    # The tiny noise/prep programs stay plain jits (seconds to compile;
    # deserialization on remote backends costs more than it saves).
    from brepgen_tpu.sampling.aot import maybe_aot, wrap_stage

    # probe=True: a one-time backend measurement disables the cache where
    # deserialization is slower than recompiling (--aot_cache must never
    # degrade startup)
    _aot = maybe_aot(aot_cache_dir, probe=True)
    fp = f"{repr(cfg)}|v{PROGRAM_VERSION}"
    w_surfpos_pndm = wrap_stage(_aot, prog_surfpos_pndm, "surfpos_pndm", fp)
    w_surfpos_ddim = wrap_stage(_aot, prog_surfpos_ddim, "surfpos_ddim", fp)
    w_surfpos_ddpm = wrap_stage(_aot, prog_surfpos_ddpm, "surfpos_ddpm", fp)
    w_surfz_pndm = wrap_stage(_aot, prog_surfz_pndm, "surfz_pndm", fp)
    w_surfz_ddim = wrap_stage(_aot, prog_surfz_ddim, "surfz_ddim", fp)
    s_decode = wrap_stage(_aot, stage_decode, "decode", fp)

    _edge_prog_cache: Dict[int, dict] = {}

    def edge_programs(ns_cur: int) -> dict:
        """AOT-wrapped edge-stage programs for a face bucket (cached)."""
        if ns_cur not in _edge_prog_cache:
            raw = _make_edge_programs(ns_cur)
            sfx = "" if ns_cur == ns else f"_ns{ns_cur}"
            _edge_prog_cache[ns_cur] = dict(
                noise=raw["noise"],
                ez_prep=raw["ez_prep"],
                ez_noise=raw["ez_noise"],
                ez_mask=raw["ez_mask"],
                **{
                    k: wrap_stage(_aot, raw[k], f"{name}{sfx}", fp)
                    for k, name in (
                        ("ep_pndm", "edgepos_pndm"),
                        ("ep_ddim", "edgepos_ddim"),
                        ("ep_ddpm", "edgepos_ddpm"),
                        ("ez_pndm", "edgez_pndm"),
                        ("ez_ddim", "edgez_ddim"),
                    )
                },
            )
        return _edge_prog_cache[ns_cur]

    def s_surfpos(params, key):
        k0, k1 = jax.random.split(key)
        x = prog_surfpos_noise(k0)
        if fast:
            # DDIM down to an intermediate t, duplicate the set (late
            # increase), then a stochastic DDPM tail for diversity
            # between the duplicated halves
            for seg in ddim_hi_chunks:
                x = w_surfpos_ddim(params, x, seg)
            if not cfg.use_cf:
                x = jnp.concatenate([x, x], axis=1)
            for i, seg in enumerate(ddpm_tail_chunks):
                x = w_surfpos_ddpm(params, x, seg, jax.random.fold_in(k1, i))
            return x
        carry = pndm_init_carry(x)
        for seg in pndm_pos_chunks:
            carry = w_surfpos_pndm(params, carry, seg)
        x = carry[0]
        if not cfg.use_cf:
            x = jnp.concatenate([x, x], axis=1)  # late increase
        for i, seg in enumerate(ddpm_chunks):
            x = w_surfpos_ddpm(params, x, seg, jax.random.fold_in(k1, i))
        return x

    def s_surfz(params, key, surfpos):
        surfpos, surf_mask, surf_keep, z = prog_surfz_prep(key, surfpos)
        if fast:
            for seg in ddim_chunks:
                z = w_surfz_ddim(params, z, seg, surfpos, surf_mask)
        else:
            carry = pndm_init_carry(z)
            for seg in pndm_full_chunks:
                carry = w_surfz_pndm(params, carry, seg, surfpos, surf_mask)
            z = carry[0]
        return surfpos, surf_mask, surf_keep, z

    def s_edgepos(params, key, surfpos, surfz, surf_mask, progs=None, x0=None):
        progs = progs or edge_programs(ns)
        x = progs["noise"](key) if x0 is None else x0
        if fast:
            for seg in ddim_chunks:
                x = progs["ep_ddim"](params, x, seg, surfpos, surfz, surf_mask)
            return x
        carry = pndm_init_carry(x)
        for seg in pndm_pos_chunks:
            carry = progs["ep_pndm"](params, carry, seg, surfpos, surfz, surf_mask)
        x = carry[0]
        kd = jax.random.fold_in(key, 1)
        for i, seg in enumerate(ddpm_chunks):
            x = progs["ep_ddpm"](
                params, x, seg, jax.random.fold_in(kd, i), surfpos, surfz, surf_mask
            )
        return x

    def s_edgez(params, key, edgepos, surfpos, surfz, surf_keep, progs=None,
                z0=None):
        progs = progs or edge_programs(ns)
        if z0 is None:
            edge_mask, z = progs["ez_prep"](key, edgepos, surf_keep)
        else:
            edge_mask, z = progs["ez_mask"](edgepos, surf_keep), z0
        if fast:
            for seg in ddim_chunks:
                z = progs["ez_ddim"](params, z, seg, edgepos, surfpos, surfz, edge_mask)
        else:
            carry = pndm_init_carry(z)
            for seg in pndm_full_chunks:
                carry = progs["ez_pndm"](
                    params, carry, seg, edgepos, surfpos, surfz, edge_mask
                )
            z = carry[0]
        edgezv = jnp.where(edge_mask[..., None], 0.0, z)
        return edge_mask, edgezv

    if stage_times is not None:
        # measurement mode: synchronize around each stage and accumulate
        # wall-clock per stage name. Synchronization fetches one element
        # of EVERY output leaf to host: on the remote backend,
        # block_until_ready does not block on AOT Compiled.__call__
        # outputs -- only a value fetch does.
        import time as _time

        import numpy as _np

        def _sync(out):
            for leaf in jax.tree.leaves(out):
                _np.asarray(jax.device_get(leaf[(0,) * getattr(leaf, "ndim", 0)]))

        def timed(fn, name):
            def run(*args, **kwargs):
                _t0 = _time.perf_counter()
                out = fn(*args, **kwargs)
                _sync(out)
                stage_times[name] = stage_times.get(name, 0.0) + (
                    _time.perf_counter() - _t0
                )
                return out

            return run

        s_surfpos = timed(s_surfpos, "surfpos")
        s_surfz = timed(s_surfz, "surfz")
        s_edgepos = timed(s_edgepos, "edgepos")
        s_edgez = timed(s_edgez, "edgez")
        s_decode = timed(s_decode, "decode")

    def precompile_stage(name: str) -> None:
        """Force-compile ONE stage with zero-filled args of the production
        shapes (and serialize it when an AOT cache is attached).

        Lets a cold process warm the AOT cache one stage at a time when
        chained remote compiles would otherwise pile into one process.
        """
        key = jax.random.PRNGKey(0)
        z = lambda *s: jnp.zeros(s)
        zb = lambda *s: jnp.zeros(s, bool)
        calls = {
            "surfpos": lambda: s_surfpos(net_params["surfpos"], key),
            "surfz": lambda: s_surfz(net_params["surfz"], key, z(B, ns, 6)),
            "edgepos": lambda: s_edgepos(
                net_params["edgepos"], key, z(B, ns, 6), z(B, ns, 48), zb(B, ns)
            ),
            "edgez": lambda: s_edgez(
                net_params["edgez"], key, z(B, ns, ne, 6), z(B, ns, 6),
                z(B, ns, 48), zb(B, ns),
            ),
            "decode": lambda: s_decode(
                surf_vae_params, edge_vae_params, z(B, ns, 48), z(B, ns, ne, 18)
            ),
        }
        jax.block_until_ready(calls[name]())

    def run_stage_random(name: str, seed: int, ns_c: int = None):
        """Run ONE stage on fresh random inputs of the production shapes
        (bench-only; fresh inputs defeat the remote backend's result
        cache). Returns the stage's output pytree.

        ``ns_c`` times the edge stages on a compacted face bucket of that
        size (the cfg.compact production path) instead of the full ns.
        """
        key = jax.random.PRNGKey(seed)
        ks = jax.random.split(key, 6)
        r = lambda k, *s: jax.random.normal(k, s)
        nsx = ns if ns_c is None else ns_c
        progs = None if nsx == ns else edge_programs(nsx)
        calls = {
            "surfpos": lambda: s_surfpos(net_params["surfpos"], ks[0]),
            "surfz": lambda: s_surfz(
                net_params["surfz"], ks[0], r(ks[1], B, ns, 6)
            ),
            "edgepos": lambda: s_edgepos(
                net_params["edgepos"], ks[0], r(ks[1], B, nsx, 6),
                r(ks[2], B, nsx, 48), jnp.zeros((B, nsx), bool),
                progs=progs,
            ),
            "edgez": lambda: s_edgez(
                net_params["edgez"], ks[0], r(ks[1], B, nsx, ne, 6),
                r(ks[2], B, nsx, 6), r(ks[3], B, nsx, 48),
                jnp.ones((B, nsx), bool), progs=progs,
            ),
            "decode": lambda: s_decode(
                surf_vae_params, edge_vae_params, r(ks[1], B, ns, 48),
                r(ks[2], B, ns, ne, 18),
            ),
        }
        return calls[name]()

    def cascade(key: jax.Array) -> Dict[str, jnp.ndarray]:
        keys = jax.random.split(key, 8)
        surfpos = s_surfpos(net_params["surfpos"], keys[0])
        surfpos, surf_mask, surf_keep, surfz = s_surfz(
            net_params["surfz"], keys[2], surfpos)

        ns_c = ns
        if cfg.compact:
            order, count = prog_compact_order(surf_keep)
            g = cfg.compact_granularity
            ns_c = min(ns, max(g, -(-int(count) // g) * g))  # host sync on count
        if ns_c < ns:
            progs = edge_programs(ns_c)
            gather, scatter_edges = _compact_helpers(ns_c)
            sp_c, sz_c, mask_c, keep_c = gather(
                order, surfpos, surfz, surf_mask, surf_keep
            )
            # init noise at FULL shape then gathered: kept-face PNDM
            # trajectories are bit-comparable to the uncompacted run
            full = edge_programs(ns)
            x0_c, z0_c = gather(
                order, full["noise"](keys[3]), full["ez_noise"](keys[5])
            )
            edgepos_c = s_edgepos(
                net_params["edgepos"], keys[3], sp_c, sz_c, mask_c,
                progs=progs, x0=x0_c,
            )
            edge_mask_c, edgezv_c = s_edgez(
                net_params["edgez"], keys[5], edgepos_c, sp_c, sz_c, keep_c,
                progs=progs, z0=z0_c,
            )
            edgepos, edge_mask, edgezv = scatter_edges(
                order, edgepos_c, edge_mask_c, edgezv_c
            )
        else:
            edgepos = s_edgepos(
                net_params["edgepos"], keys[3], surfpos, surfz, surf_mask)
            edge_mask, edgezv = s_edgez(
                net_params["edgez"], keys[5], edgepos, surfpos, surfz, surf_keep)
        surf_ncs, edge_ncs = s_decode(
            surf_vae_params, edge_vae_params, surfz, edgezv)
        return {
            "surf_pos": surfpos / cfg.bbox_scaled,
            "surf_mask": surf_mask,
            "surf_z": surfz,
            "surf_ncs": surf_ncs,
            "edge_pos": edgepos / cfg.bbox_scaled,
            "edge_mask": edge_mask,
            "edge_z": edgezv[..., :12],
            "edge_v": edgezv[..., 12:],
            "edge_ncs": edge_ncs,
        }

    cascade.precompile_stage = precompile_stage
    cascade.run_stage_random = run_stage_random
    return cascade
