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
    pndm_scan,
)
from brepgen_tpu.nn.denoiser import broadcast_face_to_edge, flatten_face_edge
from brepgen_tpu.sampling.dedup import dedup_bboxes, dedup_edges_per_face

TEXT2INT = {
    "uncond": 0, "bathtub": 1, "bed": 2, "bench": 3, "bookshelf": 4,
    "cabinet": 5, "chair": 6, "couch": 7, "lamp": 8, "sofa": 9, "table": 10,
}

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

    def run_full_schedule(eps_fn, x):
        """Latent stages: the full 209-call PNDM schedule, or N-step DDIM."""
        if fast:
            return ddim_scan(eps_fn, x, ddim_plan)
        return pndm_scan(eps_fn, x, pndm_full_plan)

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

    @jax.jit
    def stage_surfpos(params, key: jax.Array) -> jnp.ndarray:
        k0, k1 = jax.random.split(key)
        eps1 = make_stage_eps("surfpos", params, lambda x: {"surfpos": x}, {}, None)
        surfpos = _shard(jax.random.normal(k0, (B, ns0, 6)))
        if fast:
            # run DDIM down to an intermediate t, duplicate the set (late
            # increase), then finish with a stochastic DDPM tail for
            # diversity between the duplicated halves
            surfpos = ddim_scan(eps1, surfpos, ddim_plan_hi, clip_range=cfg.ddpm_clip)
            if not cfg.use_cf:
                surfpos = jnp.concatenate([surfpos, surfpos], axis=1)
            return ddpm_scan(eps1, surfpos, ddpm_tail_plan, k1, cfg.ddpm_clip)
        surfpos = pndm_scan(eps1, surfpos, pndm_pos_plan)
        if not cfg.use_cf:
            surfpos = jnp.concatenate([surfpos, surfpos], axis=1)  # late increase
        return ddpm_scan(eps1, surfpos, ddpm_plan, k1, cfg.ddpm_clip)

    @jax.jit
    def stage_surfz(params, key: jax.Array, surfpos: jnp.ndarray):
        surf_keep = dedup_bboxes(surfpos, cfg.bbox_threshold)   # True = keep
        surf_mask = ~surf_keep                                   # True = pad
        surfpos = jnp.where(surf_mask[:, :, None], 0.0, surfpos)

        surfz = _shard(jax.random.normal(key, (B, ns, 48)))
        surfz_eps = make_stage_eps(
            "surfz", params, lambda x: {"surfz": x}, {"surfpos": surfpos}, surf_mask
        )
        surfz = run_full_schedule(surfz_eps, surfz)
        return surfpos, surf_mask, surf_keep, surfz

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
            return raw_eps(flatten_face_edge(x), t).reshape(B, ns, ne, 6)

        return edgepos_eps

    # The PNDM and DDPM phases are SEPARATE jit programs (the handoff
    # [B, ns, ne, 6] stays device-resident): halving the largest program
    # keeps ABC-scale remote compiles inside one process's device-lease
    # budget, at the cost of one extra dispatch per batch.
    @jax.jit
    def stage_edgepos_pndm(params, key: jax.Array, surfpos, surfz, surf_mask):
        edgepos = _shard(jax.random.normal(key, (B, ns, ne, 6)))
        eps = _edgepos_eps(params, surfpos, surfz, surf_mask)
        if fast:
            return ddim_scan(eps, edgepos, ddim_plan, clip_range=cfg.ddpm_clip)
        return pndm_scan(eps, edgepos, pndm_pos_plan)

    @jax.jit
    def stage_edgepos_ddpm(params, key: jax.Array, edgepos, surfpos, surfz, surf_mask):
        eps = _edgepos_eps(params, surfpos, surfz, surf_mask)
        k_noise = jax.random.fold_in(key, 1)
        return ddpm_scan(eps, edgepos, ddpm_plan, k_noise, cfg.ddpm_clip)

    @jax.jit
    def stage_edgez(params, key: jax.Array, edgepos, surfpos, surfz, surf_keep):
        edge_keep = dedup_edges_per_face(edgepos, surf_keep, cfg.bbox_threshold)
        edge_mask = ~edge_keep

        edgezv = _shard(jax.random.normal(key, (B, ns, ne, 18)))

        raw_eps = make_stage_eps(
            "edgez",
            params,
            lambda x: {"edgez": x[..., :12], "vertpos": x[..., 12:]},
            {
                "edgepos": flatten_face_edge(edgepos),
                "surfpos": broadcast_face_to_edge(surfpos, ne),
                "surfz": broadcast_face_to_edge(surfz, ne),
            },
            edge_mask.reshape(B, ns * ne),
        )

        def edgez_eps(x, t):
            flat = x.reshape(B, ns * ne, 18)
            return raw_eps(flat, t).reshape(B, ns, ne, 18)

        edgezv = run_full_schedule(edgez_eps, edgezv)
        edgezv = jnp.where(edge_mask[..., None], 0.0, edgezv)
        return edge_mask, edgezv

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

    # optional AOT: serialize each stage's compiled executable to disk so
    # later processes skip the (remote, minutes-long at ABC scale) compile
    from brepgen_tpu.sampling.aot import maybe_aot, wrap_stage

    _aot = maybe_aot(aot_cache_dir)
    fp = repr(cfg)
    s_surfpos = wrap_stage(_aot, stage_surfpos, "surfpos", fp)
    s_surfz = wrap_stage(_aot, stage_surfz, "surfz", fp)
    s_edgepos_pndm = wrap_stage(_aot, stage_edgepos_pndm, "edgepos_pndm", fp)
    s_edgepos_ddpm = wrap_stage(_aot, stage_edgepos_ddpm, "edgepos_ddpm", fp)
    s_edgez = wrap_stage(_aot, stage_edgez, "edgez", fp)
    s_decode = wrap_stage(_aot, stage_decode, "decode", fp)

    def s_edgepos(params, key, surfpos, surfz, surf_mask):
        x = s_edgepos_pndm(params, key, surfpos, surfz, surf_mask)
        if fast:  # DDIM covers the whole schedule in the first program
            return x
        return s_edgepos_ddpm(params, key, x, surfpos, surfz, surf_mask)

    if stage_times is not None:
        # measurement mode: synchronize around each stage and accumulate
        # wall-clock per stage name (adds a host sync per stage)
        import time as _time

        def timed(fn, name):
            def run(*args):
                _t0 = _time.perf_counter()
                out = fn(*args)
                jax.block_until_ready(out)
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

        Exists because the remote TPU backend bounds a process's device
        lifetime (~12 min observed); ABC-scale stage compiles chained in
        one process exceed it. Chaining one-stage processes over the AOT
        cache keeps every process under the bound; the final run is then
        pure execution from deserialized executables.
        """
        key = jax.random.PRNGKey(0)
        z = lambda *s: jnp.zeros(s)
        zb = lambda *s: jnp.zeros(s, bool)
        calls = {
            "surfpos": lambda: s_surfpos(net_params["surfpos"], key),
            "surfz": lambda: s_surfz(net_params["surfz"], key, z(B, ns, 6)),
            "edgepos_pndm": lambda: s_edgepos_pndm(
                net_params["edgepos"], key, z(B, ns, 6), z(B, ns, 48), zb(B, ns)
            ),
            "edgepos_ddpm": lambda: s_edgepos_ddpm(
                net_params["edgepos"], key, z(B, ns, ne, 6), z(B, ns, 6),
                z(B, ns, 48), zb(B, ns),
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

    def run_stage_random(name: str, seed: int):
        """Run ONE stage on fresh random inputs of the production shapes
        (bench-only; fresh inputs defeat the remote backend's result
        cache). Returns the stage's output pytree."""
        key = jax.random.PRNGKey(seed)
        ks = jax.random.split(key, 6)
        r = lambda k, *s: jax.random.normal(k, s)
        calls = {
            "surfpos": lambda: s_surfpos(net_params["surfpos"], ks[0]),
            "surfz": lambda: s_surfz(
                net_params["surfz"], ks[0], r(ks[1], B, ns, 6)
            ),
            "edgepos_pndm": lambda: s_edgepos_pndm(
                net_params["edgepos"], ks[0], r(ks[1], B, ns, 6),
                r(ks[2], B, ns, 48), jnp.zeros((B, ns), bool),
            ),
            "edgepos_ddpm": lambda: s_edgepos_ddpm(
                net_params["edgepos"], ks[0], r(ks[1], B, ns, ne, 6),
                r(ks[2], B, ns, 6), r(ks[3], B, ns, 48),
                jnp.zeros((B, ns), bool),
            ),
            "edgez": lambda: s_edgez(
                net_params["edgez"], ks[0], r(ks[1], B, ns, ne, 6),
                r(ks[2], B, ns, 6), r(ks[3], B, ns, 48),
                jnp.ones((B, ns), bool),
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
