"""PNDM (pseudo numerical methods, Liu et al. 2022) as a static-plan scan.

The reference samples with diffusers' ``PNDMScheduler`` (``sample.py:101-107``,
steps at ``sample.py:128-137,191-202``): 1000 train timesteps, linear betas,
epsilon prediction, default ``skip_prk_steps=False`` so the first 12 scheduler
calls are 3 pseudo-Runge-Kutta warm-up steps (4 model evals each) that fill
the multistep history, followed by 4th-order pseudo linear multistep (PLMS /
Adams-Bashforth) updates.

Instead of porting the stateful Python object, we observe that with a fixed
``num_inference_steps`` the entire branch structure is static: which of the
RK sub-steps or the AB4 update runs at scan index ``s`` depends only on ``s``.
So we precompute, per step, the transfer coefficients of the "pseudo" update

    x_prev = sc * base - dc * eps_eff

(sc = sqrt(abar_prev/abar_t), dc = (abar_prev - abar_t) / (abar_t *
sqrt(1-abar_prev) + sqrt(abar_t (1-abar_t) abar_prev)) -- the PNDM transfer
function) together with the mixing weights that produce ``eps_eff`` from the
current model output, the 4-slot epsilon history, and the RK accumulator.
The sampling loop is then a single uniform ``lax.scan`` body -- no Python
state machine, fully jit/TPU friendly.

Semantics cross-checked against a sequential transliteration in
``tests/test_pndm.py``. The reference truncates the position stages after
158 of the 209 scheduler calls (``sample.py:129``) and hands off to DDPM at
t=249; ``max_calls`` reproduces that.

ORACLE CAVEAT (narrowed in round 3): the original sequential oracle was
re-derived from the PNDM paper by the same author as this plan compiler.
``tests/test_pndm.py`` now ALSO pins the scan against ``DiffusersPNDM``,
a transliteration of diffusers' published ``scheduling_pndm.py`` control
flow (counter-modulo PRK dispatch, f32-linspace betas, ``counter == 1``
PLMS branch, ``_get_prev_sample`` denominator form) written from that
source's structure, and the two oracles agree to the betas' f32
precision. Residual risk: the transliteration was produced from memory
of the public source, not by diffing an installed diffusers (not present
here; zero egress). When diffusers or real checkpoints become available,
run the converter round-trip against ``PNDMScheduler`` itself as the
decisive check.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from brepgen_tpu.diffusion.ddpm import make_betas_linear


class PNDMPlan(NamedTuple):
    """Static per-step data for the PNDM scan (all arrays indexed by step)."""

    t_model: jnp.ndarray     # [S] timestep fed to the model at this call
    sc: jnp.ndarray          # [S] sample coefficient of the transfer fn
    dc: jnp.ndarray          # [S] epsilon coefficient of the transfer fn
    ets_w: jnp.ndarray       # [S, 4] weights over the eps history (post-append)
    mo_w: jnp.ndarray        # [S] weight of the fresh model output in eps_eff
    cur_w: jnp.ndarray       # [S] weight of the RK accumulator in eps_eff
    cur_mo_add: jnp.ndarray  # [S] fraction of model output added to accumulator
    reset_cur_mo: jnp.ndarray    # [S] bool: zero the accumulator after use
    append_ets: jnp.ndarray      # [S] bool: shift model output into history
    set_cur_sample: jnp.ndarray  # [S] bool: latch incoming x as RK base point
    use_cur_sample: jnp.ndarray  # [S] bool: transfer from latched base point


def _transfer_coeffs(acp: np.ndarray, t: int, t_prev: int, final_acp: float):
    a_t = acp[t]
    a_prev = acp[t_prev] if t_prev >= 0 else final_acp
    sc = np.sqrt(a_prev / a_t)
    denom = a_t * np.sqrt(1.0 - a_prev) + np.sqrt(a_t * (1.0 - a_t) * a_prev)
    dc = (a_prev - a_t) / denom
    return sc, dc


def make_pndm_plan(
    num_inference_steps: int,
    max_calls: int | None = None,
    num_train_timesteps: int = 1000,
    beta_start: float = 1e-4,
    beta_end: float = 0.02,
) -> PNDMPlan:
    """Build the static plan for ``num_inference_steps`` with PRK warm-up.

    ``max_calls`` truncates the schedule (reference: 158 of 209 calls for
    the bbox stages, all calls for the latent stages).
    """
    betas = make_betas_linear(num_train_timesteps, beta_start, beta_end)
    acp = np.cumprod(1.0 - betas)
    final_acp = acp[0]  # set_alpha_to_one=False default

    step_ratio = num_train_timesteps // num_inference_steps
    base_ts = (np.arange(num_inference_steps) * step_ratio).round().astype(np.int64)

    # PRK warm-up timestep sequence (3 full RK steps = 12 scheduler calls).
    prk_raw = np.repeat(base_ts[-4:], 2) + np.tile(
        np.array([0, step_ratio // 2]), 4
    )
    prk_ts = (np.repeat(prk_raw[:-1], 2)[1:-1])[::-1].copy()
    plms_ts = base_ts[:-3][::-1].copy()
    all_ts = np.concatenate([prk_ts, plms_ts])

    n_prk = len(prk_ts)  # 12
    total = len(all_ts)
    S = total if max_calls is None else min(max_calls, total)

    t_model = np.zeros(S, np.int64)
    sc = np.zeros(S)
    dc = np.zeros(S)
    ets_w = np.zeros((S, 4))
    mo_w = np.zeros(S)
    cur_w = np.zeros(S)
    cur_mo_add = np.zeros(S)
    reset_cur_mo = np.zeros(S, bool)
    append_ets = np.zeros(S, bool)
    set_cur = np.zeros(S, bool)
    use_cur = np.zeros(S, bool)

    ab_weights = {
        # history length (post-append) -> weights over ets[-4:], newest last.
        # With PRK warm-up the history is always full by the first PLMS call,
        # but we keep the shorter-history formulas for skip_prk-style plans.
        1: np.array([0.0, 0.0, 0.0, 1.0]),
        2: np.array([0.0, 0.0, -1.0 / 2.0, 3.0 / 2.0]),
        3: np.array([0.0, 5.0 / 12.0, -16.0 / 12.0, 23.0 / 12.0]),
        4: np.array([-9.0 / 24.0, 37.0 / 24.0, -59.0 / 24.0, 55.0 / 24.0]),
    }

    ets_len = 0
    for s in range(S):
        t = int(all_ts[s])
        t_model[s] = t
        if s < n_prk:
            sub = s % 4
            diff_to_prev = 0 if s % 2 else step_ratio // 2
            t_prev = t - diff_to_prev
            t_eff = int(prk_ts[(s // 4) * 4])
            sc[s], dc[s] = _transfer_coeffs(acp, t_eff, t_prev, final_acp)
            use_cur[s] = True
            if sub == 0:
                set_cur[s] = True
                append_ets[s] = True
                ets_len = min(ets_len + 1, 4)
                mo_w[s] = 1.0
                cur_mo_add[s] = 1.0 / 6.0
            elif sub in (1, 2):
                mo_w[s] = 1.0
                cur_mo_add[s] = 1.0 / 3.0
            else:
                mo_w[s] = 1.0 / 6.0
                cur_w[s] = 1.0
                reset_cur_mo[s] = True
        else:
            t_prev = t - step_ratio
            sc[s], dc[s] = _transfer_coeffs(acp, t, t_prev, final_acp)
            append_ets[s] = True
            ets_len = min(ets_len + 1, 4)
            ets_w[s] = ab_weights[ets_len]

    return PNDMPlan(
        t_model=jnp.asarray(t_model, jnp.int32),
        sc=jnp.asarray(sc, jnp.float32),
        dc=jnp.asarray(dc, jnp.float32),
        ets_w=jnp.asarray(ets_w, jnp.float32),
        mo_w=jnp.asarray(mo_w, jnp.float32),
        cur_w=jnp.asarray(cur_w, jnp.float32),
        cur_mo_add=jnp.asarray(cur_mo_add, jnp.float32),
        reset_cur_mo=jnp.asarray(reset_cur_mo),
        append_ets=jnp.asarray(append_ets),
        set_cur_sample=jnp.asarray(set_cur),
        use_cur_sample=jnp.asarray(use_cur),
    )


def pndm_init_carry(x_init: jnp.ndarray):
    """Fresh scan state for ``pndm_scan_carry``: (x, ets history, current
    momentum accumulator, current sample)."""
    return (
        x_init,
        jnp.zeros((4,) + x_init.shape, dtype=x_init.dtype),
        jnp.zeros_like(x_init),
        jnp.zeros_like(x_init),
    )


def pndm_scan_carry(
    model_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    carry,
    plan: PNDMPlan,
):
    """Advance a PNDM state through ``plan`` (any contiguous slice of a
    full plan); returns the updated carry. Lets callers segment the
    schedule into bounded-length device dispatches (remote backends kill
    single executions past ~60 s) — segmenting is bit-exact because PNDM
    is deterministic and the whole state lives in the carry."""

    def body(state, step):
        x, ets, cur_mo, cur_s = state
        eps = model_fn(x, step.t_model)

        ets_shifted = jnp.concatenate([ets[1:], eps[None]], axis=0)
        ets_new = jnp.where(step.append_ets, ets_shifted, ets)

        eps_eff = (
            step.mo_w * eps
            + jnp.tensordot(step.ets_w, ets_new, axes=1)
            + step.cur_w * cur_mo
        )

        cur_mo_new = cur_mo + step.cur_mo_add * eps
        cur_mo_new = jnp.where(step.reset_cur_mo, jnp.zeros_like(cur_mo_new), cur_mo_new)

        cur_s_new = jnp.where(step.set_cur_sample, x, cur_s)
        base = jnp.where(step.use_cur_sample, cur_s_new, x)

        x_new = step.sc * base - step.dc * eps_eff
        return (x_new, ets_new, cur_mo_new, cur_s_new), None

    carry, _ = jax.lax.scan(body, carry, plan)
    return carry


def pndm_scan(
    model_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    x_init: jnp.ndarray,
    plan: PNDMPlan,
) -> jnp.ndarray:
    """Run the full PNDM schedule as one lax.scan.

    ``model_fn(x, t) -> eps`` is shape-preserving (CFG/masking live inside).
    Deterministic -- PNDM adds no noise.
    """
    carry = pndm_scan_carry(model_fn, pndm_init_carry(x_init), plan)
    return carry[0]
