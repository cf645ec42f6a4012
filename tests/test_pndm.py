"""Tests for the PNDM static-plan scan against a sequential oracle.

The oracle below is a direct sequential transliteration of the PNDM
algorithm semantics (PRK warm-up + 4th-order PLMS with the pseudo transfer
function) that the static plan is derived from. It intentionally mirrors a
stateful step-by-step scheduler so the test exercises the risky part: the
flattening of the Python state machine into per-step coefficient tables.
"""

import numpy as np
import jax
import jax.numpy as jnp

from brepgen_tpu.diffusion import make_pndm_plan, pndm_scan
from brepgen_tpu.diffusion.ddpm import make_betas_linear


class SequentialPNDM:
    """Stateful sequential PNDM sampler (oracle)."""

    def __init__(self, num_inference_steps, num_train_timesteps=1000):
        betas = make_betas_linear(num_train_timesteps)
        self.acp = np.cumprod(1.0 - betas)
        self.final_acp = self.acp[0]
        self.T = num_train_timesteps
        self.N = num_inference_steps
        self.step_ratio = self.T // self.N
        base = (np.arange(self.N) * self.step_ratio).round().astype(np.int64)
        prk_raw = np.repeat(base[-4:], 2) + np.tile(np.array([0, self.step_ratio // 2]), 4)
        self.prk_ts = (np.repeat(prk_raw[:-1], 2)[1:-1])[::-1].copy()
        self.plms_ts = base[:-3][::-1].copy()
        self.timesteps = np.concatenate([self.prk_ts, self.plms_ts])
        self.ets = []
        self.counter = 0
        self.cur_mo = 0.0
        self.cur_sample = None

    def _transfer(self, sample, t, t_prev, mo):
        a_t = self.acp[t]
        a_prev = self.acp[t_prev] if t_prev >= 0 else self.final_acp
        sc = np.sqrt(a_prev / a_t)
        denom = a_t * np.sqrt(1 - a_prev) + np.sqrt(a_t * (1 - a_t) * a_prev)
        return sc * sample - (a_prev - a_t) / denom * mo

    def step(self, mo, t, sample):
        if self.counter < len(self.prk_ts):
            diff_to_prev = 0 if self.counter % 2 else self.step_ratio // 2
            t_prev = t - diff_to_prev
            t_eff = int(self.prk_ts[(self.counter // 4) * 4])
            sub = self.counter % 4
            if sub == 0:
                self.cur_sample = sample
                self.ets.append(mo)
                self.cur_mo = self.cur_mo + mo / 6.0
                eff = mo
            elif sub in (1, 2):
                self.cur_mo = self.cur_mo + mo / 3.0
                eff = mo
            else:
                eff = self.cur_mo + mo / 6.0
                self.cur_mo = 0.0
            out = self._transfer(self.cur_sample, t_eff, t_prev, eff)
        else:
            t_prev = t - self.step_ratio
            self.ets = self.ets[-3:]
            self.ets.append(mo)
            e = self.ets
            if len(e) == 4:
                eff = (55 * e[-1] - 59 * e[-2] + 37 * e[-3] - 9 * e[-4]) / 24.0
            elif len(e) == 3:
                eff = (23 * e[-1] - 16 * e[-2] + 5 * e[-3]) / 12.0
            elif len(e) == 2:
                eff = (3 * e[-1] - e[-2]) / 2.0
            else:
                eff = e[-1]
            out = self._transfer(sample, t, t_prev, eff)
        self.counter += 1
        return out


def _model(x, t):
    return 0.05 * x + 0.002 * float(t)


def _run_oracle(num_steps, max_calls, x0):
    sched = SequentialPNDM(num_steps)
    x = x0.copy()
    for t in sched.timesteps[:max_calls]:
        eps = _model(x, int(t))
        x = sched.step(eps, int(t), x)
    return x


def test_plan_timesteps_match_reference_structure():
    plan = make_pndm_plan(200)
    ts = np.asarray(plan.t_model)
    assert len(ts) == 209  # 12 prk + 197 plms
    np.testing.assert_array_equal(
        ts[:12], [995, 992, 992, 990, 990, 987, 987, 985, 985, 982, 982, 980]
    )
    assert ts[12] == 980 and ts[13] == 975 and ts[-1] == 0
    # truncated plan used for bbox stages: 158 calls end at t=255
    plan158 = make_pndm_plan(200, max_calls=158)
    assert np.asarray(plan158.t_model)[-1] == 255


def test_scan_matches_sequential_oracle_full():
    plan = make_pndm_plan(50)

    def model_fn(x, t):
        return 0.05 * x + 0.002 * t.astype(jnp.float32)

    x0 = np.asarray(jax.random.normal(jax.random.PRNGKey(0), (3, 4)), np.float64)
    got = pndm_scan(model_fn, jnp.asarray(x0, jnp.float32), plan)
    want = _run_oracle(50, None, x0)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_scan_matches_sequential_oracle_truncated():
    """Truncation at 158 calls (the reference's bbox-stage schedule)."""
    plan = make_pndm_plan(200, max_calls=158)

    def model_fn(x, t):
        return 0.05 * x + 0.002 * t.astype(jnp.float32)

    x0 = np.asarray(jax.random.normal(jax.random.PRNGKey(1), (2, 6)), np.float64)
    got = pndm_scan(model_fn, jnp.asarray(x0, jnp.float32), plan)
    want = _run_oracle(200, 158, x0)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)


def test_prk_warmup_fills_history():
    plan = make_pndm_plan(200)
    append = np.asarray(plan.append_ets)
    # appends at prk counters 0, 4, 8 then every plms step
    np.testing.assert_array_equal(np.where(append[:12])[0], [0, 4, 8])
    assert append[12:].all()
    # first plms step uses full AB4 weights
    np.testing.assert_allclose(
        np.asarray(plan.ets_w)[12], [-9 / 24, 37 / 24, -59 / 24, 55 / 24], rtol=1e-6
    )


def test_pndm_reduces_noise_toward_signal():
    """Sanity: integrating the true-eps direction denoises a known x0."""
    from brepgen_tpu.diffusion import make_ddpm_tables, add_noise

    tables = make_ddpm_tables()
    x0 = jnp.ones((1, 8)) * 0.5
    noise = jax.random.normal(jax.random.PRNGKey(2), (1, 8))
    xT = add_noise(tables, x0, noise, jnp.asarray([999]))

    acp = tables.alphas_cumprod

    def model_fn(x, t):
        # ideal epsilon predictor for fixed x0
        a = acp[t]
        return (x - jnp.sqrt(a) * x0) / jnp.sqrt(1 - a)

    plan = make_pndm_plan(50)
    out = pndm_scan(model_fn, xT, plan)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=5e-2)
