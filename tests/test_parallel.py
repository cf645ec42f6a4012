"""Multi-device tests on the 8-way virtual CPU mesh: data-parallel training
steps produce the same result as single-device, and tensor-parallel
shardings compile and run."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from brepgen_tpu.data.assembly import assemble_surfpos
from brepgen_tpu.data.synthetic import make_dataset
from brepgen_tpu.diffusion import make_ddpm_tables
from brepgen_tpu.nn import make_surfpos_net
from brepgen_tpu.parallel.mesh import batch_sharding, make_mesh, replicate, shard_batch
from brepgen_tpu.parallel.sharding_rules import denoiser_param_shardings
from brepgen_tpu.train import ldm_train
from brepgen_tpu.train.common import init_state, make_ldm_optimizer

KEY = jax.random.PRNGKey(0)
SMALL = dict(width=32, num_heads=2, ffn_width=64, num_layers=1)


def _batch(B=8, nf=10):
    ds = make_dataset(B, seed=0)
    rng = np.random.default_rng(0)
    return {
        "surfpos": jnp.asarray(
            np.stack([assemble_surfpos(d, rng, max_face=nf) for d in ds])
        )
    }


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_data_parallel_matches_single_device():
    batch = _batch()
    model = make_surfpos_net(**SMALL)
    params = model.init(KEY, (batch["surfpos"],), jnp.zeros((8,), jnp.int32))
    opt = make_ldm_optimizer()
    tables = make_ddpm_tables()
    step = ldm_train.make_surfpos_step(model, opt, tables)

    # single device
    state1 = init_state(params, opt)
    state1, m1 = step(state1, batch, jax.random.PRNGKey(7))

    # 8-way data parallel: batch sharded, params replicated
    mesh = make_mesh((8, 1))
    state8 = init_state(params, opt)
    state8 = state8._replace(
        params=replicate(state8.params, mesh),
        opt_state=replicate(state8.opt_state, mesh),
    )
    sharded = shard_batch(batch, mesh)
    state8, m8 = step(state8, sharded, jax.random.PRNGKey(7))

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-5)
    # Adam's rsqrt amplifies f32 reduction-order differences between the
    # topologies; updates are +-lr (5e-4), allow a fraction of that.
    leaves1 = jax.tree.leaves(state1.params)
    leaves8 = jax.tree.leaves(state8.params)
    for a, b in zip(leaves1, leaves8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2.5e-4)


def test_tensor_parallel_forward_matches():
    """FFN/attention sharded over a 4-way model axis == replicated result."""
    mesh = make_mesh((2, 4))
    model = make_surfpos_net(width=64, num_heads=4, ffn_width=128, num_layers=2)
    x = jax.random.normal(KEY, (4, 6, 6))
    t = jnp.zeros((4,), jnp.int32)
    params = model.init(KEY, (x,), t)
    want = model.apply(params, (x,), t)

    shardings = denoiser_param_shardings(params, mesh)
    params_tp = jax.tree.map(lambda p, s: jax.device_put(p, s), params, shardings)
    x_sh = jax.device_put(x, batch_sharding(mesh))

    @jax.jit
    def fwd(p, x):
        return model.apply(p, (x,), t)

    with mesh:
        got = fwd(params_tp, x_sh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5)
    # check some param actually got sharded over 'model'
    specs = jax.tree.leaves(
        jax.tree.map(lambda s: s.spec, shardings,
                     is_leaf=lambda x: isinstance(x, NamedSharding))
    )
    assert any("model" in str(s) for s in specs)


def test_graft_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_sharded_cascade_matches_unsharded():
    """Tiny cascade, batch 8 sharded over the 8-device data axis, matches
    the single-device result (sampling is embarrassingly parallel)."""
    from tests.test_sampling import _build_tiny_cascade

    cascade1, cfg = _build_tiny_cascade(use_cf=False, batch_size=8)
    mesh = make_mesh((8, 1))
    cascade8, _ = _build_tiny_cascade(use_cf=False, mesh=mesh, batch_size=8)

    out1 = cascade1(jax.random.PRNGKey(0))
    with mesh:
        out8 = cascade8(jax.random.PRNGKey(0))
    for k in out1:
        np.testing.assert_allclose(
            np.asarray(out1[k], np.float32), np.asarray(out8[k], np.float32),
            rtol=1e-4, atol=1e-4,
        )
    # output really is sharded across 8 devices
    assert len(out8["surf_ncs"].sharding.device_set) == 8
