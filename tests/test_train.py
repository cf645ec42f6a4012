"""Training-step tests: losses decrease, masking is honored, state updates."""

import jax
import jax.numpy as jnp
import numpy as np

from brepgen_tpu.data.assembly import assemble_edgez, assemble_surfpos, assemble_surfz
from brepgen_tpu.data.synthetic import make_dataset
from brepgen_tpu.diffusion import make_ddpm_tables
from brepgen_tpu.nn import EdgeVAE, SurfVAE, make_edgez_net, make_surfpos_net, make_surfz_net
from brepgen_tpu.train import ldm_train, vae_train
from brepgen_tpu.train.common import (
    init_state,
    make_ldm_optimizer,
    make_vae_optimizer,
    masked_mse,
)

KEY = jax.random.PRNGKey(0)
SMALL = dict(width=32, num_heads=2, ffn_width=64, num_layers=1)


def test_masked_mse():
    pred = jnp.ones((2, 3, 4))
    target = jnp.zeros((2, 3, 4))
    mask = jnp.zeros((2, 3), bool).at[:, 2].set(True)
    # error 1 on every unmasked element
    assert float(masked_mse(pred, target, mask)) == 1.0
    # masked positions don't contribute
    pred = pred.at[:, 2].set(100.0)
    assert float(masked_mse(pred, target, mask)) == 1.0


def test_surf_vae_loss_decreases():
    vae = SurfVAE(block_out_channels=(8, 8, 8, 8))
    x = jax.random.normal(KEY, (4, 32, 32, 3)) * 0.5
    params = vae.init(KEY, x)
    opt = make_vae_optimizer(lr=1e-3)
    state = init_state(params, opt)
    step = vae_train.make_train_step(vae, opt)
    losses = []
    for i in range(8):
        state, m = step(state, x, jax.random.PRNGKey(i))
        losses.append(float(m["mse"]))
    assert losses[-1] < losses[0]


def test_surfpos_step_trains():
    ds = make_dataset(8, seed=0)
    rng = np.random.default_rng(0)
    batch = {
        "surfpos": jnp.asarray(
            np.stack([assemble_surfpos(d, rng, max_face=12) for d in ds])
        )
    }
    model = make_surfpos_net(**SMALL)
    params = model.init(KEY, (batch["surfpos"],), jnp.zeros((8,), jnp.int32))
    opt = make_ldm_optimizer(lr=1e-3)
    state = init_state(params, opt)
    tables = make_ddpm_tables()
    step = ldm_train.make_surfpos_step(model, opt, tables)
    losses = []
    for i in range(10):
        state, m = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert min(losses[5:]) < max(losses[:2])
    assert int(state.step) == 10


def _tiny_vaes():
    surf_vae = SurfVAE(block_out_channels=(4, 4, 4, 4))
    edge_vae = EdgeVAE(block_out_channels=(4, 4, 4))
    sp = surf_vae.init(KEY, jnp.zeros((1, 32, 32, 3)))
    ep = edge_vae.init(KEY, jnp.zeros((1, 32, 3)))
    return surf_vae, sp, edge_vae, ep


def test_edgez_step_smoke():
    ds = make_dataset(2, seed=1)
    rng = np.random.default_rng(0)
    items = [assemble_edgez(d, rng, max_face=8, max_edge=6) for d in ds]
    batch = {
        "edgepnt": jnp.asarray(np.stack([i[0] for i in items])),
        "edgepos": jnp.asarray(np.stack([i[1] for i in items])),
        "edge_mask": jnp.asarray(np.stack([i[2] for i in items])),
        "surfpnt": jnp.asarray(np.stack([i[3] for i in items])),
        "surfpos": jnp.asarray(np.stack([i[4] for i in items])),
        "vertpos": jnp.asarray(np.stack([i[5] for i in items])),
    }
    surf_vae, sp, edge_vae, ep = _tiny_vaes()
    surf_enc = vae_train.make_encoder_fn(surf_vae)
    edge_enc = vae_train.make_encoder_fn(edge_vae)

    model = make_edgez_net(**SMALL)
    B, nf, ne = 2, 8, 6
    streams = (
        jnp.zeros((B, nf * ne, 12)),
        jnp.zeros((B, nf * ne, 6)),
        jnp.zeros((B, nf * ne, 6)),
        jnp.zeros((B, nf * ne, 6)),
        jnp.zeros((B, nf * ne, 48)),
    )
    params = model.init(KEY, streams, jnp.zeros((B,), jnp.int32))
    opt = make_ldm_optimizer()
    state = init_state(params, opt)
    tables = make_ddpm_tables()
    step = ldm_train.make_edgez_step(
        model, opt, tables, surf_enc, sp, edge_enc, ep
    )
    state, m = step(state, batch, KEY)
    assert np.isfinite(float(m["loss"]))
    assert np.isfinite(float(m["loss_z"])) and np.isfinite(float(m["loss_v"]))


def test_surfz_val_step():
    ds = make_dataset(2, seed=2)
    rng = np.random.default_rng(0)
    items = [assemble_surfz(d, rng, max_face=8) for d in ds]
    batch = {
        "surfpos": jnp.asarray(np.stack([i[0] for i in items])),
        "surfpnt": jnp.asarray(np.stack([i[1] for i in items])),
        "surf_mask": jnp.asarray(np.stack([i[2] for i in items])),
    }
    surf_vae, sp, _, _ = _tiny_vaes()
    surf_enc = vae_train.make_encoder_fn(surf_vae)
    model = make_surfz_net(**SMALL)
    params = model.init(
        KEY, (jnp.zeros((2, 8, 48)), batch["surfpos"]), jnp.zeros((2,), jnp.int32)
    )
    tables = make_ddpm_tables()
    val = ldm_train.make_val_step("surfz", model, tables, surf_enc, sp)
    total, count = val(params, batch, KEY, 50)
    assert np.isfinite(float(total)) and float(count) == 2.0


def test_checkpoint_roundtrip(tmp_path):
    from brepgen_tpu.train.checkpoint import load_checkpoint, save_checkpoint

    model = make_surfpos_net(**SMALL)
    x = jnp.zeros((1, 4, 6))
    params = model.init(KEY, (x,), jnp.zeros((1,), jnp.int32))
    opt = make_ldm_optimizer()
    state = init_state(params, opt)
    path = save_checkpoint(str(tmp_path), state, "latest")
    restored = load_checkpoint(path, state)
    chex_equal = jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        state.params,
        restored.params,
    )
    assert int(restored.step) == 0


def test_run_training_loop(tmp_path):
    """The generic epoch loop driver trains, validates, and checkpoints."""
    import os

    from brepgen_tpu.train.loop import run_training
    from brepgen_tpu.train.logging import MetricsLogger
    from brepgen_tpu.diffusion import make_ddpm_tables

    model = make_surfpos_net(**SMALL)
    x = jnp.zeros((4, 6, 6))
    params = model.init(KEY, (x,), jnp.zeros((4,), jnp.int32))
    opt = make_ldm_optimizer()
    state = init_state(params, opt)
    tables = make_ddpm_tables()
    step = ldm_train.make_surfpos_step(model, opt, tables)

    batches = [{"surfpos": jax.random.normal(KEY, (4, 6, 6))}]
    logger = MetricsLogger(str(tmp_path), "t")
    state = run_training(
        step, lambda: iter(batches), state,
        epochs=2, rng=KEY, logger=logger, ckpt_dir=str(tmp_path),
        val_fn=lambda s: {"val": 0.0}, test_nepoch=1, save_nepoch=1,
    )
    assert int(state.step) == 2
    assert os.path.isdir(tmp_path / "epoch_2")
    assert os.path.isdir(tmp_path / "latest")
    assert os.path.exists(tmp_path / "t.jsonl")


def test_remat_preserves_params_and_step():
    """remat=True must keep the param-tree names (checkpoint/converter
    contract) and the exact step outputs — it only changes what XLA saves
    for the backward (VERDICT r2 follow-on: edgez@bs128 OOMs unremat'd)."""
    from brepgen_tpu.cli.build import auto_remat

    # auto policy: edge stages at reference batch sizes remat, surf don't
    assert auto_remat("edgez", 128, 30, 20)
    assert auto_remat("edgepos", 64, 50, 30)
    assert not auto_remat("surfpos", 512, 30, 20)
    assert not auto_remat("surfz", 256, 50, 30)

    ds = make_dataset(8, seed=0)
    rng = np.random.default_rng(0)
    batch = {
        "surfpos": jnp.asarray(
            np.stack([assemble_surfpos(d, rng, max_face=12) for d in ds])
        )
    }
    opt = make_ldm_optimizer(lr=1e-3)
    tables = make_ddpm_tables()
    outs = []
    # "dots" = selective checkpointing (save Dense outputs, recompute the
    # rest) — same grads, different save set, like full remat
    for remat in (False, True, "dots"):
        model = make_surfpos_net(remat=remat, **SMALL)
        params = model.init(KEY, (batch["surfpos"],), jnp.zeros((8,), jnp.int32))
        state = init_state(params, opt)
        step = ldm_train.make_surfpos_step(model, opt, tables)
        for i in range(3):
            state, m = step(state, batch, jax.random.PRNGKey(i))
        outs.append((params, state.params, float(m["loss"])))
    p0, s0, l0 = outs[0]
    for p1, s1, l1 in outs[1:]:
        assert jax.tree.structure(p0) == jax.tree.structure(p1)
        assert l0 == l1
        for a, b in zip(jax.tree.leaves(s0), jax.tree.leaves(s1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_latent_cache_and_cached_step_equivalence():
    """LatentCache returns exactly the frozen encode, and surfz/edgez steps
    fed precomputed latents match the fused-encode steps (same rng).
    SURVEY hard part 4's 'keep both paths'."""
    from brepgen_tpu.data.latent_cache import LatentCache
    from brepgen_tpu.train.vae_train import make_encoder_fn

    surf_vae, sp, edge_vae, ep = _tiny_vaes()
    surf_enc = make_encoder_fn(surf_vae)
    edge_enc = make_encoder_fn(edge_vae)

    ds = make_dataset(4, seed=3)
    rng = np.random.default_rng(0)
    items = [assemble_edgez(d, rng, 10, 8) for d in ds]
    batch = {
        "edgepnt": jnp.asarray(np.stack([x[0] for x in items])),
        "edgepos": jnp.asarray(np.stack([x[1] for x in items])),
        "edge_mask": jnp.asarray(np.stack([x[2] for x in items])),
        "surfpnt": jnp.asarray(np.stack([x[3] for x in items])),
        "surfpos": jnp.asarray(np.stack([x[4] for x in items])),
        "vertpos": jnp.asarray(np.stack([x[5] for x in items])),
    }
    B, nf = batch["surfpnt"].shape[:2]
    ne = batch["edgepnt"].shape[2]

    # cache == direct encode, and repeats hit
    cache = LatentCache(surf_enc, sp, (32, 32, 3), 48, bucket=16)
    grids = np.asarray(batch["surfpnt"]).reshape(B * nf, 32, 32, 3)
    z_cache = cache(grids)
    z_direct = np.asarray(surf_enc(sp, jnp.asarray(grids))).reshape(B * nf, -1)
    np.testing.assert_allclose(z_cache, z_direct, atol=1e-5)
    m0 = cache.misses
    cache(grids)
    assert cache.misses == m0  # all hits on repeat; pad_repeat dups dedup'd
    assert len(cache) <= len(grids)

    e_cache = LatentCache(edge_enc, ep, (32, 3), 12, bucket=16)
    latent_batch = dict(batch)
    latent_batch["surfz"] = jnp.asarray(z_cache.reshape(B, nf, 48))
    latent_batch["edgez"] = jnp.asarray(
        e_cache(np.asarray(batch["edgepnt"]).reshape(-1, 32, 3)).reshape(B, nf, ne, 12))
    del latent_batch["surfpnt"], latent_batch["edgepnt"]

    model = make_edgez_net(**SMALL)
    S = nf * ne
    params = model.init(
        KEY, tuple(jnp.zeros((B, S, d)) for d in (12, 6, 6, 6, 48)),
        jnp.zeros((B,), jnp.int32))
    opt = make_ldm_optimizer(lr=1e-3)
    step = ldm_train.make_edgez_step(model, opt, tables=make_ddpm_tables(),
                                     surf_encode=surf_enc, surf_vae_params=sp,
                                     edge_encode=edge_enc, edge_vae_params=ep)
    s1, m1 = step(init_state(params, opt), batch, jax.random.PRNGKey(7))
    s2, m2 = step(init_state(params, opt), latent_batch, jax.random.PRNGKey(7))
    # losses agree to float tolerance; post-Adam params are NOT compared
    # (Adam sign-normalizes bit-level grad differences between the two
    # differently-fused XLA programs up to the lr scale)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    val = ldm_train.make_val_step(
        "edgez", model, make_ddpm_tables(), surf_enc, sp, edge_enc, ep)
    v1 = val(params, batch, jax.random.PRNGKey(9), 50)
    v2 = val(params, latent_batch, jax.random.PRNGKey(9), 50)
    np.testing.assert_allclose(float(v1[0]), float(v2[0]), rtol=1e-5)
