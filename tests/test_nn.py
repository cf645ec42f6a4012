"""Shape, mask-semantics, and numerics tests for the network modules."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from brepgen_tpu.nn import (
    DiagonalGaussian,
    EdgeVAE,
    SurfVAE,
    make_edgepos_net,
    make_edgez_net,
    make_surfpos_net,
    make_surfz_net,
    sincos_embedding,
)
from brepgen_tpu.nn.denoiser import broadcast_face_to_edge, flatten_face_edge
from brepgen_tpu.nn.vae1d import fir_downsample_1d, fir_upsample_1d

KEY = jax.random.PRNGKey(0)

SMALL = dict(width=64, num_heads=4, ffn_width=128, num_layers=2)


def test_sincos_embedding_matches_reference_convention():
    # cos first half, sin second half; frequency ladder exp(-ln(1e4) k / half)
    t = jnp.asarray([0.0, 5.0])
    emb = sincos_embedding(t, 8)
    assert emb.shape == (2, 8)
    np.testing.assert_allclose(np.asarray(emb[0, :4]), np.ones(4), atol=1e-6)  # cos(0)
    np.testing.assert_allclose(np.asarray(emb[0, 4:]), np.zeros(4), atol=1e-6)  # sin(0)
    freqs = np.exp(-np.log(10000.0) * np.arange(4) / 4)
    np.testing.assert_allclose(np.asarray(emb[1, 4:]), np.sin(5.0 * freqs), rtol=1e-5)


def test_surfpos_net_shapes():
    net = make_surfpos_net(**SMALL)
    x = jnp.zeros((2, 30, 6))
    t = jnp.asarray([10, 10])
    params = net.init(KEY, (x,), t)
    out = net.apply(params, (x,), t)
    assert out.shape == (2, 30, 6)


def test_surfz_mask_invariance():
    """Changing masked (padded) token values must not change valid outputs."""
    net = make_surfz_net(**SMALL)
    B, S = 2, 8
    z = jax.random.normal(KEY, (B, S, 48))
    pos = jax.random.normal(jax.random.PRNGKey(1), (B, S, 6))
    mask = jnp.zeros((B, S), bool).at[:, 5:].set(True)  # last 3 padded
    t = jnp.asarray([100, 100])
    params = net.init(KEY, (z, pos), t, mask)
    out1 = net.apply(params, (z, pos), t, mask)
    # perturb padded tokens
    z2 = z.at[:, 5:].add(100.0)
    pos2 = pos.at[:, 5:].add(-50.0)
    out2 = net.apply(params, (z2, pos2), t, mask)
    np.testing.assert_allclose(
        np.asarray(out1[:, :5]), np.asarray(out2[:, :5]), atol=1e-5
    )
    # sanity: padded outputs DO change (they see their own token)
    assert not np.allclose(np.asarray(out1[:, 5:]), np.asarray(out2[:, 5:]))


def test_edgez_net_full_stream_stack():
    net = make_edgez_net(**SMALL)
    B, nf, ne = 2, 4, 3
    S = nf * ne
    edgez = jnp.zeros((B, nf, ne, 12))
    vert = jnp.zeros((B, nf, ne, 6))
    epos = jnp.zeros((B, nf, ne, 6))
    spos = jnp.zeros((B, nf, 6))
    sz = jnp.zeros((B, nf, 48))
    mask = jnp.zeros((B, nf, ne), bool)
    streams = (
        flatten_face_edge(edgez),
        flatten_face_edge(vert),
        flatten_face_edge(epos),
        broadcast_face_to_edge(spos, ne),
        broadcast_face_to_edge(sz, ne),
    )
    t = jnp.asarray([5, 5])
    params = net.init(KEY, streams, t, mask.reshape(B, S))
    out = net.apply(params, streams, t, mask.reshape(B, S))
    assert out.shape == (B, S, 18)


def test_cfg_label_dropout():
    net = make_surfpos_net(use_cf=True, **SMALL)
    B = 64
    x = jnp.zeros((B, 4, 6))
    t = jnp.zeros((B,), jnp.int32)
    labels = jnp.full((B, 1), 3, jnp.int32)
    params = net.init({"params": KEY, "cfg": KEY, "dropout": KEY}, (x,), t, None, labels)
    # train=True requires cfg + dropout rngs; uncond and cond outputs differ
    out_cond = net.apply(params, (x,), t, None, labels)
    out_uncond = net.apply(params, (x,), t, None, jnp.zeros_like(labels))
    assert not np.allclose(np.asarray(out_cond), np.asarray(out_uncond))
    out_train = net.apply(
        params, (x,), t, None, labels, True,
        rngs={"cfg": jax.random.PRNGKey(7), "dropout": jax.random.PRNGKey(8)},
    )
    assert out_train.shape == (B, 4, 6)


def test_surf_vae_roundtrip_shapes():
    vae = SurfVAE(block_out_channels=(16, 16, 32, 32))
    x = jax.random.normal(KEY, (2, 32, 32, 3))
    params = vae.init(KEY, x)
    posterior = vae.apply(params, x, method=SurfVAE.encode)
    assert posterior.mean.shape == (2, 4, 4, 3)
    dec = vae.apply(params, posterior.mode(), method=SurfVAE.decode)
    assert dec.shape == (2, 32, 32, 3)
    kl = posterior.kl()
    assert kl.shape == (2,) and bool(jnp.all(kl >= 0))


def test_edge_vae_roundtrip_shapes():
    vae = EdgeVAE(block_out_channels=(16, 16, 32))
    x = jax.random.normal(KEY, (2, 32, 3))
    params = vae.init(KEY, x)
    posterior = vae.apply(params, x, method=EdgeVAE.encode)
    assert posterior.mean.shape == (2, 4, 3)
    dec = vae.apply(params, posterior.mode(), method=EdgeVAE.decode)
    assert dec.shape == (2, 32, 3)


def test_fir_resample_properties():
    # downsample halves, upsample doubles, and up(down(smooth)) ~ smooth
    L = 32
    t = np.linspace(0, 1, L, dtype=np.float32)
    smooth = jnp.asarray(np.stack([np.sin(2 * np.pi * t), t], -1))[None]  # [1, 32, 2]
    down = fir_downsample_1d(smooth)
    assert down.shape == (1, 16, 2)
    up = fir_upsample_1d(down)
    assert up.shape == (1, 32, 2)
    err = float(jnp.mean(jnp.abs(up[0, 4:-4] - smooth[0, 4:-4])))
    assert err < 0.05, err


def test_diagonal_gaussian_kl_golden():
    moments = jnp.concatenate(
        [jnp.full((1, 2, 3), 0.5), jnp.full((1, 2, 3), np.log(4.0))], axis=-1
    )
    g = DiagonalGaussian(moments)
    # kl per element: 0.5 (mu^2 + var - 1 - logvar) = 0.5(0.25 + 4 - 1 - ln4)
    expected = 6 * 0.5 * (0.25 + 4.0 - 1.0 - np.log(4.0))
    np.testing.assert_allclose(float(g.kl()[0]), expected, rtol=1e-5)


def test_bf16_compute_path():
    net = make_surfpos_net(dtype=jnp.bfloat16, **SMALL)
    x = jnp.zeros((1, 4, 6))
    t = jnp.asarray([0])
    params = net.init(KEY, (x,), t)
    out = net.apply(params, (x,), t)
    assert out.dtype == jnp.float32  # predictions upcast at the head
