"""Pallas kernel tests (interpret mode on CPU) against the XLA reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from brepgen_tpu.kernels.attention import _xla_attention, fused_set_attention


def _rand_qkv(B=2, H=3, S=50, D=16, seed=0):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(k1, (B, H, S, D))
    k = jax.random.normal(k2, (B, H, S, D))
    v = jax.random.normal(k3, (B, H, S, D))
    return q, k, v


def test_matches_xla_no_mask():
    q, k, v = _rand_qkv()
    want = _xla_attention(q, k, v, None)
    got = fused_set_attention(q, k, v, None, 16, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_matches_xla_with_mask():
    q, k, v = _rand_qkv(seed=1)
    B, H, S, D = q.shape
    mask = jnp.zeros((B, S), bool).at[:, 37:].set(True)
    want = _xla_attention(q, k, v, mask)
    got = fused_set_attention(q, k, v, mask, 16, True)
    # valid queries must match; padded-query outputs are defined by both
    # (they attend to valid keys), compare everything
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_nonaligned_shapes_padded():
    # S=50 not a multiple of block_q=16 -> internal padding; D=16 < 128
    q, k, v = _rand_qkv(B=1, H=2, S=50, D=16, seed=2)
    got = fused_set_attention(q, k, v, None, 16, True)
    assert got.shape == (1, 2, 50, 16)
    assert np.isfinite(np.asarray(got)).all()


def test_gradients_flow():
    q, k, v = _rand_qkv(B=1, H=2, S=20, D=8, seed=3)
    mask = jnp.zeros((1, 20), bool).at[:, 15:].set(True)

    def loss_pallas(q, k, v):
        return jnp.sum(fused_set_attention(q, k, v, mask, 16, True) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, mask) ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_packed_matches_reference():
    """Packed all-heads kernel ([B,S,3W] in, [B,S,W] out) vs XLA reference."""
    from brepgen_tpu.kernels.attention import (
        _packed_reference,
        fused_set_attention_packed,
    )

    key = jax.random.PRNGKey(4)
    B, S, W, H = 2, 50, 48, 3
    qkv = jax.random.normal(key, (B, S, 3 * W))
    for mask in (None, jnp.zeros((B, S), bool).at[:, 37:].set(True)):
        want = _packed_reference(qkv, H, mask)
        got = fused_set_attention_packed(qkv, H, mask, 16, True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_packed_gradients_flow():
    from brepgen_tpu.kernels.attention import (
        _packed_reference,
        fused_set_attention_packed,
    )

    key = jax.random.PRNGKey(5)
    B, S, W, H = 1, 20, 16, 2
    qkv = jax.random.normal(key, (B, S, 3 * W))
    mask = jnp.zeros((B, S), bool).at[:, 15:].set(True)

    gp = jax.grad(lambda a: jnp.sum(fused_set_attention_packed(a, H, mask, 16, True) ** 2))(qkv)
    gx = jax.grad(lambda a: jnp.sum(_packed_reference(a, H, mask) ** 2))(qkv)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gx), rtol=1e-4, atol=1e-4)


def test_chamfer_matrix_matches_xla():
    """Pallas chamfer-matrix kernel (interpret) vs the XLA block reference,
    including ragged (non-multiple-of-block) S, R and padded points."""
    from brepgen_tpu.eval.metrics import _chamfer_block
    from brepgen_tpu.kernels.chamfer import chamfer_matrix

    key = jax.random.PRNGKey(6)
    S, R, P = 5, 3, 40
    sp = jax.random.normal(key, (S, P, 3))
    rp = jax.random.normal(jax.random.fold_in(key, 1), (R, P, 3))
    want = _chamfer_block(sp, rp)
    got = chamfer_matrix(sp, rp, block_s=4, block_r=2, chunk=16, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_transformer_with_pallas_impl():
    """The encoder wired to attn_impl='pallas' agrees with the XLA path."""
    from brepgen_tpu.nn import make_surfz_net

    small = dict(width=32, num_heads=2, ffn_width=64, num_layers=1)
    net_x = make_surfz_net(attn_impl="xla", **small)
    net_p = make_surfz_net(attn_impl="pallas_interpret", **small)
    # patch: interpret mode flag travels via attn_impl in tests
    z = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 48))
    pos = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 6))
    mask = jnp.zeros((2, 8), bool).at[:, 6:].set(True)
    t = jnp.asarray([3, 3])
    params = net_x.init(jax.random.PRNGKey(2), (z, pos), t, mask)
    want = net_x.apply(params, (z, pos), t, mask)
    got = net_p.apply(params, (z, pos), t, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_packed_flash_matches_reference():
    """K-chunked (online-softmax) packed path vs XLA, masked and not."""
    from brepgen_tpu.kernels.attention import (
        _packed_flash_forward,
        _packed_reference,
    )

    key = jax.random.PRNGKey(7)
    B, S, W, H = 2, 70, 48, 3
    qkv = jax.random.normal(key, (B, S, 3 * W))
    for mask in (None, jnp.zeros((B, S), bool).at[:, 50:].set(True)):
        want = _packed_reference(qkv, H, mask)
        # block_q 32, block_k 16 -> 5 k-chunks with a ragged tail
        got = _packed_flash_forward(qkv, H, mask, 32, 16, True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
        )


def test_packed_dispatch_streams_long_sequences():
    """Above PACKED_RESIDENT_BYTES the public packed entry point must route
    through the streaming kernel and still match the reference (and its
    backward must fall back to the recompute VJP)."""
    from brepgen_tpu.kernels import attention as A

    key = jax.random.PRNGKey(8)
    B, S, W, H = 1, 40, 32, 2
    qkv = jax.random.normal(key, (B, S, 3 * W))
    mask = jnp.zeros((B, S), bool).at[:, 33:].set(True)
    old = A.PACKED_RESIDENT_BYTES
    A.PACKED_RESIDENT_BYTES = 1  # force the streaming branch
    try:
        want = A._packed_reference(qkv, H, mask)
        got = A.fused_set_attention_packed(qkv, H, mask, None, True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
        )
        gp = jax.grad(
            lambda a: jnp.sum(A.fused_set_attention_packed(a, H, mask, None, True) ** 2)
        )(qkv)
        gx = jax.grad(lambda a: jnp.sum(A._packed_reference(a, H, mask) ** 2))(qkv)
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gx), rtol=1e-4, atol=1e-4)
    finally:
        A.PACKED_RESIDENT_BYTES = old
