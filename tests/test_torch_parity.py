"""Numerical parity of our transformer encoder against REAL torch semantics.

Builds a ``torch.nn.TransformerEncoder`` (the exact module the reference
composes, ``network.py:1076-1078``), converts its weights with
``tools.convert_torch``, and checks our flax encoder reproduces its output
-- including packed-QKV ordering, pre-LN order, ReLU FFN, final norm, and
key-padding-mask semantics. This is the test oracle for loading released
reference checkpoints.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from brepgen_tpu.nn.transformer import TransformerEncoder
from brepgen_tpu.tools.convert_torch import convert_torch_encoder


@pytest.mark.parametrize("use_mask", [False, True])
def test_encoder_matches_torch(use_mask):
    torch.manual_seed(0)
    d, h, ffn, L = 64, 4, 96, 3
    layer = torch.nn.TransformerEncoderLayer(
        d_model=d, nhead=h, dim_feedforward=ffn, dropout=0.0, norm_first=True
    )
    net = torch.nn.TransformerEncoder(layer, L, torch.nn.LayerNorm(d)).eval()

    B, S = 2, 10
    x = torch.randn(B, S, d)
    mask = torch.zeros(B, S, dtype=torch.bool)
    if use_mask:
        mask[:, 7:] = True

    with torch.no_grad():
        # torch expects [S, B, d] without batch_first (reference permutes)
        want = net(x.permute(1, 0, 2), src_key_padding_mask=mask).permute(1, 0, 2)

    sd = {f"net.{k}": v.numpy() for k, v in net.state_dict().items()}
    params = {"params": convert_torch_encoder(sd, L, prefix="net")}

    ours = TransformerEncoder(width=d, num_heads=h, ffn_width=ffn, num_layers=L, dropout=0.0)
    got = ours.apply(params, jnp.asarray(x.numpy()), jnp.asarray(mask.numpy()))

    w = np.asarray(want)
    g = np.asarray(got)
    if use_mask:
        w, g = w[:, :7], g[:, :7]  # padded-query outputs differ (torch NaN-fills)
    np.testing.assert_allclose(g, w, rtol=2e-4, atol=2e-4)


def test_denoiser_conversion_shapes():
    """A synthetic reference-layout state_dict converts into params our
    model accepts and runs with."""
    import jax

    from brepgen_tpu.nn import make_surfz_net

    d, L = 32, 2
    rng = np.random.default_rng(0)

    def lin(o, i):
        return {"weight": rng.normal(size=(o, i)).astype(np.float32),
                "bias": rng.normal(size=(o,)).astype(np.float32)}

    sd = {}
    for name, in_dim in (("z_embed", 48), ("p_embed", 6), ("time_embed", d), ("fc_out", d)):
        out_dim = 48 if name == "fc_out" else d
        for k, v in lin(d, in_dim).items():
            sd[f"{name}.0.{k}"] = v
        sd[f"{name}.1.weight"] = np.ones(d, np.float32)
        sd[f"{name}.1.bias"] = np.zeros(d, np.float32)
        for k, v in lin(out_dim, d).items():
            sd[f"{name}.3.{k}"] = v
    for i in range(L):
        lp = f"net.layers.{i}"
        sd[f"{lp}.self_attn.in_proj_weight"] = rng.normal(size=(3 * d, d)).astype(np.float32)
        sd[f"{lp}.self_attn.in_proj_bias"] = rng.normal(size=(3 * d,)).astype(np.float32)
        for k, v in lin(d, d).items():
            sd[f"{lp}.self_attn.out_proj.{k}"] = v
        for k, v in lin(64, d).items():
            sd[f"{lp}.linear1.{k}"] = v
        for k, v in lin(d, 64).items():
            sd[f"{lp}.linear2.{k}"] = v
        for nm in ("norm1", "norm2"):
            sd[f"{lp}.{nm}.weight"] = np.ones(d, np.float32)
            sd[f"{lp}.{nm}.bias"] = np.zeros(d, np.float32)
    sd["net.norm.weight"] = np.ones(d, np.float32)
    sd["net.norm.bias"] = np.zeros(d, np.float32)

    from brepgen_tpu.tools.convert_torch import convert_denoiser

    params = convert_denoiser(sd, "surfz", num_layers=L)
    net = make_surfz_net(width=d, num_heads=4, ffn_width=64, num_layers=L)
    z = jnp.zeros((2, 5, 48))
    pos = jnp.zeros((2, 5, 6))
    out = net.apply(params, (z, pos), jnp.zeros((2,), jnp.int32))
    assert out.shape == (2, 5, 48)
    assert np.isfinite(np.asarray(out)).all()
