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


class _TorchEdgeZNet(torch.nn.Module):
    """Reference-shaped EdgeZNet (network.py:1289-1393) at test width.

    Re-built from the reference's architectural spec: per-stream
    Sequential(Linear, LayerNorm, SiLU, Linear) embedders, summed token
    embedding + sinusoidal time embedding + class embedding, pre-LN
    TransformerEncoder, MLP head to 18-D. State-dict key names match the
    released checkpoints so this doubles as the converter oracle.
    """

    def __init__(self, d=64, h=4, ffn=96, L=2, use_cf=True):
        super().__init__()
        self.d = d
        mk = lambda i, o: torch.nn.Sequential(
            torch.nn.Linear(i, d), torch.nn.LayerNorm(d),
            torch.nn.SiLU(), torch.nn.Linear(d, o),
        )
        self.surfz_embed = mk(48, d)
        self.edgez_embed = mk(12, d)
        self.surfp_embed = mk(6, d)
        self.edgep_embed = mk(6, d)
        self.vertp_fc = mk(6, d)
        self.time_embed = mk(d, d)
        self.fc_out = mk(d, 18)
        layer = torch.nn.TransformerEncoderLayer(
            d_model=d, nhead=h, dim_feedforward=ffn, dropout=0.0, norm_first=True
        )
        self.net = torch.nn.TransformerEncoder(layer, L, torch.nn.LayerNorm(d))
        self.use_cf = use_cf
        if use_cf:
            # reference wraps nn.Embedding in Embedder (network.py:17-27)
            self.class_embed = torch.nn.Module()
            self.class_embed.embed = torch.nn.Embedding(11, d)

    def _sincos(self, t):
        import math

        half = self.d // 2
        freqs = torch.exp(
            -math.log(10000.0) * torch.arange(half, dtype=torch.float32) / half
        )
        args = t[:, None].float() * freqs[None]
        return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)

    def forward(self, edge, timesteps, edgePos, surfPos, surfZ, mask, class_label):
        edgeZ, vertPos = edge[..., :12], edge[..., 12:]
        ne = edgePos.size(2)
        t_emb = self.time_embed(self._sincos(timesteps)).unsqueeze(1)
        surf = (self.surfp_embed(surfPos) + self.surfz_embed(surfZ))
        surf = surf.unsqueeze(-2).repeat(1, 1, ne, 1).flatten(1, 2)
        edge_e = (self.edgep_embed(edgePos) + self.edgez_embed(edgeZ)).flatten(1, 2)
        vert = self.vertp_fc(vertPos).flatten(1, 2)
        tokens = surf + edge_e + vert + t_emb
        if self.use_cf:
            tokens = tokens + self.class_embed.embed(class_label)
        out = self.net(
            tokens.permute(1, 0, 2), src_key_padding_mask=mask.flatten(1, 2)
        ).transpose(0, 1)
        return self.fc_out(out)


def test_full_edgez_denoiser_matches_torch():
    """Full-model converter round-trip (VERDICT round-1 item 5): the
    deepest denoiser with CF enabled, reference state-dict layout, output
    parity <= 1e-4."""
    import jax.numpy as jnp

    from brepgen_tpu.nn import make_edgez_net
    from brepgen_tpu.nn.denoiser import broadcast_face_to_edge
    from brepgen_tpu.tools.convert_torch import convert_denoiser

    torch.manual_seed(1)
    d, h, ffn, L = 64, 4, 96, 2
    B, nf, ne = 2, 3, 2
    tnet = _TorchEdgeZNet(d, h, ffn, L, use_cf=True).eval()

    edge = torch.randn(B, nf, ne, 18)
    edgePos = torch.randn(B, nf, ne, 6)
    surfPos = torch.randn(B, nf, 6)
    surfZ = torch.randn(B, nf, 48)
    t = torch.tensor([3, 500])
    label = torch.tensor([[1], [4]])
    mask = torch.zeros(B, nf, ne, dtype=torch.bool)
    mask[:, -1, -1] = True
    with torch.no_grad():
        want = tnet(edge, t, edgePos, surfPos, surfZ, mask, label)

    sd = {k: v.numpy() for k, v in tnet.state_dict().items()}
    params = convert_denoiser(sd, "edgez", num_layers=L)

    ours = make_edgez_net(
        use_cf=True, width=d, num_heads=h, ffn_width=ffn, num_layers=L, dropout=0.0
    )
    flat = lambda a: jnp.asarray(a.numpy()).reshape(B, nf * ne, -1)
    streams = (
        flat(edge[..., :12]),
        flat(edge[..., 12:]),
        flat(edgePos),
        broadcast_face_to_edge(jnp.asarray(surfPos.numpy()), ne),
        broadcast_face_to_edge(jnp.asarray(surfZ.numpy()), ne),
    )
    got = ours.apply(
        params,
        streams,
        jnp.asarray(t.numpy()),
        jnp.asarray(mask.numpy()).reshape(B, nf * ne),
        jnp.asarray(label.numpy()),
    )

    w = np.asarray(want).reshape(B, nf * ne, 18)
    g = np.asarray(got)
    valid = ~np.asarray(mask.numpy()).reshape(B, nf * ne)
    np.testing.assert_allclose(g[valid], w[valid], rtol=1e-4, atol=1e-4)


class _TResConv(torch.nn.Module):
    """diffusers unet_1d ResConvBlock semantics (the reference composes it
    at network.py:13,30-83): conv5-GN(1)-GELU twice + (1x1, bias-free) skip."""

    def __init__(self, cin, mid, cout):
        super().__init__()
        if cin != cout:
            self.conv_skip = torch.nn.Conv1d(cin, cout, 1, bias=False)
        self.conv_1 = torch.nn.Conv1d(cin, mid, 5, padding=2)
        self.group_norm_1 = torch.nn.GroupNorm(1, mid)
        self.conv_2 = torch.nn.Conv1d(mid, cout, 5, padding=2)
        self.group_norm_2 = torch.nn.GroupNorm(1, cout)

    def forward(self, x):
        r = self.conv_skip(x) if hasattr(self, "conv_skip") else x
        h = torch.nn.functional.gelu(self.group_norm_1(self.conv_1(x)))
        h = torch.nn.functional.gelu(self.group_norm_2(self.conv_2(h)))
        return h + r


class _TAttn1d(torch.nn.Module):
    def __init__(self, c, heads):
        super().__init__()
        self.heads = heads
        self.group_norm = torch.nn.GroupNorm(1, c)
        self.query = torch.nn.Linear(c, c)
        self.key = torch.nn.Linear(c, c)
        self.value = torch.nn.Linear(c, c)
        self.proj_attn = torch.nn.Linear(c, c)

    def forward(self, x):  # [B, C, L]
        B, C, L = x.shape
        h = self.group_norm(x).transpose(1, 2)
        split = lambda a: a.reshape(B, L, self.heads, C // self.heads).transpose(1, 2)
        q, k, v = split(self.query(h)), split(self.key(h)), split(self.value(h))
        w = torch.softmax(q @ k.transpose(-1, -2) / (C // self.heads) ** 0.5, dim=-1)
        o = (w @ v).transpose(1, 2).reshape(B, L, C)
        return x + self.proj_attn(o).transpose(1, 2)


_CUBIC = torch.tensor(
    [-0.01171875, -0.03515625, 0.11328125, 0.43359375,
     0.43359375, 0.11328125, -0.03515625, -0.01171875]
)


def _fir_weight(C, scale=1.0):
    w = torch.zeros(C, C, 8)
    idx = torch.arange(C)
    w[idx, idx] = _CUBIC * scale
    return w


def _t_fir_down(x):  # [B, C, L] -> [B, C, L//2]
    x = torch.nn.functional.pad(x, (3, 3), mode="reflect")
    return torch.nn.functional.conv1d(x, _fir_weight(x.shape[1]), stride=2)


def _t_fir_up(x):  # [B, C, L] -> [B, C, 2L]
    L0 = x.shape[-1]
    x = torch.nn.functional.pad(x, (2, 2), mode="reflect")
    out = torch.nn.functional.conv_transpose1d(x, _fir_weight(x.shape[1], 2.0), stride=2)
    start = (out.shape[-1] - 2 * L0) // 2
    return out[..., start : start + 2 * L0]


class _TBlock(torch.nn.Module):
    def __init__(self, cin, cout, up):
        super().__init__()
        mid = cin if up else cout
        self.resnets = torch.nn.ModuleList(
            [_TResConv(cin if up else cin, mid, mid), _TResConv(mid, mid, mid),
             _TResConv(mid, mid, cout)]
        )
        self.up = up

    def forward(self, x):
        if not self.up:
            x = _t_fir_down(x)
        for r in self.resnets:
            x = r(x)
        if self.up:
            x = _t_fir_up(x)
        return x


class _TMid(torch.nn.Module):
    def __init__(self, c):
        super().__init__()
        heads = max(1, c // 32)
        self.resnets = torch.nn.ModuleList([_TResConv(c, c, c) for _ in range(6)])
        self.attentions = torch.nn.ModuleList([_TAttn1d(c, heads) for _ in range(6)])

    def forward(self, x):
        for r, a in zip(self.resnets, self.attentions):
            x = a(r(x))
        return x


class _TEdgeVAE(torch.nn.Module):
    """Reference-shaped custom 1D KL-VAE (network.py:86-299,316-687) at
    test width, state-dict keys matching the released checkpoints."""

    def __init__(self, ch=(32, 64, 64), latent=3):
        super().__init__()
        enc = torch.nn.Module()
        enc.conv_in = torch.nn.Conv1d(3, ch[0], 3, padding=1)
        blocks = []
        prev = ch[0]
        for c in ch:
            blocks.append(_TBlock(prev, c, up=False))
            prev = c
        enc.down_blocks = torch.nn.ModuleList(blocks)
        enc.mid_block = _TMid(ch[-1])
        enc.conv_norm_out = torch.nn.GroupNorm(min(32, ch[-1]), ch[-1], eps=1e-6)
        enc.conv_out = torch.nn.Conv1d(ch[-1], 2 * latent, 3, padding=1)
        self.encoder = enc

        dec = torch.nn.Module()
        rev = list(reversed(ch))
        dec.conv_in = torch.nn.Conv1d(latent, rev[0], 3, padding=1)
        dec.mid_block = _TMid(rev[0])
        blocks = []
        prev = rev[0]
        for c in rev:
            blocks.append(_TBlock(prev, c, up=True))
            prev = c
        dec.up_blocks = torch.nn.ModuleList(blocks)
        dec.conv_norm_out = torch.nn.GroupNorm(min(32, rev[-1]), rev[-1], eps=1e-6)
        dec.conv_out = torch.nn.Conv1d(rev[-1], 3, 3, padding=1)
        self.decoder = dec

        self.quant_conv = torch.nn.Conv1d(2 * latent, 2 * latent, 1)
        self.post_quant_conv = torch.nn.Conv1d(latent, latent, 1)

    def encode_moments(self, x):  # [B, 3, L] -> [B, 6, L/8]
        h = self.encoder.conv_in(x)
        for b in self.encoder.down_blocks:
            h = b(h)
        h = self.encoder.mid_block(h)
        h = torch.nn.functional.silu(self.encoder.conv_norm_out(h))
        return self.quant_conv(self.encoder.conv_out(h))

    def decode(self, z):  # [B, 3, L/8] -> [B, 3, L]
        h = self.decoder.conv_in(self.post_quant_conv(z))
        h = self.decoder.mid_block(h)
        for b in self.decoder.up_blocks:
            h = b(h)
        h = torch.nn.functional.silu(self.decoder.conv_norm_out(h))
        return self.decoder.conv_out(h)


def test_full_edge_vae_matches_torch():
    """Full EdgeVAE converter round-trip (VERDICT round-1 item 5): encode
    moments AND decode output parity <= 1e-4 vs the torch-built model."""
    import jax.numpy as jnp

    from brepgen_tpu.nn import EdgeVAE
    from brepgen_tpu.tools.convert_torch import convert_edge_vae

    torch.manual_seed(2)
    tvae = _TEdgeVAE().eval()
    x = torch.randn(2, 3, 32)
    with torch.no_grad():
        moments = tvae.encode_moments(x)
        z = moments[:, :3]
        recon = tvae.decode(z)

    sd = {k: v.numpy() for k, v in tvae.state_dict().items()}
    params = convert_edge_vae(sd)

    ours = EdgeVAE(block_out_channels=(32, 64, 64))
    xj = jnp.asarray(x.numpy().transpose(0, 2, 1))  # NCL -> NLC
    post = ours.apply(params, xj, method=EdgeVAE.encode)
    got_moments = np.concatenate(
        [np.asarray(post.mean), np.asarray(post.logvar)], axis=-1
    )
    want_moments = np.asarray(moments).transpose(0, 2, 1)
    np.testing.assert_allclose(got_moments, want_moments, rtol=1e-4, atol=1e-4)

    got_recon = ours.apply(
        params, jnp.asarray(np.asarray(z).transpose(0, 2, 1)), method=EdgeVAE.decode
    )
    np.testing.assert_allclose(
        np.asarray(got_recon), np.asarray(recon).transpose(0, 2, 1),
        rtol=1e-4, atol=1e-4,
    )


class _TResnet2D(torch.nn.Module):
    """diffusers ResnetBlock2D semantics (norm-silu-conv twice, 1x1 skip)."""

    def __init__(self, cin, cout):
        super().__init__()
        self.norm1 = torch.nn.GroupNorm(min(32, cin), cin, eps=1e-6)
        self.conv1 = torch.nn.Conv2d(cin, cout, 3, padding=1)
        self.norm2 = torch.nn.GroupNorm(min(32, cout), cout, eps=1e-6)
        self.conv2 = torch.nn.Conv2d(cout, cout, 3, padding=1)
        if cin != cout:
            self.conv_shortcut = torch.nn.Conv2d(cin, cout, 1)

    def forward(self, x):
        h = self.conv1(torch.nn.functional.silu(self.norm1(x)))
        h = self.conv2(torch.nn.functional.silu(self.norm2(h)))
        if hasattr(self, "conv_shortcut"):
            x = self.conv_shortcut(x)
        return x + h


class _TAttn2D(torch.nn.Module):
    """diffusers VAE mid-block Attention: single head over channels."""

    def __init__(self, c):
        super().__init__()
        self.group_norm = torch.nn.GroupNorm(min(32, c), c, eps=1e-6)
        self.to_q = torch.nn.Linear(c, c)
        self.to_k = torch.nn.Linear(c, c)
        self.to_v = torch.nn.Linear(c, c)
        self.to_out = torch.nn.ModuleList([torch.nn.Linear(c, c)])

    def forward(self, x):  # [B, C, H, W]
        B, C, H, W = x.shape
        h = self.group_norm(x).reshape(B, C, H * W).transpose(1, 2)
        q, k, v = self.to_q(h), self.to_k(h), self.to_v(h)
        w = torch.softmax(q @ k.transpose(-1, -2) / C**0.5, dim=-1)
        h = self.to_out[0](w @ v).transpose(1, 2).reshape(B, C, H, W)
        return x + h


class _TMid2D(torch.nn.Module):
    def __init__(self, c):
        super().__init__()
        self.resnets = torch.nn.ModuleList([_TResnet2D(c, c), _TResnet2D(c, c)])
        self.attentions = torch.nn.ModuleList([_TAttn2D(c)])

    def forward(self, x):
        x = self.resnets[0](x)
        x = self.attentions[0](x)
        return self.resnets[1](x)


class _TDown2D(torch.nn.Module):
    def __init__(self, cin, cout, last):
        super().__init__()
        self.resnets = torch.nn.ModuleList([_TResnet2D(cin, cout), _TResnet2D(cout, cout)])
        if not last:
            mod = torch.nn.Module()
            mod.conv = torch.nn.Conv2d(cout, cout, 3, stride=2)
            self.downsamplers = torch.nn.ModuleList([mod])

    def forward(self, x):
        for r in self.resnets:
            x = r(x)
        if hasattr(self, "downsamplers"):
            x = torch.nn.functional.pad(x, (0, 1, 0, 1))
            x = self.downsamplers[0].conv(x)
        return x


class _TUp2D(torch.nn.Module):
    def __init__(self, cin, cout, last):
        super().__init__()
        self.resnets = torch.nn.ModuleList(
            [_TResnet2D(cin, cout), _TResnet2D(cout, cout), _TResnet2D(cout, cout)]
        )
        if not last:
            mod = torch.nn.Module()
            mod.conv = torch.nn.Conv2d(cout, cout, 3, padding=1)
            self.upsamplers = torch.nn.ModuleList([mod])

    def forward(self, x):
        for r in self.resnets:
            x = r(x)
        if hasattr(self, "upsamplers"):
            x = torch.nn.functional.interpolate(x, scale_factor=2.0, mode="nearest")
            x = self.upsamplers[0].conv(x)
        return x


class _TSurfVAE(torch.nn.Module):
    """diffusers-AutoencoderKL-shaped 2D KL-VAE (reference trainer.py:20-30)
    at test width, state-dict keys matching the released checkpoints."""

    def __init__(self, ch=(32, 32, 64, 64), latent=3):
        super().__init__()
        enc = torch.nn.Module()
        enc.conv_in = torch.nn.Conv2d(3, ch[0], 3, padding=1)
        blocks, prev = [], ch[0]
        for i, c in enumerate(ch):
            blocks.append(_TDown2D(prev, c, last=i == len(ch) - 1))
            prev = c
        enc.down_blocks = torch.nn.ModuleList(blocks)
        enc.mid_block = _TMid2D(ch[-1])
        enc.conv_norm_out = torch.nn.GroupNorm(min(32, ch[-1]), ch[-1], eps=1e-6)
        enc.conv_out = torch.nn.Conv2d(ch[-1], 2 * latent, 3, padding=1)
        self.encoder = enc

        dec = torch.nn.Module()
        rev = list(reversed(ch))
        dec.conv_in = torch.nn.Conv2d(latent, rev[0], 3, padding=1)
        dec.mid_block = _TMid2D(rev[0])
        blocks, prev = [], rev[0]
        for i, c in enumerate(rev):
            blocks.append(_TUp2D(prev, c, last=i == len(rev) - 1))
            prev = c
        dec.up_blocks = torch.nn.ModuleList(blocks)
        dec.conv_norm_out = torch.nn.GroupNorm(min(32, rev[-1]), rev[-1], eps=1e-6)
        dec.conv_out = torch.nn.Conv2d(rev[-1], 3, 3, padding=1)
        self.decoder = dec

        self.quant_conv = torch.nn.Conv2d(2 * latent, 2 * latent, 1)
        self.post_quant_conv = torch.nn.Conv2d(latent, latent, 1)

    def encode_moments(self, x):
        h = self.encoder.conv_in(x)
        for b in self.encoder.down_blocks:
            h = b(h)
        h = self.encoder.mid_block(h)
        h = torch.nn.functional.silu(self.encoder.conv_norm_out(h))
        return self.quant_conv(self.encoder.conv_out(h))

    def decode(self, z):
        h = self.decoder.conv_in(self.post_quant_conv(z))
        h = self.decoder.mid_block(h)
        for b in self.decoder.up_blocks:
            h = b(h)
        h = torch.nn.functional.silu(self.decoder.conv_norm_out(h))
        return self.decoder.conv_out(h)


def test_full_surf_vae_matches_torch():
    """Full SurfVAE converter round-trip: encode moments AND decode output
    parity <= 1e-4 vs the diffusers-shaped torch model."""
    import jax.numpy as jnp

    from brepgen_tpu.nn import SurfVAE

    torch.manual_seed(3)
    tvae = _TSurfVAE().eval()
    x = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        moments = tvae.encode_moments(x)
        z = moments[:, :3]
        recon = tvae.decode(z)

    sd = {k: v.numpy() for k, v in tvae.state_dict().items()}
    from brepgen_tpu.tools.convert_torch import convert_surf_vae

    params = convert_surf_vae(sd)

    ours = SurfVAE(block_out_channels=(32, 32, 64, 64))
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))  # NCHW -> NHWC
    post = ours.apply(params, xj, method=SurfVAE.encode)
    got_moments = np.concatenate(
        [np.asarray(post.mean), np.asarray(post.logvar)], axis=-1
    )
    want_moments = np.asarray(moments).transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got_moments, want_moments, rtol=1e-4, atol=1e-4)

    got_recon = ours.apply(
        params, jnp.asarray(np.asarray(z).transpose(0, 2, 3, 1)), method=SurfVAE.decode
    )
    np.testing.assert_allclose(
        np.asarray(got_recon), np.asarray(recon).transpose(0, 2, 3, 1),
        rtol=1e-4, atol=1e-4,
    )


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
