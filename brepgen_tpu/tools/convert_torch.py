"""Convert reference PyTorch checkpoints (.pt state_dicts) to flax params.

Enables loading the released BrepGen weights (reference ``README.md:97-102``)
into this framework. Key layout of the source state_dicts:

  denoisers (reference ``network.py:1066-1393``): MLP stream embedders
  ``{p,z,surfp,surfz,edgep,edgez,vertp}_embed/...``, ``time_embed``,
  ``class_embed.embed``, a ``net`` = torch ``nn.TransformerEncoder`` (packed
  in_proj QKV, pre-LN, ReLU FFN, final ``net.norm``), and ``fc_out``;

  surface VAE: diffusers ``AutoencoderKL`` (Conv2d [O,I,H,W] -> flax
  [H,W,I,O]); edge VAE: the reference's custom 1D VAE (Conv1d [O,I,K] ->
  flax [K,I,O]).

Weight-transpose conventions: torch Linear stores [out, in]; flax Dense
kernels are [in, out].
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _t(w) -> np.ndarray:
    return np.asarray(w, np.float32).T


def _lin(sd, prefix):
    return {"kernel": _t(sd[f"{prefix}.weight"]), "bias": np.asarray(sd[f"{prefix}.bias"], np.float32)}


def _ln(sd, prefix):
    return {"scale": np.asarray(sd[f"{prefix}.weight"], np.float32),
            "bias": np.asarray(sd[f"{prefix}.bias"], np.float32)}


def _mlp(sd, prefix):
    """Reference embedder/head: Sequential(Linear, LayerNorm, SiLU, Linear)."""
    return {
        "fc1": _lin(sd, f"{prefix}.0"),
        "norm": _ln(sd, f"{prefix}.1"),
        "fc2": _lin(sd, f"{prefix}.3"),
    }


def convert_torch_encoder(sd: Dict, num_layers: int, prefix: str = "net") -> Dict:
    """torch nn.TransformerEncoder -> our TransformerEncoder param dict."""
    out = {}
    for i in range(num_layers):
        lp = f"{prefix}.layers.{i}"
        in_w = np.asarray(sd[f"{lp}.self_attn.in_proj_weight"], np.float32)  # [3d, d]
        in_b = np.asarray(sd[f"{lp}.self_attn.in_proj_bias"], np.float32)
        out[f"layer_{i}"] = {
            "norm1": _ln(sd, f"{lp}.norm1"),
            "norm2": _ln(sd, f"{lp}.norm2"),
            "attn": {
                "qkv": {"kernel": in_w.T, "bias": in_b},
                "proj": _lin(sd, f"{lp}.self_attn.out_proj"),
            },
            "fc1": _lin(sd, f"{lp}.linear1"),
            "fc2": _lin(sd, f"{lp}.linear2"),
        }
    out["final_norm"] = _ln(sd, f"{prefix}.norm")
    return out


# stream-embedder name mapping per stage: ours -> reference state_dict prefix
STREAM_MAPS = {
    "surfpos": {"surfpos_embed": "p_embed"},
    "surfz": {"surfz_embed": "z_embed", "surfpos_embed": "p_embed"},
    "edgepos": {
        "edgepos_embed": "edgep_embed",
        "surfpos_embed": "surfp_embed",
        "surfz_embed": "surfz_embed",
    },
    "edgez": {
        "edgez_embed": "edgez_embed",
        "vertpos_embed": "vertp_fc",
        "edgepos_embed": "edgep_embed",
        "surfpos_embed": "surfp_embed",
        "surfz_embed": "surfz_embed",
    },
}


def convert_denoiser(sd: Dict, stage: str, num_layers: int = 12) -> Dict:
    """Reference denoiser state_dict -> flax params {'params': ...}."""
    sd = {k.replace("module.", ""): v for k, v in sd.items()}
    params = {}
    for ours, theirs in STREAM_MAPS[stage].items():
        params[ours] = _mlp(sd, theirs)
    params["time_embed"] = _mlp(sd, "time_embed")
    params["head"] = _mlp(sd, "fc_out")
    params["encoder"] = convert_torch_encoder(sd, num_layers)
    if "class_embed.embed.weight" in sd:
        params["class_embed"] = {
            "embedding": np.asarray(sd["class_embed.embed.weight"], np.float32)
        }
    return {"params": params}


def _conv2d(sd, prefix):
    w = np.asarray(sd[f"{prefix}.weight"], np.float32)  # [O, I, H, W]
    return {"kernel": w.transpose(2, 3, 1, 0),
            "bias": np.asarray(sd[f"{prefix}.bias"], np.float32)}


def _conv1d(sd, prefix, bias=True):
    w = np.asarray(sd[f"{prefix}.weight"], np.float32)  # [O, I, K]
    out = {"kernel": w.transpose(2, 1, 0)}
    if bias:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"], np.float32)
    return out


def _gn(sd, prefix):
    return {"scale": np.asarray(sd[f"{prefix}.weight"], np.float32),
            "bias": np.asarray(sd[f"{prefix}.bias"], np.float32)}


def _resnet2d(sd, p):
    out = {
        "norm1": _gn(sd, f"{p}.norm1"),
        "conv1": _conv2d(sd, f"{p}.conv1"),
        "norm2": _gn(sd, f"{p}.norm2"),
        "conv2": _conv2d(sd, f"{p}.conv2"),
    }
    if f"{p}.conv_shortcut.weight" in sd:
        out["conv_shortcut"] = _conv2d(sd, f"{p}.conv_shortcut")
    return out


def _attn2d(sd, p):
    # diffusers Attention in VAE mid block: group_norm + to_q/k/v + to_out.0
    return {
        "norm": _gn(sd, f"{p}.group_norm"),
        "q": _lin(sd, f"{p}.to_q"),
        "k": _lin(sd, f"{p}.to_k"),
        "v": _lin(sd, f"{p}.to_v"),
        "proj": _lin(sd, f"{p}.to_out.0"),
    }


def _mid2d(sd, p):
    return {
        "res1": _resnet2d(sd, f"{p}.resnets.0"),
        "attn": _attn2d(sd, f"{p}.attentions.0"),
        "res2": _resnet2d(sd, f"{p}.resnets.1"),
    }


def convert_surf_vae(sd: Dict, n_blocks: int = 4, layers_per_block: int = 2) -> Dict:
    """diffusers AutoencoderKL state_dict -> our SurfVAE params.

    Handles full checkpoints and the Fast{En,De}code halves (missing halves
    are simply absent from the output; merge with an init template via
    ``merge_params`` before use).
    """
    sd = {k.replace("module.", ""): v for k, v in sd.items()}
    params = {}

    if "encoder.conv_in.weight" in sd:
        enc = {"conv_in": _conv2d(sd, "encoder.conv_in")}
        for i in range(n_blocks):
            for j in range(layers_per_block):
                enc[f"down{i}_res{j}"] = _resnet2d(sd, f"encoder.down_blocks.{i}.resnets.{j}")
            if i < n_blocks - 1:
                enc[f"down{i}_downsample"] = {
                    "conv": _conv2d(sd, f"encoder.down_blocks.{i}.downsamplers.0.conv")
                }
        enc["mid"] = _mid2d(sd, "encoder.mid_block")
        enc["norm_out"] = _gn(sd, "encoder.conv_norm_out")
        enc["conv_out"] = _conv2d(sd, "encoder.conv_out")
        params["encoder"] = enc
        params["quant_conv"] = _conv2d(sd, "quant_conv")

    if "decoder.conv_in.weight" in sd:
        dec = {"conv_in": _conv2d(sd, "decoder.conv_in")}
        dec["mid"] = _mid2d(sd, "decoder.mid_block")
        for i in range(n_blocks):
            for j in range(layers_per_block + 1):
                dec[f"up{i}_res{j}"] = _resnet2d(sd, f"decoder.up_blocks.{i}.resnets.{j}")
            if i < n_blocks - 1:
                dec[f"up{i}_upsample"] = {
                    "conv": _conv2d(sd, f"decoder.up_blocks.{i}.upsamplers.0.conv")
                }
        dec["norm_out"] = _gn(sd, "decoder.conv_norm_out")
        dec["conv_out"] = _conv2d(sd, "decoder.conv_out")
        params["decoder"] = dec
        params["post_quant_conv"] = _conv2d(sd, "post_quant_conv")

    return {"params": params}


def _resconv1d(sd, p):
    out = {
        "conv1": _conv1d(sd, f"{p}.conv_1"),
        "norm1": _gn(sd, f"{p}.group_norm_1"),
        "conv2": _conv1d(sd, f"{p}.conv_2"),
        "norm2": _gn(sd, f"{p}.group_norm_2"),
    }
    if f"{p}.conv_skip.weight" in sd:
        out["conv_skip"] = _conv1d(sd, f"{p}.conv_skip", bias=False)
    return out


def _attn1d(sd, p):
    return {
        "norm": _gn(sd, f"{p}.group_norm"),
        "q": _lin(sd, f"{p}.query"),
        "k": _lin(sd, f"{p}.key"),
        "v": _lin(sd, f"{p}.value"),
        "proj": _lin(sd, f"{p}.proj_attn"),
    }


def _mid1d(sd, p):
    out = {}
    for i in range(6):
        out[f"res{i}"] = _resconv1d(sd, f"{p}.resnets.{i}")
        out[f"attn{i}"] = _attn1d(sd, f"{p}.attentions.{i}")
    return out


def convert_edge_vae(sd: Dict, n_blocks: int = 3) -> Dict:
    """Reference custom 1D VAE state_dict -> our EdgeVAE params."""
    sd = {k.replace("module.", ""): v for k, v in sd.items()}
    params = {}

    if "encoder.conv_in.weight" in sd:
        enc = {"conv_in": _conv1d(sd, "encoder.conv_in")}
        for i in range(n_blocks):
            block = {}
            for j in range(3):
                block[f"res{j}"] = _resconv1d(sd, f"encoder.down_blocks.{i}.resnets.{j}")
            enc[f"down{i}"] = block
        enc["mid"] = _mid1d(sd, "encoder.mid_block")
        enc["norm_out"] = _gn(sd, "encoder.conv_norm_out")
        enc["conv_out"] = _conv1d(sd, "encoder.conv_out")
        params["encoder"] = enc
        params["quant_conv"] = _conv1d(sd, "quant_conv")

    if "decoder.conv_in.weight" in sd:
        dec = {"conv_in": _conv1d(sd, "decoder.conv_in")}
        dec["mid"] = _mid1d(sd, "decoder.mid_block")
        for i in range(n_blocks):
            block = {}
            for j in range(3):
                block[f"res{j}"] = _resconv1d(sd, f"decoder.up_blocks.{i}.resnets.{j}")
            dec[f"up{i}"] = block
        dec["norm_out"] = _gn(sd, "decoder.conv_norm_out")
        dec["conv_out"] = _conv1d(sd, "decoder.conv_out")
        params["decoder"] = dec
        params["post_quant_conv"] = _conv1d(sd, "post_quant_conv")

    return {"params": params}


def merge_params(template: Dict, partial: Dict) -> Dict:
    """Fill a converted partial param tree into an init template (for the
    Fast half-VAE checkpoints that only carry one side)."""
    import copy

    out = copy.deepcopy(template)

    def rec(dst, src):
        for k, v in src.items():
            if isinstance(v, dict):
                rec(dst[k], v)
            else:
                dst[k] = v

    rec(out, partial)
    return out


def main(argv=None):
    import argparse

    import torch

    from brepgen_tpu.train.checkpoint import save_params

    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help=".pt state_dict")
    p.add_argument("--kind", required=True,
                   choices=["surfpos", "surfz", "edgepos", "edgez", "surfvae", "edgevae"])
    p.add_argument("--output", required=True, help="orbax checkpoint dir")
    args = p.parse_args(argv)

    sd = torch.load(args.input, map_location="cpu")
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    if args.kind == "surfvae":
        params = convert_surf_vae(sd)
    elif args.kind == "edgevae":
        params = convert_edge_vae(sd)
    else:
        params = convert_denoiser(sd, args.kind)
    import os

    out_dir = os.path.dirname(os.path.abspath(args.output)) or "."
    save_params(out_dir, params, os.path.basename(args.output))
    print(f"converted {args.kind}: {args.input} -> {args.output}")


if __name__ == "__main__":
    main()
