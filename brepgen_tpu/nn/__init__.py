from brepgen_tpu.nn.layers import sincos_embedding, MLPEmbedder, DiagonalGaussian
from brepgen_tpu.nn.transformer import TransformerEncoder
from brepgen_tpu.nn.denoiser import (
    DenoiserTransformer,
    make_surfpos_net,
    make_surfz_net,
    make_edgepos_net,
    make_edgez_net,
)
from brepgen_tpu.nn.vae2d import SurfVAE
from brepgen_tpu.nn.vae1d import EdgeVAE

__all__ = [
    "sincos_embedding",
    "MLPEmbedder",
    "DiagonalGaussian",
    "TransformerEncoder",
    "DenoiserTransformer",
    "make_surfpos_net",
    "make_surfz_net",
    "make_edgepos_net",
    "make_edgez_net",
    "SurfVAE",
    "EdgeVAE",
]
