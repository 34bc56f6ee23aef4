from consistencytta_tpu.nn.layers import GroupNorm, conv_transpose_1d
from consistencytta_tpu.nn.vae import AutoencoderKL, DiagonalGaussian
from consistencytta_tpu.nn.hifigan import HiFiGANGenerator

__all__ = [
    "GroupNorm",
    "conv_transpose_1d",
    "AutoencoderKL",
    "DiagonalGaussian",
    "HiFiGANGenerator",
]
