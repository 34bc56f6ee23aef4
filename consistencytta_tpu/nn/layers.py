"""Shared NN building blocks (NHWC / NWC layouts, mixed-precision policy).

Layout convention: all modules are channels-last (NHWC for 2-D, NWC for 1-D)
— the native TPU/XLA convolution layout. Weight importers in
``consistencytta_tpu.io.torch_import`` transpose from the reference's NCHW.

Precision policy: parameters live in float32 (`param_dtype`), compute runs in
the module `dtype` (bfloat16 in production), and all normalization statistics
are computed in float32 regardless of compute dtype.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def swish(x):
    return x * jax.nn.sigmoid(x)


class GroupNorm(nn.Module):
    """GroupNorm with torch semantics (consecutive channel groups) and
    float32 statistics.

    Matches torch.nn.GroupNorm as used by the VAE (eps 1e-6,
    audioldm/variational_autoencoder/modules.py:38-41) and the UNet
    (eps 1e-5)."""

    num_groups: int
    epsilon: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        orig_dtype = x.dtype
        c = x.shape[-1]
        if c % self.num_groups != 0:
            raise ValueError(f"channels {c} not divisible by groups {self.num_groups}")
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)

        x32 = x.astype(jnp.float32)
        spatial = x32.shape[1:-1]
        grouped = x32.reshape(
            (x32.shape[0],) + spatial + (self.num_groups, c // self.num_groups)
        )
        axes = tuple(range(1, 1 + len(spatial))) + (grouped.ndim - 1,)
        mean = grouped.mean(axis=axes, keepdims=True)
        var = grouped.var(axis=axes, keepdims=True)
        normed = (grouped - mean) * jax.lax.rsqrt(var + self.epsilon)
        normed = normed.reshape(x32.shape)
        out = normed * scale + bias
        return out.astype(orig_dtype)


class LayerNorm(nn.Module):
    """LayerNorm over the last axis, float32 statistics."""

    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        orig_dtype = x.dtype
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        x32 = x.astype(jnp.float32)
        mean = x32.mean(axis=-1, keepdims=True)
        var = x32.var(axis=-1, keepdims=True)
        out = (x32 - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias
        return out.astype(orig_dtype)


def conv_transpose_1d(
    x: jax.Array, kernel: jax.Array, stride: int, padding: int
) -> jax.Array:
    """Exact torch ConvTranspose1d, channels-last.

    x: [B, W, C_in]; kernel: [K, C_out, C_in] (torch layout [C_in, C_out, K]
    transposed by the importer to [K, C_out, C_in]).
    Output width = (W - 1) * stride - 2 * padding + K, matching
    torch.nn.ConvTranspose1d used by the HiFi-GAN upsampler
    (audioldm/hifigan/models.py:85-89).

    Implemented as an input-dilated regular convolution with a spatially
    flipped kernel — the formulation XLA lowers natively on TPU.
    """
    k = kernel.shape[0]
    flipped = jnp.flip(kernel, axis=0)  # [K, C_out, C_in]
    pad = k - 1 - padding
    return jax.lax.conv_general_dilated(
        x,
        flipped,
        window_strides=(1,),
        padding=[(pad, pad)],
        lhs_dilation=(stride,),
        dimension_numbers=("NWC", "WOI", "NWC"),
    )


def nearest_upsample_2d(x: jax.Array, scale: int = 2) -> jax.Array:
    """Nearest-neighbor 2x upsampling, NHWC (torch F.interpolate nearest)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, scale, w, scale, c))
    return x.reshape(b, h * scale, w * scale, c)


def asymmetric_pad_downsample(x: jax.Array) -> jax.Array:
    """The VAE's asymmetric (0,1)x(0,1) pad before a stride-2 VALID conv
    (audioldm/variational_autoencoder/modules.py:87-94)."""
    return jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
