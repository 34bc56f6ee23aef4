"""Timestep / guidance-weight embeddings for the UNet.

Parity targets: reference diffusers/models/embeddings.py —
get_timestep_embedding (:25-66), GaussianFourierProjection (:222-249),
TimestepEmbedding MLP (:158-203). The guided UNet embeds the CFG guidance
weight w with a Gaussian-Fourier projection exactly like a timestep
(unet_2d_condition_guided.py:257-302).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn


def sinusoidal_embedding(
    timesteps: jax.Array,
    embedding_dim: int,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    max_period: float = 10000.0,
) -> jax.Array:
    """[B] -> [B, embedding_dim] DDPM sinusoidal embedding, float32."""
    half_dim = embedding_dim // 2
    exponent = -math.log(max_period) * jnp.arange(half_dim, dtype=jnp.float32)
    exponent = exponent / (half_dim - downscale_freq_shift)
    emb = timesteps.astype(jnp.float32)[:, None] * jnp.exp(exponent)[None, :]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
    if flip_sin_to_cos:
        emb = jnp.concatenate([emb[:, half_dim:], emb[:, :half_dim]], axis=-1)
    return emb


class GaussianFourierProjection(nn.Module):
    """Random-Fourier feature projection with a frozen N(0, scale) weight.

    Reference config: embedding_size = dim // 2, set_W_to_weight=False,
    log=False, flip_sin_to_cos=True (unet_2d_condition_guided.py:272-274).
    The weight is a non-trainable parameter imported from checkpoints.
    """

    embedding_size: int
    scale: float = 1.0
    flip_sin_to_cos: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        weight = self.param(
            "weight",
            nn.initializers.normal(self.scale),
            (self.embedding_size,),
            jnp.float32,
        )
        # frozen: never receives gradient in training (optimizer masks), and
        # stop_gradient keeps the math graph honest regardless
        weight = jax.lax.stop_gradient(weight)
        x_proj = x.astype(jnp.float32)[:, None] * weight[None, :] * 2 * jnp.pi
        if self.flip_sin_to_cos:
            return jnp.concatenate([jnp.cos(x_proj), jnp.sin(x_proj)], axis=-1)
        return jnp.concatenate([jnp.sin(x_proj), jnp.cos(x_proj)], axis=-1)


class TimestepEmbedding(nn.Module):
    """linear -> silu -> linear MLP (embeddings.py:158-203)."""

    time_embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sample: jax.Array) -> jax.Array:
        h = nn.Dense(
            self.time_embed_dim, dtype=self.dtype, param_dtype=jnp.float32,
            name="linear_1",
        )(sample)
        h = jax.nn.silu(h)
        return nn.Dense(
            self.time_embed_dim, dtype=self.dtype, param_dtype=jnp.float32,
            name="linear_2",
        )(h)
