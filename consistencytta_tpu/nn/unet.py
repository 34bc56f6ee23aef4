"""CFG-guidance-conditioned 2-D cross-attention UNet in flax/NHWC.

The core novel network of ConsistencyTTA: a latent-diffusion UNet that embeds
the classifier-free-guidance weight w like a timestep (Gaussian-Fourier
projection -> MLP) and adds it to the timestep embedding feeding every
resnet block. Parity target: reference
diffusers/models/unet_2d_condition_guided.py (guidance machinery :257-302,
:801-827; forward :716-945) and unet_2d_blocks.py / resnet.py for the block
structure. Setting `config.guided=False` yields the plain teacher UNet
(unet_2d_condition.py), whose forward simply has no guidance term.

Latent layout is NHWC: [B, T=256, F=16, C=8].
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from consistencytta_tpu.configs import UNetConfig
from consistencytta_tpu.nn.attention import Transformer2D
from consistencytta_tpu.nn.embeddings import (
    GaussianFourierProjection,
    TimestepEmbedding,
    sinusoidal_embedding,
)
from consistencytta_tpu.nn.layers import GroupNorm, nearest_upsample_2d


class ResnetBlock2D(nn.Module):
    """Diffusers-style resnet block with time-embedding injection
    (resnet.py:418-596): GN(32, eps 1e-5) -> silu -> conv1 -> + temb_proj ->
    GN -> silu -> conv2 (+ 1x1 shortcut on channel change)."""

    out_channels: int
    eps: float = 1e-5
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb):
        h = GroupNorm(self.groups, self.eps, name="norm1")(x)
        h = jax.nn.silu(h)
        h = nn.Conv(
            self.out_channels, (3, 3), padding=1, dtype=self.dtype,
            param_dtype=jnp.float32, name="conv1",
        )(h)

        t = nn.Dense(
            self.out_channels, dtype=self.dtype, param_dtype=jnp.float32,
            name="time_emb_proj",
        )(jax.nn.silu(temb))
        h = h + t[:, None, None, :]

        h = GroupNorm(self.groups, self.eps, name="norm2")(h)
        h = jax.nn.silu(h)
        h = nn.Conv(
            self.out_channels, (3, 3), padding=1, dtype=self.dtype,
            param_dtype=jnp.float32, name="conv2",
        )(h)

        if x.shape[-1] != self.out_channels:
            x = nn.Conv(
                self.out_channels, (1, 1), dtype=self.dtype,
                param_dtype=jnp.float32, name="conv_shortcut",
            )(x)
        return x + h


class Downsample2D(nn.Module):
    """conv 3x3 stride 2 pad 1 (resnet.py Downsample2D, padding=1)."""

    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.channels, (3, 3), strides=2, padding=1, dtype=self.dtype,
            param_dtype=jnp.float32, name="conv",
        )(x)


class Upsample2D(nn.Module):
    """nearest 2x + conv 3x3 pad 1 (resnet.py Upsample2D)."""

    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.channels, (3, 3), padding=1, dtype=self.dtype,
            param_dtype=jnp.float32, name="conv",
        )(nearest_upsample_2d(x))


class UNet2DConditionGuided(nn.Module):
    """The guided (student) / plain (teacher) UNet.

    __call__(sample, timestep, encoder_hidden_states, encoder_attention_mask,
    guidance) -> velocity/noise prediction, same shape as sample.

    * timestep: [B] float32 (Heun uses fractional timesteps) or scalar.
    * guidance: [B] float32 or scalar; ignored when config.guided is False.
    * encoder_attention_mask: [B, K] bool/int (1 = keep); converted to a
      -10000 additive bias (unet_2d_condition_guided.py:792-795).
    """

    config: UNetConfig = UNetConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        sample: jax.Array,  # [B, H, W, C] NHWC
        timestep: jax.Array,
        encoder_hidden_states: jax.Array,  # [B, K, cross_dim]
        encoder_attention_mask: Optional[jax.Array] = None,
        guidance: Optional[jax.Array] = None,
    ) -> jax.Array:
        cfg = self.config
        b = sample.shape[0]
        compute = self.dtype

        timestep = jnp.broadcast_to(jnp.asarray(timestep, jnp.float32).reshape(-1), (b,))

        mask_bias = None
        if encoder_attention_mask is not None:
            mask_bias = (
                (1.0 - encoder_attention_mask.astype(jnp.float32)) * -10000.0
            )[:, None, :]

        # 1. time (+ guidance) embedding
        t_proj = sinusoidal_embedding(
            timestep, cfg.block_out_channels[0], cfg.flip_sin_to_cos, cfg.freq_shift
        ).astype(compute)
        emb = TimestepEmbedding(
            cfg.block_out_channels[0] * 4, dtype=compute, name="time_embedding"
        )(t_proj)

        if cfg.guided:
            if guidance is None:
                raise ValueError("guided UNet requires a guidance value")
            guidance = jnp.broadcast_to(
                jnp.asarray(guidance, jnp.float32).reshape(-1), (b,)
            )
            g_proj = GaussianFourierProjection(
                cfg.block_out_channels[0] * 2,  # half of 4*ch -> cat(cos,sin)
                flip_sin_to_cos=cfg.flip_sin_to_cos,
                name="guidance_proj",
            )(guidance).astype(compute)
            emb = emb + TimestepEmbedding(
                cfg.block_out_channels[0] * 4, dtype=compute,
                name="guidance_embedding",
            )(g_proj)

        encoder_hidden_states = encoder_hidden_states.astype(compute)
        sample = sample.astype(compute)

        # 2. conv_in
        h = nn.Conv(
            cfg.block_out_channels[0], (3, 3), padding=1, dtype=compute,
            param_dtype=jnp.float32, name="conv_in",
        )(sample)

        # 3. down blocks
        num_levels = cfg.num_levels
        skips = [h]
        for i, block_type in enumerate(cfg.down_block_types):
            out_ch = cfg.block_out_channels[i]
            has_attn = block_type == "CrossAttnDownBlock2D"
            heads = cfg.attention_head_dim[i]
            for j in range(cfg.layers_per_block):
                h = ResnetBlock2D(
                    out_ch, cfg.norm_eps, cfg.norm_num_groups, dtype=compute,
                    name=f"down_{i}_resnet_{j}",
                )(h, emb)
                if has_attn:
                    h = Transformer2D(
                        heads, out_ch // heads, upcast=cfg.upcast_attention,
                        strict_upcast=cfg.strict_upcast,
                        use_flash=cfg.use_flash_attention,
                        groups=cfg.norm_num_groups, dtype=compute,
                        name=f"down_{i}_attn_{j}",
                    )(h, encoder_hidden_states, mask_bias)
                skips.append(h)
            if i != num_levels - 1:
                h = Downsample2D(out_ch, dtype=compute, name=f"down_{i}_downsample")(h)
                skips.append(h)

        # 4. mid block
        mid_ch = cfg.block_out_channels[-1]
        mid_heads = cfg.attention_head_dim[-1]
        h = ResnetBlock2D(
            mid_ch, cfg.norm_eps, cfg.norm_num_groups, dtype=compute,
            name="mid_resnet_0",
        )(h, emb)
        h = Transformer2D(
            mid_heads, mid_ch // mid_heads, upcast=cfg.upcast_attention,
            strict_upcast=cfg.strict_upcast,
            use_flash=cfg.use_flash_attention, groups=cfg.norm_num_groups,
            dtype=compute, name="mid_attn_0",
        )(h, encoder_hidden_states, mask_bias)
        h = ResnetBlock2D(
            mid_ch, cfg.norm_eps, cfg.norm_num_groups, dtype=compute,
            name="mid_resnet_1",
        )(h, emb)

        # 5. up blocks (consume skips in reverse, layers_per_block+1 resnets)
        rev_channels = list(reversed(cfg.block_out_channels))
        rev_heads = list(reversed(cfg.attention_head_dim))
        for i, block_type in enumerate(cfg.up_block_types):
            out_ch = rev_channels[i]
            has_attn = block_type == "CrossAttnUpBlock2D"
            heads = rev_heads[i]
            for j in range(cfg.layers_per_block + 1):
                skip = skips.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = ResnetBlock2D(
                    out_ch, cfg.norm_eps, cfg.norm_num_groups, dtype=compute,
                    name=f"up_{i}_resnet_{j}",
                )(h, emb)
                if has_attn:
                    h = Transformer2D(
                        heads, out_ch // heads, upcast=cfg.upcast_attention,
                        strict_upcast=cfg.strict_upcast,
                        use_flash=cfg.use_flash_attention,
                        groups=cfg.norm_num_groups, dtype=compute,
                        name=f"up_{i}_attn_{j}",
                    )(h, encoder_hidden_states, mask_bias)
            if i != num_levels - 1:
                h = Upsample2D(out_ch, dtype=compute, name=f"up_{i}_upsample")(h)

        # 6. out
        h = GroupNorm(cfg.norm_num_groups, cfg.norm_eps, name="conv_norm_out")(h)
        h = jax.nn.silu(h)
        h = nn.Conv(
            cfg.out_channels, (3, 3), padding=1, dtype=compute,
            param_dtype=jnp.float32, name="conv_out",
        )(h)
        return h.astype(jnp.float32)
