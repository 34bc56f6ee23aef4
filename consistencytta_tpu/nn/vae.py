"""AudioLDM mel-latent VAE (AutoencoderKL) in flax/NHWC.

Architecture parity with reference audioldm/variational_autoencoder/
{autoencoder.py, modules.py, distributions.py}: conv stacks with ch=128,
ch_mult (1,2,4), 2 ResnetBlocks per level, a vanilla-attention mid block,
GroupNorm(32, eps 1e-6) + swish everywhere; mel [B, 1024, 64, 1] NHWC <->
latent [B, 256, 16, 8] via 4x spatial downsampling; `scale_factor` scaling of
the sampled latent (autoencoder.py:103-132).

The decoder optionally carries EMA copies of (decoder, post_quant_conv) for
the stage-3 fine-tuned checkpoints (audio_consistency_model_ftvae.py:52-66) —
in this functional design those are simply a second params tree passed to
`decode`.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from consistencytta_tpu.configs import VAEConfig
from consistencytta_tpu.nn.layers import (
    GroupNorm,
    ParamSlot,
    asymmetric_pad_downsample,
    nearest_upsample_2d,
    swish,
)


class ResnetBlock(nn.Module):
    """VAE resnet block (modules.py:118-175); no time embedding (temb_ch=0)."""

    out_channels: int
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = GroupNorm(self.groups, 1e-6, name="norm1")(x)
        h = swish(h)
        h = nn.Conv(
            self.out_channels, (3, 3), padding=1, dtype=self.dtype,
            param_dtype=jnp.float32, name="conv1",
        )(h)
        h = GroupNorm(self.groups, 1e-6, name="norm2")(h)
        h = swish(h)
        h = nn.Conv(
            self.out_channels, (3, 3), padding=1, dtype=self.dtype,
            param_dtype=jnp.float32, name="conv2",
        )(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(
                self.out_channels, (1, 1), dtype=self.dtype,
                param_dtype=jnp.float32, name="nin_shortcut",
            )(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head vanilla spatial attention (modules.py:185-230).

    fp32 paths keep exact-parity HIGHEST-precision einsum math; bf16 runs on
    a TPU backend route through the Pallas flash kernel (the 4096-token
    logits tensor is [B, 4096, 4096] — the decode graph's biggest
    intermediate), with fp32 online softmax inside the kernel."""

    groups: int = 32
    use_flash: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from consistencytta_tpu.nn.attention import _on_tpu
        from consistencytta_tpu.ops.pallas_attention import (
            flash_self_attention,
            flash_supported,
        )

        b, h, w, c = x.shape
        hidden = GroupNorm(self.groups, 1e-6, name="norm")(x)
        # The three 1x1 projection convs run as ONE matmul against the
        # concatenated kernels — each output channel is the same dot
        # product (bit-identical), but `hidden` is read from HBM once
        # instead of three times. Param tree is unchanged (q/k/v conv
        # kernels + biases).
        wz = [
            ParamSlot((1, 1, c, c), bias=True, name=name)()
            for name in ("q", "k", "v")
        ]
        w_qkv = jnp.concatenate([w.reshape(c, c) for w, _ in wz], axis=1)
        b_qkv = jnp.concatenate([bias for _, bias in wz])
        qkv = hidden.astype(self.dtype).reshape(b, h * w, c) @ w_qkv.astype(
            self.dtype
        ) + b_qkv.astype(self.dtype)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        if (
            self.use_flash
            and self.dtype == jnp.bfloat16
            # the kernel's exact divisibility rules (see flash_supported) —
            # odd spatial extents fall back to the einsum path
            and flash_supported(h * w, c)
            and _on_tpu()
        ):
            out = flash_self_attention(q, k, v, scale=c**-0.5)
        else:
            # fp32 attention math regardless of compute dtype
            logits = jnp.einsum(
                "bqc,bkc->bqk", q.astype(jnp.float32), k.astype(jnp.float32),
                precision=jax.lax.Precision.HIGHEST,
            ) * (c ** -0.5)
            weights = jax.nn.softmax(logits, axis=-1)
            out = jnp.einsum(
                "bqk,bkc->bqc", weights, v.astype(jnp.float32),
                precision=jax.lax.Precision.HIGHEST,
            ).astype(x.dtype)
        out = out.reshape(b, h, w, c)
        out = nn.Conv(
            c, (1, 1), dtype=self.dtype, param_dtype=jnp.float32, name="proj_out"
        )(out)
        return x + out


class Encoder(nn.Module):
    """Mel image -> posterior moments (modules.py:419-543)."""

    config: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        ch = cfg.base_channels
        h = nn.Conv(
            ch, (3, 3), padding=1, dtype=self.dtype, param_dtype=jnp.float32,
            name="conv_in",
        )(x)

        num_levels = len(cfg.ch_mult)
        for i_level, mult in enumerate(cfg.ch_mult):
            for i_block in range(cfg.num_res_blocks):
                h = ResnetBlock(
                    ch * mult, cfg.norm_num_groups, dtype=self.dtype,
                    name=f"down_{i_level}_block_{i_block}",
                )(h)
            if i_level != num_levels - 1:
                h = asymmetric_pad_downsample(h)
                h = nn.Conv(
                    h.shape[-1], (3, 3), strides=2, padding="VALID",
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name=f"down_{i_level}_downsample",
                )(h)

        block_in = ch * cfg.ch_mult[-1]
        h = ResnetBlock(block_in, cfg.norm_num_groups, dtype=self.dtype, name="mid_block_1")(h)
        h = AttnBlock(cfg.norm_num_groups, use_flash=cfg.use_flash_attention, dtype=self.dtype, name="mid_attn_1")(h)
        h = ResnetBlock(block_in, cfg.norm_num_groups, dtype=self.dtype, name="mid_block_2")(h)

        h = GroupNorm(cfg.norm_num_groups, cfg.norm_eps, name="norm_out")(h)
        h = swish(h)
        out_ch = 2 * cfg.z_channels if cfg.double_z else cfg.z_channels
        h = nn.Conv(
            out_ch, (3, 3), padding=1, dtype=self.dtype, param_dtype=jnp.float32,
            name="conv_out",
        )(h)
        return h


class Decoder(nn.Module):
    """Latent -> mel image (modules.py:546-683)."""

    config: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        ch = cfg.base_channels
        num_levels = len(cfg.ch_mult)
        block_in = ch * cfg.ch_mult[-1]

        h = nn.Conv(
            block_in, (3, 3), padding=1, dtype=self.dtype, param_dtype=jnp.float32,
            name="conv_in",
        )(z)
        h = ResnetBlock(block_in, cfg.norm_num_groups, dtype=self.dtype, name="mid_block_1")(h)
        h = AttnBlock(cfg.norm_num_groups, use_flash=cfg.use_flash_attention, dtype=self.dtype, name="mid_attn_1")(h)
        h = ResnetBlock(block_in, cfg.norm_num_groups, dtype=self.dtype, name="mid_block_2")(h)

        for i_level in reversed(range(num_levels)):
            block_out = ch * cfg.ch_mult[i_level]
            for i_block in range(cfg.num_res_blocks + 1):
                h = ResnetBlock(
                    block_out, cfg.norm_num_groups, dtype=self.dtype,
                    name=f"up_{i_level}_block_{i_block}",
                )(h)
            if i_level != 0:
                h = nearest_upsample_2d(h)
                h = nn.Conv(
                    h.shape[-1], (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=jnp.float32, name=f"up_{i_level}_upsample",
                )(h)

        h = GroupNorm(cfg.norm_num_groups, cfg.norm_eps, name="norm_out")(h)
        h = swish(h)
        h = nn.Conv(
            cfg.out_channels, (3, 3), padding=1, dtype=self.dtype,
            param_dtype=jnp.float32, name="conv_out",
        )(h)
        return h


class DiagonalGaussian:
    """Posterior over latents (distributions.py): moments -> mean/logvar
    (clamped [-30, 20]), sample/mode/kl."""

    def __init__(self, moments: jax.Array):
        mean, logvar = jnp.split(moments, 2, axis=-1)
        self.mean = mean
        self.logvar = jnp.clip(logvar, -30.0, 20.0)
        self.std = jnp.exp(0.5 * self.logvar)

    def sample(self, rng: jax.Array) -> jax.Array:
        noise = jax.random.normal(rng, self.mean.shape, self.mean.dtype)
        return self.mean + self.std * noise

    def mode(self) -> jax.Array:
        return self.mean

    def kl(self) -> jax.Array:
        var = jnp.exp(self.logvar)
        return 0.5 * jnp.sum(
            self.mean**2 + var - 1.0 - self.logvar,
            axis=tuple(range(1, self.mean.ndim)),
        )


class AutoencoderKL(nn.Module):
    """Encoder + quant convs + Decoder. The HiFi-GAN vocoder, owned by the
    reference VAE object (autoencoder.py:41), is a separate module here
    (consistencytta_tpu.nn.hifigan) wired together by the pipeline.

    Methods mirror the reference surface:
      encode_moments  = encode().moments (autoencoder.py:80-85)
      decode          = post_quant_conv -> decoder (autoencoder.py:91-101)
      decode_first_stage = / scale_factor then decode (autoencoder.py:103-106)
      encode_to_latent = scale_factor * sample (get_first_stage_encoding,
                         autoencoder.py:123-132)
    """

    config: VAEConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.config
        self.encoder = Encoder(cfg, dtype=self.dtype, name="encoder")
        self.decoder = Decoder(cfg, dtype=self.dtype, name="decoder")
        self.quant_conv = nn.Conv(
            2 * cfg.embed_dim, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
            name="quant_conv",
        )
        self.post_quant_conv = nn.Conv(
            cfg.z_channels, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
            name="post_quant_conv",
        )

    def encode_moments(self, x: jax.Array) -> jax.Array:
        """mel image [B, T, F, 1] -> posterior moments [B, T/4, F/4, 2*z]."""
        return self.quant_conv(self.encoder(x))

    def decode(self, z: jax.Array) -> jax.Array:
        """unscaled latent [B, t, f, z] -> mel image [B, T, F, 1]."""
        return self.decoder(self.post_quant_conv(z))

    def decode_first_stage(self, z_scaled: jax.Array) -> jax.Array:
        """scaled latent -> mel image (divides by scale_factor first)."""
        return self.decode(z_scaled / self.config.scale_factor)

    def encode_to_latent(self, x: jax.Array, rng: jax.Array) -> jax.Array:
        """mel image -> scaled sampled latent (training path:
        get_first_stage_encoding(encode_first_stage(mel)))."""
        posterior = DiagonalGaussian(self.encode_moments(x))
        return self.config.scale_factor * posterior.sample(rng)

    def __call__(self, x: jax.Array, rng: jax.Array):
        moments = self.encode_moments(x)
        posterior = DiagonalGaussian(moments)
        z = posterior.sample(rng)
        return self.decode(z), posterior
