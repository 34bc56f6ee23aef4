"""Spatial transformer for the UNet: attention, GEGLU FF, transformer blocks.

Parity targets: reference diffusers/models/{attention.py, transformer_2d.py,
attention_processor.py}. Notable quirk preserved: the transformer inner dim
is num_heads * (channels // num_heads), which for the lightweight config is
255/510/1020 (non-divisible head split; see the LoRA 255/256 hidden-size hack
at models/audio_distilled_model.py:139-140) — linear proj_in/out map between
channel count and inner dim.

Attention math runs in float32 when `upcast` is set (the shipped config uses
upcast_attention=true), with a -10000 additive mask bias for padded text
tokens (unet_2d_condition_guided.py:792-795).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from consistencytta_tpu.nn.layers import GroupNorm, LayerNorm


def _on_tpu() -> bool:
    """True when the default backend is a TPU (incl. the axon dev tunnel)."""
    try:
        platform = jax.devices()[0].platform
    except RuntimeError:  # no backend at all (docs builds etc.)
        return False
    return platform in ("tpu", "axon")


class Attention(nn.Module):
    """Multi-head attention (diffusers Attention + AttnProcessor).

    to_q/to_k/to_v have no bias; to_out does. Softmax scale is
    head_dim ** -0.5.
    """

    heads: int
    head_dim: int
    out_dim: int  # == query dim (residual stream width)
    upcast: bool = True
    # strict_upcast stores the attention logits in fp32 even under bf16
    # compute (the reference's literal upcast). Off by default: the MXU
    # always accumulates in fp32, and storing the [*, Q, K] logits in bf16
    # cuts their HBM traffic in half — measured 3x faster per 4096-token
    # attention on v5e with <=0.1% probability deviation.
    strict_upcast: bool = False
    # use_flash routes unmasked self-attention through the Pallas flash
    # kernel (ops/pallas_attention.py) when running bf16 on a TPU backend:
    # no [*, Q, K] logits in HBM, fp32 online softmax. Exact-parity fp32
    # runs (tests) and cross-attention keep the einsum path.
    use_flash: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden_states: jax.Array,  # [B, Q, C]
        encoder_hidden_states: Optional[jax.Array] = None,  # [B, K, C_enc]
        mask_bias: Optional[jax.Array] = None,  # [B, 1, K] additive
    ) -> jax.Array:
        inner = self.heads * self.head_dim
        kv_source = (
            hidden_states if encoder_hidden_states is None else encoder_hidden_states
        )

        dense = lambda feats, name: nn.Dense(
            feats, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
            name=name,
        )
        q = dense(inner, "to_q")(hidden_states)
        k = dense(inner, "to_k")(kv_source)
        v = dense(inner, "to_v")(kv_source)

        b, qlen, _ = q.shape
        klen = k.shape[1]
        q = q.reshape(b, qlen, self.heads, self.head_dim)
        k = k.reshape(b, klen, self.heads, self.head_dim)
        v = v.reshape(b, klen, self.heads, self.head_dim)

        from consistencytta_tpu.ops.pallas_attention import (
            flash_self_attention,
            flash_supported,
        )

        d_pad = -(-self.head_dim // 64) * 64
        if (
            self.use_flash
            and encoder_hidden_states is None
            and mask_bias is None
            and self.dtype == jnp.bfloat16
            and qlen == klen
            # gate on the kernel's own divisibility rules (auto-shrunk
            # 128-multiple blocks), not a coarser s % 256 check — non-default
            # audio durations fall back to einsum instead of raising
            and flash_supported(qlen, d_pad)
            and _on_tpu()
        ):
            pad = ((0, 0), (0, 0), (0, 0), (0, d_pad - self.head_dim))
            fold = lambda t: (
                jnp.pad(t, pad)
                .transpose(0, 2, 1, 3)
                .reshape(b * self.heads, qlen, d_pad)
            )
            out = flash_self_attention(
                fold(q), fold(k), fold(v), scale=self.head_dim**-0.5
            )
            out = (
                out.reshape(b, self.heads, qlen, d_pad)[..., : self.head_dim]
                .transpose(0, 2, 1, 3)
                .reshape(b, qlen, inner)
            )
            return nn.Dense(
                self.out_dim, dtype=self.dtype, param_dtype=jnp.float32,
                name="to_out",
            )(out)

        # `upcast` semantics on TPU: fp32 MXU accumulation + fp32 softmax.
        # At module dtype float32 this is bit-identical to the reference's
        # fp32-upcast attention (parity tests run there); at bfloat16 the
        # logits are stored bf16 unless strict_upcast is set (see field).
        acc_dtype = (
            jnp.float32
            if (self.upcast and (self.dtype == jnp.float32 or self.strict_upcast))
            else self.dtype
        )
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk",
            q,
            k,
            preferred_element_type=acc_dtype,
        ) * (self.head_dim**-0.5)
        if mask_bias is not None:
            logits = logits + mask_bias[:, None, :, :].astype(logits.dtype)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(
            self.dtype
        )

        out = jnp.einsum(
            "bhqk,bkhd->bqhd", probs, v, preferred_element_type=acc_dtype
        ).astype(self.dtype).reshape(b, qlen, inner)
        return nn.Dense(
            self.out_dim, dtype=self.dtype, param_dtype=jnp.float32, name="to_out"
        )(out)


class GEGLU(nn.Module):
    """x W -> (h, gate) -> h * gelu(gate), exact gelu (attention.py:411-430)."""

    dim_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(
            self.dim_out * 2, dtype=self.dtype, param_dtype=jnp.float32,
            name="proj",
        )(x)
        h, gate = jnp.split(h, 2, axis=-1)
        # exact (erf) gelu in fp32 for parity with torch F.gelu
        gate32 = gate.astype(jnp.float32)
        return h * jax.nn.gelu(gate32, approximate=False).astype(h.dtype)


class FeedForward(nn.Module):
    """GEGLU(dim -> 4*dim) -> linear(4*dim -> dim) (attention.py:337-385)."""

    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = GEGLU(self.dim * self.mult, dtype=self.dtype, name="act")(x)
        return nn.Dense(
            self.dim, dtype=self.dtype, param_dtype=jnp.float32, name="proj_out"
        )(h)


class BasicTransformerBlock(nn.Module):
    """LayerNorm -> self-attn -> LayerNorm -> cross-attn -> LayerNorm -> FF,
    all with residuals (attention.py:177-335)."""

    dim: int
    heads: int
    head_dim: int
    upcast: bool = True
    strict_upcast: bool = False
    use_flash: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, encoder_hidden_states, encoder_mask_bias):
        h = LayerNorm(name="norm1")(x)
        x = x + Attention(
            self.heads, self.head_dim, self.dim, self.upcast,
            self.strict_upcast, self.use_flash, dtype=self.dtype, name="attn1",
        )(h)

        h = LayerNorm(name="norm2")(x)
        x = x + Attention(
            self.heads, self.head_dim, self.dim, self.upcast,
            self.strict_upcast, self.use_flash, dtype=self.dtype, name="attn2",
        )(h, encoder_hidden_states, encoder_mask_bias)

        h = LayerNorm(name="norm3")(x)
        return x + FeedForward(self.dim, dtype=self.dtype, name="ff")(h)


class Transformer2D(nn.Module):
    """Spatial transformer over NHWC feature maps with linear projection
    (transformer_2d.py:43-335, use_linear_projection=True path):
    GroupNorm(32, eps 1e-6) -> flatten tokens -> proj_in(C -> inner) ->
    blocks -> proj_out(inner -> C) -> unflatten -> + residual.
    """

    heads: int
    head_dim: int  # channels // heads
    num_layers: int = 1
    upcast: bool = True
    strict_upcast: bool = False
    use_flash: bool = True
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, encoder_hidden_states, encoder_mask_bias):
        b, h, w, c = x.shape
        inner = self.heads * self.head_dim
        residual = x

        tokens = GroupNorm(self.groups, 1e-6, name="norm")(x).reshape(b, h * w, c)
        tokens = nn.Dense(
            inner, dtype=self.dtype, param_dtype=jnp.float32, name="proj_in"
        )(tokens)
        for i in range(self.num_layers):
            tokens = BasicTransformerBlock(
                inner, self.heads, self.head_dim, self.upcast,
                self.strict_upcast, self.use_flash, dtype=self.dtype,
                name=f"block_{i}",
            )(tokens, encoder_hidden_states, encoder_mask_bias)
        tokens = nn.Dense(
            c, dtype=self.dtype, param_dtype=jnp.float32, name="proj_out"
        )(tokens)
        return tokens.reshape(b, h, w, c) + residual
