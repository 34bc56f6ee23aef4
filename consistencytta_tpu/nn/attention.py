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

from consistencytta_tpu.nn.layers import GroupNorm, LayerNorm, ParamSlot


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

    The q/k/v projections of a shared source are evaluated as ONE fused
    matmul against the concatenated kernels: each output column is the same
    dot product either way (bit-identical — a column's accumulation order
    only runs over the contraction axis), but the activation is read from
    HBM once instead of three times. Measured 3.16 ms -> ~1.3 ms per
    level-0 transformer block's projections on v5e.
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
        self_attn = encoder_hidden_states is None
        kv_source = hidden_states if self_attn else encoder_hidden_states

        c_q = hidden_states.shape[-1]
        c_kv = kv_source.shape[-1]
        wq = ParamSlot((c_q, inner), name="to_q")()
        wk = ParamSlot((c_kv, inner), name="to_k")()
        wv = ParamSlot((c_kv, inner), name="to_v")()

        x = hidden_states.astype(self.dtype)
        src = kv_source.astype(self.dtype)
        b, qlen, _ = x.shape
        klen = src.shape[1]

        from consistencytta_tpu.ops.pallas_attention import (
            flash_mha_packed,
            flash_supported,
        )

        # to_out declared param-only so the flash path can apply it against
        # the head-padded activation by inserting zero kernel ROWS at the pad
        # positions (zero rows contribute exactly zero — bit-identical to
        # unpadding first)
        w_out, b_out = ParamSlot((inner, self.out_dim), bias=True, name="to_out")()

        d_pad = -(-self.head_dim // 64) * 64
        if (
            self.use_flash
            and self_attn
            and mask_bias is None
            and self.dtype == jnp.bfloat16
            and qlen == klen
            # gate on the kernel's own divisibility rules (auto-shrunk
            # 128-multiple blocks), not a coarser s % 256 check — non-default
            # audio durations fall back to einsum instead of raising
            and flash_supported(qlen, d_pad)
            and _on_tpu()
        ):
            # Transpose-free flash path: the head zero-padding (51 -> 64)
            # lives in the projection WEIGHTS (zero columns -> exact-zero
            # padded features), the packed kernel consumes [B, S, H*64]
            # directly (head rides the grid), and `to_out` eats the padding
            # via zero kernel ROWS — no activation-sized pad, fold, or
            # unfold relayouts anywhere. Bit-identical to the unpacked
            # formulation (see flash_mha_packed's docstring).
            def head_pad_cols(w):
                w3 = w.reshape(c_q, self.heads, self.head_dim)
                w3 = jnp.pad(w3, ((0, 0), (0, 0), (0, d_pad - self.head_dim)))
                return w3.reshape(c_q, self.heads * d_pad)

            # softmax scale AND the base-2 conversion factor log2(e) folded
            # into the q projection weights (fp32 multiply before the bf16
            # cast): the kernel (which runs its softmax in base 2) then
            # skips its per-head [bq, bk] logit multiply pass — it is
            # VPU-bound, so element passes are what cost (PERF.md). The
            # natural softmax scale seen by the kernel API is ln 2, whose
            # product with the kernel's _LOG2E snaps to exactly 1.0.
            import math

            from consistencytta_tpu.ops.pallas_attention import _LOG2E

            w_qkv = jnp.concatenate(
                [
                    head_pad_cols(wq * (self.head_dim**-0.5 * _LOG2E)),
                    head_pad_cols(wk),
                    head_pad_cols(wv),
                ],
                axis=1,
            ).astype(self.dtype)
            qkv = x @ w_qkv  # [B, S, 3*H*d_pad]
            q, k, v = jnp.split(qkv, 3, axis=-1)
            out = flash_mha_packed(q, k, v, self.heads, scale=math.log(2.0))
            w_out_padded = jnp.pad(
                w_out.reshape(self.heads, self.head_dim, self.out_dim),
                ((0, 0), (0, d_pad - self.head_dim), (0, 0)),
            ).reshape(self.heads * d_pad, self.out_dim)
            return out @ w_out_padded.astype(self.dtype) + b_out.astype(
                self.dtype
            )

        if self_attn:
            qkv = x @ jnp.concatenate([wq, wk, wv], axis=1).astype(self.dtype)
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            q = x @ wq.astype(self.dtype)
            kv = src @ jnp.concatenate([wk, wv], axis=1).astype(self.dtype)
            k, v = jnp.split(kv, 2, axis=-1)
        q = q.reshape(b, qlen, self.heads, self.head_dim)
        k = k.reshape(b, klen, self.heads, self.head_dim)
        v = v.reshape(b, klen, self.heads, self.head_dim)

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
        return out @ w_out.astype(self.dtype) + b_out.astype(self.dtype)


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
