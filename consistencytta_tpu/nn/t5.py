"""T5 text encoder stack in flax (FLAN-T5-Large by default).

The reference uses HF `T5EncoderModel` as a frozen text encoder
(models/audio_distilled_model.py:96-106). This is a from-scratch JAX
implementation of the T5 v1.1 encoder architecture (RMSNorm, relative
position buckets, gated-gelu FF, no attention scaling) matching the HF torch
weights key-for-key via `consistencytta_tpu.io.torch_import.convert_t5`.

Design notes for TPU: the encoder runs once per batch (text is fixed-length
padded), entirely inside the jitted generate/train graphs; attention uses a
single additive bias combining the relative-position bias and the padding
mask, precomputed per layer-stack invocation.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from consistencytta_tpu.configs import T5Config


class RMSNorm(nn.Module):
    """T5 LayerNorm: no mean subtraction, no bias; fp32 statistics."""

    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x):
        orig_dtype = x.dtype
        scale = self.param(
            "scale", nn.initializers.ones, (x.shape[-1],), jnp.float32
        )
        x32 = x.astype(jnp.float32)
        var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
        out = x32 * jax.lax.rsqrt(var + self.epsilon) * scale
        return out.astype(orig_dtype)


def relative_position_bucket(
    relative_position: jax.Array, num_buckets: int = 32, max_distance: int = 128
) -> jax.Array:
    """Bidirectional T5 relative-position bucketing (HF t5 modeling)."""
    num_buckets //= 2
    ret = (relative_position > 0).astype(jnp.int32) * num_buckets
    n = jnp.abs(relative_position)

    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-6)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


class T5Attention(nn.Module):
    config: T5Config
    has_relative_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask_bias, position_bias):
        cfg = self.config
        inner = cfg.num_heads * cfg.d_kv
        dense = lambda feats, name: nn.Dense(
            feats, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
            name=name,
        )
        b, L, _ = x.shape
        q = dense(inner, "q")(x).reshape(b, L, cfg.num_heads, cfg.d_kv)
        k = dense(inner, "k")(x).reshape(b, L, cfg.num_heads, cfg.d_kv)
        v = dense(inner, "v")(x).reshape(b, L, cfg.num_heads, cfg.d_kv)

        # T5 does NOT scale by sqrt(d): scaling is folded into init
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)
        )
        logits = logits + position_bias + mask_bias
        probs = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, L, inner)
        return dense(cfg.d_model, "o")(out)


class T5Block(nn.Module):
    config: T5Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask_bias, position_bias):
        cfg = self.config
        h = RMSNorm(cfg.layer_norm_epsilon, name="attn_norm")(x)
        x = x + T5Attention(cfg, dtype=self.dtype, name="attn")(
            h, mask_bias, position_bias
        )

        h = RMSNorm(cfg.layer_norm_epsilon, name="ff_norm")(x)
        dense = lambda feats, name: nn.Dense(
            feats, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
            name=name,
        )
        if cfg.feed_forward_proj == "gated-gelu":
            # gelu here is tanh-approximated, matching HF NewGELUActivation
            gelu_in = dense(cfg.d_ff, "wi_0")(h)
            linear_in = dense(cfg.d_ff, "wi_1")(h)
            ff = jax.nn.gelu(
                gelu_in.astype(jnp.float32), approximate=True
            ).astype(self.dtype) * linear_in
        else:  # relu
            ff = jax.nn.relu(dense(cfg.d_ff, "wi")(h))
        return x + dense(cfg.d_model, "wo")(ff)


class _ScannedT5Block(nn.Module):
    """Scan body: (carry, mask_bias, position_bias) -> (carry, None)."""

    config: T5Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, carry, mask_bias, position_bias):
        y = T5Block(self.config, dtype=self.dtype, name="layer")(
            carry, mask_bias, position_bias
        )
        return y, None


class T5Encoder(nn.Module):
    """input_ids [B, L], attention_mask [B, L] -> hidden states [B, L, d]."""

    config: T5Config = T5Config()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jax.Array, attention_mask: jax.Array) -> jax.Array:
        cfg = self.config
        embedding = self.param(
            "token_embedding",
            nn.initializers.normal(1.0),
            (cfg.vocab_size, cfg.d_model),
            jnp.float32,
        )
        x = jnp.take(embedding, input_ids, axis=0).astype(self.dtype)

        L = input_ids.shape[1]
        pos = jnp.arange(L)
        rel = pos[None, :] - pos[:, None]  # memory - query
        buckets = relative_position_bucket(
            rel, cfg.relative_attention_num_buckets, cfg.relative_attention_max_distance
        )
        rel_embedding = self.param(
            "relative_attention_bias",
            nn.initializers.normal(1.0),
            (cfg.relative_attention_num_buckets, cfg.num_heads),
            jnp.float32,
        )
        # [L, L, H] -> [1, H, L, L]
        position_bias = jnp.take(rel_embedding, buckets, axis=0)
        position_bias = jnp.transpose(position_bias, (2, 0, 1))[None]

        mask_bias = jnp.where(
            attention_mask[:, None, None, :] > 0, 0.0, -1e9
        ).astype(jnp.float32)

        # scan over the 24 identical layers with stacked params: keeps the
        # HLO O(1) in depth (compile-time critical on TPU) and is the
        # idiomatic XLA formulation of a homogeneous transformer stack
        scan = nn.scan(
            _ScannedT5Block,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=cfg.num_layers,
            in_axes=(nn.broadcast, nn.broadcast),
        )
        x, _ = scan(cfg, self.dtype, name="blocks")(x, mask_bias, position_bias)

        x = RMSNorm(cfg.layer_norm_epsilon, name="final_norm")(x)
        return x.astype(jnp.float32)
