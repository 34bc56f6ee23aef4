"""Flash self-attention kernel: parity vs the einsum oracle.

CPU tier runs the kernel in interpreter mode; the module-level integration
check verifies the Attention module's flash gating (flash only for unmasked
bf16 self-attention on TPU backends — on this CPU suite it must stay on the
einsum path and stay bit-identical to use_flash=False).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from consistencytta_tpu.nn.attention import Attention
from consistencytta_tpu.ops.pallas_attention import (
    attention_reference,
    flash_mha_packed,
    flash_self_attention,
)


@pytest.mark.parametrize("b,h,s,d_true", [(2, 5, 512, 51), (1, 3, 256, 64)])
def test_flash_packed_matches_unpacked_fold(b, h, s, d_true):
    """The packed [B,S,H*D] kernel must match folding to [B*H,S,D] and
    running the per-head oracle — same online softmax, head on the grid."""
    d = -(-d_true // 64) * 64
    rng = np.random.default_rng(3)
    q = rng.standard_normal((b, s, h * d)).astype(np.float32)
    k = rng.standard_normal((b, s, h * d)).astype(np.float32)
    v = rng.standard_normal((b, s, h * d)).astype(np.float32)
    for arr in (q, k):  # zero the per-head pad columns like the module does
        arr.reshape(b, s, h, d)[..., d_true:] = 0.0
    scale = d_true**-0.5

    out = flash_mha_packed(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), h, scale,
        block_q=256, block_k=256, interpret=True,
    )

    fold = lambda t: jnp.asarray(
        t.reshape(b, s, h, d).transpose(0, 2, 1, 3).reshape(b * h, s, d)
    )
    ref = attention_reference(fold(q), fold(k), fold(v), scale)
    ref = np.asarray(ref).reshape(b, h, s, d).transpose(0, 2, 1, 3).reshape(
        b, s, h * d
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=2e-5)


def test_flash_packed_grads_match_autodiff_reference():
    rng = np.random.default_rng(4)
    b, h, s, d = 1, 2, 256, 64
    q = jnp.asarray(rng.standard_normal((b, s, h * d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, h * d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, h * d)), jnp.float32)
    scale = 51**-0.5

    def f(q, k, v):
        out = flash_mha_packed(q, k, v, h, scale, interpret=True)
        return jnp.sum(out * jnp.cos(out))

    def r(q, k, v):
        fold = lambda t: (
            t.reshape(b, s, h, d).transpose(0, 2, 1, 3).reshape(b * h, s, d)
        )
        out = attention_reference(fold(q), fold(k), fold(v), scale)
        out = out.reshape(b, h, s, d).transpose(0, 2, 1, 3).reshape(b, s, h * d)
        return jnp.sum(out * jnp.cos(out))

    gf = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(r, argnums=(0, 1, 2))(q, k, v)
    for a, bb in zip(gf, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(bb), atol=1e-4, rtol=1e-4
        )


@pytest.mark.parametrize(
    "bh,s,d_true",
    # 256 exercises the d >= 128 lane-tiling branch of the kernel's
    # stat broadcast (jnp.tile instead of a [:, :d] slice) — the VAE
    # mid-block runs single-head d=512 through the same code path
    [(4, 512, 51), (2, 1024, 51), (3, 256, 64), (2, 256, 256)],
)
def test_flash_matches_reference_interpret(bh, s, d_true):
    d = -(-d_true // 64) * 64
    rng = np.random.default_rng(0)
    q = rng.standard_normal((bh, s, d)).astype(np.float32)
    k = rng.standard_normal((bh, s, d)).astype(np.float32)
    v = rng.standard_normal((bh, s, d)).astype(np.float32)
    q[..., d_true:] = 0.0
    k[..., d_true:] = 0.0
    scale = d_true**-0.5

    out = flash_self_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale,
        block_q=256, block_k=256, interpret=True,
    )
    ref = attention_reference(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_flash_bf16_inputs_interpret():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((2, 512, 64)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((2, 512, 64)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((2, 512, 64)), jnp.bfloat16)
    scale = 51**-0.5
    out = flash_self_attention(q, k, v, scale, interpret=True)
    ref = attention_reference(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32), scale
    )
    assert out.dtype == jnp.bfloat16
    err = np.max(np.abs(np.asarray(out, np.float32) - np.asarray(ref)))
    assert err < 0.05  # bf16 v-matmul rounding


def test_attention_module_flash_gating_cpu_identical():
    """On the CPU test backend the flash branch must not trigger; the module
    with use_flash on/off must produce bit-identical outputs."""
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 256, 255), jnp.bfloat16)
    mod_on = Attention(5, 51, 255, use_flash=True, dtype=jnp.bfloat16)
    mod_off = Attention(5, 51, 255, use_flash=False, dtype=jnp.bfloat16)
    params = mod_on.init(rng, x)
    out_on = mod_on.apply(params, x)
    out_off = mod_off.apply(params, x)
    np.testing.assert_array_equal(np.asarray(out_on), np.asarray(out_off))


def test_flash_grads_match_autodiff_reference():
    """The custom VJP (flash fwd, analytic bwd) must match jax autodiff of
    the einsum oracle. Runs in interpreter mode on the CPU test backend,
    where fp32 matmuls are exact."""
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.standard_normal((2, 256, 64)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((2, 256, 64)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((2, 256, 64)), jnp.float32)
    scale = 51**-0.5

    def f(q, k, v):
        out = flash_self_attention(q, k, v, scale, interpret=True)
        return jnp.sum(out * jnp.cos(out))  # non-trivial cotangent

    def r(q, k, v):
        out = attention_reference(q, k, v, scale).astype(jnp.float32)
        return jnp.sum(out * jnp.cos(out))

    gf = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(r, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)


def test_flash_rejects_bad_shapes():
    q = jnp.zeros((1, 300, 64), jnp.float32)
    with pytest.raises(ValueError):
        flash_self_attention(q, q, q, 1.0, interpret=True)
    q = jnp.zeros((1, 256, 51), jnp.float32)
    with pytest.raises(ValueError):
        flash_self_attention(q, q, q, 1.0, interpret=True)
