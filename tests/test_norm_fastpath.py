"""Single-pass normalization statistics fast path (nn/layers.py).

The production bf16/TPU path computes var = E[x^2] - mean^2 in one fused
read and folds the output into a per-channel affine. It is gated exactly
like the other bf16 fast paths — fp32/CPU runs keep the literal two-pass
reference formulation (torch GroupNorm/LayerNorm semantics, parity-tested
in test_unet.py / test_vae_hifigan.py). These tests force the gate both
ways and bound the deviation: in fp32 the two formulations agree to
~1e-6 relative on well-conditioned data (activations are O(1..10) here,
as in the networks); in bf16 the outputs agree to within a couple of
bf16 ulps.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from consistencytta_tpu.nn import layers as L


@pytest.fixture
def force(monkeypatch):
    def _force(mode: str):
        monkeypatch.setattr(L, "_NORM_SINGLE_PASS", mode)

    return _force


def _run_groupnorm(x, mode, groups=32):
    gn = L.GroupNorm(num_groups=groups, epsilon=1e-6)
    params = gn.init(jax.random.PRNGKey(0), x)
    # non-trivial affine so the folded a/b form is exercised
    params = {
        "params": {
            "scale": jnp.linspace(0.5, 1.5, x.shape[-1]).astype(jnp.float32),
            "bias": jnp.linspace(-1.0, 1.0, x.shape[-1]).astype(jnp.float32),
        }
    }
    return gn.apply(params, x)


def _run_layernorm(x, mode):
    ln = L.LayerNorm()
    params = {
        "params": {
            "scale": jnp.linspace(0.5, 1.5, x.shape[-1]).astype(jnp.float32),
            "bias": jnp.linspace(-1.0, 1.0, x.shape[-1]).astype(jnp.float32),
        }
    }
    return ln.apply(params, x)


@pytest.mark.parametrize("offset", [0.0, 5.0])
def test_groupnorm_single_pass_fp32_close(force, offset):
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((2, 16, 8, 128)) + offset).astype(np.float32)
    force("off")
    ref = np.asarray(_run_groupnorm(jnp.asarray(x), "off"))
    force("on")
    fast = np.asarray(_run_groupnorm(jnp.asarray(x), "on"))
    np.testing.assert_allclose(fast, ref, rtol=1e-5, atol=1e-5)


def test_groupnorm_single_pass_bf16_close(force):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 16, 8, 128)).astype(np.float32)
    xb = jnp.asarray(x).astype(jnp.bfloat16)
    force("off")
    ref = np.asarray(_run_groupnorm(xb, "off").astype(jnp.float32))
    force("on")
    fast = np.asarray(_run_groupnorm(xb, "on").astype(jnp.float32))
    # a couple of bf16 ulps on O(1) normalized outputs
    np.testing.assert_allclose(fast, ref, rtol=0.0, atol=0.02)


@pytest.mark.parametrize("offset", [0.0, 5.0])
def test_layernorm_single_pass_fp32_close(force, offset):
    rng = np.random.default_rng(2)
    x = (rng.standard_normal((2, 64, 255)) + offset).astype(np.float32)
    force("off")
    ref = np.asarray(_run_layernorm(jnp.asarray(x), "off"))
    force("on")
    fast = np.asarray(_run_layernorm(jnp.asarray(x), "on"))
    np.testing.assert_allclose(fast, ref, rtol=1e-5, atol=1e-5)


def test_layernorm_single_pass_bf16_close(force):
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 64, 255)).astype(np.float32)
    xb = jnp.asarray(x).astype(jnp.bfloat16)
    force("off")
    ref = np.asarray(_run_layernorm(xb, "off").astype(jnp.float32))
    force("on")
    fast = np.asarray(_run_layernorm(xb, "on").astype(jnp.float32))
    np.testing.assert_allclose(fast, ref, rtol=0.0, atol=0.02)


def test_gate_is_off_on_cpu_fp32(force):
    """The default gate keeps the literal two-pass path for fp32/CPU —
    the configuration every torch-parity test runs under."""
    assert L._single_pass_stats(jnp.float32) is False


def test_groupnorm_grad_finite(force):
    """Autodiff through the folded affine path stays finite (the training
    step differentiates GroupNorm under bf16 on TPU)."""
    force("on")
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 64)).astype(np.float32))
    gn = L.GroupNorm(num_groups=32, epsilon=1e-6)
    params = gn.init(jax.random.PRNGKey(0), x)

    def loss(p, x):
        return jnp.sum(gn.apply(p, x) ** 2)

    g = jax.grad(loss)(params, x)
    assert all(
        bool(jnp.all(jnp.isfinite(leaf))) for leaf in jax.tree_util.tree_leaves(g)
    )
