"""Parity tests for the fused Pallas MRF level (ops/pallas_mrf.py).

The fused kernel computes one full HiFi-GAN upsample level — 3 multi-
dilation resblocks, their relus/residuals, and the 3-way average
(reference audioldm/hifigan/models.py:20-63,100-112) — in one pallas_call.
It must match the plain XLA formulation (plain_mrf_level, the literal
per-conv graph) to fp rounding, including signal-boundary zero padding
and ragged tile tails.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from consistencytta_tpu.ops import pallas_mrf as pm

KS = (3, 7, 11)
DS = ((1, 3, 5),) * 3


def _make_level(rng, s, c, scale=0.08):
    kernels, biases = [], []
    for k, ds in zip(KS, DS):
        for _ in ds:
            for _ in range(2):
                kernels.append(
                    jnp.asarray(rng.standard_normal((k, c, c)) * scale,
                                jnp.float32)
                )
                biases.append(
                    jnp.asarray(rng.standard_normal((c,)) * scale, jnp.float32)
                )
    return kernels, biases


# Quick tier keeps one unfolded + one batch-folded representative; the
# remaining geometry edges run in the full suite (slow) and the compiled
# kernels run against hardware in tpu_tests/.
_slow = pytest.mark.slow


@pytest.mark.parametrize(
    "s,m,b",
    [
        (2, 300, 2),   # C=64 blocked level, ragged second tile
        pytest.param(2, 256, 2, marks=_slow),  # single tile, halo masked
        pytest.param(4, 264, 2, marks=_slow),  # C=32 blocked level
        pytest.param(1, 300, 2, marks=_slow),  # C=128 plain level
        pytest.param(2, 513, 2, marks=_slow),  # 3 tiles (256+256+ragged 1)
        # B % 8 == 0: batch-folded path (transposed [M, B, 128] blocks,
        # [TM*8, 128] flat tiles, sublane-aligned tap slices)
        pytest.param(2, 300, 8, marks=_slow),
        pytest.param(4, 264, 8, marks=_slow),
        (2, 513, 8),
        # single tile at bf=8: both narrow halo fetches are clamped +
        # fully masked (the n_tiles == 1 edge of the halo-block indexing)
        pytest.param(2, 256, 8, marks=_slow),
    ],
)
def test_fused_mrf_interpret_matches_plain(s, m, b):
    c = 128 // s
    rng = np.random.default_rng(3 + s)
    kernels, biases = _make_level(rng, s, c)
    x = jnp.asarray(rng.standard_normal((b, m, 128)) * 0.5, jnp.float32)

    ref = pm.plain_mrf_level(x, kernels, biases, KS, DS, s, 0.1)
    got = pm._forward(x, kernels, biases, KS, DS, s, 0.1, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-4, rtol=1e-4
    )


@pytest.mark.slow  # interpret-mode forward inside grad: ~25 s
def test_fused_mrf_vjp_matches_plain():
    """The custom VJP routes through plain_mrf_level — grads must equal
    autodiff of the plain formulation exactly."""
    s, c, m = 2, 64, 136
    rng = np.random.default_rng(11)
    kernels, biases = _make_level(rng, s, c)
    x = jnp.asarray(rng.standard_normal((1, m, 128)) * 0.5, jnp.float32)

    orig = pm._forward
    pm._forward = functools.partial(orig, interpret=True)
    try:
        gx = jax.grad(
            lambda xx: jnp.sum(
                pm.fused_mrf_level(xx, tuple(kernels), tuple(biases),
                                   KS, DS, s, 0.1) ** 2
            )
        )(x)
    finally:
        pm._forward = orig
    rx = jax.grad(
        lambda xx: jnp.sum(
            pm.plain_mrf_level(xx, kernels, biases, KS, DS, s, 0.1) ** 2
        )
    )(x)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               atol=2e-3, rtol=1e-4)


def test_fused_mrf_supported_gate(monkeypatch):
    monkeypatch.delenv("CTTA_ENABLE_FUSED_MRF", raising=False)
    monkeypatch.delenv("CTTA_DISABLE_FUSED_MRF", raising=False)
    # default-on for the batch-folded production geometries (b % 8 == 0)
    assert pm.fused_mrf_supported(64, 2, 40968, KS, DS, batch=32)
    assert pm.fused_mrf_supported(32, 4, 40960, KS, DS, batch=32)
    # unfoldable batch: the bf=1 variant measured a net in-graph loss
    # from boundary layout copies (PERF.md round-4) — XLA path
    assert not pm.fused_mrf_supported(64, 2, 40968, KS, DS, batch=1)
    monkeypatch.setenv("CTTA_ENABLE_FUSED_MRF", "1")
    assert pm.fused_mrf_supported(64, 2, 40968, KS, DS, batch=1)
    monkeypatch.delenv("CTTA_ENABLE_FUSED_MRF", raising=False)
    # s == 1: measured 0.5 ms slower than XLA's dense rhs-dilated conv
    assert not pm.fused_mrf_supported(128, 1, 20480, KS, DS, batch=32)
    assert not pm.fused_mrf_supported(256, 1, 20480, KS, DS)  # >128 lanes
    assert not pm.fused_mrf_supported(64, 2, 64, KS, DS)      # below a tile
    # escape hatch
    monkeypatch.setenv("CTTA_DISABLE_FUSED_MRF", "1")
    assert not pm.fused_mrf_supported(64, 2, 40968, KS, DS, batch=32)


def test_probe_params_tree_identical():
    """probe_params must declare the exact same param tree as the compute
    path — checkpoints/importers see no difference."""
    from consistencytta_tpu.nn.hifigan import ResBlock

    x = jnp.zeros((1, 64, 128))
    plain = ResBlock(64, 3, (1, 3, 5), block_s=2).init(
        jax.random.PRNGKey(0), x
    )
    probe = ResBlock(64, 3, (1, 3, 5), block_s=2, probe_params=True).init(
        jax.random.PRNGKey(0), x
    )
    flat_a = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), plain)
    flat_b = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), probe)
    assert flat_a == flat_b
    chex = jax.tree_util.tree_all(
        jax.tree_util.tree_map(
            lambda a, b: bool(jnp.array_equal(a, b)), plain, probe
        )
    )
    assert chex
