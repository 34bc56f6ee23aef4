"""Space-to-depth conv re-channeling: exactness vs the plain lax conv.

The re-channeled kernel contains the same products as the reference conv
plus structured zeros, so outputs must match to fp rounding; param
structure of FastConv1d must match nn.Conv so torch importers are
unaffected.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from consistencytta_tpu.nn.layers import FastConv1d, conv1d_rechanneled


def _ref(x, w, d, p):
    return jax.lax.conv_general_dilated(
        x, w, (1,), [(p, p)], rhs_dilation=(d,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )


@pytest.mark.parametrize(
    "k,d,c_in,c_out,s,length",
    [
        (3, 1, 32, 32, 4, 64),
        (3, 5, 32, 32, 4, 80),
        (11, 1, 32, 32, 4, 88),
        (11, 5, 64, 64, 2, 128),
        (7, 3, 32, 64, 2, 56),
        (5, 1, 16, 16, 8, 72),
    ],
)
def test_rechanneled_matches_plain(k, d, c_in, c_out, s, length):
    rng = np.random.default_rng(0)
    p = d * (k - 1) // 2
    x = jnp.asarray(rng.standard_normal((2, length, c_in)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, c_in, c_out)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(conv1d_rechanneled(x, w, d, p, s)),
        np.asarray(_ref(x, w, d, p)),
        atol=2e-4, rtol=1e-5,
    )


def test_fastconv_params_match_nn_conv():
    """FastConv1d must create the exact param tree nn.Conv creates (the
    HiFi-GAN torch importer writes kernel [k, C_in, C_out] + bias)."""
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 32, 8), jnp.float32)
    fast = FastConv1d(16, 3, kernel_dilation=2, padding=2)
    conv = nn.Conv(16, (3,), kernel_dilation=(2,), padding=2)
    pf = fast.init(rng, x)["params"]
    pc = conv.init(rng, x)["params"]
    assert set(pf) == set(pc) == {"kernel", "bias"}
    assert pf["kernel"].shape == pc["kernel"].shape
    assert pf["bias"].shape == pc["bias"].shape


def test_hifigan_block_space_tail_matches_plain():
    """The generator's block-space tail (forced on by patching the backend
    gate) must reproduce the plain path on shared params.

    upsample_initial_channel=128 with rates (2,2) makes level 0 hit the
    ch*s*u == 128 entry condition (ch=64, u=2), so the COMPOSED blocked tail
    — transposed-conv entry, blocked resblocks at s=2 then s=4, bias tiling,
    blocked conv_post — actually executes (the previous 64-channel config
    never entered block space and the test was vacuous)."""
    import consistencytta_tpu.nn.hifigan as hg
    from consistencytta_tpu.configs import HiFiGANConfig

    cfg = HiFiGANConfig(
        upsample_initial_channel=128,
        upsample_rates=(2, 2),
        upsample_kernel_sizes=(4, 4),
    )
    voc = hg.HiFiGANGenerator(cfg)
    rng = jax.random.PRNGKey(0)
    mel = jax.random.normal(rng, (2, 16, 64), jnp.float32)

    blocked_calls = []
    orig_blocked = hg.conv_transpose_1d_blocked

    def counting_blocked(x, kernel, stride, padding, s_in):
        blocked_calls.append(s_in)
        return orig_blocked(x, kernel, stride=stride, padding=padding, s_in=s_in)

    orig = hg._layers_on_tpu
    try:
        hg._layers_on_tpu = lambda: False
        params = voc.init(rng, mel)
        out_plain = voc.apply(params, mel)
        hg._layers_on_tpu = lambda: True
        hg.conv_transpose_1d_blocked = counting_blocked
        out_block = voc.apply(params, mel)
    finally:
        hg._layers_on_tpu = orig
        hg.conv_transpose_1d_blocked = orig_blocked

    # block space entered at level 0 (s_in=1) and CONTINUED at level 1
    # (s_in=2) — the s>1 path is the one with the bias tiling to verify
    assert blocked_calls == [1, 2], f"block path not taken: {blocked_calls}"
    assert out_plain.shape == out_block.shape
    np.testing.assert_allclose(
        np.asarray(out_plain), np.asarray(out_block), atol=1e-5, rtol=1e-5
    )


def test_blocked_conv_transpose_matches_plain():
    from consistencytta_tpu.nn.layers import (
        conv_transpose_1d,
        conv_transpose_1d_blocked,
    )

    rng = np.random.default_rng(3)
    for (k, u, c_in, c_out, s_in, length) in [
        (4, 2, 8, 6, 1, 20), (4, 2, 6, 4, 2, 24), (8, 2, 5, 5, 1, 16),
    ]:
        p = (k - u) // 2
        x = jnp.asarray(rng.standard_normal((2, length, c_in)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((k, c_out, c_in)), jnp.float32)
        ref = conv_transpose_1d(x, w, u, p)
        got = conv_transpose_1d_blocked(
            x.reshape(2, length // s_in, s_in * c_in), w, u, p, s_in
        ).reshape(2, -1, c_out)
        np.testing.assert_allclose(
            np.asarray(ref), np.asarray(got), atol=2e-5, rtol=1e-5
        )


def test_fastconv_matches_nn_conv_output():
    """On the CPU test backend the fallback path runs — must equal nn.Conv
    bit-for-bit given shared params."""
    rng = jax.random.PRNGKey(1)
    x = jax.random.normal(rng, (2, 40, 32), jnp.float32)
    fast = FastConv1d(32, 7, kernel_dilation=3, padding=9)
    conv = nn.Conv(32, (7,), kernel_dilation=(3,), padding=9)
    params = conv.init(rng, x)
    np.testing.assert_array_equal(
        np.asarray(fast.apply(params, x)), np.asarray(conv.apply(params, x))
    )


@pytest.mark.parametrize(
    "k,d,m",
    [(3, 3, 256), (3, 5, 256), (11, 5, 256), (7, 3, 256), (3, 1, 256),
     # ragged M (not a tile multiple): Mosaic masks the trailing block and
     # the kernel masks global rows >= m — the production tail M is 40968
     (3, 3, 136), (11, 5, 131), (7, 3, 200)],
)
def test_pallas_blockconv_interpret_matches_rechanneled(k, d, m):
    """The dense-packed Pallas kernel (ops/pallas_blockconv.py) multiplies
    exactly the taps of the XLA block-sparse formulation, never the
    structured zeros — interpret-mode output must match to fp rounding."""
    from consistencytta_tpu.nn.layers import conv1d_rechanneled_pre
    from consistencytta_tpu.ops.pallas_blockconv import _forward

    rng = np.random.default_rng(7)
    s, c = 2, 64
    p = d * (k - 1) // 2
    x = jnp.asarray(rng.standard_normal((2, m, s * c)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, c, c)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(_forward(x, w, d, p, s, interpret=True)),
        np.asarray(conv1d_rechanneled_pre(x, w, d, p, s)),
        atol=1e-4, rtol=1e-5,
    )


def test_pallas_blockconv_vjp_matches_plain_path():
    """blockconv1d_dense's custom VJP routes through the XLA formulation;
    grads must equal autodiff of conv1d_rechanneled_pre exactly."""
    from consistencytta_tpu.nn.layers import conv1d_rechanneled_pre
    from consistencytta_tpu.ops.pallas_blockconv import blockconv1d_dense

    rng = np.random.default_rng(9)
    k, d, s, c, m = 3, 3, 2, 64, 128
    p = d * (k - 1) // 2
    x = jnp.asarray(rng.standard_normal((1, m, s * c)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, c, c)), jnp.float32)
    # interpret-mode forward so the custom-vjp pair is exercised on CPU
    import consistencytta_tpu.ops.pallas_blockconv as pb
    orig = pb._forward
    pb._forward = functools.partial(orig, interpret=True)
    try:
        gx, gw = jax.grad(
            lambda xx, ww: jnp.sum(blockconv1d_dense(xx, ww, d, p, s) ** 2),
            argnums=(0, 1),
        )(x, w)
    finally:
        pb._forward = orig
    rx, rw = jax.grad(
        lambda xx, ww: jnp.sum(conv1d_rechanneled_pre(xx, ww, d, p, s) ** 2),
        argnums=(0, 1),
    )(x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), atol=2e-3, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw), atol=2e-3, rtol=1e-4)


def test_blockconv_gate_production_geometries():
    """The dispatch gate accepts exactly the measured-faster shapes: the
    s=2 dilated resblock convs (HiFi-GAN tail), rejects d=1 and s=4."""
    from consistencytta_tpu.ops.pallas_blockconv import (
        blockconv1d_dense_supported as ok,
    )

    assert ok(3, 3, 2, 64, 64, 2560)
    assert ok(3, 5, 2, 64, 64, 2560)
    assert ok(11, 5, 2, 64, 64, 20480)
    assert ok(11, 5, 2, 64, 64, 40968)       # production ragged tail M
    assert not ok(3, 1, 2, 64, 64, 2560)     # d=1: XLA already dense
    assert not ok(3, 3, 4, 32, 32, 1280)     # s=4: measured 2.7x slower
    assert not ok(3, 3, 2, 64, 128, 2560)    # c_in != c_out
    assert not ok(3, 3, 2, 64, 64, 64)       # below one tile
