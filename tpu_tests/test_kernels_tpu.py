"""Compiled-kernel correctness on real TPU hardware.

The CPU suite verifies the same kernels in interpreter mode / fallback
paths; these tests verify the Mosaic-compiled artifacts — tiling, scratch
revisiting, and the block-sparse kernels — against fp32 oracles computed
on-device.
"""

import jax
import jax.numpy as jnp
import numpy as np


def test_flash_attention_compiled_matches_oracle():
    from consistencytta_tpu.ops.pallas_attention import (
        attention_reference,
        flash_self_attention,
    )

    rng = np.random.default_rng(0)
    # (BH, S, D): the three UNet level shapes at d=64 plus the VAE
    # mid-block single-head shape (d=512 exercises the tiled lane_bcast
    # branch of the kernel, d >= 128)
    for (bh, s, d) in [(10, 4096, 64), (20, 1024, 64), (40, 256, 64),
                       (2, 4096, 512)]:
        q = jnp.asarray(rng.standard_normal((bh, s, d)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((bh, s, d)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((bh, s, d)), jnp.bfloat16)
        scale = (d - 13) ** -0.5
        out = flash_self_attention(q, k, v, scale)
        ref = attention_reference(
            q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32),
            scale,
        )
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref)))
        rel = err / float(jnp.max(jnp.abs(ref)))
        assert rel < 2e-2, (bh, s, rel)  # bf16 v-matmul rounding


def test_flash_packed_compiled_matches_oracle():
    """Mosaic-compiled packed [B,S,H*d] kernel (in-kernel head unroll) vs the
    per-head fp32 oracle at the UNet level shapes (heads x seq)."""
    from consistencytta_tpu.ops.pallas_attention import (
        attention_reference,
        flash_mha_packed,
    )

    rng = np.random.default_rng(3)
    for (b, h, s) in [(2, 5, 4096), (2, 10, 1024), (2, 20, 256)]:
        d = 64
        q = jnp.asarray(rng.standard_normal((b, s, h * d)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((b, s, h * d)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((b, s, h * d)), jnp.bfloat16)
        scale = 51**-0.5
        out = flash_mha_packed(q, k, v, h, scale)
        fold = lambda t: (
            t.astype(jnp.float32)
            .reshape(b, s, h, d)
            .transpose(0, 2, 1, 3)
            .reshape(b * h, s, d)
        )
        ref = attention_reference(fold(q), fold(k), fold(v), scale)
        ref = ref.reshape(b, h, s, d).transpose(0, 2, 1, 3).reshape(b, s, h * d)
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref)))
        rel = err / float(jnp.max(jnp.abs(ref)))
        assert rel < 2e-2, (b, h, s, rel)


def test_flash_attention_grads_finite_on_device():
    from consistencytta_tpu.ops.pallas_attention import flash_self_attention

    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((4, 512, 64)), jnp.bfloat16)

    def loss(q, k, v):
        return jnp.sum(flash_self_attention(q, k, v, 51**-0.5).astype(jnp.float32) ** 2)

    grads = jax.grad(loss, argnums=(0, 1, 2))(q, q, q)
    for g in grads:
        assert bool(jnp.all(jnp.isfinite(g.astype(jnp.float32))))


def test_hifigan_block_tail_compiled_matches_plain():
    import consistencytta_tpu.nn.hifigan as hg
    from consistencytta_tpu.configs import HiFiGANConfig

    rng = jax.random.PRNGKey(0)
    mel = jax.random.normal(rng, (2, 64, 64), jnp.bfloat16)
    voc_fast = hg.HiFiGANGenerator(HiFiGANConfig(), dtype=jnp.bfloat16)
    voc_plain = hg.HiFiGANGenerator(
        HiFiGANConfig(rechannel_small_convs=False), dtype=jnp.bfloat16
    )
    params = voc_fast.init(rng, mel)
    a = jax.jit(lambda p, m: voc_fast.apply(p, m))(params, mel)
    b = jax.jit(lambda p, m: voc_plain.apply(p, m))(params, mel)
    err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
    assert err < 5e-4, err


def test_pallas_stft_compiled_matches_xla():
    from consistencytta_tpu.configs import STFTConfig
    from consistencytta_tpu.ops.pallas_stft import stft_magnitude_pallas
    from consistencytta_tpu.ops.stft import MelFrontend, stft_magnitude

    frontend = MelFrontend(STFTConfig())
    rng = np.random.default_rng(2)
    wav = jnp.asarray(rng.standard_normal((2, 32000)) * 0.3, jnp.float32)
    a = stft_magnitude_pallas(
        wav, frontend.cos_basis, frontend.sin_basis, hop_length=160,
        center_pad=512,
    )
    b = stft_magnitude(
        wav, frontend.cos_basis, frontend.sin_basis, hop_length=160,
        center_pad=512,
    )
    err = float(jnp.max(jnp.abs(a - b)))
    assert err < 5e-2, err


def test_pallas_blockconv_compiled_matches_xla():
    """Mosaic-compiled dense block conv vs the XLA block-sparse kernel at
    the production s=2 vocoder-tail geometries (C=64 level of the HiFi-GAN
    tail, reference audioldm/hifigan/models.py:20-63)."""
    from consistencytta_tpu.nn.layers import conv1d_rechanneled_pre
    from consistencytta_tpu.ops.pallas_blockconv import blockconv1d_dense

    rng = np.random.default_rng(11)
    s, c = 2, 64
    # 5128 ≡ 40968 mod 1024: exercises the same ragged trailing tile as
    # the production tail level at test-affordable size
    for (k, d, m) in [(3, 3, 2560), (3, 5, 2560), (11, 5, 5128), (7, 3, 640)]:
        p = d * (k - 1) // 2
        x = jnp.asarray(rng.standard_normal((2, m, s * c)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((k, c, c)), jnp.bfloat16)
        a = jax.jit(blockconv1d_dense, static_argnums=(2, 3, 4))(x, w, d, p, s)
        b = jax.jit(conv1d_rechanneled_pre, static_argnums=(2, 3, 4))(
            x, w, d, p, s
        )
        err = float(
            jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))
        )
        ref = float(jnp.max(jnp.abs(b.astype(jnp.float32))))
        assert err / ref < 2e-2, (k, d, m, err / ref)


def test_fused_mrf_level_compiled_matches_xla():
    """Mosaic-compiled fused MRF level (ops/pallas_mrf.py: 3 resblocks +
    relus + residuals + average in one pallas_call) vs the plain XLA
    per-conv formulation, at the production blocked geometries
    (reference audioldm/hifigan/models.py:20-63,100-112)."""
    from consistencytta_tpu.ops import pallas_mrf as pm

    ks = (3, 7, 11)
    ds = ((1, 3, 5),) * 3
    rng = np.random.default_rng(13)
    # 1416 ≡ 40968 mod 1024 at s=2 / ≡ 40960 mod 1024 at s=4 tile counts
    # differ, but both exercise a ragged trailing tile beyond one full one.
    # B=8 compiles the production batch-folded variant (transposed-bitcast
    # blocks, sublane-aligned tap slices); B=2 the unfolded one.
    for s, m, b in [(2, 1416, 8), (4, 1304, 8), (2, 1416, 2)]:
        c = 128 // s
        kernels, biases = [], []
        for k, dd in zip(ks, ds):
            for _ in dd:
                for _ in range(2):
                    kernels.append(jnp.asarray(
                        rng.standard_normal((k, c, c)) * 0.08, jnp.bfloat16))
                    biases.append(jnp.asarray(
                        rng.standard_normal((c,)) * 0.08, jnp.bfloat16))
        kernels, biases = tuple(kernels), tuple(biases)
        x = jnp.asarray(rng.standard_normal((b, m, 128)) * 0.5, jnp.bfloat16)
        a = jax.jit(lambda xx, kk, bb, s=s: pm.fused_mrf_level(
            xx, kk, bb, ks, ds, s, 0.1))(x, kernels, biases)
        b = jax.jit(lambda xx, kk, bb, s=s: pm.plain_mrf_level(
            xx, kk, bb, ks, ds, s, 0.1))(x, kernels, biases)
        err = float(
            jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))
        )
        ref = float(jnp.max(jnp.abs(b.astype(jnp.float32))))
        assert err / ref < 3e-2, (s, m, err / ref)


def test_single_pass_norm_stats_on_device():
    """The production single-pass GN/LN statistics fast path (gated ON for
    bf16 on this backend) vs the literal two-pass formulation, compiled and
    compared ON DEVICE at a production GN shape — guards the E[x^2]-mean^2
    restructure against TPU reduce/fusion semantics, not just the CPU
    interpreter (tests/test_norm_fastpath.py covers that)."""
    import consistencytta_tpu.nn.layers as L

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((4, 256, 64, 128)), jnp.bfloat16)
    gn = L.GroupNorm(num_groups=32, epsilon=1e-6)
    params = {
        "params": {
            "scale": jnp.linspace(0.5, 1.5, 128).astype(jnp.float32),
            "bias": jnp.linspace(-1.0, 1.0, 128).astype(jnp.float32),
        }
    }
    assert L._single_pass_stats(jnp.bfloat16) is True  # gate live on TPU
    fast = jax.jit(lambda p, xx: gn.apply(p, xx))(params, x)
    prev = L._NORM_SINGLE_PASS
    L._NORM_SINGLE_PASS = "off"
    try:
        ref = jax.jit(lambda p, xx: gn.apply(p, xx))(params, x)
    finally:
        L._NORM_SINGLE_PASS = prev
    diff = float(
        jnp.max(jnp.abs(fast.astype(jnp.float32) - ref.astype(jnp.float32)))
    )
    assert diff <= 0.04, diff  # a couple of bf16 ulps on O(1) outputs
