"""Shared NN building blocks (NHWC / NWC layouts, mixed-precision policy).

Layout convention: all modules are channels-last (NHWC for 2-D, NWC for 1-D)
— the native TPU/XLA convolution layout. Weight importers in
``consistencytta_tpu.io.torch_import`` transpose from the reference's NCHW.

Precision policy: parameters live in float32 (`param_dtype`), compute runs in
the module `dtype` (bfloat16 in production), and all normalization statistics
are computed in float32 regardless of compute dtype.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


_GN_RELAYOUT_FREE = True

# Single-pass normalization statistics (production bf16/TPU fast path):
# var = E[x^2] - mean^2 instead of the two-pass sum((x - mean)^2). Removing
# the stats' mean -> centered data dependency lets XLA sibling-fuse the sum
# and sum-of-squares reductions into ONE read of the activation (the plain
# formulation reads it three times: mean pass, variance pass, output pass),
# and the output collapses to a per-channel affine x * a + b with
# a = rstd * scale, b = bias - mean * a. fp32 accumulators over bf16 inputs;
# not bit-identical to the two-pass form, so it is GATED exactly like the
# other bf16 fast paths: fp32/CPU runs keep the literal reference
# formulation (tolerance test: tests/test_norm_fastpath.py).
# "auto" = bf16 input on a TPU backend; tests force "on"/"off".
_NORM_SINGLE_PASS = "auto"


def _single_pass_stats(orig_dtype) -> bool:
    if _NORM_SINGLE_PASS == "on":
        return True
    if _NORM_SINGLE_PASS == "off":
        return False
    return orig_dtype == jnp.bfloat16 and _layers_on_tpu()


def swish(x):
    return x * jax.nn.sigmoid(x)


class ParamSlot(nn.Module):
    """Declares the {kernel[, bias]} params an nn.Dense / 1x1 nn.Conv would
    (same names, shapes, inits: lecun_normal kernel, zeros bias, fp32)
    WITHOUT binding the compute, so callers can fuse several projections of
    one source into a single matmul while the checkpoint tree stays
    unchanged. kernel_shape is the Dense (in, out) or Conv (1, 1, in, out)
    kernel shape; flax's lecun_normal computes fan-in over the leading dims
    either way, so inits match the stock modules exactly."""

    kernel_shape: tuple
    bias: bool = False

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), self.kernel_shape,
            jnp.float32,
        )
        if not self.bias:
            return kernel
        b = self.param(
            "bias", nn.initializers.zeros, (self.kernel_shape[-1],),
            jnp.float32,
        )
        return kernel, b


class GroupNorm(nn.Module):
    """GroupNorm with torch semantics (consecutive channel groups) and
    float32 statistics.

    Matches torch.nn.GroupNorm as used by the VAE (eps 1e-6,
    audioldm/variational_autoencoder/modules.py:38-41) and the UNet
    (eps 1e-5)."""

    num_groups: int
    epsilon: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    # Compute group statistics without the [.., G, C/G] reshape: splitting
    # the channel (lane) axis forces a full relayout of the activation on
    # TPU. Instead reduce spatially to per-channel sums (layout-preserving)
    # and fold channels into groups with a tiny [C, G] indicator matmul.
    # Same sums, same two-pass variance — fp32-identical math.
    # (_GN_RELAYOUT_FREE is a module-level kill switch for A/B timing.)
    relayout_free: bool = True

    @nn.compact
    def __call__(self, x):
        orig_dtype = x.dtype
        c = x.shape[-1]
        g = self.num_groups
        if c % g != 0:
            raise ValueError(f"channels {c} not divisible by groups {g}")
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)

        x32 = x.astype(jnp.float32)
        spatial = x32.shape[1:-1]
        if self.relayout_free and _GN_RELAYOUT_FREE:
            spatial_axes = tuple(range(1, 1 + len(spatial)))
            n = c // g
            size = n
            for d in spatial:
                size *= d
            # group-membership matrix (consecutive channel groups, torch
            # semantics); constant-folded by XLA
            ch = jnp.arange(c) // n  # [C]
            ind = (ch[:, None] == jnp.arange(g)[None, :]).astype(jnp.float32)

            # HIGHEST precision on the indicator matmuls: at DEFAULT, TPU
            # fp32 matmuls use bf16 passes, eroding the fp32 statistics the
            # x.astype(float32) upcast exists to preserve; the [B,C]x[C,G]
            # ops are tiny so the cost is nil
            mm = lambda a, b: jnp.matmul(
                a, b, precision=jax.lax.Precision.HIGHEST
            )
            bshape = (x32.shape[0],) + (1,) * len(spatial) + (c,)
            if _single_pass_stats(orig_dtype):
                # one fused read: sum and sum-of-squares have no data
                # dependency, so XLA emits them as one multi-output
                # reduction over the bf16 input
                s1 = jnp.sum(x32, axis=spatial_axes)  # [B, C]
                s2 = jnp.sum(x32 * x32, axis=spatial_axes)  # [B, C]
                mean_g = mm(s1, ind) / size  # [B, G]
                var_g = mm(s2, ind) / size - mean_g * mean_g  # [B, G]
                rstd_g = jax.lax.rsqrt(
                    jnp.maximum(var_g, 0.0) + self.epsilon
                )  # [B, G]
                mean_c = mm(mean_g, ind.T)  # [B, C]
                rstd_c = mm(rstd_g, ind.T)  # [B, C]
                a = rstd_c * scale[None, :]  # [B, C]
                bch = bias[None, :] - mean_c * a  # [B, C]
                out = x.astype(jnp.float32) * a.reshape(bshape) + bch.reshape(
                    bshape
                )
                return out.astype(orig_dtype)
            s1 = jnp.sum(x32, axis=spatial_axes)  # [B, C]
            mean_g = mm(s1, ind) / size  # [B, G]
            mean_c = mm(mean_g, ind.T)  # [B, C]
            # Recompute (x - mean) in each consumer instead of binding it to
            # one variable: reusing a stored fp32 `centered` forces XLA to
            # materialize it (a ~1 GB tensor at the VAE decoder's final
            # level); recomputed, both the variance reduce and the output
            # fuse against the bf16 input. Bit-identical fp32 math
            # (measured: 0 ulp, 5.08 -> 4.63 ms per large GN).
            centered = lambda: x.astype(jnp.float32) - mean_c.reshape(bshape)
            c1 = centered()
            s2 = jnp.sum(c1 * c1, axis=spatial_axes)  # [B, C]
            var_g = mm(s2, ind) / size  # [B, G]
            rstd_c = mm(jax.lax.rsqrt(var_g + self.epsilon), ind.T)  # [B, C]
            out = centered() * rstd_c.reshape(bshape) * scale + bias
            return out.astype(orig_dtype)

        grouped = x32.reshape((x32.shape[0],) + spatial + (g, c // g))
        axes = tuple(range(1, 1 + len(spatial))) + (grouped.ndim - 1,)
        mean = grouped.mean(axis=axes, keepdims=True)
        var = grouped.var(axis=axes, keepdims=True)
        normed = (grouped - mean) * jax.lax.rsqrt(var + self.epsilon)
        normed = normed.reshape(x32.shape)
        out = normed * scale + bias
        return out.astype(orig_dtype)


class LayerNorm(nn.Module):
    """LayerNorm over the last axis, float32 statistics."""

    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        orig_dtype = x.dtype
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        x32 = x.astype(jnp.float32)
        if _single_pass_stats(orig_dtype):
            # single-pass stats (see _NORM_SINGLE_PASS): mean and E[x^2]
            # reduce in one fused read; output folds to x * a + b
            mean = x32.mean(axis=-1, keepdims=True)
            ex2 = jnp.mean(x32 * x32, axis=-1, keepdims=True)
            var = jnp.maximum(ex2 - mean * mean, 0.0)
            rstd = jax.lax.rsqrt(var + self.epsilon)
            a = rstd * scale
            out = x32 * a + (bias - mean * a)
            return out.astype(orig_dtype)
        mean = x32.mean(axis=-1, keepdims=True)
        var = x32.var(axis=-1, keepdims=True)
        out = (x32 - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias
        return out.astype(orig_dtype)


def _rechannel_plan(k: int, dilation: int, padding: int, s: int):
    """Index plan for space-to-depth conv re-channeling.

    A stride-1, same-length 1-D conv y[pos] = sum_t x[pos + t*d - p] W[t]
    over C channels becomes, for output blocks of s positions
    (pos = s*m + j), a conv over x' [B, L/s, s*C] with a block-sparse
    kernel: input offset off = j + t*d - p lands in block T = off // s at
    phase i = off % s, so K'[T - Tmin][i*C_in + ci, j*C_out + co] = W[t].
    Returns (Tmin, Tmax, [(j, t, T, i), ...])."""
    entries = []
    for j in range(s):
        for t in range(k):
            off = j + t * dilation - padding
            entries.append((j, t, off // s, off % s))
    tmin = min(e[2] for e in entries)
    tmax = max(e[2] for e in entries)
    return tmin, tmax, entries


def conv1d_rechanneled_pre(
    x_blocked: jax.Array,  # [B, L/s, s*C_in], block-major (position-major)
    kernel: jax.Array,  # [k, C_in, C_out] (flax WIO layout)
    dilation: int,
    padding: int,
    s: int,
) -> jax.Array:
    """conv1d_rechanneled on input already living in block space; returns
    the output in block space [B, L/s, s*C_out] (no reshapes — callers keep
    whole network segments blocked to avoid materializing narrow-lane
    tensors)."""
    k, c_in, c_out = kernel.shape
    tmin, tmax, entries = _rechannel_plan(k, dilation, padding, s)
    n_taps = tmax - tmin + 1

    kp = jnp.zeros((n_taps, s * c_in, s * c_out), kernel.dtype)
    for j, t, tt, i in entries:
        kp = kp.at[
            tt - tmin, i * c_in : (i + 1) * c_in, j * c_out : (j + 1) * c_out
        ].set(kernel[t])

    return jax.lax.conv_general_dilated(
        x_blocked,
        kp,
        window_strides=(1,),
        padding=[(-tmin, tmax)],
        dimension_numbers=("NWC", "WIO", "NWC"),
    )  # [B, L/s, s*C_out]


def conv1d_rechanneled(
    x: jax.Array,  # [B, L, C_in]
    kernel: jax.Array,  # [k, C_in, C_out] (flax WIO layout)
    dilation: int,
    padding: int,
    s: int,
) -> jax.Array:
    """Stride-1 same-length conv1d computed at s-fold wider channels.

    Mathematically identical to lax 1-D conv with the given kernel (the
    block-sparse kernel contains exactly the same products, plus structured
    zeros), but the matmul contraction/output dims become s*C — sized for
    the 128-wide MXU. Used for the HiFi-GAN tail levels (C=32/64), where
    the plain conv runs at ~8% MXU utilization.
    """
    k, c_in, c_out = kernel.shape
    b, length, _ = x.shape
    xp = x.reshape(b, length // s, s * c_in)
    yp = conv1d_rechanneled_pre(xp, kernel, dilation, padding, s)
    return yp.reshape(b, length, c_out)


def conv_transpose_1d_blocked(
    x_blocked: jax.Array,  # [B, M, s_in*C_in]
    kernel: jax.Array,  # [K, C_out, C_in] (conv_transpose_1d layout)
    stride: int,
    padding: int,
    s_in: int,
) -> jax.Array:
    """torch ConvTranspose1d computed entirely in block space.

    Input blocks of s_in positions come in, blocks of s_out = stride*s_in
    positions come out, via ONE stride-1 conv with a block-sparse kernel:

      y[s_out*m + j] = sum_t x[t] W[k],  k = s_out*m + j + p - stride*t
      with t = s_in*(m - T) + i  =>  k = stride*s_in*T - stride*i + j + p

    Exactly equal to conv_transpose_1d followed by reshape, but the MXU
    sees s_in*C_in x s_out*C_out matmuls and no narrow-lane tensors ever
    materialize. Requires the same-length geometry the HiFi-GAN upsamplers
    use ((L-1)*stride - 2*padding + K == stride*L, i.e. K - stride == 2p).
    """
    k_len, c_out, c_in = kernel.shape
    if k_len - stride != 2 * padding:
        raise ValueError(
            "blocked conv-transpose requires K - stride == 2*padding "
            f"(got K={k_len}, stride={stride}, padding={padding})"
        )
    s_out = stride * s_in

    entries = []  # (T, i, j, k)
    for i in range(s_in):
        for j in range(s_out):
            for k in range(k_len):
                num = k - j - padding + stride * i
                if num % (stride * s_in) == 0:
                    entries.append((num // (stride * s_in), i, j, k))
    tmin = min(e[0] for e in entries)
    tmax = max(e[0] for e in entries)
    n_taps = tmax - tmin + 1

    w = kernel.transpose(0, 2, 1)  # [K, C_in, C_out]
    kp = jnp.zeros((n_taps, s_in * c_in, s_out * c_out), kernel.dtype)
    for tt, i, j, k in entries:
        kp = kp.at[
            tt - tmin, i * c_in : (i + 1) * c_in, j * c_out : (j + 1) * c_out
        ].set(w[k])

    # y'[m] = sum_T x'[m - T] K'[T]: correlation with taps reversed and
    # left-pad for the positive-T (past) side.
    kp = jnp.flip(kp, axis=0)
    return jax.lax.conv_general_dilated(
        x_blocked,
        kp,
        window_strides=(1,),
        padding=[(tmax, -tmin)],
        dimension_numbers=("NWC", "WIO", "NWC"),
    )  # [B, M, s_out*C_out]


class FastConv1d(nn.Module):
    """Drop-in stride-1 conv1d with torch/flax-compatible params
    ({kernel [k, C_in, C_out], bias [C_out]}) that supports block-space
    (space-to-depth) execution for small channel counts.

    block_s == 1: input is the ordinary [B, L, C_in] and the plain lax conv
    runs — fp32 CPU parity tests exercise exactly the reference
    formulation. block_s > 1: the input is pre-blocked [B, L/s, s*C_in]
    (in_features must give the true C_in) and the conv runs re-channeled
    via conv1d_rechanneled_pre, returning blocked output [B, L/s, s*C_out].
    Same-length geometry (dilation*(k-1) == 2*padding) is required then."""

    features: int
    kernel_size: int
    kernel_dilation: int = 1
    padding: int = 0
    block_s: int = 1
    in_features: Optional[int] = None
    dtype: jnp.dtype = jnp.float32
    # probe mode: declare the params (identical tree/shapes) and return
    # (kernel, bias) instead of computing — lets a parent fuse several
    # convs into one kernel (ops/pallas_mrf.py) without touching the
    # checkpoint-facing param structure
    probe_params: bool = False

    @nn.compact
    def __call__(self, x):
        s = self.block_s
        c_in = self.in_features if self.in_features is not None else x.shape[-1]
        if s > 1:
            if self.kernel_dilation * (self.kernel_size - 1) != 2 * self.padding:
                raise ValueError("blocked FastConv1d requires same-length geometry")
            if x.shape[-1] != s * c_in:
                raise ValueError(
                    f"blocked input last dim {x.shape[-1]} != s*C_in {s * c_in}"
                )
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel_size, c_in, self.features),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        kernel = kernel.astype(self.dtype)
        if self.probe_params:
            return kernel, bias.astype(self.dtype)
        x = x.astype(self.dtype)

        if s > 1:
            y = conv1d_rechanneled_pre(
                x, kernel, self.kernel_dilation, self.padding, s
            )
            return y + jnp.tile(bias.astype(self.dtype), s)
        y = jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(1,),
            padding=[(self.padding, self.padding)],
            rhs_dilation=(self.kernel_dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        return y + bias.astype(self.dtype)


def _layers_on_tpu() -> bool:
    try:
        platform = jax.devices()[0].platform
    except RuntimeError:
        return False
    return platform in ("tpu", "axon")


def conv_transpose_1d(
    x: jax.Array, kernel: jax.Array, stride: int, padding: int
) -> jax.Array:
    """Exact torch ConvTranspose1d, channels-last.

    x: [B, W, C_in]; kernel: [K, C_out, C_in] (torch layout [C_in, C_out, K]
    transposed by the importer to [K, C_out, C_in]).
    Output width = (W - 1) * stride - 2 * padding + K, matching
    torch.nn.ConvTranspose1d used by the HiFi-GAN upsampler
    (audioldm/hifigan/models.py:85-89).

    Implemented as an input-dilated regular convolution with a spatially
    flipped kernel — the formulation XLA lowers natively on TPU.
    """
    k = kernel.shape[0]
    flipped = jnp.flip(kernel, axis=0)  # [K, C_out, C_in]
    pad = k - 1 - padding
    return jax.lax.conv_general_dilated(
        x,
        flipped,
        window_strides=(1,),
        padding=[(pad, pad)],
        lhs_dilation=(stride,),
        dimension_numbers=("NWC", "WOI", "NWC"),
    )


def nearest_upsample_2d(x: jax.Array, scale: int = 2) -> jax.Array:
    """Nearest-neighbor 2x upsampling, NHWC (torch F.interpolate nearest)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, scale, w, scale, c))
    return x.reshape(b, h * scale, w * scale, c)


def asymmetric_pad_downsample(x: jax.Array) -> jax.Array:
    """The VAE's asymmetric (0,1)x(0,1) pad before a stride-2 VALID conv
    (audioldm/variational_autoencoder/modules.py:87-94)."""
    return jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
