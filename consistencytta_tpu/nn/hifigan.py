"""HiFi-GAN vocoder generator in flax/NWC (mel -> 16 kHz waveform).

Architecture parity with reference audioldm/hifigan/models.py:72-125 and the
HIFIGAN_16K_64 config (audioldm/hifigan/utilities.py:9-39): conv_pre
(64 -> 1024, k7) -> 5x [leaky_relu -> ConvTranspose1d upsample -> 3
multi-dilation ResBlocks averaged] -> leaky_relu -> conv_post -> tanh.
Upsample rates (5,4,2,2,2) multiply to the 160-sample mel hop.

The reference strips weight norm at load time (utilities.py:67-73), so
imported kernels are plain convolutions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from consistencytta_tpu.configs import HiFiGANConfig
from consistencytta_tpu.nn.layers import (
    FastConv1d,
    _layers_on_tpu,
    conv_transpose_1d,
    conv_transpose_1d_blocked,
)
from consistencytta_tpu.ops.pallas_mrf import (
    fused_mrf_level,
    fused_mrf_supported,
)


def _get_padding(kernel_size: int, dilation: int = 1) -> int:
    return (kernel_size * dilation - dilation) // 2


class ResBlock(nn.Module):
    """Multi-dilation residual block (models.py:20-63).

    Convs are FastConv1d: identical params/math to nn.Conv. With
    block_s > 1 the whole block runs in space-to-depth block space
    ([B, L/s, s*C], s*C == 128) — the small-channel tail levels (C=64/32)
    otherwise run at ~8% MXU utilization and the C=32 level alone was 30%
    of vocoder wall-clock (PERF.md)."""

    channels: int
    kernel_size: int
    dilations: tuple
    lrelu_slope: float = 0.1
    block_s: int = 1
    dtype: jnp.dtype = jnp.float32
    # probe mode: declare the identical param tree but return the chain's
    # (kernel, bias) pairs for the parent's fused level kernel
    probe_params: bool = False

    @nn.compact
    def __call__(self, x):
        probed = []
        for i, d in enumerate(self.dilations):
            # probe mode passes x through: every conv in the chain sees the
            # same blocked shape, so declaration/validation are identical
            xt = x if self.probe_params else nn.leaky_relu(x, self.lrelu_slope)
            c1 = FastConv1d(
                self.channels,
                self.kernel_size,
                kernel_dilation=d,
                padding=_get_padding(self.kernel_size, d),
                block_s=self.block_s,
                in_features=self.channels,
                dtype=self.dtype,
                probe_params=self.probe_params,
                name=f"convs1_{i}",
            )(xt)
            if not self.probe_params:
                xt = nn.leaky_relu(c1, self.lrelu_slope)
            c2 = FastConv1d(
                self.channels,
                self.kernel_size,
                padding=_get_padding(self.kernel_size, 1),
                block_s=self.block_s,
                in_features=self.channels,
                dtype=self.dtype,
                probe_params=self.probe_params,
                name=f"convs2_{i}",
            )(xt)
            if self.probe_params:
                probed.extend((c1, c2))
            else:
                x = c2 + x
        return probed if self.probe_params else x


class HiFiGANGenerator(nn.Module):
    """mel [B, T_frames, n_mels] (NWC) -> waveform [B, T_frames * 160]."""

    config: HiFiGANConfig = HiFiGANConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, mel: jax.Array) -> jax.Array:
        cfg = self.config
        x = nn.Conv(
            cfg.upsample_initial_channel, (7,), padding=3, dtype=self.dtype,
            param_dtype=jnp.float32, name="conv_pre",
        )(mel)

        # Space-to-depth tail: once channels drop below the 128-lane MXU
        # width, the level runs entirely in block space [B, L/s, s*C] with
        # s*C == 128 — the transposed conv enters it (stride-1 block conv),
        # resblocks/leaky_relu/averaging stay in it, and only conv_post's
        # output reshapes back to samples. Exact math; see layers.py.
        allow_block = cfg.rechannel_small_convs and _layers_on_tpu()
        s = 1  # current block factor of x

        num_kernels = len(cfg.resblock_kernel_sizes)
        for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
            x = nn.leaky_relu(x, cfg.lrelu_slope)
            ch = cfg.upsample_initial_channel // (2 ** (i + 1))
            kernel = self.param(
                f"ups_{i}_kernel",
                nn.initializers.normal(0.01),
                (k, ch, cfg.upsample_initial_channel // (2**i)),
                jnp.float32,
            )
            bias = self.param(
                f"ups_{i}_bias", nn.initializers.zeros, (ch,), jnp.float32
            )
            enter_block = (
                allow_block
                and ch * s * u == 128
                and k - u == 2 * ((k - u) // 2)
            )
            if enter_block or s > 1:
                x = conv_transpose_1d_blocked(
                    x, kernel.astype(self.dtype), stride=u,
                    padding=(k - u) // 2, s_in=s,
                ) + jnp.tile(bias.astype(self.dtype), s * u)
                s = s * u
            else:
                x = conv_transpose_1d(
                    x, kernel.astype(self.dtype), stride=u, padding=(k - u) // 2
                ) + bias.astype(self.dtype)

            # Fused MRF level: the 128-lane blocked levels (C*s == 128)
            # run all 3 resblocks + average as ONE batch-folded Pallas
            # kernel when the batch folds by 8 — measured -18.1 ms on the
            # batch-32 vocoder (ops/pallas_mrf.py, PERF.md round-4).
            # Param tree is untouched: probe mode declares the identical
            # FastConv1d params and hands them to the fused kernel.
            k_sizes = tuple(cfg.resblock_kernel_sizes)
            d_sizes = tuple(tuple(dd) for dd in cfg.resblock_dilation_sizes)
            fuse = (
                allow_block
                and self.dtype != jnp.float32  # fp32 runs keep parity path
                and fused_mrf_supported(
                    ch, s, x.shape[1], k_sizes, d_sizes, batch=x.shape[0]
                )
            )
            if fuse:
                kbs = []
                for j, (rk, rd) in enumerate(zip(k_sizes, d_sizes)):
                    kbs.extend(
                        ResBlock(
                            ch, rk, tuple(rd), cfg.lrelu_slope, block_s=s,
                            dtype=self.dtype, probe_params=True,
                            name=f"resblock_{i}_{j}",
                        )(x)
                    )
                x = fused_mrf_level(
                    x.astype(self.dtype),
                    tuple(kb[0] for kb in kbs),
                    tuple(kb[1] for kb in kbs),
                    k_sizes, d_sizes, s, cfg.lrelu_slope,
                )
            else:
                acc = None
                for j, (rk, rd) in enumerate(zip(k_sizes, d_sizes)):
                    y = ResBlock(
                        ch, rk, tuple(rd), cfg.lrelu_slope, block_s=s,
                        dtype=self.dtype, name=f"resblock_{i}_{j}",
                    )(x)
                    acc = y if acc is None else acc + y
                x = acc / num_kernels

        x = nn.leaky_relu(x)  # default slope 0.01 (models.py:113 F.leaky_relu)
        x = FastConv1d(
            1, 7, padding=3, block_s=s, in_features=x.shape[-1] // s,
            dtype=self.dtype, name="conv_post",
        )(x)
        x = jnp.tanh(x)
        b = x.shape[0]
        return x.reshape(b, -1)  # [B, T_samples]


def vocoder_postprocess(wav: jax.Array) -> jax.Array:
    """DC-center the waveform batch: wav - (max + min) / 2, with the max/min
    taken over the WHOLE batch — an exact-parity reproduction of reference
    vocoder_infer (audioldm/hifigan/utilities.py:76-91), which computes
    global (not per-sample) extrema."""
    center = (wav.max() + wav.min()) / 2.0
    return wav - center
