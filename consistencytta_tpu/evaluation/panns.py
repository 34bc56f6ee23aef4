"""PANN Cnn14 audio classifier in JAX — the FD/KL/ISc/KID feature backbone.

Parity target: audioldm_eval/feature_extractors/panns/models.py:168-324 at
the 16 kHz eval configuration (win 512 / hop 160 / 64 mel / fmin 50 /
fmax 8000; audioldm_eval/eval.py:71-75). Returns the same feature dict:
{"2048": penultimate embedding, "logits": 527-way AudioSet logits}.

Inference-only: batch norms are folded affine transforms using the
checkpoint's running statistics; dropout/spec-augment are omitted (the
harness never trains this model). Weights import from the official
`Cnn14_16k_mAP=0.438.pth` via `convert_cnn14`.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from consistencytta_tpu.configs import STFTConfig
from consistencytta_tpu.ops.mel import mel_filterbank, real_dft_basis
from consistencytta_tpu.ops.stft import stft_power


@dataclass(frozen=True)
class Cnn14Config:
    sample_rate: int = 16000
    window_size: int = 512
    hop_size: int = 160
    mel_bins: int = 64
    fmin: float = 50.0
    fmax: float = 8000.0
    classes_num: int = 527
    amin: float = 1e-10


class BatchNormInference(nn.Module):
    """Affine BN using stored running stats (eval mode only)."""

    features: int
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        mean = self.param("mean", nn.initializers.zeros, (self.features,), jnp.float32)
        var = self.param("var", nn.initializers.ones, (self.features,), jnp.float32)
        inv = scale * jax.lax.rsqrt(var + self.epsilon)
        return (x - mean) * inv + bias


class ConvBlock(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, x, pool: int):
        x = nn.Conv(
            self.out_channels, (3, 3), padding=1, use_bias=False, name="conv1"
        )(x)
        x = jax.nn.relu(BatchNormInference(self.out_channels, name="bn1")(x))
        x = nn.Conv(
            self.out_channels, (3, 3), padding=1, use_bias=False, name="conv2"
        )(x)
        x = jax.nn.relu(BatchNormInference(self.out_channels, name="bn2")(x))
        if pool > 1:
            x = nn.avg_pool(x, (pool, pool), strides=(pool, pool))
        return x


class Cnn14(nn.Module):
    """waveform [B, T] -> {"2048": [B, 2048], "logits": [B, classes]}."""

    config: Cnn14Config = Cnn14Config()

    def setup(self):
        cfg = self.config
        cos_b, sin_b = real_dft_basis(cfg.window_size, cfg.window_size, "hann")
        self._cos = jnp.asarray(cos_b)
        self._sin = jnp.asarray(sin_b)
        self._mel = jnp.asarray(
            mel_filterbank(
                cfg.sample_rate, cfg.window_size, cfg.mel_bins, cfg.fmin, cfg.fmax
            ).T
        )

    @nn.compact
    def __call__(self, wav: jax.Array) -> Dict[str, jax.Array]:
        cfg = self.config
        # torchlibrosa Spectrogram(power=2) + LogmelFilterBank(ref=1,
        # amin=1e-10, top_db=None): 10*log10(clamp(mel(|stft|^2)))
        power = stft_power(
            wav, self._cos, self._sin, cfg.hop_size, cfg.window_size // 2
        )
        mel = jnp.einsum(
            "bfn,nm->bfm", power, self._mel,
            precision=jax.lax.Precision.HIGHEST,
        )
        logmel = 10.0 * jnp.log10(jnp.clip(mel, cfg.amin, None))

        # bn0 normalizes over the mel axis (torch transposes C<->F)
        x = BatchNormInference(cfg.mel_bins, name="bn0")(logmel)
        x = x[..., None]  # [B, T, mel, 1] NHWC

        channels = [64, 128, 256, 512, 1024, 2048]
        pools = [2, 2, 2, 2, 2, 1]
        for i, (ch, pool) in enumerate(zip(channels, pools)):
            x = ConvBlock(ch, name=f"conv_block{i + 1}")(x, pool)

        # mean over mel axis, then max+mean over time (NHWC: T=1, mel=2)
        x = x.mean(axis=2)  # [B, T', C]
        x = x.max(axis=1) + x.mean(axis=1)  # [B, C]

        x = nn.Dense(2048, name="fc1")(x)
        embedding = jax.nn.relu(x)
        logits = nn.Dense(cfg.classes_num, name="fc_audioset")(embedding)
        return {"2048": embedding, "logits": logits}


def convert_cnn14(sd) -> dict:
    """Torch Cnn14 state dict (the ['model'] tree of the official ckpt) ->
    flax params."""
    from consistencytta_tpu.io.torch_import import conv2d_kernel, linear_kernel

    def bn(prefix):
        return {
            "scale": sd[f"{prefix}.weight"],
            "bias": sd[f"{prefix}.bias"],
            "mean": sd[f"{prefix}.running_mean"],
            "var": sd[f"{prefix}.running_var"],
        }

    p = {"bn0": bn("bn0")}
    for i in range(1, 7):
        p[f"conv_block{i}"] = {
            "conv1": {"kernel": conv2d_kernel(sd[f"conv_block{i}.conv1.weight"])},
            "bn1": bn(f"conv_block{i}.bn1"),
            "conv2": {"kernel": conv2d_kernel(sd[f"conv_block{i}.conv2.weight"])},
            "bn2": bn(f"conv_block{i}.bn2"),
        }
    p["fc1"] = {
        "kernel": linear_kernel(sd["fc1.weight"]), "bias": sd["fc1.bias"]
    }
    p["fc_audioset"] = {
        "kernel": linear_kernel(sd["fc_audioset.weight"]),
        "bias": sd["fc_audioset.bias"],
    }
    return p
