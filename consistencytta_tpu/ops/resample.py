"""Kaiser-windowed sinc resampling (polyphase), torchaudio-compatible.

Two call sites in the reference:
  * data loading: resampy kaiser_best to 16 kHz (tools/torch_tools.py:54-67)
  * stage-3 CLAP loss: torchaudio `sinc_interp_kaiser` 16 -> 48 kHz with
    lowpass_filter_width=64, rolloff=0.9475937167399596,
    beta=14.769656459379492 (tools/losses.py:300-305) — parameters that are
    themselves resampy's kaiser_best settings.

This module implements the torchaudio polyphase algorithm with those
defaults: a [new_freq, kernel_width] filter bank built once on the host, and
a strided conv on device. The conv is a single MXU matmul per output phase —
TPU-native and differentiable (the stage-3 CLAP loss backprops through it).
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

KAISER_BEST_ROLLOFF = 0.9475937167399596
KAISER_BEST_BETA = 14.769656459379492
KAISER_BEST_WIDTH = 64


@lru_cache(maxsize=32)
def _sinc_resample_kernel(
    orig_freq: int,
    new_freq: int,
    lowpass_filter_width: int = KAISER_BEST_WIDTH,
    rolloff: float = KAISER_BEST_ROLLOFF,
    beta: float = KAISER_BEST_BETA,
):
    """Returns (kernel [new_freq_g, 1, width], width) for the gcd-reduced
    frequencies, matching torchaudio _get_sinc_resample_kernel."""
    from scipy.special import i0

    g = math.gcd(orig_freq, new_freq)
    orig, new = orig_freq // g, new_freq // g

    base_freq = min(orig, new) * rolloff
    width = math.ceil(lowpass_filter_width * orig / base_freq)

    idx = np.arange(-width, width + orig, dtype=np.float64)[None, :] / orig
    t = np.arange(0, -new, -1, dtype=np.float64)[:, None] / new + idx
    t = np.clip(t * base_freq, -lowpass_filter_width, lowpass_filter_width)

    window = i0(beta * np.sqrt(1 - (t / lowpass_filter_width) ** 2)) / i0(beta)
    t = t * np.pi
    kernel = np.where(t == 0, 1.0, np.sin(t) / np.where(t == 0, 1.0, t)) * window
    kernel = kernel * base_freq / orig

    return kernel.astype(np.float32)[:, None, :], width, orig, new


def resample(
    wav: jax.Array,
    orig_freq: int,
    new_freq: int,
    lowpass_filter_width: int = KAISER_BEST_WIDTH,
    rolloff: float = KAISER_BEST_ROLLOFF,
    beta: float = KAISER_BEST_BETA,
) -> jax.Array:
    """Resample [B, T] -> [B, ceil(T * new/orig)] (torchaudio semantics)."""
    if orig_freq == new_freq:
        return wav
    kernel, width, orig, new = _sinc_resample_kernel(
        orig_freq, new_freq, lowpass_filter_width, rolloff, beta
    )
    b, length = wav.shape
    target_length = int(math.ceil(new * length / orig))

    x = jnp.pad(wav.astype(jnp.float32), ((0, 0), (width, width + orig)))
    # conv: [B, 1, T] * [new, 1, K] stride orig -> [B, new, frames]
    y = jax.lax.conv_general_dilated(
        x[:, None, :],
        jnp.asarray(kernel),
        window_strides=(orig,),
        padding=[(0, 0)],
        dimension_numbers=("NCW", "OIW", "NCW"),
    )
    # interleave phases: [B, new, frames] -> [B, frames * new]
    y = jnp.swapaxes(y, 1, 2).reshape(b, -1)
    return y[:, :target_length]


def resample_numpy(wav: np.ndarray, orig_freq: int, new_freq: int) -> np.ndarray:
    """Host-side resampling for the data pipeline (same math, numpy conv)."""
    if orig_freq == new_freq:
        return wav
    squeeze = wav.ndim == 1
    if squeeze:
        wav = wav[None, :]
    out = np.asarray(resample(jnp.asarray(wav), orig_freq, new_freq))
    return out[0] if squeeze else out
