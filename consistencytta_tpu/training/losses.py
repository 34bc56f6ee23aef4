"""Distillation losses (per-instance reduction), the reference's loss zoo.

Parity target: tools/losses.py. All losses return per-instance vectors [B]
so min-SNR weights can multiply before the mean (reference
`reduction='instance'`, models/audio_consistency_model.py:250-266).

The CLAP loss (stage 3) lives in consistencytta_tpu.evaluation.clap_loss
once the CLAP towers are available; its decode-side plumbing (differentiable
VAE decode + vocoder + 16->48 kHz resample) is shared here.

Known reference bug NOT reproduced: the reference MultiResolutionSTFTLoss
references `self.sr` which is never set (tools/losses.py:240,243), so its
'stft' loss type crashes upstream; here it works, with sr=16000.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from consistencytta_tpu.ops.mel import hann_window


def mse_instance(pred: jax.Array, target: jax.Array) -> jax.Array:
    """Per-instance MSE [B] (tools/losses.py:21-33)."""
    d = (pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2
    return d.mean(axis=tuple(range(1, d.ndim)))


def mel_loss_instance(
    pred_latent: jax.Array,
    target_latent: jax.Array,
    decode_fn: Callable[[jax.Array], jax.Array],
    mse_weight: float = 0.7,
    mel_weight: float = 0.3,
) -> jax.Array:
    """0.7 * latent MSE + 0.3 * decoded-mel MSE (tools/losses.py:36-64).
    `decode_fn` is the differentiable scaled-latent -> mel decoder."""
    mel_pred = decode_fn(pred_latent)
    mel_target = decode_fn(target_latent)
    return mse_weight * mse_instance(pred_latent, target_latent) + (
        mel_weight * mse_instance(mel_pred, mel_target)
    )


def _stft_mag(x: jax.Array, n_fft: int, hop: int, win_length: int) -> jax.Array:
    """torch.stft-compatible magnitude (center=True reflect pad, hann win),
    clamped at 1e-8 like tools/losses.py:145-169. Returns [B, frames, bins]."""
    from consistencytta_tpu.ops.stft import frame_signal

    window = np.zeros(n_fft, np.float32)
    lpad = (n_fft - win_length) // 2
    window[lpad : lpad + win_length] = hann_window(win_length)

    n_bins = n_fft // 2 + 1
    k = np.arange(n_bins)[None, :]
    n = np.arange(n_fft)[:, None]
    ang = 2.0 * np.pi * k * n / n_fft
    basis = np.concatenate(
        [np.cos(ang) * window[:, None], -np.sin(ang) * window[:, None]], axis=1
    ).astype(np.float32)

    x = jnp.pad(x.astype(jnp.float32), ((0, 0), (n_fft // 2, n_fft // 2)), "reflect")
    frames = frame_signal(x, n_fft, hop)
    spec = jnp.einsum(
        "bfl,lc->bfc", frames, jnp.asarray(basis),
        precision=jax.lax.Precision.HIGHEST,
    )
    re, im = spec[..., :n_bins], spec[..., n_bins:]
    return jnp.sqrt(jnp.clip(re * re + im * im, 1e-8, None))


@dataclass(frozen=True)
class MultiResolutionSTFTLoss:
    """MSE + multi-resolution spectral-convergence + log-magnitude losses on
    decoded waveforms (tools/losses.py:187-256; shipped weights
    factor_sc=0.1, factor_mag=0.1, factor_mse=0.8 per
    models/audio_consistency_model.py:95-99)."""

    fft_sizes: Sequence[int] = (1024, 2048, 512)
    hop_sizes: Sequence[int] = (120, 240, 50)
    win_lengths: Sequence[int] = (600, 1200, 240)
    factor_sc: float = 0.1
    factor_mag: float = 0.1
    factor_mse: float = 0.8
    sr: int = 16000

    def __call__(
        self,
        pred_latent: jax.Array,
        target_latent: jax.Array,
        decode_to_wav: Callable[[jax.Array], jax.Array],
    ) -> jax.Array:
        mse = mse_instance(pred_latent, target_latent)

        wav_pred = decode_to_wav(pred_latent)[:, : self.sr * 10]
        wav_target = decode_to_wav(target_latent)[:, : self.sr * 10]

        sc_total = jnp.zeros(pred_latent.shape[0])
        mag_total = jnp.zeros(pred_latent.shape[0])
        for n_fft, hop, win in zip(self.fft_sizes, self.hop_sizes, self.win_lengths):
            m_pred = _stft_mag(wav_pred, n_fft, hop, win)
            m_tgt = _stft_mag(wav_target, n_fft, hop, win)
            axes = tuple(range(1, m_pred.ndim))
            sc_total = sc_total + jnp.linalg.norm(
                (m_tgt - m_pred).reshape(m_pred.shape[0], -1), axis=1
            ) / jnp.linalg.norm(m_tgt.reshape(m_tgt.shape[0], -1), axis=1)
            mag_total = mag_total + jnp.abs(
                jnp.log(m_tgt) - jnp.log(m_pred)
            ).mean(axis=axes)
        n = len(self.fft_sizes)
        return (
            self.factor_mse * mse
            + self.factor_sc * sc_total / n
            + self.factor_mag * mag_total / n
        )
