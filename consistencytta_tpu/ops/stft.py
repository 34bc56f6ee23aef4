"""STFT-as-matmul mel frontend (TPU-native).

The reference computes its training mel spectrogram with a conv1d against a
precomputed windowed real-DFT basis followed by a mel filterbank matmul and a
log dynamic-range compression (reference audioldm/audio/stft.py:15-186,
audioldm/audio/audio_processing.py dynamic_range_compression =
log(clamp(x, 1e-5))). On TPU the same computation is expressed as two large
matmuls that map straight onto the MXU:

    frames[B, n_frames, filter_length] @ dft_basis[filter_length, 2 * n_bins]
    -> magnitude -> @ mel_fb.T[n_bins, n_mels] -> log

Frame extraction uses ``lax.conv_general_dilated_patches`` (a strided window
gather XLA lowers natively). A fused Pallas kernel for the framing+matmul is
provided in ``consistencytta_tpu.ops.pallas_stft`` and is used when
``use_pallas=True``.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from consistencytta_tpu.configs import STFTConfig
from consistencytta_tpu.ops.mel import mel_filterbank, real_dft_basis


import functools as _functools


@_functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def frame_signal(wav: jax.Array, frame_length: int, hop: int) -> jax.Array:
    """Extract overlapping frames: [B, T] -> [B, n_frames, frame_length].

    Carries a custom VJP: XLA's autodiff of the patches op lowers to a
    pathological program on TPU (measured ~5 s for one 48 kHz clip batch in
    the stage-3 CLAP backward); the hand-written backward is the exact
    overlap-add transpose built from chunk reshapes + static-slice adds."""
    patches = jax.lax.conv_general_dilated_patches(
        wav[:, None, :],  # [B, C=1, T]
        filter_shape=(frame_length,),
        window_strides=(hop,),
        padding="VALID",
    )  # [B, frame_length, n_frames]
    return jnp.swapaxes(patches, 1, 2)


def _frame_signal_fwd(wav, frame_length, hop):
    return frame_signal(wav, frame_length, hop), wav.shape


def _frame_signal_bwd(frame_length, hop, res, g):
    """Overlap-add: dwav[n] = sum over frames k and offsets j with
    k*hop + j == n of g[k, j]. Decompose j = c*hop + r: each chunk c is a
    contiguous [B, F*hop] run starting at sample c*hop — reshapes and
    static-slice adds only, no scatter."""
    b, t = res
    dtype = g.dtype
    f = g.shape[1]
    g = g.astype(jnp.float32)
    dwav = jnp.zeros((b, t), jnp.float32)
    n_chunks = -(-frame_length // hop)
    for c in range(n_chunks):
        seg = g[:, :, c * hop : min((c + 1) * hop, frame_length)]
        w = seg.shape[-1]
        if w < hop:
            seg = jnp.pad(seg, ((0, 0), (0, 0), (0, hop - w)))
        flat = seg.reshape(b, f * hop)
        start = c * hop
        length = min(f * hop, t - start)
        dwav = dwav.at[:, start : start + length].add(flat[:, :length])
    return (dwav.astype(dtype),)


frame_signal.defvjp(_frame_signal_fwd, _frame_signal_bwd)


def stft_magnitude(
    wav: jax.Array,
    cos_basis: jax.Array,
    sin_basis: jax.Array,
    hop_length: int,
    center_pad: int,
) -> jax.Array:
    """Magnitude STFT of [B, T] -> [B, n_frames, n_bins].

    Matches reference STFT.transform (audioldm/audio/stft.py:52-84): reflect
    padding of filter_length//2 on both sides, conv against the windowed DFT
    basis, then sqrt(re^2 + im^2).
    """
    wav = wav.astype(jnp.float32)
    if center_pad:
        wav = jnp.pad(wav, ((0, 0), (center_pad, center_pad)), mode="reflect")
    frames = frame_signal(wav, cos_basis.shape[0], hop_length)
    basis = jnp.concatenate([cos_basis, sin_basis], axis=1)  # [L, 2*n_bins]
    # HIGHEST precision: the frontend feeds training statistics, and TPU
    # default (bf16 passes) loses ~3 decimal digits on the DFT accumulation.
    spec = jnp.einsum(
        "bfl,lc->bfc",
        frames,
        basis,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    n_bins = cos_basis.shape[1]
    re, im = spec[..., :n_bins], spec[..., n_bins:]
    return jnp.sqrt(re * re + im * im)


def stft_power(
    wav: jax.Array,
    cos_basis: jax.Array,
    sin_basis: jax.Array,
    hop_length: int,
    center_pad: int,
) -> jax.Array:
    """Power spectrogram re^2 + im^2 of [B, T] -> [B, n_frames, n_bins].

    Differentiable everywhere (no sqrt-at-zero singularity) — used by the
    gradient-carrying CLAP path (stage-3 fine-tune) and the power-based
    torchlibrosa frontends (Cnn14/HTSAT)."""
    wav = wav.astype(jnp.float32)
    if center_pad:
        wav = jnp.pad(wav, ((0, 0), (center_pad, center_pad)), mode="reflect")
    frames = frame_signal(wav, cos_basis.shape[0], hop_length)
    basis = jnp.concatenate([cos_basis, sin_basis], axis=1)
    spec = jnp.einsum(
        "bfl,lc->bfc",
        frames,
        basis,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    n_bins = cos_basis.shape[1]
    re, im = spec[..., :n_bins], spec[..., n_bins:]
    return re * re + im * im


class MelFrontend:
    """Waveform -> log-mel spectrogram, the TacotronSTFT equivalent.

    Usage::

        frontend = MelFrontend(STFTConfig())
        mel = frontend(wav)            # [B, T_samples] -> [B, n_frames, 64]
        mel = frontend.to_fixed(mel)   # pad/crop frames to 1024

    All constants are baked as jnp arrays at construction; __call__ is pure
    and jit-safe. Reference behavior: audioldm/audio/stft.py:136-186 plus the
    frame padding of tools/torch_tools.py:38-51,126-135.
    """

    def __init__(self, config: STFTConfig = STFTConfig(), use_pallas=None):
        self.config = config
        cos_b, sin_b = real_dft_basis(
            config.filter_length, config.win_length, window="hann"
        )
        mel_fb = mel_filterbank(
            sr=config.sampling_rate,
            n_fft=config.filter_length,
            n_mels=config.n_mel_channels,
            fmin=config.mel_fmin,
            fmax=config.mel_fmax,
        )
        self.cos_basis = jnp.asarray(cos_b)
        self.sin_basis = jnp.asarray(sin_b)
        self.mel_fb_t = jnp.asarray(mel_fb.T)  # [n_bins, n_mels]
        if use_pallas is None:
            # default on TPU: the fused kernel is both faster and ~100x more
            # accurate there (the XLA einsum runs bf16 passes on TPU even at
            # Precision.HIGHEST under --xla_allow_excess_precision; the
            # kernel does an explicit bf16x3 split)
            use_pallas = jax.default_backend() == "tpu"
        self.use_pallas = use_pallas

    @property
    def n_bins(self) -> int:
        return self.config.filter_length // 2 + 1

    def magnitude(self, wav: jax.Array) -> jax.Array:
        """[B, T] -> [B, n_frames, n_bins] magnitude spectrogram."""
        if self.use_pallas:
            from consistencytta_tpu.ops.pallas_stft import stft_magnitude_pallas

            return stft_magnitude_pallas(
                wav,
                self.cos_basis,
                self.sin_basis,
                hop_length=self.config.hop_length,
                center_pad=self.config.filter_length // 2,
            )
        return stft_magnitude(
            wav,
            self.cos_basis,
            self.sin_basis,
            hop_length=self.config.hop_length,
            center_pad=self.config.filter_length // 2,
        )

    def __call__(self, wav: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """[B, T] waveform in [-1, 1] -> (log-mel [B, n_frames, n_mels],
        log-magnitude [B, n_frames, n_bins]).

        Matches TacotronSTFT.mel_spectrogram (audioldm/audio/stft.py:165-186):
        clamp+sanitize input, magnitude STFT, mel matmul, log-compression with
        a 1e-5 floor on both outputs.
        """
        wav = jnp.nan_to_num(jnp.clip(wav, -1.0, 1.0))
        mag = self.magnitude(wav)
        mel = jnp.einsum(
            "bfn,nm->bfm",
            mag,
            self.mel_fb_t,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        clip = self.config.compression_clip
        return (
            jnp.log(jnp.clip(mel, clip, None)),
            jnp.log(jnp.clip(mag, clip, None)),
        )

    def to_fixed(self, mel: jax.Array, target_frames: int = 1024) -> jax.Array:
        """Pad (zeros) or crop the frame axis to `target_frames`, and drop the
        last mel channel if the channel count is odd.

        Matches tools/torch_tools.py:_pad_spec (:38-51).
        """
        n = mel.shape[1]
        if n < target_frames:
            mel = jnp.pad(mel, ((0, 0), (0, target_frames - n), (0, 0)))
        elif n > target_frames:
            mel = mel[:, :target_frames]
        if mel.shape[-1] % 2 != 0:
            mel = mel[..., :-1]
        return mel

    def wav_to_mel_image(
        self, wav: jax.Array, target_frames: int = 1024
    ) -> jax.Array:
        """[B, T] -> [B, target_frames, n_mels, 1] NHWC mel 'image' for the
        VAE encoder (the reference's mel.unsqueeze(1) in NCHW; we use NHWC)."""
        mel, _ = self(wav)
        return self.to_fixed(mel, target_frames)[..., None]
