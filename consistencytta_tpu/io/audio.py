"""Waveform file IO and preprocessing (host-side, numpy).

Parity target: tools/torch_tools.py:25-75 — wav read -> mono -> kaiser-sinc
resample to 16 kHz -> mean-center -> peak-normalize to 0.5 -> pad/crop to the
segment length -> peak-normalize again (the reference's double normalization,
which shapes the mel distribution and is reproduced deliberately).

Reading uses the stdlib/scipy wav stack (no soundfile dependency); FLAC/MP3
sources must be converted to wav offline.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from consistencytta_tpu.ops.resample import resample_numpy


def read_wav(path: str) -> Tuple[np.ndarray, int]:
    """Read a wav file -> (float64 mono waveform in [-1, 1], sample_rate)."""
    from scipy.io import wavfile

    sr, data = wavfile.read(path)
    if data.dtype == np.int16:
        wav = data.astype(np.float64) / 32768.0
    elif data.dtype == np.int32:
        wav = data.astype(np.float64) / 2147483648.0
    elif data.dtype == np.uint8:
        wav = (data.astype(np.float64) - 128.0) / 128.0
    else:
        wav = data.astype(np.float64)
    if wav.ndim > 1:
        wav = wav.mean(axis=1)  # librosa.to_mono equivalent
    return wav, int(sr)


def write_wav(path: str, wav: np.ndarray, sr: int = 16000) -> None:
    """Write float waveform as 16-bit PCM, bit-equivalent to the reference's
    no-grad inference path: vocoder_infer quantizes `(wav * 32768).astype
    ("int16")` (truncation, no clip — hifigan/utilities.py:76-91) and
    sf.write stores those samples verbatim (inference.py:222-223). The
    DC-centered tanh output is always inside (-1, 1), so the scale never
    overflows; inputs are clipped defensively for other callers."""
    from scipy.io import wavfile

    pcm = np.clip(np.asarray(wav, np.float64), -1.0, 32767.0 / 32768.0)
    wavfile.write(path, sr, (pcm * 32768.0).astype(np.int16))


def pad_wav(wav: np.ndarray, segment_length: Optional[int]) -> np.ndarray:
    """Crop or zero-pad to segment_length (tools/torch_tools.py:25-35)."""
    if segment_length is None or len(wav) == segment_length:
        return wav
    if len(wav) > segment_length:
        return wav[:segment_length]
    return np.pad(wav, (0, segment_length - len(wav)))


def normalize_wav(wav: np.ndarray) -> np.ndarray:
    """mean-center then peak-normalize to 0.5 (torch_tools.py:70-71)."""
    wav = wav - wav.mean()
    return wav / (np.abs(wav).max() + 1e-8) / 2.0


def read_wav_file(
    path: str, segment_length: Optional[int], target_sr: int = 16000
) -> np.ndarray:
    """Full preprocessing chain of the reference (torch_tools.py:54-75):
    read -> mono -> resample -> normalize -> pad -> normalize again.
    Returns float32 [segment_length].

    Uses the native C polyphase resampler (io/native) when available; the
    JAX-CPU conv path is the fallback."""
    from consistencytta_tpu.io.native import resample_native

    wav, sr = read_wav(path)
    if sr != target_sr:
        native = resample_native(wav.astype(np.float32), sr, target_sr)
        if native is not None:
            wav = native.astype(np.float64)
        else:
            wav = resample_numpy(wav.astype(np.float32), sr, target_sr).astype(
                np.float64
            )
    wav = normalize_wav(wav)
    wav = pad_wav(wav, segment_length)
    wav = wav / (np.abs(wav).max() + 1e-8) / 2.0
    return wav.astype(np.float32)
