"""VGGish embedding model in JAX — the FAD backbone.

Parity target: the torchvggish hub model used by the reference FAD
(audioldm_eval/metrics/fad.py:53-59, postprocess=False and the final ReLU
stripped), including its idiosyncratic frontend (vggish_input /
mel_features from the original TF VGGish):

  * 16 kHz waveform, NO STFT centering, frame 400 samples / hop 160,
    periodic Hann, |rfft| at fft_length 512 (magnitude, not power),
  * 64 HTK-mel bands 125-7500 Hz built on spectrogram bin centers
    (no Slaney area norm; DC bin excluded),
  * log(mel + 0.01), framed into 0.96-s examples (96 frames, hop 96),
  * VGG conv stack -> flatten (permuted NHWC order) -> 4096-4096-128 MLP,
    returning the raw 128-d linear output per example.

Weights import from the torchvggish checkpoint via `convert_vggish`.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

SAMPLE_RATE = 16000
WIN_LENGTH = 400
HOP_LENGTH = 160
FFT_LENGTH = 512
NUM_BANDS = 64
MEL_MIN_HZ = 125.0
MEL_MAX_HZ = 7500.0
LOG_OFFSET = 0.01
EXAMPLE_FRAMES = 96


def _hz_to_htk_mel(f):
    return 1127.0 * np.log(1.0 + np.asarray(f, np.float64) / 700.0)


def htk_mel_matrix(
    num_bands: int = NUM_BANDS,
    num_bins: int = FFT_LENGTH // 2 + 1,
    sr: int = SAMPLE_RATE,
    fmin: float = MEL_MIN_HZ,
    fmax: float = MEL_MAX_HZ,
) -> np.ndarray:
    """[num_bins, num_bands] mel weight matrix, torchvggish
    mel_features.spectrogram_to_mel_matrix semantics."""
    nyquist = sr / 2.0
    bin_hz = np.linspace(0.0, nyquist, num_bins)
    bin_mel = _hz_to_htk_mel(bin_hz)
    band_edges = np.linspace(
        _hz_to_htk_mel(fmin), _hz_to_htk_mel(fmax), num_bands + 2
    )
    weights = np.zeros((num_bins, num_bands))
    for i in range(num_bands):
        lower, center, upper = band_edges[i : i + 3]
        lower_slope = (bin_mel - lower) / (center - lower)
        upper_slope = (upper - bin_mel) / (upper - center)
        weights[:, i] = np.maximum(0.0, np.minimum(lower_slope, upper_slope))
    weights[0, :] = 0.0  # DC bin excluded
    return weights.astype(np.float32)


def waveform_to_examples(wav: np.ndarray) -> np.ndarray:
    """float waveform [-1, 1] -> [n_examples, 96, 64] log-mel patches
    (torchvggish vggish_input.waveform_to_examples)."""
    window = (
        0.5 - 0.5 * np.cos(2 * np.pi / WIN_LENGTH * np.arange(WIN_LENGTH))
    ).astype(np.float64)

    n_frames = 1 + (len(wav) - WIN_LENGTH) // HOP_LENGTH if len(wav) >= WIN_LENGTH else 0
    if n_frames <= 0:
        return np.zeros((0, EXAMPLE_FRAMES, NUM_BANDS), np.float32)
    idx = (
        np.arange(WIN_LENGTH)[None, :]
        + HOP_LENGTH * np.arange(n_frames)[:, None]
    )
    frames = wav[idx] * window[None, :]
    mag = np.abs(np.fft.rfft(frames, FFT_LENGTH, axis=1))
    mel = mag @ htk_mel_matrix()
    logmel = np.log(mel + LOG_OFFSET)

    n_examples = len(logmel) // EXAMPLE_FRAMES
    if n_examples == 0:
        return np.zeros((0, EXAMPLE_FRAMES, NUM_BANDS), np.float32)
    return (
        logmel[: n_examples * EXAMPLE_FRAMES]
        .reshape(n_examples, EXAMPLE_FRAMES, NUM_BANDS)
        .astype(np.float32)
    )


class VGGish(nn.Module):
    """[N, 96, 64] log-mel examples -> [N, 128] embeddings (final ReLU
    stripped, matching fad.py use_activation=False)."""

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = x[..., None]  # NHWC

        def conv(x, ch, name):
            x = nn.Conv(ch, (3, 3), padding=1, name=name)(x)
            return jax.nn.relu(x)

        x = conv(x, 64, "conv1")
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = conv(x, 128, "conv2")
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = conv(x, 256, "conv3_1")
        x = conv(x, 256, "conv3_2")
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = conv(x, 512, "conv4_1")
        x = conv(x, 512, "conv4_2")
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        # torch flattens NCHW after permute(0,2,3,1) -> (H, W, C) order,
        # which is exactly the NHWC flatten
        x = x.reshape(x.shape[0], -1)  # [N, 6*4*512]
        x = jax.nn.relu(nn.Dense(4096, name="fc1_1")(x))
        x = jax.nn.relu(nn.Dense(4096, name="fc1_2")(x))
        return nn.Dense(128, name="fc2")(x)


def convert_vggish(sd) -> dict:
    """torchvggish state dict -> flax params.

    torch layout: features.{0,3,6,8,11,13}.{weight,bias} (convs),
    embeddings.{0,2,4}.{weight,bias} (linears)."""
    from consistencytta_tpu.io.torch_import import conv2d_kernel, linear_kernel

    conv_map = {
        "conv1": "features.0", "conv2": "features.3",
        "conv3_1": "features.6", "conv3_2": "features.8",
        "conv4_1": "features.11", "conv4_2": "features.13",
    }
    fc_map = {"fc1_1": "embeddings.0", "fc1_2": "embeddings.2", "fc2": "embeddings.4"}

    p = {}
    for ours, theirs in conv_map.items():
        p[ours] = {
            "kernel": conv2d_kernel(sd[f"{theirs}.weight"]),
            "bias": sd[f"{theirs}.bias"],
        }
    for ours, theirs in fc_map.items():
        p[ours] = {
            "kernel": linear_kernel(sd[f"{theirs}.weight"]),
            "bias": sd[f"{theirs}.bias"],
        }
    return p


def load_audio_fad(
    path: str, target_centisec: int = 1000, target_sr: int = 16000
) -> np.ndarray:
    """The FAD loader (reference audioldm_eval/metrics/fad.py:22-36
    load_audio_task): int16 read scaled by 32768, mono mean, integer-ratio
    DECIMATION (else kaiser resample), head crop to target_centisec — and,
    unlike the Cnn14 WaveDataset loader, NO mean-centering and NO 2-s
    minimum pad."""
    from consistencytta_tpu.io.audio import read_wav
    from consistencytta_tpu.ops.resample import resample_numpy

    wav, sr = read_wav(path)
    wav = wav.astype(np.float32)
    if sr != target_sr:
        if sr % target_sr == 0:
            wav = wav[:: sr // target_sr]
        else:
            wav = resample_numpy(wav, sr, target_sr)
    return wav[: int(target_centisec * target_sr / 100)]


def vggish_embeddings(
    paths: List[str], checkpoint: Optional[str], batch: int = 32
) -> Optional[np.ndarray]:
    """Per-example VGGish embeddings for a list of wav files, concatenated
    across files (fad.py:61-79). Returns None without a checkpoint."""
    import os

    if not checkpoint or not os.path.exists(checkpoint):
        return None

    from consistencytta_tpu.io.torch_import import load_torch_state_dict

    sd = load_torch_state_dict(checkpoint)
    params = convert_vggish(sd)
    model = VGGish()
    from consistencytta_tpu.io.torch_import import assert_params_match

    expected = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0), np.zeros((1, 96, 64), np.float32)
        )
    )["params"]
    assert_params_match(params, expected, checkpoint)
    fn = jax.jit(lambda x: model.apply({"params": params}, x))

    examples = [waveform_to_examples(load_audio_fad(p, 1000)) for p in paths]
    all_ex = np.concatenate([e for e in examples if len(e)], axis=0)
    outs = []
    for start in range(0, len(all_ex), batch):
        outs.append(np.asarray(fn(all_ex[start : start + batch])))
    return np.concatenate(outs, axis=0)
