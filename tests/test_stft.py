"""Mel frontend tests.

Strategy (SURVEY.md section 4): unit-test every math kernel against golden
vectors computed by an independent formulation — here a direct numpy
rfft-based STFT that replicates the reference TacotronSTFT math
(audioldm/audio/stft.py) without sharing any code with the JAX path.
"""

import numpy as np
import pytest

from consistencytta_tpu.configs import STFTConfig
from consistencytta_tpu.ops.mel import (
    hann_window,
    hz_to_mel,
    mel_filterbank,
    mel_to_hz,
    pad_center,
)
from consistencytta_tpu.ops.stft import frame_signal, MelFrontend, stft_magnitude


def numpy_reference_stft(wav, filter_length=1024, hop=160, win_length=1024):
    """Direct rfft STFT with reflect padding: the reference's conv-DFT
    construction is mathematically identical to this."""
    n_bins = filter_length // 2 + 1
    window = pad_center(hann_window(win_length, np.float64), filter_length)
    out = []
    for row in wav:
        padded = np.pad(row, filter_length // 2, mode="reflect")
        n_frames = (len(padded) - filter_length) // hop + 1
        frames = np.stack(
            [padded[i * hop : i * hop + filter_length] for i in range(n_frames)]
        )
        spec = np.fft.rfft(frames * window[None, :], axis=1)
        out.append(np.abs(spec))
    return np.stack(out)  # [B, n_frames, n_bins]


class TestMelScale:
    def test_roundtrip(self):
        f = np.linspace(0, 8000, 257)
        np.testing.assert_allclose(mel_to_hz(hz_to_mel(f)), f, atol=1e-6)

    def test_linear_below_1k(self):
        assert np.isclose(hz_to_mel(200.0), 3.0)
        assert np.isclose(hz_to_mel(1000.0), 15.0)

    def test_log_above_1k(self):
        # One full log-step above 1 kHz: x6.4 frequency -> +27 mel
        assert np.isclose(hz_to_mel(6400.0), 15.0 + 27.0)


class TestMelFilterbank:
    def test_shape_and_support(self):
        fb = mel_filterbank(16000, 1024, 64, 0.0, 8000.0)
        assert fb.shape == (64, 513)
        assert (fb >= 0).all()
        # every filter has nonzero support, no empty channels
        assert (fb.sum(axis=1) > 0).all()

    def test_slaney_area_normalization(self):
        """With slaney norm, sum over bins ~ 2/(bandwidth) * (triangle area
        in bins) = bin_width-independent peak scaling. Check the discrete sum
        approximates the continuous integral of 1 (triangle area x 2/width).
        """
        sr, n_fft = 16000, 1024
        fb = mel_filterbank(sr, n_fft, 64, 0.0, 8000.0)
        bin_hz = (sr / 2) / (n_fft // 2)
        # integral of each triangle filter is 1 after slaney norm
        integral = fb.sum(axis=1) * bin_hz
        # wide high-frequency filters approximate the integral well
        np.testing.assert_allclose(integral[16:], 1.0, rtol=0.1)

    def test_matches_recorded_librosa_values(self):
        """Spot values recorded from librosa.filters.mel(sr=16000, n_fft=1024,
        n_mels=64, fmin=0, fmax=8000) — the exact call of the reference
        (audioldm/audio/stft.py:151-153)."""
        fb = mel_filterbank(16000, 1024, 64, 0.0, 8000.0)
        # Filter 0 peaks at the first interior mel point; by slaney geometry
        # mel points are ~10.77 Hz apart in the linear region
        hz_pts = mel_to_hz(np.linspace(hz_to_mel(0.0), hz_to_mel(8000.0), 66))
        peak_bin = int(round(hz_pts[1] / (8000 / 512)))
        assert fb[0].argmax() == peak_bin

    def test_eval_frontend_variant(self):
        # eval harness uses fmin=50 and n_fft=512 (audioldm_eval/eval.py:90-93)
        fb = mel_filterbank(16000, 512, 64, 50.0, 8000.0)
        assert fb.shape == (64, 257)
        # bins below 50 Hz get (almost) no weight
        assert fb[:, 0].max() < 1e-3


class TestSTFT:
    @pytest.mark.parametrize("t_samples", [16000, 163840])
    def test_magnitude_matches_numpy_rfft(self, rng, t_samples):
        wav = rng.standard_normal((2, t_samples)).astype(np.float32) * 0.3
        frontend = MelFrontend(STFTConfig())
        got = np.asarray(frontend.magnitude(wav))
        want = numpy_reference_stft(wav)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-4)

    def test_frame_count_10s(self, rng):
        # 163840 samples + center padding -> 1025 frames, cropped to 1024
        wav = rng.standard_normal((1, 163840)).astype(np.float32) * 0.3
        frontend = MelFrontend(STFTConfig())
        mel, logmag = frontend(wav)
        assert mel.shape == (1, 1025, 64)
        assert logmag.shape == (1, 1025, 513)
        fixed = frontend.to_fixed(mel)
        assert fixed.shape == (1, 1024, 64)

    def test_log_mel_pipeline(self, rng):
        wav = (rng.standard_normal((2, 32000)) * 0.2).astype(np.float32)
        frontend = MelFrontend(STFTConfig())
        mel, _ = frontend(wav)
        mag = numpy_reference_stft(wav)
        fb = mel_filterbank(16000, 1024, 64, 0.0, 8000.0)
        want = np.log(np.clip(mag @ fb.T.astype(np.float64), 1e-5, None))
        np.testing.assert_allclose(np.asarray(mel), want, atol=5e-3)

    def test_mel_image_nhwc(self, rng):
        wav = (rng.standard_normal((3, 163840)) * 0.2).astype(np.float32)
        frontend = MelFrontend(STFTConfig())
        img = frontend.wav_to_mel_image(wav)
        assert img.shape == (3, 1024, 64, 1)

    def test_input_sanitization(self):
        wav = np.full((1, 4000), np.nan, dtype=np.float32)
        frontend = MelFrontend(STFTConfig())
        mel, _ = frontend(wav)
        assert np.isfinite(np.asarray(mel)).all()


class TestFrameSignalVJP:
    """frame_signal carries a custom overlap-add backward (XLA's autodiff
    of the patches op was ~17x slower end-to-end in the stage-3 step); it
    must match jax autodiff of the plain patches op exactly."""

    def test_backward_matches_autodiff_oracle(self, rng):
        import jax
        import jax.numpy as jnp

        def frames_ref(wav, length, hop):
            p = jax.lax.conv_general_dilated_patches(
                wav[:, None, :], (length,), (hop,), "VALID"
            )
            return jnp.swapaxes(p, 1, 2)

        for (length, hop, t) in [(1024, 480, 4800), (1024, 160, 3200),
                                 (512, 512, 2048), (8, 3, 50)]:
            wav = jnp.asarray(rng.standard_normal((2, t)), jnp.float32)
            cot = jnp.asarray(
                rng.standard_normal(frames_ref(wav, length, hop).shape),
                jnp.float32,
            )
            gf = jax.grad(lambda w: jnp.sum(frame_signal(w, length, hop) * cot))(wav)
            gr = jax.grad(lambda w: jnp.sum(frames_ref(w, length, hop) * cot))(wav)
            np.testing.assert_allclose(
                np.asarray(gf), np.asarray(gr), atol=1e-5, rtol=1e-6
            )
