"""Audio IO + native kernel tests: resampler parity (C vs JAX), wav
round-trip, the reference's exact double normalization."""

import numpy as np
import pytest

from consistencytta_tpu.io.audio import (
    normalize_wav,
    pad_wav,
    read_wav,
    read_wav_file,
    write_wav,
)
from consistencytta_tpu.io.native import get_lib, normalize_native, resample_native
from consistencytta_tpu.ops.resample import resample_numpy


class TestResampler:
    def test_preserves_tone_frequency(self, rng):
        """440 Hz at 44.1k stays 440 Hz at 16k (spectral peak check)."""
        sr_in, sr_out = 44100, 16000
        t = np.arange(sr_in) / sr_in
        tone = np.sin(2 * np.pi * 440 * t).astype(np.float32)
        out = resample_numpy(tone, sr_in, sr_out)
        assert abs(len(out) - sr_out) <= 1
        spec = np.abs(np.fft.rfft(out[:sr_out]))
        assert abs(spec.argmax() - 440) <= 1

    def test_bandlimiting(self, rng):
        """Content above the target Nyquist is (mostly) removed."""
        sr_in, sr_out = 48000, 16000
        t = np.arange(sr_in) / sr_in
        hi = np.sin(2 * np.pi * 10000 * t).astype(np.float32)  # above 8 kHz
        out = resample_numpy(hi, sr_in, sr_out)
        assert np.abs(out[1000:-1000]).max() < 0.01

    def test_identity_when_equal(self, rng):
        x = rng.standard_normal(1000).astype(np.float32)
        np.testing.assert_array_equal(resample_numpy(x, 16000, 16000), x)

    def test_native_matches_jax(self, rng):
        if get_lib() is None:
            pytest.skip("no C compiler available")
        x = (rng.standard_normal(44100) * 0.3).astype(np.float32)
        want = resample_numpy(x, 44100, 16000)
        got = resample_native(x, 44100, 16000)
        assert got is not None and got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=2e-6, rtol=1e-4)

    def test_native_upsample_matches_jax(self, rng):
        if get_lib() is None:
            pytest.skip("no C compiler available")
        x = (rng.standard_normal(16000) * 0.3).astype(np.float32)
        want = resample_numpy(x, 16000, 48000)
        got = resample_native(x, 16000, 48000)
        np.testing.assert_allclose(got, want, atol=2e-6, rtol=1e-4)

    def test_native_normalize_matches_numpy(self, rng):
        if get_lib() is None:
            pytest.skip("no C compiler available")
        x = (rng.standard_normal(5000) * 3 + 0.5).astype(np.float32)
        want = normalize_wav(x.astype(np.float64))
        got = normalize_native(x)
        np.testing.assert_allclose(got, want, atol=1e-6)


class TestWavIO:
    def test_round_trip(self, tmp_path, rng):
        wav = (rng.standard_normal(16000) * 0.3).clip(-1, 1)
        path = str(tmp_path / "t.wav")
        write_wav(path, wav, 16000)
        back, sr = read_wav(path)
        assert sr == 16000
        np.testing.assert_allclose(back, wav, atol=2.0 / 32767)

    def test_read_wav_file_full_chain(self, tmp_path, rng):
        """Both peak-normalizations target 0.5: the second is a no-op for
        full-length clips but re-normalizes cropped ones
        (reference torch_tools.py:54-75)."""
        wav = rng.standard_normal(20000) * 0.8
        path = str(tmp_path / "t.wav")
        write_wav(path, wav.clip(-1, 1), 16000)
        out = read_wav_file(path, segment_length=32000)
        assert out.shape == (32000,)
        assert abs(np.abs(out).max() - 0.5) < 0.01
        assert (out[20000:] == 0).all()  # zero-padded tail

    def test_pad_crop(self):
        assert len(pad_wav(np.zeros(10), 5)) == 5
        assert len(pad_wav(np.zeros(3), 5)) == 5
        assert pad_wav(np.ones(3), None).shape == (3,)


def test_write_wav_matches_reference_int16_quantization(tmp_path):
    """Written samples must equal the reference's no-grad inference path:
    vocoder_infer quantizes (wav * 32768).astype("int16") (truncation,
    hifigan/utilities.py:85-88) and sf.write stores them verbatim
    (inference.py:222-223) — eval reads those files, so ours must be
    bit-identical."""
    from scipy.io import wavfile

    rng = np.random.default_rng(0)
    wav = rng.uniform(-0.99, 0.99, 1600).astype(np.float32)
    path = str(tmp_path / "q.wav")
    write_wav(path, wav, 16000)
    sr, data = wavfile.read(path)
    assert sr == 16000 and data.dtype == np.int16
    want = (wav.astype(np.float64) * 32768.0).astype(np.int16)
    np.testing.assert_array_equal(data, want)
