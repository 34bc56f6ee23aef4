"""Pallas STFT kernel vs the XLA reference path (interpreter mode on CPU)."""

import numpy as np
import pytest

from consistencytta_tpu.configs import STFTConfig
from consistencytta_tpu.ops.stft import MelFrontend, stft_magnitude


class TestPallasSTFT:
    def test_matches_xla_path(self, rng):
        import jax

        from consistencytta_tpu.ops import pallas_stft
        from jax.experimental.pallas import tpu as pltpu

        frontend = MelFrontend(STFTConfig())
        wav = (rng.standard_normal((2, 32000)) * 0.3).astype(np.float32)

        want = np.asarray(
            stft_magnitude(
                wav, frontend.cos_basis, frontend.sin_basis,
                hop_length=160, center_pad=512,
            )
        )
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(
                pallas_stft.stft_magnitude_pallas(
                    wav, frontend.cos_basis, frontend.sin_basis,
                    hop_length=160, center_pad=512,
                )
            )
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-4)
