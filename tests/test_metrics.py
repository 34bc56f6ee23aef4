"""Metric-math parity tests against the reference audioldm_eval formulas."""

import importlib.util
import os

import numpy as np
import pytest

from consistencytta_tpu.evaluation.metrics import (
    clap_scores,
    frechet_distance,
    inception_score,
    kernel_inception_distance,
    kl_divergence_paired,
    log_spectral_distance,
    psnr,
    ssim,
)
from tests.conftest import REFERENCE_ROOT, reference_available

requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)


def load_ref_module(name):
    path = os.path.join(REFERENCE_ROOT, "audioldm_eval", "metrics", f"{name}.py")
    spec = importlib.util.spec_from_file_location(f"ref_{name}", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@requires_reference
class TestAgainstReference:
    def setup_method(self, _):
        self.rng = np.random.default_rng(0)

    def test_frechet_distance(self):
        import torch

        ref_fid = load_ref_module("fid")
        f1 = self.rng.standard_normal((64, 32)).astype(np.float64)
        f2 = (self.rng.standard_normal((64, 32)) + 0.3).astype(np.float64)
        want = ref_fid.calculate_fid(
            {"2048": torch.from_numpy(f1)}, {"2048": torch.from_numpy(f2)}, "2048"
        )["frechet_distance"]
        got = frechet_distance(f1, f2)
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_kl(self):
        import torch

        ref_kl = load_ref_module("kl")
        logits1 = self.rng.standard_normal((20, 50)).astype(np.float32)
        logits2 = self.rng.standard_normal((20, 50)).astype(np.float32)
        names = [f"f{i}.wav" for i in range(20)]
        want, _, _ = ref_kl.calculate_kl(
            {"logits": torch.from_numpy(logits1), "file_path_": names},
            {"logits": torch.from_numpy(logits2), "file_path_": names},
            "logits",
            same_name=True,
        )
        got = kl_divergence_paired(logits1, logits2)
        np.testing.assert_allclose(
            got["kullback_leibler_divergence_softmax"],
            want["kullback_leibler_divergence_softmax"],
            rtol=1e-4,
        )
        np.testing.assert_allclose(
            got["kullback_leibler_divergence_sigmoid"],
            want["kullback_leibler_divergence_sigmoid"],
            rtol=1e-4,
        )

    def test_inception_score(self):
        import torch

        ref_isc = load_ref_module("isc")
        logits = self.rng.standard_normal((100, 30)).astype(np.float32)
        want = ref_isc.calculate_isc(
            {"logits": torch.from_numpy(logits)},
            feat_layer_name="logits",
            rng_seed=2020,
            samples_shuffle=True,
            splits=10,
        )
        got = inception_score(logits)
        np.testing.assert_allclose(
            got["inception_score_mean"], want["inception_score_mean"], rtol=1e-6
        )
        np.testing.assert_allclose(
            got["inception_score_std"], want["inception_score_std"], rtol=1e-5
        )

    def test_kid(self):
        import torch

        ref_kid = load_ref_module("kid")
        f1 = self.rng.standard_normal((40, 16)).astype(np.float64)
        f2 = (self.rng.standard_normal((40, 16)) * 1.2).astype(np.float64)
        want = ref_kid.calculate_kid(
            {"2048": torch.from_numpy(f1)},
            {"2048": torch.from_numpy(f2)},
            subsets=10,
            subset_size=20,
            degree=3,
            gamma=None,
            coef0=1,
            rng_seed=2020,
            feat_layer_name="2048",
        )
        got = kernel_inception_distance(f1, f2, subsets=10, subset_size=20)
        np.testing.assert_allclose(
            got["kernel_inception_distance_mean"],
            want["kernel_inception_distance_mean"],
            rtol=1e-6,
        )


class TestStandalone:
    def test_psnr_ssim_identity(self):
        img = np.random.default_rng(1).random((64, 64))
        assert psnr(img, img) == float("inf")
        np.testing.assert_allclose(ssim(img, img), 1.0, atol=1e-9)

    def test_ssim_matches_skimage_if_available(self):
        try:
            from skimage.metrics import structural_similarity as sk_ssim
        except ImportError:
            pytest.skip("skimage not installed")
        rng = np.random.default_rng(2)
        a = rng.random((48, 48))
        b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1)
        np.testing.assert_allclose(
            ssim(a, b, data_range=1.0), sk_ssim(a, b, data_range=1.0), rtol=1e-6
        )

    def test_clap_scores_clamped(self):
        rng = np.random.default_rng(3)
        a = rng.standard_normal((10, 8))
        out = clap_scores(a, -a, a)  # gen = -gt: negative sims clamp to 0
        assert out["gen_gt_clap_score"] == 0.0
        assert out["gt_text_clap_score"] == pytest.approx(100.0)

    def test_lsd_zero_for_identical(self):
        rng = np.random.default_rng(4)
        wav = rng.standard_normal(16000).astype(np.float32)
        # identical signals, offset applied to gen only -> compare vs shifted
        out = log_spectral_distance(
            np.concatenate([np.zeros(160 * 7, np.float32), wav]), wav
        )
        assert out["lsd"] < 1e-6
        assert out["ssim_stft"] > 0.999
