"""Real-checkpoint evaluation integration test (skips without assets).

Run `tools/fetch_checkpoints.sh` first; with the assets in ckpt/ this runs
`EvaluationHelper.main` end-to-end on real Cnn14/VGGish/CLAP weights, and —
when the reference harness's own deps are importable — compares FAD/FD
against `audioldm_eval.EvaluationHelper` on the same wav sets (the round-1
north star: FAD within 2% of the reference harness).
"""

import os

import numpy as np
import pytest

ASSETS = {
    "cnn14": "ckpt/Cnn14_16k_mAP=0.438.pth",
    "vggish": "ckpt/vggish.pth",
    "clap": "ckpt/music_audioset_epoch_15_esc_90.14.pt",
}

have_assets = all(os.path.exists(p) for p in ASSETS.values())

pytestmark = pytest.mark.skipif(
    not have_assets,
    reason="real checkpoints absent; run tools/fetch_checkpoints.sh",
)


@pytest.fixture(scope="module")
def wav_sets(tmp_path_factory):
    from consistencytta_tpu.io.audio import write_wav

    root = tmp_path_factory.mktemp("eval_wavs")
    gen_dir, ref_dir = root / "gen", root / "ref"
    gen_dir.mkdir(), ref_dir.mkdir()
    rng = np.random.default_rng(0)
    sr, n = 16000, 8
    for i in range(n):
        # tonal + noise content so the embeddings are non-degenerate
        t = np.arange(sr * 2) / sr
        base = np.sin(2 * np.pi * (200 + 50 * i) * t)
        write_wav(
            str(gen_dir / f"clip_{i}.wav"),
            (0.5 * base + 0.05 * rng.standard_normal(t.size)).astype(np.float32),
            sr,
        )
        write_wav(
            str(ref_dir / f"clip_{i}.wav"),
            (0.5 * base + 0.05 * rng.standard_normal(t.size)).astype(np.float32),
            sr,
        )
    return str(gen_dir), str(ref_dir)


@pytest.mark.slow
def test_eval_helper_real_checkpoints(wav_sets):
    from consistencytta_tpu.evaluation.harness import EvaluationHelper

    gen_dir, ref_dir = wav_sets
    helper = EvaluationHelper(sampling_rate=16000)
    metrics = helper.main(gen_dir, ref_dir)
    for key in ("frechet_audio_distance", "frechet_distance", "kullback_leibler_divergence_softmax"):
        assert key in metrics, f"{key} missing: {metrics.keys()}"
        assert np.isfinite(metrics[key])


@pytest.mark.slow
def test_fad_matches_reference_harness(wav_sets):
    """FAD within 2% of the reference audioldm_eval harness on identical
    wav sets (requires the reference's own deps: librosa/soundfile/ssr)."""
    pytest.importorskip("librosa")
    pytest.importorskip("soundfile")
    import sys

    sys.path.insert(0, "/root/reference")
    try:
        from audioldm_eval import EvaluationHelper as RefHelper
    except Exception as e:  # pragma: no cover - env-dependent
        pytest.skip(f"reference harness not importable: {e}")

    import torch

    from consistencytta_tpu.evaluation.harness import EvaluationHelper

    gen_dir, ref_dir = wav_sets
    ours = EvaluationHelper(sampling_rate=16000).main(gen_dir, ref_dir)
    ref = RefHelper(sampling_rate=16000, device=torch.device("cpu")).main(
        gen_dir, ref_dir
    )
    ref_fad = ref.get("frechet_audio_distance", ref.get("fad"))
    assert ref_fad is not None
    assert abs(ours["frechet_audio_distance"] - ref_fad) <= 0.02 * max(
        abs(ref_fad), 1e-6
    )
