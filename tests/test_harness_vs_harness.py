"""Hermetic harness-vs-harness: the reference `audioldm_eval.EvaluationHelper`
driven end-to-end against ours on the same wav dirs with the SAME synthetic
Cnn14/VGGish weights, full metric dict compared in one shot.

The piecewise metric parity tests (test_metrics.py) compare formulas; this
compares the PLUMBING — file loading/centering/cropping conventions,
filename pairing, batch semantics, x100 scaling/clamping, dict keys — by
executing the reference's own eval.py/calculate_metrics code path
(audioldm_eval/eval.py:181-307) hermetically.

What is genuine reference code here: eval.py, datasets/load_mel.py,
metrics/{fid,isc,kid,kl}.py, audio/ (TacotronSTFT), feature_extractors/
panns/models.py, metrics/fad.py, tools/t2a_dataset.py.

What is stubbed (this environment lacks the pip deps; each stub is a
faithful functional replacement, NOT a no-op):
  * soundfile/librosa/resampy  -> scipy-based I/O + this repo's
    mel-filterbank/resampler (file decoding is external I/O either way)
  * torchlibrosa Spectrogram/LogmelFilterBank -> torch conv1d against the
    checkpoint's own (windowed-DFT) basis + 10*log10 power_to_db — the
    exact structure of the real torchlibrosa modules; the synthetic
    checkpoint carries the true DFT/mel bases like the real one does
  * torch.hub VGGish -> the torchvggish topology twin loading the same
    synthetic state dict (test_eval_backbones.py builds the same twin)
  * skimage psnr/ssim and ssr_eval AudioMetrics -> the skimage-semantics
    reimplementations from evaluation/metrics.py (shared by both sides, so
    the comparison tests the surrounding offset/crop/pairing plumbing,
    not those two kernels)
  * laion_clap -> dummy; get_clap_features is patched out (CLAP deps are
    genuinely unimportable here), so the three clap keys are excluded.

The wav set mixes 2-s and 11-s clips so the length-dependent plumbing is
exercised: 10-s target_length crops for Cnn14/VGGish vs FULL uncropped
files for LSD/PSNR/SSIM, and per-length (batch-1-faithful) Cnn14 batching.
"""

import json
import os
import sys
import types

import numpy as np
import pytest

from tests.conftest import REFERENCE_ROOT, reference_available

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not reference_available(), reason="reference repo not mounted"
    ),
]

N_SHORT, N_LONG = 10, 2  # >= 10 so the 10-split ISc has no empty split
SR = 16000

_STUB_NAMES = (
    "librosa", "librosa.util", "librosa.filters", "resampy", "soundfile",
    "skimage", "skimage.metrics", "ssr_eval", "ssr_eval.metrics",
    "torchlibrosa", "torchlibrosa.stft", "torchlibrosa.augmentation",
    "laion_clap",
)


def _install_reference_dep_stubs():
    """Build functional import stubs for the reference eval tree's missing
    pip deps. Returns the saved sys.modules entries for restoration."""
    import torch
    import torch.nn as tnn
    import torch.nn.functional as tF
    from scipy.io import wavfile
    from scipy.signal import get_window  # noqa: F401 (real scipy is present)

    from consistencytta_tpu.evaluation import metrics as M
    from consistencytta_tpu.ops.mel import mel_filterbank
    from consistencytta_tpu.ops.resample import resample_numpy

    saved = {n: sys.modules.get(n) for n in _STUB_NAMES}
    mods = {}
    for name in _STUB_NAMES:
        mod = types.ModuleType(name)
        mod.__spec__ = types.SimpleNamespace(name=name)
        mods[name] = mod

    # -- librosa ------------------------------------------------------------
    def pad_center(data, size=None, **kwargs):
        size = int(size if size is not None else kwargs["size"])
        n = data.shape[-1]
        lpad = (size - n) // 2
        return np.pad(data, (lpad, size - n - lpad))

    def normalize(S, norm=np.inf, axis=0, **kw):
        if norm is None:
            return S
        mag = np.abs(S).max(axis=axis, keepdims=True)
        mag[mag == 0] = 1.0
        return S / mag

    mods["librosa.util"].pad_center = pad_center
    mods["librosa.util"].normalize = normalize
    mods["librosa.util"].tiny = lambda x: np.finfo(np.float32).tiny
    mods["librosa.filters"].mel = (
        lambda sr, n_fft, n_mels=128, fmin=0.0, fmax=None, **kw: mel_filterbank(
            sr, n_fft, n_mels, fmin, fmax
        )
    )
    mods["librosa"].util = mods["librosa.util"]
    mods["librosa"].filters = mods["librosa.filters"]
    mods["librosa"].to_mono = lambda y: np.mean(y, axis=0) if y.ndim > 1 else y

    # -- resampy ------------------------------------------------------------
    mods["resampy"].resample = (
        lambda x, sr_orig, sr_new, filter=None, **kw: resample_numpy(
            np.asarray(x, np.float32), int(sr_orig), int(sr_new)
        )
    )

    # -- soundfile ----------------------------------------------------------
    def sf_read(path, dtype=None, **kw):
        sr, data = wavfile.read(path)
        if dtype == "int16":
            assert data.dtype == np.int16
            return data, sr
        if data.dtype == np.int16:
            data = data.astype(np.float64) / 32768.0
        return data, sr

    mods["soundfile"].read = sf_read
    mods["soundfile"].write = lambda path, data, sr, **kw: wavfile.write(
        path, sr, np.asarray(data)
    )

    # -- skimage.metrics ----------------------------------------------------
    mods["skimage.metrics"].peak_signal_noise_ratio = (
        lambda im_true, im_test, data_range=None: M.psnr(
            im_true, im_test, data_range=2.0 if data_range is None else data_range
        )
    )
    mods["skimage.metrics"].structural_similarity = (
        lambda a, b, data_range=1.0, **kw: M.ssim(a, b, data_range=data_range)
    )
    mods["skimage"].metrics = mods["skimage.metrics"]

    # -- ssr_eval -----------------------------------------------------------
    class AudioMetrics:
        """ssr_eval's spectral LSD/SSIM protocol (the surrounding 7-frame
        offset + normalization live in reference eval.py:137-158 and stay
        under test)."""

        def __init__(self, rate):
            self.rate = int(rate)

        def evaluation(self, est, target, file):
            n_fft = int(2048 / (44100 / self.rate))
            hop = int(self.rate / 100)
            window = np.hanning(n_fft)

            def spec(x):
                frames = [
                    np.abs(np.fft.rfft(window * x[i : i + n_fft]))
                    for i in range(0, len(x) - n_fft + 1, hop)
                ]
                return (
                    np.stack(frames) if frames else np.zeros((1, n_fft // 2 + 1))
                )

            s1 = np.log10(spec(est) ** 2 + 1e-8)
            s2 = np.log10(spec(target) ** 2 + 1e-8)
            lsd = float(np.mean(np.sqrt(np.mean((s1 - s2) ** 2, axis=1))))
            ssim_v = M.ssim(
                s1, s2, data_range=max(s1.max() - s1.min(), 1e-6)
            )
            return {"lsd": lsd, "ssim": ssim_v}

    mods["ssr_eval.metrics"].AudioMetrics = AudioMetrics
    mods["ssr_eval"].metrics = mods["ssr_eval.metrics"]

    # -- torchlibrosa -------------------------------------------------------
    class _STFTConvs(tnn.Module):
        def __init__(self, n_fft, hop):
            super().__init__()
            bins = n_fft // 2 + 1
            self.conv_real = tnn.Conv1d(1, bins, n_fft, stride=hop, bias=False)
            self.conv_imag = tnn.Conv1d(1, bins, n_fft, stride=hop, bias=False)

    class Spectrogram(tnn.Module):
        def __init__(self, n_fft=2048, hop_length=None, win_length=None,
                     window="hann", center=True, pad_mode="reflect",
                     power=2.0, freeze_parameters=True):
            super().__init__()
            assert window == "hann" and center and pad_mode == "reflect"
            self.n_fft, self.power = n_fft, power
            self.stft = _STFTConvs(n_fft, hop_length)

        def forward(self, x):  # [B, T] -> [B, 1, frames, bins]
            x = x[:, None, :]
            x = tF.pad(x, (self.n_fft // 2, self.n_fft // 2), mode="reflect")
            real = self.stft.conv_real(x)
            imag = self.stft.conv_imag(x)
            spec = real**2 + imag**2  # power = 2.0
            return spec.transpose(1, 2)[:, None, :, :]

    class LogmelFilterBank(tnn.Module):
        def __init__(self, sr=22050, n_fft=2048, n_mels=64, fmin=0.0,
                     fmax=None, ref=1.0, amin=1e-10, top_db=80.0,
                     freeze_parameters=True, is_log=True):
            super().__init__()
            assert ref == 1.0 and top_db is None
            self.amin = amin
            self.melW = tnn.Parameter(
                torch.empty(n_fft // 2 + 1, n_mels), requires_grad=False
            )

        def forward(self, x):  # [B, 1, frames, bins]
            mel = torch.matmul(x, self.melW)
            return 10.0 * torch.log10(torch.clamp(mel, min=self.amin))

    class SpecAugmentation(tnn.Module):
        def __init__(self, **kw):
            super().__init__()

        def forward(self, x):
            return x

    mods["torchlibrosa.stft"].Spectrogram = Spectrogram
    mods["torchlibrosa.stft"].LogmelFilterBank = LogmelFilterBank
    mods["torchlibrosa.augmentation"].SpecAugmentation = SpecAugmentation
    mods["torchlibrosa"].stft = mods["torchlibrosa.stft"]
    mods["torchlibrosa"].augmentation = mods["torchlibrosa.augmentation"]

    # -- laion_clap (CLAP deps genuinely unavailable: dummy; the CLAP keys
    # are excluded from the comparison) -------------------------------------
    class _DummyCLAP:
        def __init__(self, *a, **k):
            pass

        def to(self, device):
            return self

        def __getattr__(self, name):
            return lambda *a, **k: None

    mods["laion_clap"].CLAP_Module = _DummyCLAP

    sys.modules.update(mods)
    return saved


def _restore_stubs(saved):
    for name, mod in saved.items():
        if mod is None:
            sys.modules.pop(name, None)
        else:
            sys.modules[name] = mod


def _scaled_cnn14_sd():
    """make_cnn14_state_dict with (a) He-ish weight scaling so the 12-conv
    stack doesn't overflow fp32 on random weights, and (b) the TRUE
    windowed-DFT / mel bases in the frontend buffer slots — exactly what
    the real Cnn14_16k checkpoint stores (torchlibrosa freezes the basis
    into conv weights)."""
    from consistencytta_tpu.ops.mel import mel_filterbank, real_dft_basis
    from tests.test_importer_fullkeys import make_cnn14_state_dict

    sd = make_cnn14_state_dict(np.random.RandomState(5))
    for k, v in sd.items():
        if k.endswith(".weight") and np.ndim(v) >= 2 and "stft" not in k:
            fan_in = int(np.prod(np.shape(v)[1:]))
            sd[k] = (v / np.sqrt(fan_in)).astype(np.float32)

    cos_b, sin_b = real_dft_basis(512, 512, "hann")  # [512, 257] windowed
    sd["spectrogram_extractor.stft.conv_real.weight"] = (
        cos_b.T[:, None, :].astype(np.float32)
    )
    sd["spectrogram_extractor.stft.conv_imag.weight"] = (
        sin_b.T[:, None, :].astype(np.float32)
    )
    sd["logmel_extractor.melW"] = (
        mel_filterbank(16000, 512, 64, 50.0, 8000.0).T.astype(np.float32)
    )
    return sd


def _scaled_vggish_sd():
    from tests.test_importer_fullkeys import make_vggish_state_dict

    sd = make_vggish_state_dict(np.random.RandomState(7))
    for k, v in sd.items():
        if k.endswith(".weight"):
            fan_in = int(np.prod(np.shape(v)[1:]))
            sd[k] = (v / np.sqrt(fan_in)).astype(np.float32)
    return sd


def _build_hub_vggish(sd):
    """torchvggish topology twin (with the trailing embeddings ReLU that
    fad.py strips via children()[:-1]); forward(audio, fs) mirrors the hub
    model: waveform -> 96x64 examples -> conv stack -> [N, 128]."""
    import torch
    import torch.nn as tnn

    from consistencytta_tpu.evaluation.vggish import waveform_to_examples

    class HubVGGish(tnn.Module):
        def __init__(self):
            super().__init__()
            self.features = tnn.Sequential(
                tnn.Conv2d(1, 64, 3, padding=1), tnn.ReLU(True),
                tnn.MaxPool2d(2, 2),
                tnn.Conv2d(64, 128, 3, padding=1), tnn.ReLU(True),
                tnn.MaxPool2d(2, 2),
                tnn.Conv2d(128, 256, 3, padding=1), tnn.ReLU(True),
                tnn.Conv2d(256, 256, 3, padding=1), tnn.ReLU(True),
                tnn.MaxPool2d(2, 2),
                tnn.Conv2d(256, 512, 3, padding=1), tnn.ReLU(True),
                tnn.Conv2d(512, 512, 3, padding=1), tnn.ReLU(True),
                tnn.MaxPool2d(2, 2),
            )
            self.embeddings = tnn.Sequential(
                tnn.Linear(512 * 4 * 6, 4096), tnn.ReLU(True),
                tnn.Linear(4096, 4096), tnn.ReLU(True),
                tnn.Linear(4096, 128), tnn.ReLU(True),  # stripped by fad.py
            )

        def forward(self, audio, fs):
            ex = waveform_to_examples(np.asarray(audio, np.float64))
            x = torch.from_numpy(ex[:, None, :, :]).float()
            x = self.features(x)
            x = torch.transpose(x, 1, 3)
            x = torch.transpose(x, 1, 2)
            x = x.contiguous().view(x.size(0), -1)
            return self.embeddings(x)

    model = HubVGGish()
    model.load_state_dict(
        {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}
    )
    model.eval()
    return model


@pytest.fixture(scope="module")
def harness_world(tmp_path_factory):
    """wav dirs + synthetic ckpts + stubbed reference import world."""
    import torch

    mp = pytest.MonkeyPatch()
    root = tmp_path_factory.mktemp("hvh")
    saved = _install_reference_dep_stubs()
    try:
        from consistencytta_tpu.io.audio import write_wav

        gen_dir, ref_dir = root / "gen", root / "ref"
        gen_dir.mkdir(), ref_dir.mkdir()
        rng = np.random.default_rng(3)
        lengths = [2 * SR] * N_SHORT + [11 * SR] * N_LONG
        captions = []
        for i, n in enumerate(lengths):
            t = np.arange(n) / SR
            base = np.sin(2 * np.pi * (180 + 60 * i) * t) * 0.4
            write_wav(
                str(gen_dir / f"clip_{i}.wav"),
                (base + 0.05 * rng.standard_normal(n)).astype(np.float32),
                SR,
            )
            write_wav(
                str(ref_dir / f"clip_{i}.wav"),
                (base + 0.05 * rng.standard_normal(n)).astype(np.float32),
                SR,
            )
            captions.append(f"synthetic tone number {i}")

        # checkpoints under cwd-relative ckpt/ (both harnesses' convention)
        mp.chdir(root)
        os.makedirs("ckpt", exist_ok=True)
        sd14 = _scaled_cnn14_sd()
        torch.save(
            {"model": {k: torch.from_numpy(np.asarray(v)) for k, v in sd14.items()}},
            "ckpt/Cnn14_16k_mAP=0.438.pth",
        )
        # existence check only (the 16 kHz branch never loads this file)
        with open("ckpt/Cnn14_mAP=0.431.pth", "wb") as f:
            f.write(b"placeholder")
        sd_vgg = _scaled_vggish_sd()
        torch.save(
            {k: torch.from_numpy(np.asarray(v)) for k, v in sd_vgg.items()},
            "ckpt/vggish.pth",
        )

        json_path = str(root / "dataset.json")
        with open(json_path, "w") as f:
            for i, cap in enumerate(captions):
                f.write(json.dumps(
                    {"captions": cap, "location": str(ref_dir / f"clip_{i}.wav")}
                ) + "\n")

        # reference import world
        if REFERENCE_ROOT not in sys.path:
            sys.path.insert(0, REFERENCE_ROOT)
        hub_model = _build_hub_vggish(sd_vgg)
        mp.setattr(torch.hub, "load", lambda *a, **k: hub_model)

        import audioldm_eval.eval as ref_eval

        # no forked dataloader workers in the sandbox
        real_loader = ref_eval.DataLoader
        mp.setattr(
            ref_eval, "DataLoader",
            lambda *a, **kw: real_loader(*a, **{**kw, "num_workers": 0}),
        )
        # CLAP deps genuinely unavailable: constant embeddings keep the
        # pipeline alive; the three clap keys are excluded from comparison
        n = len(lengths)
        ones = torch.ones(n, 512)
        mp.setattr(
            ref_eval, "get_clap_features",
            lambda loader, model: (ones, ones, ones),
        )

        yield dict(
            gen_dir=str(gen_dir), ref_dir=str(ref_dir), json_path=json_path,
            ref_eval=ref_eval, torch=torch, n=n, captions=captions,
        )
    finally:
        mp.undo()
        _restore_stubs(saved)


COMPARE_KEYS = {
    "frechet_distance": 2e-3,
    "frechet_audio_distance": 2e-3,
    "kullback_leibler_divergence_softmax": 2e-3,
    "kullback_leibler_divergence_sigmoid": 2e-3,
    "inception_score_mean": 2e-3,
    "inception_score_std": 5e-2,
    "kernel_inception_distance_mean": 2e-3,
    "kernel_inception_distance_std": 5e-2,
    "lsd": 2e-3,
    "ssim_stft": 2e-3,
    "psnr": 2e-3,
    "ssim": 2e-3,
}


def test_full_metric_dict_matches_reference_harness(harness_world):
    import torch

    w = harness_world
    ref_helper = w["ref_eval"].EvaluationHelper(SR, torch.device("cpu"))
    ref_out = ref_helper.main(
        w["json_path"], w["gen_dir"], w["ref_dir"], target_length=1000
    )

    from consistencytta_tpu.evaluation.harness import EvaluationHelper

    ours = EvaluationHelper(
        sampling_rate=SR,
        cnn14_checkpoint="ckpt/Cnn14_16k_mAP=0.438.pth",
        vggish_checkpoint="ckpt/vggish.pth",
        clap_checkpoint=None,
    ).main(w["gen_dir"], w["ref_dir"])

    mismatches = []
    for key, rtol in COMPARE_KEYS.items():
        rv, ov = ref_out.get(key), ours.get(key)
        assert rv is not None and np.isfinite(rv), f"reference {key}={rv}"
        assert ov is not None and np.isfinite(ov), f"ours {key}={ov}"
        # both harnesses round to 4 decimals (eval.py:301, ours mirrors);
        # the 2.5e-4 absolute floor admits the rounding quantum plus fp32
        # frontend noise on tiny-magnitude metrics, far below any real
        # plumbing divergence
        if abs(ov - rv) > 2.5e-4 + rtol * abs(rv):
            mismatches.append(f"{key}: ref={rv!r} ours={ov!r}")
    assert not mismatches, "metric dict diverges:\n" + "\n".join(mismatches)

    # both wrote their result-json artifacts with the same key schema
    assert os.path.exists(w["gen_dir"] + "_evaluation_results.json")
