"""CLAP tower parity tests.

* RoBERTa text tower vs HF transformers RobertaModel (random init).
* HTSAT Swin audio tower vs the reference laion_clap htsat.py, imported with
  torchlibrosa stubbed out (the frontend is bypassed by driving both models
  from the same log-mel tensor; our STFT/mel math is covered elsewhere).
* Bicubic time interpolation vs torch F.interpolate(align_corners=True).
"""

import sys
import types

import numpy as np
import pytest

from consistencytta_tpu.evaluation.clap_model import (
    CLAPAudioTower,
    CLAPTextTower,
    HTSATConfig,
    RobertaConfig,
    bicubic_resize_matrix,
    convert_clap_audio,
    convert_clap_text,
    reshape_mel_to_image,
)
from tests.conftest import REFERENCE_ROOT, reference_available

requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)


def _mod(name):
    """A stub module with a real ModuleSpec: a bare types.ModuleType leaves
    __spec__ = None, which makes any later importlib.util.find_spec(name)
    raise ValueError — transformers probes torchvision that way at import,
    so spec-less stubs poison whichever test imports transformers next
    (order-dependent quick-tier failures)."""
    import importlib.machinery

    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    return m


def _stub_torchlibrosa():
    """Minimal stand-ins for the reference HTSAT's import-time deps
    (torchlibrosa, torchvision, h5py); none are called in these tests."""
    import torch.nn as tnn

    tl = _mod("torchlibrosa")
    stft = _mod("torchlibrosa.stft")
    aug = _mod("torchlibrosa.augmentation")

    class _Noop(tnn.Module):
        def __init__(self, *a, **k):
            super().__init__()

        def forward(self, x):
            raise RuntimeError("stub should not be called")

    stft.Spectrogram = _Noop
    stft.LogmelFilterBank = _Noop
    aug.SpecAugmentation = _Noop
    aug.DropStripes = _Noop
    tl.stft = stft
    tl.augmentation = aug
    sys.modules.setdefault("torchlibrosa", tl)
    sys.modules.setdefault("torchlibrosa.stft", stft)
    sys.modules.setdefault("torchlibrosa.augmentation", aug)

    if "torchvision" not in sys.modules:
        tv = _mod("torchvision")
        ops = _mod("torchvision.ops")
        misc = _mod("torchvision.ops.misc")
        misc.FrozenBatchNorm2d = _Noop
        ops.misc = misc
        tv.ops = ops
        transforms = _mod("torchvision.transforms")
        transforms.Resize = _Noop
        tv.transforms = transforms
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.ops"] = ops
        sys.modules["torchvision.ops.misc"] = misc
        sys.modules["torchvision.transforms"] = transforms
    sys.modules.setdefault("h5py", _mod("h5py"))


def _import_reference_htsat():
    """Import laion_clap.clap_module.htsat WITHOUT executing the package
    __init__ chain (which needs librosa/webdataset): register synthetic
    parent packages whose __path__ points into the reference tree."""
    import os

    _stub_torchlibrosa()
    if "laion_clap.clap_module.htsat" in sys.modules:
        return sys.modules["laion_clap.clap_module.htsat"]

    lc = types.ModuleType("laion_clap")
    lc.__path__ = [os.path.join(REFERENCE_ROOT, "laion_clap")]
    cm = types.ModuleType("laion_clap.clap_module")
    cm.__path__ = [os.path.join(REFERENCE_ROOT, "laion_clap", "clap_module")]
    sys.modules.setdefault("laion_clap", lc)
    sys.modules.setdefault("laion_clap.clap_module", cm)

    import importlib

    return importlib.import_module("laion_clap.clap_module.htsat")


class TestBicubic:
    def test_matches_torch_align_corners(self):
        import torch
        import torch.nn.functional as F

        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, 1, 101, 64)).astype(np.float32)
        want = F.interpolate(
            torch.from_numpy(x), (128, 64), mode="bicubic", align_corners=True
        ).numpy()
        m = bicubic_resize_matrix(101, 128)
        got = np.einsum("ot,bctf->bcof", m, x)
        np.testing.assert_allclose(got, want, atol=6e-5, rtol=1e-4)


class TestRobertaParity:
    @pytest.mark.slow  # builds the full HF RobertaModel twin (~21 s)
    def test_pooler_matches_hf(self, rng):
        import torch
        from transformers import RobertaConfig as HFConfig
        from transformers import RobertaModel

        cfg = RobertaConfig(
            vocab_size=128, hidden_size=32, num_layers=2, num_heads=2,
            intermediate_size=64, max_position_embeddings=40,
        )
        hf_cfg = HFConfig(
            vocab_size=cfg.vocab_size,
            hidden_size=cfg.hidden_size,
            num_hidden_layers=cfg.num_layers,
            num_attention_heads=cfg.num_heads,
            intermediate_size=cfg.intermediate_size,
            max_position_embeddings=cfg.max_position_embeddings,
            type_vocab_size=1,
            pad_token_id=1,
        )
        torch.manual_seed(0)
        hf = RobertaModel(hf_cfg)
        hf.eval()

        # graft the HF weights through the converter (text_branch.* root)
        sd = {
            "text_branch." + k: v.detach().numpy() for k, v in hf.state_dict().items()
        }
        sd["text_projection.0.weight"] = rng.standard_normal((512, 32)).astype(
            np.float32
        )
        sd["text_projection.0.bias"] = np.zeros(512, np.float32)
        sd["text_projection.2.weight"] = rng.standard_normal((512, 512)).astype(
            np.float32
        ) * 0.01
        sd["text_projection.2.bias"] = np.zeros(512, np.float32)
        params = convert_clap_text(sd, cfg)

        ids = rng.integers(2, 128, size=(2, 11)).astype(np.int64)
        mask = np.ones((2, 11), np.int64)
        ids[0, 8:] = 1
        mask[0, 8:] = 0

        with torch.no_grad():
            want_pooled = hf(
                input_ids=torch.from_numpy(ids),
                attention_mask=torch.from_numpy(mask),
            ).pooler_output.numpy()

        from consistencytta_tpu.evaluation.clap_model import RobertaEncoder

        got_pooled = np.asarray(
            RobertaEncoder(cfg).apply(
                {"params": params["roberta"]}, ids.astype(np.int32),
                mask.astype(np.int32),
            )
        )
        np.testing.assert_allclose(got_pooled, want_pooled, atol=3e-5, rtol=1e-3)

        # full tower runs and normalizes
        emb = np.asarray(
            CLAPTextTower(cfg).apply(
                {"params": params}, ids.astype(np.int32), mask.astype(np.int32)
            )
        )
        np.testing.assert_allclose(
            np.linalg.norm(emb, axis=1), np.ones(2), rtol=1e-5
        )


@requires_reference
class TestHTSATParity:
    @pytest.mark.slow
    def test_audio_tower_matches_reference(self, rng):
        import torch

        htsat_mod = _import_reference_htsat()
        HTSAT_Swin_Transformer = htsat_mod.HTSAT_Swin_Transformer

        class AudioCfg:
            mel_bins = 64
            sample_rate = 48000
            window_size = 1024
            hop_size = 480
            fmin = 50
            fmax = 14000
            class_num = 527
            model_name = "base"

        # shrunken base-topology model for CPU speed: spec 64, embed 32
        torch.manual_seed(0)

        class SmallCfg(AudioCfg):
            mel_bins = 32

        ref = HTSAT_Swin_Transformer(
            spec_size=128, patch_size=4, patch_stride=(4, 4), num_classes=527,
            embed_dim=32, depths=[2, 2, 2, 2], num_heads=[2, 2, 4, 4],
            window_size=4, config=SmallCfg, enable_fusion=False,
        )
        ref.eval()
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 1.5)

        cfg = HTSATConfig(
            spec_size=128, patch_size=4, patch_stride=4, embed_dim=32,
            depths=(2, 2, 2, 2), num_heads=(2, 2, 4, 4), window_size=4,
            mel_bins=32,
        )

        sd = {
            "audio_branch." + k: v.detach().numpy()
            for k, v in ref.state_dict().items()
        }
        sd["audio_projection.0.weight"] = (
            rng.standard_normal((512, cfg.num_features)).astype(np.float32) * 0.02
        )
        sd["audio_projection.0.bias"] = np.zeros(512, np.float32)
        sd["audio_projection.2.weight"] = (
            rng.standard_normal((512, 512)).astype(np.float32) * 0.02
        )
        sd["audio_projection.2.bias"] = np.zeros(512, np.float32)
        params = convert_clap_audio(sd, cfg)

        # drive both from the same log-mel [B, T, F]
        t_frames = 4 * 128  # == target length: no interpolation
        logmel = (rng.standard_normal((2, t_frames, cfg.mel_bins)) * 3).astype(
            np.float32
        )

        with torch.no_grad():
            x = torch.from_numpy(logmel)[:, None, :, :]  # [B,1,T,F]
            x = x.transpose(1, 3)
            x = ref.bn0(x)
            x = x.transpose(1, 3)
            x = ref.reshape_wav2img(x)
            want_emb = ref.forward_features(x)["embedding"].numpy()

        from consistencytta_tpu.evaluation.clap_model import (
            BatchNormInference,
            HTSATEncoder,
        )

        import flax.linen as fnn
        import jax

        class EmbedOnly(fnn.Module):
            @fnn.compact
            def __call__(self, logmel):
                x = BatchNormInference(cfg.mel_bins, name="bn0")(logmel)
                img = reshape_mel_to_image(x, cfg)
                return HTSATEncoder(cfg, name="htsat")(img)

        got_emb = np.asarray(
            EmbedOnly().apply(
                {"params": {"bn0": params["bn0"], "htsat": params["htsat"]}},
                logmel,
            )
        )
        assert got_emb.shape == want_emb.shape
        np.testing.assert_allclose(got_emb, want_emb, atol=5e-4, rtol=1e-3)

    def test_reshape_matches_reference(self, rng):
        import torch

        htsat_mod = _import_reference_htsat()
        HTSAT_Swin_Transformer = htsat_mod.HTSAT_Swin_Transformer

        class AudioCfg:
            mel_bins = 64
            sample_rate = 48000
            window_size = 1024
            hop_size = 480
            fmin = 50
            fmax = 14000
            class_num = 527
            model_name = "base"

        torch.manual_seed(1)
        ref = HTSAT_Swin_Transformer(
            spec_size=256, patch_size=4, patch_stride=(4, 4), embed_dim=32,
            depths=[1, 1, 1, 1], num_heads=[1, 1, 1, 1], window_size=8,
            config=AudioCfg, enable_fusion=False,
        )
        cfg = HTSATConfig()
        # 1001 frames like the real 10-s/48 kHz path -> exercises bicubic
        mel = (rng.standard_normal((1, 1001, 64)) * 2).astype(np.float32)
        with torch.no_grad():
            want = ref.reshape_wav2img(
                torch.from_numpy(mel)[:, None, :, :]
            ).numpy()  # [B,1,256,256]
        got = np.asarray(reshape_mel_to_image(mel, cfg))[..., 0][:, None, :, :]
        # tiny bicubic accumulation-order differences vs torch (float32)
        np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)


class TestRandTruncProtocol:
    """The eval CLAP protocol's seeded random truncation
    (audioldm_eval/eval.py:38-46 seed_all(0) before every embedding batch;
    laion_clap/training/data.py:465-467 np.random.randint crop per long
    clip). fit_length must reproduce the exact crop starts."""

    def test_crop_start_pins_to_reference_chain(self):
        from consistencytta_tpu.evaluation.clap_model import fit_length

        n = 480_000
        overflow = 37_013  # > 10-s clip at 48 kHz
        wav = np.arange(n + overflow, dtype=np.float32)

        # the reference chain: seed_all(0) -> np.random.randint(0, overflow+1)
        np.random.seed(0)
        expect_idx = int(np.random.randint(0, overflow + 1))

        rs = np.random.RandomState(0)
        got = fit_length(wav, n, rs)
        assert got.shape == (n,)
        assert int(got[0]) == expect_idx  # crop start == reference draw
        np.testing.assert_array_equal(got, wav[expect_idx : expect_idx + n])

    def test_sequential_draws_within_batch(self):
        """Second long clip in a batch consumes the SECOND randint of the
        seeded stream (the reference loops clips in order)."""
        from consistencytta_tpu.evaluation.clap_model import fit_length

        n, overflow = 1000, 177
        wav = np.arange(n + overflow, dtype=np.float32)

        np.random.seed(0)
        first = int(np.random.randint(0, overflow + 1))
        second = int(np.random.randint(0, overflow + 1))

        rs = np.random.RandomState(0)
        got1 = fit_length(wav, n, rs)
        got2 = fit_length(wav, n, rs)
        assert (int(got1[0]), int(got2[0])) == (first, second)
        # short clips draw nothing: stream position unchanged by them
        rs2 = np.random.RandomState(0)
        fit_length(np.ones(10, np.float32), n, rs2)  # short, no draw
        got1b = fit_length(wav, n, rs2)
        assert int(got1b[0]) == first

    def test_repeatpad_zero_tail(self):
        """repeatpad repeats floor(n/len) times then ZERO-pads (data.py:
        472-483) — not a cyclic tile."""
        from consistencytta_tpu.evaluation.clap_model import fit_length

        wav = np.array([1.0, 2.0, 3.0], np.float32)
        got = fit_length(wav, 10)
        np.testing.assert_array_equal(
            got, np.array([1, 2, 3, 1, 2, 3, 1, 2, 3, 0], np.float32)
        )

    def test_exact_length_untouched_and_headcrop_default(self):
        from consistencytta_tpu.evaluation.clap_model import fit_length

        wav = np.arange(8, dtype=np.float32)
        np.testing.assert_array_equal(fit_length(wav, 8), wav)
        np.testing.assert_array_equal(fit_length(wav, 4), wav[:4])  # no rng
