"""Feature-backbone parity tests (Cnn14, VGGish) and harness smoke test.

Torch twins of each backbone are built inline from the published
architectures (random weights), converted through the importers, and
compared — the same checkpoint-port guarantee used for the UNet/VAE.
"""

import os

import numpy as np
import pytest

from consistencytta_tpu.evaluation.panns import Cnn14, Cnn14Config, convert_cnn14
from consistencytta_tpu.evaluation.vggish import (
    VGGish,
    convert_vggish,
    htk_mel_matrix,
    waveform_to_examples,
)


def build_torch_cnn14_tail():
    """Torch twin of the Cnn14 conv stack + head (models.py:224-324),
    starting from the log-mel input (the frontend is covered by STFT tests).
    """
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    class ConvBlock(nn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            self.conv1 = nn.Conv2d(cin, cout, 3, 1, 1, bias=False)
            self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(cout)
            self.bn2 = nn.BatchNorm2d(cout)

        def forward(self, x, pool):
            x = F.relu(self.bn1(self.conv1(x)))
            x = F.relu(self.bn2(self.conv2(x)))
            if pool > 1:
                x = F.avg_pool2d(x, kernel_size=pool)
            return x

    class Tail(nn.Module):
        def __init__(self):
            super().__init__()
            self.bn0 = nn.BatchNorm2d(64)
            chans = [64, 128, 256, 512, 1024, 2048]
            prev = 1
            for i, ch in enumerate(chans):
                setattr(self, f"conv_block{i + 1}", ConvBlock(prev, ch))
                prev = ch
            self.fc1 = nn.Linear(2048, 2048)
            self.fc_audioset = nn.Linear(2048, 527)

        def forward(self, logmel):  # [B, T, mel]
            x = logmel[:, None, :, :]  # [B, 1, T, mel]
            x = x.transpose(1, 3)
            x = self.bn0(x)
            x = x.transpose(1, 3)
            pools = [2, 2, 2, 2, 2, 1]
            for i, p in enumerate(pools):
                x = getattr(self, f"conv_block{i + 1}")(x, p)
            x = x.mean(dim=3)
            x = x.max(dim=2).values + x.mean(dim=2)
            x = self.fc1(x)
            import torch.nn.functional as F

            emb = F.relu(x)
            logits = self.fc_audioset(emb)
            return emb, logits

    return Tail()


class TestCnn14:
    def test_conv_stack_parity(self, rng):
        import torch

        torch.manual_seed(0)
        tail = build_torch_cnn14_tail()
        tail.eval()
        # randomize BN running stats so the test exercises them
        for m in tail.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 1.5)

        sd = {k: v.detach().numpy() for k, v in tail.state_dict().items()}
        params = convert_cnn14(sd)

        logmel = (rng.standard_normal((2, 64, 64)) * 5).astype(np.float32)
        with torch.no_grad():
            want_emb, want_logits = tail(torch.from_numpy(logmel))

        # drive the JAX model from the same logmel by bypassing its frontend:
        # apply from bn0 onward via a monkeypatched magnitude path is
        # intrusive; instead rebuild the forward on the logmel directly.
        import jax

        model = Cnn14()

        def from_logmel(params, logmel):
            import flax.linen as fnn
            import jax.numpy as jnp

            from consistencytta_tpu.evaluation.panns import (
                BatchNormInference,
                ConvBlock,
            )

            class TailJax(fnn.Module):
                @fnn.compact
                def __call__(self, logmel):
                    x = BatchNormInference(64, name="bn0")(logmel)
                    x = x[..., None]
                    channels = [64, 128, 256, 512, 1024, 2048]
                    pools = [2, 2, 2, 2, 2, 1]
                    for i, (ch, pool) in enumerate(zip(channels, pools)):
                        x = ConvBlock(ch, name=f"conv_block{i + 1}")(x, pool)
                    x = x.mean(axis=2)
                    x = x.max(axis=1) + x.mean(axis=1)
                    x = fnn.Dense(2048, name="fc1")(x)
                    emb = jax.nn.relu(x)
                    return emb, fnn.Dense(527, name="fc_audioset")(emb)

            return TailJax().apply({"params": params}, logmel)

        got_emb, got_logits = from_logmel(params, logmel)
        np.testing.assert_allclose(
            np.asarray(got_emb), want_emb.numpy(), atol=3e-3, rtol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(got_logits), want_logits.numpy(), atol=3e-3, rtol=1e-3
        )

    @pytest.mark.slow  # ~9 s; conv_stack_parity stays quick
    def test_full_model_shapes(self, rng):
        import jax

        model = Cnn14()
        wav = (rng.standard_normal((2, 32000)) * 0.1).astype(np.float32)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), wav)
        out = model.apply(variables, wav)
        assert out["2048"].shape == (2, 2048)
        assert out["logits"].shape == (2, 527)


class TestVGGish:
    def test_frontend_shapes(self, rng):
        wav = (rng.standard_normal(160000) * 0.3).astype(np.float64)
        ex = waveform_to_examples(wav)
        # 10 s -> 997 frames -> 10 examples of 96 frames
        assert ex.shape == (10, 96, 64)

    def test_htk_mel_matrix(self):
        m = htk_mel_matrix()
        assert m.shape == (257, 64)
        assert (m[0] == 0).all()  # DC excluded
        assert (m >= 0).all() and m.sum() > 0

    def test_network_parity(self, rng):
        import torch
        import torch.nn as nn

        class TorchVGGish(nn.Module):
            """torchvggish topology (features + embeddings, last ReLU cut)."""

            def __init__(self):
                super().__init__()
                self.features = nn.Sequential(
                    nn.Conv2d(1, 64, 3, padding=1), nn.ReLU(True),
                    nn.MaxPool2d(2, 2),
                    nn.Conv2d(64, 128, 3, padding=1), nn.ReLU(True),
                    nn.MaxPool2d(2, 2),
                    nn.Conv2d(128, 256, 3, padding=1), nn.ReLU(True),
                    nn.Conv2d(256, 256, 3, padding=1), nn.ReLU(True),
                    nn.MaxPool2d(2, 2),
                    nn.Conv2d(256, 512, 3, padding=1), nn.ReLU(True),
                    nn.Conv2d(512, 512, 3, padding=1), nn.ReLU(True),
                    nn.MaxPool2d(2, 2),
                )
                self.embeddings = nn.Sequential(
                    nn.Linear(512 * 4 * 6, 4096), nn.ReLU(True),
                    nn.Linear(4096, 4096), nn.ReLU(True),
                    nn.Linear(4096, 128),
                )

            def forward(self, x):
                x = self.features(x)
                x = torch.transpose(x, 1, 3)
                x = torch.transpose(x, 1, 2)
                x = x.contiguous().view(x.size(0), -1)
                return self.embeddings(x)

        torch.manual_seed(0)
        tm = TorchVGGish()
        tm.eval()
        # torchvggish checkpoint key names: features.{i}, embeddings.{i}
        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        params = convert_vggish(sd)

        ex = (rng.standard_normal((3, 96, 64)) * 2).astype(np.float32)
        with torch.no_grad():
            want = tm(torch.from_numpy(ex[:, None, :, :])).numpy()
        got = np.asarray(VGGish().apply({"params": params}, ex))
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


class TestHarnessSmoke:
    def test_paired_metrics_without_backbones(self, tmp_path, rng):
        from consistencytta_tpu.evaluation.harness import EvaluationHelper
        from consistencytta_tpu.io.audio import write_wav

        gen_dir, ref_dir = tmp_path / "gen", tmp_path / "ref"
        gen_dir.mkdir(), ref_dir.mkdir()
        t = np.arange(32000) / 16000
        for i in range(3):
            tone = 0.5 * np.sin(2 * np.pi * (300 + 50 * i) * t)
            noise = tone + rng.normal(0, 0.02, tone.shape)
            write_wav(str(ref_dir / f"a{i}.wav"), tone)
            write_wav(str(gen_dir / f"a{i}.wav"), noise)

        helper = EvaluationHelper(
            cnn14_checkpoint=None, vggish_checkpoint=None, clap_checkpoint=None
        )
        out = helper.main(str(gen_dir), str(ref_dir))
        assert np.isfinite(out["lsd"])
        assert np.isfinite(out["psnr"]) and out["psnr"] > 10
        assert 0 < out["ssim"] <= 1
        assert np.isnan(out["frechet_distance"])  # no Cnn14 ckpt
        assert os.path.exists(str(gen_dir) + "_evaluation_results.json")

    def test_mel_artifact_fast_path_is_exact(self, tmp_path, rng):
        """The all_mels.npz fast path (the reference's all_mels.pt artifact,
        inference.py:222-232) must reproduce PSNR/SSIM bit-identically vs
        recomputing mels from the wav files."""
        from consistencytta_tpu.evaluation.harness import (
            EvaluationHelper,
            eval_mel_frontend,
            load_wav_16k,
            normalized_logmel,
        )
        from consistencytta_tpu.io.audio import write_wav

        gen_dir, ref_dir = tmp_path / "gen", tmp_path / "ref"
        gen_dir.mkdir(), ref_dir.mkdir()
        t = np.arange(32000) / 16000
        names = []
        for i in range(2):
            tone = 0.5 * np.sin(2 * np.pi * (440 + 80 * i) * t)
            write_wav(str(ref_dir / f"b{i}.wav"), tone)
            write_wav(
                str(gen_dir / f"b{i}.wav"),
                tone + rng.normal(0, 0.03, tone.shape),
            )
            names.append(f"b{i}.wav")

        # write the artifact exactly as cli/inference.py does
        frontend = eval_mel_frontend()
        mels = np.stack([
            normalized_logmel(load_wav_16k(str(gen_dir / n), 1000), frontend)
            for n in names
        ])
        mel_npz = str(tmp_path / "all_mels.npz")
        np.savez(
            mel_npz, names=np.array(names), mels=mels, target_centisec=1000
        )

        helper = EvaluationHelper(
            cnn14_checkpoint=None, vggish_checkpoint=None, clap_checkpoint=None
        )
        recomputed = helper.main(str(gen_dir), str(ref_dir))
        fast = helper.main(str(gen_dir), str(ref_dir), mel_path=mel_npz)
        assert fast["psnr"] == recomputed["psnr"]
        assert fast["ssim"] == recomputed["ssim"]

        # a stale artifact (wrong crop length) must be ignored, not trusted
        np.savez(
            mel_npz, names=np.array(names), mels=mels * 0.5,
            target_centisec=500,
        )
        stale = helper.main(str(gen_dir), str(ref_dir), mel_path=mel_npz)
        assert stale["psnr"] == recomputed["psnr"]
