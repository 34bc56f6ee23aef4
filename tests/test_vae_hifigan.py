"""Checkpoint-port parity tests for the audio codec (VAE + HiFi-GAN).

Strategy: instantiate the reference torch modules with their *random init*,
convert the state dict through consistencytta_tpu.io.torch_import, and assert
per-module output allclose on fixed inputs — checkpoint parity without
needing the actual (non-downloadable) checkpoints.
"""

import numpy as np
import pytest

from consistencytta_tpu.configs import HiFiGANConfig, VAEConfig
from consistencytta_tpu.io.torch_import import (
    convert_hifigan,
    convert_vae,
    load_torch_state_dict,
)
from consistencytta_tpu.nn.hifigan import HiFiGANGenerator, vocoder_postprocess
from consistencytta_tpu.nn.vae import AutoencoderKL, DiagonalGaussian
from tests.conftest import import_reference_audioldm, reference_available

requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)


def reference_vae_config():
    # ddconfig from audioldm/utils.py:160-180 (audioldm-s-full)
    return dict(
        ddconfig=dict(
            double_z=True,
            z_channels=8,
            resolution=256,
            downsample_time=False,
            in_channels=1,
            out_ch=1,
            ch=128,
            ch_mult=[1, 2, 4],
            num_res_blocks=2,
            attn_resolutions=[],
            dropout=0.0,
        ),
        embed_dim=8,
        scale_factor=0.9227,
    )


@requires_reference
class TestVAEParity:
    @pytest.fixture(scope="class")
    def torch_vae(self):
        import torch

        vae_mod, _ = import_reference_audioldm()
        torch.manual_seed(0)
        vae = vae_mod.AutoencoderKL(**reference_vae_config())
        vae.eval()
        return vae

    @pytest.fixture(scope="class")
    def jax_vae(self, torch_vae):
        sd = {
            k: v.detach().numpy()
            for k, v in torch_vae.state_dict().items()
            if not k.startswith("vocoder.")
        }
        config = VAEConfig(scale_factor=0.9227)
        params = convert_vae(sd, config)
        return AutoencoderKL(config), {"params": params}

    def test_encoder_parity(self, torch_vae, jax_vae, rng):
        import torch

        model, variables = jax_vae
        # small mel image: [B, 1, T=64, F=64] torch NCHW
        mel = rng.standard_normal((2, 1, 64, 64)).astype(np.float32)
        with torch.no_grad():
            want = torch_vae.encode(torch.from_numpy(mel)).parameters.numpy()
        got = model.apply(
            variables, np.transpose(mel, (0, 2, 3, 1)), method=model.encode_moments
        )
        got = np.transpose(np.asarray(got), (0, 3, 1, 2))
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)

    def test_decoder_parity(self, torch_vae, jax_vae, rng):
        import torch

        model, variables = jax_vae
        z = (rng.standard_normal((2, 8, 16, 16)) * 2).astype(np.float32)
        with torch.no_grad():
            want = torch_vae.decode(torch.from_numpy(z)).numpy()
        got = model.apply(
            variables, np.transpose(z, (0, 2, 3, 1)), method=model.decode
        )
        got = np.transpose(np.asarray(got), (0, 3, 1, 2))
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)

    def test_decode_first_stage_scale(self, torch_vae, jax_vae, rng):
        import torch

        model, variables = jax_vae
        z = rng.standard_normal((1, 8, 8, 8)).astype(np.float32)
        with torch.no_grad():
            want = torch_vae.decode_first_stage(torch.from_numpy(z)).numpy()
        got = model.apply(
            variables,
            np.transpose(z, (0, 2, 3, 1)),
            method=model.decode_first_stage,
        )
        np.testing.assert_allclose(
            np.transpose(np.asarray(got), (0, 3, 1, 2)), want, atol=2e-4, rtol=1e-3
        )

    def test_posterior_math(self, rng):
        import torch

        vae_mod, _ = import_reference_audioldm()
        from audioldm.variational_autoencoder.distributions import (
            DiagonalGaussianDistribution,
        )

        moments = rng.standard_normal((2, 16, 4, 4)).astype(np.float32)
        ref = DiagonalGaussianDistribution(torch.from_numpy(moments))
        ours = DiagonalGaussian(np.transpose(moments, (0, 2, 3, 1)))
        np.testing.assert_allclose(
            np.transpose(np.asarray(ours.mean), (0, 3, 1, 2)),
            ref.mean.numpy(),
            rtol=1e-6,
        )
        np.testing.assert_allclose(
            np.transpose(np.asarray(ours.std), (0, 3, 1, 2)),
            ref.std.numpy(),
            rtol=1e-5,
        )


@requires_reference
class TestHiFiGANParity:
    @pytest.fixture(scope="class")
    def models(self):
        import torch

        _, hifigan = import_reference_audioldm()
        from audioldm.hifigan.utilities import HIFIGAN_16K_64

        torch.manual_seed(1)
        config = hifigan.AttrDict(HIFIGAN_16K_64)
        gen = hifigan.Generator(config)
        gen.eval()
        gen.remove_weight_norm()

        sd = {k: v.detach().numpy() for k, v in gen.state_dict().items()}
        params = convert_hifigan(sd)
        return gen, HiFiGANGenerator(), {"params": params}

    def test_generator_parity(self, models, rng):
        import torch

        gen, jax_gen, variables = models
        # [B, n_mels=64, T=32] torch NCW
        mel = rng.standard_normal((2, 64, 32)).astype(np.float32)
        with torch.no_grad():
            want = gen(torch.from_numpy(mel)).squeeze(1).numpy()
        got = np.asarray(jax_gen.apply(variables, np.transpose(mel, (0, 2, 1))))
        # output slightly exceeds hop*frames due to odd (k-u) paddings; the
        # reference truncates to 10 s downstream (inference.py:208)
        assert got.shape == want.shape == (2, 5152)
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)

    def test_vocoder_postprocess_global_centering(self, rng):
        wav = rng.standard_normal((3, 100)).astype(np.float32)
        got = np.asarray(vocoder_postprocess(wav))
        want = wav - (wav.max() + wav.min()) / 2
        np.testing.assert_allclose(got, want, rtol=1e-6)


@requires_reference
class TestFTVAEDecoderImport:
    """Stage-3 FTVAE checkpoint round-trip: the reference saves the
    fine-tuned decoder pair under vae.decoder/vae.post_quant_conv and the
    EMA pair under ema_vae_decoder/ema_vae_pqconv (+ vae.ema_* aliases and
    loss.-prefixed duplicates, models/audio_consistency_model_ftvae.py:52-91);
    extract_ftvae_decoders + convert_vae_decoder_pair must reproduce the
    reference's decode(use_ema=...) for both halves."""

    @pytest.mark.slow  # ~9 s; the FTVAE chain test also covers this path
    def test_extract_and_decode_parity(self):
        import torch
        from copy import deepcopy

        from consistencytta_tpu.io.torch_import import (
            convert_vae_decoder_pair,
            extract_ftvae_decoders,
        )

        vae_mod, _ = import_reference_audioldm()
        torch.manual_seed(7)
        vae = vae_mod.AutoencoderKL(**reference_vae_config())
        vae.eval()

        # "fine-tuned" decoder pair = module init; EMA pair = perturbed copy
        ema_dec = deepcopy(vae.decoder)
        ema_pq = deepcopy(vae.post_quant_conv)
        with torch.no_grad():
            for p in ema_dec.parameters():
                p.add_(0.01 * torch.randn_like(p))
            for p in ema_pq.parameters():
                p.add_(0.01 * torch.randn_like(p))
        vae.ema_decoder = ema_dec
        vae.ema_post_quant_conv = ema_pq

        # the FTVAE model state dict exactly as the reference writes it
        sd = {}
        for k, v in vae.state_dict().items():
            if not k.startswith("vocoder."):
                sd["vae." + k] = v.detach().numpy()
        for k, v in ema_dec.state_dict().items():
            sd["ema_vae_decoder." + k] = v.detach().numpy()
        for k, v in ema_pq.state_dict().items():
            sd["ema_vae_pqconv." + k] = v.detach().numpy()
        # the CLAP loss module holds a vae reference -> loss.-prefixed
        # duplicates (handled by the reference's 'loss' branch, :78-86)
        for k in [k for k in sd if k.startswith("vae.")]:
            sd["loss." + k] = sd[k]

        trained_sd, ema_sd = extract_ftvae_decoders(sd)
        assert trained_sd is not None and ema_sd is not None

        config = VAEConfig(scale_factor=0.9227)
        base = convert_vae(
            {k[len("vae.") :]: v for k, v in sd.items() if k.startswith("vae.")},
            config,
        )
        trained_pair = convert_vae_decoder_pair(trained_sd, config)
        ema_pair = convert_vae_decoder_pair(ema_sd, config)
        model = AutoencoderKL(config)

        rng = np.random.default_rng(3)
        z = (rng.standard_normal((1, 8, 16, 16)) * 2).astype(np.float32)
        z_nhwc = np.transpose(z, (0, 2, 3, 1))
        with torch.no_grad():
            want_plain = vae.decode(torch.from_numpy(z), use_ema=False).numpy()
            want_ema = vae.decode(torch.from_numpy(z), use_ema=True).numpy()

        got_plain = model.apply(
            {"params": {**base, **trained_pair}}, z_nhwc, method=model.decode
        )
        got_ema = model.apply(
            {"params": {**base, **ema_pair}}, z_nhwc, method=model.decode
        )
        np.testing.assert_allclose(
            np.transpose(np.asarray(got_plain), (0, 3, 1, 2)), want_plain,
            atol=2e-4, rtol=1e-3,
        )
        np.testing.assert_allclose(
            np.transpose(np.asarray(got_ema), (0, 3, 1, 2)), want_ema,
            atol=2e-4, rtol=1e-3,
        )
        # and the two decoders genuinely differ
        assert np.abs(want_plain - want_ema).max() > 1e-3
