"""Guided UNet parity tests against the reference torch implementation.

Builds the reference UNet2DConditionGuidedModel / UNet2DConditionModel from
the shipped lightweight config with random init, ports the weights, and
asserts output parity — the checkpoint-port guarantee for
`pytorch_model_2.bin` without needing the actual checkpoint.
"""

import json

import numpy as np
import pytest

from consistencytta_tpu.configs import UNetConfig
from consistencytta_tpu.io.torch_import import convert_unet
from consistencytta_tpu.nn.unet import UNet2DConditionGuided
from tests.conftest import import_reference_diffusers, reference_available

requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)

LIGHT_CONFIG_PATH = "/root/reference/configs/tango_diffusion_light.json"


def small_config_dict():
    """A shrunken copy of tango_diffusion_light.json: same topology (4 levels,
    cross-attn placement, linear projection, non-divisible head splits) at
    testable size."""
    with open(LIGHT_CONFIG_PATH) as f:
        d = json.load(f)
    d["block_out_channels"] = [32, 64, 128, 128]
    d["attention_head_dim"] = [5, 10, 20, 20]  # head dims 6/6/6 with remainder
    d["cross_attention_dim"] = 64
    return d


def _port_and_compare(torch_model, config, guided, rng, atol=2e-4):
    import torch

    torch_model.eval()
    sd = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}
    params = convert_unet(sd, config)
    model = UNet2DConditionGuided(config)

    b = 2
    sample = rng.standard_normal((b, 8, 32, 8)).astype(np.float32)  # NCHW
    text = rng.standard_normal((b, 7, config.cross_attention_dim)).astype(np.float32)
    mask = np.array([[1, 1, 1, 1, 0, 0, 0], [1, 1, 1, 1, 1, 1, 1]], np.int32)
    t = np.array([999.0, 940.2352941176471], np.float32)
    w = np.array([3.5, 1.2], np.float32)

    kwargs = dict(guidance=torch.from_numpy(w)) if guided else {}
    with torch.no_grad():
        want = torch_model(
            torch.from_numpy(sample),
            torch.from_numpy(t),
            encoder_hidden_states=torch.from_numpy(text),
            encoder_attention_mask=torch.from_numpy(mask),
            **kwargs,
        ).sample.numpy()

    got = model.apply(
        {"params": params},
        np.transpose(sample, (0, 2, 3, 1)),
        t,
        text,
        mask,
        guidance=w if guided else None,
    )
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=atol, rtol=1e-3)


@requires_reference
class TestUNetParity:
    @pytest.mark.slow  # torch-reference build + jit (~35 s)
    def test_guided_unet_small(self, rng):
        import torch

        import_reference_diffusers()
        from diffusers import UNet2DConditionGuidedModel

        torch.manual_seed(0)
        d = small_config_dict()
        torch_model = UNet2DConditionGuidedModel.from_config(d)
        config = UNetConfig.from_diffusers_json(d)
        assert config.guided
        _port_and_compare(torch_model, config, guided=True, rng=rng)

    @pytest.mark.slow  # ~27 s; quick tier keeps UNet coverage via
    # test_generate's full-pipeline compile + determinism tests
    def test_plain_teacher_unet_small(self, rng):
        import torch

        import_reference_diffusers()
        from diffusers import UNet2DConditionModel

        torch.manual_seed(1)
        d = small_config_dict()
        torch_model = UNet2DConditionModel.from_config(d)
        config = UNetConfig.from_diffusers_json(d)
        config = UNetConfig.from_dict({**config.to_dict(), "guided": False})
        _port_and_compare(torch_model, config, guided=False, rng=rng)

    @pytest.mark.slow
    def test_guided_unet_full_light_config(self, rng):
        """Full-size tango_diffusion_light UNet parity (slow on CPU)."""
        import torch

        import_reference_diffusers()
        from diffusers import UNet2DConditionGuidedModel

        torch.manual_seed(2)
        with open(LIGHT_CONFIG_PATH) as f:
            d = json.load(f)
        torch_model = UNet2DConditionGuidedModel.from_config(d)
        config = UNetConfig.from_diffusers_json(d)
        _port_and_compare(torch_model, config, guided=True, rng=rng, atol=5e-4)


class TestUNetShapes:
    @pytest.mark.slow
    def test_product_latent_shape(self, rng):
        """Forward at the real latent geometry [B, 256, 16, 8] with a tiny
        width config: shape preservation + finite output."""
        import jax

        config = UNetConfig.from_dict(
            {
                **UNetConfig().to_dict(),
                "block_out_channels": (16, 16, 32, 32),
                "attention_head_dim": (2, 2, 4, 4),
                "cross_attention_dim": 32,
                "norm_num_groups": 8,
            }
        )
        model = UNet2DConditionGuided(config)
        sample = rng.standard_normal((1, 256, 16, 8)).astype(np.float32)
        text = rng.standard_normal((1, 5, 32)).astype(np.float32)
        mask = np.ones((1, 5), np.int32)
        params = model.init(
            jax.random.PRNGKey(0), sample, np.array([999.0]), text, mask,
            guidance=np.array([3.0]),
        )
        out = model.apply(
            params, sample, np.array([999.0]), text, mask, guidance=np.array([3.0])
        )
        assert out.shape == (1, 256, 16, 8)
        assert np.isfinite(np.asarray(out)).all()
