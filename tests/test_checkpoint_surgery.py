"""Checkpoint key-surgery and config round-trip tests."""

import numpy as np
import pytest

from consistencytta_tpu.configs import (
    PipelineConfig,
    SchedulerConfig,
    STFTConfig,
    UNetConfig,
)
from consistencytta_tpu.io.torch_import import (
    convert_unet,
    fan_out_tango_checkpoint,
    init_guidance_params,
    split_consistencytta_checkpoint,
    strip_prefix,
)


def arr(v):
    return np.full((2,), float(v), np.float32)


class TestTangoFanOut:
    def test_teacher_only_fanout(self):
        """TANGO unet.* weights initialize all four roles
        (models/audio_consistency_model.py:107-124, stage1_state_dict=None)."""
        tango = {"unet.conv_in.weight": arr(1), "unet.conv_in.bias": arr(2),
                 "vae.something": arr(9)}
        roles = fan_out_tango_checkpoint(tango)
        for role in ("teacher", "student", "student_target", "student_ema"):
            np.testing.assert_array_equal(roles[role]["conv_in.weight"], arr(1))

    def test_stage1_overrides_students(self):
        """With a stage-1 dict, student/target/ema come from its student_ema
        weights; the teacher keeps TANGO (:126-131)."""
        tango = {"unet.conv_in.weight": arr(1)}
        stage1 = {"student_ema_unet.conv_in.weight": arr(5),
                  "student_unet.conv_in.weight": arr(3)}
        roles = fan_out_tango_checkpoint(tango, stage1)
        np.testing.assert_array_equal(roles["teacher"]["conv_in.weight"], arr(1))
        for role in ("student", "student_target", "student_ema"):
            np.testing.assert_array_equal(roles[role]["conv_in.weight"], arr(5))


class TestTolerantGuidedImport:
    """The TANGO cold start: plain-teacher weights fan out into the guided
    student with strict=False semantics — missing guidance modules get fresh
    init (models/audio_consistency_model.py:133-149)."""

    def _tiny_guided_config(self):
        return UNetConfig.from_dict({
            **UNetConfig().to_dict(),
            "block_out_channels": (16, 16, 32, 32),
            "attention_head_dim": (2, 2, 4, 4),
            "cross_attention_dim": 32,
            "norm_num_groups": 8,
        })

    @pytest.mark.slow
    def test_init_guidance_params_matches_flax_init_structure(self):
        import jax
        import jax.numpy as jnp

        from consistencytta_tpu.nn.unet import UNet2DConditionGuided

        cfg = self._tiny_guided_config()
        model = UNet2DConditionGuided(cfg)
        sample = np.zeros((1, 16, 16, 8), np.float32)
        text = np.zeros((1, 5, 32), np.float32)
        mask = np.ones((1, 5), np.int32)
        flax_init = model.init(
            jax.random.PRNGKey(0), sample, np.array([1.0]), text, mask,
            guidance=np.array([3.0]),
        )["params"]

        fresh = init_guidance_params(cfg)
        for key in ("guidance_proj", "guidance_embedding"):
            want = jax.tree_util.tree_map(
                lambda x: (x.shape, str(x.dtype)), flax_init[key]
            )
            got = jax.tree_util.tree_map(
                lambda x: (x.shape, str(x.dtype)), fresh[key]
            )
            assert want == got, f"{key}: {got} != {want}"

    def test_same_seed_gives_identical_init_across_roles(self):
        cfg = self._tiny_guided_config()
        a = init_guidance_params(cfg, seed=0)
        b = init_guidance_params(cfg, seed=0)
        np.testing.assert_array_equal(
            a["guidance_proj"]["weight"], b["guidance_proj"]["weight"]
        )

    @pytest.mark.skipif(
        not __import__("os").path.isdir("/root/reference"),
        reason="reference repo not mounted",
    )
    @pytest.mark.slow
    def test_tango_cold_start_fan_out(self, rng):
        """Full repro of the stage-1 load: a plain (unguided) torch UNet's
        weights initialize all four roles; the guided conversion must not
        KeyError, and the converted student must run a forward."""
        import torch

        from tests.conftest import import_reference_diffusers
        from tests.test_unet import small_config_dict

        import_reference_diffusers()
        from diffusers import UNet2DConditionModel

        torch.manual_seed(0)
        d = small_config_dict()
        torch_model = UNet2DConditionModel.from_config(d)
        tango_sd = {
            "unet." + k: v.detach().numpy()
            for k, v in torch_model.state_dict().items()
        }

        roles = fan_out_tango_checkpoint(tango_sd)
        guided_cfg = UNetConfig.from_diffusers_json(d)
        assert guided_cfg.guided

        # strict mode reproduces the old crash
        with pytest.raises(KeyError):
            convert_unet(roles["student"], guided_cfg, strict=True)

        converted = {
            role: convert_unet(roles[role], guided_cfg, strict=False)
            for role in ("student", "student_target", "student_ema")
        }
        # identical fresh guidance init across roles (the reference copies
        # the post-load state into target/ema)
        np.testing.assert_array_equal(
            converted["student"]["guidance_proj"]["weight"],
            converted["student_ema"]["guidance_proj"]["weight"],
        )

        from consistencytta_tpu.nn.unet import UNet2DConditionGuided

        model = UNet2DConditionGuided(guided_cfg)
        out = model.apply(
            {"params": converted["student"]},
            rng.standard_normal((1, 32, 8, 8)).astype(np.float32),
            np.array([500.0], np.float32),
            rng.standard_normal((1, 5, guided_cfg.cross_attention_dim)).astype(
                np.float32
            ),
            np.ones((1, 5), np.int32),
            guidance=np.array([3.0], np.float32),
        )
        assert np.isfinite(np.asarray(out)).all()


class TestLegacyRemap:
    def test_modern_names(self):
        sd = {
            "teacher_unet.w": arr(1),
            "student_unet.w": arr(2),
            "student_target_unet.w": arr(3),
            "student_ema_unet.w": arr(4),
        }
        roles = split_consistencytta_checkpoint(sd)
        assert roles["teacher"]["w"][0] == 1
        assert roles["student"]["w"][0] == 2
        assert roles["student_target"]["w"][0] == 3
        assert roles["student_ema"]["w"][0] == 4

    def test_legacy_names(self):
        """consistency_unet -> student, consistency_ema -> target (+ema
        fallback), consistency_slow_ema -> ema, diffusion_unet -> teacher
        (models/audio_consistency_model.py:160-204)."""
        sd = {
            "diffusion_unet.w": arr(1),
            "consistency_unet.w": arr(2),
            "consistency_ema_unet.w": arr(3),
        }
        roles = split_consistencytta_checkpoint(sd)
        assert roles["teacher"]["w"][0] == 1
        assert roles["student"]["w"][0] == 2
        assert roles["student_target"]["w"][0] == 3
        assert roles["student_ema"]["w"][0] == 3  # fallback from ema

    def test_slow_ema_wins_for_ema(self):
        sd = {
            "consistency_ema_unet.w": arr(3),
            "consistency_slow_ema_unet.w": arr(7),
        }
        roles = split_consistencytta_checkpoint(sd)
        assert roles["student_target"]["w"][0] == 3
        assert roles["student_ema"]["w"][0] == 7

    def test_strip_prefix(self):
        sd = {"first_stage_model.encoder.w": arr(1), "other.w": arr(2)}
        out = strip_prefix(sd, "first_stage_model.")
        assert list(out) == ["encoder.w"]


class TestConfigRoundTrip:
    def test_pipeline_config_json(self):
        cfg = PipelineConfig()
        d = cfg.to_dict()
        back = PipelineConfig.from_dict(d)
        assert back.unet.block_out_channels == tuple(cfg.unet.block_out_channels)
        assert back.scheduler.beta_schedule == "scaled_linear"
        assert back.stft.hop_length == 160

    @pytest.mark.skipif(
        not __import__("os").path.isdir("/root/reference"),
        reason="reference repo not mounted",
    )
    def test_unet_from_diffusers_json(self):
        cfg = UNetConfig.from_diffusers_json(
            "/root/reference/configs/tango_diffusion_light.json"
        )
        assert cfg.block_out_channels == (256, 512, 1024, 1024)
        assert cfg.attention_head_dim == (5, 10, 20, 20)
        assert cfg.use_linear_projection and cfg.upcast_attention

    def test_scheduler_defaults_are_sd21(self):
        s = SchedulerConfig()
        assert (s.beta_start, s.beta_end) == (0.00085, 0.012)
        assert s.prediction_type == "v_prediction"
