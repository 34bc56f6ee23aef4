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
    fan_out_tango_checkpoint,
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
