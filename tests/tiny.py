"""Tiny pipeline configuration for tests (re-export of the package helper)."""

from consistencytta_tpu.configs import PipelineConfig


def tiny_config() -> PipelineConfig:
    return PipelineConfig.tiny()
