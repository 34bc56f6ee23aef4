"""Shared CLI assembly helpers: config construction, checkpoint loading."""

from __future__ import annotations

import json
import os
from typing import Optional

import jax
import jax.numpy as jnp

from consistencytta_tpu.configs import PipelineConfig, UNetConfig, VAEConfig
from consistencytta_tpu.models.pipeline import Pipeline, PipelineParams

# persistent XLA compile cache for all CLIs: full-pipeline graphs take
# minutes to compile; subsequent runs reuse the cached executables
_cache_dir = os.environ.get(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass


def build_pipeline_config(args) -> PipelineConfig:
    base = PipelineConfig()
    unet = base.unet
    if getattr(args, "unet_model_config", None):
        unet = UNetConfig.from_diffusers_json(args.unet_model_config)
    return PipelineConfig(
        unet=unet,
        vae=base.vae,
        vocoder=base.vocoder,
        stft=base.stft,
        t5=base.t5,
        scheduler=base.scheduler,
        latent=base.latent,
    )


def load_frozen_and_roles(
    pipeline: Pipeline,
    tango_model: Optional[str] = None,
    stage1_model: Optional[str] = None,
    model_path: Optional[str] = None,
    vae_checkpoint: Optional[str] = None,
    random_init_rng: Optional[jax.Array] = None,
    text_len: int = 64,
) -> PipelineParams:
    """Assemble PipelineParams from torch checkpoints, mirroring the
    reference loading paths (train.py:348-354, inference.py:119-158):

      * vae_checkpoint: audioldm-s-full.ckpt (first_stage_model.* surgery +
        scale_factor, tools/build_pretrained.py:8-36); its vocoder weights
        feed the HiFi-GAN
      * tango_model (+ stage1_model): teacher/student/target/ema fan-out
      * model_path: a full ConsistencyTTA pytorch_model_2.bin

    Falls back to random init for any missing piece when random_init_rng is
    given (development/benchmark mode).
    """
    from consistencytta_tpu.io import torch_import as ti

    params = (
        pipeline.init_params(random_init_rng, text_len=text_len)
        if random_init_rng is not None
        else PipelineParams()
    )

    if vae_checkpoint:
        sd = ti.load_torch_state_dict(vae_checkpoint)
        vae_sd = ti.strip_prefix(sd, "first_stage_model.")
        voc_sd = {
            k[len("vocoder.") :]: v for k, v in vae_sd.items() if k.startswith("vocoder.")
        }
        vae_sd = {k: v for k, v in vae_sd.items() if not k.startswith("vocoder.")}
        params.vae = ti.convert_vae(vae_sd, pipeline.config.vae)
        if voc_sd:
            params.vocoder = ti.convert_hifigan(voc_sd, pipeline.config.vocoder)

    roles = None
    if model_path:
        sd = ti.load_torch_state_dict(model_path)
        roles = ti.split_consistencytta_checkpoint(sd)
    elif tango_model:
        tango_sd = ti.load_torch_state_dict(tango_model)
        stage1_sd = (
            ti.load_torch_state_dict(stage1_model) if stage1_model else None
        )
        roles = ti.fan_out_tango_checkpoint(tango_sd, stage1_sd)

    if roles:
        guided_cfg = pipeline.config.unet
        teacher_cfg = UNetConfig.from_dict({**guided_cfg.to_dict(), "guided": False})
        if roles.get("teacher"):
            params.teacher = ti.convert_unet(roles["teacher"], teacher_cfg)
        for role in ("student", "student_target", "student_ema"):
            if roles.get(role):
                converted = ti.convert_unet(roles[role], guided_cfg)
                setattr(params, role, converted)

    return params


def append_config_replay(output_dir: str, args) -> None:
    """Write the full flag namespace to summary.jsonl (the reference's
    config-replay contract, train.py:304-305)."""
    os.makedirs(output_dir, exist_ok=True)
    with open(os.path.join(output_dir, "summary.jsonl"), "a") as f:
        f.write(json.dumps(vars(args), default=str) + "\n")


def read_config_replay(path: str) -> dict:
    """First line of a summary.jsonl (inference.py:114)."""
    with open(path) as f:
        return json.loads(f.readline())
