"""Shared CLI assembly helpers: config construction, checkpoint loading."""

from __future__ import annotations

import json
import os
from typing import Optional

import jax
import jax.numpy as jnp

from consistencytta_tpu.configs import PipelineConfig, UNetConfig, VAEConfig
from consistencytta_tpu.models.pipeline import Pipeline, PipelineParams

# Zero-egress box: without these, every transformers from_pretrained pays
# ~45 s of DNS retries before the HashTokenizer fallback kicks in. Users
# with network can still export HF_HUB_OFFLINE=0 explicitly.
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

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
    """PipelineConfig from CLI flags: `--pipeline_config` picks the base
    ("tiny" for the CI-scale pipeline, or a json path from a previous run's
    config.json); `--unet_model_config` overrides the UNet from a
    reference-format diffusers json (train.py --unet_model_config)."""
    import dataclasses

    pc = getattr(args, "pipeline_config", None)
    if pc == "tiny":
        base = PipelineConfig.tiny()
    elif pc:
        with open(pc) as f:
            base = PipelineConfig.from_dict(json.load(f))
    else:
        base = PipelineConfig()
    if getattr(args, "unet_model_config", None):
        base = dataclasses.replace(
            base, unet=UNetConfig.from_diffusers_json(args.unet_model_config)
        )
    return base


STUDENT_ROLES = ("student", "student_target", "student_ema")
FROZEN_KEYS = ("teacher", "vae", "vocoder", "t5")


def is_orbax_checkpoint(path: Optional[str]) -> bool:
    """True for directories written by io.checkpoints.save_checkpoint
    ({dir}/state [+ frozen, config.json])."""
    return bool(path) and os.path.isdir(path) and os.path.exists(
        os.path.join(path, "state")
    )


def _restore_orbax_roles(path: str):
    """Restore an orbax checkpoint dir -> (state_tree, frozen_tree_or_None).

    `state_tree` is the raw restored mapping keyed by TrainState field names
    (student / student_target / student_ema / ...), already flax param trees
    — no torch key surgery applies."""
    from consistencytta_tpu.io.checkpoints import load_checkpoint

    state, frozen, _ = load_checkpoint(path)
    return state, frozen


def load_frozen_and_roles(
    pipeline: Pipeline,
    tango_model: Optional[str] = None,
    stage1_model: Optional[str] = None,
    model_path: Optional[str] = None,
    vae_checkpoint: Optional[str] = None,
    random_init_rng: Optional[jax.Array] = None,
    text_len: int = 64,
) -> PipelineParams:
    """Assemble PipelineParams from torch or orbax checkpoints, mirroring the
    reference loading paths (train.py:348-354, inference.py:119-158):

      * vae_checkpoint: audioldm-s-full.ckpt (first_stage_model.* surgery +
        scale_factor, tools/build_pretrained.py:8-36); its vocoder weights
        feed the HiFi-GAN
      * tango_model (+ stage1_model): teacher/student/target/ema fan-out
        (models/audio_consistency_model.py:107-158). stage1_model may be an
        orbax dir from a previous stage (recipes/train.sh stages 2-3); its
        student_ema params seed student/target/ema directly.
      * model_path: a full ConsistencyTTA pytorch_model_2.bin, or an orbax
        checkpoint dir (student roles from `state`, frozen nets from
        `frozen`).

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

    roles = None       # torch state dicts, need key surgery + conversion
    flax_roles = None  # already-flax param trees, assigned verbatim
    # stage-3 FTVAE product: trained decoder pair + EMA pair, applied to
    # params.vae / params.vae_ema once the base VAE is in place
    vae_dec_tree = None
    vae_dec_ema_tree = None
    if model_path:
        if is_orbax_checkpoint(model_path):
            state, frozen_tree = _restore_orbax_roles(model_path)
            flax_roles = {
                r: state[r]
                for r in STUDENT_ROLES
                if isinstance(state, dict) and state.get(r) is not None
            }
            if frozen_tree:
                for k in FROZEN_KEYS:
                    if frozen_tree.get(k) is not None:
                        setattr(params, k, frozen_tree[k])
            # FTVAE orbax state (training.ftvae.FTVAETrainState): the
            # fine-tuned decoder pair + its EMA shadow load back for
            # inference (reference load_pretrained,
            # models/audio_consistency_model_ftvae.py:69-91)
            if isinstance(state, dict):
                vae_dec_tree = state.get("vae_dec")
                vae_dec_ema_tree = state.get("vae_dec_ema")
            # LoRA orbax state: roles hold rank-r A/B factors; merge into
            # the base student weights saved in the frozen tree (the
            # reference ships LoRA runs as runnable modules,
            # models/audio_distilled_model.py:116-145)
            from consistencytta_tpu.training.lora import is_lora_tree, merge_lora

            if flax_roles and any(is_lora_tree(t) for t in flax_roles.values()):
                base = frozen_tree.get("student") if frozen_tree else None
                if base is None:
                    raise ValueError(
                        f"{model_path} holds LoRA factors but no base student "
                        "weights in its frozen tree; cannot merge for inference"
                    )
                flax_roles = {
                    r: (merge_lora(base, t) if is_lora_tree(t) else t)
                    for r, t in flax_roles.items()
                }
        else:
            sd = ti.load_torch_state_dict(model_path)
            roles = ti.split_consistencytta_checkpoint(sd)
            ft_trained, ft_ema = ti.extract_ftvae_decoders(sd)
            if ft_trained is not None:
                vae_dec_tree = ti.convert_vae_decoder_pair(
                    ft_trained, pipeline.config.vae
                )
            if ft_ema is not None:
                vae_dec_ema_tree = ti.convert_vae_decoder_pair(
                    ft_ema, pipeline.config.vae
                )
    else:
        stage1_orbax = stage1_model and is_orbax_checkpoint(stage1_model)
        if tango_model:
            tango_sd = ti.load_torch_state_dict(tango_model)
            stage1_sd = (
                ti.load_torch_state_dict(stage1_model)
                if (stage1_model and not stage1_orbax)
                else None
            )
            roles = ti.fan_out_tango_checkpoint(tango_sd, stage1_sd)
        if stage1_orbax:
            # previous-stage orbax checkpoint (recipes/train.sh stages 2-3):
            # teacher still fans out from TANGO when given; student/target/
            # ema seed from the previous stage's EMA weights
            if roles:
                for r in STUDENT_ROLES:
                    roles.pop(r, None)
            state, _ = _restore_orbax_roles(stage1_model)
            seed_tree = state.get("student_ema")
            if seed_tree is None:
                seed_tree = state.get("student")
            if seed_tree is None:
                raise ValueError(
                    f"orbax checkpoint {stage1_model} has no student params"
                )
            flax_roles = {r: seed_tree for r in STUDENT_ROLES}

    if roles:
        guided_cfg = pipeline.config.unet
        teacher_cfg = UNetConfig.from_dict({**guided_cfg.to_dict(), "guided": False})
        if roles.get("teacher"):
            params.teacher = ti.convert_unet(roles["teacher"], teacher_cfg)
        for role in STUDENT_ROLES:
            if roles.get(role):
                # strict=False: the TANGO fan-out has no guidance keys; they
                # random-init identically across roles (init_seed fixed)
                converted = ti.convert_unet(roles[role], guided_cfg, strict=False)
                setattr(params, role, converted)
    if flax_roles:
        for role, tree in flax_roles.items():
            setattr(params, role, tree)

    # apply the FTVAE decoder pair last, over whichever base VAE loaded
    # (reference: "Replacing VAE with model's VAE", inference.py:156-158;
    # EMA pair selected at decode via use_ema, autoencoder.py:91-103)
    if vae_dec_tree is not None:
        if params.vae is None:
            raise ValueError(
                "FTVAE decoder weights found but no base VAE loaded; pass "
                "--vae_checkpoint (or an orbax checkpoint with a frozen vae)"
            )
        params.vae = {**params.vae, **vae_dec_tree}
    if vae_dec_ema_tree is not None:
        params.vae_ema = vae_dec_ema_tree

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
