"""One-class convenience API: the easy_inference equivalent.

Parity target: easy_inference/consistencytta.py — a standalone object that
loads checkpoints once and turns prompts into waveforms:

    from consistencytta_tpu.easy import ConsistencyTTA
    model = ConsistencyTTA(
        unet_checkpoint="consistencytta_clapft_ckpt/unet_state_dict.pt",
        vae_checkpoint="consistencytta_clapft_ckpt/vae_state_dict.pt",
    )
    wav = model("A dog barks while a car passes by.", cfg_scale_input=4.0)

Unlike the reference (which re-vendors its dependency tree), this simply
wraps the framework's jitted generate graph.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Union

import numpy as np


class ConsistencyTTA:
    def __init__(
        self,
        unet_checkpoint: Optional[str] = None,
        vae_checkpoint: Optional[str] = None,
        full_checkpoint: Optional[str] = None,
        unet_config_json: Optional[str] = None,
        text_encoder: str = "google/flan-t5-large",
        use_bf16: bool = True,
        random_init_seed: Optional[int] = None,
        text_len: int = 64,
        pipeline_config=None,
    ):
        import jax
        import jax.numpy as jnp

        from consistencytta_tpu.configs import PipelineConfig, UNetConfig
        from consistencytta_tpu.models.pipeline import Pipeline, PipelineParams
        from consistencytta_tpu.text.tokenizer import load_tokenizer

        config = pipeline_config or PipelineConfig()
        if unet_config_json:
            config = PipelineConfig.from_dict(
                {**config.to_dict(),
                 "unet": UNetConfig.from_diffusers_json(unet_config_json).to_dict()}
            )
        self.config = config
        self.text_len = text_len
        self.pipeline = Pipeline.create(
            config, dtype=jnp.bfloat16 if use_bf16 else jnp.float32
        )
        self.tokenizer = load_tokenizer(text_encoder, vocab_size=config.t5.vocab_size)

        from consistencytta_tpu.io import torch_import as ti

        params = (
            self.pipeline.init_params(
                jax.random.PRNGKey(random_init_seed), text_len=text_len
            )
            if random_init_seed is not None
            else PipelineParams()
        )

        if vae_checkpoint:
            sd = ti.load_torch_state_dict(vae_checkpoint)
            if any(k.startswith("first_stage_model.") for k in sd):
                sd = ti.strip_prefix(sd, "first_stage_model.")
            voc = {k[len("vocoder.") :]: v for k, v in sd.items()
                   if k.startswith("vocoder.")}
            vae_sd = {k: v for k, v in sd.items() if not k.startswith("vocoder.")}
            params.vae = ti.convert_vae(vae_sd, config.vae)
            if voc:
                params.vocoder = ti.convert_hifigan(voc, config.vocoder)

        if unet_checkpoint:
            # a bare unet_state_dict.pt (easy_inference format)
            sd = ti.load_torch_state_dict(unet_checkpoint)
            converted = ti.convert_unet(sd, config.unet)
            params.student_ema = converted
            params.student = converted
        elif full_checkpoint:
            roles = ti.split_consistencytta_checkpoint(
                ti.load_torch_state_dict(full_checkpoint)
            )
            for role, tree in roles.items():
                if tree:
                    guided = role != "teacher"
                    cfg = config.unet if guided else UNetConfig.from_dict(
                        {**config.unet.to_dict(), "guided": False}
                    )
                    setattr(params, role, ti.convert_unet(tree, cfg))

        self.params = params
        self._generate_cache = {}
        self._rng = jax.random.PRNGKey(0)

    def _get_generate(self, num_steps: int, cfg_scale_post: float):
        from consistencytta_tpu.inference.generate import (
            GenerateConfig,
            build_generate_fn,
        )

        key = (num_steps, cfg_scale_post)
        if key not in self._generate_cache:
            self._generate_cache[key] = build_generate_fn(
                self.pipeline,
                GenerateConfig(
                    num_steps=num_steps,
                    guidance_post=cfg_scale_post,
                    truncate_seconds=9.5,  # easy_inference truncates 9.5 s
                ),
            )
        return self._generate_cache[key]

    def __call__(
        self,
        prompt: Union[str, Sequence[str]],
        cfg_scale_input: float = 3.0,
        cfg_scale_post: float = 1.0,
        num_steps: int = 1,
        num_samples: int = 1,
        seed: Optional[int] = None,
    ) -> np.ndarray:
        """prompt(s) -> waveform [B * num_samples, samples] float32.

        num_samples repeats each prompt (the reference's
        num_samples_per_prompt, easy_inference/consistencytta.py:104-132)."""
        import jax

        from consistencytta_tpu.text.tokenizer import tokenize_with_uncond

        prompts: List[str] = [prompt] if isinstance(prompt, str) else list(prompt)
        if num_samples > 1:
            prompts = [p for p in prompts for _ in range(num_samples)]
        ids, mask, uids, umask = tokenize_with_uncond(
            self.tokenizer, prompts, self.text_len
        )
        if seed is not None:
            rng = jax.random.PRNGKey(seed)
        else:
            self._rng, rng = jax.random.split(self._rng)
        generate = self._get_generate(num_steps, cfg_scale_post)
        wav = generate(
            self.params, ids, mask, uids, umask, rng, np.float32(cfg_scale_input)
        )
        return np.asarray(wav)
