"""Benchmark: 1-NFE end-to-end generation throughput on one TPU chip.

Measures the product path (BASELINE.md north star): 10-second clips per
second per chip at 1 NFE, through the full jitted graph — T5 encode ->
guided UNet (tango_diffusion_light geometry) -> VAE decode -> HiFi-GAN —
with bfloat16 compute and batch 32 (the reference eval batch size,
inference.sh:1-27).

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline denominator: the reference publishes no latency numbers (only
~400x NFE reduction and multi-day training wall-clocks, README.md:121-142),
so the denominator is the MEASURED multi-step teacher baseline on this same
chip — build_teacher_generate_fn, 18 Heun steps (35 NFE) with CFG, batch
32, bf16: 2.21 clips/s/chip (PERF.md). vs_baseline is therefore the
consistency-distillation speedup realized end-to-end on identical hardware
(the reference's corresponding figure is its ~400x core-NFE claim, which
ignores the text encoder, VAE, and vocoder).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

# persistent compile cache: the full-pipeline graph is large and the first
# compile is expensive; subsequent bench runs reuse the cached executable
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BASELINE_CLIPS_PER_SEC = 2.21  # measured same-chip 35-NFE teacher baseline


def main() -> None:
    from consistencytta_tpu.configs import PipelineConfig
    from consistencytta_tpu.inference.generate import (
        GenerateConfig,
        build_generate_fn,
    )
    from consistencytta_tpu.models.pipeline import Pipeline

    # batch 32 (the reference eval batch size): fits one v5e chip with bf16
    # params and bf16-stored attention logits (the reference evaluates under
    # bf16 autocast too, inference.sh --use_bf16)
    batch = 32
    text_len = 64

    config = PipelineConfig()
    pipeline = Pipeline.create(config, dtype=jnp.bfloat16)
    params = pipeline.init_params(jax.random.PRNGKey(0), text_len=text_len)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params
    )
    generate = build_generate_fn(pipeline, GenerateConfig(num_steps=1))

    rng_np = np.random.default_rng(0)
    ids = rng_np.integers(2, 32000, size=(batch, text_len)).astype(np.int32)
    mask = np.ones((batch, text_len), np.int32)
    uncond_ids = np.full((batch, text_len), 1, np.int32)
    uncond_mask = np.ones((batch, text_len), np.int32)
    guidance = np.float32(4.0)

    # compile + warmup
    wav = generate(
        params, ids, mask, uncond_ids, uncond_mask, jax.random.PRNGKey(0), guidance
    )
    wav.block_until_ready()

    iters = 10
    t0 = time.perf_counter()
    for i in range(iters):
        wav = generate(
            params, ids, mask, uncond_ids, uncond_mask,
            jax.random.PRNGKey(i + 1), guidance,
        )
    wav.block_until_ready()
    dt = time.perf_counter() - t0

    clips_per_sec = batch * iters / dt
    print(
        json.dumps(
            {
                "metric": "10s_clips_per_sec_per_chip_1nfe",
                "value": round(clips_per_sec, 3),
                "unit": "clips/s/chip",
                "vs_baseline": round(clips_per_sec / BASELINE_CLIPS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
