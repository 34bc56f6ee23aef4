"""Per-stage in-situ timing of the 1-NFE generation graph (batch 32, bf16).

The dev tunnel makes naive micro-timing lie in both directions (request
dedup -> impossibly fast; per-call host sync -> impossibly slow; see
PERF.md "Measurement methodology"). This tool therefore times each stage
as ONE jitted device-side fori_loop whose iteration i+1 input carries a
data dependency on iteration i's output (a dynamically-unfoldable +0
perturbation: `x + (acc * 1e-20).astype(x.dtype)` rounds to exactly +0 in
bf16 but cannot be constant-folded), so the tunnel sees a single request
and the device executes all iterations back-to-back. This is the harness
behind PERF.md's round-5 stage table (T5 / UNet / VAE decode / vocoder).

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_stages.py [off]
`off` forces the single-pass norm-stats gate off (A/B control for the
nn/layers.py `_NORM_SINGLE_PASS` fast path).
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

jax.config.update(
    "jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import consistencytta_tpu.nn.layers as L

MODE = "auto"
if len(sys.argv) > 1 and sys.argv[1] == "off":
    L._NORM_SINGLE_PASS = "off"
    MODE = "off"

from consistencytta_tpu.configs import PipelineConfig
from consistencytta_tpu.models.pipeline import Pipeline

BATCH = 32
TEXT_LEN = 64
ITERS = 10


def emit(msg):
    print(msg, flush=True)


def timed_loop(fn, params, x, extra, label, iters=ITERS):
    """fn(params, x, *extra) -> array. Times iters chained calls."""

    @jax.jit
    def run(params, x, extra):
        def body(i, acc):
            out = fn(params, x + (acc * 1e-20).astype(x.dtype), *extra)
            return acc + out.ravel()[0].astype(jnp.float32)

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    try:
        float(run(params, x, extra))  # compile + warm fetch
        t0 = time.perf_counter()
        r = float(run(params, x, extra))
        dt = (time.perf_counter() - t0) / iters * 1e3
        emit(f"[{MODE}] {label:18s} {dt:8.2f} ms/call  (acc={r:.4g})")
        return dt
    except Exception as e:
        emit(f"[{MODE}] {label:18s} FAILED: {type(e).__name__}: {e}")
        return None


def main():
    emit(f"---- prof_stages mode={MODE} {time.strftime('%H:%M:%S')}")
    config = PipelineConfig()
    pipeline = Pipeline.create(config, dtype=jnp.bfloat16)
    params = pipeline.init_params(jax.random.PRNGKey(0), text_len=TEXT_LEN)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params,
    )

    rng = np.random.default_rng(0)
    ids = jnp.asarray(
        rng.integers(2, 32000, size=(BATCH, TEXT_LEN)).astype(np.int32)
    )
    mask = jnp.ones((BATCH, TEXT_LEN), jnp.int32)

    def t5_fn(p, fids, mask):
        return pipeline.encode_text(p, fids.astype(jnp.int32), mask)

    timed_loop(t5_fn, params.t5, ids.astype(jnp.float32), (mask,), "t5_encode")

    text = jax.block_until_ready(pipeline.encode_text(params.t5, ids, mask))

    z = jnp.asarray(
        rng.standard_normal(pipeline.latent_shape(BATCH)).astype(np.float32)
    )
    t = jnp.full((BATCH,), 999.0, jnp.float32)
    g = jnp.full((BATCH,), 4.0, jnp.float32)

    def unet_fn(p, z, t, text, mask, g):
        return pipeline.query_student(p, z, t, text, mask, g)

    timed_loop(unet_fn, params.student_ema, z, (t, text, mask, g), "unet_query")

    def vae_fn(p, z):
        return pipeline.vae.apply(
            {"params": p}, z, method=pipeline.vae.decode_first_stage
        )

    timed_loop(vae_fn, params.vae, z, (), "vae_decode")

    mel = jax.block_until_ready(vae_fn(params.vae, z))[..., 0]

    def voc_fn(p, m):
        return pipeline.vocoder.apply({"params": p}, m)

    timed_loop(voc_fn, params.vocoder, mel, (), "vocoder")


if __name__ == "__main__":
    main()
