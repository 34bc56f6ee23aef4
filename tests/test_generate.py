"""End-to-end generation graph tests (tiny config): the full tokens ->
waveform path compiles as one jitted function and behaves deterministically.
"""

import jax
import numpy as np
import pytest

from consistencytta_tpu.inference.generate import (
    GenerateConfig,
    build_generate_fn,
    build_teacher_generate_fn,
)
from consistencytta_tpu.models.pipeline import Pipeline
from consistencytta_tpu.text.tokenizer import HashTokenizer, tokenize_with_uncond
from tests.tiny import cached_init_params, tiny_config


@pytest.fixture(scope="module")
def pipeline():
    return Pipeline.create(tiny_config())


@pytest.fixture(scope="module")
def params(pipeline):
    return cached_init_params(pipeline, text_len=16)


@pytest.fixture(scope="module")
def text_batch():
    tok = HashTokenizer(vocab_size=256)
    return tokenize_with_uncond(
        tok, ["a dog barks", "rain falls on a tin roof"], max_length=16
    )


class TestGenerate:
    def test_one_step_shapes_and_determinism(self, pipeline, params, text_batch):
        ids, mask, uids, umask = text_batch
        gen = build_generate_fn(
            pipeline, GenerateConfig(num_steps=1, truncate_seconds=0.5)
        )
        rng = jax.random.PRNGKey(42)
        wav1 = gen(params, ids, mask, uids, umask, rng, 4.0)
        wav2 = gen(params, ids, mask, uids, umask, rng, 4.0)
        assert wav1.shape == (2, 8000)
        assert np.isfinite(np.asarray(wav1)).all()
        np.testing.assert_array_equal(np.asarray(wav1), np.asarray(wav2))

    @pytest.mark.slow  # extra chunked-decode graph compiles
    def test_chunked_decode_matches_unchunked(self, pipeline, params):
        """decode_latents(chunk=k) must be bit-compatible with the direct
        path (the DC centering stays batch-global)."""
        rng = np.random.default_rng(0)
        z = rng.standard_normal((4,) + pipeline.latent_shape(1)[1:]).astype(
            np.float32
        )
        full = np.asarray(
            pipeline.decode_latents(params.vae, params.vocoder, z)
        )
        chunked = np.asarray(
            pipeline.decode_latents(params.vae, params.vocoder, z, chunk=2)
        )
        np.testing.assert_allclose(chunked, full, atol=1e-6, rtol=1e-5)

    def test_guidance_changes_output(self, pipeline, params, text_batch):
        ids, mask, uids, umask = text_batch
        gen = build_generate_fn(
            pipeline, GenerateConfig(num_steps=1, truncate_seconds=0.5)
        )
        rng = jax.random.PRNGKey(0)
        w4 = np.asarray(gen(params, ids, mask, uids, umask, rng, 4.0))
        w1 = np.asarray(gen(params, ids, mask, uids, umask, rng, 1.0))
        # relative: random-init vocoder amplitudes are tiny (~1e-7)
        assert np.abs(w4 - w1).max() > 0.01 * np.abs(w4).max()

    @pytest.mark.slow  # extra sampling-graph compile; composed parity covers it
    def test_multi_step_and_post_cfg(self, pipeline, params, text_batch):
        ids, mask, uids, umask = text_batch
        gen = build_generate_fn(
            pipeline,
            GenerateConfig(num_steps=2, guidance_post=2.0, truncate_seconds=0.5),
        )
        wav = gen(params, ids, mask, uids, umask, jax.random.PRNGKey(1), 4.0)
        assert wav.shape == (2, 8000)
        assert np.isfinite(np.asarray(wav)).all()

    @pytest.mark.slow  # two multi-step sampling graph compiles
    def test_teacher_heun_and_ddim(self, pipeline, params, text_batch):
        ids, mask, uids, umask = text_batch
        for use_edm in (True, False):
            gen = build_teacher_generate_fn(
                pipeline, num_steps=3, use_edm=use_edm, truncate_seconds=0.5
            )
            wav = gen(params, ids, mask, uids, umask, jax.random.PRNGKey(2), 3.0)
            assert wav.shape == (2, 8000)
            assert np.isfinite(np.asarray(wav)).all()

    def test_output_is_dc_centered(self, pipeline, params, text_batch):
        ids, mask, uids, umask = text_batch
        gen = build_generate_fn(
            pipeline, GenerateConfig(num_steps=1, truncate_seconds=None)
        )
        wav = np.asarray(
            gen(params, ids, mask, uids, umask, jax.random.PRNGKey(3), 4.0)
        )
        # vocoder_postprocess centers global extrema at 0 (pre-truncation)
        np.testing.assert_allclose(wav.max() + wav.min(), 0.0, atol=1e-5)
