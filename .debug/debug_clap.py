import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
import sys; sys.path.insert(0, "/root/repo")
from tests.tiny import tiny_config
from tests.test_training import make_batch
from tests.test_clap_loss import TINY_HTSAT, TINY_ROBERTA
from consistencytta_tpu.models.pipeline import Pipeline, PipelineParams
from consistencytta_tpu.evaluation.clap_model import CLAPAudioTower, CLAPMelFrontend, CLAPTextTower
from consistencytta_tpu.training.clap_loss import build_clap_loss

pipeline = Pipeline.create(tiny_config())
params = pipeline.init_params(jax.random.PRNGKey(0), text_len=8)
frozen = PipelineParams(teacher=params.teacher, vae=params.vae, vocoder=params.vocoder, t5=params.t5)
key = jax.random.PRNGKey(1)
clip_s = tiny_config().segment_samples / 16000
audio_tower = CLAPAudioTower(TINY_HTSAT)
frontend = CLAPMelFrontend(TINY_HTSAT)
dummy = frontend(jnp.zeros((1, int(48000*clip_s))))
print("logmel shape", dummy.shape, flush=True)
audio_params = jax.jit(audio_tower.init)(key, dummy)["params"]
text_tower = CLAPTextTower(TINY_ROBERTA)
text_params = jax.jit(text_tower.init)(key, jnp.zeros((1,8),jnp.int32), jnp.ones((1,8),jnp.int32))["params"]
print("towers init ok", flush=True)

rng = np.random.default_rng(0)
batch = make_batch(rng, b=2, text_len=8)
batch["clap_text_ids"] = rng.integers(2,128,size=(2,8)).astype(np.int32)
batch["clap_text_mask"] = np.ones((2,8),np.int32)

loss_fn = build_clap_loss(pipeline, audio_params, text_params, htsat_config=TINY_HTSAT, roberta_config=TINY_ROBERTA, clip_seconds=clip_s)
pred = jnp.asarray(rng.standard_normal((2,16,16,8)), jnp.float32)
tgt = jnp.asarray(rng.standard_normal((2,16,16,8)), jnp.float32)
out = loss_fn(pred, tgt, frozen, batch)
print("clap instance loss:", np.asarray(out), flush=True)
g = jax.grad(lambda p: loss_fn(p, tgt, frozen, batch).mean())(pred)
print("grad norm:", float(jnp.linalg.norm(g)), flush=True)
