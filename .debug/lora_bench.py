import time, jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from consistencytta_tpu.configs import PipelineConfig
from consistencytta_tpu.models.pipeline import Pipeline, PipelineParams
from consistencytta_tpu.ops.schedulers import make_heun_schedule
from consistencytta_tpu.training.optim import OptimizerConfig, make_optimizer
from consistencytta_tpu.training.step import ConsistencyStepConfig, TrainState
from consistencytta_tpu.training.lora import build_lora_consistency_train_step, init_lora_params, lora_param_count
from consistencytta_tpu.text.tokenizer import HashTokenizer, tokenize_with_uncond

MICRO = 6
config = PipelineConfig()
pipeline = Pipeline.create(config, dtype=jnp.bfloat16)
params = pipeline.init_params(jax.random.PRNGKey(0), text_len=64)
cast16 = lambda t: jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16) if x.dtype==jnp.float32 else x, t)
frozen = PipelineParams(teacher=cast16(params.teacher), vae=cast16(params.vae),
                        vocoder=cast16(params.vocoder), t5=cast16(params.t5),
                        student=cast16(params.student))
print("init done", flush=True)

sched = make_heun_schedule(config.scheduler, 18)
tx = make_optimizer(OptimizerConfig(learning_rate=1e-4, num_warmup_steps=0))
lora = init_lora_params(params.student, rank=4)
print("lora params:", lora_param_count(lora)/1e6, "M", flush=True)
step = jax.jit(build_lora_consistency_train_step(pipeline, sched, tx,
    ConsistencyStepConfig()), donate_argnums=(0,))
state = TrainState(step=jnp.zeros((),jnp.int32), student=lora,
                   student_target=jax.tree_util.tree_map(jnp.array, lora),
                   student_ema=jax.tree_util.tree_map(jnp.array, lora),
                   opt_state=tx.init(lora))
del params

tok = HashTokenizer()
ids, mask, uids, umask = tokenize_with_uncond(tok, [f"clip {i}" for i in range(MICRO)], 64)
rng_np = np.random.default_rng(0)
batch = {"wav": (rng_np.standard_normal((MICRO, 163840))*0.1).astype(np.float32),
         "ids": ids, "mask": mask, "uncond_ids": uids, "uncond_mask": umask}

t0=time.time()
state, metrics = step(state, frozen, batch, jax.random.PRNGKey(0))
print("compile+first step", round(time.time()-t0,1), "loss", float(metrics["loss"]), flush=True)
iters=5
t0=time.perf_counter()
for i in range(iters):
    state, metrics = step(state, frozen, batch, jax.random.PRNGKey(i))
jax.block_until_ready(metrics["loss"])
dt=(time.perf_counter()-t0)/iters
print(f"LoRA train step (micro {MICRO}): {dt*1000:.0f} ms -> {MICRO/dt:.2f} samples/s/chip", flush=True)
