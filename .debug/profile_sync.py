import time, jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from consistencytta_tpu.configs import PipelineConfig
from consistencytta_tpu.models.pipeline import Pipeline
from consistencytta_tpu.inference.generate import GenerateConfig, build_generate_fn
B=16
config = PipelineConfig()
p = Pipeline.create(config, dtype=jnp.bfloat16)
params = p.init_params(jax.random.PRNGKey(0), text_len=64)
params = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16) if x.dtype==jnp.float32 else x, params)
print("init done", flush=True)

def timed_sync(name, fn, *args, iters=10):
    s = float(np.asarray(fn(*args)).sum())  # warmup + host read
    t0=time.perf_counter()
    acc = 0.0
    for _ in range(iters):
        acc += float(np.asarray(fn(*args)).ravel()[0])  # forced device->host per iter
    dt = (time.perf_counter()-t0)/iters
    print(f"{name}: {dt*1000:.1f} ms/iter (host-synced)", flush=True)

ids = np.ones((B,64),np.int32); mask=np.ones((B,64),np.int32)
t5fn = jax.jit(lambda par,i,m: p.encode_text(par,i,m))
text = t5fn(params.t5, ids, mask)
z = jnp.zeros((B,256,16,8)); t=jnp.zeros((B,)); g=jnp.full((B,),4.0)
unetfn = jax.jit(lambda par,z,t,tx,m,g: p.query_student(par,z,t,tx,m,g))
timed_sync("unet_b16", unetfn, params.student, z, t, text, mask, g)
gen = build_generate_fn(p, GenerateConfig(num_steps=1))
timed_sync("generate_b16", gen, params, ids, mask, ids, mask, jax.random.PRNGKey(0), np.float32(4.0))
