import time, jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from consistencytta_tpu.configs import PipelineConfig
from consistencytta_tpu.models.pipeline import Pipeline
B=16
config = PipelineConfig()
p = Pipeline.create(config, dtype=jnp.bfloat16)
params = p.init_params(jax.random.PRNGKey(0), text_len=64)
params = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16) if x.dtype==jnp.float32 else x, params)
print("init done", flush=True)

def timed_sync(name, fn, *args, iters=8):
    fn(*args)
    _ = float(np.asarray(fn(*args)).ravel()[0])
    t0=time.perf_counter()
    for _ in range(iters):
        acc = float(np.asarray(fn(*args)).ravel()[0])
    dt=(time.perf_counter()-t0)/iters
    print(f"{name}: {dt*1000:.1f} ms", flush=True)

ids = np.ones((B,64),np.int32); mask=np.ones((B,64),np.int32)
t5fn = jax.jit(lambda par,i,m: p.encode_text(par,i,m))
text = t5fn(params.t5, ids, mask)
timed_sync("t5", t5fn, params.t5, ids, mask)
z = jnp.zeros((B,256,16,8)); t=jnp.zeros((B,)); g=jnp.full((B,),4.0)
timed_sync("unet", jax.jit(lambda par,z,t,tx,m,g: p.query_student(par,z,t,tx,m,g)), params.student, z, t, jnp.asarray(text), mask, g)
vdec = jax.jit(lambda par,z: p.vae.apply({"params":par}, z, method=p.vae.decode_first_stage))
mel = vdec(params.vae, z)
timed_sync("vae_decode", vdec, params.vae, z)
timed_sync("vocoder", jax.jit(lambda par,m: p.vocoder.apply({"params":par}, m)), params.vocoder, jnp.asarray(mel)[...,0])
# trivial op to measure per-call dispatch overhead with big param tree
timed_sync("dispatch_overhead", jax.jit(lambda par, z: z + 1.0), params.student, z)
