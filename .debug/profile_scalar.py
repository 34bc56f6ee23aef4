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

def timed(name, fn, *args, iters=10):
    # fn returns a scalar; transfer is 4 bytes
    _=float(fn(*args))
    t0=time.perf_counter()
    for _ in range(iters):
        s=float(fn(*args))
    print(f"{name}: {(time.perf_counter()-t0)/iters*1000:.1f} ms", flush=True)

ids = np.ones((B,64),np.int32); mask=np.ones((B,64),np.int32)
t5s = jax.jit(lambda par,i,m: p.encode_text(par,i,m).sum())
timed("t5", t5s, params.t5, ids, mask)
text = jax.jit(lambda par,i,m: p.encode_text(par,i,m))(params.t5, ids, mask)
z = jnp.zeros((B,256,16,8)); t=jnp.zeros((B,)); g=jnp.full((B,),4.0)
timed("unet", jax.jit(lambda par,z,t,tx,m,g: p.query_student(par,z,t,tx,m,g).sum()), params.student, z, t, text, mask, g)
vdec = jax.jit(lambda par,z: p.vae.apply({"params":par}, z, method=p.vae.decode_first_stage))
mel = vdec(params.vae, z)
timed("vae_decode", jax.jit(lambda par,z: p.vae.apply({"params":par}, z, method=p.vae.decode_first_stage).sum()), params.vae, z)
timed("vocoder", jax.jit(lambda par,m: p.vocoder.apply({"params":par}, m).sum()), params.vocoder, mel[...,0])
timed("dispatch", jax.jit(lambda par, z: (z+1.0).sum()), params.student, z)
gen = build_generate_fn(p, GenerateConfig(num_steps=1), jit=False)
gens = jax.jit(lambda *a: gen(*a).sum())
timed("generate_e2e", gens, params, ids, mask, ids, mask, jax.random.PRNGKey(0), np.float32(4.0))
