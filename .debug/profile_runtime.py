import time, jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from consistencytta_tpu.configs import PipelineConfig
from consistencytta_tpu.models.pipeline import Pipeline
B=16
config = PipelineConfig()
p = Pipeline.create(config, dtype=jnp.bfloat16)
params = p.init_params(jax.random.PRNGKey(0), text_len=64)
params = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16) if x.dtype==jnp.float32 else x, params)
print("init done", flush=True)

def timed(name, fn, *args, iters=20):
    out = jax.block_until_ready(fn(*args))
    t0=time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter()-t0)/iters
    print(f"{name}: {dt*1000:.1f} ms/iter", flush=True)
    return out

ids = np.ones((B,64),np.int32); mask=np.ones((B,64),np.int32)
text = timed("t5_b16", jax.jit(lambda par,i,m: p.encode_text(par,i,m)), params.t5, ids, mask)
z = jnp.zeros((B,256,16,8)); t=jnp.zeros((B,)); g=jnp.full((B,),4.0)
timed("unet_b16", jax.jit(lambda par,z,t,tx,m,g: p.query_student(par,z,t,tx,m,g)), params.student, z, t, jnp.asarray(text), mask, g)
mel = timed("vae_decode_b16", jax.jit(lambda par,z: p.vae.apply({"params":par}, z, method=p.vae.decode_first_stage)), params.vae, z)
timed("vocoder_b16", jax.jit(lambda par,m: p.vocoder.apply({"params":par}, m)), params.vocoder, mel[...,0])
# frontend (training path)
wav = jnp.zeros((B,163840))
timed("mel_frontend_b16", jax.jit(lambda w: p.frontend.wav_to_mel_image(w)), wav)
timed("vae_encode_b16", jax.jit(lambda par,w,r: p.encode_audio(par,w,r)), params.vae, wav, jax.random.PRNGKey(0))
