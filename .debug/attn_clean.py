import time, jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from jax.experimental.pallas.ops.tpu.flash_attention import flash_attention

B,H,S,D,Dp = 16,5,4096,51,64
rng = np.random.default_rng(0)
q = jnp.asarray(rng.standard_normal((B,H,S,D)), jnp.bfloat16)
k = jnp.asarray(rng.standard_normal((B,H,S,D)), jnp.bfloat16)
v = jnp.asarray(rng.standard_normal((B,H,S,D)), jnp.bfloat16)

def timed(name, fn, iters=10):
    _=float(fn(q,k,v))
    t0=time.perf_counter()
    for _ in range(iters):
        s=float(fn(q,k,v))
    print(f"{name}: {(time.perf_counter()-t0)/iters*1000:.1f} ms", flush=True)

@jax.jit
def xla_f32(q,k,v):
    l = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)*(D**-0.5)
    p = jax.nn.softmax(l, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v, preferred_element_type=jnp.float32).sum()

@jax.jit
def xla_bf16(q,k,v):
    l = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.bfloat16)*(D**-0.5)
    p = jax.nn.softmax(l.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v, preferred_element_type=jnp.bfloat16).astype(jnp.float32).sum()

@jax.jit
def flash(q,k,v):
    pad = lambda x: jnp.pad(x, ((0,0),(0,0),(0,0),(0,Dp-D)))
    out = flash_attention(pad(q), pad(k), pad(v), sm_scale=D**-0.5)
    return out[..., :D].astype(jnp.float32).sum()

timed("xla_f32_logits", xla_f32)
timed("xla_bf16_logits", xla_bf16)
timed("flash_pad64", flash)
