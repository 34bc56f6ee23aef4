import time, jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from jax.experimental.pallas.ops.tpu.flash_attention import flash_attention, BlockSizes

B, H, S, D = 16, 5, 4096, 51
Dp = 64  # padded head dim
rng = np.random.default_rng(0)
q = jnp.asarray(rng.standard_normal((B,H,S,D)), jnp.bfloat16)
k = jnp.asarray(rng.standard_normal((B,H,S,D)), jnp.bfloat16)
v = jnp.asarray(rng.standard_normal((B,H,S,D)), jnp.bfloat16)

def pad(x):
    return jnp.pad(x, ((0,0),(0,0),(0,0),(0,Dp-D)))

@jax.jit
def ref_attn(q,k,v):
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * (D**-0.5)
    p = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v, preferred_element_type=jnp.float32).astype(q.dtype)

@jax.jit
def flash(q,k,v):
    out = flash_attention(pad(q), pad(k), pad(v), sm_scale=D**-0.5)
    return out[..., :D]

def timed(name, fn, *args, iters=8):
    out = fn(*args); _=float(np.asarray(out).ravel()[0])
    t0=time.perf_counter()
    for _ in range(iters):
        _=float(np.asarray(fn(*args)).ravel()[0])
    print(f"{name}: {(time.perf_counter()-t0)/iters*1000:.1f} ms", flush=True)
    return out

o1 = timed("xla_attn_4096", ref_attn, q, k, v)
try:
    o2 = timed("flash_attn_4096", flash, q, k, v)
    d = float(jnp.abs(o1.astype(jnp.float32)-o2.astype(jnp.float32)).max())
    print("max diff:", d, flush=True)
except Exception as e:
    print("flash failed:", type(e).__name__, str(e)[:300], flush=True)
