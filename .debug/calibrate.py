import time, jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
N = 8192
a = jnp.ones((N,N), jnp.bfloat16)
b = jnp.ones((N,N), jnp.bfloat16)
@jax.jit
def mm(a,b):
    return jnp.dot(a,b, preferred_element_type=jnp.float32).astype(jnp.bfloat16).sum()
_=float(mm(a,b))
t0=time.perf_counter()
iters=20
for _ in range(iters):
    s=float(mm(a,b))
dt=(time.perf_counter()-t0)/iters
fl = 2*N**3
print(f"matmul {N}: {dt*1000:.1f} ms -> {fl/dt/1e12:.1f} TFLOPs", flush=True)

# chained matmuls in one program (amortize dispatch)
@jax.jit
def mm8(a,b):
    x = a
    for _ in range(8):
        x = jnp.dot(x, b, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        x = x / jnp.max(jnp.abs(x))
    return x.sum()
_=float(mm8(a,b))
t0=time.perf_counter()
for _ in range(iters):
    s=float(mm8(a,b))
dt=(time.perf_counter()-t0)/iters
print(f"8-chained matmul: {dt*1000:.1f} ms -> {8*fl/dt/1e12:.1f} TFLOPs", flush=True)
