import time, jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from consistencytta_tpu.configs import PipelineConfig, UNetConfig
from consistencytta_tpu.models.pipeline import Pipeline
from consistencytta_tpu.nn.unet import UNet2DConditionGuided
B=16
base = PipelineConfig()
params_cache = {}

def timed_sync(name, fn, *args, iters=8):
    fn(*args)
    _ = float(np.asarray(fn(*args)).ravel()[0])
    t0=time.perf_counter()
    for _ in range(iters):
        acc = float(np.asarray(fn(*args)).ravel()[0])
    dt=(time.perf_counter()-t0)/iters
    print(f"{name}: {dt*1000:.1f} ms", flush=True)

ids = np.ones((B,64),np.int32); mask=np.ones((B,64),np.int32)
z = jnp.zeros((B,256,16,8)); t=jnp.zeros((B,)); g=jnp.full((B,),4.0)
text = jnp.zeros((B,64,1024), jnp.bfloat16)

for label, upcast in [("upcast_fp32", True), ("bf16_attn", False)]:
    cfg = UNetConfig.from_dict({**base.unet.to_dict(), "upcast_attention": upcast})
    model = UNet2DConditionGuided(cfg, dtype=jnp.bfloat16)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), z, t, text, mask, guidance=g)
    variables = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16) if x.dtype==jnp.float32 else x, variables)
    fn = jax.jit(lambda v, z,t,tx,m,g: model.apply(v, z,t,tx,m,guidance=g))
    timed_sync(f"unet_{label}", fn, variables, z, t, text, mask, g)
