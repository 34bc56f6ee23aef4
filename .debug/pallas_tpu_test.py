import time, jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from consistencytta_tpu.configs import STFTConfig
from consistencytta_tpu.ops.stft import MelFrontend, stft_magnitude
from consistencytta_tpu.ops.pallas_stft import stft_magnitude_pallas

f = MelFrontend(STFTConfig())
rng = np.random.default_rng(0)
wav = (rng.standard_normal((16, 163840)) * 0.3).astype(np.float32)

want = np.asarray(stft_magnitude(jnp.asarray(wav), f.cos_basis, f.sin_basis, 160, 512))
got = np.asarray(stft_magnitude_pallas(jnp.asarray(wav), f.cos_basis, f.sin_basis, hop_length=160, center_pad=512))
print("shapes", want.shape, got.shape, flush=True)
d = np.abs(want-got)
print("max abs diff:", d.max(), "rel@big:", (d/(np.abs(want)+1)).max(), flush=True)

def timed(name, fn, iters=10):
    s = float(fn())
    t0=time.perf_counter()
    for _ in range(iters):
        s=float(fn())
    print(f"{name}: {(time.perf_counter()-t0)/iters*1000:.1f} ms", flush=True)

xla = jax.jit(lambda w: stft_magnitude(w, f.cos_basis, f.sin_basis, 160, 512).sum())
pal = jax.jit(lambda w: stft_magnitude_pallas(w, f.cos_basis, f.sin_basis, hop_length=160, center_pad=512).sum())
wj = jnp.asarray(wav)
timed("xla_stft", lambda: xla(wj))
timed("pallas_stft", lambda: pal(wj))
