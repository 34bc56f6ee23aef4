import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from consistencytta_tpu.configs import STFTConfig
from consistencytta_tpu.ops.stft import MelFrontend, stft_magnitude
from consistencytta_tpu.ops.pallas_stft import stft_magnitude_pallas
f = MelFrontend(STFTConfig())
rng = np.random.default_rng(0)
wav = (rng.standard_normal((2, 32000)) * 0.3).astype(np.float32)
want = np.asarray(stft_magnitude(jnp.asarray(wav), f.cos_basis, f.sin_basis, 160, 512))
got = np.asarray(stft_magnitude_pallas(jnp.asarray(wav), f.cos_basis, f.sin_basis, hop_length=160, center_pad=512))
d = np.abs(want-got)
print("shape", want.shape, "max", d.max())
per_frame = d.max(axis=(0,2))
bad = np.where(per_frame > 1e-2)[0]
print("bad frames:", bad[:20], "... total", len(bad))
per_bin = d.max(axis=(0,1))
print("bad bins:", np.where(per_bin > 1e-2)[0][:10], "total", (per_bin>1e-2).sum())
