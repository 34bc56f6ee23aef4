import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from jax.experimental.pallas import tpu as pltpu
from consistencytta_tpu.configs import STFTConfig
from consistencytta_tpu.ops.stft import MelFrontend, stft_magnitude
from consistencytta_tpu.ops.pallas_stft import stft_magnitude_pallas
import sys; sys.path.insert(0,'/root/repo/tests')
f = MelFrontend(STFTConfig())
rng = np.random.default_rng(0)
wav = (rng.standard_normal((1, 8000)) * 0.3).astype(np.float32)

# numpy ground truth
from consistencytta_tpu.ops.mel import hann_window, pad_center
window = pad_center(hann_window(1024, np.float64), 1024)
padded = np.pad(wav[0], 512, mode="reflect")
nf = (len(padded)-1024)//160 + 1
frames = np.stack([padded[i*160:i*160+1024] for i in range(nf)])
gt = np.abs(np.fft.rfft(frames*window, axis=1))

xla = np.asarray(stft_magnitude(jnp.asarray(wav), f.cos_basis, f.sin_basis, 160, 512))[0]
pal_tpu = np.asarray(stft_magnitude_pallas(jnp.asarray(wav), f.cos_basis, f.sin_basis, hop_length=160, center_pad=512))[0]
print("xla vs gt:", np.abs(xla-gt).max(), flush=True)
print("pal_tpu vs gt:", np.abs(pal_tpu-gt).max(), flush=True)
print("pal_tpu vs xla:", np.abs(pal_tpu-xla).max(), flush=True)
