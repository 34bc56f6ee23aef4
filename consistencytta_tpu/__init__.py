"""ConsistencyTTA-TPU: a TPU-native JAX framework for single-step text-to-audio.

A from-scratch rebuild of the capabilities of Bai-YT/ConsistencyTTA
(INTERSPEECH 2024, arXiv:2309.10740) designed for TPU hardware:

* the full generation pipeline (FLAN-T5 text encoder -> CFG-guidance-conditioned
  UNet denoiser -> AudioLDM VAE mel-latent decoder -> HiFi-GAN vocoder) compiles
  into a single jitted XLA graph (`consistencytta_tpu.inference.generate`),
* diffusion/consistency schedulers are pure-functional sigma/alpha-bar tables
  (`consistencytta_tpu.ops.schedulers`) instead of stateful objects,
* the three-stage distillation recipe (guided diffusion distillation,
  consistency distillation with EMA target network, CLAP-score fine-tuning)
  runs as pjit/shard_map data-parallel train steps over a `jax.sharding.Mesh`,
* the STFT/mel frontend and other hot ops have Pallas TPU kernels
  (`consistencytta_tpu.ops`).

Reference behavior citations throughout the tree point at the upstream PyTorch
implementation (file:line) for parity checking; the code itself is new and
TPU-first.
"""

__version__ = "0.1.0"
