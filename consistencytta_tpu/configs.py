"""Configuration dataclasses for every component of the pipeline.

These replace three config systems in the reference implementation:
argparse flags (reference train.py:32-257), Diffusers' ``ConfigMixin`` json
round-trip (reference configs/tango_diffusion*.json), and hard-coded dicts
(reference audioldm/utils.py:102-205, audioldm/hifigan/utilities.py:9-39).
Every dataclass serializes to/from json so the `summary.jsonl`-style config
replay of the reference (train.py:304-305, inference.py:114) carries over.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Sequence, Tuple


def _asdict(obj) -> Dict[str, Any]:
    return dataclasses.asdict(obj)


class JsonConfig:
    """Mixin: json round-trip for config dataclasses."""

    def to_dict(self) -> Dict[str, Any]:
        return _asdict(self)

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=2, sort_keys=True)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]):
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})

    @classmethod
    def from_json(cls, s: str):
        return cls.from_dict(json.loads(s))


@dataclass(frozen=True)
class STFTConfig(JsonConfig):
    """Training-time mel frontend, matching reference TacotronSTFT.

    Reference: audioldm/audio/stft.py:136-186 and the preprocessing dict in
    audioldm/utils.py:110-121 (filter 1024 / hop 160 / win 1024 / 64 mel /
    16 kHz / fmin 0 / fmax 8000).
    """

    filter_length: int = 1024
    hop_length: int = 160
    win_length: int = 1024
    n_mel_channels: int = 64
    sampling_rate: int = 16000
    mel_fmin: float = 0.0
    mel_fmax: float = 8000.0
    # log-compression floor, reference audioldm/audio/audio_processing.py
    # dynamic_range_compression: log(clamp(x, min=1e-5))
    compression_clip: float = 1e-5


@dataclass(frozen=True)
class VAEConfig(JsonConfig):
    """AudioLDM AutoencoderKL config.

    Reference: the `ddconfig` in audioldm/utils.py:160-180 plus embed_dim and
    scale_factor handling in audioldm/variational_autoencoder/autoencoder.py.
    """

    in_channels: int = 1          # mel channels-as-image: [B, T, F, 1]
    out_channels: int = 1
    base_channels: int = 128      # `ch`
    ch_mult: Tuple[int, ...] = (1, 2, 4)
    num_res_blocks: int = 2
    z_channels: int = 8
    embed_dim: int = 8
    double_z: bool = True
    scale_factor: float = 1.0     # overwritten by checkpoint scale_factor
    norm_num_groups: int = 32
    norm_eps: float = 1e-6
    # route the 4096-token mid-block attention through the Pallas flash
    # kernel under bf16 on TPU backends (fp32 runs keep exact einsum math)
    use_flash_attention: bool = True


@dataclass(frozen=True)
class HiFiGANConfig(JsonConfig):
    """HiFi-GAN generator config (16 kHz / 64-mel variant).

    Reference: HIFIGAN_16K_64 in audioldm/hifigan/utilities.py:9-39.
    """

    num_mels: int = 64
    upsample_initial_channel: int = 1024
    upsample_rates: Tuple[int, ...] = (5, 4, 2, 2, 2)
    upsample_kernel_sizes: Tuple[int, ...] = (16, 16, 8, 4, 4)
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: Tuple[Tuple[int, ...], ...] = (
        (1, 3, 5),
        (1, 3, 5),
        (1, 3, 5),
    )
    sampling_rate: int = 16000
    lrelu_slope: float = 0.1
    # space-to-depth re-channeling of the small-channel resblock convs on
    # TPU backends (exact math; see nn/layers.py conv1d_rechanneled)
    rechannel_small_convs: bool = True


@dataclass(frozen=True)
class UNetConfig(JsonConfig):
    """CFG-guidance-conditioned 2-D cross-attention UNet.

    Mirrors the fields of reference configs/tango_diffusion_light.json and the
    guidance-embedding additions of
    diffusers/models/unet_2d_condition_guided.py:137-302. Fields that the
    reference hard-pins for this model family (center_input_sample=False,
    class embeddings off, positional time embedding, fourier guidance
    embedding) are kept but defaulted.
    """

    in_channels: int = 8
    out_channels: int = 8
    block_out_channels: Tuple[int, ...] = (256, 512, 1024, 1024)
    down_block_types: Tuple[str, ...] = (
        "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D",
        "DownBlock2D",
    )
    up_block_types: Tuple[str, ...] = (
        "UpBlock2D",
        "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D",
    )
    layers_per_block: int = 2
    # NOTE: this is the number of attention *heads* per level (the reference
    # keeps Diffusers' historically misnamed `attention_head_dim`; see
    # unet_2d_condition_guided.py:199-206). Head dim is channels // heads,
    # giving transformer inner dims 255/510/1020 for the light config.
    attention_head_dim: Tuple[int, ...] = (5, 10, 20, 20)
    cross_attention_dim: int = 1024
    norm_num_groups: int = 32
    norm_eps: float = 1e-5
    act_fn: str = "silu"
    flip_sin_to_cos: bool = True
    freq_shift: int = 0
    use_linear_projection: bool = True
    upcast_attention: bool = True
    # store attention logits in fp32 under bf16 compute (exact reference
    # upcast; slower). Default off: fp32 accumulation + bf16 storage.
    strict_upcast: bool = False
    # route unmasked bf16 self-attention through the Pallas flash kernel on
    # TPU backends (ops/pallas_attention.py) — no HBM logits tensor, fp32
    # online softmax. fp32 runs and cross-attention use the einsum path.
    use_flash_attention: bool = True
    downsample_padding: int = 1
    mid_block_scale_factor: float = 1.0
    # "positional" (sinusoidal) time embedding; "fourier" guidance embedding
    # (unet_2d_condition_guided.py:183, :265-287).
    time_embedding_type: str = "positional"
    guidance_embedding_type: str = "fourier"
    # if False, this is the plain (teacher) UNet with no guidance embedding
    # (diffusers/models/unet_2d_condition.py).
    guided: bool = True

    @classmethod
    def from_diffusers_json(cls, path_or_dict) -> "UNetConfig":
        """Load from a reference-format diffusers UNet config json."""
        if isinstance(path_or_dict, dict):
            d = path_or_dict
        else:
            with open(path_or_dict) as f:
                d = json.load(f)
        return cls(
            in_channels=d["in_channels"],
            out_channels=d["out_channels"],
            block_out_channels=tuple(d["block_out_channels"]),
            down_block_types=tuple(d["down_block_types"]),
            up_block_types=tuple(d["up_block_types"]),
            layers_per_block=d.get("layers_per_block", 2),
            attention_head_dim=tuple(d["attention_head_dim"])
            if isinstance(d["attention_head_dim"], (list, tuple))
            else (d["attention_head_dim"],) * len(d["block_out_channels"]),
            cross_attention_dim=d.get("cross_attention_dim", 1024),
            norm_num_groups=d.get("norm_num_groups", 32),
            norm_eps=d.get("norm_eps", 1e-5),
            act_fn=d.get("act_fn", "silu"),
            flip_sin_to_cos=d.get("flip_sin_to_cos", True),
            freq_shift=d.get("freq_shift", 0),
            use_linear_projection=d.get("use_linear_projection", False),
            upcast_attention=d.get("upcast_attention", False),
            downsample_padding=d.get("downsample_padding", 1),
            mid_block_scale_factor=d.get("mid_block_scale_factor", 1.0),
        )

    @property
    def num_levels(self) -> int:
        return len(self.block_out_channels)


# The two shipped UNet configs (reference configs/tango_diffusion_light.json
# and configs/tango_diffusion.json).
TANGO_LIGHT_UNET = UNetConfig()
TANGO_FULL_UNET = UNetConfig(
    block_out_channels=(320, 640, 1280, 1280),
)


@dataclass(frozen=True)
class T5Config(JsonConfig):
    """T5 encoder config; defaults match google/flan-t5-large."""

    vocab_size: int = 32128
    d_model: int = 1024
    d_kv: int = 64
    d_ff: int = 2816
    num_layers: int = 24
    num_heads: int = 16
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6
    feed_forward_proj: str = "gated-gelu"
    max_length: int = 512


@dataclass(frozen=True)
class SchedulerConfig(JsonConfig):
    """Noise schedule config.

    Defaults match the stabilityai/stable-diffusion-2-1 scheduler the
    reference pulls from the hub (scaled_linear beta 0.00085->0.012,
    1000 steps, v_prediction); see SURVEY.md section 5 (config tiers).
    """

    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"
    prediction_type: str = "v_prediction"


@dataclass(frozen=True)
class LatentShape(JsonConfig):
    """Fixed latent geometry: 10.24 s / 16 kHz / hop 160 -> 1024 mel frames
    -> 4x VAE downsample -> latent (256, 16, 8) [T, F, C] in NHWC.

    Reference: models/audio_consistency_model.py:477 (shape [B, 8, 256, 16]
    NCHW), tools/t2a_dataset.py:41-43.
    """

    t: int = 256
    f: int = 16
    c: int = 8

    @property
    def nhwc(self) -> Tuple[int, int, int]:
        return (self.t, self.f, self.c)


@dataclass(frozen=True)
class PipelineConfig(JsonConfig):
    """Bundle for the end-to-end generation pipeline."""

    unet: UNetConfig = field(default_factory=lambda: TANGO_LIGHT_UNET)
    vae: VAEConfig = field(default_factory=VAEConfig)
    vocoder: HiFiGANConfig = field(default_factory=HiFiGANConfig)
    stft: STFTConfig = field(default_factory=STFTConfig)
    t5: T5Config = field(default_factory=T5Config)
    scheduler: SchedulerConfig = field(default_factory=SchedulerConfig)
    latent: LatentShape = field(default_factory=LatentShape)
    # 10-s clips at 16 kHz; generation truncated to 9.5/10 s downstream
    # (reference easy_inference/consistencytta.py:200, inference.py:208).
    sample_rate: int = 16000
    segment_samples: int = 1024 * 160
    target_mel_frames: int = 1024

    @classmethod
    def tiny(cls) -> "PipelineConfig":
        """Shrunken pipeline with production topology (4-level UNet, 4x VAE,
        160x vocoder, T5): 0.64-s clips, 64 mel frames, latent 16x16x8.
        Used by tests and the multichip dry-run."""
        return cls(
            unet=UNetConfig(
                block_out_channels=(16, 16, 32, 32),
                attention_head_dim=(2, 2, 4, 4),
                cross_attention_dim=32,
                norm_num_groups=8,
            ),
            vae=VAEConfig(base_channels=16, norm_num_groups=8, scale_factor=0.9),
            vocoder=HiFiGANConfig(upsample_initial_channel=64),
            t5=T5Config(
                vocab_size=256, d_model=32, d_kv=16, d_ff=64,
                num_layers=2, num_heads=2,
            ),
            latent=LatentShape(t=16, f=16, c=8),
            segment_samples=64 * 160,
            target_mel_frames=64,
        )

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "PipelineConfig":
        def sub(klass, key):
            v = d.get(key)
            if v is None:
                return klass()
            return klass.from_dict(v) if isinstance(v, dict) else v

        return cls(
            unet=sub(UNetConfig, "unet"),
            vae=sub(VAEConfig, "vae"),
            vocoder=sub(HiFiGANConfig, "vocoder"),
            stft=sub(STFTConfig, "stft"),
            t5=sub(T5Config, "t5"),
            scheduler=sub(SchedulerConfig, "scheduler"),
            latent=sub(LatentShape, "latent"),
            sample_rate=d.get("sample_rate", 16000),
            segment_samples=d.get("segment_samples", 1024 * 160),
            target_mel_frames=d.get("target_mel_frames", 1024),
        )
