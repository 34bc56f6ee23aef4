"""LAION-CLAP (HTSAT-base + RoBERTa) in JAX — CLAP scores and stage-3 loss.

Parity targets in the reference tree:
  * laion_clap/clap_module/htsat.py — HTSAT Swin audio encoder ("base":
    spec_size 256, patch 4/stride 4, embed 128, depths (2,2,12,2), heads
    (4,8,16,32), window 8) with the mel->image reshape (:858-884) and the
    1024-d "embedding" head (:796-825),
  * laion_clap/clap_module/model.py — the CLAP dual tower: audio/text
    projection MLPs to the 512-d joint space, RoBERTa pooler text branch
    (:627-634), L2-normalized embeddings (:696-740),
  * laion_clap/training/data.py get_mel (:363-399) — 48 kHz torchlibrosa
    log-mel (n_fft 1024, hop 480, 64 mel, 50-14000 Hz).

The audio path is fully differentiable, as required by the stage-3 CLAP
fine-tune (tools/losses.py:259-316).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from consistencytta_tpu.evaluation.panns import BatchNormInference
from consistencytta_tpu.nn.layers import LayerNorm
from consistencytta_tpu.ops.mel import mel_filterbank, real_dft_basis
from consistencytta_tpu.ops.stft import stft_power


# ---------------------------------------------------------------------------
# Configs
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class HTSATConfig:
    spec_size: int = 256
    patch_size: int = 4
    patch_stride: int = 4
    embed_dim: int = 128  # "base"
    depths: Tuple[int, ...] = (2, 2, 12, 2)
    num_heads: Tuple[int, ...] = (4, 8, 16, 32)
    window_size: int = 8
    mlp_ratio: float = 4.0
    mel_bins: int = 64
    sample_rate: int = 48000
    window_size_stft: int = 1024
    hop_size: int = 480
    fmin: float = 50.0
    fmax: float = 14000.0
    clip_samples: int = 480000
    joint_embed: int = 512

    @property
    def freq_ratio(self) -> int:
        return self.spec_size // self.mel_bins

    @property
    def num_features(self) -> int:
        return int(self.embed_dim * 2 ** (len(self.depths) - 1))


@dataclass(frozen=True)
class RobertaConfig:
    vocab_size: int = 50265
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 514
    type_vocab_size: int = 1
    layer_norm_eps: float = 1e-5
    pad_token_id: int = 1
    joint_embed: int = 512


JOINT_EMBED = 512


# ---------------------------------------------------------------------------
# Mel frontend + image reshape
# ---------------------------------------------------------------------------


def _cubic_kernel(t: np.ndarray, a: float = -0.75) -> np.ndarray:
    at = np.abs(t)
    return np.where(
        at <= 1,
        (a + 2) * at**3 - (a + 3) * at**2 + 1,
        np.where(at < 2, a * at**3 - 5 * a * at**2 + 8 * a * at - 4 * a, 0.0),
    )


def bicubic_resize_matrix(n_in: int, n_out: int) -> np.ndarray:
    """[n_out, n_in] interpolation matrix for torch bicubic with
    align_corners=True (a = -0.75), applied as out = M @ in along one axis.
    """
    if n_in == n_out:
        return np.eye(n_in, dtype=np.float32)
    scale = (n_in - 1) / (n_out - 1)
    m = np.zeros((n_out, n_in), dtype=np.float64)
    for i in range(n_out):
        x = i * scale
        x0 = int(np.floor(x))
        for k in range(-1, 3):
            idx = np.clip(x0 + k, 0, n_in - 1)
            m[i, idx] += _cubic_kernel(np.array(x - (x0 + k)))
    return m.astype(np.float32)


class CLAPMelFrontend:
    """48 kHz waveform [B, 480000] -> HTSAT input image [B, 256, 256, 1].

    torchlibrosa power log-mel (get_mel, data.py:363-399) + bn0 happens in
    the model; this produces the raw log-mel [B, 1001, 64]."""

    def __init__(self, config: HTSATConfig = HTSATConfig()):
        self.config = config
        cos_b, sin_b = real_dft_basis(
            config.window_size_stft, config.window_size_stft, "hann"
        )
        self.cos = jnp.asarray(cos_b)
        self.sin = jnp.asarray(sin_b)
        self.mel_t = jnp.asarray(
            mel_filterbank(
                config.sample_rate,
                config.window_size_stft,
                config.mel_bins,
                config.fmin,
                config.fmax,
            ).T
        )

    def __call__(self, wav: jax.Array) -> jax.Array:
        power = stft_power(
            wav, self.cos, self.sin, self.config.hop_size,
            self.config.window_size_stft // 2,
        )
        mel = jnp.einsum(
            "bfn,nm->bfm", power, self.mel_t,
            precision=jax.lax.Precision.HIGHEST,
        )
        return 10.0 * jnp.log10(jnp.clip(mel, 1e-10, None))


def reshape_mel_to_image(mel: jax.Array, config: HTSATConfig) -> jax.Array:
    """[B, T, F] log-mel -> [B, 256, 256, 1] Swin input, reproducing
    reshape_wav2img (htsat.py:858-884): bicubic time-interp (align_corners)
    to 1024 frames, then 4-way time chunking stacked along frequency:
    img[chunk * F + f, tau] = mel[chunk * 256 + tau, f]."""
    b, t, f = mel.shape
    ratio = config.freq_ratio
    target_t = config.spec_size * ratio

    if t != target_t:
        m = jnp.asarray(bicubic_resize_matrix(t, target_t))
        mel = jnp.einsum("ot,btf->bof", m, mel)

    # [B, 4, 256, F] -> [B, 4, F, 256] -> [B, 4*F, 256]
    chunks = mel.reshape(b, ratio, config.spec_size, f)
    img = jnp.swapaxes(chunks, 2, 3).reshape(b, ratio * f, config.spec_size)
    return img[..., None]


# ---------------------------------------------------------------------------
# Swin transformer pieces
# ---------------------------------------------------------------------------


def window_partition(x: jax.Array, w: int) -> jax.Array:
    """[B, H, W, C] -> [B * nH * nW, w*w, C]."""
    b, h, wd, c = x.shape
    x = x.reshape(b, h // w, w, wd // w, w, c)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(-1, w * w, c)


def window_unpartition(windows: jax.Array, w: int, h: int, wd: int) -> jax.Array:
    b = windows.shape[0] // ((h // w) * (wd // w))
    x = windows.reshape(b, h // w, wd // w, w, w, -1)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(b, h, wd, -1)


def relative_position_index(w: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(w), np.arange(w), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += w - 1
    rel[:, :, 1] += w - 1
    rel[:, :, 0] *= 2 * w - 1
    return rel.sum(-1)  # [w*w, w*w]


def swin_attn_mask(h: int, w: int, window: int, shift: int) -> np.ndarray:
    """[nW, w*w, w*w] additive mask (0 / -100) for shifted windows."""
    img = np.zeros((h, w))
    cnt = 0
    for hs in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
        for ws in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
            img[hs, ws] = cnt
            cnt += 1
    wins = img.reshape(h // window, window, w // window, window)
    wins = wins.transpose(0, 2, 1, 3).reshape(-1, window * window)
    mask = wins[:, None, :] - wins[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    dim: int
    window: int
    heads: int

    @nn.compact
    def __call__(self, x, mask: Optional[np.ndarray]):
        b_, n, c = x.shape
        head_dim = self.dim // self.heads
        qkv = nn.Dense(self.dim * 3, name="qkv")(x)
        qkv = qkv.reshape(b_, n, 3, self.heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]

        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", q * (head_dim**-0.5), k
        ).astype(jnp.float32)

        table = self.param(
            "relative_position_bias_table",
            nn.initializers.normal(0.02),
            ((2 * self.window - 1) ** 2, self.heads),
            jnp.float32,
        )
        idx = relative_position_index(self.window).reshape(-1)
        bias = table[idx].reshape(n, n, self.heads)
        logits = logits + jnp.transpose(bias, (2, 0, 1))[None]

        if mask is not None:
            nw = mask.shape[0]
            logits = logits.reshape(b_ // nw, nw, self.heads, n, n)
            logits = logits + jnp.asarray(mask)[None, :, None, :, :]
            logits = logits.reshape(b_, self.heads, n, n)

        probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b_, n, c)
        return nn.Dense(self.dim, name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    resolution: Tuple[int, int]
    heads: int
    window: int
    shift: int
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x):
        h, w = self.resolution
        b, l, c = x.shape
        window, shift = self.window, self.shift
        if min(h, w) <= window:
            window, shift = min(h, w), 0

        shortcut = x
        x = LayerNorm(name="norm1")(x).reshape(b, h, w, c)
        if shift > 0:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
        wins = window_partition(x, window)
        mask = swin_attn_mask(h, w, window, shift) if shift > 0 else None
        wins = WindowAttention(self.dim, window, self.heads, name="attn")(wins, mask)
        x = window_unpartition(wins, window, h, w)
        if shift > 0:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        x = shortcut + x.reshape(b, l, c)

        y = LayerNorm(name="norm2")(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), name="mlp_fc1")(y)
        y = jax.nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, name="mlp_fc2")(y)
        return x + y


class PatchMerging(nn.Module):
    dim: int
    resolution: Tuple[int, int]

    @nn.compact
    def __call__(self, x):
        h, w = self.resolution
        b, l, c = x.shape
        x = x.reshape(b, h, w, c)
        x = jnp.concatenate(
            [x[:, 0::2, 0::2], x[:, 1::2, 0::2], x[:, 0::2, 1::2], x[:, 1::2, 1::2]],
            axis=-1,
        ).reshape(b, -1, 4 * c)
        x = LayerNorm(name="norm")(x)
        return nn.Dense(2 * self.dim, use_bias=False, name="reduction")(x)


class HTSATEncoder(nn.Module):
    """log-mel image [B, 256, 256, 1] (already bn0-normalized) ->
    1024-d clip embedding."""

    config: HTSATConfig = HTSATConfig()

    @nn.compact
    def __call__(self, img: jax.Array) -> jax.Array:
        cfg = self.config
        # patch embed: conv 4x4 stride 4 + LN
        x = nn.Conv(
            cfg.embed_dim, (cfg.patch_size, cfg.patch_size),
            strides=cfg.patch_stride, padding=0, name="patch_proj",
        )(img)
        b, gh, gw, c = x.shape
        x = x.reshape(b, gh * gw, c)
        x = LayerNorm(name="patch_norm")(x)

        res = (gh, gw)
        dim = cfg.embed_dim
        for i_layer, depth in enumerate(cfg.depths):
            for i_block in range(depth):
                x = SwinBlock(
                    dim, res, cfg.num_heads[i_layer], cfg.window_size,
                    shift=0 if i_block % 2 == 0 else cfg.window_size // 2,
                    mlp_ratio=cfg.mlp_ratio,
                    name=f"layer_{i_layer}_block_{i_block}",
                )(x)
            if i_layer < len(cfg.depths) - 1:
                x = PatchMerging(dim, res, name=f"layer_{i_layer}_downsample")(x)
                res = (res[0] // 2, res[1] // 2)
                dim *= 2

        x = LayerNorm(name="norm")(x)
        # "embedding": global average over all tokens (htsat.py:823-825)
        return x.mean(axis=1)


class CLAPAudioTower(nn.Module):
    """log-mel [B, T, F] -> L2-normalized 512-d audio embedding."""

    config: HTSATConfig = HTSATConfig()

    @nn.compact
    def __call__(self, logmel: jax.Array) -> jax.Array:
        x = BatchNormInference(self.config.mel_bins, name="bn0")(logmel)
        img = reshape_mel_to_image(x, self.config)
        emb = HTSATEncoder(self.config, name="htsat")(img)
        h = nn.Dense(self.config.joint_embed, name="proj_fc1")(emb)
        h = jax.nn.relu(h)
        h = nn.Dense(self.config.joint_embed, name="proj_fc2")(h)
        return h / jnp.linalg.norm(h, axis=-1, keepdims=True)


# ---------------------------------------------------------------------------
# RoBERTa text tower
# ---------------------------------------------------------------------------


class RobertaLayer(nn.Module):
    config: RobertaConfig

    @nn.compact
    def __call__(self, x, mask_bias):
        cfg = self.config
        head_dim = cfg.hidden_size // cfg.num_heads
        b, l, _ = x.shape

        q = nn.Dense(cfg.hidden_size, name="q")(x)
        k = nn.Dense(cfg.hidden_size, name="k")(x)
        v = nn.Dense(cfg.hidden_size, name="v")(x)
        q = q.reshape(b, l, cfg.num_heads, head_dim)
        k = k.reshape(b, l, cfg.num_heads, head_dim)
        v = v.reshape(b, l, cfg.num_heads, head_dim)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (head_dim**-0.5)
        logits = logits + mask_bias
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
        attn = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, l, -1)
        attn = nn.Dense(cfg.hidden_size, name="attn_out")(attn)
        x = LayerNorm(cfg.layer_norm_eps, name="attn_norm")(x + attn)

        h = nn.Dense(cfg.intermediate_size, name="ffn_in")(x)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(cfg.hidden_size, name="ffn_out")(h)
        return LayerNorm(cfg.layer_norm_eps, name="ffn_norm")(x + h)


class RobertaEncoder(nn.Module):
    """input_ids/mask [B, L] -> pooler output [B, hidden]."""

    config: RobertaConfig = RobertaConfig()

    @nn.compact
    def __call__(self, input_ids: jax.Array, attention_mask: jax.Array):
        cfg = self.config
        word = self.param(
            "word_embeddings", nn.initializers.normal(0.02),
            (cfg.vocab_size, cfg.hidden_size), jnp.float32,
        )
        pos = self.param(
            "position_embeddings", nn.initializers.normal(0.02),
            (cfg.max_position_embeddings, cfg.hidden_size), jnp.float32,
        )
        tok_type = self.param(
            "token_type_embeddings", nn.initializers.normal(0.02),
            (cfg.type_vocab_size, cfg.hidden_size), jnp.float32,
        )
        # RoBERTa position ids: pad offset (HF
        # create_position_ids_from_input_ids): cumsum(mask)*mask + pad_id
        mask = attention_mask.astype(jnp.int32)
        position_ids = jnp.cumsum(mask, axis=1) * mask + cfg.pad_token_id

        x = word[input_ids] + pos[position_ids] + tok_type[0][None, None, :]
        x = LayerNorm(cfg.layer_norm_eps, name="embed_norm")(x)

        mask_bias = jnp.where(mask[:, None, None, :] > 0, 0.0, -1e9)
        for i in range(cfg.num_layers):
            x = RobertaLayer(cfg, name=f"layer_{i}")(x, mask_bias)

        cls = x[:, 0]
        pooled = jnp.tanh(nn.Dense(cfg.hidden_size, name="pooler")(cls))
        return pooled


class CLAPTextTower(nn.Module):
    config: RobertaConfig = RobertaConfig()

    @nn.compact
    def __call__(self, input_ids, attention_mask):
        pooled = RobertaEncoder(self.config, name="roberta")(
            input_ids, attention_mask
        )
        h = nn.Dense(self.config.joint_embed, name="proj_fc1")(pooled)
        h = jax.nn.relu(h)
        h = nn.Dense(self.config.joint_embed, name="proj_fc2")(h)
        return h / jnp.linalg.norm(h, axis=-1, keepdims=True)


# ---------------------------------------------------------------------------
# Checkpoint conversion
# ---------------------------------------------------------------------------


def convert_clap_audio(sd, config: HTSATConfig = HTSATConfig()) -> dict:
    """laion_clap checkpoint (audio_branch.* + audio_projection.*) ->
    CLAPAudioTower params. Keys may carry a leading `module.`."""
    from consistencytta_tpu.io.torch_import import conv2d_kernel, linear_kernel

    def g(key):
        for k in (key, "module." + key):
            if k in sd:
                return sd[k]
        raise KeyError(key)

    def lin(key, bias=True):
        p = {"kernel": linear_kernel(g(key + ".weight"))}
        if bias:
            p["bias"] = g(key + ".bias")
        return p

    def ln(key):
        return {"scale": g(key + ".weight"), "bias": g(key + ".bias")}

    ab = "audio_branch."
    p: dict = {
        "bn0": {
            "scale": g(ab + "bn0.weight"),
            "bias": g(ab + "bn0.bias"),
            "mean": g(ab + "bn0.running_mean"),
            "var": g(ab + "bn0.running_var"),
        },
        "proj_fc1": lin("audio_projection.0"),
        "proj_fc2": lin("audio_projection.2"),
    }

    ht: dict = {
        "patch_proj": {
            "kernel": conv2d_kernel(g(ab + "patch_embed.proj.weight")),
            "bias": g(ab + "patch_embed.proj.bias"),
        },
        "patch_norm": ln(ab + "patch_embed.norm"),
        "norm": ln(ab + "norm"),
    }
    for i_layer, depth in enumerate(config.depths):
        base = f"{ab}layers.{i_layer}."
        for j in range(depth):
            blk = f"{base}blocks.{j}."
            ht[f"layer_{i_layer}_block_{j}"] = {
                "norm1": ln(blk + "norm1"),
                "attn": {
                    "qkv": lin(blk + "attn.qkv"),
                    "proj": lin(blk + "attn.proj"),
                    "relative_position_bias_table": g(
                        blk + "attn.relative_position_bias_table"
                    ),
                },
                "norm2": ln(blk + "norm2"),
                "mlp_fc1": lin(blk + "mlp.fc1"),
                "mlp_fc2": lin(blk + "mlp.fc2"),
            }
        if i_layer < len(config.depths) - 1:
            ht[f"layer_{i_layer}_downsample"] = {
                "norm": ln(base + "downsample.norm"),
                "reduction": lin(base + "downsample.reduction", bias=False),
            }
    p["htsat"] = ht
    return p


def infer_clap_configs(
    sd,
    base_audio: HTSATConfig = HTSATConfig(),
    base_text: RobertaConfig = RobertaConfig(),
) -> Tuple[HTSATConfig, RobertaConfig]:
    """Derive the structural CLAP dimensions (Swin depths/widths/heads,
    RoBERTa width/depth) from a checkpoint's tensor shapes, keeping the
    signal-frontend fields (mel bins, spec size, sample rate) from the base
    configs. Lets the stage-3 CLI consume any HTSAT+RoBERTa checkpoint in
    the laion_clap key format (hook.py:20-72) — including the tiny
    random-weight one the offline chain test generates — without a
    hand-written config json."""
    import dataclasses

    def g(key):
        for k in (key, "module." + key):
            if k in sd:
                return sd[k]
        raise KeyError(key)

    def has(key):
        return key in sd or ("module." + key) in sd

    ab = "audio_branch."
    embed_dim = g(ab + "patch_embed.proj.weight").shape[0]
    depths, heads = [], []
    i = 0
    while has(f"{ab}layers.{i}.blocks.0.norm1.weight"):
        j = 0
        while has(f"{ab}layers.{i}.blocks.{j}.norm1.weight"):
            j += 1
        depths.append(j)
        table = g(f"{ab}layers.{i}.blocks.0.attn.relative_position_bias_table")
        heads.append(int(table.shape[1]))
        i += 1
    table0 = g(f"{ab}layers.0.blocks.0.attn.relative_position_bias_table")
    window = (int(round(np.sqrt(table0.shape[0]))) + 1) // 2
    mlp_ratio = g(f"{ab}layers.0.blocks.0.mlp.fc1.weight").shape[0] / embed_dim

    joint = int(g("audio_projection.2.weight").shape[0])
    audio = dataclasses.replace(
        base_audio,
        embed_dim=int(embed_dim),
        depths=tuple(depths),
        num_heads=tuple(heads),
        window_size=int(window),
        mlp_ratio=float(mlp_ratio),
        joint_embed=joint,
    )

    tb = "text_branch."
    word = g(tb + "embeddings.word_embeddings.weight")
    vocab, hidden = int(word.shape[0]), int(word.shape[1])
    n_layers = 0
    while has(f"{tb}encoder.layer.{n_layers}.attention.self.query.weight"):
        n_layers += 1
    inter = int(g(f"{tb}encoder.layer.0.intermediate.dense.weight").shape[0])
    max_pos = int(g(tb + "embeddings.position_embeddings.weight").shape[0])
    # Head count is NOT derivable from tensor shapes. The BERT/RoBERTa
    # family fixes head_dim at 64 (roberta-base 768/12, roberta-large
    # 1024/16), so hidden // 64 recovers the real count for any production
    # text branch; tiny test checkpoints (hidden < 64) keep the base
    # config's count, shrunk only as needed to divide hidden.
    if hidden % 64 == 0:
        n_heads = hidden // 64
    else:
        n_heads = base_text.num_heads
        if hidden % n_heads != 0:
            n_heads = max(d for d in range(1, n_heads + 1) if hidden % d == 0)

    text = dataclasses.replace(
        base_text,
        vocab_size=vocab,
        hidden_size=hidden,
        num_layers=n_layers,
        num_heads=n_heads,
        intermediate_size=inter,
        max_position_embeddings=max_pos,
        joint_embed=int(g("text_projection.2.weight").shape[0]),
    )
    return audio, text


def convert_clap_text(sd, config: RobertaConfig = RobertaConfig()) -> dict:
    """laion_clap checkpoint (text_branch.* RoBERTa + text_projection.*) ->
    CLAPTextTower params."""
    from consistencytta_tpu.io.torch_import import linear_kernel

    def g(key):
        for k in (key, "module." + key):
            if k in sd:
                return sd[k]
        raise KeyError(key)

    def lin(key):
        return {"kernel": linear_kernel(g(key + ".weight")), "bias": g(key + ".bias")}

    def ln(key):
        return {"scale": g(key + ".weight"), "bias": g(key + ".bias")}

    tb = "text_branch."
    rob: dict = {
        "word_embeddings": g(tb + "embeddings.word_embeddings.weight"),
        "position_embeddings": g(tb + "embeddings.position_embeddings.weight"),
        "token_type_embeddings": g(tb + "embeddings.token_type_embeddings.weight"),
        "embed_norm": ln(tb + "embeddings.LayerNorm"),
        "pooler": lin(tb + "pooler.dense"),
    }
    for i in range(config.num_layers):
        lb = f"{tb}encoder.layer.{i}."
        rob[f"layer_{i}"] = {
            "q": lin(lb + "attention.self.query"),
            "k": lin(lb + "attention.self.key"),
            "v": lin(lb + "attention.self.value"),
            "attn_out": lin(lb + "attention.output.dense"),
            "attn_norm": ln(lb + "attention.output.LayerNorm"),
            "ffn_in": lin(lb + "intermediate.dense"),
            "ffn_out": lin(lb + "output.dense"),
            "ffn_norm": ln(lb + "output.LayerNorm"),
        }
    return {
        "roberta": rob,
        "proj_fc1": lin("text_projection.0"),
        "proj_fc2": lin("text_projection.2"),
    }


# ---------------------------------------------------------------------------
# Host-facing wrapper
# ---------------------------------------------------------------------------


@dataclass
class CLAPWrapper:
    """Loads the music_audioset checkpoint and exposes batched embedding
    extraction (the CLAP_Module equivalent, laion_clap/hook.py:20-219)."""

    audio_fn: object
    text_fn: object
    tokenizer: object
    frontend: CLAPMelFrontend

    @classmethod
    def from_checkpoint(
        cls, path: str, tokenizer_path: str = "roberta-base"
    ) -> Optional["CLAPWrapper"]:
        from consistencytta_tpu.io.torch_import import load_torch_state_dict

        try:
            from transformers import AutoTokenizer

            tokenizer = AutoTokenizer.from_pretrained(tokenizer_path)
        except Exception:
            return None  # RoBERTa tokenizer assets unavailable (zero egress)

        sd = load_torch_state_dict(path)
        # structural dims from the checkpoint's own tensor shapes, so any
        # laion_clap-format checkpoint (incl. tiny test ones) loads; then
        # verify the converted trees against the towers before jitting —
        # a wrong-shape tensor must name its parameter, not die in XLA
        acfg, tcfg = infer_clap_configs(sd)
        audio_params = convert_clap_audio(sd, acfg)
        text_params = convert_clap_text(sd, tcfg)

        audio_tower = CLAPAudioTower(acfg)
        text_tower = CLAPTextTower(tcfg)
        frontend = CLAPMelFrontend(acfg)

        from consistencytta_tpu.io.torch_import import assert_params_match

        expected_audio = jax.eval_shape(
            lambda: audio_tower.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, 1001, acfg.mel_bins), jnp.float32),
            )
        )["params"]
        assert_params_match(audio_params, expected_audio, f"{path} (audio tower)")
        expected_text = jax.eval_shape(
            lambda: text_tower.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, 8), jnp.int32),
                jnp.ones((1, 8), jnp.int32),
            )
        )["params"]
        assert_params_match(text_params, expected_text, f"{path} (text tower)")

        audio_fn = jax.jit(
            lambda w: audio_tower.apply({"params": audio_params}, frontend(w))
        )
        text_fn = jax.jit(
            lambda ids, m: text_tower.apply({"params": text_params}, ids, m)
        )
        return cls(audio_fn, text_fn, tokenizer, frontend)

    def audio_embeddings(self, paths: List[str], batch: int = 16) -> np.ndarray:
        """Batch-16 embedding matching the reference CLAP protocol
        (audioldm_eval/eval.py:217-219 DataLoader(batch_size=16) +
        eval.py:38-46 seed_all(0) before every get_audio_embedding_from_data
        call): each batch re-seeds the crop RNG, and clips longer than 10 s
        get the reference's seeded rand_trunc crop (one np.random.randint
        draw per long clip, in batch order —
        laion_clap/training/data.py:465-467)."""
        from consistencytta_tpu.evaluation.harness import load_wav_16k

        outs = []
        for start in range(0, len(paths), batch):
            # the reference's seed_all(0) -> np.random chain, reproduced
            # with an isolated RandomState (same MT19937 stream)
            rand_state = np.random.RandomState(0)
            wavs = []
            for p in paths[start : start + batch]:
                w = load_wav_16k(p, 1000)
                w = resample_to_48k(w)
                # the eval loader peak-normalizes (tools/torch_tools.py:
                # 54-75 read_wav_file: /max/2 -> pad/crop -> /max/2 again;
                # the double application lands the crop at peak 0.5)
                w = w / (np.abs(w).max() + 1e-8) / 2.0
                w = fit_length(w, 480000, rand_state)
                w = w / (np.abs(w).max() + 1e-8) / 2.0
                wavs.append(w)
            outs.append(np.asarray(self.audio_fn(np.stack(wavs))))
        return np.concatenate(outs, axis=0)

    def audio_embeddings_from_waves(self, waves_48k: np.ndarray) -> np.ndarray:
        return np.asarray(self.audio_fn(waves_48k))

    def text_embeddings(self, captions: List[str], batch: int = 32) -> np.ndarray:
        outs = []
        for start in range(0, len(captions), batch):
            enc = self.tokenizer(
                captions[start : start + batch],
                padding="max_length",
                truncation=True,
                max_length=77,
                return_tensors="np",
            )
            outs.append(
                np.asarray(
                    self.text_fn(
                        enc["input_ids"].astype(np.int32),
                        enc["attention_mask"].astype(np.int32),
                    )
                )
            )
        return np.concatenate(outs, axis=0)


def resample_to_48k(wav_16k: np.ndarray) -> np.ndarray:
    from consistencytta_tpu.ops.resample import resample_numpy

    return resample_numpy(wav_16k.astype(np.float32), 16000, 48000)


def fit_length(
    wav: np.ndarray, n: int, rand_state: "np.random.RandomState | None" = None
) -> np.ndarray:
    """Fit to n samples with the reference get_audio_features semantics
    (laion_clap/training/data.py:402-495, data_truncating='rand_trunc',
    data_filling='repeatpad'):

      * longer than n  -> random crop, start = rand_state.randint(0,
        overflow + 1) — the np.random draw the reference makes after
        seed_all(0) (:465-467). rand_state=None keeps the deterministic
        head crop (start 0) for callers outside the eval protocol.
      * shorter than n -> repeat floor(n/len) times, then ZERO-pad to n
        (:472-483 'repeatpad': repeat then F.pad with zeros — not a
        cyclic tile).
      * exactly n      -> unchanged.
    """
    if len(wav) > n:
        start = int(rand_state.randint(0, len(wav) - n + 1)) if rand_state is not None else 0
        return wav[start : start + n]
    if len(wav) == n:
        return wav
    reps = n // len(wav)
    out = np.zeros((n,), wav.dtype)
    out[: reps * len(wav)] = np.tile(wav, reps)
    return out
