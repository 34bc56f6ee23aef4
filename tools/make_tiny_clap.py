"""Generate a tiny random-weight CLAP checkpoint in the REAL laion_clap key
format (HTSAT audio branch + RoBERTa text branch + projections — the keys
`CLAP_Module.load_ckpt` consumes, reference laion_clap/hook.py:20-72 and
clap_module/model.py:420-737).

Purpose: exercise the full stage-3 CLAP CLI path (checkpoint load ->
convert_clap_audio/convert_clap_text -> towers in frozen -> CLAP loss)
offline, where the 2 GB music_audioset checkpoint cannot be fetched. The
key names and tensor layouts are exactly the production ones; only the
dimensions are tiny (infer_clap_configs derives the structural config from
the shapes).

Usage: python tools/make_tiny_clap.py <out.pt>
"""

from __future__ import annotations

import sys

import numpy as np


def make_clap_state_dict(
    seed: int = 0,
    embed: int = 8,
    depths=(1, 1, 1, 1),
    heads=(1, 1, 2, 2),
    window: int = 8,
    mlp_ratio: float = 1.0,
    mel_bins: int = 64,
    hidden: int = 24,
    num_layers: int = 2,
    inter: int = 48,
    vocab: int = 120,
    max_pos: int = 96,
    joint: int = 16,
) -> dict:
    """Random-weight laion_clap-format state dict at the given structural
    dims. Defaults are the tiny test model; pass the HTSAT-base / RoBERTa
    production dims (embed 128, depths (2,2,12,2), heads (4,8,16,32),
    mlp 4, hidden 768, 12 layers, inter 3072, vocab 50265, max_pos 514,
    joint 512) for a full-scale synthetic checkpoint."""
    rs = np.random.RandomState(seed)

    def t(*shape):
        return (rs.standard_normal(shape) * 0.05).astype(np.float32)

    def ones(*shape):
        return np.ones(shape, np.float32)

    def zeros(*shape):
        return np.zeros(shape, np.float32)

    sd: dict = {}
    ab = "audio_branch."
    sd[ab + "bn0.weight"] = ones(mel_bins)
    sd[ab + "bn0.bias"] = zeros(mel_bins)
    sd[ab + "bn0.running_mean"] = zeros(mel_bins)
    sd[ab + "bn0.running_var"] = ones(mel_bins)
    sd[ab + "patch_embed.proj.weight"] = t(embed, 1, 4, 4)
    sd[ab + "patch_embed.proj.bias"] = zeros(embed)
    sd[ab + "patch_embed.norm.weight"] = ones(embed)
    sd[ab + "patch_embed.norm.bias"] = zeros(embed)

    dim = embed
    for i, depth in enumerate(depths):
        for j in range(depth):
            blk = f"{ab}layers.{i}.blocks.{j}."
            sd[blk + "norm1.weight"] = ones(dim)
            sd[blk + "norm1.bias"] = zeros(dim)
            sd[blk + "attn.qkv.weight"] = t(3 * dim, dim)
            sd[blk + "attn.qkv.bias"] = zeros(3 * dim)
            sd[blk + "attn.proj.weight"] = t(dim, dim)
            sd[blk + "attn.proj.bias"] = zeros(dim)
            sd[blk + "attn.relative_position_bias_table"] = t(
                (2 * window - 1) ** 2, heads[i]
            )
            sd[blk + "norm2.weight"] = ones(dim)
            sd[blk + "norm2.bias"] = zeros(dim)
            sd[blk + "mlp.fc1.weight"] = t(int(dim * mlp_ratio), dim)
            sd[blk + "mlp.fc1.bias"] = zeros(int(dim * mlp_ratio))
            sd[blk + "mlp.fc2.weight"] = t(dim, int(dim * mlp_ratio))
            sd[blk + "mlp.fc2.bias"] = zeros(dim)
        if i < len(depths) - 1:
            base = f"{ab}layers.{i}.downsample."
            sd[base + "norm.weight"] = ones(4 * dim)
            sd[base + "norm.bias"] = zeros(4 * dim)
            sd[base + "reduction.weight"] = t(2 * dim, 4 * dim)
            dim *= 2
    sd[ab + "norm.weight"] = ones(dim)
    sd[ab + "norm.bias"] = zeros(dim)
    sd["audio_projection.0.weight"] = t(joint, dim)
    sd["audio_projection.0.bias"] = zeros(joint)
    sd["audio_projection.2.weight"] = t(joint, joint)
    sd["audio_projection.2.bias"] = zeros(joint)

    tb = "text_branch."
    sd[tb + "embeddings.word_embeddings.weight"] = t(vocab, hidden)
    sd[tb + "embeddings.position_embeddings.weight"] = t(max_pos, hidden)
    sd[tb + "embeddings.token_type_embeddings.weight"] = t(1, hidden)
    sd[tb + "embeddings.LayerNorm.weight"] = ones(hidden)
    sd[tb + "embeddings.LayerNorm.bias"] = zeros(hidden)
    for i in range(num_layers):
        lb = f"{tb}encoder.layer.{i}."
        for name in ("attention.self.query", "attention.self.key",
                     "attention.self.value", "attention.output.dense"):
            sd[lb + name + ".weight"] = t(hidden, hidden)
            sd[lb + name + ".bias"] = zeros(hidden)
        sd[lb + "attention.output.LayerNorm.weight"] = ones(hidden)
        sd[lb + "attention.output.LayerNorm.bias"] = zeros(hidden)
        sd[lb + "intermediate.dense.weight"] = t(inter, hidden)
        sd[lb + "intermediate.dense.bias"] = zeros(inter)
        sd[lb + "output.dense.weight"] = t(hidden, inter)
        sd[lb + "output.dense.bias"] = zeros(hidden)
        sd[lb + "output.LayerNorm.weight"] = ones(hidden)
        sd[lb + "output.LayerNorm.bias"] = zeros(hidden)
    sd[tb + "pooler.dense.weight"] = t(hidden, hidden)
    sd[tb + "pooler.dense.bias"] = zeros(hidden)
    sd["text_projection.0.weight"] = t(joint, hidden)
    sd["text_projection.0.bias"] = zeros(joint)
    sd["text_projection.2.weight"] = t(joint, joint)
    sd["text_projection.2.bias"] = zeros(joint)
    return sd


def make_tiny_clap_state_dict(seed: int = 0) -> dict:
    return make_clap_state_dict(seed)


def write_tiny_clap_checkpoint(path: str, seed: int = 0) -> str:
    import torch

    sd = {k: torch.from_numpy(v) for k, v in make_tiny_clap_state_dict(seed).items()}
    torch.save(sd, path)
    return path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "ckpt/tiny_clap.pt"
    print(write_tiny_clap_checkpoint(out))
