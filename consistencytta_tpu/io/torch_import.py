"""PyTorch checkpoint -> flax params converters.

These reproduce, in one place, every key-surgery path of the reference:

  * AudioLDM VAE extraction from `audioldm-s-full.ckpt`
    (`first_stage_model.*` prefix strip + scale_factor, reference
    tools/build_pretrained.py:8-36),
  * HiFi-GAN with weight norm already removed (hifigan/utilities.py:67-73),
  * the guided/teacher UNet state dicts including the TANGO
    teacher/student/target/ema fan-out
    (models/audio_consistency_model.py:107-158) and the legacy-name remaps
    (`consistency_unet` -> `student_unet`, :160-204),
  * T5 encoder weights from a HF torch state dict.

All converters take a flat dict of numpy arrays (key -> ndarray) so that
torch is only required at the call site that loads the .bin/.pt file
(`load_torch_state_dict`).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Mapping, Optional, Tuple

import numpy as np

from consistencytta_tpu.configs import HiFiGANConfig, UNetConfig, VAEConfig

Params = Dict[str, Any]
FlatSD = Mapping[str, np.ndarray]


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint into numpy (CPU), flattening tensors."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    # descend into {"state_dict": {...}} / {"model": {...}} wrappers (the
    # official Cnn14_16k_mAP=0.438.pth nests the weights under "model",
    # panns models.py:249-250) when the top level itself holds no tensors
    for wrapper in ("state_dict", "model"):
        if (
            isinstance(sd, dict)
            and isinstance(sd.get(wrapper), dict)
            and not any(hasattr(v, "numpy") for v in sd.values() if v is not None)
        ):
            sd = sd[wrapper]
            break
    return {k: v.detach().cpu().numpy() for k, v in sd.items() if hasattr(v, "detach")}


# -- layout helpers ---------------------------------------------------------


def conv2d_kernel(w: np.ndarray) -> np.ndarray:
    """torch Conv2d [O, I, kh, kw] -> flax [kh, kw, I, O]."""
    return np.transpose(w, (2, 3, 1, 0))


def conv1d_kernel(w: np.ndarray) -> np.ndarray:
    """torch Conv1d [O, I, k] -> flax [k, I, O]."""
    return np.transpose(w, (2, 1, 0))


def conv_transpose1d_kernel(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose1d [I, O, k] -> our [k, O, I]
    (see consistencytta_tpu.nn.layers.conv_transpose_1d)."""
    return np.transpose(w, (2, 1, 0))


def linear_kernel(w: np.ndarray) -> np.ndarray:
    """torch Linear [O, I] -> flax [I, O]."""
    return np.transpose(w, (1, 0))


def _conv(sd: FlatSD, key: str, kind: str = "2d") -> Params:
    w = sd[f"{key}.weight"]
    kernel = {"2d": conv2d_kernel, "1d": conv1d_kernel}[kind](w)
    out = {"kernel": kernel}
    if f"{key}.bias" in sd:
        out["bias"] = sd[f"{key}.bias"]
    return out


def _norm(sd: FlatSD, key: str) -> Params:
    return {"scale": sd[f"{key}.weight"], "bias": sd[f"{key}.bias"]}


def _linear(sd: FlatSD, key: str) -> Params:
    out = {"kernel": linear_kernel(sd[f"{key}.weight"])}
    if f"{key}.bias" in sd:
        out["bias"] = sd[f"{key}.bias"]
    return out


def strip_prefix(sd: FlatSD, prefix: str) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in sd.items():
        if k.startswith(prefix):
            out[k[len(prefix) :]] = v
    return out


# -- VAE ---------------------------------------------------------------------


def _resnet_block(sd: FlatSD, key: str) -> Params:
    p = {
        "norm1": _norm(sd, f"{key}.norm1"),
        "conv1": _conv(sd, f"{key}.conv1"),
        "norm2": _norm(sd, f"{key}.norm2"),
        "conv2": _conv(sd, f"{key}.conv2"),
    }
    if f"{key}.nin_shortcut.weight" in sd:
        p["nin_shortcut"] = _conv(sd, f"{key}.nin_shortcut")
    return p


def _attn_block(sd: FlatSD, key: str) -> Params:
    return {
        "norm": _norm(sd, f"{key}.norm"),
        "q": _conv(sd, f"{key}.q"),
        "k": _conv(sd, f"{key}.k"),
        "v": _conv(sd, f"{key}.v"),
        "proj_out": _conv(sd, f"{key}.proj_out"),
    }


def _vae_decoder_params(sd: FlatSD, config: VAEConfig) -> Params:
    """Decoder tree from keys rooted at `decoder.` (shared by the full VAE
    converter and the stage-3 FTVAE decoder-pair converters)."""
    num_levels = len(config.ch_mult)
    dec: Params = {"conv_in": _conv(sd, "decoder.conv_in")}
    dec["mid_block_1"] = _resnet_block(sd, "decoder.mid.block_1")
    dec["mid_attn_1"] = _attn_block(sd, "decoder.mid.attn_1")
    dec["mid_block_2"] = _resnet_block(sd, "decoder.mid.block_2")
    for i in range(num_levels):
        for j in range(config.num_res_blocks + 1):
            dec[f"up_{i}_block_{j}"] = _resnet_block(sd, f"decoder.up.{i}.block.{j}")
        if i != 0:
            dec[f"up_{i}_upsample"] = _conv(sd, f"decoder.up.{i}.upsample.conv")
    dec["norm_out"] = _norm(sd, "decoder.norm_out")
    dec["conv_out"] = _conv(sd, "decoder.conv_out")
    return dec


def convert_vae(sd: FlatSD, config: VAEConfig = VAEConfig()) -> Params:
    """AudioLDM AutoencoderKL torch state dict -> flax params.

    Expects keys rooted at encoder./decoder./quant_conv./post_quant_conv.
    (Use `strip_prefix(sd, "first_stage_model.")` for raw audioldm ckpts, per
    reference tools/build_pretrained.py:13-15.)
    """
    num_levels = len(config.ch_mult)

    enc: Params = {"conv_in": _conv(sd, "encoder.conv_in")}
    for i in range(num_levels):
        for j in range(config.num_res_blocks):
            enc[f"down_{i}_block_{j}"] = _resnet_block(sd, f"encoder.down.{i}.block.{j}")
        if i != num_levels - 1:
            enc[f"down_{i}_downsample"] = _conv(sd, f"encoder.down.{i}.downsample.conv")
    enc["mid_block_1"] = _resnet_block(sd, "encoder.mid.block_1")
    enc["mid_attn_1"] = _attn_block(sd, "encoder.mid.attn_1")
    enc["mid_block_2"] = _resnet_block(sd, "encoder.mid.block_2")
    enc["norm_out"] = _norm(sd, "encoder.norm_out")
    enc["conv_out"] = _conv(sd, "encoder.conv_out")

    return {
        "encoder": enc,
        "decoder": _vae_decoder_params(sd, config),
        "quant_conv": _conv(sd, "quant_conv"),
        "post_quant_conv": _conv(sd, "post_quant_conv"),
    }


def convert_vae_decoder_pair(sd: FlatSD, config: VAEConfig = VAEConfig()) -> Params:
    """Keys rooted at decoder./post_quant_conv. -> the partial VAE tree
    {decoder, post_quant_conv} consumed by training.ftvae.merge_vae_decoder
    and PipelineParams.vae_ema (reference decode(use_ema=...) pair,
    audioldm/variational_autoencoder/autoencoder.py:91-103)."""
    return {
        "decoder": _vae_decoder_params(sd, config),
        "post_quant_conv": _conv(sd, "post_quant_conv"),
    }


def convert_vae_ema_decoder(sd: FlatSD, config: VAEConfig = VAEConfig()) -> Params:
    """Stage-3 EMA decoder pair (ema_decoder + ema_post_quant_conv,
    reference models/audio_consistency_model_ftvae.py:52-66) as a standalone
    decoder params tree usable with AutoencoderKL.decode."""
    remapped = {}
    for k, v in sd.items():
        if k.startswith("ema_decoder."):
            remapped["decoder." + k[len("ema_decoder.") :]] = v
        elif k.startswith("ema_post_quant_conv."):
            remapped["post_quant_conv." + k[len("ema_post_quant_conv.") :]] = v
    return convert_vae_decoder_pair(remapped, config)


def extract_ftvae_decoders(
    sd: FlatSD,
) -> Tuple[Optional[Dict[str, np.ndarray]], Optional[Dict[str, np.ndarray]]]:
    """Pull the fine-tuned VAE decoder pair and its EMA copy out of a
    reference FTVAE model state dict — the exact keys its load_pretrained
    reads back (models/audio_consistency_model_ftvae.py:69-91):

      vae.decoder.* / vae.post_quant_conv.*   -> trained decoder pair
      ema_vae_decoder.* / ema_vae_pqconv.*    -> EMA pair
      (aliases vae.ema_decoder.* / vae.ema_post_quant_conv.* also accepted;
       `loss.`-prefixed duplicates from the CLAP loss module are deduped
       like the reference's 'loss' branch)

    Returns (trained, ema) flat dicts re-rooted at decoder./post_quant_conv.
    (feed to convert_vae_decoder_pair), or None for an absent half.
    """
    trained: Dict[str, np.ndarray] = {}
    ema: Dict[str, np.ndarray] = {}
    alias_map = (
        ("vae.ema_decoder.", "decoder.", ema),
        ("vae.ema_post_quant_conv.", "post_quant_conv.", ema),
        ("vae.decoder.", "decoder.", trained),
        ("vae.post_quant_conv.", "post_quant_conv.", trained),
        ("ema_vae_decoder.", "decoder.", ema),
        ("ema_vae_pqconv.", "post_quant_conv.", ema),
    )
    for k, v in sd.items():
        key = k[5:] if k.startswith("loss.") else k
        for prefix, root, dest in alias_map:
            if key.startswith(prefix):
                dest.setdefault(root + key[len(prefix) :], v)
                break
    return (trained or None), (ema or None)


# NOTE: the 1x1 "convs" in the reference VAE attention and quant layers are
# true Conv2d modules, so they convert through conv2d_kernel like the rest.


# -- UNet --------------------------------------------------------------------


def _unet_resnet(sd: FlatSD, key: str) -> Params:
    p = {
        "norm1": _norm(sd, f"{key}.norm1"),
        "conv1": _conv(sd, f"{key}.conv1"),
        "time_emb_proj": _linear(sd, f"{key}.time_emb_proj"),
        "norm2": _norm(sd, f"{key}.norm2"),
        "conv2": _conv(sd, f"{key}.conv2"),
    }
    if f"{key}.conv_shortcut.weight" in sd:
        p["conv_shortcut"] = _conv(sd, f"{key}.conv_shortcut")
    return p


def _unet_attention(sd: FlatSD, key: str) -> Params:
    """Transformer2DModel (use_linear_projection) -> Transformer2D params."""
    p: Params = {
        "norm": _norm(sd, f"{key}.norm"),
        "proj_in": _linear(sd, f"{key}.proj_in"),
        "proj_out": _linear(sd, f"{key}.proj_out"),
    }
    i = 0
    while f"{key}.transformer_blocks.{i}.norm1.weight" in sd:
        tb = f"{key}.transformer_blocks.{i}"
        p[f"block_{i}"] = {
            "norm1": _norm(sd, f"{tb}.norm1"),
            "attn1": {
                "to_q": _linear(sd, f"{tb}.attn1.to_q"),
                "to_k": _linear(sd, f"{tb}.attn1.to_k"),
                "to_v": _linear(sd, f"{tb}.attn1.to_v"),
                "to_out": _linear(sd, f"{tb}.attn1.to_out.0"),
            },
            "norm2": _norm(sd, f"{tb}.norm2"),
            "attn2": {
                "to_q": _linear(sd, f"{tb}.attn2.to_q"),
                "to_k": _linear(sd, f"{tb}.attn2.to_k"),
                "to_v": _linear(sd, f"{tb}.attn2.to_v"),
                "to_out": _linear(sd, f"{tb}.attn2.to_out.0"),
            },
            "norm3": _norm(sd, f"{tb}.norm3"),
            "ff": {
                "act": {"proj": _linear(sd, f"{tb}.ff.net.0.proj")},
                "proj_out": _linear(sd, f"{tb}.ff.net.2"),
            },
        }
        i += 1
    return p


def init_guidance_params(config: UNetConfig, seed: int = 0) -> Params:
    """Fresh guidance-module params (Fourier projection + 2-layer MLP).

    Used for the reference's `strict=False` cold start: when TANGO (plain
    teacher) weights initialize the guided student, the guidance modules have
    no checkpoint keys and keep their module init
    (models/audio_consistency_model.py:133-149). Deterministic in `seed` so
    every role (student/target/ema) fans out with IDENTICAL guidance init,
    matching the reference's post-load state_dict copy into target/ema."""
    rs = np.random.RandomState(seed)
    ch = config.block_out_channels[0]
    emb = ch * 4  # time_embed_dim; Fourier output is cat(cos,sin) = 4*ch

    def dense(fan_in: int, fan_out: int) -> Params:
        kernel = rs.standard_normal((fan_in, fan_out)) / np.sqrt(fan_in)
        return {
            "kernel": kernel.astype(np.float32),
            "bias": np.zeros((fan_out,), np.float32),
        }

    return {
        # N(0, scale=1) like GaussianFourierProjection's frozen weight
        "guidance_proj": {
            "weight": rs.standard_normal((ch * 2,)).astype(np.float32)
        },
        "guidance_embedding": {
            "linear_1": dense(emb, emb),
            "linear_2": dense(emb, emb),
        },
    }


def convert_unet(
    sd: FlatSD, config: UNetConfig, strict: bool = True, init_seed: int = 0
) -> Params:
    """Guided/plain UNet torch state dict -> flax params.

    Key structure follows diffusers UNet2DCondition(Guided)Model; the
    guidance_proj/guidance_embedding keys exist only for the guided variant
    (unet_2d_condition_guided.py:287-302). With `strict=False`, missing
    guidance keys fall back to fresh init (the reference's
    `load_state_dict(..., strict=False)` TANGO cold start,
    models/audio_consistency_model.py:133-149)."""
    p: Params = {
        "conv_in": _conv(sd, "conv_in"),
        "time_embedding": {
            "linear_1": _linear(sd, "time_embedding.linear_1"),
            "linear_2": _linear(sd, "time_embedding.linear_2"),
        },
    }
    if config.guided:
        if "guidance_proj.weight" in sd:
            p["guidance_proj"] = {"weight": sd["guidance_proj.weight"]}
            p["guidance_embedding"] = {
                "linear_1": _linear(sd, "guidance_embedding.linear_1"),
                "linear_2": _linear(sd, "guidance_embedding.linear_2"),
            }
        elif not strict:
            p.update(init_guidance_params(config, seed=init_seed))
        else:
            raise KeyError(
                "guidance_proj.weight missing from a guided UNet state dict "
                "(pass strict=False for the TANGO cold-start fan-out)"
            )

    num_levels = config.num_levels
    for i, block_type in enumerate(config.down_block_types):
        for j in range(config.layers_per_block):
            p[f"down_{i}_resnet_{j}"] = _unet_resnet(sd, f"down_blocks.{i}.resnets.{j}")
            if block_type == "CrossAttnDownBlock2D":
                p[f"down_{i}_attn_{j}"] = _unet_attention(
                    sd, f"down_blocks.{i}.attentions.{j}"
                )
        if i != num_levels - 1:
            p[f"down_{i}_downsample"] = {
                "conv": _conv(sd, f"down_blocks.{i}.downsamplers.0.conv")
            }

    p["mid_resnet_0"] = _unet_resnet(sd, "mid_block.resnets.0")
    p["mid_attn_0"] = _unet_attention(sd, "mid_block.attentions.0")
    p["mid_resnet_1"] = _unet_resnet(sd, "mid_block.resnets.1")

    for i, block_type in enumerate(config.up_block_types):
        for j in range(config.layers_per_block + 1):
            p[f"up_{i}_resnet_{j}"] = _unet_resnet(sd, f"up_blocks.{i}.resnets.{j}")
            if block_type == "CrossAttnUpBlock2D":
                p[f"up_{i}_attn_{j}"] = _unet_attention(
                    sd, f"up_blocks.{i}.attentions.{j}"
                )
        if i != num_levels - 1:
            p[f"up_{i}_upsample"] = {"conv": _conv(sd, f"up_blocks.{i}.upsamplers.0.conv")}

    p["conv_norm_out"] = _norm(sd, "conv_norm_out")
    p["conv_out"] = _conv(sd, "conv_out")
    return p


# -- T5 encoder --------------------------------------------------------------


def convert_t5(sd: FlatSD, num_layers: int) -> Params:
    """HF torch T5EncoderModel state dict -> T5Encoder flax params.

    Accepts both `encoder.block...`-rooted dicts (T5EncoderModel) and
    bare `block...` roots."""

    def key(k: str) -> str:
        return k if k in sd else f"encoder.{k}"

    def lin(k: str) -> Params:
        return {"kernel": linear_kernel(sd[key(k)])}

    p: Params = {
        "token_embedding": sd["shared.weight" if "shared.weight" in sd else "encoder.embed_tokens.weight"],
        "relative_attention_bias": sd[
            key("block.0.layer.0.SelfAttention.relative_attention_bias.weight")
        ],
        "final_norm": {"scale": sd[key("final_layer_norm.weight")]},
    }
    # the T5 stack runs as nn.scan with layer-stacked params
    per_layer = []
    for i in range(num_layers):
        b = f"block.{i}"
        per_layer.append({
            "attn_norm": {"scale": sd[key(f"{b}.layer.0.layer_norm.weight")]},
            "attn": {
                "q": lin(f"{b}.layer.0.SelfAttention.q.weight"),
                "k": lin(f"{b}.layer.0.SelfAttention.k.weight"),
                "v": lin(f"{b}.layer.0.SelfAttention.v.weight"),
                "o": lin(f"{b}.layer.0.SelfAttention.o.weight"),
            },
            "ff_norm": {"scale": sd[key(f"{b}.layer.1.layer_norm.weight")]},
            "wi_0": lin(f"{b}.layer.1.DenseReluDense.wi_0.weight"),
            "wi_1": lin(f"{b}.layer.1.DenseReluDense.wi_1.weight"),
            "wo": lin(f"{b}.layer.1.DenseReluDense.wo.weight"),
        })
    import jax

    p["blocks"] = {
        "layer": jax.tree_util.tree_map(
            lambda *xs: np.stack(xs, axis=0), *per_layer
        )
    }
    return p


# -- ConsistencyTTA checkpoint key surgery ----------------------------------

UNET_ROLES = ("teacher", "student", "student_target", "student_ema")


def split_consistencytta_checkpoint(
    sd: FlatSD,
) -> Dict[str, Dict[str, np.ndarray]]:
    """Split a full ConsistencyTTA model state dict (pytorch_model_2.bin)
    into per-role UNet state dicts, applying the legacy-name remapping of
    models/audio_consistency_model.py:160-204:

      consistency_unet.*       -> student_unet.*
      consistency_ema_unet.*   -> student_target_unet.* (+ student_ema if absent)
      consistency_slow_ema_unet.* -> student_ema_unet.*
      diffusion_unet.*         -> teacher_unet.*
    """
    remapped: Dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if "consistency_slow_ema_" in k:
            remapped["student_ema_" + k.split("consistency_slow_ema_")[-1]] = v
        elif "consistency_ema_" in k:
            tail = k.split("consistency_ema_")[-1]
            remapped.setdefault("student_target_" + tail, v)
            remapped.setdefault("student_ema_" + tail, v)
        elif "consistency_unet" in k:
            remapped["student_unet" + k.split("consistency_unet")[-1]] = v
        elif "diffusion_unet" in k:
            remapped["teacher_unet" + k.split("diffusion_unet")[-1]] = v
        else:
            remapped.setdefault(k, v)

    roles: Dict[str, Dict[str, np.ndarray]] = {r: {} for r in UNET_ROLES}
    for k, v in remapped.items():
        for role in UNET_ROLES:
            prefix = f"{role}_unet."
            if k.startswith(prefix):
                roles[role][k[len(prefix) :]] = v
                break
    return roles


def fan_out_tango_checkpoint(
    tango_sd: FlatSD, stage1_sd: Optional[FlatSD] = None
) -> Dict[str, Dict[str, np.ndarray]]:
    """TANGO -> ConsistencyTTA initialization fan-out
    (models/audio_consistency_model.py:107-158): the TANGO `unet.*` weights
    become the teacher; student/target/ema initialize from the stage-1
    student-EMA weights when given, else from the teacher."""
    teacher = {
        k[len("unet.") :]: v for k, v in tango_sd.items() if k.startswith("unet.")
    }
    roles = {"teacher": teacher}
    if stage1_sd is not None:
        stage1_ema = {
            k.split("student_ema_unet.")[-1]: v
            for k, v in stage1_sd.items()
            if "student_ema_unet." in k
        }
        init = stage1_ema
    else:
        init = teacher
    for role in ("student", "student_target", "student_ema"):
        roles[role] = dict(init)
    return roles


# -- HiFi-GAN ----------------------------------------------------------------


def convert_hifigan(sd: FlatSD, config: HiFiGANConfig = HiFiGANConfig()) -> Params:
    """HiFi-GAN generator state dict (weight norm removed) -> flax params."""
    p: Params = {"conv_pre": _conv(sd, "conv_pre", "1d")}
    num_kernels = len(config.resblock_kernel_sizes)
    for i in range(len(config.upsample_rates)):
        p[f"ups_{i}_kernel"] = conv_transpose1d_kernel(sd[f"ups.{i}.weight"])
        p[f"ups_{i}_bias"] = sd[f"ups.{i}.bias"]
        for j in range(num_kernels):
            flat = i * num_kernels + j
            block: Params = {}
            for m in range(3):
                block[f"convs1_{m}"] = _conv(sd, f"resblocks.{flat}.convs1.{m}", "1d")
                block[f"convs2_{m}"] = _conv(sd, f"resblocks.{flat}.convs2.{m}", "1d")
            p[f"resblock_{i}_{j}"] = block
    p["conv_post"] = _conv(sd, "conv_post", "1d")
    return p


# -- import-time validation --------------------------------------------------


def _tree_shapes(tree: Any, prefix: str = "") -> Dict[str, Tuple[int, ...]]:
    """Flatten a params pytree to {'/'-joined path: shape}."""
    out: Dict[str, Tuple[int, ...]] = {}
    if isinstance(tree, Mapping):
        for k, v in tree.items():
            out.update(_tree_shapes(v, f"{prefix}{k}/"))
    elif hasattr(tree, "shape"):
        out[prefix.rstrip("/")] = tuple(tree.shape)
    else:  # scalar leaf
        out[prefix.rstrip("/")] = ()
    return out


def assert_params_match(
    converted: Params, expected: Params, context: str = "checkpoint"
) -> None:
    """Fail loudly, naming every offending key, when a converted checkpoint
    tree does not structurally match the model's expected params.

    This is the day-1 real-asset guard the importers run behind: a renamed
    source key surfaces as a KeyError inside the converter (the missing key
    is in the message), and a wrong-SHAPE tensor — which numpy transposes
    and flax would otherwise drag into a cryptic XLA dot-dimension error —
    is caught here with the parameter path and both shapes.
    """
    got = _tree_shapes(converted)
    want = _tree_shapes(expected)
    missing = sorted(set(want) - set(got))
    unexpected = sorted(set(got) - set(want))
    mismatched = sorted(
        f"{k}: checkpoint {got[k]} vs model {want[k]}"
        for k in set(got) & set(want)
        if got[k] != want[k]
    )
    if missing or unexpected or mismatched:
        lines = [f"{context}: converted params do not match the model"]
        if missing:
            lines.append(f"  missing ({len(missing)}): {missing[:8]}")
        if unexpected:
            lines.append(f"  unexpected ({len(unexpected)}): {unexpected[:8]}")
        if mismatched:
            lines.append(f"  shape mismatches ({len(mismatched)}):")
            lines.extend(f"    {m}" for m in mismatched[:8])
        raise ValueError("\n".join(lines))
