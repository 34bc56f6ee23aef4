"""Low-rank adaptation (LoRA) for the student UNet's attention projections.

Parity target: models/audio_distilled_model.py:116-145 (`--use_lora`) +
diffusers LoRAAttnProcessor — rank-4 A/B factors on to_q/to_k/to_v/to_out of
every self/cross attention, with only the LoRA factors trainable
(tools/train_utils.py:23-30 optimizes AttnProcsLayers).

Functional formulation: instead of swapping attention processors, the LoRA
update merges into the base kernels before the UNet apply —
(W + scale * A @ B) x == W x + scale * B^T(A^T(x)) — an O(rank * d^2)
tree-map that XLA fuses into the surrounding graph. Gradients then flow only
through the A/B trees, and the EMA shadows are LoRA trees too (tiny).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]

_ATTN_KEYS = ("attn1", "attn2")
_PROJ_KEYS = ("to_q", "to_k", "to_v", "to_out")


def _walk_attention_kernels(tree: Params, path=()):  # yields (path, kernel)
    for key, val in tree.items():
        if key in _ATTN_KEYS and isinstance(val, dict):
            for proj in _PROJ_KEYS:
                if proj in val and "kernel" in val[proj]:
                    yield path + (key, proj), val[proj]["kernel"]
        elif isinstance(val, dict):
            yield from _walk_attention_kernels(val, path + (key,))


def init_lora_params(
    unet_params: Params, rank: int = 4, rng: jax.Array = None, scale: float = 1.0
) -> Params:
    """LoRA tree mirroring the attention projections: {path: {"a","b"}} with
    A ~ N(0, 1/rank) and B = 0 (identity at init, LoRA convention)."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    lora: Params = {}
    for path, kernel in _walk_attention_kernels(unet_params):
        rng, k = jax.random.split(rng)
        d_in, d_out = kernel.shape
        node = lora
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = {
            "a": jax.random.normal(k, (d_in, rank), jnp.float32) / rank,
            "b": jnp.zeros((rank, d_out), jnp.float32),
        }
    return lora


def merge_lora(unet_params: Params, lora_params: Params, scale: float = 1.0) -> Params:
    """Returns a new params tree with W <- W + scale * (A @ B) on every
    LoRA-adapted kernel. Differentiable w.r.t. lora_params."""

    def merge_node(params_node: Params, lora_node: Params) -> Params:
        out = {}
        for key, val in params_node.items():
            if key in lora_node and isinstance(val, dict):
                if "kernel" in val and set(lora_node[key]) == {"a", "b"}:
                    delta = (lora_node[key]["a"] @ lora_node[key]["b"]).astype(
                        val["kernel"].dtype
                    )
                    out[key] = {**val, "kernel": val["kernel"] + scale * delta}
                else:
                    out[key] = merge_node(val, lora_node[key])
            else:
                out[key] = val
        return out

    return merge_node(unet_params, lora_params)


def lora_param_count(lora_params: Params) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(lora_params))


def is_lora_tree(tree) -> bool:
    """True when `tree` is a LoRA factor tree (every leaf dict is an {a, b}
    pair) rather than full UNet params. Used by the checkpoint loader to
    decide whether a restored role needs merge-at-load
    (cli.common.load_frozen_and_roles)."""
    if not isinstance(tree, dict) or not tree:
        return False
    found = []

    def walk(node):
        for v in node.values():
            if isinstance(v, dict):
                if set(v) == {"a", "b"} and not any(
                    isinstance(x, dict) for x in v.values()
                ):
                    found.append(True)
                else:
                    walk(v)
            else:
                found.append(False)

    walk(tree)
    return bool(found) and all(found)


def build_lora_consistency_train_step(
    pipeline,
    schedule,
    tx,
    cfg,
    loss_fn_override=None,
):
    """Consistency train step where only LoRA factors train: the TrainState's
    student/target/ema trees hold LoRA params, merged into the frozen base
    before every UNet query.

    The frozen PipelineParams must carry the base student weights in its
    `student` slot — passed as a step argument, NOT closed over (closure
    arrays serialize into the compiled program on AOT backends)."""
    import optax

    from consistencytta_tpu.training.ema import ema_update
    from consistencytta_tpu.training.losses import mse_instance
    from consistencytta_tpu.training.step import (
        TrainState,
        _select_if_finite,
        _tree_finite,
        consistency_forward,
        min_snr_weights_stage2,
    )

    def micro_loss(lora, state, frozen, micro, rng):
        student = merge_lora(frozen.student, lora)
        target = jax.lax.stop_gradient(
            merge_lora(frozen.student, state.student_target)
        )
        pred, tgt, snr = consistency_forward(
            pipeline, schedule, cfg, student, target, frozen, micro, rng
        )
        if loss_fn_override is not None:
            inst = loss_fn_override(pred, tgt, frozen, micro)
        else:
            inst = mse_instance(pred, tgt)
        if cfg.snr_gamma is not None:
            inst = inst * min_snr_weights_stage2(snr, cfg.snr_gamma)
        return inst.mean()

    grad_fn = jax.value_and_grad(micro_loss)

    def step(state: TrainState, frozen, batch, rng):
        # gradient accumulation: same in-step lax.scan micro-batching as the
        # full-parameter step (training/step.py) — the recipes size the
        # global batch as bs * devices * accum_steps, so skipping it would
        # silently lose the micro-batching that keeps the batch inside HBM
        a = cfg.accum_steps
        if a == 1:
            loss, grads = grad_fn(state.student, state, frozen, batch, rng)
        else:
            micro = jax.tree_util.tree_map(
                lambda x: x.reshape((a, x.shape[0] // a) + x.shape[1:]), batch
            )
            rngs = jax.random.split(rng, a)

            def body(carry, xs):
                loss_acc, grad_acc = carry
                mb, r = xs
                l, g = grad_fn(state.student, state, frozen, mb, r)
                return (
                    loss_acc + l / a,
                    jax.tree_util.tree_map(lambda ga, gi: ga + gi / a, grad_acc, g),
                ), None

            zero = jax.tree_util.tree_map(jnp.zeros_like, state.student)
            (loss, grads), _ = jax.lax.scan(
                body, (jnp.zeros(()), zero), (micro, rngs)
            )
        finite = jnp.isfinite(loss) & _tree_finite(grads)
        updates, new_opt = tx.update(grads, state.opt_state, state.student)
        new_lora = optax.apply_updates(state.student, updates)
        new_lora = _select_if_finite(finite, new_lora, state.student)
        new_opt = _select_if_finite(finite, new_opt, state.opt_state)
        new_state = TrainState(
            step=state.step + 1,
            student=new_lora,
            student_target=ema_update(
                state.student_target, new_lora, cfg.target_ema_decay
            ),
            student_ema=ema_update(state.student_ema, new_lora, cfg.ema_decay),
            opt_state=new_opt,
        )
        return new_state, {"loss": loss, "loss_finite": finite}

    return step
