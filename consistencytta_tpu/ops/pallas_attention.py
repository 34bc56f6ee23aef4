"""Fused flash self-attention Pallas kernel for the UNet's hot shapes.

The UNet's level-0 self-attention runs 4096 tokens x 5 heads x head_dim 51
(reference diffusers/models/attention_processor.py materializes the same
[B*H, S, S] logits tensor via baddbmm; our previous XLA einsum path did too).
At batch 16 that tensor is 2.7 GB in bf16 and the op is HBM-bound: XLA makes
~4 passes over it (write logits, softmax stats, probs, PV read). This kernel
never materializes it — the classic flash-attention online softmax, tiled
over (batch*heads, q-blocks, k-blocks) with fp32 running max/sum/accumulator
in VMEM scratch.

Specializations for this model family (which keep the kernel simple):
  * non-causal, no attention mask (UNet self-attention attends everywhere;
    only *cross*-attention carries the text padding mask, and its K=77 logits
    are tiny so it stays on the einsum path),
  * head_dim 51 zero-padded to 64 by the caller (zero q/k columns add zero
    terms to every dot product and zero v columns produce zero output
    columns, so the result is exact — mirroring the reference's
    strict-parity math while giving the MXU a clean contraction),
  * fp32 logits *inside* the kernel (free: the MXU accumulates fp32), so the
    numerics are strictly tighter than the bf16-stored-logits einsum path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Large-negative instead of -inf: exp(-1e30 - m) underflows to 0 cleanly and
# avoids (-inf) - (-inf) = nan in the running-max correction on the first
# block.
_NEG_INF = -1e30


_LANES = 128

# The kernels run the softmax in base 2: p = 2^(s*scale*log2(e) - m) equals
# e^(s*scale - m') exactly (up to fp rounding), and the VPU's exp2 skips the
# ln2 conversion multiply that exp performs per element. Callers that fold
# scale * _LOG2E into their projection weights (nn.attention imports this
# constant for that) pass scale = ln 2 to the packed kernel; the product
# with _LOG2E snaps to 1.0 in _flash_nhd_core and the in-kernel logit
# multiply pass is elided.
_LOG2E = 1.4426950408889634


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *, scale):
    """Online-softmax step. m/l scratch are [block_q, 128] lane-replicated;
    the accumulator is kept *normalized* every step (acc holds the current
    softmax-weighted average) — the lowering-friendly formulation of the
    upstream TPU flash kernel: all lane broadcasts are explicit jnp.tile /
    [:, :d] slices, never [:, :1] strided broadcasts, which Mosaic lowers
    to pathological element loops."""
    kb = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kb == 0)
    def _init():
        m_ref[:] = jnp.full(m_ref.shape, _NEG_INF, jnp.float32)
        l_ref[:] = jnp.zeros(l_ref.shape, jnp.float32)
        acc_ref[:] = jnp.zeros(acc_ref.shape, jnp.float32)

    q = q_ref[0]  # [bq, d]
    k = k_ref[0]  # [bk, d]
    v = v_ref[0]  # [bk, d]
    bk = k.shape[0]
    d = q.shape[-1]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s * (scale * _LOG2E)  # [bq, bk] fp32, base-2 logit domain

    if d < _LANES:
        lane_bcast = lambda x: x[:, :d]
    else:
        lane_bcast = lambda x: jnp.tile(x, (1, d // _LANES))

    m_prev = m_ref[:]  # [bq, 128]
    l_prev = l_ref[:]
    m_curr = jnp.max(s, axis=1)[:, None]  # [bq, 1]
    m_next = jnp.maximum(m_prev, m_curr)  # [bq, 128]
    p = jnp.exp2(s - jnp.tile(m_next, (1, bk // _LANES)))  # [bq, bk]
    alpha = jnp.exp2(m_prev - m_next)  # [bq, 128]
    l_corr = alpha * l_prev
    l_next = jnp.sum(p, axis=1)[:, None] + l_corr  # [bq, 128]
    m_ref[:] = m_next
    l_ref[:] = l_next

    l_next_inv = jnp.where(l_next == 0.0, 1.0, 1.0 / l_next)
    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [bq, d]
    acc_ref[:] = acc_ref[:] * lane_bcast(l_corr * l_next_inv) + pv * lane_bcast(
        l_next_inv
    )

    @pl.when(kb == nk - 1)
    def _finalize():
        o_ref[0] = acc_ref[:].astype(o_ref.dtype)


def _flash_core(q, k, v, scale, block_q, block_k, interpret):
    bh, s, d = q.shape
    grid = (bh, s // block_q, s // block_k)
    kernel = functools.partial(_flash_kernel, scale=scale)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bh, s, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),  # running max
            pltpu.VMEM((block_q, 128), jnp.float32),  # running sum
            pltpu.VMEM((block_q, d), jnp.float32),  # output accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * s * s * d,
            bytes_accessed=q.nbytes + k.nbytes + v.nbytes + q.nbytes,
            transcendentals=bh * s * s,
        ),
        interpret=interpret,
    )(q, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash(q, k, v, scale, block_q, block_k, interpret):
    return _flash_core(q, k, v, scale, block_q, block_k, interpret)


def _flash_fwd(q, k, v, scale, block_q, block_k, interpret):
    return _flash_core(q, k, v, scale, block_q, block_k, interpret), (q, k, v)


def _flash_bwd(scale, block_q, block_k, interpret, res, g):
    """Analytic attention backward in plain XLA (fp32 probs recompute),
    tiled over query blocks.

    pallas_call has no autodiff rule, and the training step differentiates
    the student UNet through its self-attention; this backward keeps grads
    exact (same math XLA autodiff would emit for the einsum path) while the
    forward keeps the flash kernel.

    The lax.scan over query chunks bounds live logits memory to
    [BH, chunk, S] fp32 instead of three full [BH, S, S] tensors (~5.4 GB
    each at the level-0 training shape) — without it the flash path's
    backward could exceed the HBM the forward just saved.
    """
    q, k, v = res
    bh, s, d = q.shape
    k32, v32 = k.astype(jnp.float32), v.astype(jnp.float32)
    bq = pick_block(s, 512) or s
    nq = s // bq

    def chunk(carry, inp):
        dk_acc, dv_acc = carry
        qc, gc = inp  # [bh, bq, d] fp32
        s_c = jnp.einsum("bqd,bkd->bqk", qc, k32) * scale
        p_c = jax.nn.softmax(s_c, axis=-1)
        dv_acc = dv_acc + jnp.einsum("bqk,bqd->bkd", p_c, gc)
        dp_c = jnp.einsum("bqd,bkd->bqk", gc, v32)
        ds_c = p_c * (dp_c - jnp.sum(dp_c * p_c, axis=-1, keepdims=True))
        dq_c = jnp.einsum("bqk,bkd->bqd", ds_c, k32) * scale
        dk_acc = dk_acc + jnp.einsum("bqk,bqd->bkd", ds_c, qc) * scale
        return (dk_acc, dv_acc), dq_c

    q32 = q.astype(jnp.float32).reshape(bh, nq, bq, d).transpose(1, 0, 2, 3)
    g32 = g.astype(jnp.float32).reshape(bh, nq, bq, d).transpose(1, 0, 2, 3)
    zero = jnp.zeros((bh, s, d), jnp.float32)
    (dk, dv), dq_chunks = jax.lax.scan(chunk, (zero, zero), (q32, g32))
    dq = dq_chunks.transpose(1, 0, 2, 3).reshape(bh, s, d)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


_flash.defvjp(_flash_fwd, _flash_bwd)


def _flash_packed_kernel(
    q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *, scale, heads, d
):
    """Online-softmax step over the packed [block, H*d] layout: the head
    loop is unrolled INSIDE the kernel with static 64-aligned lane slices,
    so one DMA of each full-width q/k/v block serves every head (Mosaic
    requires lane-dim blocks of 128-multiples or full width, which rules
    out per-head 64-lane grid blocks). Per-head running stats live in
    [heads, block_q, 128] scratch; the math per head is identical to
    _flash_kernel.

    Negative result (kept for the record, PERF.md "Attention kernel"): a
    sum/diff head-pair formulation ([q1|q2].[k1|k2]^T = S1+S2 and
    [q1|-q2].[k1|k2]^T = S1-S2, recovering both heads' logits from two
    full-depth K=128 products) fixes the half-rate K=64 QK matmul
    (measured 2.05x flop-normalized penalty) but the full UNet got
    SLOWER (86.0 -> 87.6 ms b16): at these shapes the kernel is
    VPU-bound on the softmax element passes, so MXU-side savings don't
    land. `scale` is python-static; callers that fold the softmax scale
    into their projection weights pass 1.0 and the multiply pass is
    elided."""
    kb = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kb == 0)
    def _init():
        m_ref[:] = jnp.full(m_ref.shape, _NEG_INF, jnp.float32)
        l_ref[:] = jnp.zeros(l_ref.shape, jnp.float32)
        acc_ref[:] = jnp.zeros(acc_ref.shape, jnp.float32)

    qf = q_ref[0]  # [bq, H*d]
    kf = k_ref[0]  # [bk, H*d]
    vf = v_ref[0]
    bk = kf.shape[0]

    if d < _LANES:
        lane_bcast = lambda x: x[:, :d]
    else:
        lane_bcast = lambda x: jnp.tile(x, (1, d // _LANES))

    def update(h, s):
        """One head's online-softmax + PV step; s is in base-2 logit domain.

        Negative result: extending V with a 64-lane ones block so the
        softmax row-sum rides the (already N-padded) PV matmul, replacing
        the [bq, bk] VPU sum-reduce, measured neutral-to-slightly-slower —
        the v_ext build + lane extraction costs what the reduce saved.
        Reverted; plain reduce kept."""
        v = vf[:, h * d : (h + 1) * d]
        m_prev = m_ref[h]  # [bq, 128]
        l_prev = l_ref[h]
        m_curr = jnp.max(s, axis=1)[:, None]  # [bq, 1]
        m_next = jnp.maximum(m_prev, m_curr)  # [bq, 128]
        p = jnp.exp2(s - jnp.tile(m_next, (1, bk // _LANES)))  # [bq, bk]
        alpha = jnp.exp2(m_prev - m_next)  # [bq, 128]
        l_corr = alpha * l_prev
        l_next = jnp.sum(p, axis=1)[:, None] + l_corr  # [bq, 128]
        m_ref[h] = m_next
        l_ref[h] = l_next

        l_next_inv = jnp.where(l_next == 0.0, 1.0, 1.0 / l_next)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [bq, d]
        acc_ref[h] = acc_ref[h] * lane_bcast(l_corr * l_next_inv) + pv * lane_bcast(
            l_next_inv
        )

    for h in range(heads):
        q = qf[:, h * d : (h + 1) * d]
        k = kf[:, h * d : (h + 1) * d]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        update(h, s * scale if scale != 1.0 else s)

    @pl.when(kb == nk - 1)
    def _finalize():
        for h in range(heads):
            o_ref[0, :, h * d : (h + 1) * d] = acc_ref[h].astype(o_ref.dtype)


def _flash_nhd_core(q, k, v, heads, scale, block_q, block_k, interpret):
    """Head-batched flash attention over the PROJECTION layout [B, S, H*d]:
    full-width blocks with the head loop unrolled in-kernel, so the caller
    needs NO [B,S,H,d] -> [B*H,S,d] transpose on either side — the
    fold/unfold relayouts measured ~2.7 ms per 1024-token transformer block
    (prof_attn_r3). Numerics per head are identical to _flash_kernel (same
    online softmax, same block sizes)."""
    b, s, hd = q.shape
    d = hd // heads
    grid = (b, s // block_q, s // block_k)
    # `scale` is the natural softmax scale; the kernel works in base-2
    # logits. When the caller already folded scale * _LOG2E into its
    # projection weights it passes scale = ln 2, the product snaps to 1.0
    # and the kernel's per-head logit multiply pass is elided.
    kernel_scale = scale * _LOG2E
    if abs(kernel_scale - 1.0) < 1e-9:
        kernel_scale = 1.0
    kernel = functools.partial(
        _flash_packed_kernel, scale=kernel_scale, heads=heads, d=d
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, s, hd), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, hd), lambda bb, i, j: (bb, i, 0)),
            pl.BlockSpec((1, block_k, hd), lambda bb, i, j: (bb, j, 0)),
            pl.BlockSpec((1, block_k, hd), lambda bb, i, j: (bb, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, hd), lambda bb, i, j: (bb, i, 0)),
        scratch_shapes=[
            pltpu.VMEM((heads, block_q, 128), jnp.float32),  # running max
            pltpu.VMEM((heads, block_q, 128), jnp.float32),  # running sum
            pltpu.VMEM((heads, block_q, d), jnp.float32),  # output accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            # The unrolled head loop keeps one [block_q, block_k] fp32 logit
            # temporary live per head, which overflows Mosaic's default
            # 16 MB scoped-vmem stack at the level-0 shape (5 heads x
            # 512x2048); v5e has 128 MB of VMEM, so raise the cap.
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * heads * s * s * d,
            bytes_accessed=q.nbytes + k.nbytes + v.nbytes + q.nbytes,
            transcendentals=b * heads * s * s,
        ),
        interpret=interpret,
    )(q, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _flash_nhd(q, k, v, heads, scale, block_q, block_k, interpret):
    return _flash_nhd_core(q, k, v, heads, scale, block_q, block_k, interpret)


def _flash_nhd_fwd(q, k, v, heads, scale, block_q, block_k, interpret):
    return (
        _flash_nhd_core(q, k, v, heads, scale, block_q, block_k, interpret),
        (q, k, v),
    )


def _flash_nhd_bwd(heads, scale, block_q, block_k, interpret, res, g):
    """Reuses the chunked analytic backward of the [BH, S, D] kernel by
    transposing to head-major once (training-only cost; inference never
    differentiates)."""
    q, k, v = res
    b, s, hd = q.shape
    d = hd // heads
    fold = lambda t: (
        t.reshape(b, s, heads, d).transpose(0, 2, 1, 3).reshape(b * heads, s, d)
    )
    unfold = lambda t: (
        t.reshape(b, heads, s, d).transpose(0, 2, 1, 3).reshape(b, s, hd)
    )
    dq, dk, dv = _flash_bwd(
        scale, block_q, block_k, interpret,
        (fold(q), fold(k), fold(v)), fold(g),
    )
    return unfold(dq), unfold(dk), unfold(dv)


_flash_nhd.defvjp(_flash_nhd_fwd, _flash_nhd_bwd)


def flash_mha_packed(
    q: jax.Array,  # [B, S, H*D] head-packed (D zero-padded per head)
    k: jax.Array,
    v: jax.Array,
    heads: int,
    scale: float,
    block_q: int = 512,
    block_k: int = 2048,
    interpret: bool = False,
) -> jax.Array:
    """Multi-head flash attention directly on the packed projection layout.

    Same math as `flash_self_attention` per head; the per-head feature width
    D = (H*D)//heads must be 64 or a multiple of 128 (callers pad the
    projection WEIGHTS with zero columns so padded features are exact
    zeros). Output is [B, S, H*D] in the same packing — feed `to_out` with
    zero rows at the pad positions for bit-exact unpadding."""
    b, s, hd = q.shape
    if hd % heads:
        raise ValueError(f"packed width {hd} not divisible by heads {heads}")
    d = hd // heads
    bq = pick_block(s, block_q)
    bk = pick_block(s, block_k)
    if bq is None or bk is None:
        raise ValueError(
            f"sequence {s} has no 128-multiple block divisor; "
            "use flash_supported() to gate dispatch"
        )
    if d % 64 or (d > 128 and d % 128):
        raise ValueError(
            f"head dim {d} must be 64 or a multiple of 128 (callers zero-pad)"
        )
    return _flash_nhd(q, k, v, heads, scale, bq, bk, interpret)


def pick_block(s: int, want: int, mult: int = 128) -> Optional[int]:
    """Largest divisor of `s` that is a multiple of `mult` and <= `want` —
    the block-size the kernel can actually tile (block_k must be a 128-lane
    multiple; the sweep in PERF.md showed performance is flat for blocks
    >= 256, so any such divisor is fine). None when no block exists (then
    callers fall back to the einsum path)."""
    top = min(want, s)
    for b in range(top - top % mult, 0, -mult):
        if s % b == 0:
            return b
    return None


def flash_supported(s: int, d: int) -> bool:
    """True when flash_self_attention can run sequence length `s` with
    (zero-padded) head dim `d` — the dispatch-gate predicate used by
    nn.attention / nn.vae, matching the kernel's exact divisibility rules
    rather than a coarser s % 256 check."""
    if d % 64 or (d > 128 and d % 128):
        return False
    return pick_block(s, 512) is not None


def flash_self_attention(
    q: jax.Array,  # [BH, S, D]
    k: jax.Array,  # [BH, S, D]
    v: jax.Array,  # [BH, S, D]
    scale: float,
    block_q: int = 512,
    block_k: int = 2048,
    interpret: bool = False,
) -> jax.Array:
    """softmax(q @ k.T * scale) @ v without materializing the logits.

    D must be a multiple of 64 (callers zero-pad head_dim 51 -> 64). Block
    sizes shrink automatically to the largest 128-multiple divisors of S
    (e.g. S=768 -> 384, S=1280 -> 256); S with no such divisor raises —
    gate with `flash_supported`. Output dtype follows q. Differentiable via
    a custom VJP (flash forward, analytic einsum backward).
    """
    bh, s, d = q.shape
    bq = pick_block(s, block_q)
    bk = pick_block(s, block_k)
    if bq is None or bk is None:
        raise ValueError(
            f"sequence {s} has no 128-multiple block divisor; "
            "use flash_supported() to gate dispatch"
        )
    if d % 64 or (d > 128 and d % 128):
        raise ValueError(
            f"head dim {d} must be 64 or a multiple of 128 (callers zero-pad)"
        )
    return _flash(q, k, v, scale, bq, bk, interpret)


def attention_reference(q, k, v, scale):
    """Plain einsum attention over [BH, S, D] — the numeric oracle for the
    kernel's tests (fp32 logits + fp32 softmax, like the kernel)."""
    s = jnp.einsum("bqd,bkd->bqk", q, k, preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s * scale, axis=-1)
    return jnp.einsum(
        "bqk,bkd->bqd", p.astype(v.dtype), v, preferred_element_type=jnp.float32
    ).astype(q.dtype)
