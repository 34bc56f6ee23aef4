"""Pallas dense-packed block-space dilated conv1d (HiFi-GAN tail levels).

The vocoder tail runs in space-to-depth block space [B, M, s*C] with
s*C == 128 (nn/layers.py). XLA computes a dilated conv there as a stride-1
conv with a block-sparse kernel of n_taps ~ (k-1)*d/s + 1 taps whose fill
fraction is only k*s/(n_taps*s^2): for the d=3/d=5 resblock convs
(reference audioldm/hifigan/models.py:20-63) that is 3-5x structured-zero
FLOP waste — measured as ~18 ms of the vocoder's 227 ms (PERF.md round-3b
ablations). This kernel removes the waste with a dense packing:

For output phase j pick the smallest m_j >= 0 with m_j*d ≡ j (mod s)
(gcd(d, s) = 1 for every HiFi-GAN dilation), i.e. j + s*Δ_j = m_j*d.
Then phase j of output block (m + Δ_j) reads exactly the tap lattice
u_n = n*d - p at base block m:

    y[s*(m+Δ_j) + j] = sum_t x[s*m + u_(t+m_j)] * W[t]

All s phases share ONE lattice, so s lattice rows (each a C-lane slice of
the blocked input at sublane offset T_n = u_n // s, lane phase
i_n = u_n mod s) concatenate into a [TM, 128] LHS, and the matching
[128, 128] RHS of stacked W taps is DENSE. Matmuls per conv drop from
n_taps to ceil((k + max m_j) / s):  d=5, k=11, s=2: 26 -> 6.

Per-phase results are accumulated into the output at sublane shift Δ_j.
Forward-only Pallas; the VJP re-derives gradients through the exact XLA
block-conv formulation (conv1d_rechanneled_pre), so training paths that
differentiate the vocoder (stage-3 CLAP loss) are unchanged.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


class _Plan(NamedTuple):
    k: int
    d: int
    s: int
    c: int
    padding: int
    m_j: Tuple[int, ...]      # per-phase tap shift
    delta_j: Tuple[int, ...]  # per-phase output block shift
    n_rows: int               # lattice rows (k + max m_j, padded to s mult)
    groups: int               # matmuls = n_rows // s
    t_n: Tuple[int, ...]      # per-row sublane offset u_n // s
    i_n: Tuple[int, ...]      # per-row lane phase u_n % s


@functools.lru_cache(maxsize=None)
def _make_plan(k: int, d: int, s: int, padding: int) -> _Plan:
    if math.gcd(d, s) != 1:
        raise ValueError(f"dense block conv needs gcd(d, s) == 1, got {d=}, {s=}")
    c = LANES // s
    m_j = []
    for j in range(s):
        m = next(m for m in range(s) if (m * d - j) % s == 0)
        m_j.append(m)
    delta_j = tuple((m * d - j) // s for j, m in enumerate(m_j))
    n_raw = k + max(m_j)
    groups = -(-n_raw // s)
    n_rows = groups * s
    u = [n * d - padding for n in range(n_rows)]
    t_n = tuple(x // s for x in u)
    i_n = tuple(x % s for x in u)
    return _Plan(k, d, s, c, padding, tuple(m_j), delta_j, n_rows, groups, t_n, i_n)


def _pack_rhs(kernel: jax.Array, plan: _Plan) -> jax.Array:
    """Stack W taps into the dense [G, 128, 128] rhs.

    rhs[g, r*C:(r+1)*C, j*C:(j+1)*C] = W[n - m_j] for lattice row
    n = g*s + r — but the LHS is assembled in lane order of the row's
    phase i_n (each group holds each phase exactly once), so the row-slab
    position is i_n, folding the lane permutation into the rhs for free.
    """
    k, s, c = plan.k, plan.s, plan.c
    rhs = jnp.zeros((plan.groups, LANES, LANES), kernel.dtype)
    for g in range(plan.groups):
        for r in range(s):
            n = g * s + r
            slab = plan.i_n[n]  # lane position of this lattice row in LHS
            for j in range(s):
                t = n - plan.m_j[j]
                if 0 <= t < k:
                    rhs = rhs.at[
                        g, slab * c : (slab + 1) * c, j * c : (j + 1) * c
                    ].set(kernel[t])
    return rhs


def _kernel_body(x_prev, x_cur, x_next, rhs_ref, m_ref, out_ref, *, plan, tm):
    s, c = plan.s, plan.c
    d_max = max(plan.delta_j)
    tma = tm + d_max  # lhs base rows m in [-d_max, tm)
    m_total = m_ref[0]
    tile = pl.program_id(1)

    xt = jnp.concatenate([x_prev[0], x_cur[0], x_next[0]], axis=0)  # [3TM,128]

    # t_{g*s+r} = t_r + g*d and i_{g*s+r} = i_r: pre-shift xt once per
    # phase (roll gives a canonical layout) so every slab in a group is
    # sliced at the SAME sublane start — Mosaic's lane-concat requires
    # matching sublane offsets across its inputs. tpu.dynamic_rotate only
    # exists for 32-bit data, so roll in fp32 and cast the assembled lhs
    # back to the input dtype per group (VMEM-local VPU work).
    xt32 = xt.astype(jnp.float32)
    x_r = [
        pltpu.roll(xt32, (-plan.t_n[r]) % (3 * tm), axis=0) for r in range(s)
    ]

    acc = jnp.zeros((tma, LANES), jnp.float32)
    for g in range(plan.groups):
        slabs = [None] * s
        start = tm - d_max + g * plan.d
        for r in range(s):
            n = g * s + r
            lane = plan.i_n[r] * c
            # rows m + T_n for m in [-d_max, tm): local index in x_r is
            # tm + m + g*d (the cur tile starts at local row tm; the
            # per-phase t_r shift is already folded into x_r)
            sl = x_r[r][start : start + tma, lane : lane + c]
            # zero rows whose global x row falls outside [0, M)
            grow = (
                tile * tm
                - d_max
                + plan.t_n[n]
                + jax.lax.broadcasted_iota(jnp.int32, (tma, 1), 0)
            )
            valid = (grow >= 0) & (grow < m_total)
            # lane slab position is the row's phase i_n (matches _pack_rhs;
            # the s rows of a group cover each phase exactly once)
            slabs[plan.i_n[r]] = jnp.where(valid, sl, 0)
        lhs = jnp.concatenate(slabs, axis=1).astype(xt.dtype)  # [TMa, 128]
        acc = acc + jnp.dot(
            lhs, rhs_ref[g], preferred_element_type=jnp.float32
        )

    # per-phase sublane shift, stored straight into the output lane slab —
    # a lane-concat of differently-shifted slices is not lowerable (Mosaic
    # requires matching sublane offsets across concat inputs), but ref
    # stores relayout freely
    for j in range(s):
        off = d_max - plan.delta_j[j]
        out_ref[0, :, j * c : (j + 1) * c] = acc[
            off : off + tm, j * c : (j + 1) * c
        ].astype(out_ref.dtype)


def _forward(x_blocked, kernel, d, padding, s, interpret=False):
    b, m, lanes = x_blocked.shape
    k = kernel.shape[0]
    plan = _make_plan(k, d, s, padding)
    rhs = _pack_rhs(kernel, plan)

    # ceil-div grid: Mosaic pads ragged trailing input blocks and masks
    # trailing stores; rows beyond m load garbage but every lattice read is
    # already masked by its GLOBAL row index against m_total, so ragged M
    # (the production s=2 tail level is M=40968) needs no host-side padding
    tm = next((c for c in (1024, 512, 256, 128) if m >= c), m)
    n_tiles = -(-m // tm)

    body = functools.partial(_kernel_body, plan=plan, tm=tm)
    grid = (b, n_tiles)

    def x_spec(shift):
        def idx(bi, ti, *_):
            t = jnp.clip(ti + shift, 0, n_tiles - 1)
            return (bi, t, 0)

        return pl.BlockSpec((1, tm, LANES), idx, memory_space=pltpu.VMEM)

    return pl.pallas_call(
        body,
        grid=grid,
        in_specs=[
            x_spec(-1),
            x_spec(0),
            x_spec(1),
            pl.BlockSpec(
                (plan.groups, LANES, LANES),
                lambda bi, ti: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tm, LANES), lambda bi, ti: (bi, ti, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, m, LANES), x_blocked.dtype),
        interpret=interpret,
    )(x_blocked, x_blocked, x_blocked, rhs, jnp.array([m], jnp.int32))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def blockconv1d_dense(x_blocked, kernel, d, padding, s):
    """Dense-packed block-space dilated conv; exact same math as
    layers.conv1d_rechanneled_pre (the taps' products are identical, the
    structured zeros are simply never multiplied).

    x_blocked: [B, M, s*C] with s*C == 128; kernel: [k, C, C] (WIO).
    """
    return _forward(x_blocked, kernel, d, padding, s)


def _fwd(x_blocked, kernel, d, padding, s):
    return blockconv1d_dense(x_blocked, kernel, d, padding, s), (
        x_blocked,
        kernel,
    )


def _bwd(d, padding, s, res, g):
    # gradients through the exact XLA block-conv formulation — identical
    # math, and the training paths (stage-3 CLAP differentiates the
    # vocoder) keep their measured XLA backward
    from consistencytta_tpu.nn.layers import conv1d_rechanneled_pre

    x_blocked, kernel = res
    _, vjp = jax.vjp(
        lambda xb, kk: conv1d_rechanneled_pre(xb, kk, d, padding, s),
        x_blocked,
        kernel,
    )
    return vjp(g)


blockconv1d_dense.defvjp(_fwd, _bwd)


def blockconv1d_dense_supported(
    k: int, d: int, s: int, c_in: int, c_out: int, m: int
) -> bool:
    """The dense packing beats the XLA block-sparse conv only when the
    dilation spreads taps across blocks (d > 1; at d == 1 XLA's kernel is
    already near-dense) and the geometry matches the vocoder s=2 tail
    level. Measured A/B at B=32, M=20480 (the production C=64 level): the
    6-conv resblock chain drops 31.9 -> 13.5 ms (2.37x). At s=4 (C=32) the
    kernel is 2.7x SLOWER: XLA's baseline there has 4x fewer FLOPs and the
    32-lane slab slices + 4 rolls dominate — keep XLA for s != 2."""
    return (
        d > 1
        and s == 2
        and math.gcd(d, s) == 1
        and c_in == c_out
        and s * c_in == LANES
        and m >= 128
    )
