"""Fused Pallas MRF level for the HiFi-GAN tail (mel -> waveform hot path).

One HiFi-GAN upsample level runs x through 3 multi-dilation ResBlocks and
averages them (reference audioldm/hifigan/models.py:100-112): 18 convs, 36
leaky_relus, 3 residual chains, one mean. On the 128-lane levels
(C=128 s=1, C=64 s=2, C=32 s=4 in space-to-depth block space, nn/layers.py)
XLA runs each conv as its own HBM pass: measured in-situ (PERF.md round-4),
the C=64 level costs 39.6 ms at batch 32 against a ~14 ms matmul floor —
the level is BANDWIDTH-bound, ~26 ms of it pure memory traffic, and any
per-conv Pallas kernel makes it worse by breaking XLA's relu/residual
fusion (+18-22 ms measured for the gated per-conv dispatch).

This kernel fuses the ENTIRE level into one pallas_call: each grid step
loads a [TM, 128] tile (plus halo via the prev/next tiles), runs all 18
convs as tap-sum matmuls on VMEM-resident extended tiles, applies relus /
residual adds / the 3-way average in VMEM, and writes the tile once. HBM
traffic per level drops from ~20 full passes to 2.

Exact math: each conv is the SAME block-sparse tap-sum XLA computes
(layers._rechannel_plan packing — identical products, identical fp32
accumulation, bf16 rounding points at conv outputs and bias adds), and
out-of-signal rows are re-zeroed after every conv, reproducing per-conv
zero padding at the signal boundaries. The chain runs on shrinking
extents: a conv with halo h consumes extent E and produces E - 2h, so
every produced row has its full receptive field resident; per-resblock
extents start at TM + 2*H_k and end at exactly TM.

Forward-only Pallas: the custom VJP differentiates the plain XLA
formulation (plain_mrf_level), so training paths that backprop the
vocoder (stage-3 CLAP loss) keep their measured XLA backward.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


# dense phase-lattice packing for the s=2 dilated convs (the same math as
# ops/pallas_blockconv.py, folded into the fused level): measured A/B on
# hardware, the block-sparse tap-sum spends most of its time on unaligned
# sublane slices + structured-zero matmuls; the dense grouping halves both
DENSE_S2 = True
# experiment toggle: also dense-group the d=1 convs (saves 1-2 tap matmuls
# per conv for 2 rolls + a lane blend) — plans are lru-cached per process,
# so this is a process-start switch, not a runtime one
_DENSE_MIN_D = 1 if os.environ.get("CTTA_MRF_DENSE_D1") else 2
# experiment toggle: dense-group the s=4 level too (k=11 d=5 drops from
# 15 block-sparse taps to 4 dense groups; all its dilations are coprime
# with 4). Off by default pending hardware A/B.
_DENSE_S = (2, 4) if os.environ.get("CTTA_MRF_DENSE_S4") else (2,)


class _ConvPlan(NamedTuple):
    tap_start: int  # row offset into the stacked rhs
    n_taps: int     # taps (sparse mode) or groups (dense mode)
    h: int          # symmetric halo blocks each side
    stride: int     # row step between taps (d at s == 1, else 1)
    dense: bool = False
    d: int = 1                         # dilation (dense: group row step)
    d_max: int = 0                     # max per-phase output block shift
    t_r: Tuple[int, ...] = ()          # lattice row offset, r < s
    i_r: Tuple[int, ...] = ()          # lane phase of lattice row r
    delta_j: Tuple[int, ...] = ()      # output block shift per phase j


class _LevelPlan(NamedTuple):
    s: int
    tm: int
    h: int                                  # max per-resblock chain halo
    ext: int                                # tm + 2*h
    h_k: Tuple[int, ...]                    # per-resblock chain halo
    convs: Tuple[Tuple[_ConvPlan, ...], ...]  # [resblock][conv in chain order]
    n_taps_total: int


def _conv_geometry(k: int, d: int, s: int) -> Tuple[int, int, int]:
    """(n_taps, halo, tap_stride) of the block-space same-length conv. The
    HiFi-GAN geometry (p = d*(k-1)/2, odd k) always yields a symmetric tap
    window: ceil(p/s) blocks of halo each side. At s == 1 the k true taps
    sit d rows apart — tap_stride d avoids materializing the (k-1)*d+1
    zero-padded window XLA's rhs_dilation handles implicitly."""
    from consistencytta_tpu.nn.layers import _rechannel_plan

    p = d * (k - 1) // 2
    if s == 1:
        return k, p, d
    tmin, tmax, _ = _rechannel_plan(k, d, p, s)
    if -tmin != tmax:
        raise ValueError(f"asymmetric tap window for {k=} {d=} {s=}")
    return tmax - tmin + 1, tmax, 1


def _dense_geometry(k: int, d: int, s: int):
    """Phase-lattice grouping of the block-space dilated conv (the
    ops/pallas_blockconv.py packing): for gcd(d, s) == 1 every output phase
    j shares one tap lattice u_n = n*d - p shifted by m_j (the smallest
    m >= 0 with m*d ≡ j mod s), so the s phases of a block row are ONE
    dense [*, 128] @ [128, 128] matmul per group of s lattice rows.
    Returns (groups, d_max, t_r, i_r, delta_j)."""
    import math

    if math.gcd(d, s) != 1:
        raise ValueError(f"dense grouping needs gcd(d, s) == 1, got {d=} {s=}")
    p = d * (k - 1) // 2
    m_j = [next(m for m in range(s) if (m * d - j) % s == 0) for j in range(s)]
    delta_j = tuple((m * d - j) // s for j, m in enumerate(m_j))
    groups = -(-(k + max(m_j)) // s)
    t_r = tuple((r * d - p) // s for r in range(s))
    i_r = tuple((r * d - p) % s for r in range(s))
    return groups, max(delta_j), t_r, i_r, delta_j


@functools.lru_cache(maxsize=None)
def _make_level_plan(
    kernel_sizes: Tuple[int, ...],
    dilations: Tuple[Tuple[int, ...], ...],
    s: int,
    tm: int,
) -> _LevelPlan:
    convs = []
    h_k = []
    tap_start = 0
    for k, ds in zip(kernel_sizes, dilations):
        chain = []
        hk = 0
        for d in ds:
            for dd in (d, 1):  # convs1_i (dilated) then convs2_i (d=1)
                n, h, stride = _conv_geometry(k, dd, s)
                if DENSE_S2 and s in _DENSE_S and dd >= _DENSE_MIN_D:
                    g, d_max, t_r, i_r, delta_j = _dense_geometry(k, dd, s)
                    chain.append(_ConvPlan(
                        tap_start, g, h, 1, dense=True, d=dd, d_max=d_max,
                        t_r=t_r, i_r=i_r, delta_j=delta_j,
                    ))
                    tap_start += g
                else:
                    chain.append(_ConvPlan(tap_start, n, h, stride))
                    tap_start += n
                hk += h
        convs.append(tuple(chain))
        h_k.append(hk)
    h = max(h_k)
    return _LevelPlan(
        s, tm, h, tm + 2 * h, tuple(h_k), tuple(convs), tap_start
    )


def _pack_tap_rhs(kernel: jax.Array, d: int, s: int) -> jax.Array:
    """Stack the block-sparse packed kernel rows [n_taps, 128, 128] —
    exactly layers.conv1d_rechanneled_pre's kp (same products, same
    structured zeros; the fusion win is memory traffic, not FLOPs)."""
    from consistencytta_tpu.nn.layers import _rechannel_plan

    k, c, _ = kernel.shape
    if s == 1:
        return kernel  # true taps, applied at stride d inside the kernel
    p = d * (k - 1) // 2
    tmin, tmax, entries = _rechannel_plan(k, d, p, s)
    kp = jnp.zeros((tmax - tmin + 1, s * c, s * c), kernel.dtype)
    for j, t, tt, i in entries:
        kp = kp.at[
            tt - tmin, i * c : (i + 1) * c, j * c : (j + 1) * c
        ].set(kernel[t])
    return kp


def _pack_dense_rhs(kernel: jax.Array, d: int, s: int) -> jax.Array:
    """Stack W taps into the dense [G, 128, 128] rhs of the phase-lattice
    grouping (mirrors pallas_blockconv._pack_rhs): lattice row n = g*s + r
    sits at lane-slab i_r (its own lane phase, so the LHS needs no lane
    permutation) and feeds output phase j with W[n - m_j] when in range."""
    k, c, _ = kernel.shape
    p = d * (k - 1) // 2
    m_j = [next(m for m in range(s) if (m * d - j) % s == 0) for j in range(s)]
    groups = -(-(k + max(m_j)) // s)
    kp = jnp.zeros((groups, s * c, s * c), kernel.dtype)
    for g in range(groups):
        for r in range(s):
            n = g * s + r
            i = (r * d - p) % s
            for j in range(s):
                t = n - m_j[j]
                if 0 <= t < k:
                    kp = kp.at[
                        g, i * c : (i + 1) * c, j * c : (j + 1) * c
                    ].set(kernel[t])
    return kp


def _kernel_body(
    x_prev, x_cur, x_next, rhs_ref, bias_ref, m_ref, out_ref, *, plan, slope,
    bf
):
    """bf = batch-fold factor. At bf > 1 the blocks are [TM, bf, 128]
    slices of the TRANSPOSED [M, B, 128] activation and are flattened
    in-VMEM to [TM*bf, 128] — a bitcast, because the block's minor dims
    (bf=8, 128) are exactly one native (8, 128) tile. Every m-row slice
    then lands at a multiple of bf=8 flat rows, i.e. SUBLANE-ALIGNED:
    the tap slices that dominate the bf=1 kernel's cost become free."""
    tm, h, ext = plan.tm, plan.h, plan.ext
    m_total = m_ref[0]
    tile = pl.program_id(1)

    if bf == 1:
        xt3 = jnp.concatenate([x_prev[0], x_cur[0], x_next[0]], axis=0)
        x_ext = xt3[(tm - h) * bf : (2 * tm + h) * bf]  # [EXT*bf, 128]
    else:
        # halo blocks are hb m-rows (hb >= h, hb | tm): fetching narrow
        # halo blocks instead of full neighbour tiles cuts input DMA from
        # 3x the activation to (tm + 2*hb)/tm of it
        hb = x_prev.shape[0]
        x_ext = jnp.concatenate(
            [
                x_prev[...].reshape(hb * bf, LANES)[(hb - h) * bf :],
                x_cur[...].reshape(tm * bf, LANES),
                x_next[...].reshape(hb * bf, LANES)[: h * bf],
            ],
            axis=0,
        )

    # validity of every extended row against the signal bounds — the same
    # mask implements (a) garbage halo rows at clipped edge tiles and
    # (b) per-conv zero padding for the chained convs
    grow = (
        tile * tm
        - h
        + jax.lax.broadcasted_iota(jnp.int32, (ext * bf, 1), 0) // bf
    )
    valid_ext = (grow >= 0) & (grow < m_total)
    x_ext = jnp.where(valid_ext, x_ext, 0)

    def lrelu(v):
        # compare in fp32 (Mosaic has no bf16 cmpf); the slope multiply
        # stays in the input dtype, matching the plain path's rounding
        return jnp.where(
            v.astype(jnp.float32) > 0, v, (v * slope).astype(v.dtype)
        )

    def conv_dense(v, cp: _ConvPlan, e_in: int):
        """Phase-lattice dense conv (pallas_blockconv packing, in-VMEM):
        roll v once per lattice-row phase so group g's LHS is the plain
        slice [g*d : g*d + e_acc] of a lane-blended tensor; each group is
        ONE dense matmul. Rolled reads wrap modulo e_in m-rows; wrapped
        rows only ever meet zero weight blocks (an entry used by phase j
        reads that phase's true receptive field, which the chain keeps
        resident), so the modular extension is exact for every used entry.
        All row arithmetic is in m-rows, scaled by bf at the slice sites
        (roll amounts stay multiples of bf, preserving batch alignment)."""
        e_out = e_in - 2 * cp.h
        e_acc = e_out + cp.d_max
        s_l = len(cp.t_r)
        c_l = LANES // s_l
        # tpu.roll lowers for 32-bit data only — roll in fp32, blend,
        # then cast the merged tensor back once for the MXU
        v32 = v.astype(jnp.float32)
        lane_phase = jax.lax.broadcasted_iota(
            jnp.int32, (e_in * bf, LANES), 1
        ) // c_l
        merged = None
        for r in range(s_l):
            rolled = pltpu.roll(
                v32, ((-(cp.h - cp.d_max + cp.t_r[r])) % e_in) * bf, axis=0
            )
            merged = rolled if merged is None else jnp.where(
                lane_phase == cp.i_r[r], rolled, merged
            )
        merged = merged.astype(v.dtype)
        # modular extension so the top group's slice stays in bounds
        pad = max(0, (cp.n_taps - 1) * cp.d + e_acc - e_in)
        if pad:
            merged = jnp.concatenate([merged, merged[: pad * bf]], axis=0)
        acc = jnp.zeros((e_acc * bf, LANES), jnp.float32)
        for g in range(cp.n_taps):
            acc = acc + jnp.dot(
                merged[g * cp.d * bf : (g * cp.d + e_acc) * bf],
                rhs_ref[cp.tap_start + g],
                preferred_element_type=jnp.float32,
            )
        # per-phase realignment: out row q of phase j is acc[q + dmax - Δj]
        out_phase = jax.lax.broadcasted_iota(
            jnp.int32, (e_out * bf, LANES), 1
        ) // c_l
        y = None
        for j, dj in enumerate(cp.delta_j):
            sl = acc[(cp.d_max - dj) * bf : (cp.d_max - dj + e_out) * bf]
            y = sl if y is None else jnp.where(out_phase == j, sl, y)
        return y

    def conv(v, cp: _ConvPlan, off: int, ci: int, e_in: int):
        """Tap-sum conv on m-extent e_in (v has e_in*bf flat rows),
        producing (e_in - 2h)*bf rows. `off` is v's m-row offset within
        the extended tile (for masking)."""
        e_out = e_in - 2 * cp.h
        if cp.dense:
            acc = conv_dense(v, cp, e_in)
        else:
            acc = jnp.zeros((e_out * bf, LANES), jnp.float32)
            for t in range(cp.n_taps):
                acc = acc + jnp.dot(
                    v[t * cp.stride * bf : (t * cp.stride + e_out) * bf],
                    rhs_ref[cp.tap_start + t],
                    preferred_element_type=jnp.float32,
                )
        y = acc.astype(v.dtype) + bias_ref[ci].astype(v.dtype)
        # re-zero out-of-signal rows: the next conv's zero padding
        return jnp.where(
            valid_ext[(off + cp.h) * bf : (off + cp.h + e_out) * bf], y, 0
        )

    acc_out = None
    ci = 0
    for rb, (chain, hk) in enumerate(zip(plan.convs, plan.h_k)):
        off = h - hk
        e = ext - 2 * off
        xb = x_ext[off * bf : (ext - off) * bf]
        for i in range(0, len(chain), 2):
            c1, c2 = chain[i], chain[i + 1]
            xt = lrelu(xb)
            xt = conv(xt, c1, off, ci, e)
            xt = lrelu(xt)
            xt = conv(xt, c2, off + c1.h, ci + 1, e - 2 * c1.h)
            ci += 2
            dh = c1.h + c2.h
            xb = xb[dh * bf : xb.shape[0] - dh * bf] + xt
            off += dh
            e -= 2 * dh
        acc_out = xb if acc_out is None else acc_out + xb
    y_out = (acc_out / len(plan.convs)).astype(out_ref.dtype)
    if bf == 1:
        out_ref[0] = y_out
    else:
        out_ref[...] = y_out.reshape(tm, bf, LANES)


def _forward(x_blocked, kernels, biases, kernel_sizes, dilations, s, slope,
             interpret=False, force_bf=None):
    b, m, lanes = x_blocked.shape
    if lanes != LANES:
        raise ValueError(f"fused MRF level needs 128 lanes, got {lanes}")
    # batch-fold by 8 when possible: blocks become [TM, 8, 128] slices of
    # the TRANSPOSED [M, B, 128] view. Two wins (PERF.md round-4): (a) the
    # transpose is a BITCAST of the {2,0,1} layout XLA assigns the
    # neighbouring conv activations, so the custom-call boundary relayout
    # copies disappear; (b) in-kernel m-row slices scale by 8 flat rows,
    # i.e. every tap slice is sublane-aligned.
    bf = force_bf if force_bf is not None else (8 if b % 8 == 0 else 1)
    if bf > 1:
        # folded blocks are bf x larger; s=1's 126-tap rhs (4.1 MB) plus
        # tm=256 intermediates overflows the 16 MB scoped-vmem budget —
        # drop to tm=128 for tap-heavy plans (measured fine at 84/90 taps)
        probe = _make_level_plan(tuple(kernel_sizes),
                                 tuple(tuple(d) for d in dilations), s, 128)
        tiles = (256, 128) if probe.n_taps_total <= 100 else (128,)
    else:
        tiles = (1024, 512, 256, 128)
    tm = next((t for t in tiles if m >= t), m)
    plan = _make_level_plan(tuple(kernel_sizes),
                            tuple(tuple(d) for d in dilations), s, tm)
    n_tiles = -(-m // tm)

    flat_plan = [cp for chain in plan.convs for cp in chain]
    rhs = jnp.concatenate(
        [
            _pack_dense_rhs(kern, d, s) if cp.dense
            else _pack_tap_rhs(kern, d, s)
            for kern, d, cp in zip(
                kernels, _conv_dilation_order(dilations), flat_plan
            )
        ],
        axis=0,
    )
    bias_arr = jnp.stack([jnp.tile(bb, s) for bb in biases], axis=0)

    body = functools.partial(_kernel_body, plan=plan, slope=slope, bf=bf)

    if bf == 1:
        x_in = x_blocked
        out_shape = (b, m, LANES)

        def x_spec(shift):
            def idx(bi, ti, *_):
                return (bi, jnp.clip(ti + shift, 0, n_tiles - 1), 0)

            return pl.BlockSpec((1, tm, LANES), idx, memory_space=pltpu.VMEM)

        out_spec = pl.BlockSpec(
            (1, tm, LANES), lambda bi, ti: (bi, ti, 0),
            memory_space=pltpu.VMEM,
        )
    else:
        x_in = jnp.transpose(x_blocked, (1, 0, 2))
        out_shape = (m, b, LANES)
        # narrow halo blocks: smallest power-of-two >= halo (divides tm)
        hb = 8
        while hb < plan.h:
            hb *= 2
        n_hb = -(-m // hb)
        per = tm // hb

        def x_spec(shift):
            if shift == 0:
                return pl.BlockSpec(
                    (tm, bf, LANES),
                    lambda bi, ti: (ti, bi, 0),
                    memory_space=pltpu.VMEM,
                )
            if shift < 0:
                idx = lambda bi, ti: (jnp.maximum(ti * per - 1, 0), bi, 0)
            else:
                idx = lambda bi, ti: (
                    jnp.minimum(ti * per + per, n_hb - 1), bi, 0
                )
            return pl.BlockSpec((hb, bf, LANES), idx, memory_space=pltpu.VMEM)

        out_spec = pl.BlockSpec(
            (tm, bf, LANES), lambda bi, ti: (ti, bi, 0),
            memory_space=pltpu.VMEM,
        )

    out = pl.pallas_call(
        body,
        grid=(b // bf, n_tiles),
        in_specs=[
            x_spec(-1),
            x_spec(0),
            x_spec(1),
            pl.BlockSpec(
                (plan.n_taps_total, LANES, LANES),
                lambda bi, ti: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (len(biases), LANES),
                lambda bi, ti: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct(out_shape, x_blocked.dtype),
        interpret=interpret,
    )(x_in, x_in, x_in, rhs, bias_arr, jnp.array([m], jnp.int32))
    return out if bf == 1 else jnp.transpose(out, (1, 0, 2))


def _conv_dilation_order(dilations) -> Tuple[int, ...]:
    """Flat dilation sequence matching the kernels' chain order:
    per resblock, (d, 1) per dilation entry."""
    out = []
    for ds in dilations:
        for d in ds:
            out.extend((d, 1))
    return tuple(out)


def plain_mrf_level(
    x_blocked: jax.Array,
    kernels: Sequence[jax.Array],
    biases: Sequence[jax.Array],
    kernel_sizes: Sequence[int],
    dilations: Sequence[Sequence[int]],
    s: int,
    slope: float,
) -> jax.Array:
    """The literal XLA formulation of the level — 18 block-space convs with
    relus/residuals/average (reference models.py:20-63,100-112). Used as the
    fused kernel's backward and its parity oracle."""
    from consistencytta_tpu.nn.layers import conv1d_rechanneled_pre

    def conv(v, kern, bias, d, k):
        p = d * (k - 1) // 2
        if s > 1:
            y = conv1d_rechanneled_pre(v, kern, d, p, s)
            return y + jnp.tile(bias, s).astype(y.dtype)
        y = jax.lax.conv_general_dilated(
            v, kern, window_strides=(1,), padding=[(p, p)],
            rhs_dilation=(d,), dimension_numbers=("NWC", "WIO", "NWC"),
        )
        return y + bias.astype(y.dtype)

    dil_order = _conv_dilation_order(dilations)
    acc = None
    ci = 0
    for k, ds in zip(kernel_sizes, dilations):
        xb = x_blocked
        for _ in range(len(ds)):
            d1 = dil_order[ci]
            xt = jnp.where(xb > 0, xb, (xb * slope).astype(xb.dtype))
            xt = conv(xt, kernels[ci], biases[ci], d1, k)
            xt = jnp.where(xt > 0, xt, (xt * slope).astype(xt.dtype))
            xt = conv(xt, kernels[ci + 1], biases[ci + 1], 1, k)
            xb = xt + xb
            ci += 2
        acc = xb if acc is None else acc + xb
    return acc / len(kernel_sizes)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def fused_mrf_level(x_blocked, kernels, biases, kernel_sizes, dilations, s,
                    slope):
    """Fused-level forward. x_blocked: [B, M, 128] (block space for s > 1,
    plain [B, L, C=128] for s == 1). kernels: 18 [k, C, C] WIO trees in
    chain order (resblock-major, (dilated, d=1) per pair); biases: 18 [C].
    kernel_sizes/dilations: static tuples (e.g. (3, 7, 11) and
    ((1, 3, 5),) * 3); s: block factor with s * C == 128."""
    return _forward(x_blocked, list(kernels), list(biases),
                    tuple(kernel_sizes), tuple(tuple(d) for d in dilations),
                    s, slope)


def _fwd(x_blocked, kernels, biases, kernel_sizes, dilations, s, slope):
    out = fused_mrf_level(
        x_blocked, kernels, biases, kernel_sizes, dilations, s, slope
    )
    return out, (x_blocked, tuple(kernels), tuple(biases))


def _bwd(kernel_sizes, dilations, s, slope, res, g):
    x_blocked, kernels, biases = res
    _, vjp = jax.vjp(
        lambda xb, ks, bs: plain_mrf_level(
            xb, ks, bs, kernel_sizes, dilations, s, slope
        ),
        x_blocked,
        kernels,
        biases,
    )
    return vjp(g)


fused_mrf_level.defvjp(_fwd, _bwd)


def fused_mrf_supported(channels: int, s: int, m: int,
                        kernel_sizes, dilations, batch: int = 8) -> bool:
    """Gate: the fused kernel dispatches on the BLOCKED 128-lane levels
    (s > 1) when the batch folds by 8. The batch-folded kernel (bf=8,
    transposed-bitcast boundaries, sublane-aligned tap slices) measured
    -18.1 ms on the in-graph vocoder A/B at batch 32 (XLA 226.3 ->
    fused 208.1 ms, PERF.md round-4). The UNFOLDED variant (b % 8 != 0)
    measured a net LOSS in-graph: tpu_custom_call's default-layout
    operand constraint forces full-tensor relayout copies against the
    {2,0,1} layout XLA gives the neighbouring conv activations — so
    non-foldable batches stay on the XLA path. At s == 1 the kernel
    loses even standalone (17.73 vs 18.20 ms): XLA's rhs-dilated conv
    is already dense there. CTTA_DISABLE_FUSED_MRF is the A/B escape
    hatch."""
    import os

    if os.environ.get("CTTA_DISABLE_FUSED_MRF"):
        return False
    if batch % 8 != 0 and not os.environ.get("CTTA_ENABLE_FUSED_MRF"):
        return False
    try:
        tm = next((t for t in (1024, 512, 256, 128) if m >= t), None)
        if tm is None or channels * s != LANES or s == 1:
            return False
        plan = _make_level_plan(
            tuple(kernel_sizes), tuple(tuple(d) for d in dilations), s, tm
        )
    except (ValueError, TypeError):
        return False
    # halo must fit within one neighbouring tile
    return plan.h <= tm
