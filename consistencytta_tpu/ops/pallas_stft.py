"""Pallas TPU kernel: fused framed-matmul STFT magnitude.

The mel frontend's hot op is the framed DFT: overlapping frames (hop 160,
window 1024) times the windowed real-DFT basis. The XLA path (ops/stft.py)
materializes the overlapping frames in HBM — a 6.4x read amplification
(1024/160) before the matmul.

This kernel never materializes frames at all. The waveform is viewed as
hop-sized blocks; for frame f and chunk k (filter_len = n_chunks * hop,
zero-padded), the DFT factorizes as

    spec[f, :] = sum_k  block[f + k, :] @ basis[k*hop : (k+1)*hop, :]

so each (batch row, 128-frame tile) program DMAs its ~85 KB block span from
HBM into VMEM and runs n_chunks small MXU matmuls with fp32 accumulation —
frame extraction, DFT, and |re + i*im| fused in one pass. All slices are
static: no gather/scatter/reshape (Mosaic-lowering friendly).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _truncate_to_bf16_f32(x):
    """f32 -> f32 with the mantissa truncated to bf16 precision, via bit
    masking (immune to excess-precision elision)."""
    bits = pltpu.bitcast(x, jnp.uint32)
    return pltpu.bitcast(bits & jnp.uint32(0xFFFF0000), jnp.float32)


def _stft_kernel(
    wav_blocks_hbm,  # [B, total_blocks, hop_pad] in ANY/HBM (zero-padded lanes)
    basis_hi_ref,  # [n_chunks * hop_pad, 2 * n_bins] bf16 VMEM (hi split)
    basis_lo_ref,  # same shape, bf16 lo split
    out_ref,  # [1, TILE_F, n_bins] VMEM block
    scratch,  # [slice_blocks, hop] VMEM (8-aligned rows)
    sem,  # DMA semaphore
    *,
    hop_pad: int,
    n_chunks: int,
    tile_f: int,
    n_bins: int,
    slice_blocks: int,
):
    i = pl.program_id(0)
    j = pl.program_id(1)
    block_start = j * tile_f

    dma = pltpu.make_async_copy(
        wav_blocks_hbm.at[i, pl.ds(block_start, slice_blocks), :],
        scratch,
        sem,
    )
    dma.start()
    dma.wait()

    spec = jnp.zeros((tile_f, 2 * n_bins), jnp.float32)
    for k in range(n_chunks):
        # the padded lanes (hop..hop_pad) are zero on both operands, so the
        # full-width contraction equals the hop-width one.
        # fp32 fidelity on the bf16 MXU via the split trick. The split MUST
        # go through explicit mantissa masking: the toolchain compiles with
        # --xla_allow_excess_precision, which elides dtype-cast round trips
        # (x -> bf16 -> f32 folds to x) and silently zeroes the lo part.
        # The x_lo * b_lo cross term (~2^-16 relative) is dropped.
        a = scratch[k : k + tile_f, :]
        a_hi32 = _truncate_to_bf16_f32(a)
        a_hi = a_hi32.astype(jnp.bfloat16)  # exact: mantissa already bf16
        a_lo = (a - a_hi32).astype(jnp.bfloat16)
        b_hi = basis_hi_ref[k * hop_pad : (k + 1) * hop_pad, :]
        b_lo = basis_lo_ref[k * hop_pad : (k + 1) * hop_pad, :]
        spec += jnp.dot(a_hi, b_hi, preferred_element_type=jnp.float32)
        spec += jnp.dot(a_hi, b_lo, preferred_element_type=jnp.float32)
        spec += jnp.dot(a_lo, b_hi, preferred_element_type=jnp.float32)

    re = spec[:, :n_bins]
    im = spec[:, n_bins:]
    out_ref[0, :, :] = jnp.sqrt(re * re + im * im)


@functools.partial(jax.jit, static_argnames=("hop_length", "center_pad"))
def stft_magnitude_pallas(
    wav: jax.Array,
    cos_basis: jax.Array,
    sin_basis: jax.Array,
    hop_length: int,
    center_pad: int,
) -> jax.Array:
    """Drop-in replacement for ops.stft.stft_magnitude on TPU.

    wav: [B, T]; returns [B, n_frames, n_bins].
    """
    filter_len = cos_basis.shape[0]
    n_bins = cos_basis.shape[1]
    n_chunks = -(-filter_len // hop_length)  # cdiv
    hop_pad = -(-hop_length // 128) * 128  # lane-aligned block width

    # basis chunk k occupies rows [k*hop_pad, k*hop_pad + hop); the rest are
    # zero so the full-width contractions in the kernel are exact
    basis = jnp.concatenate([cos_basis, sin_basis], axis=1)
    basis = jnp.pad(basis, ((0, n_chunks * hop_length - filter_len), (0, 0)))
    basis = basis.reshape(n_chunks, hop_length, 2 * n_bins)
    basis = jnp.pad(basis, ((0, 0), (0, hop_pad - hop_length), (0, 0)))
    basis = basis.reshape(n_chunks * hop_pad, 2 * n_bins)
    # same masking-based split on the host-side basis (see kernel comment)
    basis_bits = jax.lax.bitcast_convert_type(basis, jnp.uint32)
    basis_hi32 = jax.lax.bitcast_convert_type(
        basis_bits & jnp.uint32(0xFFFF0000), jnp.float32
    )
    basis_hi = basis_hi32.astype(jnp.bfloat16)
    basis_lo = (basis - basis_hi32).astype(jnp.bfloat16)

    wav = wav.astype(jnp.float32)
    if center_pad:
        wav = jnp.pad(wav, ((0, 0), (center_pad, center_pad)), mode="reflect")

    b, padded_t = wav.shape
    n_frames = (padded_t - filter_len) // hop_length + 1

    tile_f = 128 if n_frames >= 128 else 8
    n_tiles = -(-n_frames // tile_f)
    padded_frames = n_tiles * tile_f
    # Mosaic requires 8-aligned DMA slice extents on the sublane dim
    slice_blocks = -(-(tile_f + n_chunks - 1) // 8) * 8
    total_blocks = padded_frames - tile_f + slice_blocks
    needed = total_blocks * hop_length
    if needed > padded_t:
        wav = jnp.pad(wav, ((0, 0), (0, needed - padded_t)))
    wav_blocks = wav[:, :needed].reshape(b, total_blocks, hop_length)
    wav_blocks = jnp.pad(
        wav_blocks, ((0, 0), (0, 0), (0, hop_pad - hop_length))
    )

    out = pl.pallas_call(
        functools.partial(
            _stft_kernel,
            hop_pad=hop_pad,
            n_chunks=n_chunks,
            tile_f=tile_f,
            n_bins=n_bins,
            slice_blocks=slice_blocks,
        ),
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # waveform stays in HBM
            pl.BlockSpec(
                (n_chunks * hop_pad, 2 * n_bins), lambda i, j: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (n_chunks * hop_pad, 2 * n_bins), lambda i, j: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_f, n_bins), lambda i, j: (i, j, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, padded_frames, n_bins), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((slice_blocks, hop_pad), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * padded_frames * filter_len * 2 * n_bins,
            bytes_accessed=4
            * (b * needed + n_chunks * hop_length * 2 * n_bins
               + b * padded_frames * n_bins),
            transcendentals=b * padded_frames * n_bins,
        ),
    )(wav_blocks, basis_hi, basis_lo)

    return out[:, :n_frames, :]
