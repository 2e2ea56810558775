"""Pallas TPU kernels for the hot data-movement primitives.

Role parity: the SIMD inner loops of the reference (HashTable tag probes,
PrefixSort, BitPackDecoder) — here the counting-sort rank/histogram pass,
which backs radix sort, radix partition (exchange bucketize), and the
sorted-join build.

The XLA fallback in exec/sort.py materializes a (radix, N) one-hot + cumsum
in HBM per pass; this kernel keeps everything in VMEM, looping over
BLOCK-row blocks inside ONE program: each block builds its (BLOCK, RADIX)
one-hot and computes an inclusive prefix with log2(BLOCK) roll-adds,
carrying per-digit running totals across blocks.

The kernel emits within-CALL ranks plus per-digit totals; batches larger
than one call's VMEM budget are split into sub-calls and recombined with
int32 XLA glue (global digit base + per-sub offsets) — so arbitrarily
large batches use the kernel, and the f32 in-kernel counts stay exact
(< 2^24 per sub).

The kernel is deliberately GRID-FREE: this environment's remote AOT
compiler crashes on any pallas_call with an explicit grid (verified with a
trivial *2 kernel: no-grid compiles, grid=(1,) crashes), and DMA inside
in-kernel fori loops breaks this jax version's Mosaic lowering under x64
(RecursionError / i64 memref indices) — so no in-kernel DMA either. f32
MXU count matmuls use precision=HIGHEST (MXU rounds f32 to bf16 by
default). Falls back to pure XLA automatically off-TPU or on lowering
failure.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

TILE = 512          # kept for backward-compat in tests
BLOCK = 4096        # rows per in-kernel prefix block ((BLOCK, RADIX) f32
                    # one-hot = 4 MB VMEM; log2(BLOCK) roll-adds per block)
RADIX = 256
SUB_ROWS = 1 << 19  # per-call VMEM budget (digits+ranks + 2x block bufs)


def _radix_rank_kernel(n_blocks: int, dig_ref, rank_ref, tot_ref):
    import jax.lax as lax
    from jax.experimental.pallas import tpu as pltpu

    iota_d = lax.broadcasted_iota(jnp.int32, (BLOCK, RADIX), 1)
    rows = lax.broadcasted_iota(jnp.int32, (BLOCK, RADIX), 0)

    def prefix_incl(x):
        """Inclusive prefix sum along the BLOCK axis via log2(BLOCK)
        shift-adds over the whole (BLOCK, RADIX) one-hot at once —
        every roll-add touches BLOCK*RADIX lanes, so the VPU stays busy
        (the earlier per-512-row-tile serial loop ran ~400x below
        roofline; pallas has no cumsum lowering)."""
        r = x
        k = 1
        while k < BLOCK:
            # shift must be i32: x64 promotes Python ints to i64, which
            # tpu.dynamic_rotate rejects
            shifted = jnp.where(rows >= k,
                                pltpu.roll(r, jnp.int32(k), 0), 0.0)
            r = r + shifted
            k *= 2
        return r

    # per-block rank within (digit, this call); running per-digit offsets
    # carried across blocks
    def r_body(t, running):
        d = dig_ref[t, :]
        onehot = (d[:, None] == iota_d).astype(jnp.float32)
        ranks = prefix_incl(onehot)
        row_rank = jnp.sum(onehot * ranks, axis=1) - 1.0
        row_base = jnp.sum(onehot * running[None, :], axis=1)
        rank_ref[t, :] = (row_base + row_rank).astype(jnp.int32)
        return running + ranks[BLOCK - 1, :]

    totals = jax.lax.fori_loop(0, n_blocks, r_body,
                               jnp.zeros((RADIX,), jnp.float32))
    tot_ref[0, :] = totals.astype(jnp.int32)


def _radix_hist_kernel(n_blocks: int, dig_ref, tot_ref):
    import jax.lax as lax

    iota_d = lax.broadcasted_iota(jnp.int32, (BLOCK, RADIX), 1)

    def body(t, acc):
        d = dig_ref[t, :]
        onehot = (d[:, None] == iota_d).astype(jnp.float32)
        return acc + jnp.sum(onehot, axis=0)

    totals = jax.lax.fori_loop(0, n_blocks, body,
                               jnp.zeros((RADIX,), jnp.float32))
    tot_ref[0, :] = totals.astype(jnp.int32)


@functools.partial(jax.jit, static_argnums=(1, 2))
def _radix_hist_call(digits: jnp.ndarray, n_blocks: int,
                     interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    tot = pl.pallas_call(
        functools.partial(_radix_hist_kernel, n_blocks),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, RADIX), jnp.int32),
        interpret=interpret,
    )(digits.reshape(n_blocks, BLOCK))
    return tot[0]


def _radix_pos_kernel(n_blocks: int, base_ref, dig_ref, pos_ref):
    """Like the rank kernel but the per-digit BASE comes in as an input
    and is applied in-kernel (via the one-hot the kernel already holds),
    so the caller does ZERO N-sized XLA gathers — XLA:TPU gathers run at
    ~7 ms per million elements (measured), which made base[digit] lookups
    the dominant cost of a radix pass."""
    import jax.lax as lax
    from jax.experimental.pallas import tpu as pltpu

    iota_d = lax.broadcasted_iota(jnp.int32, (BLOCK, RADIX), 1)
    rows = lax.broadcasted_iota(jnp.int32, (BLOCK, RADIX), 0)

    def prefix_incl(x):
        r = x
        k = 1
        while k < BLOCK:
            shifted = jnp.where(rows >= k,
                                pltpu.roll(r, jnp.int32(k), 0), 0.0)
            r = r + shifted
            k *= 2
        return r

    def r_body(t, running):
        d = dig_ref[t, :]
        onehot = (d[:, None] == iota_d).astype(jnp.float32)
        ranks = prefix_incl(onehot)
        row_rank = jnp.sum(onehot * ranks, axis=1) - 1.0
        row_base = jnp.sum(onehot * running[None, :], axis=1)
        pos_ref[t, :] = (row_base + row_rank).astype(jnp.int32)
        return running + ranks[BLOCK - 1, :]

    jax.lax.fori_loop(0, n_blocks, r_body,
                      base_ref[0, :].astype(jnp.float32))


@functools.partial(jax.jit, static_argnums=(2, 3))
def _radix_pos_call(digits: jnp.ndarray, base_vec: jnp.ndarray,
                    n_blocks: int, interpret: bool = False):
    """Final positions for this sub-call: base_vec[d] + rank-in-sub."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    pos = pl.pallas_call(
        functools.partial(_radix_pos_kernel, n_blocks),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_blocks, BLOCK), jnp.int32),
        interpret=interpret,
    )(base_vec.reshape(1, RADIX).astype(jnp.int32),
      digits.reshape(n_blocks, BLOCK))
    return pos.reshape(-1)


def radix_pass_positions_nogather(digits: jnp.ndarray, capacity: int,
                                  interpret: bool = False):
    """Counting-sort destinations with NO N-sized XLA gathers: per-sub
    histograms -> tiny (S, RADIX) bases in XLA -> position kernel applies
    base + rank via its in-kernel one-hot."""
    digits = digits.astype(jnp.int32)
    sub = min(SUB_ROWS, -(-capacity // BLOCK) * BLOCK)
    n_subs = -(-capacity // sub)
    padded = n_subs * sub
    if padded != capacity:
        digits = jnp.concatenate([
            digits, jnp.full((padded - capacity,), RADIX - 1, jnp.int32)])
    hists = [
        _radix_hist_call(digits[s * sub:(s + 1) * sub], sub // BLOCK,
                         interpret)
        for s in range(n_subs)]
    tot = jnp.stack(hists)
    col = jnp.sum(tot, axis=0)
    gbase = jnp.cumsum(col) - col
    sub_off = jnp.cumsum(tot, axis=0) - tot
    pos = [
        _radix_pos_call(digits[s * sub:(s + 1) * sub],
                        gbase + sub_off[s], sub // BLOCK, interpret)
        for s in range(n_subs)]
    return jnp.concatenate(pos)[:capacity]


@functools.partial(jax.jit, static_argnums=(1, 2))
def _radix_rank_call(digits: jnp.ndarray, n_blocks: int,
                     interpret: bool = False):
    """(ranks, totals) for one sub-call. digits: (n_blocks*BLOCK,) int32
    in [0, RADIX). ranks[i] = #earlier rows in THIS call with the same
    digit; totals[d] = digit count in this call."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dig2 = digits.reshape(n_blocks, BLOCK)
    rank, tot = pl.pallas_call(
        functools.partial(_radix_rank_kernel, n_blocks),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((n_blocks, BLOCK), jnp.int32),
                   jax.ShapeDtypeStruct((1, RADIX), jnp.int32)),
        interpret=interpret,
    )(dig2)
    return rank.reshape(-1), tot[0]


_disabled = False


def should_use(capacity: int = 0) -> bool:
    """Use the Pallas path? (TPU backend, not disabled by a lowering
    failure or the process flag; any capacity — large batches split
    into sub-calls.)"""
    from velox_tpu.common.flags import get_flag
    return (not _disabled) and get_flag("pallas_enabled") \
        and jax.default_backend() == "tpu"


def disable():
    global _disabled
    _disabled = True


def radix_pass_positions(digits: jnp.ndarray, capacity: int,
                         interpret: bool = False):
    """Stable counting-sort destinations for one 8-bit pass.

    Splits into <= SUB_ROWS sub-calls of the rank kernel and combines:
      pos = global_base[d] + offset_of_sub_in_digit[s, d] + rank_in_sub

    Padding digits get RADIX-1 and trail every real row in row order, so
    real-row positions are always < capacity.
    """
    digits = digits.astype(jnp.int32)
    sub = min(SUB_ROWS, -(-capacity // BLOCK) * BLOCK)
    n_subs = -(-capacity // sub)
    padded = n_subs * sub
    if padded != capacity:
        digits = jnp.concatenate([
            digits, jnp.full((padded - capacity,), RADIX - 1, jnp.int32)])
    ranks, totals = [], []
    for s in range(n_subs):
        r, t = _radix_rank_call(digits[s * sub:(s + 1) * sub],
                                sub // BLOCK, interpret)
        ranks.append(r)
        totals.append(t)
    tot = jnp.stack(totals)                      # (S, RADIX) int32
    col = jnp.sum(tot, axis=0)
    gbase = jnp.cumsum(col) - col                # (RADIX,)
    sub_off = jnp.cumsum(tot, axis=0) - tot      # (S, RADIX)
    pos = [gbase[digits[s * sub:(s + 1) * sub]]
           + sub_off[s][digits[s * sub:(s + 1) * sub]]
           + ranks[s]
           for s in range(n_subs)]
    return jnp.concatenate(pos)[:capacity].astype(jnp.int32)


# ---------------------------------------------------------------------------
# Flat gather: out[i] = data[idx[i]] without XLA's TPU gather lowering.
#
# XLA:TPU gathers measured ~7.4 ms/M elements (int64 ~15) — the dominant
# cost of sort/join payload permutation (VERDICT r2 #1). This kernel
# reshapes data to (R, 128) lanes and decomposes idx into (row, lane):
#     out2d[i, k] = data2d[row[i, k], lane[i, k]]
# For each static lane shift s, jnp.roll(data2d, -s, axis=1) brings lane
# (k+s)%128 to output lane k; a per-lane 2D take_along_axis over axis 0
# (the ONE gather form this environment's Mosaic lowers; see module
# docstring) picks the rows, and a mask accumulates the lanes where
# (lane-k)%128 == s. 128 static steps, all VPU-vectorized, no HBM
# round-trips. Grid-free like every kernel here: data + idx + out must
# fit VMEM, so callers split into sub-calls.
# ---------------------------------------------------------------------------

GATHER_LANES = 128
GATHER_SUB = 1 << 16       # output elements per call (out + rolled data
                           # + masks stay under the VMEM budget)
GATHER_MAX_DATA = 1 << 20  # data elements per call (4 MB f32/i32 VMEM)


def _flat_gather_kernel(n_data_rows: int, data_ref, row_ref, lane_ref,
                        out_ref):
    import jax.lax as lax

    data2d = data_ref[...]            # (R, 128)
    row = row_ref[...]                # (M, 128) int32
    lane = lane_ref[...]              # (M, 128) int32
    m = row.shape[0]
    k = lax.broadcasted_iota(jnp.int32, (m, GATHER_LANES), 1)
    shift = lane - k
    shift = jnp.where(shift < 0, shift + GATHER_LANES, shift)
    acc = jnp.zeros((m, GATHER_LANES), data2d.dtype)
    for s in range(GATHER_LANES):
        rolled = jnp.concatenate(
            [data2d[:, s:], data2d[:, :s]], axis=1) if s else data2d
        got = jnp.take_along_axis(rolled, row, axis=0)
        acc = jnp.where(shift == s, got, acc)
    out_ref[...] = acc


def _flat_gather_call(data2d, row, lane, interpret=False):
    from jax.experimental import pallas as pl
    m = row.shape[0]
    return pl.pallas_call(
        functools.partial(_flat_gather_kernel, data2d.shape[0]),
        out_shape=jax.ShapeDtypeStruct((m, GATHER_LANES), data2d.dtype),
        interpret=interpret,
    )(data2d, row, lane)


def flat_gather(data: jnp.ndarray, idx: jnp.ndarray,
                interpret: bool = False) -> jnp.ndarray:
    """out[i] = data[idx[i]] for 32-bit data via the lane-roll kernel.
    idx must be int32 in [0, len(data)). Splits both the output and the
    data into VMEM-sized sub-calls (data sub-ranges pre-filtered by idx
    range is NOT done — callers with > GATHER_MAX_DATA data fall back)."""
    n = data.shape[0]
    if n > GATHER_MAX_DATA:
        return data[idx]
    m = idx.shape[0]
    rpad = -n % GATHER_LANES
    if rpad:
        data = jnp.concatenate(
            [data, jnp.zeros((rpad,), data.dtype)])
    data2d = data.reshape((-1, GATHER_LANES))
    mpad = -m % GATHER_LANES
    if mpad:
        idx = jnp.concatenate([idx, jnp.zeros((mpad,), jnp.int32)])
    idx2d = idx.reshape((-1, GATHER_LANES)).astype(jnp.int32)
    row = idx2d // GATHER_LANES
    lane = idx2d - row * GATHER_LANES
    sub = GATHER_SUB // GATHER_LANES
    outs = []
    for s in range(0, row.shape[0], sub):
        outs.append(_flat_gather_call(
            data2d, row[s:s + sub], lane[s:s + sub], interpret))
    out = jnp.concatenate(outs).reshape((-1,))
    return out[:m]
