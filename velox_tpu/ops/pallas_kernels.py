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
    """Use the Pallas path? (TPU backend, not disabled; any capacity —
    large batches split into sub-calls.)"""
    return (not _disabled) and jax.default_backend() == "tpu"


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
