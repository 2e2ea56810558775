"""Pallas TPU kernels for the hot data-movement primitives.

Role parity: the SIMD inner loops of the reference (HashTable tag probes,
PrefixSort, BitPackDecoder) — here the counting-sort rank/histogram pass,
which backs radix sort, radix partition (exchange bucketize), and the
sorted-join build.

The XLA fallback in exec/sort.py materializes a (radix, N) one-hot + cumsum
in HBM per pass; this kernel keeps everything in VMEM, looping over row
tiles inside ONE program:

  phase 1: per-tile one-hot -> digit totals (accumulated in the loop carry)
  phase 2: per-tile rank via a lower-triangular MXU matmul + running
           per-digit tile offsets carried across the loop

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

TILE = 512
RADIX = 256
SUB_ROWS = 1 << 20  # per-call VMEM budget (digits+ranks = 8 B/row)


def _radix_rank_kernel(n_tiles: int, dig_ref, rank_ref, tot_ref):
    import jax.lax as lax
    from jax.experimental.pallas import tpu as pltpu

    iota_tr = lax.broadcasted_iota(jnp.int32, (TILE, RADIX), 1)
    rows = lax.broadcasted_iota(jnp.int32, (TILE, RADIX), 0)

    def onehot_at(t):
        d = dig_ref[t, :]
        return (d[:, None] == iota_tr).astype(jnp.float32)

    def prefix_incl(x):
        """Inclusive prefix sum along the TILE axis via log2(TILE)
        shift-adds (pallas has no cumsum lowering; this replaces the
        earlier (TILE,TILE)@(TILE,RADIX) triangular MXU matmul — ~50x
        fewer ops per tile and VPU-only)."""
        r = x
        k = 1
        while k < TILE:
            # shift must be i32: x64 would promote the Python int to i64,
            # which tpu.dynamic_rotate rejects
            shifted = jnp.where(rows >= k,
                                pltpu.roll(r, jnp.int32(k), 0), 0.0)
            r = r + shifted
            k *= 2
        return r

    # per-tile rank within (digit, this call); running per-digit offsets
    def r_body(t, running):
        onehot = onehot_at(t)
        ranks = prefix_incl(onehot)
        row_rank = jnp.sum(onehot * ranks, axis=1) - 1.0
        row_base = jnp.sum(onehot * running[None, :], axis=1)
        rank_ref[t, :] = (row_base + row_rank).astype(jnp.int32)
        return running + ranks[TILE - 1, :]

    totals = jax.lax.fori_loop(0, n_tiles, r_body,
                               jnp.zeros((RADIX,), jnp.float32))
    tot_ref[0, :] = totals.astype(jnp.int32)


@functools.partial(jax.jit, static_argnums=(1, 2))
def _radix_rank_call(digits: jnp.ndarray, n_tiles: int,
                     interpret: bool = False):
    """(ranks, totals) for one sub-call. digits: (n_tiles*TILE,) int32 in
    [0, RADIX). ranks[i] = #earlier rows in THIS call with the same digit;
    totals[d] = digit count in this call."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dig2 = digits.reshape(n_tiles, TILE)
    rank, tot = pl.pallas_call(
        functools.partial(_radix_rank_kernel, n_tiles),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((n_tiles, TILE), jnp.int32),
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
    sub = min(SUB_ROWS, -(-capacity // TILE) * TILE)
    n_subs = -(-capacity // sub)
    padded = n_subs * sub
    if padded != capacity:
        digits = jnp.concatenate([
            digits, jnp.full((padded - capacity,), RADIX - 1, jnp.int32)])
    ranks, totals = [], []
    for s in range(n_subs):
        r, t = _radix_rank_call(digits[s * sub:(s + 1) * sub],
                                sub // TILE, interpret)
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
