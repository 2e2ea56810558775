"""Pallas TPU kernels for the hot data-movement primitives.

Role parity: the SIMD inner loops of the reference (HashTable tag probes,
PrefixSort, BitPackDecoder) — here the counting-sort rank/histogram pass,
which backs radix sort, radix partition (exchange bucketize), and join CSR
construction.

The XLA fallback in exec/sort.py materializes a (radix, N) one-hot + cumsum
in HBM per pass; this kernel keeps everything in VMEM, looping over row
tiles inside ONE program:

  phase 1: per-tile one-hot -> digit totals (accumulated in the loop carry)
  glue:    global exclusive digit bases via a strict-lower-triangular MXU
           matmul (pallas has no cumsum lowering)
  phase 2: per-tile rank via a lower-triangular MXU matmul + running
           per-digit tile offsets carried across the loop

The kernel is deliberately GRID-FREE: this environment's remote AOT
compiler crashes on any pallas_call with an explicit grid (verified with a
trivial *2 kernel: no-grid compiles, grid=(1,) crashes), so the whole batch
lives in VMEM (int32 digits + positions = 8 B/row -> ~1.5M rows max; larger
batches fall back to the XLA path). f32 MXU counts are exact below 2^24
rows. Falls back to pure XLA automatically off-TPU or on lowering failure.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

TILE = 512
RADIX = 256
MAX_ROWS = 1 << 20  # VMEM budget bound for the grid-free kernel


def _radix_kernel(n_tiles: int, dig_ref, pos_ref):
    import jax.lax as lax

    iota_tr = lax.broadcasted_iota(jnp.int32, (TILE, RADIX), 1)
    r512 = lax.broadcasted_iota(jnp.int32, (TILE, TILE), 0)
    c512 = lax.broadcasted_iota(jnp.int32, (TILE, TILE), 1)
    tri_incl = (c512 <= r512).astype(jnp.float32)  # inclusive prefix
    r256 = lax.broadcasted_iota(jnp.int32, (RADIX, RADIX), 0)
    c256 = lax.broadcasted_iota(jnp.int32, (RADIX, RADIX), 1)
    tri_strict = (r256 < c256).astype(jnp.float32)  # exclusive over digits

    def onehot_at(t):
        d = dig_ref[t, :]
        return (d[:, None] == iota_tr).astype(jnp.float32)

    # phase 1: digit totals
    def h_body(t, acc):
        return acc + jnp.sum(onehot_at(t), axis=0)

    totals = jax.lax.fori_loop(
        0, n_tiles, h_body, jnp.zeros((RADIX,), jnp.float32))
    # exclusive prefix over digits: base[d] = sum_{d' < d} totals[d'].
    # precision=HIGHEST: the MXU rounds f32 inputs to bf16 by default,
    # which corrupts counts > 256 (one-hot matmuls are exact at any
    # precision; this one has non-binary inputs).
    base = jnp.dot(totals[None, :], tri_strict,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)[0]

    # phase 2: per-row positions; running per-digit offsets in the carry
    def r_body(t, running):
        onehot = onehot_at(t)
        ranks = jnp.dot(tri_incl, onehot,
                        preferred_element_type=jnp.float32)
        row_rank = jnp.sum(onehot * ranks, axis=1) - 1.0
        base_t = base + running
        row_base = jnp.sum(onehot * base_t[None, :], axis=1)
        pos_ref[t, :] = (row_base + row_rank).astype(jnp.int32)
        return running + jnp.sum(onehot, axis=0)

    jax.lax.fori_loop(0, n_tiles, r_body,
                      jnp.zeros((RADIX,), jnp.float32))


@functools.partial(jax.jit, static_argnums=(1, 2))
def _radix_pass_positions(digits: jnp.ndarray, n_tiles: int,
                          interpret: bool = False):
    """positions[i] = final index of row i for one stable 8-bit counting
    pass. digits: (n_tiles*TILE,) int32 in [0, RADIX)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dig2 = digits.reshape(n_tiles, TILE)
    pos = pl.pallas_call(
        functools.partial(_radix_kernel, n_tiles),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, TILE), jnp.int32),
        interpret=interpret,
    )(dig2)
    return pos.reshape(-1)


_disabled = False


def should_use(capacity: int = 0) -> bool:
    """Use the Pallas path? (TPU backend, fits VMEM, not disabled.)"""
    return (not _disabled) and capacity <= MAX_ROWS \
        and jax.default_backend() == "tpu"


def disable():
    global _disabled
    _disabled = True


def radix_pass_positions(digits: jnp.ndarray, capacity: int,
                         interpret: bool = False):
    """Pad to a tile multiple and compute stable counting-sort positions
    for one 8-bit pass. Padding digits get RADIX-1 so they land past the
    real rows (positions of real rows are always < capacity)."""
    n_tiles = -(-capacity // TILE)
    padded = n_tiles * TILE
    if padded != capacity:
        digits = jnp.concatenate([
            digits.astype(jnp.int32),
            jnp.full((padded - capacity,), RADIX - 1, jnp.int32)])
    return _radix_pass_positions(digits.astype(jnp.int32), n_tiles,
                                 interpret)[:capacity]
