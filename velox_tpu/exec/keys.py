"""Normalized-key encoding for grouping, sorting, and joins.

Role parity: ``velox/exec/VectorHasher.h`` (value ids) + the normalized-key
machinery of PrefixSort (velox/exec/prefixsort/PrefixSortEncoder.h:31) and
HashTable's kNormalizedKey mode (velox/exec/HashTable.h:122).

TPU-first: every key column is mapped to an int64 whose ordering and
equality match the SQL semantics of the source type (order-preserving
bitcast for doubles, sorted-dictionary ids for strings, scaled ints for
decimals). Multi-key operators then run lexicographic ``lax.sort`` over the
normalized columns — XLA's sort is the TPU's radix/bitonic engine, so
velox's hand-written quicksort/probing has no analogue here.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from velox_tpu import types as T
from velox_tpu.expression.eval import EvalValue

INT64_MIN = np.int64(np.iinfo(np.int64).min)
INT64_MAX = np.int64(np.iinfo(np.int64).max)


def normalize_key(v: EvalValue, capacity: int):
    """Return (data_i64, null_flag) — order/equality-preserving int64.

    null_flag is a bool array (True = null) or None when no nulls.

    NOTE (TPU): f64 keys are NOT supported here — the f64->s64 bitcast is
    unimplemented in XLA:TPU's x64 rewriting. Sorting uses native-dtype
    operands instead (sort_operands); this normalization is for *join* keys,
    which are integral/string in practice.
    """
    data = v.full_data(capacity)
    dt = v.dtype
    if dt.is_floating:
        if dt.kind is T.TypeKind.REAL:
            bits = jax.lax.bitcast_convert_type(data, jnp.int32) \
                .astype(jnp.int64)
            key = jnp.where(bits >= 0, bits ^ jnp.int64(1 << 31), ~bits)
            key = jnp.where(data == 0, jnp.int64(1 << 31), key)
        else:
            raise NotImplementedError(
                "DOUBLE join keys: f64->s64 bitcast is unsupported on TPU; "
                "cast to DECIMAL/BIGINT first")
    elif dt.kind is T.TypeKind.BOOLEAN:
        key = data.astype(jnp.int64)
    else:
        key = data.astype(jnp.int64)
    null_flag = None
    if v.validity is not None:
        null_flag = ~v.full_validity(capacity)
    return key, null_flag


def _native_sort_key(v: EvalValue, capacity: int, descending: bool):
    """Order-preserving sort operand in a TPU-supported dtype.

    Integers/strings/bools use ints (bitwise-not for descending, which
    reverses order without overflow); floats stay in their native dtype
    (negated for descending; XLA's total-order comparator handles the rest).
    """
    data = v.full_data(capacity)
    dt = v.dtype
    if dt.is_floating:
        return jnp.negative(data) if descending else data
    if dt.kind is T.TypeKind.BOOLEAN:
        data = data.astype(jnp.int32)
        return ~data if descending else data
    if dt.is_string:
        data = data.astype(jnp.int32)
        return ~data if descending else data
    return ~data if descending else data


def sort_operands(
    keys: List[EvalValue],
    orders,
    capacity: int,
    active,
    nulls_exclude: bool = False,
):
    """Build lax.sort key operands: [active_key, k1_null, k1, k2_null, ...].

    `orders` is a list of SortOrder (or None for grouping, where only
    equality matters). Inactive rows always sort to the end.
    """
    from velox_tpu.core.plan import SortOrder

    ops = [(~active).astype(jnp.int32)]
    for i, v in enumerate(keys):
        order = orders[i] if orders is not None else None
        key = _native_sort_key(v, capacity, descending=(
            order is not None and not order.ascending))
        null_flag = (~v.full_validity(capacity)
                     if v.validity is not None else None)
        if null_flag is None:
            nf = jnp.zeros((capacity,), dtype=jnp.int32)
        else:
            nf = null_flag.astype(jnp.int32)
            # canonicalize null lanes so all nulls compare equal regardless
            # of the garbage their data lanes may hold
            key = jnp.where(null_flag, jnp.zeros_like(key), key)
        if order is not None and order.nulls_first:
            nf = -nf
        ops.append(nf)
        ops.append(key)
    return ops


def group_identity_diff(sorted_key_ops: List, capacity: int):
    """new_group flags from sorted key operands (excluding the active key).

    sorted_key_ops: the per-key (null_flag, key) pairs AFTER sorting.
    """
    first = jnp.zeros((capacity,), dtype=bool).at[0].set(True)
    diff = first
    for arr in sorted_key_ops:
        prev = jnp.concatenate([arr[:1], arr[:-1]])
        diff = diff | (arr != prev)
    return diff
