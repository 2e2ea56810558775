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
    """
    data = v.full_data(capacity)
    dt = v.dtype
    if dt.is_floating:
        if dt.kind is T.TypeKind.REAL:
            bits = jax.lax.bitcast_convert_type(data, jnp.int32) \
                .astype(jnp.int64)
        else:
            bits = jax.lax.bitcast_convert_type(data, jnp.int64)
        # Monotone transform: flip sign bit for positives, all bits for
        # negatives -> total order matching float order (NaNs sort high).
        key = jnp.where(bits >= 0,
                        bits ^ INT64_MIN,
                        ~bits)
        # normalize negative zero to positive zero for equality
        key = jnp.where(data == 0, jnp.int64(0) ^ INT64_MIN, key)
    elif dt.kind is T.TypeKind.BOOLEAN:
        key = data.astype(jnp.int64)
    else:
        key = data.astype(jnp.int64)
    null_flag = None
    if v.validity is not None:
        null_flag = ~v.full_validity(capacity)
    return key, null_flag


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
        key, null_flag = normalize_key(v, capacity)
        order = orders[i] if orders is not None else None
        if order is not None and not order.ascending:
            key = ~key  # exact order reversal for int64
        if null_flag is None:
            nf = jnp.zeros((capacity,), dtype=jnp.int32)
        else:
            nf = null_flag.astype(jnp.int32)
            # canonicalize null lanes so all nulls compare equal regardless
            # of the garbage their data lanes may hold
            key = jnp.where(null_flag, jnp.int64(0), key)
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
