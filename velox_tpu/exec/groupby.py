"""Group-by core: sort + segment-reduce, plus the dense "array mode".

Role parity: ``velox/exec/GroupingSet.cpp`` + ``velox/exec/HashTable.cpp``
(groupProbe / kArray / kNormalizedKey / kHash modes, HashTable.h:122).

TPU-first redesign (SURVEY.md §7.1): instead of a probing hash table,
grouping is

  * **array mode** (parity: kArray, HashTable.h:119): when every key has a
    small known domain (dictionary-encoded strings, booleans), the group id
    is the mixed-radix combination of dictionary ids — a pure index — and
    aggregation is one ``segment_sum`` per state. No sort, no probe.
  * **sort mode** (parity: kNormalizedKey/kHash): normalize keys to int64,
    ``lax.sort`` rows by (active, keys...), detect group boundaries, and
    segment-reduce addends. Fully static shapes; group output lands densely
    in key-sorted order.

Both modes are pure traced JAX — one compiled program per (schema,
capacity). Partial/final split (velox AggregationNode steps) reuses the same
machinery: partial emits state columns; final re-groups state columns and
extracts results.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from velox_tpu import types as T
from velox_tpu.exec import keys as K
from velox_tpu.expression.eval import EvalValue

_SEGMENT_OPS = {
    "sum": jax.ops.segment_sum,
    "min": jax.ops.segment_min,
    "max": jax.ops.segment_max,
}


def array_mode_domain(keys: List[EvalValue]) -> Optional[int]:
    """Total combined domain if all keys are small-domain, else None.
    Parity: kArrayHashMaxSize cutoff (velox/exec/HashTable.h:119)."""
    total = 1
    for v in keys:
        if v.dtype.is_string and v.dictionary is not None:
            total *= max(1, len(v.dictionary))
        elif v.dtype.kind is T.TypeKind.BOOLEAN:
            total *= 2
        else:
            return None
        if v.validity is not None:
            total += 1  # null bucket handled by +1 radix; conservative
    return total if total <= (1 << 21) else None


def group_ids_array_mode(keys: List[EvalValue], capacity: int, active):
    """Mixed-radix dense group id per row. Returns (ids, num_groups)."""
    ids = jnp.zeros((capacity,), dtype=jnp.int32)
    domain = 1
    for v in keys:
        if v.dtype.is_string:
            card = max(1, len(v.dictionary))
        else:
            card = 2
        data = v.full_data(capacity).astype(jnp.int32)
        if v.dtype.kind is T.TypeKind.BOOLEAN:
            data = data.astype(jnp.int32)
        if v.validity is not None:
            # nulls get their own id = card (radix grows by 1)
            data = jnp.where(v.full_validity(capacity), data, card)
            card += 1
        ids = ids * card + data
        domain *= card
    return ids, domain


def reduce_array_mode(
    keys: List[EvalValue],
    addends: List[Tuple[jnp.ndarray, str]],
    active,
    capacity: int,
    domain: int,
):
    """Dense segment reduce over the mixed-radix key domain.

    Returns (group_key_values, group_addends, group_mask) where arrays have
    length `domain` (occupied groups flagged in group_mask).
    """
    ids, _ = group_ids_array_mode(keys, capacity, active)
    ids = jnp.where(active, ids, domain)  # inactive -> overflow bucket
    occupied = jax.ops.segment_max(
        active.astype(jnp.int32), ids, num_segments=domain + 1)[:domain] > 0
    out_states = []
    for data, combine in addends:
        red = _SEGMENT_OPS[combine](data, ids, num_segments=domain + 1)
        out_states.append(red[:domain])
    # reconstruct key values per group from the mixed-radix id
    gid = jnp.arange(domain, dtype=jnp.int32)
    cards = []
    for v in keys:
        card = max(1, len(v.dictionary)) if v.dtype.is_string else 2
        if v.validity is not None:
            card += 1
        cards.append(card)
    key_vals = []
    rem = gid
    for card in reversed(cards):
        key_vals.append(rem % card)
        rem = rem // card
    key_vals.reverse()
    out_keys = []
    for v, kv, card in zip(keys, key_vals, cards):
        base_card = card - 1 if v.validity is not None else card
        is_null = (kv == base_card) if v.validity is not None else None
        data = jnp.minimum(kv, base_card - 1).astype(
            v.dtype.np_dtype() if not v.dtype.is_string else jnp.int32)
        validity = None if is_null is None else ~is_null
        out_keys.append(EvalValue(data, validity, v.dtype, v.dictionary))
    return out_keys, out_states, occupied


def reduce_sort_mode(
    keys: List[EvalValue],
    addends: List[Tuple[jnp.ndarray, str]],
    active,
    capacity: int,
    payload: Sequence[jnp.ndarray] = (),
):
    """Generic grouping: sort by normalized keys, segment-reduce addends.

    Returns (group_keys: List[EvalValue], group_states, group_mask). Output
    arrays have length `capacity`; groups are dense from index 0 upward in
    key-sorted order.
    """
    key_ops = K.sort_operands(keys, None, capacity, active)
    n_key_ops = len(key_ops)
    addend_arrays = [a for a, _ in addends]
    # carry raw key data (+validity) through the sort for reconstruction
    raw = []
    for v in keys:
        raw.append(v.full_data(capacity))
        raw.append(v.full_validity(capacity))
    operands = key_ops + [active] + addend_arrays + list(raw) + list(payload)
    sorted_ops = jax.lax.sort(operands, num_keys=n_key_ops, is_stable=False)
    s_keys = sorted_ops[:n_key_ops]
    s_active = sorted_ops[n_key_ops]
    s_addends = sorted_ops[n_key_ops + 1: n_key_ops + 1 + len(addend_arrays)]
    s_raw = sorted_ops[n_key_ops + 1 + len(addend_arrays):
                       n_key_ops + 1 + len(addend_arrays) + len(raw)]

    diff = K.group_identity_diff(s_keys[1:], capacity)  # skip active key
    new_group = s_active & diff
    seg = jnp.cumsum(new_group.astype(jnp.int32)) - 1
    num_groups = jnp.sum(new_group.astype(jnp.int32))
    # inactive rows -> overflow bucket `capacity`
    seg = jnp.where(s_active, seg, capacity)

    out_states = []
    for data, (_, combine) in zip(s_addends, addends):
        red = _SEGMENT_OPS[combine](data, seg, num_segments=capacity + 1)
        out_states.append(red[:capacity])

    group_mask = jnp.arange(capacity, dtype=jnp.int32) < num_groups

    out_keys = []
    for i, v in enumerate(keys):
        data = s_raw[2 * i]
        valid = s_raw[2 * i + 1]
        # key value is constant within a group: take it at group starts via
        # segment_max over a monotone encoding (use normalized data + max).
        gd = jax.ops.segment_max(
            jnp.where(s_active, data,
                      _type_min(data.dtype)), seg,
            num_segments=capacity + 1)[:capacity]
        gv = jax.ops.segment_max(
            jnp.where(s_active & valid, 1, 0), seg,
            num_segments=capacity + 1)[:capacity] > 0
        validity = None if v.validity is None else gv
        out_keys.append(EvalValue(gd, validity, v.dtype, v.dictionary))
    return out_keys, out_states, group_mask


def _type_min(dtype):
    if jnp.issubdtype(dtype, jnp.floating):
        return np.array(-np.inf, dtype)
    if dtype == jnp.bool_:
        return False
    return np.iinfo(np.dtype(dtype)).min
