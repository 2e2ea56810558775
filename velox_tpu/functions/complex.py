"""Array/map scalar functions over the lengths+children device layout.

Role parity: velox/functions/prestosql (ArrayFunctions: cardinality,
element_at, contains; MapFunctions: map_keys-adjacent via children).
Element gathers are bounds-clamped with null-out — the dense masked
analogue of per-row bounds checks.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from velox_tpu import types as T
from velox_tpu.expression.eval import EvalValue, merge_validity
from velox_tpu.functions.registry import register
from velox_tpu.functions.scalar import eq_value


def _offsets(v):
    lens = v.data.astype(jnp.int32)
    return jnp.cumsum(lens) - lens


def _cardinality_eval(ctx, out_dtype, args):
    (v,) = args
    return EvalValue(v.data.astype(jnp.int64), v.validity, T.BIGINT)


register("cardinality",
         lambda ts: T.BIGINT if len(ts) == 1 and ts[0].is_complex
         else None, _cardinality_eval)


def _element_at_eval(ctx, out_dtype, args):
    arr, idx = args
    child = arr.children[0]
    lens = arr.data.astype(jnp.int64)
    starts = _offsets(arr).astype(jnp.int64)
    i = idx.full_data(ctx.capacity).astype(jnp.int64)
    # 1-based; negative indexes from the end (Presto semantics)
    pos = jnp.where(i > 0, i - 1, lens + i)
    in_bounds = (pos >= 0) & (pos < lens)
    src = jnp.clip(starts + pos, 0, child.capacity - 1).astype(jnp.int32)
    data = child.data[src]
    validity = in_bounds
    if arr.validity is not None:
        validity = validity & arr.validity
    if idx.validity is not None:
        validity = validity & idx.full_validity(ctx.capacity)
    if child.validity is not None:
        validity = validity & child.validity[src]
    elem_t = arr.dtype.children[0]
    out = EvalValue(data, validity, elem_t, child.dictionary)
    return out


def _element_at_resolver(ts):
    if len(ts) == 2 and ts[0].kind is T.TypeKind.ARRAY \
            and ts[1].is_integral:
        return ts[0].children[0]
    return None


register("element_at", _element_at_resolver, _element_at_eval)


def _contains_eval(ctx, out_dtype, args):
    arr, x = args
    child = arr.children[0]
    ecap = child.capacity
    lens = arr.data.astype(jnp.int32)
    starts = _offsets(arr)
    # element e belongs to row r iff starts[r] <= e < starts[r]+lens[r]:
    # invert with searchsorted over starts (rows ascending)
    e = jnp.arange(ecap, dtype=jnp.int32)
    row = jnp.searchsorted(starts, e, side="right").astype(jnp.int32) - 1
    row_c = jnp.clip(row, 0, ctx.capacity - 1)
    in_row = (e >= starts[row_c]) & (e < starts[row_c] + lens[row_c])
    from velox_tpu.expression.eval import EvalValue as EV
    elem_val = EV(child.data, child.validity, arr.dtype.children[0],
                  child.dictionary)
    # lift the needle into element space (per-row needles gather by row)
    if x.data is not None and getattr(x.data, "ndim", 0) > 0:
        xv = x.data[row_c]
        xvalid = (x.validity[row_c]
                  if x.validity is not None and x.validity.ndim > 0
                  else x.validity)
        x = EV(xv, xvalid, x.dtype, x.dictionary)

    class _ECtx:
        capacity = ecap
    eq = eq_value(_ECtx, elem_val, x)
    hit = eq.data.astype(bool)
    if eq.validity is not None:
        hit = hit & eq.validity
    hit = hit & in_row
    seg = jnp.where(in_row, row_c, jnp.int32(ctx.capacity))
    import jax
    found = jax.ops.segment_max(hit.astype(jnp.int32), seg,
                                num_segments=ctx.capacity + 1)[
        :ctx.capacity] > 0
    validity = arr.validity
    return EvalValue(found, validity, T.BOOLEAN)


def _contains_resolver(ts):
    if len(ts) == 2 and ts[0].kind is T.TypeKind.ARRAY:
        return T.BOOLEAN
    return None


register("contains", _contains_resolver, _contains_eval)
