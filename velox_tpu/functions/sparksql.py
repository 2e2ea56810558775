"""Spark SQL function package.

Role parity: ``velox/functions/sparksql`` — Spark-faithful semantics where
they differ from Presto (pmod, size, datediff argument order, add_months),
plus aliases onto the shared implementations (functions/lib parity).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from velox_tpu import types as T
from velox_tpu.expression.eval import EvalValue, merge_validity
from velox_tpu.functions.registry import _REGISTRY, register
from velox_tpu.functions.scalar import _all_numeric, _numeric_data


def _alias(new: str, old: str):
    if old in _REGISTRY:
        _REGISTRY[new] = _REGISTRY[old]


def _alias_special(new: str, old: str):
    from velox_tpu.expression.eval import _SPECIAL_FORMS
    if old in _SPECIAL_FORMS:
        _SPECIAL_FORMS[new] = _SPECIAL_FORMS[old]


# straight aliases onto shared implementations / special forms
_alias_special("nvl", "coalesce")
_alias_special("ifnull", "coalesce")
_alias_special("isnull", "is_null")
_alias_special("isnotnull", "is_not_null")
_alias("shiftleft", "bitwise_shift_left")
_alias("shiftright", "bitwise_arithmetic_shift_right")
_alias("power", "power")
_alias("pow", "power")
_alias("lcase", "lower")
_alias("ucase", "upper")
_alias("char_length", "length")
_alias("dayofweek", "day_of_week")
_alias("dayofyear", "day_of_year")
_alias("weekofyear", "week")
_alias("std", "stddev")


def _pmod_eval(ctx, out_dtype, args):
    """Spark pmod: result is non-negative (sign follows divisor=positive)."""
    a, b = args
    da = _numeric_data(a, out_dtype, ctx)
    db = _numeric_data(b, out_dtype, ctx)
    # Spark's Pmod is `r = a javamod b; if (r < 0) (r + b) javamod b`
    # with Java's truncating %. That reduces to: the floored (python/jax)
    # remainder when b > 0, and the Java truncated remainder when b < 0 —
    # so pmod(10, -3) == 1 and pmod(-10, -3) == -1 (Spark-checked cases).
    floored = da % db
    trunc = jnp.sign(da) * (jnp.abs(da) % jnp.abs(db))
    r = jnp.where(db > 0, floored, trunc).astype(floored.dtype)
    validity = merge_validity(a, b)
    zero = db == 0
    validity = (~zero if validity is None else validity & ~zero)
    return EvalValue(r, validity, out_dtype)


register("pmod",
         lambda ts: (T.BIGINT if all(t.is_integral for t in ts)
                     else T.DOUBLE)
         if len(ts) == 2 and _all_numeric(ts) else None, _pmod_eval)


def _size_eval(ctx, out_dtype, args):
    """Spark size(): element count; INTEGER (not BIGINT)."""
    (v,) = args
    return EvalValue(v.data.astype(jnp.int32), v.validity, T.INTEGER)


register("size",
         lambda ts: T.INTEGER if len(ts) == 1 and ts[0].is_complex
         else None, _size_eval)


def _days_of(v, ctx):
    d = v.full_data(ctx.capacity).astype(jnp.int64)
    if v.dtype.kind is T.TypeKind.TIMESTAMP:
        d = d // 86_400_000_000
    return d


_DATELIKE = (T.TypeKind.DATE, T.TypeKind.TIMESTAMP)


def _datediff_eval(ctx, out_dtype, args):
    """Spark datediff(end, start) -> days (note the argument order)."""
    end, start = args
    return EvalValue(_days_of(end, ctx) - _days_of(start, ctx),
                     merge_validity(end, start), T.BIGINT)


register("datediff",
         lambda ts: T.BIGINT if len(ts) == 2 and all(
             t.kind in _DATELIKE for t in ts) else None,
         _datediff_eval)


def _add_months_eval(ctx, out_dtype, args):
    from velox_tpu.functions.datetime import _shift_months
    d, n = args
    days = _days_of(d, ctx)
    months = n.full_data(ctx.capacity).astype(jnp.int64)
    out = _shift_months(days, months)
    return EvalValue(out.astype(jnp.int32), merge_validity(d, n), T.DATE)


register("add_months",
         lambda ts: T.DATE if len(ts) == 2
         and ts[0].kind in _DATELIKE and ts[1].is_integral
         else None, _add_months_eval)
