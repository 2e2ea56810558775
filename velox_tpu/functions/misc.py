"""Misc scalar functions: nullif, more math, bitwise ops.

Role parity: velox/functions/prestosql (Arithmetic.h trig/bitwise,
Comparisons; nullif is a special form in Presto but a plain function here
since dense masked eval has no laziness to preserve).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from velox_tpu import types as T
from velox_tpu.expression.eval import EvalValue, merge_validity
from velox_tpu.functions.registry import register
from velox_tpu.functions.scalar import (
    _numeric_data, eq_value, promote_numeric,
)
from velox_tpu.functions.signature import sig


def _nullif_eval(ctx, out_dtype, args):
    a, b = args
    eq = eq_value(ctx, a, b)
    eq_known = eq.data.astype(bool)
    if eq.validity is not None:
        eq_known = eq_known & eq.validity.astype(bool)
    validity = a.full_validity(ctx.capacity) if a.validity is not None \
        else jnp.ones((ctx.capacity,), bool)
    validity = validity & ~jnp.broadcast_to(eq_known, (ctx.capacity,))
    return EvalValue(a.full_data(ctx.capacity), validity, a.dtype,
                     a.dictionary)


register("nullif",
         lambda ts: ts[0] if len(ts) == 2 else None, _nullif_eval)


def _binary_double(name, fn):
    def eval_fn(ctx, out_dtype, args):
        a, b = args
        da = _numeric_data(a, T.DOUBLE, ctx)
        db = _numeric_data(b, T.DOUBLE, ctx)
        return EvalValue(fn(da, db), merge_validity(a, b), T.DOUBLE)
    register(name, sig("numeric, numeric -> double"), eval_fn)


def _unary_double(name, fn):
    def eval_fn(ctx, out_dtype, args):
        (a,) = args
        return EvalValue(fn(_numeric_data(a, T.DOUBLE, ctx)), a.validity,
                         T.DOUBLE)
    register(name, sig("numeric -> double"), eval_fn)


_unary_double("asin", jnp.arcsin)
_unary_double("acos", jnp.arccos)
_unary_double("atan", jnp.arctan)
_unary_double("sinh", jnp.sinh)
_unary_double("cosh", jnp.cosh)
_unary_double("tanh", jnp.tanh)
_unary_double("degrees", jnp.degrees)
_unary_double("radians", jnp.radians)
_binary_double("atan2", jnp.arctan2)
_binary_double("log", lambda b, x: jnp.log(x) / jnp.log(b))

register("pi", sig("-> double"),
         lambda ctx, od, args: EvalValue(jnp.float64(np.pi), None,
                                         T.DOUBLE))
register("e", sig("-> double"),
         lambda ctx, od, args: EvalValue(jnp.float64(np.e), None, T.DOUBLE))


def _bitwise(name, fn):
    def eval_fn(ctx, out_dtype, args):
        a, b = args
        da = a.full_data(ctx.capacity).astype(jnp.int64)
        db = b.full_data(ctx.capacity).astype(jnp.int64)
        return EvalValue(fn(da, db), merge_validity(a, b), T.BIGINT)
    register(name, sig("integral, integral -> bigint"), eval_fn)


_bitwise("bitwise_and", jnp.bitwise_and)
_bitwise("bitwise_or", jnp.bitwise_or)
_bitwise("bitwise_xor", jnp.bitwise_xor)
_bitwise("bitwise_shift_left", lambda a, b: a << b)
_bitwise("bitwise_arithmetic_shift_right", lambda a, b: a >> b)


def _bitwise_not_eval(ctx, out_dtype, args):
    (a,) = args
    return EvalValue(~a.full_data(ctx.capacity).astype(jnp.int64),
                     a.validity, T.BIGINT)


register("bitwise_not", sig("integral -> bigint"), _bitwise_not_eval)


def _truncate_eval(ctx, out_dtype, args):
    (a,) = args
    if a.dtype.is_integral:
        return a
    if a.dtype.kind is T.TypeKind.DECIMAL:
        s = 10 ** a.dtype.scale
        d = a.data
        data = jnp.where(d >= 0, d // s, -((-d) // s))
        return EvalValue(data, a.validity, out_dtype)
    return EvalValue(jnp.trunc(a.data), a.validity, T.DOUBLE)


register("truncate",
         lambda ts: (ts[0] if ts[0].is_integral else (
             T.decimal(ts[0].precision, 0)
             if ts[0].kind is T.TypeKind.DECIMAL else T.DOUBLE))
         if len(ts) == 1 and ts[0].is_numeric else None, _truncate_eval)


def _width_bucket_eval(ctx, out_dtype, args):
    x, lo, hi, n = args
    dx = _numeric_data(x, T.DOUBLE, ctx)
    dlo = _numeric_data(lo, T.DOUBLE, ctx)
    dhi = _numeric_data(hi, T.DOUBLE, ctx)
    dn = n.full_data(ctx.capacity).astype(jnp.int64)
    b = jnp.floor((dx - dlo) / (dhi - dlo)
                  * dn.astype(jnp.float64)).astype(jnp.int64) + 1
    b = jnp.clip(b, 0, dn + 1)
    return EvalValue(b, merge_validity(x, lo, hi, n), T.BIGINT)


register("width_bucket",
         sig("numeric, numeric, numeric, numeric -> bigint"),
         _width_bucket_eval)
