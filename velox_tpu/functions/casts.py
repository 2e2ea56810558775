"""CAST implementations.

Role parity: ``velox/expression/CastExpr`` (special form CAST/TRY_CAST).
Casts between fixed-width device types are pure dtype conversions fused by
XLA; string-involved casts run through the (trace-time) dictionary.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from velox_tpu import types as T
from velox_tpu.expression.eval import EvalValue
from velox_tpu.vector.device import Dictionary


def cast(ctx, v: EvalValue, to: T.DataType, is_try: bool = False) -> EvalValue:
    frm = v.dtype
    if frm == to:
        return v

    k_from, k_to = frm.kind, to.kind

    # numeric -> numeric
    if frm.is_numeric and to.is_numeric:
        return _cast_numeric(v, to, is_try)

    # boolean <-> numeric
    if k_from is T.TypeKind.BOOLEAN and to.is_numeric:
        return EvalValue(v.data.astype(to.np_dtype()), v.validity, to)
    if frm.is_numeric and k_to is T.TypeKind.BOOLEAN:
        return EvalValue(v.data != 0, v.validity, to)

    # date <-> timestamp
    if k_from is T.TypeKind.DATE and k_to is T.TypeKind.TIMESTAMP:
        return EvalValue(v.data.astype(np.int64) * 86400_000_000,
                         v.validity, to)
    if k_from is T.TypeKind.TIMESTAMP and k_to is T.TypeKind.DATE:
        return EvalValue(
            jnp.floor_divide(v.data, 86400_000_000).astype(np.int32),
            v.validity, to)

    # varchar -> X via dictionary parse (host, trace time)
    if frm.is_string:
        return _cast_from_string(v, to, is_try)

    # X -> varchar via dictionary format — only for dictionary-backed or
    # small-domain inputs; general numeric->string is host-side at extract.
    if to.is_string:
        raise NotImplementedError(
            "cast to varchar is performed at output extraction")

    if k_from is T.TypeKind.UNKNOWN:
        from velox_tpu.expression.eval import ex_null
        return ex_null(to)

    raise NotImplementedError(f"cast {frm} -> {to}")


def _cast_long_decimal(v: EvalValue, to: T.DataType) -> EvalValue:
    """Casts touching a long decimal (int128 limbs). Supported: widening
    (short decimal / integer -> long), long -> long upscale, long ->
    DOUBLE (approximate). Downscaling a long decimal (rounding a 128-bit
    value) is not implemented."""
    import jax.numpy as jnp

    from velox_tpu.ops import int128 as I
    from velox_tpu.vector.device import DeviceColumn
    frm = v.dtype
    if to.is_long_decimal:
        fs = frm.scale if frm.kind is T.TypeKind.DECIMAL else 0
        if to.scale < fs:
            raise NotImplementedError(
                f"cast {frm} -> {to}: long-decimal downscale rounding")
        if frm.is_long_decimal:
            lo = v.data
            hi = (v.children[0].data if v.children
                  else jnp.zeros_like(lo))
        elif frm.kind is T.TypeKind.DECIMAL or frm.is_integral:
            lo, hi = I.from_i64(v.data.astype(jnp.int64))
        else:
            raise NotImplementedError(f"cast {frm} -> {to}")
        lo, hi = I.rescale_up(lo, hi, to.scale - fs)
        hi_col = DeviceColumn(hi, None, T.BIGINT, None)
        return EvalValue(lo, v.validity, to, children=(hi_col,))
    if to.is_floating:
        from velox_tpu.functions.scalar import _numeric_data

        class _C:
            capacity = v.data.shape[0] if v.data.ndim else 1
        return EvalValue(_numeric_data(v, to, _C), v.validity, to)
    raise NotImplementedError(f"cast {frm} -> {to}")


def _cast_numeric(v: EvalValue, to: T.DataType, is_try: bool) -> EvalValue:
    frm = v.dtype
    if frm.is_long_decimal or to.is_long_decimal:
        return _cast_long_decimal(v, to)
    if frm.kind is T.TypeKind.DECIMAL:
        if to.kind is T.TypeKind.DECIMAL:
            from velox_tpu.functions.scalar import _rescale_decimal
            if to.scale >= frm.scale:
                data = _rescale_decimal(v.data, frm.scale, to.scale)
            else:
                # reduce scale with half-up rounding
                p = 10 ** (frm.scale - to.scale)
                half = p // 2
                d = v.data
                data = jnp.where(d >= 0, (d + half) // p, -((-d + half) // p))
            return EvalValue(data, v.validity, to)
        if to.is_floating:
            return EvalValue(
                v.data.astype(to.np_dtype()) / (10.0 ** frm.scale),
                v.validity, to)
        # decimal -> integer truncates toward zero (Presto rounds half-up;
        # we follow Presto)
        p = 10 ** frm.scale
        half = p // 2
        d = v.data
        data = jnp.where(d >= 0, (d + half) // p, -((-d + half) // p))
        return EvalValue(data.astype(to.np_dtype()), v.validity, to)

    if to.kind is T.TypeKind.DECIMAL:
        if frm.is_integral:
            return EvalValue(
                v.data.astype(np.int64) * (10 ** to.scale), v.validity, to)
        # float -> decimal: half-up round
        scaled = v.data.astype(np.float64) * (10.0 ** to.scale)
        data = jnp.where(scaled >= 0, jnp.floor(scaled + 0.5),
                         jnp.ceil(scaled - 0.5)).astype(np.int64)
        return EvalValue(data, v.validity, to)

    if frm.is_floating and to.is_integral:
        # SQL cast rounds half-even in Presto? No: cast(double as bigint)
        # rounds to nearest, ties away from zero.
        d = v.data
        data = jnp.where(d >= 0, jnp.floor(d + 0.5),
                         jnp.ceil(d - 0.5)).astype(to.np_dtype())
        return EvalValue(data, v.validity, to)

    return EvalValue(v.data.astype(to.np_dtype()), v.validity, to)


def _cast_from_string(v: EvalValue, to: T.DataType, is_try: bool) -> EvalValue:
    import datetime

    if v.dictionary is None:
        if v.py_value is not None:
            # constant string literal
            return _const_from_string(v.py_value, to)
        raise NotImplementedError("cast from non-dictionary string column")

    def parse(s):
        try:
            if to.kind is T.TypeKind.DATE:
                return (datetime.date.fromisoformat(s)
                        - datetime.date(1970, 1, 1)).days
            if to.is_integral:
                return int(s)
            if to.is_floating:
                return float(s)
            if to.kind is T.TypeKind.DECIMAL:
                import decimal as pydec
                return int(pydec.Decimal(s).scaleb(to.scale)
                           .to_integral_value(pydec.ROUND_HALF_UP))
            if to.kind is T.TypeKind.BOOLEAN:
                return s.lower() in ("true", "t", "1")
        except (ValueError, ArithmeticError):
            if is_try:
                return None
            raise
        raise NotImplementedError(f"cast varchar -> {to}")

    parsed = [parse(s) for s in v.dictionary.values]
    ok = np.array([p is not None for p in parsed])
    table = np.array([0 if p is None else p for p in parsed],
                     dtype=to.np_dtype())
    data = jnp.asarray(table)[v.data]
    validity = v.validity
    if not ok.all():
        bad_valid = jnp.asarray(ok)[v.data]
        validity = bad_valid if validity is None else (validity & bad_valid)
    return EvalValue(data, validity, to)


def _const_from_string(s: str, to: T.DataType) -> EvalValue:
    import datetime

    if to.kind is T.TypeKind.DATE:
        days = (datetime.date.fromisoformat(s)
                - datetime.date(1970, 1, 1)).days
        return EvalValue(jnp.asarray(days, np.int32), None, to)
    if to.is_integral or to.is_floating:
        val = int(s) if to.is_integral else float(s)
        return EvalValue(jnp.asarray(val, to.np_dtype()), None, to)
    if to.kind is T.TypeKind.DECIMAL:
        import decimal as pydec
        val = int(pydec.Decimal(s).scaleb(to.scale)
                  .to_integral_value(pydec.ROUND_HALF_UP))
        return EvalValue(jnp.asarray(val, np.int64), None, to)
    raise NotImplementedError(f"cast constant varchar -> {to}")
