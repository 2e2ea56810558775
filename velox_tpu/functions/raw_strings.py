"""Raw-string (flat byte-matrix) overrides for the string functions.

The dictionary-space transforms in functions/scalar.py run Python over
the distinct set at trace time — the right call for low-cardinality
VARCHAR, and a collapse for high-cardinality columns where the
dictionary IS the column. This module wraps the registered string
functions: when an argument is a raw column (vector/strings.py), the
computation runs as dense byte kernels ON DEVICE; otherwise the original
dictionary-space eval runs unchanged.

Parity: velox/functions/prestosql/StringFunctions.h operates on
StringView bytes; these kernels are the same byte-level semantics over
the padded matrix layout. ASCII case mapping only for upper/lower
(multi-byte UTF-8 passes through unchanged); reverse is byte-wise.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from velox_tpu import types as T
from velox_tpu.expression.eval import EvalValue, merge_validity
from velox_tpu.functions.registry import _REGISTRY, ScalarFunction
from velox_tpu.vector import strings as S
from velox_tpu.vector.device import Dictionary


def is_raw_value(v) -> bool:
    return isinstance(v, EvalValue) and S.is_raw(v)


_DICT_PACK_CACHE: dict = {}


def dict_bytes(d: Dictionary, width=None):
    """The dictionary's values as a host-packed (k, W) byte matrix +
    lens (trace-time constant; cached per dictionary identity)."""
    key = (id(d), width)
    hit = _DICT_PACK_CACHE.get(key)
    if hit is not None:
        return hit
    vals = d.values
    b, ln = S.pack_pylist(vals, max(1, len(vals)), width)
    out = (jnp.asarray(b), jnp.asarray(ln))
    _DICT_PACK_CACHE[key] = out
    return out


def as_raw(v: EvalValue, capacity: int, width=None):
    """(bytes2d, lens, validity) of any string EvalValue at ``capacity``
    rows: raw columns pass through; dictionary ids gather rows out of
    the host-packed dictionary matrix (one 2D device gather); unresolved
    constants broadcast."""
    if S.is_raw(v):
        b = v.data
        ln = S.lens_of(v)
        if b.shape[0] != capacity:  # scalar-broadcast raw (not expected)
            b = jnp.broadcast_to(b, (capacity,) + b.shape[1:])
            ln = jnp.broadcast_to(ln, (capacity,))
        return b, ln, v.validity
    if v.data is None:  # unresolved constant
        b, ln = S.broadcast_literal(v.py_value, capacity,
                                    width or S.MIN_WIDTH)
        return b, ln, None
    if v.dictionary is not None:
        db, dln = dict_bytes(v.dictionary, width)
        ids = jnp.clip(v.full_data(capacity).astype(jnp.int32), 0,
                       db.shape[0] - 1)
        return db[ids], dln[ids], v.validity
    raise NotImplementedError("string value without raw bytes, "
                              "dictionary, or constant")


def _raw_capacity(args) -> int:
    for a in args:
        if is_raw_value(a):
            return a.data.shape[0]
    raise AssertionError("no raw argument")


def _const_bytes(v: EvalValue, fname: str) -> bytes:
    if v.py_value is None:
        raise NotImplementedError(
            f"{fname} on raw strings requires a constant argument")
    s = v.py_value
    return s.encode() if isinstance(s, str) else bytes(s)


def _out(b, ln, validity):
    return S.raw_value(b, ln, validity)


# ---- per-function raw evals ------------------------------------------------

def _r_lower(ctx, o, args):
    v = args[0]
    b, ln = S.lower_ascii(v.data, S.lens_of(v))
    return _out(b, ln, v.validity)


def _r_upper(ctx, o, args):
    v = args[0]
    b, ln = S.upper_ascii(v.data, S.lens_of(v))
    return _out(b, ln, v.validity)


def _r_length(ctx, o, args):
    v = args[0]
    return EvalValue(S.length_chars(v.data, S.lens_of(v)), v.validity,
                     T.BIGINT)


def _r_trim(ctx, o, args):
    v = args[0]
    b, ln = S.trim(v.data, S.lens_of(v))
    return _out(b, ln, v.validity)


def _r_ltrim(ctx, o, args):
    v = args[0]
    b, ln = S.ltrim(v.data, S.lens_of(v))
    return _out(b, ln, v.validity)


def _r_rtrim(ctx, o, args):
    v = args[0]
    b, ln = S.rtrim(v.data, S.lens_of(v))
    return _out(b, ln, v.validity)


def _r_reverse(ctx, o, args):
    v = args[0]
    b, ln = S.reverse_bytes(v.data, S.lens_of(v))
    return _out(b, ln, v.validity)


def _r_substr(ctx, o, args):
    v = args[0]
    cap = v.data.shape[0]
    start = args[1].full_data(cap).astype(jnp.int32)
    length = (args[2].full_data(cap).astype(jnp.int32)
              if len(args) > 2 else None)
    b, ln = S.substr(v.data, S.lens_of(v), start, length)
    validity = merge_validity(*args)
    return _out(b, ln, validity)


def _r_like(ctx, o, args):
    v, pat = args[0], args[1]
    if pat.py_value is None:
        raise NotImplementedError("LIKE pattern must be a constant")
    esc = args[2].py_value if len(args) > 2 else None
    res = S.like(v.data, S.lens_of(v), pat.py_value, esc)
    return EvalValue(res, v.validity, T.BOOLEAN)


def _r_starts_with(ctx, o, args):
    v = args[0]
    res = S.starts_with(v.data, S.lens_of(v),
                        _const_bytes(args[1], "starts_with"))
    return EvalValue(res, merge_validity(*args), T.BOOLEAN)


def _r_ends_with(ctx, o, args):
    v = args[0]
    res = S.ends_with(v.data, S.lens_of(v),
                      _const_bytes(args[1], "ends_with"))
    return EvalValue(res, merge_validity(*args), T.BOOLEAN)


def _r_strpos(ctx, o, args):
    v = args[0]
    res = S.strpos_chars(v.data, S.lens_of(v),
                         _const_bytes(args[1], "strpos"))
    return EvalValue(res, merge_validity(*args), T.BIGINT)


def _r_contains(ctx, o, args):
    v = args[0]
    pos = S.contains_at(v.data, S.lens_of(v),
                        _const_bytes(args[1], "contains"))
    return EvalValue(pos >= 0, merge_validity(*args), T.BOOLEAN)


def _r_concat(ctx, o, args):
    cap = _raw_capacity(args)
    b, ln, validity = as_raw(args[0], cap)
    for a in args[1:]:
        b2, ln2, val2 = as_raw(a, cap)
        b, ln = S.concat(b, ln, b2, ln2)
        if val2 is not None:
            validity = val2 if validity is None else validity & val2
    return _out(b, ln, validity)


def raw_compare(a: EvalValue, b: EvalValue, op: str) -> EvalValue:
    """Comparison where at least one side is a raw string column."""
    cap = a.data.shape[0] if S.is_raw(a) else b.data.shape[0]
    ab, al, _ = as_raw(a, cap)
    bb, bl, _ = as_raw(b, cap)
    if op in ("eq", "neq"):
        res = S.equal(ab, al, bb, bl)
        if op == "neq":
            res = ~res
    elif op in ("lt", "lte"):
        res = S.less(ab, al, bb, bl, or_equal=(op == "lte"))
    else:  # gt / gte via the swapped form
        res = S.less(bb, bl, ab, al, or_equal=(op == "gte"))
    return EvalValue(res, merge_validity(a, b), T.BOOLEAN)


_RAW_EVALS = {
    "lower": _r_lower, "upper": _r_upper, "length": _r_length,
    "trim": _r_trim, "ltrim": _r_ltrim, "rtrim": _r_rtrim,
    "reverse": _r_reverse, "substr": _r_substr, "substring": _r_substr,
    "like": _r_like, "starts_with": _r_starts_with,
    "ends_with": _r_ends_with, "strpos": _r_strpos,
    "contains": _r_contains, "concat": _r_concat,
}


def _wrap(name: str, raw_eval):
    ents = _REGISTRY.get(name)
    if not ents:
        return
    wrapped = []
    for e in ents:
        def eval_fn(ctx, o, args, _orig=e.eval_fn, _raw=raw_eval):
            if any(is_raw_value(a) for a in args):
                return _raw(ctx, o, args)
            return _orig(ctx, o, args)
        wrapped.append(ScalarFunction(e.name, e.resolver, eval_fn))
    _REGISTRY[name] = wrapped


for _n, _f in _RAW_EVALS.items():
    _wrap(_n, _f)
