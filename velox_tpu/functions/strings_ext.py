"""Regex / JSON / URL / extended string functions.

Role parity: ``velox/functions/lib/Re2Functions.{h,cpp}`` (regexp_like/
extract/replace), ``functions/prestosql/JsonFunctions`` (json_extract_*)
and ``functions/prestosql/URLFunctions.h``.

TPU-first: string columns are dictionary ids, so every function here is a
**dictionary-space transform** — the (Python) string computation runs once
per DISTINCT value at trace time and becomes either a new dictionary
(string results) or a per-id lookup table gathered on device (scalar
results). The per-row device work is one int32 gather regardless of
string lengths — the reference's per-row RE2 evaluation has no TPU
analogue, and this is faster whenever distinct values << rows (the
dictionary-memoization trick the reference applies opportunistically,
expression/Expr.cpp:1091, made structural).
"""

from __future__ import annotations

import json as _json
import re
from typing import Optional
from urllib.parse import unquote_plus, urlsplit, parse_qs, quote_plus

import jax.numpy as jnp
import numpy as np

from velox_tpu import types as T
from velox_tpu.expression.eval import EvalValue
from velox_tpu.functions.registry import register
from velox_tpu.functions.scalar import (
    _dict_lookup, _dict_lookup_pa, _dict_map, _dict_map_pa,
    _require_dict, _str_resolver,
)
from velox_tpu.vector.device import Dictionary


def _dict_map_nullable(v: EvalValue, f) -> EvalValue:
    """Like _dict_map but f may return None -> NULL rows."""
    d = _require_dict(v, "string function")
    vals = [f(x) for x in d.values]
    null_ids = np.array([x is None for x in vals], dtype=bool)
    # dedup + remap like scalar._dict_map: duplicate dictionary values
    # break id-space equality and grouping
    strs = ["" if x is None else x for x in vals]
    uniq = sorted(set(strs))
    new_id = {x: i for i, x in enumerate(uniq)}
    remap = np.array([new_id[x] for x in strs], dtype=np.int32)
    new_dict = Dictionary(uniq)
    new_dict.is_sorted = True
    data = jnp.asarray(remap)[v.data]
    if null_ids.any():
        is_null = jnp.asarray(null_ids)[v.data]
        validity = ~is_null if v.validity is None else \
            (v.validity & ~is_null)
    else:
        validity = v.validity
    return EvalValue(data, validity, T.VARCHAR, new_dict)


def _const_str(arg: EvalValue, fname: str) -> str:
    if arg.py_value is None:
        raise NotImplementedError(f"{fname}: argument must be a constant")
    return arg.py_value


# ---------------------------------------------------------------------------
# Regex (Re2Functions parity)
# ---------------------------------------------------------------------------

def _regexp_like_eval(ctx, out_dtype, args):
    # RE2 via pyarrow (the reference's engine, functions/lib/Re2Functions);
    # python-re fallback for RE2-unsupported features (e.g. lookaheads)
    import pyarrow.compute as pc
    pat = _const_str(args[1], "regexp_like")
    rx = re.compile(pat)
    return _dict_lookup_pa(
        args[0], lambda src: pc.match_substring_regex(src, pat),
        lambda s: rx.search(s) is not None, T.BOOLEAN)


register("regexp_like", _str_resolver(T.BOOLEAN), _regexp_like_eval)


def _regexp_extract_eval(ctx, out_dtype, args):
    rx = re.compile(_const_str(args[1], "regexp_extract"))
    group = 0
    if len(args) > 2:
        group = int(args[2].py_value)

    def f(s):
        m = rx.search(s)
        return m.group(group) if m else None
    return _dict_map_nullable(args[0], f)


register("regexp_extract",
         lambda ts: T.VARCHAR if ts and ts[0].is_string else None,
         _regexp_extract_eval)


def _regexp_replace_eval(ctx, out_dtype, args):
    import pyarrow.compute as pc
    rx = re.compile(_const_str(args[1], "regexp_replace"))
    repl = _const_str(args[2], "regexp_replace") if len(args) > 2 else ""
    # Presto uses $1-style group references; Python AND RE2 want \1
    repl = re.sub(r"\$(\d+)", r"\\\1", repl)
    pat = _const_str(args[1], "regexp_replace")
    return _dict_map_pa(
        args[0],
        lambda src: pc.replace_substring_regex(
            src, pattern=pat, replacement=repl),
        lambda s: rx.sub(repl, s))


register("regexp_replace",
         lambda ts: T.VARCHAR if ts and ts[0].is_string else None,
         _regexp_replace_eval)


# ---------------------------------------------------------------------------
# JSON (JsonFunctions parity; simple $.a.b[0] JSONPath subset)
# ---------------------------------------------------------------------------

def _json_walk(doc, path: str):
    if not path.startswith("$"):
        return None
    cur = doc
    # tokenize .name and [idx]
    for tok in re.findall(r"\.([A-Za-z_][A-Za-z0-9_]*)|\[(\d+)\]",
                          path[1:]):
        name, idx = tok
        try:
            if name:
                cur = cur[name]
            else:
                cur = cur[int(idx)]
        except (KeyError, IndexError, TypeError):
            return None
    return cur


def _json_extract_scalar_eval(ctx, out_dtype, args):
    path = _const_str(args[1], "json_extract_scalar")

    def f(s):
        try:
            v = _json_walk(_json.loads(s), path)
        except Exception:
            return None
        if v is None or isinstance(v, (dict, list)):
            return None
        if isinstance(v, bool):
            return "true" if v else "false"
        if isinstance(v, float) and v == int(v):
            return str(v)
        return str(v)
    return _dict_map_nullable(args[0], f)


register("json_extract_scalar",
         lambda ts: T.VARCHAR if ts and ts[0].is_string else None,
         _json_extract_scalar_eval)


def _json_extract_eval(ctx, out_dtype, args):
    path = _const_str(args[1], "json_extract")

    def f(s):
        try:
            v = _json_walk(_json.loads(s), path)
        except Exception:
            return None
        return None if v is None else _json.dumps(v, separators=(",", ":"))
    return _dict_map_nullable(args[0], f)


register("json_extract",
         lambda ts: T.VARCHAR if ts and ts[0].is_string else None,
         _json_extract_eval)


def _json_array_length_eval(ctx, out_dtype, args):
    def f(s):
        try:
            v = _json.loads(s)
        except Exception:
            return -1
        return len(v) if isinstance(v, list) else -1
    out = _dict_lookup(args[0], f, T.BIGINT)
    bad = out.data < 0
    validity = ~bad if out.validity is None else (out.validity & ~bad)
    return EvalValue(out.data, validity, T.BIGINT)


register("json_array_length", _str_resolver(T.BIGINT),
         _json_array_length_eval)


def _is_json_scalar_eval(ctx, out_dtype, args):
    def f(s):
        try:
            return not isinstance(_json.loads(s), (dict, list))
        except Exception:
            return False
    return _dict_lookup(args[0], f, T.BOOLEAN)


register("is_json_scalar", _str_resolver(T.BOOLEAN), _is_json_scalar_eval)


def _json_array_contains_eval(ctx, out_dtype, args):
    """json_array_contains(json, value): value is a constant scalar;
    NULL on non-array json (JsonFunctions.cpp parity)."""
    v = args[1]
    want = v.py_value if v.py_value is not None else (
        None if v.data is None else v.data.item()
        if getattr(v.data, "ndim", 1) == 0 else None)
    if want is None:
        raise NotImplementedError(
            "json_array_contains: value must be a constant")
    if v.dtype.kind is T.TypeKind.DECIMAL:
        want = float(want) / 10.0 ** v.dtype.scale

    def f(s):
        try:
            arr = _json.loads(s)
        except Exception:
            return None
        if not isinstance(arr, list):
            return None
        for x in arr:
            if isinstance(want, bool) or isinstance(x, bool):
                if x is want:
                    return True
            elif isinstance(want, (int, float)) \
                    and isinstance(x, (int, float)):
                if float(x) == float(want):
                    return True
            elif x == want:
                return True
        return False

    d = _require_dict(args[0], "json_array_contains")
    vals = [f(x) for x in d.values]
    table = np.array([bool(x) for x in vals], dtype=bool)
    nulls = np.array([x is None for x in vals], dtype=bool)
    data = jnp.asarray(table)[args[0].data]
    isnull = jnp.asarray(nulls)[args[0].data]
    validity = (~isnull if args[0].validity is None
                else (args[0].validity & ~isnull))
    return EvalValue(data, validity, T.BOOLEAN)


register("json_array_contains",
         lambda ts: T.BOOLEAN if len(ts) == 2 and ts[0].is_string
         else None, _json_array_contains_eval)


def _json_array_get_eval(ctx, out_dtype, args):
    """json_array_get(json, index): negative indexes from the end;
    out-of-range or non-array -> NULL; the element re-serializes as
    canonical JSON (scalars keep their JSON form)."""
    idx_v = args[1]
    if idx_v.py_value is None:
        raise NotImplementedError(
            "json_array_get: index must be a constant")
    idx = int(idx_v.py_value)

    def f(s):
        try:
            arr = _json.loads(s)
        except Exception:
            return None
        if not isinstance(arr, list):
            return None
        i = idx if idx >= 0 else len(arr) + idx
        if not 0 <= i < len(arr):
            return None
        return _json.dumps(arr[i], separators=(",", ":"))
    return _dict_map_nullable(args[0], f)


register("json_array_get",
         lambda ts: T.VARCHAR if len(ts) == 2 and ts[0].is_string
         else None, _json_array_get_eval)


def _json_parse_eval(ctx, out_dtype, args):
    """json_parse: validates + canonicalizes (the JSON type maps to
    VARCHAR canonical text here); invalid input is a USER error in the
    reference — surfaced as NULL + a traced error is not available in
    dictionary space, so invalid input raises."""
    def f(s):
        try:
            return _json.dumps(_json.loads(s), separators=(",", ":"))
        except Exception:
            from velox_tpu.common.errors import VeloxUserError
            raise VeloxUserError(f"json_parse: invalid JSON: {s[:80]!r}")
    return _dict_map(args[0], f)


register("json_parse", _str_resolver(T.VARCHAR), _json_parse_eval)


def _json_format_eval(ctx, out_dtype, args):
    def f(s):
        try:
            return _json.dumps(_json.loads(s), separators=(",", ":"))
        except Exception:
            return None
    return _dict_map_nullable(args[0], f)


register("json_format", _str_resolver(T.VARCHAR), _json_format_eval)


def _json_size_eval(ctx, out_dtype, args):
    """json_size(json, path): member count of the object/array at path
    (scalars -> 0); NULL when the path misses (JsonFunctions.cpp)."""
    path = _const_str(args[1], "json_size")

    def f(s):
        try:
            v = _json_walk(_json.loads(s), path)
        except Exception:
            return -1
        if v is None:
            return -1
        return len(v) if isinstance(v, (dict, list)) else 0

    out = _dict_lookup(args[0], f, T.BIGINT)
    bad = out.data < 0
    validity = ~bad if out.validity is None else (out.validity & ~bad)
    return EvalValue(out.data, validity, T.BIGINT)


register("json_size",
         lambda ts: T.BIGINT if len(ts) == 2 and ts[0].is_string
         else None, _json_size_eval)


# ---------------------------------------------------------------------------
# URL functions (URLFunctions.h parity)
# ---------------------------------------------------------------------------

def _url_part(which):
    def f(s):
        try:
            u = urlsplit(s)
        except Exception:
            return None
        if which == "host":
            return u.hostname or None
        if which == "protocol":
            return u.scheme or None
        if which == "path":
            return u.path
        if which == "query":
            return u.query
        if which == "fragment":
            return u.fragment
        return None
    return f


for _name, _part in (("url_extract_host", "host"),
                     ("url_extract_protocol", "protocol"),
                     ("url_extract_path", "path"),
                     ("url_extract_query", "query"),
                     ("url_extract_fragment", "fragment")):
    register(_name,
             lambda ts: T.VARCHAR if ts and ts[0].is_string else None,
             (lambda part: lambda ctx, o, a: _dict_map_nullable(
                 a[0], _url_part(part)))(_part))


def _url_port_eval(ctx, out_dtype, args):
    def f(s):
        try:
            p = urlsplit(s).port
        except Exception:
            return -1
        return -1 if p is None else p
    out = _dict_lookup(args[0], f, T.BIGINT)
    bad = out.data < 0
    validity = ~bad if out.validity is None else (out.validity & ~bad)
    return EvalValue(out.data, validity, T.BIGINT)


register("url_extract_port", _str_resolver(T.BIGINT), _url_port_eval)


def _url_param_eval(ctx, out_dtype, args):
    name = _const_str(args[1], "url_extract_parameter")

    def f(s):
        try:
            q = parse_qs(urlsplit(s).query, keep_blank_values=True)
        except Exception:
            return None
        vals = q.get(name)
        return vals[0] if vals else None
    return _dict_map_nullable(args[0], f)


register("url_extract_parameter",
         lambda ts: T.VARCHAR if ts and ts[0].is_string else None,
         _url_param_eval)

register("url_encode", _str_resolver(T.VARCHAR),
         lambda ctx, o, a: _dict_map(a[0], lambda s: quote_plus(s)))
register("url_decode", _str_resolver(T.VARCHAR),
         lambda ctx, o, a: _dict_map(a[0], lambda s: unquote_plus(s)))


# ---------------------------------------------------------------------------
# More Presto string functions
# ---------------------------------------------------------------------------

def _strpos_eval(ctx, out_dtype, args):
    import pyarrow.compute as pc
    sub = _const_str(args[1], "strpos")
    return _dict_lookup_pa(
        args[0],
        lambda src: pc.add(pc.find_substring(src, sub), 1),
        lambda s: s.find(sub) + 1, T.BIGINT)


register("strpos", _str_resolver(T.BIGINT), _strpos_eval)


def _replace_eval(ctx, out_dtype, args):
    a = _const_str(args[1], "replace")
    b = _const_str(args[2], "replace") if len(args) > 2 else ""
    import pyarrow.compute as pc
    return _dict_map_pa(
        args[0],
        lambda src: pc.replace_substring(src, pattern=a, replacement=b),
        lambda s: s.replace(a, b))


register("replace",
         lambda ts: T.VARCHAR if ts and ts[0].is_string else None,
         _replace_eval)


def _starts_with_eval(ctx, out_dtype, args):
    import pyarrow.compute as pc
    p = _const_str(args[1], "starts_with")
    return _dict_lookup_pa(
        args[0], lambda src: pc.starts_with(src, p),
        lambda s: s.startswith(p), T.BOOLEAN)


def _ends_with_eval(ctx, out_dtype, args):
    import pyarrow.compute as pc
    p = _const_str(args[1], "ends_with")
    return _dict_lookup_pa(
        args[0], lambda src: pc.ends_with(src, p),
        lambda s: s.endswith(p), T.BOOLEAN)


register("starts_with", _str_resolver(T.BOOLEAN), _starts_with_eval)
register("ends_with", _str_resolver(T.BOOLEAN), _ends_with_eval)


def _split_part_eval(ctx, out_dtype, args):
    delim = _const_str(args[1], "split_part")
    index = int(args[2].py_value)

    def f(s):
        parts = s.split(delim)
        return parts[index - 1] if 1 <= index <= len(parts) else None
    return _dict_map_nullable(args[0], f)


register("split_part",
         lambda ts: T.VARCHAR if ts and ts[0].is_string else None,
         _split_part_eval)
