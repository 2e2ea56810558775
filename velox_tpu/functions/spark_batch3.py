"""Spark SQL function breadth, batches 3-4.

Role parity: ``velox/functions/sparksql`` registrations missing after
batch 2 (Register.cpp's list diffed against the registry): string
utilities (left/instr/startswith/endswith/bit_length/chr/conv/sha1/sha2/
mask/empty2null/split), datetime unit casts (timestamp_micros/millis,
unix_seconds/millis/micros, date_from_unix_date, year_of_week,
to_unix_timestamp), seeded hashes, decimal unscaled_value, id generators,
raise_error, HOF/array aliases (rlike, exists, forall, aggregate,
sort_array, get_json_object, regexp_extract_all), and batch 4:
get/array_repeat/map_from_arrays/str_to_map/from_utc_timestamp/
to_utc_timestamp/make_timestamp.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from velox_tpu import types as T
from velox_tpu.expression.eval import EvalValue, merge_validity
from velox_tpu.functions.registry import _REGISTRY, register  # noqa: F401
from velox_tpu.functions.scalar import _dict_lookup, _dict_map
from velox_tpu.vector.device import Dictionary
from velox_tpu.functions.signature import sig
from velox_tpu.functions.sparksql import _alias, _alias_special, _const_arg

# ---- straight aliases (shared implementations) ----------------------------

_alias("rlike", "regexp_like")
_alias("exists", "any_match")
_alias_special("exists", "any_match")
_alias("forall", "all_match")
_alias_special("forall", "all_match")
_alias("aggregate", "reduce")
_alias_special("aggregate", "reduce")
_alias("get_json_object", "json_extract")
_alias("instr", "strpos")
_alias("to_unix_timestamp", "unix_timestamp")
# array_sort evaluates as a special form (per-row sort lives in
# expression space); alias both the registry entry (return typing) and
# the special form (evaluation)
_alias("sort_array", "array_sort")  # 1-arg ascending form
_alias_special("sort_array", "array_sort")


# ---- string utilities (dictionary space) ----------------------------------

def _left_eval(ctx, out_dtype, args):
    n = int(_const_arg(args, 1, "left"))
    return _dict_map(args[0], lambda s: s[:max(0, n)])


register("left", sig("string, integral -> varchar"), _left_eval)


def _startswith_eval(ctx, out_dtype, args):
    p = str(_const_arg(args, 1, "startswith"))
    return _dict_lookup(args[0], lambda s: s.startswith(p), T.BOOLEAN)


def _endswith_eval(ctx, out_dtype, args):
    p = str(_const_arg(args, 1, "endswith"))
    return _dict_lookup(args[0], lambda s: s.endswith(p), T.BOOLEAN)


register("startswith", sig("string, string -> boolean"), _startswith_eval)
register("endswith", sig("string, string -> boolean"), _endswith_eval)


def _bit_length_eval(ctx, out_dtype, args):
    return _dict_lookup(args[0], lambda s: 8 * len(s.encode("utf-8")),
                        T.INTEGER)


register("bit_length", sig("string -> integer"), _bit_length_eval)


def _chr_eval(ctx, out_dtype, args):
    """chr(n): ASCII char of n % 256; n < 0 -> '' (Spark Chr semantics,
    sparksql/String.h)."""
    vals = sorted({chr(i) for i in range(256)} | {""})
    d = Dictionary(vals)
    d.is_sorted = True
    ids = {v: i for i, v in enumerate(vals)}
    table = jnp.asarray(np.array(
        [ids[chr(i)] for i in range(256)], np.int32))
    empty_id = jnp.int32(ids[""])
    n = args[0].full_data(ctx.capacity).astype(jnp.int64)
    data = jnp.where(n < 0, empty_id, table[(n % 256).astype(jnp.int32)])
    return EvalValue(data, args[0].validity, T.VARCHAR, d)


def _int_resolver(out):
    def r(ts):
        return out if len(ts) >= 1 and ts[0].is_integral else None
    return r


register("chr", _int_resolver(T.VARCHAR), _chr_eval)


def _conv_eval(ctx, out_dtype, args):
    fb = int(_const_arg(args, 1, "conv"))
    tb = int(_const_arg(args, 2, "conv"))
    digs = "0123456789abcdefghijklmnopqrstuvwxyz"

    def f(s):
        try:
            v = int(s.strip(), fb)
        except ValueError:
            return ""
        if v == 0:
            return "0"
        if v < 0:
            # Spark NumberConverter: negative values wrap to unsigned
            # 64-bit before re-encoding (sparksql conv semantics)
            v &= (1 << 64) - 1
        out = []
        while v:
            out.append(digs[v % tb])
            v //= tb
        return "".join(reversed(out)).upper()
    return _dict_map(args[0], f)


register("conv", sig("string, integral, integral -> varchar"), _conv_eval)


def _sha1_eval(ctx, out_dtype, args):
    import hashlib
    return _dict_map(args[0],
                     lambda s: hashlib.sha1(s.encode()).hexdigest())


def _sha2_eval(ctx, out_dtype, args):
    import hashlib
    bits = int(_const_arg(args, 1, "sha2", 256)) or 256
    algo = {224: hashlib.sha224, 256: hashlib.sha256,
            384: hashlib.sha384, 512: hashlib.sha512}.get(bits)
    if algo is None:
        raise ValueError(f"sha2: unsupported bit length {bits}")
    return _dict_map(args[0], lambda s: algo(s.encode()).hexdigest())


register("sha1", sig("string -> varchar"), _sha1_eval)
register("sha2", sig("string, integral -> varchar"), _sha2_eval)


def _mask_eval(ctx, out_dtype, args):
    """mask(s[, upper, lower, digit, other]) — Spark MaskFunction.h
    defaults X/x/n/unchanged; a NULL (None) replacement keeps the class."""
    up = _const_arg(args, 1, "mask", "X")
    lo = _const_arg(args, 2, "mask", "x")
    dg = _const_arg(args, 3, "mask", "n")
    ot = _const_arg(args, 4, "mask", "\0")

    def repl(c):
        if c.isupper():
            return c if up is None else str(up)
        if c.islower():
            return c if lo is None else str(lo)
        if c.isdigit():
            return c if dg is None else str(dg)
        return c if (ot is None or ot == "\0") else str(ot)
    return _dict_map(args[0], lambda s: "".join(repl(c) for c in s))


def _mask_resolver(ts):
    if ts and ts[0].is_string and len(ts) <= 5:
        return T.VARCHAR
    return None


register("mask", _mask_resolver, _mask_eval)


def _empty2null_eval(ctx, out_dtype, args):
    v = args[0]
    nonempty = _dict_lookup(v, lambda s: len(s) > 0, T.BOOLEAN)
    validity = nonempty.data.astype(bool)
    if v.validity is not None:
        validity = validity & v.full_validity(ctx.capacity)
    return EvalValue(v.data, validity, v.dtype, v.dictionary)


register("empty2null", sig("string -> varchar"), _empty2null_eval)


# ---- datetime unit casts ---------------------------------------------------

def _scale_resolver(out):
    def r(ts):
        return out if len(ts) == 1 else None
    return r


def _date_from_unix_date_eval(ctx, out_dtype, args):
    d = args[0].full_data(ctx.capacity).astype(jnp.int32)
    return EvalValue(d, args[0].validity, T.DATE)


register("date_from_unix_date", sig("integral -> date"),
         _date_from_unix_date_eval)


def _ts_scale_eval(mult):
    def eval_fn(ctx, out_dtype, args):
        v = args[0].full_data(ctx.capacity).astype(jnp.int64)
        return EvalValue(v * mult, args[0].validity, T.TIMESTAMP)
    return eval_fn


register("timestamp_micros", sig("integral -> timestamp"), _ts_scale_eval(1))
register("timestamp_millis", sig("integral -> timestamp"),
         _ts_scale_eval(1000))


def _unix_scale_eval(div):
    def eval_fn(ctx, out_dtype, args):
        v = args[0].full_data(ctx.capacity).astype(jnp.int64)
        # floor division (negative timestamps round toward -inf, matching
        # Spark's MICROS_PER_SECOND floorDiv)
        return EvalValue(v // div, args[0].validity, T.BIGINT)
    return eval_fn


register("unix_micros", sig("timestamp -> bigint"), _unix_scale_eval(1))
register("unix_millis", sig("timestamp -> bigint"), _unix_scale_eval(1000))
register("unix_seconds", sig("timestamp -> bigint"),
         _unix_scale_eval(1_000_000))


def _year_of_week_eval(ctx, out_dtype, args):
    """ISO week-numbering year: the calendar year of the Thursday in the
    date's ISO week (epoch 1970-01-01 is a Thursday)."""
    from velox_tpu.functions.scalar import _civil_from_days
    days = args[0].full_data(ctx.capacity).astype(jnp.int64)
    thursday = days - (days + 3) % 7 + 3
    y, _, _ = _civil_from_days(thursday)
    return EvalValue(y.astype(jnp.int32), args[0].validity, T.INTEGER)


register("year_of_week", sig("date -> integer"), _year_of_week_eval)


# ---- seeded hashes / decimal / ids -----------------------------------------

def _hash_with_seed_eval(ctx, out_dtype, args):
    from velox_tpu.functions.sparksql import _spark_hash_eval
    seed = int(_const_arg(args, 0, "hash_with_seed"))
    return _spark_hash_eval(ctx, out_dtype, args[1:], seed=seed)


def _xxhash64_with_seed_eval(ctx, out_dtype, args):
    from velox_tpu.functions.sparksql import _spark_xxhash64_eval
    seed = int(_const_arg(args, 0, "xxhash64_with_seed"))
    return _spark_xxhash64_eval(ctx, out_dtype, args[1:], seed=seed)


def _seeded_resolver(out):
    def r(ts):
        return out if len(ts) >= 2 and ts[0].is_integral else None
    return r


register("hash_with_seed", _seeded_resolver(T.INTEGER),
         _hash_with_seed_eval)
register("xxhash64_with_seed", _seeded_resolver(T.BIGINT),
         _xxhash64_with_seed_eval)


def _unscaled_value_eval(ctx, out_dtype, args):
    v = args[0].full_data(ctx.capacity).astype(jnp.int64)
    return EvalValue(v, args[0].validity, T.BIGINT)


def _unscaled_resolver(ts):
    if len(ts) == 1 and ts[0].kind is T.TypeKind.DECIMAL \
            and not ts[0].is_long_decimal:
        return T.BIGINT
    return None


register("unscaled_value", _unscaled_resolver, _unscaled_value_eval)


def _mono_id_eval(ctx, out_dtype, args):
    """Expression-space id generation cannot see the batch ordinal (all
    batches of a scan share one traced program), so ids would RESTART
    per batch — silently duplicated "unique" ids. The plan-level
    AssignUniqueId operator (exec/misc_ops.py, the reference's
    AssignUniqueId node) is the supported form."""
    raise NotImplementedError(
        "monotonically_increasing_id: use the AssignUniqueId plan node "
        "(PlanBuilder.assign_unique_id) — expression-space ids would "
        "repeat across batches")


def _partition_id_eval(ctx, out_dtype, args):
    return EvalValue(jnp.zeros((ctx.capacity,), jnp.int32), None,
                     T.INTEGER)


def _nullary(out):
    def r(ts):
        return out if len(ts) == 0 else None
    return r


register("monotonically_increasing_id", _nullary(T.BIGINT), _mono_id_eval)
register("spark_partition_id", _nullary(T.INTEGER), _partition_id_eval)


def _raise_error_eval(ctx, out_dtype, args):
    """Flags every active row as errored (the traced error channel,
    expression/eval.py EvalCtx.flag_error): Task.run raises a
    VeloxUserError with the message appended as a trace-time note;
    TRY(...) converts to NULL — Spark RaiseError.h."""
    if args and getattr(args[0], "py_value", None) is not None:
        from velox_tpu.common.errors import note_traced_error
        note_traced_error(str(args[0].py_value))
    ctx.flag_error(jnp.ones((ctx.capacity,), bool))
    return EvalValue(jnp.zeros((ctx.capacity,), bool),
                     jnp.zeros((ctx.capacity,), bool), T.UNKNOWN)


def _raise_resolver(ts):
    return T.UNKNOWN if len(ts) <= 1 else None


register("raise_error", _raise_resolver, _raise_error_eval)


# ---- dictionary-space list explode: split / regexp_extract_all -------------

def _explode_core(v: EvalValue, ctx, parts):
    """Shared machinery for dictionary-space list explodes: given the
    per-DISTINCT-VALUE part lists, return (lens, src, in_use) where
    ``src`` gathers each output element's index into the flat
    concatenation of ``parts`` (trace-time python; row space sees only
    device gathers + one searchsorted row recovery)."""
    maxlen = max((len(p) for p in parts), default=0)
    L = np.array([len(ps) for ps in parts], np.int32)
    O = np.concatenate([[0], np.cumsum(L)[:-1]]).astype(np.int32)
    cap = ctx.capacity
    ids = v.data.astype(jnp.int32)
    lens = jnp.asarray(L)[ids]
    starts = jnp.cumsum(lens) - lens  # row-space element offsets
    child_cap = max(1, cap * max(1, maxlen))
    e = jnp.arange(child_cap, dtype=jnp.int32)
    # element e belongs to the row whose offset run contains it
    row = jnp.clip(
        jnp.searchsorted(starts + lens, e, side="right"), 0, cap - 1
    ).astype(jnp.int32)
    pos = e - starts[row]
    n_flat = max(1, int(L.sum()))
    src = jnp.clip(jnp.asarray(O)[ids[row]] + pos, 0, n_flat - 1)
    in_use = e < (starts[-1] + lens[-1])
    return lens.astype(jnp.int32), src, in_use


def _flat_string_child(parts, src, in_use):
    """VARCHAR child column gathering ``src`` from the flat parts."""
    from velox_tpu.vector.device import DeviceColumn
    all_parts = sorted({p for ps in parts for p in ps})
    pid = {p: i for i, p in enumerate(all_parts)}
    child_dict = Dictionary(all_parts)
    child_dict.is_sorted = True
    flat = np.array([pid[p] for ps in parts for p in ps], np.int32)
    if len(flat) == 0:
        flat = np.zeros((1,), np.int32)
    child_data = jnp.where(in_use, jnp.asarray(flat)[src], 0)
    return DeviceColumn(child_data, None, T.VARCHAR, child_dict)


def _explode_dict(v: EvalValue, ctx, f):
    """ARRAY(VARCHAR) from a per-distinct-value list function ``f``."""
    from velox_tpu.functions.scalar import _require_dict
    d = _require_dict(v, "split")
    parts = [f(x) for x in d.values]
    lens, src, in_use = _explode_core(v, ctx, parts)
    child = _flat_string_child(parts, src, in_use)
    return EvalValue(lens, v.validity, T.array(T.VARCHAR),
                     children=(child,))


def _split_eval(ctx, out_dtype, args):
    import re as _re
    delim = str(_const_arg(args, 1, "split"))
    limit = int(_const_arg(args, 2, "split", -1))
    pat = _re.compile(delim)

    def f(s):
        return pat.split(s, maxsplit=(limit - 1 if limit > 0 else 0))
    return _explode_dict(args[0], ctx, f)


register("split", sig("string, string -> array(varchar)"), _split_eval)
register("split", sig("string, string, integral -> array(varchar)"),
         _split_eval)


def _regexp_extract_all_eval(ctx, out_dtype, args):
    import re as _re
    pat = _re.compile(str(_const_arg(args, 1, "regexp_extract_all")))
    group = int(_const_arg(args, 2, "regexp_extract_all", 0))

    def f(s):
        return [m.group(group) or "" for m in pat.finditer(s)]
    return _explode_dict(args[0], ctx, f)


register("regexp_extract_all",
         sig("string, string -> array(varchar)"),
         _regexp_extract_all_eval)
register("regexp_extract_all",
         sig("string, string, integral -> array(varchar)"),
         _regexp_extract_all_eval)


# ---- batch 4: arrays/maps/timestamps --------------------------------------

def _get_eval(ctx, out_dtype, args):
    """Spark get(array, index): 0-based, NULL (not error) out of bounds."""
    arr, idx = args
    child = arr.children[0]
    lens = arr.data.astype(jnp.int64)
    from velox_tpu.functions.complex import _offsets
    starts = _offsets(arr).astype(jnp.int64)
    i = idx.full_data(ctx.capacity).astype(jnp.int64)
    in_bounds = (i >= 0) & (i < lens)
    src = jnp.clip(starts + i, 0, child.capacity - 1).astype(jnp.int32)
    data = child.data[src]
    validity = in_bounds
    if arr.validity is not None:
        validity = validity & arr.validity
    if idx.validity is not None:
        validity = validity & idx.full_validity(ctx.capacity)
    if child.validity is not None:
        validity = validity & child.validity[src]
    return EvalValue(data, validity, arr.dtype.children[0],
                     child.dictionary)


def _get_resolver(ts):
    if len(ts) == 2 and ts[0].kind is T.TypeKind.ARRAY \
            and ts[1].is_integral:
        return ts[0].children[0]
    return None


register("get", _get_resolver, _get_eval)


def _array_repeat_eval(ctx, out_dtype, args):
    """array_repeat(elem, n): n must be a constant (static child shape)."""
    elem, cnt = args
    n = int(_const_arg(args, 1, "array_repeat"))
    n = max(0, n)
    cap = ctx.capacity
    data = elem.full_data(cap)
    from velox_tpu.vector.device import DeviceColumn
    child_data = jnp.repeat(data, max(1, n))[:cap * max(1, n)] \
        if n else jnp.zeros((1,), data.dtype)
    validity = None
    if elem.validity is not None and n:
        validity = jnp.repeat(elem.full_validity(cap), n)
    child = DeviceColumn(child_data, validity, elem.dtype,
                         elem.dictionary)
    lens = jnp.full((cap,), n, jnp.int32)
    return EvalValue(lens, None, T.array(elem.dtype), children=(child,))


def _array_repeat_resolver(ts):
    if len(ts) == 2 and ts[1].is_integral:
        return T.array(ts[0])
    return None


register("array_repeat", _array_repeat_resolver, _array_repeat_eval)


def _map_from_arrays_eval(ctx, out_dtype, args):
    """map_from_arrays(keys, values): lengths must match per row — a
    mismatch flags the traced error channel (Spark raises)."""
    ka, va = args
    lens_k = ka.data.astype(jnp.int32)
    lens_v = va.data.astype(jnp.int32)
    bad = (lens_k != lens_v)
    ok_rows = jnp.ones((ctx.capacity,), bool)
    if ka.validity is not None:
        ok_rows = ok_rows & ka.validity
    if va.validity is not None:
        ok_rows = ok_rows & va.validity
    ctx.flag_error(bad & ok_rows)
    return EvalValue(lens_k, merge_validity(ka, va),
                     T.map_(ka.dtype.children[0], va.dtype.children[0]),
                     children=(ka.children[0], va.children[0]))


def _map_from_arrays_resolver(ts):
    if len(ts) == 2 and ts[0].kind is T.TypeKind.ARRAY \
            and ts[1].kind is T.TypeKind.ARRAY:
        return T.map_(ts[0].children[0], ts[1].children[0])
    return None


register("map_from_arrays", _map_from_arrays_resolver,
         _map_from_arrays_eval)


def _local_to_utc(local_us, tz: str):
    """Local wall-clock micros -> UTC micros. TZif transition tables are
    indexed by UTC instants, so resolve with a double lookup: a first
    offset estimate at local-as-UTC, then the final offset at the
    corrected provisional instant (fixes the hour around each DST
    transition; ambiguous/skipped local times resolve to the
    post-transition offset)."""
    from velox_tpu.functions.datetime import _tz_offset_seconds
    off1 = _tz_offset_seconds(local_us, tz).astype(jnp.int64)
    off2 = _tz_offset_seconds(local_us - off1 * 1_000_000,
                              tz).astype(jnp.int64)
    return local_us - off2 * 1_000_000


def _from_utc_eval(ctx, out_dtype, args):
    from velox_tpu.functions.datetime import _tz_offset_seconds
    ts = args[0].full_data(ctx.capacity).astype(jnp.int64)
    tz = str(_const_arg(args, 1, "from_utc_timestamp"))
    off = _tz_offset_seconds(ts, tz).astype(jnp.int64)
    return EvalValue(ts + off * 1_000_000, args[0].validity, T.TIMESTAMP)


def _to_utc_eval(ctx, out_dtype, args):
    ts = args[0].full_data(ctx.capacity).astype(jnp.int64)
    tz = str(_const_arg(args, 1, "to_utc_timestamp"))
    return EvalValue(_local_to_utc(ts, tz), args[0].validity, T.TIMESTAMP)


register("from_utc_timestamp", sig("timestamp, string -> timestamp"),
         _from_utc_eval)
register("to_utc_timestamp", sig("timestamp, string -> timestamp"),
         _to_utc_eval)


def _make_timestamp_eval(ctx, out_dtype, args):
    """make_timestamp(y, mo, d, h, mi, sec[, tz]) — sec may be DECIMAL
    with fractional micros; invalid civil fields -> NULL (Spark ANSI-off
    behavior)."""
    from velox_tpu.functions.scalar import _days_from_civil
    cap = ctx.capacity
    y, mo, d, h, mi = [a.full_data(cap).astype(jnp.int64)
                       for a in args[:5]]
    sec = args[5]
    if sec.dtype.kind is T.TypeKind.DECIMAL:
        micros = sec.full_data(cap).astype(jnp.int64) \
            * (10 ** max(0, 6 - sec.dtype.scale))
    else:
        micros = sec.full_data(cap).astype(jnp.int64) * 1_000_000
    ok = ((mo >= 1) & (mo <= 12) & (d >= 1) & (d <= 31)
          & (h >= 0) & (h < 24) & (mi >= 0) & (mi < 60)
          & (micros >= 0) & (micros < 61_000_000))
    days = _days_from_civil(y, mo, d)
    ts = (days * 86_400 + h * 3_600 + mi * 60) * 1_000_000 + micros
    if len(args) > 6:  # 7-arg form: fields are local time in this zone
        ts = _local_to_utc(ts, str(_const_arg(args, 6, "make_timestamp")))
    validity = ok
    for a in args[:6]:
        if a.validity is not None:
            validity = validity & a.full_validity(cap)
    return EvalValue(ts, validity, T.TIMESTAMP)


def _make_ts_resolver(ts):
    if len(ts) in (6, 7):
        return T.TIMESTAMP
    return None


register("make_timestamp", _make_ts_resolver, _make_timestamp_eval)


def _str_to_map_eval(ctx, out_dtype, args):
    """str_to_map(s[, entry_delim, kv_delim]): ONE dictionary-space
    explode; keys/values/null-flags are positionally parallel flat
    tables over the shared offsets layout."""
    from velox_tpu.functions.scalar import _require_dict
    from velox_tpu.vector.device import DeviceColumn
    v = args[0]
    d1 = str(_const_arg(args, 1, "str_to_map", ","))
    d2 = str(_const_arg(args, 2, "str_to_map", ":"))
    d = _require_dict(v, "str_to_map")
    pairs = []
    for s in d.values:
        kv = []
        for part in (s.split(d1) if s else []):
            k, _, val = part.partition(d2)
            kv.append((k, val if d2 in part else None))
        pairs.append(kv)
    lens, src, in_use = _explode_core(v, ctx, pairs)
    kchild = _flat_string_child([[k for k, _ in ps] for ps in pairs],
                                src, in_use)
    vchild = _flat_string_child(
        [["" if x is None else x for _, x in ps] for ps in pairs],
        src, in_use)
    flat_null = np.array([x is None for ps in pairs for _, x in ps],
                         bool)
    if len(flat_null) == 0:
        flat_null = np.zeros((1,), bool)
    isnull = jnp.where(in_use, jnp.asarray(flat_null)[src], False)
    vchild = DeviceColumn(vchild.data, ~isnull, T.VARCHAR,
                          vchild.dictionary)
    return EvalValue(lens, v.validity, T.map_(T.VARCHAR, T.VARCHAR),
                     children=(kchild, vchild))


def _str_to_map_resolver(ts):
    if ts and ts[0].is_string and len(ts) <= 3:
        return T.map_(T.VARCHAR, T.VARCHAR)
    return None


register("str_to_map", _str_to_map_resolver, _str_to_map_eval)


def _arrays_zip_eval(ctx, out_dtype, args):
    """arrays_zip(a, b) -> array(row(0, 1)): element j of the output row
    pairs a[j] with b[j]; the shorter array contributes NULLs (Spark
    ArraysZip). Output element space is a fresh layout sized
    |a elements| + |b elements| (>= sum of per-row max lengths)."""
    from velox_tpu.vector.device import DeviceColumn
    a, b = args
    ca, cb = a.children[0], b.children[0]
    la = a.data.astype(jnp.int32)
    lb = b.data.astype(jnp.int32)
    lo = jnp.maximum(la, lb)
    starts_out = jnp.cumsum(lo) - lo
    out_cap = ca.capacity + cb.capacity
    cap = ctx.capacity
    e = jnp.arange(out_cap, dtype=jnp.int32)
    row = jnp.clip(jnp.searchsorted(starts_out + lo, e, side="right"),
                   0, cap - 1).astype(jnp.int32)
    pos = e - starts_out[row]

    def field(arr, child, lens):
        from velox_tpu.functions.complex import _offsets
        offs = _offsets(arr)
        in_src = pos < lens[row]
        src = jnp.clip(offs[row] + pos, 0, child.capacity - 1) \
            .astype(jnp.int32)
        data = child.data[src]
        validity = in_src
        if child.validity is not None:
            validity = validity & child.validity[src]
        return DeviceColumn(data, validity,
                            arr.dtype.children[0], child.dictionary)

    f0 = field(a, ca, la)
    f1 = field(b, cb, lb)
    rt = out_dtype.children[0]
    row_child = DeviceColumn(jnp.zeros((out_cap,), jnp.int32), None, rt,
                             None, (f0, f1))
    return EvalValue(lo, merge_validity(a, b), out_dtype,
                     children=(row_child,))


def _arrays_zip_resolver(ts):
    if len(ts) == 2 and all(t.kind is T.TypeKind.ARRAY for t in ts):
        return T.array(T.row(["0", "1"],
                             [ts[0].children[0], ts[1].children[0]]))
    return None


register("arrays_zip", _arrays_zip_resolver, _arrays_zip_eval)


def _json_object_keys_eval(ctx, out_dtype, args):
    """json_object_keys(json): top-level keys in order, NULL for
    non-objects (Spark JsonObjectKeys.h) — dictionary-space explode."""
    import json as _json
    from velox_tpu.functions.scalar import _require_dict
    v = args[0]
    d = _require_dict(v, "json_object_keys")
    is_obj = []
    for s in d.values:
        try:
            val = _json.loads(s)
            is_obj.append(isinstance(val, dict))
        except Exception:
            is_obj.append(False)

    def f(s):
        try:
            val = _json.loads(s)
        except Exception:
            return []
        return list(val.keys()) if isinstance(val, dict) else []
    out = _explode_dict(v, ctx, f)
    objness = _dict_lookup(
        EvalValue(v.data, None, T.VARCHAR, d),
        lambda s, _t={x: i for i, x in enumerate(d.values)}:
        is_obj[_t[s]], T.BOOLEAN)
    validity = objness.data.astype(bool)
    if v.validity is not None:
        validity = validity & v.full_validity(ctx.capacity)
    return EvalValue(out.data, validity, out.dtype, children=out.children)


register("json_object_keys", sig("string -> array(varchar)"),
         _json_object_keys_eval)


def _might_contain_eval(ctx, out_dtype, args):
    """might_contain(bloom, x): tests the k=3 double-hashed bit probes
    against an ARRAY(INTEGER) bloom sketch (bloom_filter_agg's layout —
    functions/aggregates.py BloomFilterAgg; Spark MightContain.h parity
    with a different sketch encoding). NULL bloom or NULL x -> NULL."""
    from velox_tpu.exec.hashtable import bloom_hashes
    from velox_tpu.functions.aggregates import BloomFilterAgg
    from velox_tpu.functions.complex import _offsets
    arr, x = args
    cap = ctx.capacity
    child = arr.children[0]
    lens = arr.data.astype(jnp.int32)
    starts = _offsets(arr)
    m = lens * 32  # bits; power of two by construction
    h1, h2 = bloom_hashes(x, cap)
    hit = jnp.ones((cap,), bool)
    cw = jax.lax.bitcast_convert_type(
        child.data.astype(jnp.int32), jnp.uint32)
    for i in range(BloomFilterAgg.K):
        p = ((h1 + np.uint32(i) * h2).astype(jnp.int64)
             % jnp.maximum(m, 1).astype(jnp.int64)).astype(jnp.int32)
        wi = p >> 5
        bi = (p & 31).astype(jnp.uint32)
        src = jnp.clip(starts + wi, 0, child.capacity - 1)
        w = cw[src]
        hit = hit & (((w >> bi) & jnp.uint32(1)) != 0)
    validity = lens > 0
    if arr.validity is not None:
        validity = validity & arr.validity
    if x.validity is not None:
        validity = validity & x.full_validity(cap)
    return EvalValue(hit, validity, T.BOOLEAN)


def _might_contain_resolver(ts):
    if len(ts) == 2 and ts[0].kind is T.TypeKind.ARRAY:
        return T.BOOLEAN
    return None


register("might_contain", _might_contain_resolver, _might_contain_eval)


def _array_ctor_eval(ctx, out_dtype, args):
    """array(e1, ..., eN): per-row N-element arrays (row-major
    interleave — dense layout)."""
    from velox_tpu.vector.device import DeviceColumn
    cap = ctx.capacity
    et = out_dtype.children[0]
    n = len(args)
    if n == 0:
        child = DeviceColumn(jnp.zeros((1,), et.np_dtype()), None, et,
                             None)
        return EvalValue(jnp.zeros((cap,), jnp.int32), None, out_dtype,
                         children=(child,))
    # unify string dictionaries across the operands
    dicts = [a.dictionary for a in args]
    d0 = next((d for d in dicts if d is not None), None)
    datas = [a.full_data(cap) for a in args]
    if d0 is not None and any(d is not None and d is not d0
                              for d in dicts):
        raise NotImplementedError(
            "array(): string operands must share one dictionary")
    # common element dtype (Spark promotes to the least common type;
    # casting everything to arg0's dtype silently truncated doubles)
    common = np.result_type(*[np.dtype(d.dtype) for d in datas])
    data = jnp.stack([d.astype(common) for d in datas],
                     axis=1).reshape(-1)
    validity = None
    if any(a.validity is not None for a in args):
        validity = jnp.stack(
            [a.full_validity(cap) for a in args], axis=1).reshape(-1)
    child = DeviceColumn(data, validity, et, d0)
    return EvalValue(jnp.full((cap,), n, jnp.int32), None, out_dtype,
                     children=(child,))


def _array_ctor_resolver(ts):
    if not ts:
        return None
    t0 = ts[0]
    if all(t == t0 for t in ts):
        return T.array(t0)
    if all(t.is_numeric for t in ts):
        # least-common numeric element type (Spark TypeCoercion)
        out = t0
        for t in ts[1:]:
            from velox_tpu.functions.scalar import promote_numeric
            out = promote_numeric(out, t)
        return T.array(out)
    return None


register("array", _array_ctor_resolver, _array_ctor_eval)


def _map_ctor_eval(ctx, out_dtype, args):
    """map(k1, v1, ..., kN, vN). NULL keys and duplicate keys flag the
    traced error channel (Spark: 'Cannot use null as map key' /
    EXCEPTION dedup policy); TRY(map(...)) gives NULL rows instead."""
    cap = ctx.capacity
    keys = args[0::2]
    ka = _array_ctor_eval(ctx, T.array(out_dtype.children[0]), keys)
    va = _array_ctor_eval(ctx, T.array(out_dtype.children[1]), args[1::2])
    bad = jnp.zeros((cap,), bool)
    for k in keys:
        if k.validity is not None:
            bad = bad | ~k.full_validity(cap)
    for i in range(len(keys)):
        for j in range(i + 1, len(keys)):
            bad = bad | (keys[i].full_data(cap) == keys[j].full_data(cap))
    ctx.flag_error(bad)
    return EvalValue(ka.data, None, out_dtype,
                     children=(ka.children[0], va.children[0]))


def _map_ctor_resolver(ts):
    if len(ts) >= 2 and len(ts) % 2 == 0:
        return T.map_(ts[0], ts[1])
    return None


register("map", _map_ctor_resolver, _map_ctor_eval)


def _get_timestamp_eval(ctx, out_dtype, args):
    """get_timestamp(s, fmt): parse with a Java SimpleDateFormat-style
    pattern (the common subset maps onto strptime); unparseable -> NULL.
    Dictionary-space (one parse per distinct value)."""
    import datetime as _dt
    import re as _re
    fmt = str(_const_arg(args, 1, "get_timestamp"))
    # Java SimpleDateFormat tokens -> strptime, longest-first via one
    # regex pass (sequential str.replace corrupted adjacent tokens)
    _TOK = {"yyyy": "%Y", "yy": "%y", "MM": "%m", "M": "%m",
            "dd": "%d", "d": "%d", "HH": "%H", "H": "%H",
            "mm": "%M", "m": "%M", "ss": "%S", "s": "%S"}
    parts = []
    for piece in _re.split(r"(y+|M+|d+|H+|m+|s+)", fmt):
        if not piece:
            continue
        if _re.fullmatch(r"y+|M+|d+|H+|m+|s+", piece):
            if piece not in _TOK:
                raise NotImplementedError(
                    f"get_timestamp: unsupported pattern token "
                    f"{piece!r} in {fmt!r}")
            parts.append(_TOK[piece])
        else:
            if _re.search(r"[A-Za-z%]", piece):
                raise NotImplementedError(
                    f"get_timestamp: unsupported pattern literal "
                    f"{piece!r} in {fmt!r}")
            parts.append(piece)
    pyfmt = "".join(parts)

    def f(s):
        try:
            d = _dt.datetime.strptime(s, pyfmt)
        except ValueError:
            return None
        return int((d - _dt.datetime(1970, 1, 1)).total_seconds()
                   * 1_000_000)
    from velox_tpu.functions.scalar import _require_dict
    d = _require_dict(args[0], "get_timestamp")
    vals = [f(x) for x in d.values]
    table = jnp.asarray(np.array([0 if v is None else v for v in vals],
                                 np.int64))
    okt = jnp.asarray(np.array([v is not None for v in vals], bool))
    ids = args[0].data.astype(jnp.int32)
    validity = okt[ids]
    if args[0].validity is not None:
        validity = validity & args[0].full_validity(ctx.capacity)
    return EvalValue(table[ids], validity, T.TIMESTAMP)


register("get_timestamp", sig("string, string -> timestamp"),
         _get_timestamp_eval)
