"""Spark function batch 3 (velox_tpu/functions/spark_batch3.py).

Expected values checked against Spark semantics (reference:
velox/functions/sparksql Register.cpp function set)."""
import datetime as dt
import hashlib

import numpy as np
import pyarrow as pa

from velox_tpu.exec.task import Task
from velox_tpu.testing.plan_builder import PlanBuilder


def run_proj(t, exprs):
    return Task(PlanBuilder().values([t]).project(exprs).plan()).run()


def test_string_batch3():
    t = pa.table({"s": pa.array(["Hello World7", "abc", ""])})
    out = run_proj(t, [
        "left(s, 3) as lf", "startswith(s, 'He') as sw",
        "endswith(s, 'c') as ew", "bit_length(s) as bl",
        "sha1(s) as h1", "sha2(s, 256) as h2",
        "mask(s) as mk", "instr(s, 'l') as ins",
    ]).to_pandas()
    assert list(out.lf) == ["Hel", "abc", ""]
    assert list(out.sw) == [True, False, False]
    assert list(out.ew) == [False, True, False]
    assert list(out.bl) == [96, 24, 0]
    assert out.h1[1] == hashlib.sha1(b"abc").hexdigest()
    assert out.h2[1] == hashlib.sha2 if False else \
        out.h2[1] == hashlib.sha256(b"abc").hexdigest()
    assert out.mk[0] == "Xxxxx Xxxxxn"
    assert list(out.ins) == [3, 0, 0]


def test_chr_conv_empty2null():
    t = pa.table({"n": pa.array([65, 97, -1, 321], pa.int64()),
                  "s": pa.array(["ff", "10", "", "zz"])})
    out = run_proj(t, ["chr(n) as c", "conv(s, 16, 10) as cv",
                       "empty2null(s) as e"]).to_pandas()
    assert list(out.c) == ["A", "a", "", chr(321 % 256)]
    assert out.cv[0] == "255" and out.cv[1] == "16"
    assert out.e.isna()[2]  # '' -> NULL (to_pandas renders NULL as NaN)
    assert out.e[0] == "ff"


def test_datetime_units():
    d0 = (dt.date(2005, 1, 2) - dt.date(1970, 1, 1)).days  # ISO year 2004
    t = pa.table({
        "u": pa.array([0, 19000], pa.int64()),
        "ts": pa.array([1_700_000_123_456_789, -1], pa.int64())
        .cast(pa.timestamp("us")),
        "d": pa.array([d0, 19000], pa.int32()).cast(pa.date32()),
    })
    out = run_proj(t, [
        "date_from_unix_date(u) as dd",
        "timestamp_millis(u) as tm", "timestamp_micros(u) as tu",
        "unix_seconds(ts) as us", "unix_millis(ts) as um",
        "unix_micros(ts) as uu", "year_of_week(d) as yw",
    ]).to_pandas()
    assert out.dd[1] == dt.date(1970, 1, 1) + dt.timedelta(days=19000)
    assert out.tu[1] == dt.datetime(1970, 1, 1) \
        + dt.timedelta(microseconds=19000)
    assert out.tm[1] == dt.datetime(1970, 1, 1) \
        + dt.timedelta(milliseconds=19000)
    assert out.us[0] == 1_700_000_123 and out.us[1] == -1  # floor div
    assert out.um[0] == 1_700_000_123_456
    assert out.uu[0] == 1_700_000_123_456_789
    assert out.yw[0] == 2004  # 2005-01-02 is ISO week 53 of 2004


def test_seeded_hashes_and_ids():
    t = pa.table({"x": pa.array([1, 2, 3], pa.int64())})
    out = run_proj(t, [
        "hash(x) as h", "hash_with_seed(42, x) as hs",
        "xxhash64(x) as xx", "xxhash64_with_seed(42, x) as xs2",
        "spark_partition_id() as pid",
    ]).to_pandas()
    # seed 42 == the default-seed functions
    assert list(out.h) == list(out.hs)
    assert list(out.xx) == list(out.xs2)
    assert list(out.pid) == [0, 0, 0]
    # monotonically_increasing_id would restart per batch - refused in
    # expression space (AssignUniqueId is the plan-level form)
    import pytest
    with pytest.raises(Exception):
        run_proj(t, ["monotonically_increasing_id() as id"])


def test_unscaled_value():
    t = pa.table({"d": pa.array([dt_dec("1.23"), dt_dec("-0.05")],
                                pa.decimal128(10, 2))})
    out = run_proj(t, ["unscaled_value(d) as u"]).to_pandas()
    assert list(out.u) == [123, -5]


def dt_dec(s):
    import decimal
    return decimal.Decimal(s)


def test_split_and_extract_all():
    t = pa.table({"s": pa.array(["a,b,c", "x", "", "a,,b"])})
    out = run_proj(t, ["split(s, ',') as sp",
                       "regexp_extract_all(s, '[a-z]+') as ex"]).to_pandas()
    assert list(out.sp[0]) == ["a", "b", "c"]
    assert list(out.sp[1]) == ["x"]
    assert list(out.sp[2]) == [""]
    assert list(out.sp[3]) == ["a", "", "b"]
    assert list(out.ex[0]) == ["a", "b", "c"]
    assert list(out.ex[2]) == []


def test_rlike_exists_sort_array():
    t = pa.table({"s": pa.array(["abc123", "xyz"]),
                  "a": pa.array([[3, 1, 2], [5, 4, None]],
                                pa.list_(pa.int64()))})
    out = run_proj(t, ["rlike(s, '[0-9]+') as r",
                       "sort_array(a) as sa",
                       "exists(a, x -> x > 4) as ex",
                       "forall(a, x -> x > 1) as fa",
                       "aggregate(a, 0, (acc, x) -> acc + x, "
                       "acc -> acc) as ag"]).to_pandas()
    assert list(out.r) == [True, False]
    assert list(out.sa[0]) == [1, 2, 3]
    assert list(out.ex) == [False, True]
    assert out.fa[0] == False  # 1 > 1 fails  # noqa: E712
    assert out.ag[0] == 6


def test_raise_error_and_try():
    import pytest
    from velox_tpu.common.errors import VeloxUserError
    t = pa.table({"x": pa.array([1, 2], pa.int64())})
    with pytest.raises(VeloxUserError):
        run_proj(t, ["raise_error('boom') as e"])
    out = run_proj(t, ["try(raise_error('boom')) as e"]).to_pandas()
    assert out.e.isna().all()


def test_batch4_arrays_maps():
    t = pa.table({"a": pa.array([[10, 20, 30], [5]], pa.list_(pa.int64())),
                  "i": pa.array([1, 3], pa.int64()),
                  "x": pa.array([7, 8], pa.int64()),
                  "k": pa.array([["a", "b"], ["c"]], pa.list_(pa.string())),
                  "v": pa.array([[1, 2], [3]], pa.list_(pa.int64()))})
    out = run_proj(t, ["get(a, i) as g",
                       "array_repeat(x, 3) as ar",
                       "map_from_arrays(k, v) as m"]).to_pandas()
    assert out.g[0] == 20
    assert np.isnan(out.g[1])  # index 3 out of bounds -> NULL
    assert list(out.ar[0]) == [7, 7, 7]
    assert dict(out.m[0]) == {"a": 1, "b": 2}
    assert dict(out.m[1]) == {"c": 3}


def test_batch4_timestamps():
    t = pa.table({
        "ts": pa.array([1_700_000_000_000_000], pa.int64())
        .cast(pa.timestamp("us")),
        "y": pa.array([2024], pa.int64()),
    })
    out = run_proj(t, [
        "from_utc_timestamp(ts, 'America/Los_Angeles') as f",
        "to_utc_timestamp(from_utc_timestamp(ts, 'Asia/Tokyo'),"
        " 'Asia/Tokyo') as rt",
        "make_timestamp(y, 2, 29, 12, 30, 5) as mk",
    ]).to_pandas()
    # 2023-11-14 22:13:20 UTC -> LA is UTC-8 (PST)
    assert out.f[0] == out.rt[0] + (dt.datetime(1, 1, 1) - dt.datetime(1, 1, 1)) - dt.timedelta(hours=8)
    assert out.rt[0] == dt.datetime(2023, 11, 14, 22, 13, 20)
    assert out.mk[0] == dt.datetime(2024, 2, 29, 12, 30, 5)


def test_batch4_str_to_map():
    t = pa.table({"s": pa.array(["a:1,b:2", "x:9", ""])})
    out = run_proj(t, ["str_to_map(s) as m"]).to_pandas()
    assert dict(out.m[0]) == {"a": "1", "b": "2"}
    assert dict(out.m[1]) == {"x": "9"}
    assert dict(out.m[2]) == {}


def test_moments_and_first_last():
    import pandas as pd
    t = pa.table({"g": pa.array([1, 1, 1, 1, 1, 2, 2, 2, 2, 2], pa.int64()),
                  "x": pa.array([1.0, 2.0, 4.0, 8.0, 16.0,
                                 3.0, 3.0, 5.0, 9.0, 100.0])})
    out = Task(PlanBuilder().values([t]).single_aggregation(
        ["g"], ["skewness(x) as sk", "kurtosis(x) as ku",
                "first(x) as fi", "last(x) as la"]).plan()
    ).run().to_pandas().sort_values("g").reset_index(drop=True)
    df = t.to_pandas()
    for i, g in enumerate([1, 2]):
        xs = df[df.g == g].x
        assert abs(out.sk[i] - xs.skew() * ((len(xs) - 2) / np.sqrt(
            len(xs) * (len(xs) - 1)))) < 1e-9  # pandas is sample-adjusted
        assert abs(out.ku[i] - xs.kurtosis()) < 1e-9
    # DOUBLE first/last fall back to any-value (min/max) — Spark's
    # contract is non-deterministic without an order; check membership
    assert out.fi[0] in list(df[df.g == 1].x)
    assert out.la[1] in list(df[df.g == 2].x)


def test_first_last_positional_int32():
    t = pa.table({"g": pa.array([1, 1, 1, 2, 2], pa.int64()),
                  "x": pa.array([7, 3, 9, 4, None], pa.int32())})
    out = Task(PlanBuilder().values([t]).single_aggregation(
        ["g"], ["first(x) as fi", "last(x) as la"]).plan()
    ).run().to_pandas().sort_values("g").reset_index(drop=True)
    assert out.fi[0] == 7 and out.la[0] == 9
    assert out.fi[1] == 4 and out.la[1] == 4  # nulls skipped


def test_arrays_zip():
    t = pa.table({"a": pa.array([[1, 2, 3], [9]], pa.list_(pa.int64())),
                  "b": pa.array([[10, 20], [7, 8]], pa.list_(pa.int64()))})
    out = run_proj(t, ["arrays_zip(a, b) as z"]).to_pandas()
    z0 = [dict(r) for r in out.z[0]]
    assert z0[0] == {"0": 1, "1": 10}
    assert z0[1] == {"0": 2, "1": 20}
    assert z0[2]["0"] == 3 and z0[2]["1"] is None
    z1 = [dict(r) for r in out.z[1]]
    assert z1[0] == {"0": 9, "1": 7}
    assert z1[1]["0"] is None and z1[1]["1"] == 8


def test_json_object_keys():
    t = pa.table({"j": pa.array(['{"a": 1, "b": {"c": 2}}', '[1,2]',
                                 'nonsense'])})
    out = run_proj(t, ["json_object_keys(j) as k"]).to_pandas()
    assert list(out.k[0]) == ["a", "b"]
    assert out.k.isna()[1] and out.k.isna()[2]


def test_to_utc_timestamp_dst_edge():
    """03:00 local on the US spring-forward day is PDT (UTC-7): the
    offset must resolve at the corrected UTC instant, not at
    local-as-UTC (which is still PST)."""
    base = np.datetime64("2024-03-10T03:00:00", "us").astype("int64")
    t = pa.table({"ts": pa.array([int(base)], pa.int64())
                  .cast(pa.timestamp("us"))})
    out = run_proj(t, [
        "to_utc_timestamp(ts, 'America/Los_Angeles') as u"]).to_pandas()
    assert out.u[0] == dt.datetime(2024, 3, 10, 10, 0, 0)


def test_conv_negative_unsigned_wrap():
    t = pa.table({"s": pa.array(["-7"])})
    out = run_proj(t, ["conv(s, 10, 16) as c"]).to_pandas()
    assert out.c[0] == "FFFFFFFFFFFFFFF9"  # Spark NumberConverter


def test_raise_error_message_surfaces():
    import pytest
    from velox_tpu.common.errors import VeloxUserError
    t = pa.table({"x": pa.array([1], pa.int64())})
    with pytest.raises(VeloxUserError, match="boom-specific"):
        run_proj(t, ["raise_error('boom-specific') as e"])


def test_moments_constant_group_null():
    t = pa.table({"g": pa.array([1, 1, 1, 1], pa.int64()),
                  "x": pa.array([5.0, 5.0, 5.0, 5.0])})
    out = Task(PlanBuilder().values([t]).single_aggregation(
        ["g"], ["skewness(x) as sk", "kurtosis(x) as ku"]).plan()
    ).run().to_pandas()
    assert out.sk.isna()[0] and out.ku.isna()[0]


def test_array_map_ctors_get_timestamp():
    t = pa.table({"a": pa.array([1, 2], pa.int64()),
                  "b": pa.array([10, None], pa.int64()),
                  "s": pa.array(["2024-02-29 12:30:05", "junk"])})
    out = run_proj(t, ["array(a, b, 7) as arr",
                       "map(a, b) as m",
                       "get_timestamp(s, 'yyyy-MM-dd HH:mm:ss') as ts",
                       ]).to_pandas()
    assert list(out.arr[0]) == [1, 10, 7]
    assert out.arr[1][0] == 2 and np.isnan(out.arr[1][1])  # NULL elem
    assert dict(out.m[0]) == {1: 10}
    assert out.ts[0] == dt.datetime(2024, 2, 29, 12, 30, 5)
    assert out.ts.isna()[1]
