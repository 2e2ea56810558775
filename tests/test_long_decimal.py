"""Long decimals — DECIMAL(19..38) on int128 limbs (ops/int128.py).
Parity: velox/type/HugeInt.h + type/DecimalUtil.h. Values are validated
exactly against python ints (arbitrary precision)."""

import decimal as D

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from velox_tpu import types as T
from velox_tpu.exec.task import Task
from velox_tpu.testing.plan_builder import PlanBuilder

P38 = pa.decimal128(38, 4)


def _tbl(vals, name="d", typ=P38):
    return pa.table({name: pa.array(vals, type=typ)})


D.getcontext().prec = 60  # default 28 rounds 38-digit test values


def _mkdec(ints, scale=4):
    return [None if v is None else D.Decimal(v).scaleb(-scale)
            for v in ints]


VALS = [10**30 + 7, -(10**25) - 123456789, 0, 99999, None,
        10**33, -(10**33), 2**100]


def run(plan):
    return Task(plan).run()


def test_scan_project_filter_roundtrip():
    vals = _mkdec(VALS)
    out = run(PlanBuilder().values([_tbl(vals)]).plan())
    assert out.column("d").to_pylist() == vals


def test_add_subtract_negate_exact():
    vals = _mkdec(VALS)
    b = PlanBuilder().values([_tbl(vals)])
    b.project(["d + d as dd", "d - d as z", "-d as nd"])
    out = run(b.plan()).to_pandas()
    for i, v in enumerate(VALS):
        if v is None:
            assert pd.isna(out.dd[i]) and pd.isna(out.z[i])
            continue
        assert int(D.Decimal(out.dd[i]).scaleb(4)) == 2 * v
        assert int(D.Decimal(out.z[i]).scaleb(4)) == 0
        assert int(D.Decimal(out.nd[i]).scaleb(4)) == -v


def test_long_decimal_literal_and_compare():
    vals = _mkdec(VALS)
    b = PlanBuilder().values([_tbl(vals)])
    # 26-digit literal parses as a long decimal (not DOUBLE)
    b.filter("d > 12345678901234567890123456.0")
    out = run(b.plan())
    exp = [v for v in VALS
           if v is not None and v > int(D.Decimal(
               "12345678901234567890123456.0").scaleb(4))]
    got = [int(D.Decimal(x).scaleb(4))
           for x in out.column("d").to_pylist()]
    assert sorted(got) == sorted(exp)


def test_multiply_long_by_short_exact():
    vals = _mkdec([10**25, -(10**24), 777, None])
    b = PlanBuilder().values([_tbl(vals)])
    b.project(["d * 2.5 as m"])
    out = run(b.plan())
    got = out.column("m").to_pylist()
    for g, v in zip(got, [10**25, -(10**24), 777, None]):
        if v is None:
            assert g is None
        else:
            assert D.Decimal(g) == D.Decimal(v).scaleb(-4) * D.Decimal(
                "2.5")


def test_sum_long_decimal_exact():
    ints = [10**30, 10**30, -(10**29), 12345, None]
    rng = np.random.RandomState(5)
    more = [int(x) * 10**22 for x in rng.randint(-10**6, 10**6, 500)]
    allints = ints + more
    b = PlanBuilder().values([_tbl(_mkdec(allints))])
    b.single_aggregation([], ["sum(d) as s"])
    out = run(b.plan())
    exp = sum(v for v in allints if v is not None)
    assert int(D.Decimal(out.column("s")[0].as_py()).scaleb(4)) == exp


def test_grouped_sum_long_decimal():
    rng = np.random.RandomState(6)
    g = rng.randint(0, 5, 300)
    v = [int(x) * 10**21 for x in rng.randint(-10**9, 10**9, 300)]
    t = pa.table({"g": pa.array(g, type=pa.int64()),
                  "d": pa.array(_mkdec(v), type=P38)})
    b = PlanBuilder().values([t])
    b.single_aggregation(["g"], ["sum(d) as s"])
    out = run(b.plan()).to_pandas().sort_values("g")
    for gid, grp in pd.DataFrame({"g": g, "v": v}).groupby("g"):
        got = int(D.Decimal(str(
            out[out.g == gid].s.iloc[0])).scaleb(4))
        assert got == grp.v.sum()


def test_cast_short_to_long_and_to_double():
    t = pa.table({"x": pa.array([D.Decimal("12.34"), None],
                                type=pa.decimal128(10, 2))})
    b = PlanBuilder().values([t])
    b.project(["cast(x as decimal(30, 6)) as w",
               "cast(cast(x as decimal(30, 6)) as double) as f"])
    out = run(b.plan())
    assert out.column("w").to_pylist() == [D.Decimal("12.340000"), None]
    f = out.column("f").to_pylist()
    assert abs(f[0] - 12.34) < 1e-9 and f[1] is None


def test_long_decimal_join_payload():
    """Long-decimal columns survive join gathers (limb child rides
    map_column_rows)."""
    t = pa.table({"k": pa.array([1, 2, 3], type=pa.int64()),
                  "d": pa.array(_mkdec([10**30, -(10**28), 5]),
                                type=P38)})
    probe = pa.table({"pk": pa.array([3, 1, 3], type=pa.int64())})
    b = PlanBuilder()
    bb = b.new_builder().values([t])
    b.values([probe]).hash_join(["pk"], ["k"], bb, output=["pk", "d"])
    out = run(b.plan()).to_pandas().sort_values("pk")
    got = [int(D.Decimal(str(x)).scaleb(4)) for x in out.d]
    assert sorted(got) == sorted([10**30, 5, 5])


def test_order_by_long_decimal():
    """128-bit order-preserving sort words (exec/sort.py value_words)."""
    vals = [10**33, -(10**33), 0, 99999, None, 2**100, -(2**90),
            10**30 + 7, 10**30 - 7]
    b = PlanBuilder().values([_tbl(_mkdec(vals))])
    b.order_by(["d"])
    out = run(b.plan()).column("d").to_pylist()
    nn = sorted(v for v in vals if v is not None)
    got = [None if x is None else int(D.Decimal(x).scaleb(4))
           for x in out]
    assert got[:len(nn)] == nn  # nulls last by default
    assert got[len(nn):] == [None]


def test_top_n_long_decimal_desc():
    rng = np.random.RandomState(9)
    vals = [int(x) * 10**22 + int(y)
            for x, y in zip(rng.randint(-10**6, 10**6, 200),
                            rng.randint(0, 10**6, 200))]
    b = PlanBuilder().values([_tbl(_mkdec(vals))])
    b.top_n(["d desc"], 5)
    out = run(b.plan()).column("d").to_pylist()
    got = [int(D.Decimal(x).scaleb(4)) for x in out]
    assert got == sorted(vals, reverse=True)[:5]


def test_min_max_avg_long_decimal():
    vals = [10**30 + 7, -(10**25) - 1, 0, 99999, None, 2**100]
    nn = [v for v in vals if v is not None]
    b = PlanBuilder().values([_tbl(_mkdec(vals))])
    b.single_aggregation([], ["min(d) as lo", "max(d) as hi"])
    out = run(b.plan())
    assert int(D.Decimal(out.column("lo")[0].as_py()).scaleb(4)) == min(nn)
    assert int(D.Decimal(out.column("hi")[0].as_py()).scaleb(4)) == max(nn)
    b2 = PlanBuilder().values([_tbl(_mkdec(vals))])
    b2.single_aggregation([], ["avg(d) as a"])
    out2 = run(b2.plan())
    s = sum(nn)
    exp = (abs(s) + len(nn) // 2) // len(nn) * (1 if s >= 0 else -1)
    assert int(D.Decimal(out2.column("a")[0].as_py()).scaleb(4)) == exp


def test_grouped_min_max_long_decimal():
    rng = np.random.RandomState(11)
    g = rng.randint(0, 4, 200)
    v = [int(x) * 10**22 + int(y)
         for x, y in zip(rng.randint(-10**6, 10**6, 200),
                         rng.randint(0, 10**6, 200))]
    t = pa.table({"g": pa.array(g, type=pa.int64()),
                  "d": pa.array(_mkdec(v), type=P38)})
    b = PlanBuilder().values([t])
    b.single_aggregation(["g"], ["min(d) as lo", "max(d) as hi"])
    out = run(b.plan()).to_pandas().sort_values("g")
    df = pd.DataFrame({"g": g, "v": v})
    for gid, grp in df.groupby("g"):
        row = out[out.g == gid]
        assert int(D.Decimal(str(row.lo.iloc[0])).scaleb(4)) == grp.v.min()
        assert int(D.Decimal(str(row.hi.iloc[0])).scaleb(4)) == grp.v.max()


def test_grouped_avg_long_decimal():
    rng = np.random.RandomState(12)
    g = rng.randint(0, 3, 90)
    v = [int(x) * 10**21 for x in rng.randint(-10**9, 10**9, 90)]
    t = pa.table({"g": pa.array(g, type=pa.int64()),
                  "d": pa.array(_mkdec(v), type=P38)})
    b = PlanBuilder().values([t])
    b.single_aggregation(["g"], ["avg(d) as a"])
    out = run(b.plan()).to_pandas().sort_values("g")
    for gid, grp in pd.DataFrame({"g": g, "v": v}).groupby("g"):
        s = int(grp.v.sum()); n = len(grp)
        exp = (abs(s) + n // 2) // n * (1 if s >= 0 else -1)
        got = int(D.Decimal(str(out[out.g == gid].a.iloc[0])).scaleb(4))
        assert got == exp


def test_short_decimal_sum_widens_to_38():
    """sum(DECIMAL(p, s)) -> DECIMAL(38, s): a 19-digit total must not
    overflow the declared precision (hit at SF10 Q1 sum_charge;
    parity: Presto DecimalSumAggregate -> decimal(38, s))."""
    import decimal
    import pyarrow as pa
    from velox_tpu.exec.task import Task
    from velox_tpu.testing.plan_builder import PlanBuilder
    big = decimal.Decimal("99999999999999.99")  # 16 digits, scale 2
    t = pa.table({"g": pa.array([1] * 200, pa.int64()),
                  "d": pa.array([big] * 200, pa.decimal128(16, 2))})
    out = Task(PlanBuilder().values([t]).single_aggregation(
        ["g"], ["sum(d) as s"]).plan()).run()
    assert out.schema.field("s").type == pa.decimal128(38, 2)
    assert out.to_pandas().s[0] == big * 200  # 19 digits


def test_double_sum_beyond_f32_range():
    """Regression: the f64 triple-f32 split scatter overflows to NaN for
    |v| > f32 max; such batches must take the exact 64-bit scatter."""
    import pyarrow as pa
    from velox_tpu.exec.task import Task
    from velox_tpu.testing.plan_builder import PlanBuilder
    t = pa.table({"g": pa.array([1, 1, 2, 2], pa.int64()),
                  "x": pa.array([1e300, 1e300, 2.0, 3.0])})
    out = Task(PlanBuilder().values([t]).single_aggregation(
        ["g"], ["sum(x) as s"]).plan()
    ).run().to_pandas().sort_values("g").reset_index(drop=True)
    assert out.s[0] == 2e300
    assert out.s[1] == 5.0
