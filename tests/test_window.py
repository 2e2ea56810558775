"""Window / RowNumber / TopNRowNumber operator tests vs a pandas oracle.

Parity with the reference's WindowTest.cpp / RowNumberTest.cpp /
TopNRowNumberTest.cpp (DuckDB-oracle strategy).
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from velox_tpu.exec.task import Task
from velox_tpu.exec.window import BoundType, FrameType, WindowFrame
from velox_tpu.testing.plan_builder import PlanBuilder


def make_df(n=400, parts=7, seed=11):
    rng = np.random.RandomState(seed)
    return pd.DataFrame({
        "p": rng.randint(0, parts, n).astype("int64"),
        "o": rng.randint(0, 50, n).astype("int64"),
        "v": rng.randint(-100, 100, n).astype("int64"),
    })


def run_window(df, functions, frame=None, sort_keys=("o", "v")):
    plan = (PlanBuilder()
            .values([pa.table(df)])
            .window(["p"], list(sort_keys), functions, frame=frame)
            .plan())
    return Task(plan).run().to_pandas()


def oracle_sorted(df):
    return df.sort_values(["p", "o", "v"], kind="stable") \
        .reset_index(drop=True)


def test_row_number_rank_dense_rank():
    df = make_df()
    got = run_window(df, ["row_number() as rn", "rank() as rk",
                          "dense_rank() as dr"])
    g = got.sort_values(["p", "o", "v", "rn"]).reset_index(drop=True)
    e = oracle_sorted(df)
    grp = e.groupby("p")
    e["rn"] = grp.cumcount() + 1
    # rank over (o, v) ordering
    e["rk"] = (e.groupby("p")[["o", "v"]]
               .apply(lambda x: pd.Series(
                   pd.MultiIndex.from_frame(x).to_list(), index=x.index))
               .reset_index(drop=True))
    # simpler: compute rank with pandas on a combined key
    key = e.o * 1000 + e.v + 500
    e["rk"] = key.groupby(e.p).rank(method="min").astype("int64")
    e["dr"] = key.groupby(e.p).rank(method="dense").astype("int64")
    np.testing.assert_array_equal(g.rn, e.rn)
    g2 = got.sort_values(["p", "o", "v", "rn"]).reset_index(drop=True)
    np.testing.assert_array_equal(g2.rk, e.rk)
    np.testing.assert_array_equal(g2.dr, e.dr)


def test_percent_rank_cume_dist():
    df = make_df(300, 5)
    got = run_window(df, ["percent_rank() as pr", "cume_dist() as cd"])
    g = got.sort_values(["p", "o", "v"]).reset_index(drop=True)
    e = oracle_sorted(df)
    key = e.o * 1000 + e.v + 500
    n = e.groupby("p")["o"].transform("size")
    rk = key.groupby(e.p).rank(method="min")
    e["pr"] = np.where(n == 1, 0.0, (rk - 1) / (n - 1))
    e["cd"] = key.groupby(e.p).rank(method="max") / n
    np.testing.assert_allclose(g.pr, e.pr, rtol=1e-12)
    np.testing.assert_allclose(g.cd, e.cd, rtol=1e-12)


def test_ntile():
    df = make_df(100, 3)
    got = run_window(df, ["ntile(4) as nt"])
    g = got.sort_values(["p", "o", "v"]).reset_index(drop=True)
    e = oracle_sorted(df)
    def ntile(group):
        n = len(group)
        sizes = [n // 4 + (1 if i < n % 4 else 0) for i in range(4)]
        out = []
        for b, s in enumerate(sizes):
            out += [b + 1] * s
        return pd.Series(out[:n], index=group.index)
    e["nt"] = e.groupby("p", group_keys=False)["o"].apply(ntile)
    np.testing.assert_array_equal(g.nt, e.nt)


def test_lead_lag():
    df = make_df(200, 4)
    got = run_window(df, ["lead(v) as ld", "lag(v, 2) as lg"])
    g = got.sort_values(["p", "o", "v"]).reset_index(drop=True)
    e = oracle_sorted(df)
    e["ld"] = e.groupby("p")["v"].shift(-1)
    e["lg"] = e.groupby("p")["v"].shift(2)
    for c in ("ld", "lg"):
        ga = g[c].to_numpy(dtype="float64", na_value=np.nan)
        ea = e[c].to_numpy(dtype="float64", na_value=np.nan)
        np.testing.assert_array_equal(np.isnan(ga), np.isnan(ea))
        np.testing.assert_array_equal(ga[~np.isnan(ga)], ea[~np.isnan(ea)])


def test_running_sum_default_frame():
    """Default RANGE UNBOUNDED PRECEDING -> CURRENT ROW includes peers."""
    df = make_df(300, 5)
    got = run_window(df, ["sum(v) as s", "count() as c", "min(v) as mn",
                          "max(v) as mx"])
    g = got.sort_values(["p", "o", "v"]).reset_index(drop=True)
    e = oracle_sorted(df)
    # peers share (o, v) — emulate RANGE by rank(max) prefix
    def range_agg(group, fn):
        vals = group.v.to_numpy()
        key = list(zip(group.o, group.v))
        out = []
        for i in range(len(vals)):
            hi = i
            while hi + 1 < len(vals) and key[hi + 1] == key[i]:
                hi += 1
            out.append(fn(vals[:hi + 1]))
        return pd.Series(out, index=group.index)
    e["s"] = e.groupby("p", group_keys=False)[["o", "v"]].apply(
        lambda x: range_agg(x.assign(v=e.v[x.index]), np.sum))
    e["c"] = e.groupby("p", group_keys=False)[["o", "v"]].apply(
        lambda x: range_agg(x.assign(v=e.v[x.index]),
                            lambda a: len(a)))
    e["mn"] = e.groupby("p", group_keys=False)[["o", "v"]].apply(
        lambda x: range_agg(x.assign(v=e.v[x.index]), np.min))
    e["mx"] = e.groupby("p", group_keys=False)[["o", "v"]].apply(
        lambda x: range_agg(x.assign(v=e.v[x.index]), np.max))
    np.testing.assert_array_equal(g.s, e.s)
    np.testing.assert_array_equal(g.c, e.c)
    np.testing.assert_array_equal(g.mn, e.mn)
    np.testing.assert_array_equal(g.mx, e.mx)


def test_rows_frame_sliding():
    df = make_df(250, 4)
    frame = WindowFrame(FrameType.ROWS, BoundType.PRECEDING, 2,
                        BoundType.FOLLOWING, 1)
    got = run_window(df, ["sum(v) as s", "min(v) as mn", "max(v) as mx",
                          "first_value(v) as fv", "last_value(v) as lv"],
                     frame=frame)
    g = got.sort_values(["p", "o", "v"]).reset_index(drop=True)
    e = oracle_sorted(df)

    def window_apply(group, fn):
        vals = group.to_numpy()
        out = []
        for i in range(len(vals)):
            lo, hi = max(0, i - 2), min(len(vals) - 1, i + 1)
            out.append(fn(vals[lo:hi + 1]))
        return pd.Series(out, index=group.index)

    e["s"] = e.groupby("p", group_keys=False)["v"].apply(
        lambda x: window_apply(x, np.sum))
    e["mn"] = e.groupby("p", group_keys=False)["v"].apply(
        lambda x: window_apply(x, np.min))
    e["mx"] = e.groupby("p", group_keys=False)["v"].apply(
        lambda x: window_apply(x, np.max))
    e["fv"] = e.groupby("p", group_keys=False)["v"].apply(
        lambda x: window_apply(x, lambda a: a[0]))
    e["lv"] = e.groupby("p", group_keys=False)["v"].apply(
        lambda x: window_apply(x, lambda a: a[-1]))
    for c in ("s", "mn", "mx", "fv", "lv"):
        np.testing.assert_array_equal(g[c], e[c], err_msg=c)


def test_row_number_operator_streaming():
    """RowNumberOperator: hash-based, no sort, multiple batches."""
    rng = np.random.RandomState(5)
    dfs = [pd.DataFrame({"p": rng.randint(0, 6, 100).astype("int64"),
                         "v": rng.randint(0, 100, 100).astype("int64")})
           for _ in range(3)]
    plan = (PlanBuilder()
            .values([pa.table(d) for d in dfs])
            .row_number(["p"], "rn")
            .plan())
    got = Task(plan).run().to_pandas()
    all_df = pd.concat(dfs, ignore_index=True)
    assert len(got) == len(all_df)
    # row numbers within each partition are exactly 1..count
    for p, grp in got.groupby("p"):
        expect_n = (all_df.p == p).sum()
        assert sorted(grp.rn) == list(range(1, expect_n + 1))


def test_row_number_limit():
    df = pd.DataFrame({"p": np.repeat(np.arange(5, dtype="int64"), 20),
                       "v": np.arange(100, dtype="int64")})
    plan = (PlanBuilder()
            .values([pa.table(df)])
            .row_number(["p"], "rn", limit=3)
            .plan())
    got = Task(plan).run().to_pandas()
    assert len(got) == 15
    assert (got.groupby("p").size() == 3).all()


def test_top_n_row_number():
    df = make_df(300, 6)
    plan = (PlanBuilder()
            .values([pa.table(df)])
            .top_n_row_number(["p"], ["v DESC"], 5, "rn")
            .plan())
    got = Task(plan).run().to_pandas()
    e = (df.sort_values(["p", "v"], ascending=[True, False],
                        kind="stable")
         .groupby("p").head(5))
    assert len(got) == len(e)
    for p, grp in got.groupby("p"):
        exp_v = sorted(e[e.p == p].v, reverse=True)
        assert sorted(grp.v, reverse=True) == exp_v
        assert sorted(grp.rn) == list(range(1, len(grp) + 1))


def test_rows_frame_column_valued_bounds():
    """Non-constant (per-row column) ROWS frame offsets."""
    df = make_df(200, 4, seed=21)
    rng = np.random.RandomState(22)
    df["kb"] = rng.randint(0, 4, len(df)).astype("int64")
    df["kf"] = rng.randint(0, 3, len(df)).astype("int64")
    frame = WindowFrame(FrameType.ROWS, BoundType.PRECEDING, "kb",
                        BoundType.FOLLOWING, "kf")
    got = run_window(df, ["sum(v) as s", "count(v) as c"], frame=frame)
    g = got.sort_values(["p", "o", "v"]).reset_index(drop=True)
    e = df.sort_values(["p", "o", "v"], kind="stable") \
        .reset_index(drop=True)
    exp_s, exp_c = [], []
    for _, grp in e.groupby("p", sort=False):
        vals = grp.v.to_numpy()
        kb = grp.kb.to_numpy()
        kf = grp.kf.to_numpy()
        for i in range(len(vals)):
            lo = max(0, i - int(kb[i]))
            hi = min(len(vals) - 1, i + int(kf[i]))
            exp_s.append(vals[lo:hi + 1].sum())
            exp_c.append(hi - lo + 1)
    e2 = e.copy()
    e2["s"] = exp_s
    e2["c"] = exp_c
    e2 = e2.sort_values(["p", "o", "v"]).reset_index(drop=True)
    np.testing.assert_array_equal(g.s, e2.s)
    np.testing.assert_array_equal(g.c, e2.c)


def test_range_frame_column_valued_bounds():
    """Non-constant RANGE k offsets: per-row [o-kb, o+kf] value windows."""
    df = make_df(200, 4, seed=31)
    rng = np.random.RandomState(32)
    df["kb"] = rng.randint(0, 6, len(df)).astype("int64")
    df["kf"] = rng.randint(0, 6, len(df)).astype("int64")
    frame = WindowFrame(FrameType.RANGE, BoundType.PRECEDING, "kb",
                        BoundType.FOLLOWING, "kf")
    got = run_window(df, ["sum(v) as s"], frame=frame, sort_keys=("o",))
    g = got.sort_values(["p", "o", "v"]).reset_index(drop=True)
    e = df.sort_values(["p", "o", "v"], kind="stable") \
        .reset_index(drop=True)
    exp = []
    for _, grp in e.groupby("p", sort=False):
        o = grp.o.to_numpy()
        v = grp.v.to_numpy()
        kb = grp.kb.to_numpy()
        kf = grp.kf.to_numpy()
        for i in range(len(o)):
            m = (o >= o[i] - kb[i]) & (o <= o[i] + kf[i])
            exp.append(v[m].sum())
    e2 = e.copy()
    e2["s"] = exp
    e2 = e2.sort_values(["p", "o", "v"]).reset_index(drop=True)
    np.testing.assert_array_equal(g.s, e2.s)


def test_frame_offset_null_or_negative_raises():
    from velox_tpu.common.errors import VeloxUserError
    df = make_df(50, 2, seed=41)
    df["kb"] = np.int64(1)
    df.loc[3, "kb"] = -2
    frame = WindowFrame(FrameType.ROWS, BoundType.PRECEDING, "kb",
                        BoundType.CURRENT_ROW, 0)
    with pytest.raises(VeloxUserError):
        run_window(df, ["sum(v) as s"], frame=frame)
