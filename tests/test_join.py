"""Hash join tests: all join types, unique + duplicate build keys, nulls.

Oracle: pandas merges over the same data (parity with the reference's
HashJoinTest.cpp + DuckDB assertions).
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from velox_tpu.exec.task import Task
from velox_tpu.testing.plan_builder import PlanBuilder


def run_plan(plan):
    return Task(plan).run().to_pandas()


def make_tables(dup_build: bool, with_nulls: bool, seed=7):
    rng = np.random.RandomState(seed)
    n_probe, n_build = 500, 200
    probe_keys = rng.randint(0, 100, n_probe).astype("int64")
    if dup_build:
        build_keys = rng.randint(0, 60, n_build).astype("int64")
    else:
        build_keys = rng.permutation(150)[:n_build // 2].astype("int64")
    probe = pd.DataFrame({
        "pk": probe_keys,
        "pv": rng.randint(0, 1000, n_probe).astype("int64"),
    })
    build = pd.DataFrame({
        "bk": build_keys,
        "bv": rng.randint(0, 1000, len(build_keys)).astype("int64"),
    })
    if with_nulls:
        probe.loc[rng.rand(len(probe)) < 0.1, "pk"] = None
        build.loc[rng.rand(len(build)) < 0.1, "bk"] = None
        probe["pk"] = probe["pk"].astype("Int64")
        build["bk"] = build["bk"].astype("Int64")
    return probe, build


def to_arrow(df):
    return pa.table(df)


def build_join_plan(probe, build, join_type, output):
    b = PlanBuilder()
    bb = b.new_builder().values([to_arrow(build)])
    return (
        b.values([to_arrow(probe)])
        .hash_join(["pk"], ["bk"], bb, output=output, join_type=join_type)
        .plan()
    )


def _sorted(df, cols):
    return (df.sort_values(cols).reset_index(drop=True))


@pytest.mark.parametrize("dup", [False, True])
@pytest.mark.parametrize("nulls", [False, True])
def test_inner_join(dup, nulls):
    probe, build = make_tables(dup, nulls)
    plan = build_join_plan(probe, build, "inner", ["pk", "pv", "bk", "bv"])
    got = run_plan(plan)
    # SQL join semantics: NULL keys never match (pandas merge joins NAs)
    exp = probe.merge(build.dropna(subset=["bk"]),
                      left_on="pk", right_on="bk")
    assert len(got) == len(exp)
    cols = ["pk", "pv", "bk", "bv"]
    g = _sorted(got, cols)
    e = _sorted(exp, cols)
    for c in cols:
        np.testing.assert_array_equal(
            g[c].to_numpy(dtype="float64"), e[c].to_numpy(dtype="float64"))


@pytest.mark.parametrize("dup", [False, True])
@pytest.mark.parametrize("nulls", [False, True])
def test_left_join(dup, nulls):
    probe, build = make_tables(dup, nulls)
    plan = build_join_plan(probe, build, "left", ["pk", "pv", "bv"])
    got = run_plan(plan)
    exp = probe.merge(build.dropna(subset=["bk"]),
                      left_on="pk", right_on="bk", how="left")
    assert len(got) == len(exp)
    cols = ["pk", "pv", "bv"]
    g = _sorted(got, cols)
    e = _sorted(exp, cols)
    for c in cols:
        ga = g[c].to_numpy(dtype="float64", na_value=np.nan)
        ea = e[c].to_numpy(dtype="float64", na_value=np.nan)
        np.testing.assert_array_equal(np.isnan(ga), np.isnan(ea))
        np.testing.assert_array_equal(ga[~np.isnan(ga)], ea[~np.isnan(ea)])


@pytest.mark.parametrize("dup", [False, True])
@pytest.mark.parametrize("nulls", [False, True])
def test_right_join(dup, nulls):
    probe, build = make_tables(dup, nulls)
    plan = build_join_plan(probe, build, "right", ["pv", "bk", "bv"])
    got = run_plan(plan)
    exp = probe.dropna(subset=["pk"]).merge(
        build, left_on="pk", right_on="bk", how="right")
    assert len(got) == len(exp)
    cols = ["pv", "bk", "bv"]
    g = _sorted(got, cols)
    e = _sorted(exp, cols)
    for c in cols:
        ga = g[c].to_numpy(dtype="float64", na_value=np.nan)
        ea = e[c].to_numpy(dtype="float64", na_value=np.nan)
        np.testing.assert_array_equal(np.isnan(ga), np.isnan(ea))
        np.testing.assert_array_equal(ga[~np.isnan(ga)], ea[~np.isnan(ea)])


@pytest.mark.parametrize("dup", [False, True])
def test_full_join(dup):
    probe, build = make_tables(dup, False)
    plan = build_join_plan(probe, build, "full", ["pk", "pv", "bk", "bv"])
    got = run_plan(plan)
    exp = probe.merge(build, left_on="pk", right_on="bk", how="outer")
    assert len(got) == len(exp)
    cols = ["pk", "pv", "bk", "bv"]
    g = _sorted(got, cols)
    e = _sorted(exp, cols)
    for c in cols:
        ga = g[c].to_numpy(dtype="float64", na_value=np.nan)
        ea = e[c].to_numpy(dtype="float64", na_value=np.nan)
        np.testing.assert_array_equal(np.isnan(ga), np.isnan(ea))
        np.testing.assert_array_equal(ga[~np.isnan(ga)], ea[~np.isnan(ea)])


@pytest.mark.parametrize("dup", [False, True])
def test_left_semi(dup):
    probe, build = make_tables(dup, False)
    plan = build_join_plan(probe, build, "left_semi_filter", ["pk", "pv"])
    got = run_plan(plan)
    exp = probe[probe.pk.isin(build.bk)]
    assert len(got) == len(exp)
    g = _sorted(got, ["pk", "pv"])
    e = _sorted(exp, ["pk", "pv"])
    np.testing.assert_array_equal(g.pk, e.pk)
    np.testing.assert_array_equal(g.pv, e.pv)


@pytest.mark.parametrize("dup", [False, True])
def test_right_semi(dup):
    probe, build = make_tables(dup, False)
    plan = build_join_plan(probe, build, "right_semi_filter", ["bk", "bv"])
    got = run_plan(plan)
    exp = build[build.bk.isin(probe.pk)]
    assert len(got) == len(exp)
    g = _sorted(got, ["bk", "bv"])
    e = _sorted(exp, ["bk", "bv"])
    np.testing.assert_array_equal(g.bk, e.bk)
    np.testing.assert_array_equal(g.bv, e.bv)


@pytest.mark.parametrize("dup", [False, True])
def test_anti(dup):
    probe, build = make_tables(dup, False)
    plan = build_join_plan(probe, build, "anti", ["pk", "pv"])
    got = run_plan(plan)
    exp = probe[~probe.pk.isin(build.bk)]
    assert len(got) == len(exp)
    g = _sorted(got, ["pk", "pv"])
    e = _sorted(exp, ["pk", "pv"])
    np.testing.assert_array_equal(g.pk, e.pk)


def test_inner_join_filter():
    probe, build = make_tables(True, False)
    b = PlanBuilder()
    bb = b.new_builder().values([to_arrow(build)])
    plan = (
        b.values([to_arrow(probe)])
        .hash_join(["pk"], ["bk"], bb, output=["pk", "pv", "bv"],
                   join_type="inner", filter="pv > bv")
        .plan()
    )
    got = run_plan(plan)
    exp = probe.merge(build, left_on="pk", right_on="bk")
    exp = exp[exp.pv > exp.bv]
    assert len(got) == len(exp)
    cols = ["pk", "pv", "bv"]
    g = _sorted(got, cols)
    e = _sorted(exp, cols)
    for c in cols:
        np.testing.assert_array_equal(g[c], e[c])


def test_multi_key_join():
    rng = np.random.RandomState(3)
    probe = pd.DataFrame({
        "k1": rng.randint(0, 10, 300).astype("int64"),
        "k2": rng.randint(0, 10, 300).astype("int64"),
        "pv": np.arange(300, dtype="int64"),
    })
    build = pd.DataFrame({
        "b1": np.repeat(np.arange(10, dtype="int64"), 10),
        "b2": np.tile(np.arange(10, dtype="int64"), 10),
        "bv": np.arange(100, dtype="int64"),
    })
    b = PlanBuilder()
    bb = b.new_builder().values([to_arrow(build)])
    plan = (
        b.values([to_arrow(probe)])
        .hash_join(["k1", "k2"], ["b1", "b2"], bb,
                   output=["k1", "k2", "pv", "bv"])
        .plan()
    )
    got = run_plan(plan)
    exp = probe.merge(build, left_on=["k1", "k2"], right_on=["b1", "b2"])
    assert len(got) == len(exp)
    cols = ["k1", "k2", "pv", "bv"]
    g = _sorted(got, cols)
    e = _sorted(exp, cols)
    for c in cols:
        np.testing.assert_array_equal(g[c], e[c])


def test_expanding_join_multiple_chunks():
    """Output larger than probe capacity forces multiple emit chunks."""
    probe = pd.DataFrame({"pk": np.zeros(1000, "int64"),
                          "pv": np.arange(1000, dtype="int64")})
    build = pd.DataFrame({"bk": np.zeros(50, "int64"),
                          "bv": np.arange(50, dtype="int64")})
    plan = build_join_plan(probe, build, "inner", ["pv", "bv"])
    got = run_plan(plan)
    assert len(got) == 1000 * 50
    assert got.pv.sum() == 50 * np.arange(1000).sum()
    assert got.bv.sum() == 1000 * np.arange(50).sum()


def test_dynamic_filter_pushdown():
    """Build-side key range becomes a probe-side filter (still correct,
    and the plan gains a dynamic FilterNode)."""
    from velox_tpu.core import plan as P
    from velox_tpu.exec.task import Task as TaskCls
    probe = pd.DataFrame({"pk": np.arange(1000, dtype="int64"),
                          "pv": np.arange(1000, dtype="int64")})
    build = pd.DataFrame({"bk": np.arange(400, 450, dtype="int64"),
                          "bv": np.arange(50, dtype="int64")})
    plan = build_join_plan(probe, build, "inner", ["pk", "pv", "bv"])
    task = TaskCls(plan)
    got = task.run().to_pandas()
    exp = probe.merge(build, left_on="pk", right_on="bk")
    assert len(got) == len(exp) == 50
    np.testing.assert_array_equal(
        np.sort(got.pk), np.sort(exp.pk))
    # the dynamic filter node was injected
    fp_ops = [o for o in task.operators
              if o.stats.plan_node_id.endswith("-dynfilter")]
    assert fp_ops, [o.stats.plan_node_id for o in task.operators]

    # disabled via config -> same result, no filter node
    from velox_tpu.core.config import QueryConfig
    from velox_tpu.exec.task import QueryCtx
    t2 = TaskCls(plan, QueryCtx({QueryConfig.DYNAMIC_FILTERS: False}))
    got2 = t2.run().to_pandas()
    assert len(got2) == 50
    assert not any(o.stats.plan_node_id.endswith("-dynfilter")
                   for o in t2.operators)


def build_filtered_join_plan(probe, build, join_type, output, filt):
    b = PlanBuilder()
    bb = b.new_builder().values([to_arrow(build)])
    return (
        b.values([to_arrow(probe)])
        .hash_join(["pk"], ["bk"], bb, output=output, join_type=join_type,
                   filter=filt)
        .plan()
    )


@pytest.mark.parametrize("dup", [False, True])
def test_left_join_with_filter(dup):
    """velox HashProbe filter semantics: a LEFT probe row whose matches all
    fail the filter still emits one row with a null build side."""
    probe, build = make_tables(dup, False)
    plan = build_filtered_join_plan(
        probe, build, "left", ["pk", "pv", "bk", "bv"], "pv + bv < 1000")
    got = run_plan(plan)
    m = probe.merge(build, left_on="pk", right_on="bk", how="inner")
    m = m[m.pv + m.bv < 1000]
    unmatched = probe[~probe.pk.isin(m.pk)].copy() if len(m) else probe.copy()
    # pandas oracle: left rows with >=1 passing match, else null build
    passing = set(zip(m.pk, m.pv))
    no_pass = probe[[
        (pk, pv) not in passing for pk, pv in zip(probe.pk, probe.pv)]]
    exp_rows = len(m) + len(no_pass)
    assert len(got) == exp_rows
    # null build side exactly on the no-pass rows
    got_null = got[got.bv.isna()]
    assert len(got_null) == len(no_pass)
    g = _sorted(got.dropna(subset=["bv"]), ["pk", "pv", "bk", "bv"])
    e = _sorted(m[["pk", "pv", "bk", "bv"]], ["pk", "pv", "bk", "bv"])
    for c in ["pk", "pv", "bk", "bv"]:
        np.testing.assert_array_equal(g[c].to_numpy("float64"),
                                      e[c].to_numpy("float64"))


@pytest.mark.parametrize("jt", ["left_semi_filter", "anti"])
def test_semi_anti_join_with_filter(jt):
    probe, build = make_tables(True, False)
    plan = build_filtered_join_plan(
        probe, build, jt, ["pk", "pv"], "pv + bv < 1000")
    got = run_plan(plan)
    m = probe.merge(build, left_on="pk", right_on="bk", how="inner")
    m = m[m.pv + m.bv < 1000]
    passing = set(zip(m.pk, m.pv))
    is_pass = np.array([(pk, pv) in passing
                        for pk, pv in zip(probe.pk, probe.pv)])
    exp = probe[is_pass] if jt == "left_semi_filter" else probe[~is_pass]
    g = _sorted(got, ["pk", "pv"])
    e = _sorted(exp[["pk", "pv"]], ["pk", "pv"])
    assert len(g) == len(e)
    for c in ["pk", "pv"]:
        np.testing.assert_array_equal(g[c].to_numpy("float64"),
                                      e[c].to_numpy("float64"))


def test_right_join_with_filter():
    """RIGHT join with filter: matched = filter-passing; unmatched build
    rows come out null-probed in the right phase."""
    probe, build = make_tables(True, False)
    plan = build_filtered_join_plan(
        probe, build, "right", ["pk", "pv", "bk", "bv"], "pv + bv < 1000")
    got = run_plan(plan)
    m = probe.merge(build, left_on="pk", right_on="bk", how="inner")
    m = m[m.pv + m.bv < 1000]
    matched_b = set(zip(m.bk, m.bv))
    un = build[[(bk, bv) not in matched_b
                for bk, bv in zip(build.bk, build.bv)]]
    assert len(got) == len(m) + len(un)
    got_null = got[got.pv.isna()]
    assert len(got_null) == len(un)
    g = _sorted(got.dropna(subset=["pv"]), ["pk", "pv", "bk", "bv"])
    e = _sorted(m[["pk", "pv", "bk", "bv"]], ["pk", "pv", "bk", "bv"])
    for c in ["pk", "pv", "bk", "bv"]:
        np.testing.assert_array_equal(g[c].to_numpy("float64"),
                                      e[c].to_numpy("float64"))


def test_wide_key_fallback_join():
    """Two BIGINT keys exceed one packed u64 -> scatter-probe fallback."""
    rng = np.random.RandomState(11)
    probe = pd.DataFrame({
        "pk": rng.randint(0, 20, 300).astype("int64"),
        "pk2": rng.randint(0, 5, 300).astype("int64"),
        "pv": rng.randint(0, 100, 300).astype("int64"),
    })
    build = pd.DataFrame({
        "bk": rng.randint(0, 20, 80).astype("int64"),
        "bk2": rng.randint(0, 5, 80).astype("int64"),
        "bv": rng.randint(0, 100, 80).astype("int64"),
    })
    b = PlanBuilder()
    bb = b.new_builder().values([to_arrow(build)])
    plan = (b.values([to_arrow(probe)])
            .hash_join(["pk", "pk2"], ["bk", "bk2"], bb,
                       output=["pk", "pk2", "pv", "bv"]).plan())
    got = run_plan(plan)
    exp = probe.merge(build, left_on=["pk", "pk2"],
                      right_on=["bk", "bk2"])
    cols = ["pk", "pk2", "pv", "bv"]
    g, e = _sorted(got, cols), _sorted(exp[cols], cols)
    assert len(g) == len(e)
    for c in cols:
        np.testing.assert_array_equal(g[c].to_numpy("int64"),
                                      e[c].to_numpy("int64"))


def test_array_join_masked_duplicate_of_max_key():
    """Regression: a masked-out build row whose key CLIPS onto the last
    usable key must not suppress that key's run-end flag (negative
    arr_count dropped all its matches)."""
    import pyarrow as pa

    from velox_tpu.exec.join import build_sorted_table
    from velox_tpu.vector.device import from_arrow

    t = pa.table({"k": pa.array([1, 2, 3, 3], pa.int64())})
    b = from_arrow(t, capacity=4)
    import jax.numpy as jnp
    # mask out the duplicate 3 (e.g. a filtered build side)
    b = b.with_mask(jnp.asarray([True, True, True, False]))

    class KF:
        name, dtype = "k", __import__(
            "velox_tpu.types", fromlist=["BIGINT"]).BIGINT

    bt = build_sorted_table(b, (KF(),), array_range=(1, 3))
    import numpy as np
    counts = np.asarray(bt.arr_count)
    assert list(counts) == [1, 1, 1]


def _wide_tables(n_keys: int, with_nulls: bool, seed=13):
    """probe/build frames keyed on n_keys BIGINT columns."""
    rng = np.random.RandomState(seed)
    probe = pd.DataFrame({f"pk{i}": rng.randint(0, 8, 400).astype("int64")
                          for i in range(n_keys)})
    probe["pv"] = rng.randint(0, 1000, 400).astype("int64")
    build = pd.DataFrame({f"bk{i}": rng.randint(0, 8, 120).astype("int64")
                          for i in range(n_keys)})
    build["bv"] = rng.randint(0, 1000, 120).astype("int64")
    if with_nulls:
        probe.loc[rng.rand(400) < 0.1, "pk0"] = None
        build.loc[rng.rand(120) < 0.1, "bk0"] = None
        probe["pk0"] = probe["pk0"].astype("Int64")
        build["bk0"] = build["bk0"].astype("Int64")
    return probe, build


@pytest.mark.parametrize("n_keys,jt", [
    (2, "inner"), (2, "left"), (2, "left_semi_filter"), (2, "anti"),
    (3, "inner"), (3, "right"),
    (4, "inner"),   # 8 value words: beyond the sorted budget -> hash
    (5, "inner"),   # 10 value words: hash fallback
])
def test_wide_key_join_types(n_keys, jt):
    """Wide key tuples (> one packed u64) ride the sorted build +
    merge-rank probe up to sortable_words; beyond that the scatter-probe
    hash table remains. Same answers either way."""
    probe, build = _wide_tables(n_keys, with_nulls=(jt != "right"))
    pk = [f"pk{i}" for i in range(n_keys)]
    bk = [f"bk{i}" for i in range(n_keys)]
    b = PlanBuilder()
    bb = b.new_builder().values([to_arrow(build)])
    out_cols = pk + ["pv"] + (["bv"] if jt in ("inner", "left", "right")
                              else [])
    plan = (b.values([to_arrow(probe)])
            .hash_join(pk, bk, bb, output=out_cols, join_type=jt)
            .plan())
    got = run_plan(plan)
    pd_jt = {"inner": "inner", "left": "left", "right": "right"}.get(jt)
    if pd_jt is not None:
        exp = probe.dropna().merge(build.dropna(), left_on=pk,
                                   right_on=bk, how="inner")
        if jt == "left":
            matched = probe.merge(build.dropna(), left_on=pk,
                                  right_on=bk, how="left")
            exp = matched
        elif jt == "right":
            exp = probe.merge(build, left_on=pk, right_on=bk,
                              how="right")
        exp = exp[out_cols]
    elif jt == "left_semi_filter":
        keys = set(map(tuple, build.dropna()[bk].to_numpy()))
        m = probe.dropna()[pk].apply(tuple, axis=1).isin(keys)
        exp = probe.dropna()[m][out_cols]
    else:  # anti (not null-aware): probe rows with no match
        keys = set(map(tuple, build.dropna()[bk].to_numpy()))
        mask = ~probe[pk].apply(
            lambda r: (not r.isna().any())
            and tuple(r.astype("int64")) in keys, axis=1)
        exp = probe[mask][out_cols]
    cols = out_cols
    g, e = _sorted(got, cols), _sorted(exp, cols)
    assert len(g) == len(e), (len(g), len(e))
    for c in cols:
        np.testing.assert_array_equal(
            pd.isna(g[c]).to_numpy(), pd.isna(e[c]).to_numpy(), err_msg=c)
        gv = g[c].fillna(-1).to_numpy("int64")
        ev = e[c].fillna(-1).to_numpy("int64")
        np.testing.assert_array_equal(gv, ev, err_msg=c)


def test_wide_key_join_uses_sorted_build():
    """3 BIGINT keys must take the sorted (merge-rank) path, not the
    scatter-probe table."""
    from velox_tpu.exec.join import SortedBuild, build_table
    from velox_tpu.vector.device import from_arrow
    from velox_tpu.core.expressions import FieldAccess
    from velox_tpu import types as T
    probe, build = _wide_tables(3, with_nulls=False)
    batch = from_arrow(to_arrow(build))
    kf = [FieldAccess(T.BIGINT, f"bk{i}") for i in range(3)]
    bt = build_table(batch, kf)
    assert isinstance(bt, SortedBuild)
    kf5 = [FieldAccess(T.BIGINT, f"bk{min(i, 2)}") for i in range(5)]
    assert not isinstance(build_table(batch, kf5), SortedBuild)
