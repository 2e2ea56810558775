"""Plan JSON serde (ISerializable parity) + Substrait ingestion tests."""

import base64
import json

import numpy as np
import pytest

from velox_tpu.connectors.tpch import register_tpch
from velox_tpu.core.serde import plan_from_json, plan_to_json
from velox_tpu.exec.task import Task
from velox_tpu.substrait import from_substrait
from velox_tpu.tpch import tpch_plan


@pytest.fixture(scope="module")
def conn():
    return register_tpch(0.01)


@pytest.mark.parametrize("q", [1, 3, 6, 18])
def test_plan_json_round_trip(conn, q):
    p = tpch_plan(q)
    p2 = plan_from_json(plan_to_json(p))
    assert p2 == p  # frozen-dataclass equality over the whole tree


def test_serialized_plan_executes(conn):
    p2 = plan_from_json(plan_to_json(tpch_plan(6)))
    a = Task(p2).run().to_pandas()
    b = Task(tpch_plan(6)).run().to_pandas()
    assert float(a.revenue[0]) == float(b.revenue[0])


def _dec_lit(v, p, s):
    raw = int(v).to_bytes(16, "little", signed=True)
    return {"decimal": {"value": base64.b64encode(raw).decode(),
                        "precision": p, "scale": s}}


def days(iso):
    return int((np.datetime64(iso) - np.datetime64("1970-01-01"))
               .astype(int))


def _sel(i):
    return {"selection": {"directReference": {"structField": {"field": i}},
                          "rootReference": {}}}


def _fn(anchor, *args, out=None):
    sf = {"functionReference": anchor,
          "arguments": [{"value": a} for a in args]}
    if out is not None:
        sf["outputType"] = out
    return {"scalarFunction": sf}


def substrait_q6():
    """TPC-H Q6 as a Substrait JSON plan (scan cols: shipdate, price,
    qty, discount = fields 0..3)."""
    exts = [{"extensionFunction": {"functionAnchor": a, "name": n}}
            for a, n in [(1, "and:bool"), (2, "gte:date_date"),
                         (3, "lt:date_date"), (4, "multiply:dec_dec"),
                         (5, "sum:dec"), (6, "between:dec"),
                         (7, "lt:dec_dec")]]
    cond = _fn(1,
               _fn(2, _sel(0), {"literal": {"date": days("1994-01-01")}}),
               _fn(3, _sel(0), {"literal": {"date": days("1995-01-01")}}),
               _fn(6, _sel(3), {"literal": _dec_lit(5, 3, 2)},
                   {"literal": _dec_lit(7, 3, 2)}),
               _fn(7, _sel(2), {"literal": _dec_lit(240, 3, 1)}))
    read = {"read": {
        "baseSchema": {"names": ["l_shipdate", "l_extendedprice",
                                 "l_quantity", "l_discount"]},
        "namedTable": {"names": ["lineitem"]},
        "filter": cond,
    }}
    project = {"project": {
        "input": read,
        "expressions": [_fn(4, _sel(1), _sel(3))],
        "common": {"emit": {"outputMapping": [4]}},
    }}
    agg = {"aggregate": {
        "input": project,
        "groupings": [],
        "measures": [{"measure": {
            "functionReference": 5,
            "arguments": [{"value": _sel(0)}],
            "outputType": {"decimal": {"precision": 18, "scale": 4}},
        }}],
    }}
    return {"extensions": exts,
            "relations": [{"root": {"input": agg,
                                    "names": ["revenue"]}}]}


def test_substrait_q6_executes(conn):
    plan = from_substrait(substrait_q6())
    got = Task(plan).run().to_pandas()
    ref = Task(tpch_plan(6)).run().to_pandas()
    assert float(got.revenue[0]) == float(ref.revenue[0])


# ---------------------------------------------------------------------------
# JoinRel / CrossRel / ConsistentPartitionWindowRel ingestion
# (parity: velox/substrait/SubstraitToVeloxPlan.h JoinRel handling)
# ---------------------------------------------------------------------------


def _read(table, names):
    return {"read": {"baseSchema": {"names": names},
                     "namedTable": {"names": [table]}}}


def _root(rel, names):
    return {"relations": [{"root": {"input": rel, "names": names}}]}


def test_substrait_inner_join_executes(conn):
    """orders x lineitem equi-join + residual filter via JoinRel."""
    exts = [{"extensionFunction": {"functionAnchor": a, "name": n}}
            for a, n in [(1, "and:bool"), (2, "equal:i64_i64"),
                         (3, "lt:dec_dec"), (4, "sum:dec"),
                         (5, "count:")]]
    # left = lineitem(l_orderkey, l_quantity): fields 0,1
    # right = orders(o_orderkey, o_totalprice): fields 2,3
    cond = _fn(1, _fn(2, _sel(0), _sel(2)),
               _fn(3, _sel(1), {"literal": _dec_lit(100, 4, 1)}))
    join = {"join": {
        "left": _read("lineitem", ["l_orderkey", "l_quantity"]),
        "right": _read("orders", ["o_orderkey", "o_totalprice"]),
        "type": "JOIN_TYPE_INNER",
        "expression": cond,
    }}
    agg = {"aggregate": {"input": join, "groupings": [], "measures": [
        {"measure": {"functionReference": 4,
                     "arguments": [{"value": _sel(3)}],
                     "outputType": {"decimal": {"precision": 18,
                                                "scale": 2}}}},
        {"measure": {"functionReference": 5, "arguments": [],
                     "outputType": {"i64": {}}}},
    ]}}
    plan = from_substrait({"extensions": exts, **_root(agg, ["s", "n"])})
    got = Task(plan).run().to_pandas()

    from velox_tpu.testing.plan_builder import PlanBuilder
    b = PlanBuilder()
    orders = b.new_builder().table_scan(
        "orders", ["o_orderkey", "o_totalprice"])
    ref_plan = (b.table_scan("lineitem", ["l_orderkey", "l_quantity"])
                .filter("l_quantity < 10.0")
                .hash_join(["l_orderkey"], ["o_orderkey"],
                           orders, output=["o_totalprice"])
                .single_aggregation([], ["sum(o_totalprice) as s",
                                         "count() as n"])
                .plan())
    ref = Task(ref_plan).run().to_pandas()
    assert int(got.n[0]) == int(ref.n[0]) > 0
    assert float(got.s[0]) == float(ref.s[0])


def test_substrait_left_join_and_cross(conn):
    exts = [{"extensionFunction": {"functionAnchor": a, "name": n}}
            for a, n in [(2, "equal:i64_i64"), (5, "count:")]]
    join = {"join": {
        "left": _read("orders", ["o_orderkey", "o_custkey"]),
        "right": _read("customer", ["c_custkey"]),
        "type": "JOIN_TYPE_LEFT",
        "expression": _fn(2, _sel(1), _sel(2)),
    }}
    agg = {"aggregate": {"input": join, "groupings": [], "measures": [
        {"measure": {"functionReference": 5, "arguments": [],
                     "outputType": {"i64": {}}}}]}}
    plan = from_substrait({"extensions": exts, **_root(agg, ["n"])})
    got = Task(plan).run().to_pandas()
    # every order has a customer: left join row count == orders count
    from velox_tpu.testing.plan_builder import PlanBuilder
    ref = Task(PlanBuilder().table_scan("orders", ["o_orderkey"])
               .single_aggregation([], ["count() as n"]).plan()) \
        .run().to_pandas()
    assert int(got.n[0]) == int(ref.n[0]) > 0

    cross = {"cross": {
        "left": _read("region", ["r_regionkey"]),
        "right": _read("nation", ["n_nationkey"]),
    }}
    agg2 = {"aggregate": {"input": cross, "groupings": [], "measures": [
        {"measure": {"functionReference": 5, "arguments": [],
                     "outputType": {"i64": {}}}}]}}
    plan2 = from_substrait({"extensions": exts, **_root(agg2, ["n"])})
    got2 = Task(plan2).run().to_pandas()
    assert int(got2.n[0]) == 5 * 25


def test_substrait_window_row_number(conn):
    exts = [{"extensionFunction":
             {"functionAnchor": 9, "name": "row_number:"}}]
    win = {"consistentPartitionWindow": {
        "input": _read("orders", ["o_orderkey", "o_custkey"]),
        "partitionExpressions": [_sel(1)],
        "sorts": [{"expr": _sel(0),
                   "direction": "SORT_DIRECTION_ASC_NULLS_LAST"}],
        "windowFunctions": [{
            "functionReference": 9,
            "boundsType": "BOUNDS_TYPE_ROWS",
            "lowerBound": {"unbounded": {}},
            "upperBound": {"currentRow": {}},
            "outputType": {"i64": {}},
        }],
    }}
    plan = from_substrait({"extensions": exts,
                           **_root(win, ["o_orderkey", "o_custkey",
                                         "rn"])})
    got = Task(plan).run().to_pandas()
    # per customer, row numbers are 1..k following o_orderkey order
    g = got.sort_values(["o_custkey", "o_orderkey"]).groupby("o_custkey")
    for _, grp in list(g)[:20]:
        np.testing.assert_array_equal(grp.rn.to_numpy(),
                                      np.arange(1, len(grp) + 1))


def test_substrait_emit_roundtrip_results():
    """to_substrait -> from_substrait -> identical RESULTS (names are
    positional in Substrait; values round-trip exactly)."""
    from velox_tpu.connectors.connector import register_connector
    from velox_tpu.connectors.tpch import TpchConnector
    from velox_tpu.exec.task import Task
    from velox_tpu.substrait import from_substrait
    from velox_tpu.substrait.emit import to_substrait
    from velox_tpu.testing.plan_builder import PlanBuilder

    register_connector(TpchConnector("tpch-emit", scale_factor=0.002))
    b = PlanBuilder()
    b.table_scan("lineitem",
                 ["l_quantity", "l_extendedprice", "l_discount",
                  "l_shipdate"],
                 connector_id="tpch-emit")
    b.filter("l_quantity < 24.0")
    b.single_aggregation([], ["sum(l_extendedprice) as s",
                              "count() as c"])
    plan = b.plan()
    sp = to_substrait(plan)
    plan2 = from_substrait(sp, connector_id="tpch-emit")
    a = Task(plan).run().to_pandas()
    c = Task(plan2).run().to_pandas()
    assert float(a.iloc[0, 0]) == float(c.iloc[0, 0])
    assert int(a.c[0]) == int(c.iloc[0, 1])


def test_substrait_emit_join_sort_fetch():
    import pandas as pd
    import pyarrow as pa

    from velox_tpu.exec.task import Task
    from velox_tpu.substrait import from_substrait
    from velox_tpu.substrait.emit import to_substrait
    from velox_tpu.testing.plan_builder import PlanBuilder
    import numpy as np
    rng = np.random.RandomState(5)
    left = pd.DataFrame({"pk": rng.randint(0, 20, 100).astype("int64"),
                         "pv": rng.randint(0, 9, 100).astype("int64")})
    right = pd.DataFrame({"bk": np.arange(15, dtype="int64"),
                          "bv": np.arange(15, dtype="int64") * 10})
    b = PlanBuilder()
    bb = b.new_builder().values([pa.table(right)])
    b.values([pa.table(left)])
    b.hash_join(["pk"], ["bk"], bb, output=["pk", "pv", "bv"])
    b.order_by(["pk", "pv desc"])
    b.limit(12)
    plan = b.plan()
    sp = to_substrait(plan)
    plan2 = from_substrait(sp)
    a = Task(plan).run().to_pandas()
    c = Task(plan2).run().to_pandas()
    assert len(a) == len(c) == 12
    np.testing.assert_array_equal(a.pk, c.iloc[:, 0])
    np.testing.assert_array_equal(a.bv, c.iloc[:, 2])


def test_substrait_emit_window_roundtrip():
    """WindowNode -> ConsistentPartitionWindowRel -> identical results."""
    import pyarrow as pa

    from velox_tpu.exec.task import Task
    from velox_tpu.substrait import from_substrait
    from velox_tpu.substrait.emit import to_substrait
    from velox_tpu.testing.plan_builder import PlanBuilder

    t = pa.table({"g": pa.array([1, 1, 2], pa.int64()),
                  "x": pa.array([3.0, 1.0, 5.0])})
    plan = (PlanBuilder().values([t])
            .window(["g"], ["x"],
                    ["row_number() as rn", "sum(x) as s"]).plan())
    sp = to_substrait(plan)
    plan2 = from_substrait(sp)
    a = Task(plan).run().to_pandas().sort_values(
        ["g", "x"]).reset_index(drop=True)
    b = Task(plan2).run().to_pandas().sort_values(
        ["g", "x"]).reset_index(drop=True)
    assert list(a.rn) == list(b.iloc[:, -2])
    assert list(a.s) == list(b.iloc[:, -1])
