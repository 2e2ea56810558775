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
