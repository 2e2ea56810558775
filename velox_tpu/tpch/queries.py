"""TPC-H query plans over the tpch connector.

Role parity: ``velox/exec/tests/utils/TpchQueryBuilder.cpp`` — Q1 (:192),
Q3 (:446), Q6 (:723), Q18 (:1881). Plans are built with the same shapes the
reference uses (filter pushdown into scan, partial->final aggregation), via
our PlanBuilder DSL.
"""

from __future__ import annotations

from velox_tpu.core import plan as P
from velox_tpu.testing.plan_builder import PlanBuilder


def q6(connector_id: str = "tpch") -> P.PlanNode:
    """Forecasting revenue change (TpchQueryBuilder.cpp:723)."""
    return (
        PlanBuilder()
        .table_scan(
            "lineitem",
            ["l_shipdate", "l_extendedprice", "l_quantity", "l_discount"],
            connector_id=connector_id,
            filter="l_shipdate >= date '1994-01-01' and "
                   "l_shipdate < date '1995-01-01' and "
                   "l_discount between 0.05 and 0.07 and "
                   "l_quantity < 24.0")
        .project(["l_extendedprice * l_discount as revenue"])
        .single_aggregation([], ["sum(revenue) as revenue"])
        .plan()
    )


def q1(connector_id: str = "tpch") -> P.PlanNode:
    """Pricing summary report (TpchQueryBuilder.cpp:192)."""
    return (
        PlanBuilder()
        .table_scan(
            "lineitem",
            ["l_returnflag", "l_linestatus", "l_quantity",
             "l_extendedprice", "l_discount", "l_tax", "l_shipdate"],
            connector_id=connector_id,
            filter="l_shipdate <= date '1998-09-02'")
        .project([
            "l_returnflag", "l_linestatus", "l_quantity",
            "l_extendedprice",
            "l_extendedprice * (1.0 - l_discount) as l_sum_disc_price",
            "l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)"
            " as l_sum_charge",
            "l_discount"])
        .partial_aggregation(
            ["l_returnflag", "l_linestatus"],
            ["sum(l_quantity) as sum_qty",
             "sum(l_extendedprice) as sum_base_price",
             "sum(l_sum_disc_price) as sum_disc_price",
             "sum(l_sum_charge) as sum_charge",
             "avg(l_quantity) as avg_qty",
             "avg(l_extendedprice) as avg_price",
             "avg(l_discount) as avg_disc",
             "count() as count_order"])
        .final_aggregation()
        .order_by(["l_returnflag", "l_linestatus"])
        .plan()
    )


def q3(connector_id: str = "tpch") -> P.PlanNode:
    """Shipping priority (TpchQueryBuilder.cpp:446): customer x orders x
    lineitem, group by orderkey/orderdate/shippriority, top 10 by revenue."""
    b = PlanBuilder()
    customers = (
        b.new_builder()
        .table_scan("customer", ["c_custkey", "c_mktsegment"],
                    connector_id=connector_id,
                    filter="c_mktsegment = 'BUILDING'")
        .project(["c_custkey"])
    )
    orders = (
        b.table_scan(
            "orders",
            ["o_orderkey", "o_custkey", "o_orderdate", "o_shippriority"],
            connector_id=connector_id,
            filter="o_orderdate < date '1995-03-15'")
        .hash_join(["o_custkey"], ["c_custkey"], customers,
                   output=["o_orderkey", "o_orderdate", "o_shippriority"],
                   join_type="left_semi_filter")
    )
    plan = (
        b.new_builder()
        .table_scan(
            "lineitem",
            ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
            connector_id=connector_id,
            filter="l_shipdate > date '1995-03-15'")
        .hash_join(["l_orderkey"], ["o_orderkey"], orders,
                   output=["l_orderkey", "l_extendedprice", "l_discount",
                           "o_orderdate", "o_shippriority"])
        .project(["l_orderkey",
                  "l_extendedprice * (1.0 - l_discount) as part_revenue",
                  "o_orderdate", "o_shippriority"])
        .single_aggregation(
            ["l_orderkey", "o_orderdate", "o_shippriority"],
            ["sum(part_revenue) as revenue"])
        .project(["l_orderkey", "revenue", "o_orderdate", "o_shippriority"])
        .top_n(["revenue DESC", "o_orderdate"], 10)
        .plan()
    )
    return plan


def q18(connector_id: str = "tpch",
        threshold: float = 300.0) -> P.PlanNode:
    """Large volume customer (TpchQueryBuilder.cpp:1881): orderkeys whose
    lineitem quantity sum > `threshold` (spec value 300; tests lower it at
    tiny scale factors where no order qualifies), joined back to orders
    and customer."""
    b = PlanBuilder()
    big_orders = (
        b.table_scan("lineitem", ["l_orderkey", "l_quantity"],
                     connector_id=connector_id)
        .single_aggregation(["l_orderkey"],
                            ["sum(l_quantity) as quantity"])
        .filter(f"quantity > {threshold:.1f}")
    )
    customers = (
        b.new_builder()
        .table_scan("customer", ["c_custkey", "c_name"],
                    connector_id=connector_id)
    )
    plan = (
        b.new_builder()
        .table_scan(
            "orders",
            ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
            connector_id=connector_id)
        .hash_join(["o_orderkey"], ["l_orderkey"], big_orders,
                   output=["o_orderkey", "o_custkey", "o_orderdate",
                           "o_totalprice", "quantity"])
        .hash_join(["o_custkey"], ["c_custkey"], customers,
                   output=["c_name", "c_custkey", "o_orderkey",
                           "o_orderdate", "o_totalprice", "quantity"])
        .top_n(["o_totalprice DESC", "o_orderdate"], 100)
        .plan()
    )
    return plan


_QUERIES = {1: q1, 3: q3, 6: q6, 18: q18}


def tpch_plan(q: int, connector_id: str = "tpch") -> P.PlanNode:
    try:
        return _QUERIES[q](connector_id)
    except KeyError:
        raise ValueError(
            f"TPC-H Q{q} not implemented (have {sorted(_QUERIES)})"
        ) from None
