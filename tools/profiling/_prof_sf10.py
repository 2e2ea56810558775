"""Single-chip SF10 scaling: Q6/Q1/orderBy (lineitem 60M rows)."""
import time

import jax
jax.config.update("jax_enable_x64", True)

from velox_tpu.connectors.tpch import register_tpch
from velox_tpu.exec.task import Task
from velox_tpu.testing.plan_builder import PlanBuilder
from velox_tpu.tpch import tpch_plan

register_tpch(10.0, rows_per_split=8 << 20)


def ob():
    return (PlanBuilder()
            .table_scan("lineitem", ["l_shipdate", "l_orderkey"],
                        connector_id="tpch")
            .order_by(["l_shipdate", "l_orderkey"])
            .limit(1000).plan())


for name, pf in (("Q6", lambda: tpch_plan(6)),
                 ("Q1", lambda: tpch_plan(1)), ("orderBy", ob)):
    t0 = time.perf_counter()
    Task(pf()).run()
    first = time.perf_counter() - t0
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        out = Task(pf()).run()
        best = min(best, time.perf_counter() - t0)
    print(f"{name} SF10 first {first:.1f}s warm {best:.3f}s "
          f"rows={out.num_rows}", flush=True)
