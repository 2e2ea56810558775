"""Warm-wall attribution for Q3/Q18/orderBy at SF1 with operator syncing."""
import time

import jax
jax.config.update("jax_enable_x64", True)

from velox_tpu.connectors.tpch import register_tpch
from velox_tpu.exec.task import QueryCtx, Task
from velox_tpu.testing.plan_builder import PlanBuilder
from velox_tpu.tpch import tpch_plan

register_tpch(1.0, rows_per_split=1 << 21)


def ob():
    return (PlanBuilder()
            .table_scan("lineitem", ["l_shipdate", "l_orderkey"],
                        connector_id="tpch")
            .order_by(["l_shipdate", "l_orderkey"])
            .limit(1000).plan())


ctx = QueryCtx({"debug_sync_operators": True})

for name, pf in (("Q3", lambda: tpch_plan(3)),
                 ("Q18", lambda: tpch_plan(18)),
                 ("orderBy", ob)):
    # warm it (compiles + scan cache) without sync noise
    t0 = time.perf_counter()
    Task(pf()).run()
    print(f"{name} first {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    out = Task(pf()).run()
    print(f"{name} warm(nosync) {time.perf_counter()-t0:.2f}s "
          f"rows={out.num_rows}", flush=True)
    t0 = time.perf_counter()
    task = Task(pf(), ctx=ctx)
    out = task.run()
    print(f"{name} warm(sync) {time.perf_counter()-t0:.2f}s", flush=True)
    print(task.print_plan_with_stats(), flush=True)
