"""Pre-warm the persistent XLA compile cache with the benchmark shapes.

First-EVER compiles go through the remote AOT compiler (minutes for
multi-join plans); the persistent cache (~/.cache/velox_tpu_jax) makes
every later process warm. Run this once after changing compute-path code
so driver/CI bench runs (bench.py under a wall-clock budget) never pay
compile time:

    python tools/prewarm.py            # SF1 + SF10 bench shapes
    python tools/prewarm.py --sf1-only
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> None:
    import jax

    jax.config.update("jax_enable_x64", True)

    from velox_tpu.connectors.tpch import register_tpch
    from velox_tpu.core.config import QueryConfig as QC
    from velox_tpu.exec.task import QueryCtx, Task
    from velox_tpu.testing.plan_builder import PlanBuilder
    from velox_tpu.tpch import tpch_plan

    register_tpch(1.0, rows_per_split=1 << 21)

    def orderby_plan():
        return (PlanBuilder()
                .table_scan("lineitem", ["l_shipdate", "l_orderkey"],
                            connector_id="tpch")
                .order_by(["l_shipdate", "l_orderkey"])
                .limit(1000)
                .plan())

    # the bench's HBM-bandwidth probe compiles a fori_loop program; get
    # it into the persistent cache too (a fresh compile through a
    # degraded AOT service hung for minutes)
    import bench as _bench
    t0 = time.perf_counter()
    bw = _bench.measure_hbm_bw_deadline(1800)
    print(f"prewarm hbm_bw: {time.perf_counter() - t0:.1f}s "
          f"({(bw or 0) / 1e9:.0f} GB/s)", flush=True)

    shapes = [("q6", lambda: tpch_plan(6)),
              ("q1", lambda: tpch_plan(1)),
              ("orderby", orderby_plan),
              ("q18", lambda: tpch_plan(18)),
              ("q3", lambda: tpch_plan(3))]
    for name, fn in shapes:
        t0 = time.perf_counter()
        Task(fn()).run()
        print(f"prewarm {name}: {time.perf_counter() - t0:.1f}s",
              flush=True)

    if "--sf1-only" in sys.argv:
        return
    # SF10 bench stage shapes (same per-split capacity => same programs,
    # but the capped-pool ctx changes offload/spill program variants)
    cid = "tpch-sf10"
    register_tpch(10.0, rows_per_split=1 << 21, connector_id=cid)
    for q in (1, 3, 18):
        ctx = QueryCtx({QC.QUERY_HBM_CAP_BYTES: 8 << 30})
        t0 = time.perf_counter()
        Task(tpch_plan(q, connector_id=cid), ctx).run()
        print(f"prewarm q{q}_sf10: {time.perf_counter() - t0:.1f}s",
              flush=True)


if __name__ == "__main__":
    main()
