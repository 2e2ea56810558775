"""Per-operator wall attribution for Q3/Q18 (debug_sync_operators)."""
import time

import jax
jax.config.update("jax_enable_x64", True)

from velox_tpu.connectors.tpch import register_tpch
from velox_tpu.exec.task import QueryCtx, Task
from velox_tpu.tpch import tpch_plan

register_tpch(1.0, rows_per_split=1 << 21)


def ctx():
    return QueryCtx({"debug_sync_operators": True})


for q in (3, 18):
    Task(tpch_plan(q)).run()  # warm compile w/o sync overhead
    Task(tpch_plan(q), ctx()).run()  # warm the synced variants
    t = Task(tpch_plan(q), ctx())
    t0 = time.perf_counter()
    t.run()
    wall = time.perf_counter() - t0
    print(f"\n=== Q{q}: wall {wall:.3f}s (synced) ===", flush=True)
    print(t.print_plan_with_stats(), flush=True)
