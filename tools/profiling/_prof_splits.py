"""Effect of rows_per_split on SF1 warm walls (dispatch-count lever)."""
import sys
import time

import jax
jax.config.update("jax_enable_x64", True)

from velox_tpu.connectors.tpch import register_tpch
from velox_tpu.exec.task import Task
from velox_tpu.tpch import tpch_plan

rps = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 22
register_tpch(1.0, rows_per_split=rps)

for q in (6, 1, 3, 18):
    t0 = time.perf_counter()
    Task(tpch_plan(q)).run()
    first = time.perf_counter() - t0
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        out = Task(tpch_plan(q)).run()
        best = min(best, time.perf_counter() - t0)
    print(f"Q{q} rps={rps>>20}M first {first:.1f}s warm {best:.3f}s "
          f"rows={out.num_rows}", flush=True)
