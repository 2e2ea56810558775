"""Profile Q3/Q18 SF1 on the real chip: per-operator wall decomposition."""
import sys
import time

import jax
jax.config.update("jax_enable_x64", True)

from velox_tpu.connectors.tpch import register_tpch
from velox_tpu.exec.task import Task
from velox_tpu.tpch import tpch_plan

q = int(sys.argv[1]) if len(sys.argv) > 1 else 3
register_tpch(1.0, rows_per_split=1 << 21)

for it in range(2):
    t0 = time.perf_counter()
    task = Task(tpch_plan(q))
    out = task.run()
    dt = time.perf_counter() - t0
    print(f"=== run {it}: {dt:.3f}s rows={out.num_rows}")
    print(task.print_plan_with_stats())
