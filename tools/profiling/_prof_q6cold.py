import time
t00 = time.perf_counter()
import jax
jax.config.update("jax_enable_x64", True)
from velox_tpu.connectors.tpch import register_tpch
from velox_tpu.exec.task import Task
from velox_tpu.tpch import tpch_plan
print(f"imports: {time.perf_counter()-t00:.1f}s", flush=True)
register_tpch(1.0, rows_per_split=1 << 21)
t0 = time.perf_counter()
out = Task(tpch_plan(6)).run()
print(f"Q6 cold: {time.perf_counter()-t0:.1f}s rows={out.num_rows}", flush=True)
t0 = time.perf_counter()
out = Task(tpch_plan(6)).run()
print(f"Q6 warm: {time.perf_counter()-t0:.3f}s", flush=True)
