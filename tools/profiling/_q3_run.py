import faulthandler, time, jax
faulthandler.dump_traceback_later(180, repeat=True)
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_log_compiles", True)
from velox_tpu.connectors.tpch import register_tpch
from velox_tpu.tpch import tpch_plan
from velox_tpu.exec.task import Task
register_tpch(1.0)
t0=time.perf_counter(); out = Task(tpch_plan(3)).run(); t1=time.perf_counter()
print(f"Q3 SF1 cold {t1-t0:.1f}s rows={out.num_rows}", flush=True)
t0=time.perf_counter(); out = Task(tpch_plan(3)).run(); t1=time.perf_counter()
print(f"Q3 SF1 warm {t1-t0:.2f}s rows={out.num_rows}", flush=True)
