import faulthandler, time, jax
faulthandler.dump_traceback_later(120, repeat=True)
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_log_compiles", True)
from velox_tpu.connectors.tpch import register_tpch
from velox_tpu.exec.task import Task
from velox_tpu.testing.plan_builder import PlanBuilder
register_tpch(1.0, rows_per_split=1 << 21)
def ob():
    return (PlanBuilder().table_scan("lineitem", ["l_shipdate", "l_orderkey"],
            connector_id="tpch").order_by(["l_shipdate", "l_orderkey"])
            .limit(1000).plan())
t0=time.perf_counter(); Task(ob()).run(); print(f"ob first {time.perf_counter()-t0:.1f}s", flush=True)
for i in range(3):
    t0=time.perf_counter(); Task(ob()).run(); print(f"ob warm {time.perf_counter()-t0:.2f}s", flush=True)
