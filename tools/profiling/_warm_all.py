import time, jax
jax.config.update("jax_enable_x64", True)
from velox_tpu.connectors.tpch import register_tpch
from velox_tpu.tpch import tpch_plan
from velox_tpu.tpch.queries import q18
from velox_tpu.exec.task import Task
register_tpch(1.0)
for name, pf in (("Q18", q18), ("Q1", lambda: tpch_plan(1)),
                 ("Q6", lambda: tpch_plan(6)), ("Q3", lambda: tpch_plan(3))):
    t0 = time.perf_counter(); out = Task(pf()).run(); t1 = time.perf_counter()
    t0b = time.perf_counter(); out = Task(pf()).run(); t1b = time.perf_counter()
    print(f"{name} SF1 cold {t1-t0:.1f}s warm {t1b-t0b:.2f}s rows={out.num_rows}", flush=True)
print("ALL DONE", flush=True)
