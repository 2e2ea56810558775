import time
import numpy as np
import jax
jax.config.update("jax_enable_x64", True)
import pyarrow as pa
import pyarrow.compute as pc
from velox_tpu.testing.plan_builder import PlanBuilder
from velox_tpu.exec.task import Task

N = 10_000_000
rng = np.random.default_rng(0)
ints = rng.permutation(N).astype(np.int64)
sarr = pc.cast(pa.array(ints), pa.string())
vals = rng.integers(0, 1000, N).astype(np.int64)
tbl = pa.table({"s": sarr, "v": pa.array(vals)})

def plan():
    return (PlanBuilder()
            .values([tbl], string_encoding="raw")
            .single_aggregation(["s"], ["count(v) as c", "sum(v) as sv"])
            .plan())

for it in range(3):
    t0 = time.perf_counter()
    out = Task(plan()).run()
    print(f"iter{it}: {time.perf_counter()-t0:.2f}s rows={out.num_rows}", flush=True)
