import time, jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from velox_tpu.connectors.tpch import register_tpch
from velox_tpu.testing.plan_builder import PlanBuilder
from velox_tpu.exec.task import Task

conn = register_tpch(1.0, rows_per_split=1 << 21)

def wall(label, fn):
    t0 = time.perf_counter(); r = fn(); t1 = time.perf_counter()
    print(f"{label}: {t1-t0:.2f}s", flush=True); return r

plan = (PlanBuilder()
        .table_scan("lineitem", ["l_shipdate", "l_orderkey"],
                    connector_id="tpch")
        .order_by(["l_shipdate", "l_orderkey"]).limit(1000).plan())
# warm everything once
Task(plan).run()
# measure the full wall again
wall("orderby+limit total", lambda: Task(plan).run())

# stage 1: scan only (device cache hit) with a forced fetch
scan_plan = (PlanBuilder()
             .table_scan("lineitem", ["l_shipdate", "l_orderkey"],
                         connector_id="tpch")
             .single_aggregation([], ["count(*) as c"]).plan())
Task(scan_plan).run()
wall("scan+count", lambda: Task(scan_plan).run())

# stage 2: sort_batch alone on a concatenated batch
from velox_tpu.exec.batch_utils import concat_batches
from velox_tpu.exec.orderby import sort_batch, _key_ranges
t = Task(plan)
batches = []
from velox_tpu.core import plan as P
node = plan
while not isinstance(node, P.TableScanNode):
    node = node.sources[0]
for b in Task(PlanBuilder().table_scan(
        "lineitem", ["l_shipdate", "l_orderkey"],
        connector_id="tpch").plan()).batches():
    batches.append(b)
merged = concat_batches(batches)
print("merged cap:", merged.capacity, flush=True)
ob = plan.sources[0]
keys, orders = list(ob.keys), list(ob.orders)
rngs = _key_ranges(ob, keys)
fn = jax.jit(lambda b: sort_batch(b, keys, orders, rngs))
out = fn(merged)
jax.device_get(out.mask[:8])
def sort_once():
    o = fn(merged)
    return jax.device_get(o.columns["l_orderkey"].data[:8])
wall("sort_batch jit (warm)", sort_once)
