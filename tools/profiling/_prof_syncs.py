"""Count device_get syncs + their wall share for Q3/Q18 warm runs."""
import time

import jax
jax.config.update("jax_enable_x64", True)

from velox_tpu.connectors.tpch import register_tpch
from velox_tpu.exec.task import Task
from velox_tpu.tpch import tpch_plan

register_tpch(1.0, rows_per_split=1 << 21)

orig = jax.device_get
stats = {"n": 0, "t": 0.0, "sites": {}}


def traced_get(x):
    import traceback
    t0 = time.perf_counter()
    out = orig(x)
    dt = time.perf_counter() - t0
    stats["n"] += 1
    stats["t"] += dt
    site = None
    for fr in reversed(traceback.extract_stack()[:-1]):
        if "velox_tpu" in fr.filename:
            site = f"{fr.filename.split('velox_tpu/')[-1]}:{fr.lineno}"
            break
    key = site or "external"
    agg = stats["sites"].setdefault(key, [0, 0.0])
    agg[0] += 1
    agg[1] += dt
    return out


for q in (3, 18):
    Task(tpch_plan(q)).run()  # warm
    jax.device_get = traced_get
    stats.update({"n": 0, "t": 0.0, "sites": {}})
    t0 = time.perf_counter()
    Task(tpch_plan(q)).run()
    wall = time.perf_counter() - t0
    jax.device_get = orig
    print(f"Q{q}: wall {wall:.3f}s, {stats['n']} syncs, "
          f"{stats['t']:.3f}s in device_get", flush=True)
    for site, (n, t) in sorted(stats["sites"].items(),
                               key=lambda kv: -kv[1][1]):
        print(f"  {site}: n={n} t={t*1e3:.0f}ms", flush=True)
