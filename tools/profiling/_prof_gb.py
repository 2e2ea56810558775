"""Microbench: sort-mode groupby at Q3-like shapes on the real chip."""
import time
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

from velox_tpu import types as T
from velox_tpu.exec import groupby as G
from velox_tpu.expression.eval import EvalValue

def sync(x):
    return jax.device_get(jnp.sum(x[0].data) if isinstance(x, list) else jnp.sum(x))

for cap in (1 << 21, 1 << 23):
    np.random.seed(0)
    n = cap
    orderkey = np.random.randint(1, 6_000_000, n).astype(np.int64)
    odate = np.random.randint(8000, 10406, n).astype(np.int32)
    ship = np.zeros(n, np.int32)
    rev = np.random.rand(n).astype(np.float64)
    active = np.ones(n, bool)
    ranges = ((1, 6_000_000), (8000, 10406), (0, 0))

    @jax.jit
    def run(ok, od, sp, rv, act):
        keys = [EvalValue(ok, None, T.BIGINT, None),
                EvalValue(od, None, T.DATE, None),
                EvalValue(sp, None, T.INTEGER, None)]
        gk, gs, gm = G.reduce_sort_mode(keys, [(rv, "sum")], act, cap, ranges=ranges)
        return [k.data for k in gk], gs, gm

    args = tuple(jnp.asarray(a) for a in (orderkey, odate, ship, rev, active))
    t0 = time.perf_counter()
    out = run(*args)
    sync(out[1][0])
    print(f"cap={cap>>20}M cold: {time.perf_counter()-t0:.2f}s", flush=True)
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(*args)
        sync(out[1][0])
        print(f"cap={cap>>20}M warm: {time.perf_counter()-t0:.3f}s", flush=True)
