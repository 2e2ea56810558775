"""Decompose the SF1 cold wall: native build, host dbgen per table, upload."""
import time

import numpy as np

t0 = time.perf_counter()
from velox_tpu.connectors import tpch_native
print(f"import tpch_native: {time.perf_counter()-t0:.2f}s", flush=True)

t0 = time.perf_counter()
ok = tpch_native.available()
print(f"native build/load: {time.perf_counter()-t0:.2f}s ok={ok}", flush=True)

from velox_tpu.connectors.tpch import TPCH_SCHEMAS, TpchTableGen
gen = TpchTableGen(1.0)
for table in ("customer", "orders", "lineitem"):
    cols = list(TPCH_SCHEMAS[table].names)
    n = gen.num_rows(table) if table != "lineitem" else None
    t0 = time.perf_counter()
    if table == "lineitem":
        out = gen.generate(table, 0, 1_500_000, cols)
    else:
        out = gen.generate(table, 0, n, cols)
    dt = time.perf_counter() - t0
    nr = len(next(iter(out.values())))
    print(f"gen {table}: {dt:.2f}s rows={nr}", flush=True)

# upload cost for lineitem through the tunnel
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
arrs = {k: v for k, v in out.items() if isinstance(v, np.ndarray)}
total = sum(a.nbytes for a in arrs.values())
t0 = time.perf_counter()
dev = {k: jnp.asarray(v) for k, v in arrs.items()}
for d in dev.values():
    d.block_until_ready()
print(f"upload lineitem {total/1e6:.0f}MB: {time.perf_counter()-t0:.2f}s",
      flush=True)
