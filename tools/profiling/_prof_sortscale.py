"""lax.sort cost vs n and operand count; flat_gather rate; VMEM gather."""
import time

import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np


def _force(out):
    leaves = jax.tree_util.tree_leaves(out)
    jax.device_get(leaves[0].ravel()[0])


def bench(name, fn, *args, n=None):
    _force(fn(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _force(fn(*args))
        best = min(best, time.perf_counter() - t0)
    per = f"  ({best*1e3/ (n/1e6):.1f} ms/M)" if n else ""
    print(f"{name}: {best*1e3:.1f} ms{per}", flush=True)


rng = np.random.RandomState(0)
for n in (1 << 20, 1 << 22, 1 << 23):
    k = jnp.asarray(rng.randint(0, 1 << 31, n).astype(np.uint32))
    p1 = jnp.asarray(rng.rand(n).astype(np.float32))
    p2 = jnp.asarray(rng.rand(n).astype(np.float32))
    p64 = jnp.asarray(rng.randint(0, 1 << 60, n).astype(np.int64))
    bench(f"lax.sort k+iota n={n>>20}M",
          jax.jit(lambda k: jax.lax.sort(
              (k, jnp.arange(k.shape[0], dtype=jnp.int32)), num_keys=1)),
          k, n=n)
    bench(f"lax.sort k+2xf32 n={n>>20}M",
          jax.jit(lambda k, a, b: jax.lax.sort((k, a, b), num_keys=1)),
          k, p1, p2, n=n)
    bench(f"lax.sort k+i64 n={n>>20}M",
          jax.jit(lambda k, a: jax.lax.sort((k, a), num_keys=1)),
          k, p64, n=n)

# flat_gather on-chip rate (i32, data 1M)
from velox_tpu.ops import pallas_kernels as PK
data = jnp.asarray(rng.randint(0, 100, 1 << 20).astype(np.int32))
idx = jnp.asarray(rng.randint(0, 1 << 20, 1 << 22).astype(np.int32))
try:
    bench("flat_gather i32 4M idx, 1M data",
          jax.jit(lambda d, i: PK.flat_gather(d, i)), data, idx,
          n=1 << 22)
except Exception as e:
    print("flat_gather failed:", e, flush=True)
bench("XLA gather i32 4M idx, 1M data",
      jax.jit(lambda d, i: d[i]), data, idx, n=1 << 22)
