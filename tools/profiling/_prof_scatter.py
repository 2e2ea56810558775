"""Primitive costs at Q3/Q18 shapes: scatter-add (segment_sum) and
gathers vs table size, on the real chip."""
import time

import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

N = 1 << 23         # 8M updates
DOM = 6_000_000     # Q3/Q18 orderkey domain

np.random.seed(0)
idx = jnp.asarray(np.random.randint(0, DOM, N).astype(np.int32))
valf = jnp.asarray(np.random.rand(N).astype(np.float32))
vali = jnp.asarray(np.random.randint(0, 1000, N).astype(np.int32))


def _force(out):
    """block_until_ready does NOT wait through the axon tunnel; a scalar
    fetch forces execution (25 ms RTT rides every measurement equally)."""
    leaves = jax.tree_util.tree_leaves(out)
    jax.device_get(leaves[0].ravel()[0])


def bench(name, fn, *args):
    _force(fn(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _force(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best*1e3:.1f} ms  ({N/best/1e6:.1f} M/s)", flush=True)


bench("segment_sum f32 8M->6M", jax.jit(
    lambda i, v: jnp.zeros((DOM,), jnp.float32).at[i].add(v)), idx, valf)
bench("segment_sum i32 8M->6M", jax.jit(
    lambda i, v: jnp.zeros((DOM,), jnp.int32).at[i].add(v)), idx, vali)
bench("scatter-set i32 8M->6M", jax.jit(
    lambda i, v: jnp.zeros((DOM,), jnp.int32).at[i].set(v)), idx, vali)
bench("3x f32 segment_sum (exact f64)", jax.jit(
    lambda i, v: (jnp.zeros((DOM,), jnp.float32).at[i].add(v),
                  jnp.zeros((DOM,), jnp.float32).at[i].add(v * 2),
                  jnp.zeros((DOM,), jnp.float32).at[i].add(v * 3))),
    idx, valf)

# gathers vs table size
for dom in (1 << 20, 6_000_000, 1 << 24):
    tbl = jnp.asarray(np.random.randint(0, 100, dom).astype(np.int32))
    gi = jnp.asarray(np.random.randint(0, dom, N).astype(np.int32))
    bench(f"gather i32 8M from {dom>>20}M-tbl",
          jax.jit(lambda t, i: t[i]), tbl, gi)
# monotone (sorted) indices: does locality help?
gi_s = jnp.sort(jnp.asarray(np.random.randint(0, DOM, N).astype(np.int32)))
tbl = jnp.asarray(np.random.randint(0, 100, DOM).astype(np.int32))
bench("gather i32 8M SORTED idx 6M-tbl", jax.jit(lambda t, i: t[i]),
      tbl, gi_s)
# two-column gather fused in one program
t2 = jnp.asarray(np.random.randint(0, 100, DOM).astype(np.int32))
bench("2-col gather (1 program)", jax.jit(lambda a, b, i: (a[i], b[i])),
      tbl, t2, idx)
# i64 gather for comparison
t64 = jnp.asarray(np.random.randint(0, 100, DOM).astype(np.int64))
bench("gather i64 8M from 6M-tbl", jax.jit(lambda t, i: t[i]), t64, idx)
# cumsum over domain (compaction cost)
bench("cumsum i32 over 6M", jax.jit(lambda x: jnp.cumsum(x)),
      (tbl > 50).astype(jnp.int32))
