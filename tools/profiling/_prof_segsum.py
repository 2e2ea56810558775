"""Component costs of the segmented float-sum paths at 8M rows."""
import time

import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

from velox_tpu.ops import wide as W


def _force(out):
    leaves = jax.tree_util.tree_leaves(out)
    jax.device_get(leaves[0].ravel()[0])


def bench(name, fn, *args):
    _force(fn(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _force(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best*1e3:.1f} ms", flush=True)


N = 1 << 23
rng = np.random.RandomState(0)
x = jnp.asarray(rng.uniform(1, 50, N))
xi = jnp.asarray(rng.randint(0, 1 << 31, N).astype(np.int64))
x32 = xi.astype(jnp.int32)
gid = jnp.asarray(np.sort(rng.randint(0, N // 2, N)).astype(np.int32))
boundary = jnp.concatenate([jnp.ones((1,), bool), gid[1:] != gid[:-1]])
active = jnp.ones((N,), bool)
idx_end = jnp.where(
    jnp.concatenate([boundary[1:], jnp.ones((1,), bool)]), gid, N)

bench("cumsum i64", jax.jit(jnp.cumsum), xi)
bench("cumsum i32", jax.jit(jnp.cumsum), x32)
bench("cumsum f32", jax.jit(jnp.cumsum), x.astype(jnp.float32))
bench("scatter-set i32 (N->N)", jax.jit(
    lambda i, v: jnp.zeros((N + 1,), jnp.int32).at[i].set(v, mode="drop")),
    idx_end, x32)
bench("scatter_unique_set i64", jax.jit(
    lambda i, v: W.scatter_unique_set(N + 1, i, v)), idx_end, xi)
bench("fixedpoint segsum f64", jax.jit(
    lambda d, i: W._segmented_float_sum_fixedpoint(d, i, N)), x, idx_end)
bench("scan segsum f64", jax.jit(
    lambda d, i, b: W._segmented_scan_reduce(
        d, i, b, N, jnp.add, jnp.asarray(0.0, d.dtype))),
    x, idx_end, boundary)
bench("int segsum i64 (cumsum+scatter+diff)", jax.jit(
    lambda d, i: (lambda cs: (lambda e: e - jnp.concatenate(
        [jnp.zeros_like(e[:1]), e[:-1]]))(
        W.scatter_unique_set(N + 1, i, cs)[:N]))(jnp.cumsum(d))),
    xi, idx_end)
