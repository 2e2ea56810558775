"""Q18-shaped group-by: sort-mode (current) vs dense array-mode prototype.

Shape: 8M rows (4x2M caps, 6M real), key = orderkey in [1, 6M],
addend = f64 quantity. Also measures f32/i32 scatter-add rates.
"""
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
    per = f"  ({best*1e3/(n/1e6):.1f} ms/M)" if n else ""
    print(f"{name}: {best*1e3:.1f} ms{per}", flush=True)


rng = np.random.RandomState(0)
N = 1 << 23            # 8M padded rows
DOMAIN = 6_000_000
keys = jnp.asarray(rng.randint(1, DOMAIN + 1, N).astype(np.int64))
qty = jnp.asarray(rng.randint(1, 51, N).astype(np.float64))
active = jnp.asarray(np.arange(N) % 4 < 3)  # 75% live (split padding)

# --- scatter-add rates --------------------------------------------------
idx32 = (keys - 1).astype(jnp.int32)
bench("scatter-add f32 8M->6M", jax.jit(
    lambda i, v: jnp.zeros((DOMAIN,), jnp.float32).at[i].add(v)),
    idx32, qty.astype(jnp.float32), n=N)
bench("scatter-add i32 8M->6M", jax.jit(
    lambda i, v: jnp.zeros((DOMAIN,), jnp.int32).at[i].add(v)),
    idx32, qty.astype(jnp.int32), n=N)
bench("segment_sum f32 8M->6M", jax.jit(
    lambda i, v: jax.ops.segment_sum(v, i, num_segments=DOMAIN)),
    idx32, qty.astype(jnp.float32), n=N)
bench("scatter-max i32 (occupied)", jax.jit(
    lambda i, v: jnp.zeros((DOMAIN,), jnp.int32).at[i].max(v)),
    idx32, jnp.ones((N,), jnp.int32), n=N)


# --- current sort-mode whole group-by -----------------------------------
def sort_mode(keys, qty, active):
    from velox_tpu.exec.groupby import reduce_sort_mode
    from velox_tpu.expression.eval import EvalValue
    from velox_tpu import types as T
    kv = EvalValue(keys, None, T.BIGINT)
    gk, gs, gm = reduce_sort_mode(
        [kv], [(qty, "sum")], active, N, ranges=((1, DOMAIN),))
    return gk[0].data, gs[0], gm


bench("sort-mode group-by (ride)", jax.jit(sort_mode), keys, qty, active,
      n=N)


# --- dense array-mode prototype -----------------------------------------
def array_mode(keys, qty, active):
    ids = jnp.where(active, (keys - 1).astype(jnp.int32),
                    jnp.int32(DOMAIN))
    # f64 sum as 2x planar f32 (hi = f32(x), lo = f32(x - hi)); quantities
    # are small ints so hi alone is exact, but measure the honest 2-lane
    hi = qty.astype(jnp.float32)
    lo = (qty - hi.astype(jnp.float64)).astype(jnp.float32)
    shi = jnp.zeros((DOMAIN + 1,), jnp.float32).at[ids].add(hi)[:DOMAIN]
    slo = jnp.zeros((DOMAIN + 1,), jnp.float32).at[ids].add(lo)[:DOMAIN]
    occ = jnp.zeros((DOMAIN + 1,), jnp.int32).at[ids].max(
        active.astype(jnp.int32))[:DOMAIN] > 0
    # compact occupied groups to a dense prefix
    didx = jnp.cumsum(occ.astype(jnp.int32)) - 1
    num = didx[-1] + 1
    tgt = jnp.where(occ, didx, jnp.int32(DOMAIN))
    gkey = jnp.zeros((DOMAIN,), jnp.int64).at[tgt].set(
        jnp.arange(1, DOMAIN + 1, dtype=jnp.int64), mode="drop")
    gsum = (jnp.zeros((DOMAIN,), jnp.float32).at[tgt].set(
        shi, mode="drop").astype(jnp.float64)
        + jnp.zeros((DOMAIN,), jnp.float32).at[tgt].set(
            slo, mode="drop").astype(jnp.float64))
    return gkey, gsum, num


bench("array-mode group-by (proto)", jax.jit(array_mode), keys, qty,
      active, n=N)

# verify equivalence on a small slice
gk_a, gs_a, num = jax.jit(array_mode)(keys, qty, active)
gk_s, gs_s, gm_s = jax.jit(sort_mode)(keys, qty, active)
num = int(num)
gk_a, gs_a = np.asarray(gk_a[:num]), np.asarray(gs_a[:num])
n_s = int(np.asarray(jnp.sum(gm_s)))
gk_s, gs_s = np.asarray(gk_s[:n_s]), np.asarray(gs_s[:n_s])
assert num == n_s, (num, n_s)
assert (gk_a == gk_s).all()
assert np.allclose(gs_a, gs_s)
print(f"equivalent: {num} groups", flush=True)
