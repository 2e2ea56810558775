"""Per-operator micro-benchmarks on the current device.

Role parity: velox/benchmarks/basic/* (folly::Benchmark suites). Prints a
throughput table; bench.py remains the driver's single-line headline.

Usage: python benchmarks.py [rows_log2]
"""

from __future__ import annotations

import sys
import time


def timeit(fn, *args, iters=10):
    import jax
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters


def run_micro(rows_log2: int = 20):
    """Micro suite -> {name: M rows/s}; embedded into bench_detail.json
    by bench.py so kernel-level progress is visible round-over-round."""
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    from velox_tpu.exec import hashtable as H
    from velox_tpu.exec.sort import radix_sort_perm
    from velox_tpu.expression.eval import EvalValue
    from velox_tpu import types as T

    n = 1 << rows_log2
    rng = np.random.RandomState(0)
    print(f"device={jax.devices()[0]}, rows={n}",
          file=sys.stderr)
    rows = []

    # filter+sum superstep (Q6 core)
    sd = jnp.asarray(rng.randint(8000, 11000, n).astype(np.int32))
    price = jnp.asarray(rng.randint(10**5, 10**7, n).astype(np.int32))
    disc = jnp.asarray(rng.randint(0, 11, n).astype(np.int32))

    @jax.jit
    def filter_sum(sd, price, disc):
        keep = (sd >= 8766) & (sd < 9131) & (disc >= 5) & (disc <= 7)
        return jnp.sum(jnp.where(
            keep, price.astype(jnp.int64) * disc, 0))

    dt = timeit(filter_sum, sd, price, disc)
    rows.append(("filter+multiply+sum (3 int32 cols)", n / dt / 1e6))

    # radix sort permutation, 32-bit keys
    keys = jnp.asarray(rng.randint(0, 1 << 31, n).astype(np.uint32))
    sort_fn = jax.jit(lambda w: radix_sort_perm([w], [32], n))
    dt = timeit(sort_fn, keys)
    rows.append(("radix sort perm (u32 keys)", n / dt / 1e6))

    # hash-table group-by (sum over ~64K groups)
    gk = jnp.asarray(rng.randint(0, 1 << 16, n).astype(np.int64))
    vals = jnp.asarray(rng.randint(0, 1000, n).astype(np.int64))
    active = jnp.ones((n,), bool)

    @jax.jit
    def group_sum(gk, vals, active):
        kv = [EvalValue(gk, None, T.BIGINT)]
        table = H.empty_table(kv, H.table_size_for(n))
        table, slots, _ = H.insert(table, kv, active, n)
        seg = jnp.where(active, slots, jnp.int32(table.size))
        return jax.ops.segment_sum(vals, seg,
                                   num_segments=table.size + 1)

    dt = timeit(group_sum, gk, vals, active)
    rows.append(("hash group-by sum (64K groups)", n / dt / 1e6))

    # hash-join probe (unique build of n/4 keys)
    bk = jnp.asarray(rng.permutation(n)[:n // 4].astype(np.int64))
    pk = jnp.asarray(rng.randint(0, n, n).astype(np.int64))

    @jax.jit
    def rebuild(bk):
        bkv = [EvalValue(bk, None, T.BIGINT)]
        t = H.empty_table(bkv, H.table_size_for(n // 4))
        t, _, _ = H.insert(t, bkv, jnp.ones((n // 4,), bool), n // 4)
        return t

    table = rebuild(bk)

    @jax.jit
    def probe(table, pk):
        kv = [EvalValue(pk, None, T.BIGINT)]
        slots, found = H.lookup(table, kv, jnp.ones((n,), bool), n)
        return jnp.sum(found)

    dt = timeit(probe, table, pk)
    rows.append(("hash-join probe (25% hit domain)", n / dt / 1e6))

    # gather: XLA take vs the lane-roll flat-gather kernel
    data32 = jnp.asarray(rng.randint(-10**9, 10**9, min(n, 1 << 20))
                         .astype(np.int32))
    idx = jnp.asarray(rng.randint(0, data32.shape[0], n)
                      .astype(np.int32))
    dt = timeit(jax.jit(lambda d, i: d[i]), data32, idx)
    rows.append(("XLA gather (i32, 1M-row data)", n / dt / 1e6))
    from velox_tpu.ops import pallas_kernels as PK
    if PK.should_use(n):
        try:
            fg = jax.jit(lambda d, i: PK.flat_gather(d, i))
            dt = timeit(fg, data32, idx)
            rows.append(("pallas flat_gather (i32, 1M-row data)",
                         n / dt / 1e6))
        except Exception as e:
            print(f"flat_gather skipped: {e}", file=sys.stderr)

    return dict(rows)


def main():
    rows = run_micro(int(sys.argv[1]) if len(sys.argv) > 1 else 20)
    print(f"{'operation':45s} {'M rows/s':>10s}")
    for name, thr in rows.items():
        print(f"{name:45s} {thr:10.1f}")


if __name__ == "__main__":
    main()
