"""Benchmark: TPC-H Q6 superstep throughput on the available device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: lineitem rows/s through the fused Q6 pipeline (filter + project +
global sum — the reference's `velox_tpch_benchmark` Q6 configuration,
velox/exec/tests/utils/TpchQueryBuilder.cpp:723). Data is pre-staged in HBM
(the reference equivalently reads from page cache on repeat runs); timing
covers the compute pipeline over all batches.

vs_baseline: ratio against a vectorized CPU implementation of the identical
query over the identical in-memory arrays (numpy, this host) — the stand-in
for the reference engine's per-core throughput, since the reference
publishes no absolute numbers (BASELINE.md).
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from velox_tpu.connectors.tpch import TpchConnector
    from velox_tpu.expression.eval import ExprSet
    from velox_tpu.parse.parser import parse_expression

    sf = 1.0
    conn = TpchConnector("tpch-bench", scale_factor=sf,
                         rows_per_split=64 * 1024 * 1024)
    cols = ["l_shipdate", "l_extendedprice", "l_quantity", "l_discount"]
    # one exact-capacity split: measure compute, not padding (the lineitem
    # capacity formula otherwise assumes the worst-case 7 lines/order)
    from velox_tpu.connectors.tpch import TpchDataSource
    from velox_tpu.vector.device import default_capacity
    n_orders = conn.num_index_rows("lineitem")
    exact_rows = conn.gen.num_rows("lineitem")
    source = TpchDataSource(conn.gen, "lineitem", cols,
                            capacity=default_capacity(exact_rows))
    splits = conn.default_splits("lineitem")
    assert len(splits) == 1

    # stage all batches in HBM
    batches = []
    total_rows = 0
    for s in splits:
        while True:
            b = source.next(s)
            if b is None:
                break
            total_rows += int(np.asarray(jax.device_get(b.num_active())))
            batches.append(b)

    rt = batches[0].row_type()
    pred = parse_expression(
        "l_shipdate >= date '1994-01-01' and l_shipdate < date '1995-01-01'"
        " and l_discount between 0.05 and 0.07 and l_quantity < 24.0", rt)
    revenue = parse_expression("l_extendedprice * l_discount", rt)

    @jax.jit
    def superstep(b):
        es = ExprSet([pred, revenue], rt)
        passed, rev = es.eval_batch(b)
        keep = b.mask & passed.full_data(b.capacity).astype(bool)
        if passed.validity is not None:
            keep = keep & passed.full_validity(b.capacity)
        data = rev.full_data(b.capacity)
        return jnp.sum(jnp.where(keep, data, jnp.zeros_like(data)))

    # Stack all batches into one (num_batches, cap) pytree: a full pass is
    # ONE device dispatch (per-call dispatch latency dominates otherwise —
    # the compiled superstep itself runs ~0.05 ms per 460K-row batch).
    stacked = jax.tree_util.tree_map(lambda *a: jnp.stack(a), *batches)

    @jax.jit
    def run_all(sb):
        return jnp.sum(jax.vmap(superstep)(sb))

    result = run_all(stacked).block_until_ready()  # warm up (compile)
    n_iters = 20
    t0 = time.perf_counter()
    for _ in range(n_iters):
        result = run_all(stacked)
    result.block_until_ready()
    dt = (time.perf_counter() - t0) / n_iters
    rows_per_s = total_rows / dt

    # CPU baseline: identical computation, vectorized numpy over host data
    # regenerated exactly. Money columns are DECIMAL(12,2) scaled ints, so
    # both sides compute exact integer sums (device result must match
    # bit-for-bit).
    n_orders = conn.num_index_rows("lineitem")
    host_parts = {c: [] for c in cols}
    step = 1 << 20
    for lo in range(0, n_orders, step):
        arrays = conn.gen.generate("lineitem", lo,
                                   min(lo + step, n_orders), cols)
        for c in cols:
            host_parts[c].append(arrays[c])
    host = {c: np.concatenate(host_parts[c]) for c in cols}
    d94 = (np.datetime64("1994-01-01")
           - np.datetime64("1970-01-01")).astype(int)
    d95 = (np.datetime64("1995-01-01")
           - np.datetime64("1970-01-01")).astype(int)

    def cpu_q6():
        m = ((host["l_shipdate"] >= d94) & (host["l_shipdate"] < d95)
             & (host["l_discount"] >= 5) & (host["l_discount"] <= 7)
             & (host["l_quantity"] < 2400))
        return (host["l_extendedprice"] * host["l_discount"] * m).sum()

    cpu_result = cpu_q6()
    t0 = time.perf_counter()
    for _ in range(3):
        cpu_q6()
    cpu_dt = (time.perf_counter() - t0) / 3
    cpu_rows_per_s = total_rows / cpu_dt

    assert int(result) == int(cpu_result), (int(result), int(cpu_result))

    print(json.dumps({
        "metric": "tpch_q6_sf1_rows_per_s",
        "value": rows_per_s,
        "unit": "rows/s",
        "vs_baseline": rows_per_s / cpu_rows_per_s,
    }))


if __name__ == "__main__":
    main()
