"""Benchmark: TPC-H Q1/Q3/Q6/Q18 + orderBy through the engine on the
available device, vs a pandas/numpy CPU baseline over identical data.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} and writes
per-config detail to bench_detail.json. A wall-clock budget
(VELOX_BENCH_BUDGET_S, default 540s) guards the run: a watchdog thread
prints the summary from whatever configs completed and exits at the
deadline, and the SF10/micro stages are skipped when too little budget
remains — the summary line is ALWAYS produced.

Configs follow BASELINE.json (Q6 scan+filter+sum, Q1 hash aggregate,
orderBy radix sort, Q3 join+aggregate, Q18 skewed join) at SF1 on the one
available chip — the SF10/SF100 multi-chip/multi-host entries of
BASELINE.json need hardware this environment does not expose (single chip
via tunnel); distributed shapes are validated by dryrun_multichip instead.

Timing: each query runs twice; the reported wall is the SECOND run —
device-cached scans (connectors/cache.py), compiled programs warm. That
matches the reference's repeat-run regime (page-cache-resident files).

vs_baseline: pandas/numpy (vectorized C) computing the identical query
over the identical host arrays. The reference engine itself cannot be
compiled in this environment (its dependency bootstrap needs network
access), so this is the honest available stand-in for a CPU engine;
BASELINE.md records that no absolute reference numbers are published.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

import numpy as np
import pandas as pd

# ---- wall-clock budget + watchdog -----------------------------------------
# Round 4's driver run timed out (rc=124) with ZERO output: the final
# commits invalidated the persistent compile cache, every multi-join plan
# recompiled through the minutes-long remote AOT path, and the summary line
# never printed. The bench must ALWAYS emit its one JSON line within the
# budget, reporting whatever configs completed; a daemon watchdog prints the
# partial summary and exits the process at the deadline.
BUDGET_S = float(os.environ.get("VELOX_BENCH_BUDGET_S", "540"))
_T0 = time.monotonic()
_STATE = {"rates": [], "ratios": [], "detail": {}, "printed": False}
# RLock: the SIGTERM handler runs ON the main thread and may interrupt
# a frame already inside _emit_summary — a plain Lock would self-deadlock
_PRINT_LOCK = threading.RLock()


def _remaining():
    return BUDGET_S - (time.monotonic() - _T0)


def _emit_summary(partial=False, reason="budget_exceeded"):
    """Print the one stdout JSON line (idempotent across threads). The
    summary line must survive EVERYTHING — the detail dict may be
    mid-mutation on another thread when the watchdog fires, so every
    step before the final print is individually guarded."""
    with _PRINT_LOCK:
        if _STATE["printed"]:
            return
        _STATE["printed"] = True
    rates = list(_STATE["rates"])
    ratios = list(_STATE["ratios"])
    try:
        detail = dict(_STATE["detail"])  # snapshot (may race mutation)
    except RuntimeError:
        detail = {}
    if partial:
        detail[reason] = {
            "budget_s": BUDGET_S, "configs_done": len(rates)}
    try:
        with open("bench_detail.json", "w") as f:
            json.dump(detail, f, indent=1)
        print(json.dumps(detail), file=sys.stderr)
    except Exception:
        pass
    try:
        geo_rate = float(np.exp(np.mean(np.log(rates)))) if rates else 0.0
        geo_ratio = float(np.exp(np.mean(np.log(ratios)))) \
            if ratios else 0.0
    except Exception:
        geo_rate = geo_ratio = 0.0
    print(json.dumps({
        "metric": "tpch_sf1_geomean_lineitem_rows_per_s_warm",
        "value": geo_rate,
        "unit": "rows/s",
        "vs_baseline": geo_ratio,
    }), flush=True)
    sys.stderr.flush()


def _watchdog():
    while True:
        r = _remaining()
        if r <= 0:
            _emit_summary(partial=True)
            os._exit(0)
        time.sleep(min(r, 5.0))


def _install_sigterm_summary():
    """If an OUTER timeout (the driver wraps the bench in `timeout`)
    fires before our own budget, emit the partial summary on SIGTERM
    instead of dying silently."""
    import signal

    def _on_term(sig, frame):
        _emit_summary(partial=True, reason="terminated_by_outer_timeout")
        os._exit(0)

    try:
        signal.signal(signal.SIGTERM, _on_term)
    except (ValueError, OSError):
        pass  # non-main thread / restricted env


def days(iso):
    return (np.datetime64(iso) - np.datetime64("1970-01-01")).astype(int)


# columns the pandas baselines actually read: generating full schemas
# (16 lineitem cols incl. 6M comment strings) cost minutes of host CPU
# before the first engine run — the whole budget on a small host
COLS_NEEDED = {
    "lineitem": ["l_orderkey", "l_quantity", "l_extendedprice",
                 "l_discount", "l_tax", "l_shipdate", "l_returnflag",
                 "l_linestatus"],
    "orders": ["o_orderkey", "o_custkey", "o_orderdate",
               "o_shippriority", "o_totalprice"],
    "customer": ["c_custkey", "c_mktsegment"],
}


def host_frame(conn, table):
    """Columnar dict -> DataFrame without block consolidation (pandas
    vstack-consolidates same-dtype columns; measured minutes at SF1 on
    one core). pyarrow's to_pandas with split_blocks skips it."""
    import pyarrow as pa
    d = conn.gen.generate(table, 0, conn.num_index_rows(table),
                          COLS_NEEDED[table])
    return pa.table(d).to_pandas(split_blocks=True, self_destruct=True)


def engine_wall(plan_fn):
    """(cold_s, warm_s, result_table, warm_task) for a fresh Task."""
    from velox_tpu.exec.task import Task
    t0 = time.perf_counter()
    Task(plan_fn()).run()
    cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    task = Task(plan_fn())
    out = task.run()
    warm = time.perf_counter() - t0
    return cold, warm, out, task


def measure_hbm_bw():
    """Achievable device HBM bandwidth (bytes/s) via a jitted stream
    copy — the roofline denominator (BASELINE.md: >=70%-of-roofline
    target). 64 SEQUENTIAL read+write passes over a 512 MB buffer
    inside one program (lax.fori_loop carries the dependency, so XLA
    cannot fuse across iterations), ONE host sync: the ~25 ms tunnel
    RTT amortizes to <5% instead of dominating a single pass."""
    import jax
    import jax.numpy as jnp
    n = 1 << 27  # 512 MB of int32
    iters = 64
    a = jnp.ones((n,), jnp.int32)
    f = jax.jit(lambda x: jax.lax.fori_loop(0, iters,
                                            lambda i, y: y + 1, x))
    jax.device_get(f(a)[0])  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        y = f(a)
        jax.device_get(y[0])
        best = min(best, time.perf_counter() - t0)
    return 2.0 * n * 4 * iters / best


def measure_hbm_bw_deadline(deadline_s):
    """measure_hbm_bw on a daemon thread with a deadline: when the AOT
    compile service is degraded, a FRESH compile of even a trivial
    program can hang for minutes (observed: 4+ min for an 8-op
    elementwise jit while every cached program ran fine). The roofline
    denominator must never eat the config budget."""
    if deadline_s <= 5:
        return None
    box = {}

    def run():
        try:
            box["bw"] = measure_hbm_bw()
        except Exception:
            box["bw"] = None

    t = threading.Thread(target=run, daemon=True)
    t.start()
    t.join(timeout=deadline_s)
    return box.get("bw")


def cpu_wall(fn, iters=3):
    fn()
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn()
    return (time.perf_counter() - t0) / iters, r


def make_cpu_fns(li, od, cu):
    """pandas baselines over host frames (shared by SF1 and SF10)."""
    d94, d95 = days("1994-01-01"), days("1995-01-01")
    d0315 = days("1995-03-15")
    d0902 = days("1998-09-02")

    def cpu_q6():
        m = ((li.l_shipdate >= d94) & (li.l_shipdate < d95)
             & (li.l_discount >= 5) & (li.l_discount <= 7)
             & (li.l_quantity < 2400))
        return (li.l_extendedprice[m].to_numpy("int64")
                * li.l_discount[m].to_numpy("int64")).sum()

    def cpu_q1():
        m = li.l_shipdate <= d0902
        d = li[m]
        disc = d.l_extendedprice * (100 - d.l_discount)
        g = pd.DataFrame({
            "rf": d.l_returnflag, "ls": d.l_linestatus,
            "q": d.l_quantity, "p": d.l_extendedprice,
            "dp": disc, "ch": disc * (100 + d.l_tax), "di": d.l_discount,
        }).groupby(["rf", "ls"], sort=True)
        return g.agg(q=("q", "sum"), p=("p", "sum"), dp=("dp", "sum"),
                     ch=("ch", "sum"), di=("di", "mean"), n=("q", "size"))

    def cpu_q3():
        c = cu[cu.c_mktsegment == cu.c_mktsegment.mode()[0]][["c_custkey"]]
        o = od[od.o_orderdate < d0315]
        l2 = li[li.l_shipdate > d0315]
        j = l2.merge(o, left_on="l_orderkey", right_on="o_orderkey") \
            .merge(c, left_on="o_custkey", right_on="c_custkey")
        j = j.assign(rev=j.l_extendedprice * (100 - j.l_discount))
        g = j.groupby(["l_orderkey", "o_orderdate", "o_shippriority"],
                      as_index=False).rev.sum()
        return g.nlargest(10, "rev")

    def cpu_q18():
        s = li.groupby("l_orderkey").l_quantity.sum()
        big = s[s > 30000]
        j = od[od.o_orderkey.isin(big.index)] \
            .merge(cu, left_on="o_custkey", right_on="c_custkey")
        j = j.assign(quantity=big.loc[j.o_orderkey].to_numpy())
        return j.nlargest(100, "o_totalprice")

    def cpu_orderby():
        keys = np.lexsort((li.l_orderkey.to_numpy(),
                           li.l_shipdate.to_numpy()))
        return keys[:1000]

    return {"q6": cpu_q6, "q1": cpu_q1, "q3": cpu_q3, "q18": cpu_q18,
            "orderby": cpu_orderby}


def _run_sf10():
    """Q1/Q3/Q18 at SF10 (60M lineitem rows) with a capped query pool:
    arbitration + host offload run inside the measurement, plus the
    per-query program count, peak HBM, and offload/spill counters
    (VERDICT r4 #5 and #8). Program shapes match SF1 (same per-split
    capacity), so the warm run reuses every compiled program. Baselines
    are single-iteration pandas over the identical SF10 data."""
    from velox_tpu.common import metrics as M
    from velox_tpu.connectors.tpch import register_tpch
    from velox_tpu.core.config import QueryConfig as QC
    from velox_tpu.exec.jit_cache import program_count
    from velox_tpu.exec.memory import MemoryPool
    from velox_tpu.exec.task import QueryCtx, Task
    from velox_tpu.tpch import tpch_plan

    cid = "tpch-sf10"
    conn = register_tpch(10.0, rows_per_split=1 << 21, connector_id=cid)
    li_rows = conn.gen.num_rows("lineitem")
    out = {"lineitem_rows": li_rows}
    host = {t: host_frame(conn, t) for t in COLS_NEEDED}
    fns = make_cpu_fns(host["lineitem"], host["orders"],
                       host["customer"])
    for q in (1, 3, 18):
        ctx = QueryCtx({QC.QUERY_HBM_CAP_BYTES: 8 << 30})
        p0 = program_count()
        t0 = time.perf_counter()
        Task(tpch_plan(q, connector_id=cid), ctx).run()
        first = time.perf_counter() - t0
        ctx2 = QueryCtx({QC.QUERY_HBM_CAP_BYTES: 8 << 30})
        t0 = time.perf_counter()
        res = Task(tpch_plan(q, connector_id=cid), ctx2).run()
        warm = time.perf_counter() - t0
        t0 = time.perf_counter()
        fns[f"q{q}"]()
        cpu_dt = time.perf_counter() - t0
        entry = {
            "first_s": round(first, 3),
            "warm_s": round(warm, 3),
            "cpu_baseline_s": round(cpu_dt, 3),
            "vs_baseline": round(cpu_dt / warm, 3),
            "lineitem_rows_per_s_warm": li_rows / warm,
            "out_rows": res.num_rows,
            "programs_new": program_count() - p0,
            "peak_query_hbm_bytes": ctx2.memory_pool.peak,
            "device_root_peak_bytes": MemoryPool.device_root().peak,
        }
        snap = M.reporter().snapshot().get("counters", {})
        for k in (M.K_AGG_HOST_OFFLOADS, M.K_JOIN_BUILD_OFFLOADS,
                  M.K_SPILL_DISK_WRITES):
            if k in snap:
                entry[k.rsplit(".", 1)[-1]] = snap[k]
        out[f"q{q}_sf10"] = entry
    return out


def _probe_device(deadline_s: float = 90.0) -> bool:
    """One tiny computation with a deadline. The remote-tunnel device
    intermittently degrades to where even a cached scalar fetch hangs
    for minutes (observed: jnp.sum(arange(8192)).item() > 3 min while
    jax.devices() answered instantly); detect that in bounded time so
    the budget isn't burned producing an empty artifact."""
    import jax
    import jax.numpy as jnp
    box = {}

    def run():
        try:
            box["v"] = int(jax.device_get(jnp.sum(jnp.arange(8192))))
        except Exception:
            pass

    t = threading.Thread(target=run, daemon=True)
    t.start()
    t.join(timeout=deadline_s)
    return box.get("v") == 8191 * 8192 // 2


def main():
    threading.Thread(target=_watchdog, daemon=True).start()
    _install_sigterm_summary()
    import jax
    jax.config.update("jax_enable_x64", True)

    if not _probe_device():
        _STATE["detail"]["device_unresponsive"] = {
            "probe": "sum(arange(8192)) hung >90s",
            "platform": jax.default_backend(),
        }
        _emit_summary(partial=True, reason="aborted_device_probe")
        os._exit(0)  # skip teardown: the probe thread is hung in C

    from velox_tpu.connectors.tpch import register_tpch
    from velox_tpu.testing.plan_builder import PlanBuilder
    from velox_tpu.tpch import tpch_plan

    sf = 1.0
    conn = register_tpch(sf, rows_per_split=1 << 21)
    li_rows = conn.gen.num_rows("lineitem")

    # host tables for the CPU baseline (shared, generated once; only the
    # columns the baselines read)
    host = {t: host_frame(conn, t) for t in COLS_NEEDED}
    li, od, cu = host["lineitem"], host["orders"], host["customer"]

    fns = make_cpu_fns(li, od, cu)
    cpu_q6, cpu_q1, cpu_q3 = fns["q6"], fns["q1"], fns["q3"]
    cpu_q18, cpu_orderby = fns["q18"], fns["orderby"]

    def orderby_plan():
        return (PlanBuilder()
                .table_scan("lineitem", ["l_shipdate", "l_orderkey"],
                            connector_id="tpch")
                .order_by(["l_shipdate", "l_orderkey"])
                .limit(1000)
                .plan())

    # cheapest-cold first so a cache-invalidated run still reports the
    # scan/agg/sort configs before the minutes-long multi-join compiles
    configs = [
        ("q6_sf1", lambda: tpch_plan(6), cpu_q6),
        ("q1_sf1", lambda: tpch_plan(1), cpu_q1),
        ("orderby_sf1", orderby_plan, cpu_orderby),
        ("q18_sf1", lambda: tpch_plan(18), cpu_q18),
        ("q3_sf1", lambda: tpch_plan(3), cpu_q3),
    ]

    detail = _STATE["detail"]
    ratios = _STATE["ratios"]
    rates = _STATE["rates"]
    for name, plan_fn, cpu_fn in configs:
        try:
            cold, warm, out, task = engine_wall(plan_fn)
            cpu_dt, _ = cpu_wall(cpu_fn)
            detail[name] = {
                "engine_cold_s": round(cold, 3),
                "engine_warm_s": round(warm, 3),
                "cpu_baseline_s": round(cpu_dt, 3),
                "lineitem_rows_per_s_warm": li_rows / warm,
                "vs_baseline": cpu_dt / warm,
                "out_rows": out.num_rows,
                "hbm_bytes_model": task.total_hbm_bytes(),
            }
            ratios.append(cpu_dt / warm)
            rates.append(li_rows / warm)
        except Exception as e:  # keep the bench line even on failures
            detail[name] = {"error": f"{type(e).__name__}: {e}"}

    # roofline denominator AFTER the configs (a fresh compile of the
    # probe can hang for minutes when the AOT service is degraded; the
    # configs' numbers must never wait on it)
    hbm_bw = measure_hbm_bw_deadline(min(90.0, _remaining() - 240))
    if hbm_bw:
        for name, entry in detail.items():
            hbm_bytes = entry.get("hbm_bytes_model") \
                if isinstance(entry, dict) else None
            if hbm_bytes:
                warm = entry["engine_warm_s"]
                entry.update({
                    "hbm_bw_gbps": round(hbm_bw / 1e9, 1),
                    "pct_of_roofline": round(
                        100.0 * (hbm_bytes / hbm_bw) / warm, 2),
                })

    # ---- SF10 stage (VERDICT r4 #5): 10x the rows under a CAPPED query
    # HBM pool so arbitration/offload runs inside the benchmark. Only when
    # enough budget remains: SF10 host data gen + pandas baselines + the
    # three engine runs need ~3 minutes warm.
    if _remaining() > 210:
        try:
            detail["sf10"] = _run_sf10()
        except Exception as e:
            detail["sf10"] = {"error": f"{type(e).__name__}: {e}"}
    else:
        detail["sf10"] = {"skipped": f"budget ({_remaining():.0f}s left)"}

    # kernel-level micro numbers ride the detail artifact so per-round
    # progress on insert/probe/sort throughput is visible (VERDICT w#12)
    if _remaining() > 60:
        try:
            from benchmarks import run_micro
            detail["micro_Mrows_per_s"] = {
                k: round(v, 1) for k, v in run_micro(20).items()}
        except Exception as e:
            detail["micro_Mrows_per_s"] = {"error": str(e)}

    _emit_summary()


if __name__ == "__main__":
    main()
