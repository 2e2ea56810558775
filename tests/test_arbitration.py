"""Memory arbitration: crossing a pool cap triggers reclaim — scan-cache
eviction first, then force-offload of operator state to host RAM — with
NO per-operator manual budgets. Parity:
common/memory/MemoryArbitrator.h:46 + exec/MemoryReclaimer.h."""

import numpy as np
import pandas as pd
import pyarrow as pa

from velox_tpu.core.config import QueryConfig as QC
from velox_tpu.exec.memory import (MemoryArbitrator, MemoryPool,
                                   OffloadBuffer)
from velox_tpu.exec.task import QueryCtx, Task
from velox_tpu.testing.plan_builder import PlanBuilder


class _FakeReclaimer:
    def __init__(self, avail):
        self.avail = avail
        self.calls = []

    def reclaim(self, needed):
        self.calls.append(needed)
        freed = min(self.avail, needed)
        self.avail -= freed
        return freed


def test_arbitrator_priority_order():
    arb = MemoryArbitrator()
    cache = _FakeReclaimer(1000)
    op = _FakeReclaimer(10_000)
    arb.register(op, MemoryArbitrator.PRI_OPERATOR)
    arb.register(cache, MemoryArbitrator.PRI_CACHE)
    freed = arb.reclaim(600)
    assert freed == 600
    assert cache.calls == [600] and op.calls == []  # cache drained first
    freed = arb.reclaim(2000)
    assert freed == 2000
    assert cache.calls == [600, 2000]       # asked first, frees 400
    assert op.calls == [1600]               # remainder from operator


def test_pool_cap_triggers_cache_eviction():
    """reserve_or_reclaim over a capped pool evicts the scan cache
    (PRI_CACHE) and then succeeds."""
    from velox_tpu.connectors.cache import DataCache
    from velox_tpu.vector.device import from_arrow
    cache = DataCache.instance()
    cache.clear()
    root = MemoryPool.device_root()
    base = root.used
    batch = from_arrow(pa.table(
        {"x": np.arange(4096, dtype="int64")}), capacity=4096)
    cache.put(("k1",), batch)
    assert cache.used > 0
    assert root.used > base
    # cap the root just above current use; a big reservation must evict
    pool = MemoryPool("q", parent=root)
    try:
        root.cap_bytes = root.used + 1000
        assert not pool.reserve(50_000)
        assert pool.reserve_or_reclaim(cache.used + base + 900)
        assert cache.used == 0  # evicted by arbitration
    finally:
        root.cap_bytes = None
        pool.release(pool.used)
        cache.clear()


def test_offload_buffer_reclaim_moves_batches_to_host():
    from velox_tpu.vector.device import from_arrow
    pool = MemoryPool("q", cap_bytes=None)
    buf = OffloadBuffer(None, pool=pool)
    batches = [from_arrow(pa.table(
        {"x": np.arange(1024, dtype="int64") + i}), capacity=1024)
        for i in range(4)]
    for b in batches:
        buf.add(b)
    assert len(buf._device) == 4 and pool.used > 0
    freed = buf.reclaim(1)           # at least one batch forced out
    assert freed > 0 and len(buf._host) >= 1
    restored = buf.restore_all()
    assert len(restored) == 4 and pool.used == 0
    # oldest-first offload preserves nothing about order guarantees here,
    # but all rows must survive
    got = sorted(int(r.columns["x"].data[0]) for r in restored)
    assert got == [0, 1, 2, 3]


def test_capped_query_completes_without_manual_budgets():
    """An OrderBy whose buffered input exceeds the query HBM cap
    completes correctly: arbitration force-offloads sort buffers."""
    from velox_tpu.common import metrics as M
    rng = np.random.RandomState(7)
    dfs = [pd.DataFrame({
        "k": rng.randint(0, 1 << 30, 20_000).astype("int64"),
        "v": rng.randint(0, 100, 20_000).astype("int64")})
        for _ in range(4)]
    b = PlanBuilder()
    b.values([pa.table(d) for d in dfs])
    b.order_by(["k"])
    # cap far below the ~2.5MB of buffered input; no per-op budgets set
    ctx = QueryCtx({QC.QUERY_HBM_CAP_BYTES: 300_000})
    before = M.reporter().snapshot()["counters"].get(
        M.K_SORT_OFFLOADS, 0)
    out = Task(b.plan(), ctx).run().to_pandas()
    after = M.reporter().snapshot()["counters"].get(
        M.K_SORT_OFFLOADS, 0)
    exp = pd.concat(dfs).sort_values(
        ["k"], kind="stable").reset_index(drop=True)
    np.testing.assert_array_equal(out.k, exp.k)
    assert after > before          # offload actually triggered
    assert ctx.memory_pool.used == 0  # everything released at the end
