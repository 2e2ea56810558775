"""SSD tier of the scan cache: HBM evictions demote to disk, misses
promote back, and the index checkpoint survives restarts.
Parity: common/caching/SsdCache.h:27 + SsdFile checkpointing."""

import numpy as np
import pyarrow as pa

from velox_tpu.connectors.cache import DataCache, SsdTier
from velox_tpu.vector.device import from_arrow, to_arrow


def _batch(seed, n=2048):
    rng = np.random.RandomState(seed)
    return from_arrow(pa.table({
        "x": rng.randint(0, 1 << 40, n).astype("int64"),
        "y": rng.rand(n)}), capacity=n)


def test_eviction_demotes_and_get_promotes(tmp_path):
    cache = DataCache(budget_bytes=100_000)  # ~3 batches of 36KB
    ssd = cache.enable_ssd(str(tmp_path / "ssd"))
    batches = {i: _batch(i) for i in range(6)}
    for i, b in batches.items():
        cache.put(("k", i), b)
    # early entries were evicted from HBM into the SSD tier
    assert ssd.stats()["entries"] >= 3
    for i in range(6):
        got = cache.get(("k", i))
        assert got is not None, i
        np.testing.assert_array_equal(
            np.asarray(to_arrow(got).column("x")),
            np.asarray(to_arrow(batches[i]).column("x")))
    assert ssd.hits >= 3
    cache.clear()


def test_checkpoint_survives_restart(tmp_path):
    d = str(tmp_path / "ssd2")
    tier = SsdTier(d, budget_bytes=10 << 20)
    b = _batch(42)
    tier.put(("persist", 1), b)
    # a NEW tier instance (fresh process analogue) reads the checkpoint
    tier2 = SsdTier(d, budget_bytes=10 << 20)
    assert tier2.stats()["entries"] == 1
    got = tier2.get(("persist", 1))
    assert got is not None
    np.testing.assert_array_equal(
        np.asarray(to_arrow(got).column("x")),
        np.asarray(to_arrow(b).column("x")))
    assert tier2.get(("persist", 2)) is None


def test_ssd_budget_evicts_oldest(tmp_path):
    tier = SsdTier(str(tmp_path / "ssd3"), budget_bytes=120_000)
    for i in range(8):
        tier.put(("b", i), _batch(i))
    st = tier.stats()
    assert st["used"] <= 120_000
    assert tier.get(("b", 7)) is not None  # newest survives
    assert tier.get(("b", 0)) is None      # oldest evicted
