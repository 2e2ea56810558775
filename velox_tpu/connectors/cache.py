"""Device-resident scan cache.

Role parity: ``velox/common/caching/AsyncDataCache.h:698`` — the reference
caches decoded file chunks in RAM so repeated scans skip IO. Here the cached
unit is the *staged device batch* of one split (generation/decode + host->
device upload are the expensive ingest steps on TPU), keyed by
(connector, table, columns, split, capacity), with a byte budget and LRU
eviction.
"""

from __future__ import annotations

import threading
from collections import OrderedDict
from typing import Optional, Tuple

from velox_tpu.exec.memory import batch_nbytes
from velox_tpu.vector.device import DeviceBatch

DEFAULT_BUDGET = 8 << 30  # 8 GiB of HBM for cached scans


class DataCache:
    """LRU cache of staged device batches with a byte budget."""

    _instance: Optional["DataCache"] = None

    def __init__(self, budget_bytes: int = DEFAULT_BUDGET):
        from velox_tpu.exec.memory import MemoryArbitrator, MemoryPool
        self.budget = budget_bytes
        self.used = 0
        self.hits = 0
        self.misses = 0
        self._entries: "OrderedDict[Tuple, Tuple[DeviceBatch, int]]" = \
            OrderedDict()
        self._lock = threading.Lock()
        # cached scans are re-loadable: first in line for arbitration
        # (parity: AsyncDataCache shrink under memory pressure,
        # common/caching/AsyncDataCache.h:698)
        self._pool = MemoryPool.device_root()
        MemoryArbitrator.instance().register(
            self, MemoryArbitrator.PRI_CACHE)

    @classmethod
    def instance(cls) -> "DataCache":
        if cls._instance is None:
            cls._instance = cls()
        return cls._instance

    def get(self, key) -> Optional[DeviceBatch]:
        with self._lock:
            hit = self._entries.get(key)
            if hit is None:
                self.misses += 1
                return None
            self._entries.move_to_end(key)
            self.hits += 1
            return hit[0]

    def put(self, key, batch: DeviceBatch) -> None:
        n = batch_nbytes(batch)
        if n > self.budget:
            return
        with self._lock:
            old = self._entries.pop(key, None)
            if old is not None:
                self._drop_bytes(old[1])
            while self.used + n > self.budget and self._entries:
                _, (_, sz) = self._entries.popitem(last=False)
                self._drop_bytes(sz)
            if not self._pool.reserve(n):
                # HBM root capped: don't cache rather than oust operator
                # state (the arbitrator can't help — WE are its first
                # eviction target)
                return
            self._entries[key] = (batch, n)
            self.used += n

    def _drop_bytes(self, n: int):
        self.used -= n
        self._pool.release(n)

    def reclaim(self, needed: int) -> int:
        """Arbitrator hook: evict LRU entries until `needed` freed."""
        with self._lock:
            freed = 0
            while self._entries and freed < needed:
                _, (_, sz) = self._entries.popitem(last=False)
                self._drop_bytes(sz)
                freed += sz
            return freed

    def clear(self):
        with self._lock:
            self._pool.release(self.used)
            self._entries.clear()
            self.used = 0

    def stats(self):
        return {"used": self.used, "budget": self.budget,
                "entries": len(self._entries), "hits": self.hits,
                "misses": self.misses}
