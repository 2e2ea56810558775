"""Memory accounting + host-RAM offload (the spill analogue).

Role parity: ``velox/common/memory`` (MemoryPool usage tracking) and the
spill framework (``velox/exec/Spiller.h``, SpillConfig). Per SURVEY.md §7.1,
disk spill maps to **host-RAM offload**: operator state (aggregation
partial runs, join build batches) is device_get into pinned numpy buffers
and re-uploaded for the merge phase — state survives HBM pressure the way
the reference's spilled runs survive memory arbitration. Round 4 adds the
DISK TIER below host RAM (DiskBatch): when a buffer's host bytes exceed
their budget, the oldest host batches round-trip through spill files, so
state larger than host RAM completes instead of dying.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

from velox_tpu.vector.device import DeviceBatch, DeviceColumn


def batch_nbytes(batch: DeviceBatch) -> int:
    """Device bytes held by a batch (data + validity + mask)."""
    total = batch.mask.size * batch.mask.dtype.itemsize
    for col in batch.columns.values():
        total += col.data.size * col.data.dtype.itemsize
        if col.validity is not None:
            total += col.validity.size * col.validity.dtype.itemsize
    return int(total)


class HostBatch:
    """A device batch offloaded to host RAM: the full batch PYTREE as
    numpy leaves + treedef (preserves row-aligned children — long-
    decimal hi limbs, raw-string length lanes, ROW fields — and complex
    starts; the earlier columns-only mirror silently dropped them)."""

    def __init__(self, batch: DeviceBatch):
        import jax
        leaves, self.treedef = jax.tree_util.tree_flatten(batch)
        self.leaves = [np.asarray(x) for x in jax.device_get(leaves)]
        self.nbytes = batch_nbytes(batch)

    def restore(self) -> DeviceBatch:
        import jax
        import jax.numpy as jnp
        return jax.tree_util.tree_unflatten(
            self.treedef, [jnp.asarray(x) for x in self.leaves])


class DiskBatch:
    """A host batch spilled to a file: numpy leaves in one .npz plus the
    pickled treedef — the DISK TIER below host-RAM offload (parity:
    velox Spiller writing spill files, exec/Spiller.h:29-92; builds or
    sort state larger than host RAM survive by round-tripping here)."""

    def __init__(self, host: HostBatch, spill_dir: str):
        import pickle
        import uuid
        os.makedirs(spill_dir, exist_ok=True)
        self.path = os.path.join(spill_dir, f"spill-{uuid.uuid4().hex}")
        np.savez(self.path + ".npz",
                 **{f"l{i}": x for i, x in enumerate(host.leaves)})
        with open(self.path + ".tree", "wb") as f:
            pickle.dump(host.treedef, f)
        self.n_leaves = len(host.leaves)
        self.nbytes = host.nbytes
        from velox_tpu.common import metrics as M
        M.record_counter(M.K_SPILL_DISK_WRITES)
        M.record_counter(M.K_SPILL_DISK_WRITE_BYTES, host.nbytes)

    def restore(self) -> DeviceBatch:
        import pickle

        import jax
        import jax.numpy as jnp
        from velox_tpu.common import metrics as M
        M.record_counter(M.K_SPILL_DISK_READ_BYTES, self.nbytes)
        with np.load(self.path + ".npz") as z:
            leaves = [jnp.asarray(z[f"l{i}"])
                      for i in range(self.n_leaves)]
        with open(self.path + ".tree", "rb") as f:
            treedef = pickle.load(f)
        self.delete()
        return jax.tree_util.tree_unflatten(treedef, leaves)

    def delete(self):
        for suffix in (".npz", ".tree"):
            try:
                os.remove(self.path + suffix)
            except OSError:
                pass


class MemoryPool:
    """Hierarchical usage tracking with a soft cap.
    Parity: common/memory/MemoryPool.h (tracking) — reclaim triggering
    lives in MemoryArbitrator below."""

    _device_root: Optional["MemoryPool"] = None

    def __init__(self, name: str, cap_bytes: Optional[int] = None,
                 parent: Optional["MemoryPool"] = None):
        self.name = name
        self.cap_bytes = cap_bytes
        self.parent = parent
        self.used = 0
        self.peak = 0

    @classmethod
    def device_root(cls) -> "MemoryPool":
        """Process-wide root modelling total HBM consumption (scan cache
        + operator state). Parity: the MemoryManager root pool
        (common/memory/Memory.h:175). Cap set via set_device_cap()."""
        if cls._device_root is None:
            cls._device_root = cls("device-root")
        return cls._device_root

    @classmethod
    def set_device_cap(cls, cap_bytes: Optional[int]):
        cls.device_root().cap_bytes = cap_bytes

    def _over_cap(self, n: int) -> bool:
        p: Optional[MemoryPool] = self
        while p is not None:
            if p.cap_bytes is not None and p.used + n > p.cap_bytes:
                return True
            p = p.parent
        return False

    def reserve(self, n: int) -> bool:
        """Account n bytes; False if this (or an ancestor cap) would be
        exceeded (caller should offload)."""
        if self._over_cap(n):
            return False
        p: Optional[MemoryPool] = self
        while p is not None:
            p.used += n
            p.peak = max(p.peak, p.used)
            p = p.parent
        return True

    def reserve_or_reclaim(self, n: int) -> bool:
        """reserve(); on cap overflow ask the arbitrator to free memory
        (evict scan cache, force-offload other operators' buffers) and
        retry ONCE. Parity: MemoryArbitrator::growCapacity triggering
        reclaim (common/memory/MemoryArbitrator.h:46,
        SharedArbitrator.h:53)."""
        if self.reserve(n):
            return True
        MemoryArbitrator.instance().reclaim(n)
        return self.reserve(n)

    def release(self, n: int):
        p: Optional[MemoryPool] = self
        while p is not None:
            p.used = max(0, p.used - n)
            p = p.parent
        return None

    def stats(self) -> Dict:
        return {"name": self.name, "used": self.used, "peak": self.peak,
                "cap": self.cap_bytes}


class MemoryArbitrator:
    """Process-wide reclaim coordinator. Reclaimers register with a
    priority (lower runs first: scan cache eviction before operator
    state offload); when any pool's reserve crosses a cap, reclaim(n)
    walks them until n bytes are freed. Parity:
    common/memory/MemoryArbitrator.h:46 + exec/MemoryReclaimer.h — the
    spill-triggering half of the reference's arbitration (capacity
    transfer is subsumed: pools share one HBM root)."""

    _instance: Optional["MemoryArbitrator"] = None

    # reclaimer priorities
    PRI_CACHE = 0      # re-loadable data: evict first
    PRI_OPERATOR = 10  # operator state: offload to host RAM

    def __init__(self):
        # weakrefs: an operator that dies without unregistering (task
        # error paths) must not be kept alive — with its buffered
        # batches — by the process-wide arbitrator
        self._reclaimers: List = []  # (priority, weakref to reclaimer)
        self.reclaimed_bytes = 0
        self.reclaim_calls = 0

    @classmethod
    def instance(cls) -> "MemoryArbitrator":
        if cls._instance is None:
            cls._instance = cls()
        return cls._instance

    def register(self, reclaimer, priority: int = PRI_OPERATOR):
        import weakref
        self._reclaimers.append((priority, weakref.ref(reclaimer)))

    def unregister(self, reclaimer):
        self._reclaimers = [(p, r) for p, r in self._reclaimers
                            if r() is not None and r() is not reclaimer]

    def reclaim(self, needed: int) -> int:
        """Free >= needed bytes if possible; returns bytes freed.
        Each reclaimer's .reclaim(n) returns the bytes it freed (and is
        responsible for releasing them from its pool)."""
        from velox_tpu.common import metrics as M
        self.reclaim_calls += 1
        freed = 0
        for _, ref in sorted(self._reclaimers, key=lambda t: t[0]):
            rec = ref()
            if rec is None:
                continue
            if freed >= needed:
                break
            freed += rec.reclaim(needed - freed)
        self._reclaimers = [(p, r) for p, r in self._reclaimers
                            if r() is not None]
        self.reclaimed_bytes += freed
        M.record_counter(M.K_MEM_RECLAIMS)
        M.record_counter(M.K_MEM_RECLAIMED_BYTES, freed)
        return freed


class OffloadBuffer:
    """Byte-budgeted batch buffer: batches stay in HBM until the budget is
    exceeded, then spill to host RAM (HostBatch) — the spill framework
    analogue for join builds and sort buffers (velox/exec/Spiller.h:29-92
    kHashJoinBuild / kOrderBy spiller types)."""

    def __init__(self, budget_bytes: Optional[int], metric_key=None,
                 pool: Optional[MemoryPool] = None,
                 host_budget_bytes: Optional[int] = None,
                 spill_dir: Optional[str] = None,
                 max_spill_bytes: Optional[int] = None):
        self.budget = budget_bytes
        self.used = 0
        self._device: List[DeviceBatch] = []
        self._host: List[HostBatch] = []
        self._metric_key = metric_key
        # disk tier: host bytes past host_budget_bytes round-trip
        # through spill files (parity: Spiller.h spill files)
        self.host_budget = host_budget_bytes
        self.host_used = 0
        self._disk: List[DiskBatch] = []
        self._spill_dir = spill_dir
        # velox kMaxSpillBytes: cap on disk bytes (None = unlimited)
        self.max_spill_bytes = max_spill_bytes
        self.disk_used = 0
        # arbitration: account device batches against the pool hierarchy
        # and accept force-offload requests from the arbitrator
        self._pool = pool
        if pool is not None:
            MemoryArbitrator.instance().register(
                self, MemoryArbitrator.PRI_OPERATOR)

    def _offload_metric(self):
        if self._metric_key is not None:
            from velox_tpu.common import metrics as M
            M.record_counter(self._metric_key)

    def _default_spill_dir(self) -> str:
        if self._spill_dir is None:
            import tempfile
            self._spill_dir = tempfile.mkdtemp(prefix="velox_tpu_spill_")
        return self._spill_dir

    def _to_host(self, batch: DeviceBatch):
        self._offload_metric()
        h = HostBatch(batch)
        self._host.append(h)
        self.host_used += h.nbytes
        if self.host_budget is not None:
            while self._host and self.host_used > self.host_budget:
                oldest = self._host.pop(0)
                if self.max_spill_bytes is not None and \
                        self.disk_used + oldest.nbytes \
                        > self.max_spill_bytes:
                    from velox_tpu.common.errors import VeloxRuntimeError
                    raise VeloxRuntimeError(
                        f"spill limit exceeded: {self.disk_used} + "
                        f"{oldest.nbytes} bytes > max_spill_bytes="
                        f"{self.max_spill_bytes}")
                self._disk.append(
                    DiskBatch(oldest, self._default_spill_dir()))
                self.host_used -= oldest.nbytes
                self.disk_used += oldest.nbytes

    def add(self, batch: DeviceBatch) -> None:
        n = batch_nbytes(batch)
        if self.budget is not None and self.used + n > self.budget:
            self._to_host(batch)
            return
        if (self._pool is not None
                and not self._pool.reserve_or_reclaim(n)):
            self._to_host(batch)
            return
        self.used += n
        self._device.append(batch)

    def reclaim(self, needed: int) -> int:
        """Arbitrator hook: force-offload oldest device batches to host
        RAM until `needed` bytes are freed (parity: Operator::reclaim,
        exec/Operator.h:557 → spill)."""
        freed = 0
        while self._device and freed < needed:
            batch = self._device.pop(0)
            n = batch_nbytes(batch)
            self._to_host(batch)
            self.used -= n
            if self._pool is not None:
                self._pool.release(n)
            freed += n
        return freed

    def close(self):
        if self._pool is not None:
            MemoryArbitrator.instance().unregister(self)
            self._pool.release(self.used)
            self.used = 0
        for d in self._disk:
            d.delete()
        self._disk = []

    def __len__(self):
        return len(self._device) + len(self._host) + len(self._disk)

    def restore_all(self) -> List[DeviceBatch]:
        """All buffered batches back on device (spill merge phase):
        device-resident, host-RAM, then disk-spilled (files deleted on
        restore)."""
        out = (list(self._device) + [h.restore() for h in self._host]
               + [d.restore() for d in self._disk])
        self._device, self._host, self._disk = [], [], []
        self.host_used = 0
        if self._pool is not None:
            MemoryArbitrator.instance().unregister(self)
            self._pool.release(self.used)
        self.used = 0
        return out
