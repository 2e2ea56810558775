"""Memory accounting + host-RAM offload (the spill analogue).

Role parity: ``velox/common/memory`` (MemoryPool usage tracking) and the
spill framework (``velox/exec/Spiller.h``, SpillConfig). Per SURVEY.md §7.1,
disk spill maps to **host-RAM offload**: operator state (aggregation
partial runs, join build batches) is device_get into pinned numpy buffers
and re-uploaded for the merge phase — state survives HBM pressure the way
the reference's spilled runs survive memory arbitration.
"""

from __future__ import annotations

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
    """A device batch offloaded to host RAM (numpy mirrors + metadata)."""

    def __init__(self, batch: DeviceBatch):
        import jax
        self.columns = {}
        for name, col in batch.columns.items():
            data = np.asarray(jax.device_get(col.data))
            validity = (np.asarray(jax.device_get(col.validity))
                        if col.validity is not None else None)
            self.columns[name] = (data, validity, col.dtype, col.dictionary)
        self.mask = np.asarray(jax.device_get(batch.mask))
        self.nbytes = batch_nbytes(batch)

    def restore(self) -> DeviceBatch:
        import jax.numpy as jnp
        cols = {
            name: DeviceColumn(
                jnp.asarray(data),
                jnp.asarray(validity) if validity is not None else None,
                dtype, dictionary)
            for name, (data, validity, dtype, dictionary)
            in self.columns.items()
        }
        return DeviceBatch(cols, __import__("jax").numpy.asarray(self.mask))


class MemoryPool:
    """Hierarchical usage tracking with a soft cap.
    Parity: common/memory/MemoryPool.h (tracking; arbitration is the
    operators' offload hooks)."""

    def __init__(self, name: str, cap_bytes: Optional[int] = None,
                 parent: Optional["MemoryPool"] = None):
        self.name = name
        self.cap_bytes = cap_bytes
        self.parent = parent
        self.used = 0
        self.peak = 0

    def reserve(self, n: int) -> bool:
        """Account n bytes; False if this would exceed the cap (caller
        should offload)."""
        if self.cap_bytes is not None and self.used + n > self.cap_bytes:
            return False
        self.used += n
        self.peak = max(self.peak, self.used)
        if self.parent is not None:
            self.parent.reserve(n)
        return True

    def release(self, n: int):
        self.used = max(0, self.used - n)
        if self.parent is not None:
            self.parent.release(n)

    def stats(self) -> Dict:
        return {"name": self.name, "used": self.used, "peak": self.peak,
                "cap": self.cap_bytes}


class OffloadBuffer:
    """Byte-budgeted batch buffer: batches stay in HBM until the budget is
    exceeded, then spill to host RAM (HostBatch) — the spill framework
    analogue for join builds and sort buffers (velox/exec/Spiller.h:29-92
    kHashJoinBuild / kOrderBy spiller types)."""

    def __init__(self, budget_bytes: Optional[int], metric_key=None):
        self.budget = budget_bytes
        self.used = 0
        self._device: List[DeviceBatch] = []
        self._host: List[HostBatch] = []
        self._metric_key = metric_key

    def add(self, batch: DeviceBatch) -> None:
        n = batch_nbytes(batch)
        if self.budget is not None and self.used + n > self.budget:
            if self._metric_key is not None:
                from velox_tpu.common import metrics as M
                M.record_counter(self._metric_key)
            self._host.append(HostBatch(batch))
            return
        self.used += n
        self._device.append(batch)

    def __len__(self):
        return len(self._device) + len(self._host)

    def restore_all(self) -> List[DeviceBatch]:
        """All buffered batches back on device (spill merge phase)."""
        out = list(self._device) + [h.restore() for h in self._host]
        self._device, self._host = [], []
        self.used = 0
        return out
