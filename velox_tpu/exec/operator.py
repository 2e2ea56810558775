"""Operator SPI + stateless operators.

Role parity: ``velox/exec/Operator.h:289-505`` — the
needsInput/addInput/getOutput/noMoreInput/isFinished contract — and the
simple operators (FilterProject exec/FilterProject.h:24, Values, Limit).

TPU-first: an operator's per-batch work is one jit-compiled program (traced
lazily on the first batch); the host-side driver loop only moves batch
handles, so per-batch dispatch cost is amortized over capacity-sized
batches (the reference instead walks operators per 1-10K-row vector).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp

from velox_tpu import types as T
from velox_tpu.core import plan as P
from velox_tpu.expression.eval import ExprSet, value_from_column
from velox_tpu.vector.device import DeviceBatch, DeviceColumn


@dataclass
class OperatorStats:
    """Parity: velox/exec/OperatorStats (TaskStats.h)."""
    operator_type: str = ""
    plan_node_id: str = ""
    input_batches: int = 0
    input_rows: int = 0
    output_batches: int = 0
    output_rows: int = 0
    # static batch footprints (DeviceBatch.nbytes) — the roofline
    # accounting unit: every operator reads its input bytes and writes
    # its output bytes through HBM at least once
    input_bytes: int = 0
    output_bytes: int = 0
    add_input_wall_ns: int = 0
    get_output_wall_ns: int = 0
    finish_wall_ns: int = 0
    # wall of an upstream build stage feeding this operator (join
    # builds run outside the operator SPI, in Task._run_hash_join)
    build_wall_ns: int = 0

    def as_dict(self):
        return dict(self.__dict__)


class Operator:
    """Push/pull operator contract (parity exec/Operator.h:398-434)."""

    def __init__(self, node: P.PlanNode):
        self.node = node
        self.stats = OperatorStats(operator_type=type(self).__name__,
                                   plan_node_id=node.id if node else "")
        self._no_more_input = False

    # SPI ------------------------------------------------------------------
    def needs_input(self) -> bool:
        return not self._no_more_input

    def add_input(self, batch: DeviceBatch) -> None:
        raise NotImplementedError

    def get_output(self) -> Optional[DeviceBatch]:
        raise NotImplementedError

    def no_more_input(self) -> None:
        self._no_more_input = True

    def is_finished(self) -> bool:
        raise NotImplementedError

    def close(self) -> None:
        """Release operator resources (threads, buffers). Called by the
        Task at the end of run(), including on error paths. Parity:
        Operator::close (exec/Operator.h)."""

    def device_state(self):
        """Device arrays (a pytree) holding this operator's buffered
        state, for ``debug_sync_operators``: the driver blocks on these
        after add_input/no_more_input so the operator's dispatched work
        is forced inside ITS OWN timed section. Stateless operators
        return () — their work is forced via the output batch."""
        return ()


class SourceOperator(Operator):
    """Source operators take no input."""

    def needs_input(self) -> bool:
        return False

    def add_input(self, batch):
        raise RuntimeError(f"{type(self).__name__} takes no input")


# ---------------------------------------------------------------------------

class ValuesOperator(SourceOperator):
    """Parity: velox/exec/Values.h:21.

    Repeat runs over the SAME host table skip the host pack + device
    upload: measured on a 2M-row raw-string table, ingest was 5.4 s of
    an 8.4 s warm query (byte-matrix packing + ~40 MB/s tunnel upload)
    while the aggregation itself took 0.77 s. The cache plays the role
    the connector scan cache (connectors/cache.py) plays for TableScan.
    """

    # (id(table), encoding) -> (table_ref, DeviceBatch); small LRU — the
    # identity key is only trusted while the table object is alive, so
    # entries hold a strong reference and the cache is size-bounded.
    # Lock: ValuesOperators run concurrently under multi-driver local
    # pipelines and the distributed task.
    from collections import OrderedDict as _OD
    _INGEST_CACHE: "OrderedDict" = _OD()
    _INGEST_CACHE_MAX = 8
    import threading as _tm
    _INGEST_LOCK = _tm.Lock()

    def __init__(self, node: P.ValuesNode,
                 dictionaries: Optional[Dict] = None):
        super().__init__(node)
        self._tables = list(node.tables)
        self._i = 0
        self._dictionaries = dictionaries or {}

    def get_output(self):
        from velox_tpu.vector.device import from_arrow
        if self._i >= len(self._tables):
            return None
        t = self._tables[self._i]
        self._i += 1
        if isinstance(t, DeviceBatch):
            return t
        enc = getattr(self.node, "string_encoding", "dict")
        cacheable = not self._dictionaries
        enc_key = (tuple(sorted(enc.items())) if isinstance(enc, dict)
                   else enc)
        key = (id(t), enc_key)
        if cacheable:
            with self._INGEST_LOCK:
                hit = self._INGEST_CACHE.get(key)
                if hit is not None and hit[0] is t:
                    self._INGEST_CACHE.move_to_end(key)
                    from velox_tpu.common import metrics as M
                    M.record_counter(M.K_VALUES_INGEST_HITS)
                    return hit[1]
        batch = from_arrow(t, dictionaries=self._dictionaries,
                           string_encoding=enc)
        if cacheable:
            with self._INGEST_LOCK:
                cache = self._INGEST_CACHE
                while len(cache) >= self._INGEST_CACHE_MAX:
                    cache.popitem(last=False)
                cache[key] = (t, batch)
        return batch

    def is_finished(self):
        return self._i >= len(self._tables)


class ArrowStreamOperator(SourceOperator):
    """Streaming source: pulls record batches from a pyarrow
    RecordBatchReader (or any iterator of batches/tables) and stages
    them on device. Parity: velox/exec/ArrowStream.h:23."""

    def __init__(self, node):
        super().__init__(node)
        r = node.reader
        self._it = iter(r() if callable(r) else r)
        self._done = False

    def get_output(self):
        from velox_tpu.vector.device import from_arrow
        if self._done:
            return None
        try:
            t = next(self._it)
        except StopIteration:
            self._done = True
            return None
        if isinstance(t, DeviceBatch):
            return t
        import pyarrow as pa
        if isinstance(t, pa.RecordBatch):
            t = pa.table(t)
        return from_arrow(t)

    def is_finished(self):
        return self._done


class TableScanOperator(SourceOperator):
    """Parity: velox/exec/TableScan.cpp:75 — pulls splits from the task,
    hands them to a connector DataSource, yields device batches. The
    pushed-down filter (node.filter) is fused into the first downstream
    superstep by the planner.

    With ``prefetch > 0`` a background thread preloads the next splits
    (host decode/generation + device upload) into a BOUNDED queue while
    the device pipeline runs — the split-preload executor
    (parity: velox's split prefetch on the I/O executor,
    connectors/hive/HiveDataSource prefetch) and the bounded local
    exchange queue in one. One producer thread: connector sources need
    no internal locking."""

    _DONE = object()

    def __init__(self, node: P.TableScanNode, data_source, splits,
                 prefetch: int = 2):
        super().__init__(node)
        self._source = data_source
        self._splits = list(splits)
        self._i = 0
        self._queue = None
        self._error = None
        self._exhausted = False
        if prefetch > 0 and len(self._splits) > 1:
            import queue as _qm
            import threading as _tm
            self._queue = _qm.Queue(maxsize=prefetch)
            self._stop = _tm.Event()
            self._thread = _tm.Thread(target=self._produce, daemon=True)
            self._thread.start()

    def _put(self, item) -> bool:
        """Bounded put that gives up when the consumer abandoned the scan
        (LIMIT pushdown / downstream error): without the stop check the
        producer thread blocks forever on a full queue and leaks itself
        plus `prefetch` device batches per abandoned scan."""
        import queue as _qm
        while not self._stop.is_set():
            try:
                self._queue.put(item, timeout=0.1)
                return True
            except _qm.Full:
                continue
        return False

    def _produce(self):
        try:
            for split in self._splits:
                from velox_tpu.common import metrics as M
                from velox_tpu.common import testvalue as TV
                TV.adjust("TableScan::prefetch", split)
                if self._stop.is_set():
                    return
                while True:
                    out = self._source.next(split)
                    if out is None:
                        break
                    if not self._put(out):
                        return
                # counted only when fully drained — matches the serial
                # path, so the metric is prefetch-config-independent
                M.record_counter(M.K_SCAN_SPLITS)
        except BaseException as e:  # surfaced on the consumer side
            self._error = e
        finally:
            self._put(self._DONE)

    def close(self):
        if self._queue is not None and not self._exhausted:
            self._stop.set()
            # drain so a producer blocked in put() observes the stop
            try:
                while True:
                    self._queue.get_nowait()
            except Exception:
                pass
            # JOIN the producer: a thread that outlives its Task keeps
            # dispatching JAX concurrently with the next query's main
            # thread — observed as an XLA:CPU segfault in the test
            # suite. The producer exits at its next queue/stop check;
            # the bounded wait covers one in-flight split decode.
            t = getattr(self, "_thread", None)
            if t is not None and t.is_alive():
                while t.is_alive():
                    t.join(timeout=0.25)
                    try:
                        while True:
                            self._queue.get_nowait()
                    except Exception:
                        pass

    def get_output(self):
        if self._queue is not None:
            if self._exhausted:
                return None
            item = self._queue.get()
            if item is self._DONE:
                self._exhausted = True
                if self._error is not None:
                    raise self._error
                return None
            return item
        while self._i < len(self._splits):
            split = self._splits[self._i]
            out = self._source.next(split)
            if out is None:
                from velox_tpu.common import metrics as M
                M.record_counter(M.K_SCAN_SPLITS)
                self._i += 1
                continue
            return out
        return None

    def is_finished(self):
        if self._queue is not None:
            return self._exhausted
        return self._i >= len(self._splits)


class FilterProjectOperator(Operator):
    """Fused filter + project. Parity: velox/exec/FilterProject.h:24.

    One jitted program evaluates the filter (ANDed into the mask) and all
    projections; XLA fuses everything into a single pass over the batch.
    """

    @classmethod
    def from_fused(cls, node: P.PlanNode, fused_fn,
                   prejitted: bool = False) -> "FilterProjectOperator":
        """Wrap a pre-built pure batch function (exec/fuse.py chains)."""
        op = cls.__new__(cls)
        Operator.__init__(op, node)
        op._out = None
        op._fn = fused_fn if prejitted else jax.jit(fused_fn)
        return op

    def __init__(self, node: P.PlanNode, filter_expr, names, projections):
        super().__init__(node)
        self._filter = filter_expr
        self._names = list(names)
        self._projections = list(projections)
        self._out: Optional[DeviceBatch] = None

        def _run(batch: DeviceBatch) -> DeviceBatch:
            mask = batch.mask
            err = jnp.zeros((batch.capacity,), bool)
            if self._filter is not None:
                sink = []
                f = ExprSet([self._filter], None).eval_batch(
                    batch, err_sink=sink)[0]
                if sink[0] is not None:
                    err = err | (sink[0] & mask)
                passed = f.data.astype(bool)
                if f.validity is not None:
                    passed = passed & f.validity
                mask = mask & (jnp.broadcast_to(passed, (batch.capacity,))
                               if passed.ndim == 0 else passed)
            sink = []
            vals = ExprSet(self._projections, None).eval_batch(
                batch, err_sink=sink)
            if sink[0] is not None:
                err = err | (sink[0] & mask)
            cols = {
                name: v.to_column(batch.capacity)
                for name, v in zip(self._names, vals)
            }
            prior = batch.errors if batch.errors is not None else 0
            return DeviceBatch(cols, mask,
                               errors=prior + jnp.sum(err,
                                                      dtype=jnp.int32))

        # cross-task cache (the traced body reads only ctor args, which
        # the distributed layer may vary independently of the node)
        from velox_tpu.exec.jit_cache import cached_jit
        self._fn = cached_jit(
            ("filter_project", node, filter_expr, tuple(self._names),
             tuple(self._projections)),
            lambda: jax.jit(_run))

    def add_input(self, batch):
        self._out = self._fn(batch)

    def get_output(self):
        out, self._out = self._out, None
        return out

    def needs_input(self):
        return not self._no_more_input and self._out is None

    def is_finished(self):
        return self._no_more_input and self._out is None


class LimitOperator(Operator):
    """Parity: velox/exec/Limit.h:20. The running row count stays on device
    (no host sync per batch)."""

    def __init__(self, node: P.LimitNode):
        super().__init__(node)
        self._offset = node.offset
        self._count = node.count
        self._seen = None  # device scalar
        self._out = None
        self._done = False

        def _run(batch: DeviceBatch, seen):
            prefix = jnp.cumsum(batch.mask.astype(jnp.int64))
            pos = seen + prefix - 1  # 0-based global position of each row
            keep = batch.mask & (pos >= self._offset) & \
                (pos < self._offset + self._count)
            new_seen = seen + prefix[-1]
            return batch.with_mask(keep), new_seen

        from velox_tpu.exec.jit_cache import cached_jit
        self._fn = cached_jit(("limit", node), lambda: jax.jit(_run))

    def add_input(self, batch):
        if self._seen is None:
            self._seen = jnp.zeros((), dtype=jnp.int64)
        self._out, self._seen = self._fn(batch, self._seen)

    def get_output(self):
        out, self._out = self._out, None
        return out

    def needs_input(self):
        return not self._no_more_input and self._out is None and not self._done

    def is_finished(self):
        return (self._no_more_input or self._done) and self._out is None
