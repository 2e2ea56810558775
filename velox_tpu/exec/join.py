"""Hash join: build + probe.

Role parity: ``velox/exec/HashBuild.h:38`` / ``HashProbe.h:28`` /
``HashJoinBridge.h`` — all join types over a shared build-side table.

TPU-first redesign: the build side goes into the scatter-probe device hash
table (exec/hashtable.py — the analogue of the reference's SIMD tagged
table, HashTable.h:377), keyed on the native-dtype join columns (multi-key
supported). Probes are vectorized ``lookup``s: slot -> build row index ->
gathers of build payload columns.

* **Unique-key builds** emit one output row per probe row — a single jitted
  program per batch, no host synchronization.
* **Duplicate-key builds** use a CSR expansion: build rows are radix-
  partitioned by slot (slot -> [row...] lists), and the probe is two-pass
  count+emit (parity: HashProbe::listJoinResults, HashProbe.cpp:1054):
  a counts program computes per-probe-row match counts and their prefix sum,
  the host reads the total (one sync), and a fixed-capacity emit program
  materializes output chunks — the static-shape answer to unknown join
  cardinality (SURVEY.md §7.3).
* **Right/full/right-semi** joins track matched build rows in a device flag
  array updated per probe batch; unmatched build rows are emitted after the
  last probe batch (parity: HashProbe's "right side results" phase).
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from velox_tpu import types as T
from velox_tpu.core import plan as P
from velox_tpu.exec import hashtable as H
from velox_tpu.exec.batch_utils import concat_batches
from velox_tpu.exec.operator import Operator
from velox_tpu.exec.sort import radix_sort_perm
from velox_tpu.expression.eval import (
    EvalValue, ExprSet, value_from_column,
)
from velox_tpu.vector.device import DeviceBatch, DeviceColumn


class BuiltTable(NamedTuple):
    """The HashJoinBridge payload."""
    table: H.HashTable
    batch: DeviceBatch       # build-side rows (unpermuted)
    slot_count: jnp.ndarray  # int32[S]: rows per slot
    slot_offset: jnp.ndarray  # int32[S]: CSR offset into csr_rows
    csr_rows: jnp.ndarray    # int32[cap]: build row ids grouped by slot
    num_rows: jnp.ndarray    # device scalar
    has_null_key: jnp.ndarray  # device scalar bool (null-aware anti joins)
    has_dup_keys: jnp.ndarray  # device scalar bool


def _key_values(batch: DeviceBatch, key_fields) -> List[EvalValue]:
    return [value_from_column(batch.columns[k.name]) for k in key_fields]


def _usable(batch: DeviceBatch, keys: List[EvalValue]):
    """Active rows with fully non-null keys (SQL join null semantics)."""
    ok = batch.mask
    for v in keys:
        if v.validity is not None:
            ok = ok & v.full_validity(batch.capacity)
    return ok


class HashBuildStage:
    """Consumes build-side batches and produces a BuiltTable."""

    def __init__(self, key_fields):
        self._key_fields = list(key_fields)
        self._batches: List[DeviceBatch] = []

    def add_input(self, batch: DeviceBatch):
        self._batches.append(batch)

    def finish(self) -> BuiltTable:
        merged = concat_batches(self._batches) if self._batches else None
        if merged is None:
            raise RuntimeError("empty build side requires at least one "
                               "(possibly empty) batch")
        self._batches = []

        @jax.jit
        def _build(b: DeviceBatch):
            cap = b.capacity
            keys = _key_values(b, self._key_fields)
            usable = _usable(b, keys)
            table = H.empty_table(keys, H.table_size_for(cap))
            table, slots, is_new = H.insert(table, keys, usable, cap)
            S = table.size
            seg = jnp.where(usable, slots, jnp.int32(S))
            slot_count = jax.ops.segment_sum(
                jnp.ones((cap,), jnp.int32), seg, num_segments=S + 1)[:S]
            slot_offset = jnp.cumsum(slot_count) - slot_count
            # CSR: build row ids grouped by slot (radix partition by slot;
            # bits must cover the inactive sentinel value S itself)
            slot_bits = max(1, S.bit_length())
            perm = radix_sort_perm([seg.astype(jnp.uint32)], [slot_bits],
                                   cap)
            num = jnp.sum(usable.astype(jnp.int32))
            has_null_key = jnp.any(b.mask & ~usable)
            has_dups = jnp.any(usable & ~is_new)
            return (table, slot_count, slot_offset, perm, num,
                    has_null_key, has_dups)

        (table, slot_count, slot_offset, csr_rows, num, has_null,
         has_dups) = _build(merged)
        return BuiltTable(table, merged, slot_count, slot_offset, csr_rows,
                          num, has_null, has_dups)


_NEEDS_RIGHT_PHASE = (P.JoinType.RIGHT, P.JoinType.FULL,
                      P.JoinType.RIGHT_SEMI_FILTER)


class HashJoinOperator(Operator):
    """Probe-side operator; the Task feeds it a BuiltTable first."""

    def __init__(self, node: P.HashJoinNode):
        super().__init__(node)
        self._node = node
        self._bt: Optional[BuiltTable] = None
        self._outputs: List[DeviceBatch] = []
        self._unique_build = True
        self._matched = None  # bool[build_cap] for right/full joins
        self._right_done = False

    def set_built_table(self, bt: BuiltTable):
        jt = self._node.join_type
        self._bt = bt
        self._unique_build = not bool(jax.device_get(bt.has_dup_keys))
        if jt in _NEEDS_RIGHT_PHASE:
            self._matched = jnp.zeros((bt.batch.capacity,), bool)
        if self._node.filter is not None and jt not in (
                P.JoinType.INNER,):
            raise NotImplementedError("join filter on non-inner joins")
        self._fast_fn = jax.jit(self._probe_fast)
        self._count_fn = jax.jit(self._probe_counts)
        self._emit_fn = jax.jit(self._emit_chunk)

    # ---- shared probe pieces -------------------------------------------------

    def _lookup(self, batch: DeviceBatch, bt: BuiltTable):
        keys = _key_values(batch, self._node.left_keys)
        probe_ok = _usable(batch, keys)
        slots, found = H.lookup(bt.table, keys, probe_ok, batch.capacity)
        return probe_ok, jnp.clip(slots, 0, bt.table.size - 1), \
            probe_ok & found

    def _apply_filter_and_project(self, out: DeviceBatch, cap: int
                                  ) -> DeviceBatch:
        node = self._node
        if node.filter is not None:
            f = ExprSet([node.filter], None).eval_batch(out)[0]
            passed = f.full_data(cap).astype(bool)
            if f.validity is not None:
                passed = passed & f.full_validity(cap)
            out = out.with_mask(out.mask & passed)
        if node.output_columns:
            out = DeviceBatch(
                {n: out.columns[n] for n in node.output_columns}, out.mask)
        return out

    def _gather_build_cols(self, build: DeviceBatch, build_row,
                           null_out) -> Dict[str, DeviceColumn]:
        """Gather build columns at build_row; rows where null_out is True
        get NULL build values (left/full outer semantics)."""
        row = jnp.clip(build_row, 0, None)
        cols = {}
        for name, col in build.columns.items():
            data = col.data[row]
            validity = (col.validity[row]
                        if col.validity is not None else None)
            if null_out is not None:
                validity = (~null_out if validity is None
                            else (validity & ~null_out))
            cols[name] = DeviceColumn(data, validity, col.dtype,
                                      col.dictionary)
        return cols

    # ---- unique-build fast path (one program, no host sync) ------------------

    def _probe_fast(self, batch: DeviceBatch, bt: BuiltTable):
        node = self._node
        cap = batch.capacity
        probe_ok, slots, hit = self._lookup(batch, bt)
        build_row = bt.table.slot_row[slots]
        jt = node.join_type

        new_matched = None
        if self._matched is not None:
            pos = jnp.where(hit, jnp.clip(build_row, 0, None),
                            jnp.int32(bt.batch.capacity))
            new_matched = jnp.zeros((bt.batch.capacity,), bool) \
                .at[pos].set(True, mode="drop")

        if jt in (P.JoinType.INNER, P.JoinType.LEFT, P.JoinType.RIGHT,
                  P.JoinType.FULL):
            out_cols = dict(batch.columns)
            null_out = None if jt is P.JoinType.INNER else ~hit
            out_cols.update(self._gather_build_cols(
                bt.batch, build_row, null_out))
            keep_all = jt in (P.JoinType.LEFT, P.JoinType.FULL)
            mask = batch.mask if keep_all else (batch.mask & hit)
            out = DeviceBatch(out_cols, mask)
        elif jt is P.JoinType.LEFT_SEMI_FILTER:
            out = batch.with_mask(batch.mask & hit)
        elif jt is P.JoinType.RIGHT_SEMI_FILTER:
            # probe side emits nothing; right phase emits matched build rows
            return None, new_matched
        elif jt is P.JoinType.ANTI:
            miss = batch.mask & ~hit
            if node.null_aware:
                miss = jnp.where(bt.has_null_key, jnp.zeros_like(miss),
                                 miss)
                miss = miss & probe_ok
            out = batch.with_mask(miss)
        else:
            raise NotImplementedError(f"join type {jt}")
        return self._apply_filter_and_project(out, cap), new_matched

    # ---- duplicate-build expanding probe (count + emit chunks) ---------------

    def _probe_counts(self, batch: DeviceBatch, bt: BuiltTable):
        node = self._node
        probe_ok, slots, hit = self._lookup(batch, bt)
        jt = node.join_type
        if jt in (P.JoinType.INNER, P.JoinType.RIGHT):
            counts = jnp.where(hit, bt.slot_count[slots], 0)
        elif jt in (P.JoinType.LEFT, P.JoinType.FULL):
            counts = jnp.where(hit, bt.slot_count[slots],
                               batch.mask.astype(jnp.int32))
        elif jt is P.JoinType.LEFT_SEMI_FILTER:
            counts = None  # no expansion
        elif jt is P.JoinType.RIGHT_SEMI_FILTER:
            counts = None
        elif jt is P.JoinType.ANTI:
            counts = None
        else:
            raise NotImplementedError(f"join type {jt}")

        new_matched = None
        if self._matched is not None:
            # mark every build row in each hit slot's CSR range
            S = bt.table.size
            seg = jnp.where(hit, slots, jnp.int32(S))
            hits_per_slot = jax.ops.segment_max(
                hit.astype(jnp.int32), seg, num_segments=S + 1)[:S] > 0
            # build row r (usable) is matched iff its slot was hit
            bkeys = _key_values(bt.batch, self._node.right_keys)
            busable = _usable(bt.batch, bkeys)
            bslots, bfound = H.lookup(bt.table, bkeys, busable,
                                      bt.batch.capacity)
            new_matched = busable & hits_per_slot[bslots]

        if counts is None:
            out, _ = self._probe_fast(batch, bt)
            return out, None, None, None, new_matched
        cum = jnp.cumsum(counts.astype(jnp.int64))
        total = cum[-1]
        return None, (slots, hit), cum, total, new_matched

    def _emit_chunk(self, batch: DeviceBatch, bt: BuiltTable, slots, hit,
                    cum, start):
        """Materialize output rows [start, start+cap) of the expansion."""
        node = self._node
        cap = batch.capacity
        j = start + jnp.arange(cap, dtype=jnp.int64)
        total = cum[-1]
        valid = j < total
        # probe row for output j: first row whose inclusive cumsum > j
        row = jnp.searchsorted(cum, j, side="right").astype(jnp.int32)
        row_c = jnp.clip(row, 0, cap - 1)
        prev = cum[jnp.clip(row_c - 1, 0, None)]
        counts_r = cum[row_c] - jnp.where(row_c > 0, prev, 0)
        within = (j - (cum[row_c] - counts_r)).astype(jnp.int32)
        s = slots[row_c]
        row_hit = hit[row_c]
        build_row = jnp.where(
            row_hit, bt.csr_rows[jnp.clip(bt.slot_offset[s] + within,
                                          0, bt.csr_rows.shape[0] - 1)],
            jnp.int32(-1))
        # gather probe columns at row_c, build columns at build_row
        out_cols = {}
        for name, col in batch.columns.items():
            data = col.data[row_c]
            validity = (col.validity[row_c]
                        if col.validity is not None else None)
            out_cols[name] = DeviceColumn(data, validity, col.dtype,
                                          col.dictionary)
        null_out = None
        if node.join_type in (P.JoinType.LEFT, P.JoinType.FULL):
            null_out = ~row_hit
        out_cols.update(self._gather_build_cols(bt.batch, build_row,
                                                null_out))
        out = DeviceBatch(out_cols, valid)
        return self._apply_filter_and_project(out, cap)

    # ---- right phase (unmatched / matched build rows) -------------------------

    def _emit_right_phase(self) -> Optional[DeviceBatch]:
        node, bt = self._node, self._bt
        jt = node.join_type
        bkeys = _key_values(bt.batch, node.right_keys)

        @jax.jit
        def _emit(bt: BuiltTable, matched):
            cap = bt.batch.capacity
            busable = _usable(bt.batch, bkeys)
            if jt is P.JoinType.RIGHT_SEMI_FILTER:
                mask = bt.batch.mask & matched
                out = DeviceBatch(dict(bt.batch.columns), mask)
            else:  # RIGHT / FULL: unmatched build rows with null probe side
                mask = bt.batch.mask & ~matched
                out_cols = {}
                lt = node.left.output_type()
                for name, dt in zip(lt.names, lt.children):
                    out_cols[name] = DeviceColumn(
                        jnp.zeros((cap,), dt.np_dtype()),
                        jnp.zeros((cap,), bool), dt, None)
                out_cols.update(dict(bt.batch.columns))
                out = DeviceBatch(out_cols, mask)
            if node.output_columns:
                out = DeviceBatch(
                    {n: out.columns[n] for n in node.output_columns},
                    out.mask)
            return out

        return _emit(bt, self._matched)

    # ---- operator contract --------------------------------------------------

    def add_input(self, batch):
        assert self._bt is not None, "build side not finished"
        bt = self._bt
        jt = self._node.join_type
        needs_count_path = (not self._unique_build) and jt in (
            P.JoinType.INNER, P.JoinType.LEFT, P.JoinType.RIGHT,
            P.JoinType.FULL, P.JoinType.RIGHT_SEMI_FILTER)
        if not needs_count_path and self._matched is None:
            out, _ = self._fast_fn(batch, bt)
            self._outputs.append(out)
            return
        if not needs_count_path:
            out, new_matched = self._fast_fn(batch, bt)
            if new_matched is not None:
                self._matched = self._matched | new_matched
            if out is not None:
                self._outputs.append(out)
            return
        out, slot_hit, cum, total, new_matched = self._count_fn(batch, bt)
        if new_matched is not None:
            self._matched = self._matched | new_matched
        if slot_hit is None:
            if out is not None:
                self._outputs.append(out)
            return
        slots, hit = slot_hit
        n_total = int(jax.device_get(total))
        cap = batch.capacity
        for start in range(0, max(n_total, 1), cap):
            if n_total == 0:
                break
            self._outputs.append(self._emit_fn(
                batch, bt, slots, hit, cum, jnp.int64(start)))

    def no_more_input(self):
        super().no_more_input()
        if self._matched is not None and not self._right_done:
            self._right_done = True
            self._outputs.append(self._emit_right_phase())

    def get_output(self):
        if self._outputs:
            return self._outputs.pop(0)
        return None

    def needs_input(self):
        return not self._no_more_input and not self._outputs

    def is_finished(self):
        return self._no_more_input and not self._outputs
