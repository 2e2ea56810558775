"""Hash join: build + probe.

Role parity: ``velox/exec/HashBuild.h:38`` / ``HashProbe.h:28`` /
``HashJoinBridge.h`` — all join types over a shared build-side table.

TPU-first redesign (SURVEY.md §7.1): the probing hash table is replaced by
a **sorted build table + vectorized binary search** (``searchsorted`` is an
XLA-native, branch-free log-n gather — the TPU analogue of the reference's
SIMD 16-tag bucket probe, HashTable.h:377). Build:

  1. concat build batches, normalize join keys to int64,
  2. sort rows by key (nulls/inactive to +inf region),
  3. store sorted keys + payload (dense arrays in HBM).

Probe per batch: searchsorted(left) -> candidate index; range length gives
the duplicate count. Unique-key builds emit one output row per probe row
(static shape). Duplicate-key builds use a two-pass expand: compute per-row
match counts, then emit output in fixed-capacity chunks (capacity + retry is
the static-shape answer to unknown join cardinality, SURVEY.md §7.3).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from velox_tpu import types as T
from velox_tpu.core import plan as P
from velox_tpu.exec import keys as K
from velox_tpu.exec.batch_utils import concat_batches
from velox_tpu.exec.operator import Operator
from velox_tpu.expression.eval import (
    EvalValue, ExprSet, value_from_column,
)
from velox_tpu.vector.device import DeviceBatch, DeviceColumn


class BuiltTable:
    """Sorted build-side table (the HashJoinBridge payload)."""

    def __init__(self, sorted_keys, batch: DeviceBatch, num_rows,
                 has_null_key, has_dup_keys):
        self.sorted_keys = sorted_keys      # [cap] int64, inactive -> MAX
        self.batch = batch                  # row-permuted build batch
        self.num_rows = num_rows            # device scalar
        self.has_null_key = has_null_key    # device scalar bool (anti joins)
        self.has_dup_keys = has_dup_keys    # device scalar bool


def _normalize_multi(keys: List[EvalValue], capacity: int):
    """Combine multiple key columns into one int64 key where possible.

    Single key: normalized directly. Multiple keys: packed when their
    normalized ranges fit in 64 bits is future work — currently hashed with
    collision verification left to the caller (not yet enabled).
    """
    if len(keys) != 1:
        raise NotImplementedError(
            "multi-key hash joins land with the Pallas hash table; "
            "single-key covers TPC-H Q3/Q18")
    key, null_flag = K.normalize_key(keys[0], capacity)
    valid = None
    if null_flag is not None:
        valid = ~null_flag
    return key, valid


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
            kv = [value_from_column(b.columns[k.name])
                  for k in self._key_fields]
            key, valid = _normalize_multi(kv, cap)
            usable = b.mask if valid is None else (b.mask & valid)
            skey = jnp.where(usable, key, K.INT64_MAX)
            iota = jnp.arange(cap, dtype=jnp.int32)
            skeys, active_s, perm = jax.lax.sort(
                [skey, (~usable).astype(jnp.int32), iota],
                num_keys=2, is_stable=True)
            from velox_tpu.exec.batch_utils import take
            permuted = take(b, perm, active_s == 0)
            num = jnp.sum(usable.astype(jnp.int32))
            has_null_key = jnp.any(b.mask & ~(
                jnp.ones((cap,), bool) if valid is None else valid))
            has_dups = jnp.any((skeys[:-1] == skeys[1:])
                               & (skeys[:-1] != K.INT64_MAX))
            return skeys, permuted, num, has_null_key, has_dups

        skeys, permuted, num, has_null, has_dups = _build(merged)
        return BuiltTable(skeys, permuted, num, has_null, has_dups)


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

    def _probe(self, batch: DeviceBatch, table_keys, build: DeviceBatch,
               num_build, has_null_key) -> DeviceBatch:
        node = self._node
        cap = batch.capacity
        kv = [value_from_column(batch.columns[k.name])
              for k in node.left_keys]
        pkey, pvalid = _normalize_multi(kv, cap)
        probe_ok = batch.mask if pvalid is None else (batch.mask & pvalid)

        idx = jnp.searchsorted(table_keys, pkey, side="left")
        idx_c = jnp.clip(idx, 0, table_keys.shape[0] - 1)
        hit = probe_ok & (idx < num_build) & (table_keys[idx_c] == pkey)

        jt = node.join_type
        if jt in (P.JoinType.INNER, P.JoinType.LEFT):
            # unique-build fast path: one output row per probe row
            out_cols: Dict[str, DeviceColumn] = {}
            for name in batch.columns:
                out_cols[name] = batch.columns[name]
            for name, col in build.columns.items():
                data = col.data[idx_c]
                validity = (col.validity[idx_c]
                            if col.validity is not None else None)
                if jt is P.JoinType.LEFT:
                    # non-matching probe rows -> null build columns
                    v = hit if validity is None else (validity & hit)
                    validity = v
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
                miss = jnp.where(has_null_key,
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
                raise NotImplementedError(
                    "join filter on non-inner joins")

        if node.output_columns:
            cols = {n: out.columns[n] for n in node.output_columns}
            out = DeviceBatch(cols, out.mask)
        return out

    # ---- operator contract --------------------------------------------------

    def add_input(self, batch):
        assert self._table is not None, "build side not finished"
        t = self._table
        self._out = self._probe_fn(batch, t.sorted_keys, t.batch,
                                   t.num_rows, t.has_null_key)

    def get_output(self):
        out, self._out = self._out, None
        return out

    def needs_input(self):
        return not self._no_more_input and self._out is None

    def is_finished(self):
        return self._no_more_input and self._out is None
