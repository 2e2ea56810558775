"""Smaller relational operators.

Role parity (all under velox/exec/):
  MarkDistinct.h:24, AssignUniqueId.h:22, EnforceSingleRow.h:21,
  Expand.h:23, GroupId.h:22, NestedLoopJoinBuild.h:33 /
  NestedLoopJoinProbe.h:68, MergeJoin.h:45.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from velox_tpu import types as T
from velox_tpu.core import plan as P
from velox_tpu.exec.batch_utils import concat_batches
from velox_tpu.exec.operator import Operator
from velox_tpu.expression.eval import ExprSet, value_from_column
from velox_tpu.vector.device import DeviceBatch, DeviceColumn


class MarkDistinctOperator(Operator):
    """Adds a boolean column marking the first row of each distinct key
    combination (streaming, hash-table backed).
    Parity: velox/exec/MarkDistinct.h:24."""

    def __init__(self, node: "P.MarkDistinctNode"):
        super().__init__(node)
        self._node = node
        self._table = None
        self._out = None

    def _step(self, batch: DeviceBatch, table):
        from velox_tpu.exec import hashtable as H
        node = self._node
        cap = batch.capacity
        keys = [value_from_column(batch.columns[k.name])
                for k in node.distinct_keys]
        if table is None:
            table = H.empty_table(keys, H.table_size_for(cap))
        table, slots, is_new = H.insert(table, keys, batch.mask, cap)
        cols = dict(batch.columns)
        cols[node.marker] = DeviceColumn(is_new, None, T.BOOLEAN, None)
        return DeviceBatch(cols, batch.mask), table

    def add_input(self, batch):
        from velox_tpu.exec.jit_cache import cached_jit
        if self._table is None:
            fn = cached_jit(
                ("mark_distinct_init", self.node),
                lambda: jax.jit(lambda b: self._step(b, None)))
            self._out, self._table = fn(batch)
        else:
            if not hasattr(self, "_fn"):
                self._fn = cached_jit(("mark_distinct", self.node),
                                      lambda: jax.jit(self._step))
            self._out, self._table = self._fn(batch, self._table)

    def get_output(self):
        out, self._out = self._out, None
        return out

    def needs_input(self):
        return not self._no_more_input and self._out is None

    def is_finished(self):
        return self._no_more_input and self._out is None


class AssignUniqueIdOperator(Operator):
    """Adds a unique int64 id per row (task id in high bits + running
    counter). Parity: velox/exec/AssignUniqueId.h:22."""

    def __init__(self, node: "P.AssignUniqueIdNode"):
        super().__init__(node)
        self._node = node
        self._counter = jnp.zeros((), jnp.int64)
        self._out = None

        def _step(batch: DeviceBatch, counter):
            cap = batch.capacity
            ordinal = jnp.cumsum(batch.mask.astype(jnp.int64)) - 1
            ids = counter + ordinal
            ids = ids | (jnp.int64(node.task_unique_id) << 40)
            cols = dict(batch.columns)
            cols[node.id_column] = DeviceColumn(
                ids, None, T.BIGINT, None)
            new_counter = counter + jnp.sum(batch.mask.astype(jnp.int64))
            return DeviceBatch(cols, batch.mask), new_counter

        from velox_tpu.exec.jit_cache import cached_jit
        self._fn = cached_jit(("assign_uid", node), lambda: jax.jit(_step))

    def add_input(self, batch):
        self._out, self._counter = self._fn(batch, self._counter)

    def get_output(self):
        out, self._out = self._out, None
        return out

    def needs_input(self):
        return not self._no_more_input and self._out is None

    def is_finished(self):
        return self._no_more_input and self._out is None


class EnforceSingleRowOperator(Operator):
    """Errors unless the input has exactly one row (scalar subqueries);
    empty input produces a single all-null row.
    Parity: velox/exec/EnforceSingleRow.h:21."""

    def __init__(self, node: "P.EnforceSingleRowNode"):
        super().__init__(node)
        self._node = node
        self._batches: List[DeviceBatch] = []
        self._out = None

    def add_input(self, batch):
        self._batches.append(batch)

    def no_more_input(self):
        super().no_more_input()
        merged = concat_batches(self._batches) if self._batches else None
        self._batches = []
        if merged is None:
            raise RuntimeError("EnforceSingleRow: no input batches")
        n = int(jax.device_get(merged.num_active()))
        if n > 1:
            raise RuntimeError(
                f"Expected single row of input, received {n} rows")
        if n == 1:
            from velox_tpu.exec.batch_utils import compact
            from velox_tpu.exec.jit_cache import cached_jit
            self._out = cached_jit(("compact_fn",),
                                   lambda: jax.jit(compact))(merged)
        else:
            # single all-null row
            cols = {
                name: DeviceColumn(
                    jnp.zeros((merged.capacity,), c.data.dtype),
                    jnp.zeros((merged.capacity,), bool), c.dtype,
                    c.dictionary)
                for name, c in merged.columns.items()
            }
            mask = jnp.zeros((merged.capacity,), bool).at[0].set(True)
            self._out = DeviceBatch(cols, mask)

    def get_output(self):
        out, self._out = self._out, None
        return out

    def is_finished(self):
        return self._no_more_input and self._out is None


class ExpandOperator(Operator):
    """Emits one copy of the input per projection set (Spark EXPAND:
    grouping sets / distinct-agg rewrites).
    Parity: velox/exec/Expand.h:23."""

    def __init__(self, node: "P.ExpandNode"):
        super().__init__(node)
        self._node = node
        self._outs: List[DeviceBatch] = []
        ot = node.output_type()

        def _one(batch: DeviceBatch, i: int) -> DeviceBatch:
            exprs = list(node.projection_sets[i])
            vals = ExprSet(exprs, None).eval_batch(batch)
            cols = {
                name: v.to_column(batch.capacity)
                for name, v in zip(ot.names, vals)
            }
            return DeviceBatch(cols, batch.mask)

        from velox_tpu.exec.jit_cache import cached_jit
        self._fns = [cached_jit(("expand", node, i),
                                lambda i=i: jax.jit(
                                    lambda b, i=i: _one(b, i)))
                     for i in range(len(node.projection_sets))]

    def add_input(self, batch):
        for fn in self._fns:
            self._outs.append(fn(batch))

    def get_output(self):
        if self._outs:
            return self._outs.pop(0)
        return None

    def needs_input(self):
        return not self._no_more_input and not self._outs

    def is_finished(self):
        return self._no_more_input and not self._outs


class UnnestOperator(Operator):
    """One row per array/map element; other columns replicated. The output
    capacity is the unnested column's element capacity, so expansion needs
    NO host synchronization (the flattened elements already exist on
    device). Parity: velox/exec/Unnest.h:20."""

    def __init__(self, node: "P.UnnestNode"):
        super().__init__(node)
        self._node = node
        st = node.source.output_type()
        ut = st.field_type(node.unnest_column)
        for n, t in zip(st.names, st.children):
            if n != node.unnest_column and t.is_complex:
                raise NotImplementedError(
                    "replicating complex columns through Unnest")
        if any(c.is_complex for c in ut.children):
            raise NotImplementedError("nested complex unnest")
        self._out = None
        from velox_tpu.exec.jit_cache import cached_jit
        self._fn = cached_jit(("unnest", node),
                              lambda: jax.jit(self._run))

    def _run(self, batch: DeviceBatch) -> DeviceBatch:
        node = self._node
        cap = batch.capacity
        col = batch.columns[node.unnest_column]
        is_map = col.dtype.kind is T.TypeKind.MAP
        child = col.children[0]
        ecap = child.capacity
        valid = batch.mask
        if col.validity is not None:
            valid = valid & col.validity
        lens = jnp.where(valid, col.data.astype(jnp.int32), 0)
        orig_starts = col.offsets()
        cum = jnp.cumsum(lens)
        total = cum[cap - 1]
        j = jnp.arange(ecap, dtype=jnp.int32)
        row = jnp.searchsorted(cum, j, side="right").astype(jnp.int32)
        row_c = jnp.clip(row, 0, cap - 1)
        within = j - (cum[row_c] - lens[row_c])
        src = jnp.clip(orig_starts[row_c] + within, 0, ecap - 1)
        out_mask = j < total

        from velox_tpu.exec.batch_utils import map_column_rows
        cols: Dict[str, DeviceColumn] = {}
        for name, c in batch.columns.items():
            if name == node.unnest_column:
                continue
            # map_column_rows: sibling complex columns get explicit
            # starts (their element children stay shared)
            cols[name] = map_column_rows(c, lambda a: a[row_c])

        def gather_child(ch):
            return DeviceColumn(
                ch.data[src],
                ch.validity[src] if ch.validity is not None else None,
                ch.dtype, ch.dictionary, ch.children)

        if is_map:
            cols[node.element_name] = gather_child(col.children[0])
            cols[node.value_name] = gather_child(col.children[1])
        else:
            cols[node.element_name] = gather_child(child)
        if node.ordinality_name:
            cols[node.ordinality_name] = DeviceColumn(
                (within + 1).astype(jnp.int64), None, T.BIGINT, None)
        return DeviceBatch(cols, out_mask)

    def add_input(self, batch):
        self._out = self._fn(batch)

    def get_output(self):
        out, self._out = self._out, None
        return out

    def needs_input(self):
        return not self._no_more_input and self._out is None

    def is_finished(self):
        return self._no_more_input and self._out is None


class GroupIdOperator(Operator):
    """Grouping-sets expansion. Parity: velox/exec/GroupId.h:22."""

    def __init__(self, node: "P.GroupIdNode"):
        super().__init__(node)
        self._node = node
        self._outs: List[DeviceBatch] = []
        all_keys = node.all_keys()

        def _one(batch: DeviceBatch, i: int) -> DeviceBatch:
            gs = set(node.grouping_sets[i])
            cols: Dict[str, DeviceColumn] = {}
            for k in all_keys:
                col = batch.columns[k]
                if k in gs:
                    cols[k] = col
                else:  # nulled-out key for this grouping set
                    cols[k] = DeviceColumn(
                        jnp.zeros_like(col.data),
                        jnp.zeros((batch.capacity,), bool),
                        col.dtype, col.dictionary)
            for a in node.aggregation_inputs:
                cols[a] = batch.columns[a]
            cols[node.group_id_name] = DeviceColumn(
                jnp.full((batch.capacity,), i, jnp.int64), None,
                T.BIGINT, None)
            return DeviceBatch(cols, batch.mask)

        from velox_tpu.exec.jit_cache import cached_jit
        self._fns = [cached_jit(("group_id", node, i),
                                lambda i=i: jax.jit(
                                    lambda b, i=i: _one(b, i)))
                     for i in range(len(node.grouping_sets))]

    def add_input(self, batch):
        for fn in self._fns:
            self._outs.append(fn(batch))

    def get_output(self):
        if self._outs:
            return self._outs.pop(0)
        return None

    def needs_input(self):
        return not self._no_more_input and not self._outs

    def is_finished(self):
        return self._no_more_input and not self._outs


class NestedLoopJoinOperator(Operator):
    """Cross/inequality join: every probe row against every build row,
    optionally filtered. Two-pass static-shape expansion (chunked).
    Parity: velox/exec/NestedLoopJoinProbe.h:68 — inner/cross plus
    LEFT/RIGHT/FULL outer via per-side match tracking across chunks."""

    def __init__(self, node: "P.NestedLoopJoinNode"):
        super().__init__(node)
        self._node = node
        jt = node.join_type
        self._track_probe = jt in (P.JoinType.LEFT, P.JoinType.FULL)
        self._track_build = jt in (P.JoinType.RIGHT, P.JoinType.FULL)
        self._build: Optional[DeviceBatch] = None
        self._build_n = 0
        self._build_matched = None   # bool[build_cap], OR over all chunks
        self._probe_template: Optional[Dict[str, DeviceColumn]] = None
        self._outputs: List[DeviceBatch] = []
        self._emit_fn = None

    def set_build(self, build: DeviceBatch):
        from velox_tpu.exec.batch_utils import compact
        from velox_tpu.exec.jit_cache import cached_jit
        self._build = cached_jit(("compact_fn",),
                                 lambda: jax.jit(compact))(build)
        self._build_n = int(jax.device_get(build.num_active()))
        self._emit_fn = cached_jit(("nlj_emit", self._node),
                                   lambda: jax.jit(self._emit))
        if self._track_build:
            self._build_matched = jnp.zeros((self._build.capacity,), bool)

    def _emit(self, batch: DeviceBatch, build: DeviceBatch, start):
        """Output rows [start, start+cap) of the probe x build product,
        plus per-side matched flags for outer semantics. Probe rows must
        be compacted (active prefix)."""
        node = self._node
        cap = batch.capacity
        nb = jnp.maximum(jnp.sum(build.mask.astype(jnp.int64)), 1)
        npr = jnp.sum(batch.mask.astype(jnp.int64))
        j = start + jnp.arange(cap, dtype=jnp.int64)
        valid = j < nb * npr
        prow = jnp.clip((j // nb).astype(jnp.int32), 0, cap - 1)
        brow = jnp.clip((j % nb).astype(jnp.int32), 0,
                        build.capacity - 1)
        from velox_tpu.exec.batch_utils import map_column_rows
        cols: Dict[str, DeviceColumn] = {}
        for name, col in batch.columns.items():
            # map_column_rows: ROW fields / long-decimal hi limbs gather
            # along with the parent rows
            cols[name] = map_column_rows(col, lambda a: a[prow])
        for name, col in build.columns.items():
            cols[name] = map_column_rows(col, lambda a: a[brow])
        out = DeviceBatch(cols, valid)
        if node.filter is not None:
            f = ExprSet([node.filter], None).eval_batch(out)[0]
            passed = f.full_data(cap).astype(bool)
            if f.validity is not None:
                passed = passed & f.full_validity(cap)
            out = out.with_mask(out.mask & passed)
        pm = jnp.zeros((cap,), bool).at[
            jnp.where(out.mask, prow, jnp.int32(cap))].set(
            True, mode="drop")
        bm = jnp.zeros((build.capacity,), bool).at[
            jnp.where(out.mask, brow, jnp.int32(build.capacity))].set(
            True, mode="drop")
        if node.output_columns:
            out = DeviceBatch(
                {n: out.columns[n] for n in node.output_columns}, out.mask)
        return out, pm, bm

    def _null_columns(self, source: DeviceBatch, cap: int
                      ) -> Dict[str, DeviceColumn]:
        """All-NULL columns with `source`'s schema at capacity `cap`."""
        from velox_tpu.exec.batch_utils import map_column_rows
        row0 = jnp.zeros((cap,), jnp.int32)
        cols = {}
        for name, col in source.columns.items():
            c = map_column_rows(col, lambda a: a[row0])
            cols[name] = DeviceColumn(c.data, jnp.zeros((cap,), bool),
                                      c.dtype, c.dictionary, c.children,
                                      c.starts)
        return cols

    def _emit_probe_unmatched(self, batch: DeviceBatch, matched):
        """LEFT/FULL: probe rows with no passing match, build cols NULL."""
        node = self._node
        cols = dict(batch.columns)
        cols.update(self._null_columns(self._build, batch.capacity))
        out = DeviceBatch(cols, batch.mask & ~matched)
        if node.output_columns:
            out = DeviceBatch(
                {n: out.columns[n] for n in node.output_columns}, out.mask)
        return out

    def _emit_build_unmatched(self):
        """RIGHT/FULL: build rows with no passing match, probe cols NULL."""
        node = self._node
        build = self._build
        bcap = build.capacity
        if self._probe_template is not None:
            probe_null = {
                name: DeviceColumn(
                    jnp.zeros((bcap,) + col.data.shape[1:],
                              col.data.dtype),
                    jnp.zeros((bcap,), bool), col.dtype, col.dictionary)
                for name, col in self._probe_template.items()}
        else:
            # probe side produced no batches: derive the schema from the
            # plan (string columns get an empty dictionary)
            import numpy as np
            probe_null = {}
            lt = node.left.output_type()
            for name, dt in zip(lt.names, lt.children):
                dic = (np.array([""], dtype=object)
                       if dt.is_string else None)
                probe_null[name] = DeviceColumn(
                    jnp.zeros((bcap,), dt.np_dtype()),
                    jnp.zeros((bcap,), bool), dt, dic)
        cols = dict(probe_null)
        for name, col in build.columns.items():
            cols[name] = col
        out = DeviceBatch(cols, build.mask & ~self._build_matched)
        if node.output_columns:
            out = DeviceBatch(
                {n: out.columns[n] for n in node.output_columns}, out.mask)
        return out

    def add_input(self, batch):
        assert self._build is not None
        from velox_tpu.exec.batch_utils import compact
        from velox_tpu.exec.jit_cache import cached_jit
        # one shared jitted wrapper: a fresh jax.jit(compact) per call
        # compiled EVERY probe batch (jit caches on wrapper identity)
        batch = cached_jit(("nlj_compact",),
                           lambda: jax.jit(compact))(batch)
        if self._probe_template is None:
            self._probe_template = dict(batch.columns)
        n_probe = int(jax.device_get(batch.num_active()))
        total = n_probe * self._build_n
        cap = batch.capacity
        probe_matched = (jnp.zeros((cap,), bool)
                         if self._track_probe else None)
        for start in range(0, max(total, 1), cap):
            if total == 0:
                break
            out, pm, bm = self._emit_fn(batch, self._build,
                                        jnp.int64(start))
            self._outputs.append(out)
            if probe_matched is not None:
                probe_matched = probe_matched | pm
            if self._build_matched is not None:
                self._build_matched = self._build_matched | bm
        if self._track_probe:
            self._outputs.append(
                self._emit_probe_unmatched(batch, probe_matched
                                           if probe_matched is not None
                                           else jnp.zeros((cap,), bool)))

    def no_more_input(self):
        super().no_more_input()
        if self._track_build and self._build is not None:
            self._outputs.append(self._emit_build_unmatched())

    def get_output(self):
        if self._outputs:
            return self._outputs.pop(0)
        return None

    def needs_input(self):
        return not self._no_more_input and not self._outputs

    def is_finished(self):
        return self._no_more_input and not self._outputs
