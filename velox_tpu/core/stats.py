"""Plan-level column statistics resolution.

Role parity: ``velox/exec/VectorHasher.h:274`` cardinality analysis +
parquet row-group stats — the reference decides hash-table modes and
normalized-key layouts from observed value ranges. Here ranges come from
connector metadata (``Connector.column_stats``) and propagate statically
through the plan, driving:

* normalized-key bit packing for radix sort/group-by (exec/sort.py):
  a key column with a known (min, max) contributes ceil(log2(range)) bits
  instead of full 32/64-bit words — fewer radix passes, smaller compiled
  programs;
* the fused filter-reduce kernel's limb-safety proof (ops/filter_reduce.py).

Stats are (min, max) STORAGE-int bounds and must be true bounds: the sort
packs values as ``value - min`` without clipping.
"""

from __future__ import annotations

from typing import Optional, Tuple

from velox_tpu.core import expressions as ex
from velox_tpu.core import plan as P


def resolve_column_stats(node: P.PlanNode,
                         name: str) -> Optional[Tuple[int, int]]:
    """(min, max) storage-int bounds of output column `name` of `node`,
    or None when unknown. Follows identity projections, filters, joins and
    aggregation grouping keys down to connector scan stats."""
    if isinstance(node, P.TableScanNode):
        from velox_tpu.connectors.connector import get_connector
        try:
            conn = get_connector(node.connector_id)
        except Exception:
            return None
        fn = getattr(conn, "column_stats", None)
        return fn(node.table, name) if fn is not None else None
    if isinstance(node, P.FilterNode):
        return resolve_column_stats(node.source, name)
    if isinstance(node, P.ProjectNode):
        for out, e in zip(node.names, node.expressions):
            if out == name:
                if isinstance(e, ex.FieldAccess):
                    return resolve_column_stats(node.source, e.name)
                return None
        return None
    if isinstance(node, (P.HashJoinNode, P.MergeJoinNode,
                         P.NestedLoopJoinNode)):
        lt = node.left.output_type()
        if name in lt.names:
            return resolve_column_stats(node.left, name)
        rt = node.right.output_type()
        if name in rt.names:
            return resolve_column_stats(node.right, name)
        return None
    if isinstance(node, P.AggregationNode):
        for k in node.grouping_keys:
            if k.name == name:
                return resolve_column_stats(node.source, name)
        return None
    if isinstance(node, (P.OrderByNode, P.TopNNode, P.LimitNode)):
        return resolve_column_stats(node.source, name)
    return None
