"""Substrait plan ingestion (JSON form).

Role parity: ``velox/substrait/SubstraitToVeloxPlan.h`` — lets an external
optimizer/host engine (e.g. Gluten-style integrations) hand this engine a
standard Substrait plan instead of building velox_tpu PlanNodes directly.

Scope: the JSON (protojson) serialization of a Substrait plan with the
relations/expressions used by analytic queries: read (namedTable +
filter), filter, project (with emit mapping), aggregate (groupings +
measures), sort, fetch, join (equi-key extraction + residual filter,
inner/left/right/full/semi/anti), cross, and
consistentPartitionWindow. Scalar/aggregate functions resolve by the
base name of the extension declaration (``multiply:dec_dec`` ->
multiply). Join field references are positional over left++right; the
two sides must not share column names (the engine is name-addressed).
Proto-binary plans can be converted to JSON by any Substrait tool; the
wire format here avoids a protobuf schema dependency.
"""

from __future__ import annotations

import base64
import json
from typing import Any, Dict, List, Optional

from velox_tpu import types as T
from velox_tpu.core import expressions as ex
from velox_tpu.core import plan as P

_FN_MAP = {
    "add": "plus", "subtract": "minus", "multiply": "multiply",
    "divide": "divide", "modulus": "mod",
    "equal": "eq", "not_equal": "neq", "lt": "lt", "lte": "lte",
    "gt": "gt", "gte": "gte", "and": "and", "or": "or", "not": "not",
    "between": "between",
    "sum": "sum", "min": "min", "max": "max", "count": "count",
    "avg": "avg", "sum0": "sum",
}

_SORT_DIRECTIONS = {
    "SORT_DIRECTION_ASC_NULLS_FIRST": P.SortOrder.ASC_NULLS_FIRST,
    "SORT_DIRECTION_ASC_NULLS_LAST": P.SortOrder.ASC_NULLS_LAST,
    "SORT_DIRECTION_DESC_NULLS_FIRST": P.SortOrder.DESC_NULLS_FIRST,
    "SORT_DIRECTION_DESC_NULLS_LAST": P.SortOrder.DESC_NULLS_LAST,
    1: P.SortOrder.ASC_NULLS_FIRST, 2: P.SortOrder.ASC_NULLS_LAST,
    3: P.SortOrder.DESC_NULLS_FIRST, 4: P.SortOrder.DESC_NULLS_LAST,
}


def _subs_type(t: Dict) -> T.DataType:
    (kind, spec), = t.items()
    kind = kind.lower()
    if kind in ("i8", "i16", "i32"):
        return T.INTEGER
    if kind == "i64":
        return T.BIGINT
    if kind == "fp32":
        return T.REAL
    if kind == "fp64":
        return T.DOUBLE
    if kind in ("bool", "boolean"):
        return T.BOOLEAN
    if kind in ("string", "varchar"):
        return T.VARCHAR
    if kind == "date":
        return T.DATE
    if kind == "timestamp":
        return T.TIMESTAMP
    if kind == "decimal":
        return T.decimal(int(spec.get("precision", 18)),
                         int(spec.get("scale", 0)))
    raise ValueError(f"unsupported substrait type {kind!r}")


class _Converter:
    def __init__(self, plan: Dict, connector_id: str):
        self.connector_id = connector_id
        self.fns: Dict[int, str] = {}
        for e in plan.get("extensions", ()):
            f = e.get("extensionFunction")
            if f:
                base = f.get("name", "").split(":")[0].lower()
                self.fns[int(f.get("functionAnchor", 0))] = base
        self.ids = P.PlanNodeIdGenerator()

    # -- expressions --------------------------------------------------------

    def expr(self, e: Dict, input_type: T.DataType) -> ex.TypedExpr:
        if "selection" in e:
            idx = int(e["selection"]["directReference"]["structField"]
                      .get("field", 0))
            return ex.field(input_type.names[idx],
                            input_type.children[idx])
        if "literal" in e:
            return self._literal(e["literal"])
        if "cast" in e:
            child = self.expr(e["cast"]["input"], input_type)
            return ex.Cast(_subs_type(e["cast"]["type"]), child)
        if "scalarFunction" in e:
            sf = e["scalarFunction"]
            base = self.fns.get(int(sf.get("functionReference", 0)), "")
            name = _FN_MAP.get(base, base)
            args = [self.expr(a["value"], input_type)
                    for a in sf.get("arguments", ())]
            if name in ("and", "or", "not", "between"):
                return ex.Call(T.BOOLEAN, name, tuple(args))
            return ex.call(name, *args)
        if "ifThen" in e:
            it = e["ifThen"]
            clauses = it.get("ifs", ())
            out = self.expr(it["else"], input_type) if "else" in it \
                else ex.Constant(T.UNKNOWN, None)
            for c in reversed(clauses):
                cond = self.expr(c["if"], input_type)
                then = self.expr(c["then"], input_type)
                out = ex.Call(then.dtype, "if", (cond, then, out))
            return out
        raise ValueError(f"unsupported substrait expression {list(e)}")

    def _literal(self, lit: Dict) -> ex.Constant:
        if "i64" in lit:
            return ex.Constant(T.BIGINT, int(lit["i64"]))
        if "i32" in lit:
            return ex.Constant(T.INTEGER, int(lit["i32"]))
        if "fp64" in lit:
            return ex.Constant(T.DOUBLE, float(lit["fp64"]))
        if "boolean" in lit:
            return ex.Constant(T.BOOLEAN, bool(lit["boolean"]))
        if "string" in lit:
            return ex.Constant(T.VARCHAR, lit["string"])
        if "date" in lit:
            return ex.Constant(T.DATE, int(lit["date"]))
        if "decimal" in lit:
            d = lit["decimal"]
            raw = base64.b64decode(d["value"])
            v = int.from_bytes(raw, "little", signed=True)
            return ex.Constant(
                T.decimal(int(d.get("precision", 18)),
                          int(d.get("scale", 0))), v)
        raise ValueError(f"unsupported substrait literal {list(lit)}")

    # -- relations ----------------------------------------------------------

    def rel(self, r: Dict) -> P.PlanNode:
        (kind, spec), = ((k, v) for k, v in r.items() if k != "common")
        node = getattr(self, f"_rel_{kind}")(spec)
        emit = r.get(kind, {}).get("common", {}).get("emit") \
            or r.get("common", {}).get("emit")
        if emit:
            idxs = [int(i) for i in emit.get("outputMapping", ())]
            ot = node.output_type()
            node = P.ProjectNode(
                self.ids.next(), source=node,
                names=tuple(ot.names[i] for i in idxs),
                expressions=tuple(
                    ex.field(ot.names[i], ot.children[i]) for i in idxs))
        return node

    def _rel_read(self, spec: Dict) -> P.PlanNode:
        names = list(spec["baseSchema"]["names"])
        if "virtualTable" in spec:
            # literal rows (Expression.Literal.Struct per row)
            import pyarrow as pa
            types = [_subs_type(t) for t in
                     spec["baseSchema"]["struct"]["types"]]
            rows = spec["virtualTable"].get("values", ())
            cols: List[List] = [[] for _ in names]
            for r in rows:
                for i, lit in enumerate(r.get("fields", ())):
                    c = self._literal(lit)
                    cols[i].append(c.value)
            rt = T.row(names, types)
            tbl = pa.table(
                {n: pa.array(v, type=T.to_arrow(t))
                 for n, v, t in zip(names, cols, types)})
            return P.ValuesNode(self.ids.next(), row_type=rt,
                                tables=(tbl,))
        table = spec["namedTable"]["names"][0]
        from velox_tpu.connectors.connector import get_connector
        schema = get_connector(self.connector_id).table_schema(table)
        node = P.TableScanNode(
            self.ids.next(), table=table, columns=tuple(names),
            connector_id=self.connector_id,
            row_type=T.row(names,
                           [schema.field_type(n) for n in names]))
        if "filter" in spec:
            pred = self.expr(spec["filter"], node.output_type())
            node = P.FilterNode(self.ids.next(), source=node,
                                predicate=pred)
        return node

    def _rel_filter(self, spec: Dict) -> P.PlanNode:
        src = self.rel(spec["input"])
        pred = self.expr(spec["condition"], src.output_type())
        return P.FilterNode(self.ids.next(), source=src, predicate=pred)

    def _rel_project(self, spec: Dict) -> P.PlanNode:
        src = self.rel(spec["input"])
        it = src.output_type()
        exprs = [self.expr(e, it) for e in spec.get("expressions", ())]
        # substrait project output = input columns ++ new expressions
        names = list(it.names) + [f"expr{i}" for i in range(len(exprs))]
        all_exprs = [ex.field(n, t) for n, t in zip(it.names, it.children)]
        all_exprs += exprs
        return P.ProjectNode(self.ids.next(), source=src,
                             names=tuple(names),
                             expressions=tuple(all_exprs))

    def _rel_aggregate(self, spec: Dict) -> P.PlanNode:
        src = self.rel(spec["input"])
        it = src.output_type()
        keys = []
        groupings = spec.get("groupings", ())
        if groupings:
            for ge in groupings[0].get("groupingExpressions", ()):
                f = self.expr(ge, it)
                if not isinstance(f, ex.FieldAccess):
                    raise ValueError(
                        "substrait grouping must be a field reference")
                keys.append(f)
        calls, names = [], []
        for i, m in enumerate(spec.get("measures", ())):
            mm = m["measure"]
            base = self.fns.get(int(mm.get("functionReference", 0)), "")
            name = _FN_MAP.get(base, base)
            args = tuple(self.expr(a["value"], it)
                         for a in mm.get("arguments", ()))
            rt = _subs_type(mm["outputType"]) if "outputType" in mm \
                else (args[0].dtype if args else T.BIGINT)
            calls.append(P.AggregateCall(name, args, rt))
            names.append(f"agg{i}")
        return P.AggregationNode(
            self.ids.next(), source=src,
            step=P.AggregationStep.SINGLE,
            grouping_keys=tuple(keys),
            aggregate_names=tuple(names), aggregates=tuple(calls))

    # -- joins (parity: SubstraitToVeloxPlan.h JoinRel handling) ------------

    _JOIN_TYPES = {
        "JOIN_TYPE_INNER": P.JoinType.INNER, 1: P.JoinType.INNER,
        "JOIN_TYPE_OUTER": P.JoinType.FULL, 2: P.JoinType.FULL,
        "JOIN_TYPE_LEFT": P.JoinType.LEFT, 3: P.JoinType.LEFT,
        "JOIN_TYPE_RIGHT": P.JoinType.RIGHT, 4: P.JoinType.RIGHT,
        "JOIN_TYPE_LEFT_SEMI": P.JoinType.LEFT_SEMI_FILTER,
        5: P.JoinType.LEFT_SEMI_FILTER,
        "JOIN_TYPE_LEFT_ANTI": P.JoinType.ANTI, 6: P.JoinType.ANTI,
    }

    def _split_join_condition(self, cond: ex.TypedExpr, n_left: int,
                              combined: T.DataType):
        """Separate equi-key pairs (left field == right field) from the
        residual filter, like the reference's JoinRel conversion."""
        conjuncts: List[ex.TypedExpr] = []

        def flatten(e):
            if isinstance(e, ex.Call) and e.name == "and":
                for c in e.args:
                    flatten(c)
            else:
                conjuncts.append(e)
        flatten(cond)
        lk, rk, residual = [], [], []
        for c in conjuncts:
            if (isinstance(c, ex.Call) and c.name == "eq"
                    and len(c.args) == 2
                    and all(isinstance(i, ex.FieldAccess)
                            for i in c.args)):
                idx = {n: i for i, n in enumerate(combined.names)}
                a, b = c.args
                ia, ib = idx[a.name], idx[b.name]
                if ia < n_left <= ib:
                    lk.append(a)
                    rk.append(b)
                    continue
                if ib < n_left <= ia:
                    lk.append(b)
                    rk.append(a)
                    continue
            residual.append(c)
        filt = None
        for c in residual:
            filt = c if filt is None else ex.Call(T.BOOLEAN, "and",
                                                  (filt, c))
        return tuple(lk), tuple(rk), filt

    def _rel_join(self, spec: Dict) -> P.PlanNode:
        left = self.rel(spec["left"])
        right = self.rel(spec["right"])
        lt, rt = left.output_type(), right.output_type()
        combined = T.row(list(lt.names) + list(rt.names),
                         list(lt.children) + list(rt.children))
        jt = self._JOIN_TYPES.get(spec.get("type", "JOIN_TYPE_INNER"))
        if jt is None:
            raise ValueError(
                f"unsupported substrait join type {spec.get('type')!r}")
        cond = spec.get("expression") or spec.get("condition")
        lk: tuple = ()
        rk: tuple = ()
        filt = None
        if cond is not None:
            c = self.expr(cond, combined)
            lk, rk, filt = self._split_join_condition(
                c, len(lt.names), combined)
        if not lk:
            # no equi keys: nested-loop join on the full condition
            return P.NestedLoopJoinNode(
                self.ids.next(), left=left, right=right, join_type=jt,
                filter=filt)
        post = spec.get("postJoinFilter")
        if post is not None:
            p = self.expr(post, combined)
            filt = p if filt is None else ex.Call(T.BOOLEAN, "and",
                                                  (filt, p))
        return P.HashJoinNode(
            self.ids.next(), left=left, right=right, join_type=jt,
            left_keys=lk, right_keys=rk, filter=filt)

    def _rel_cross(self, spec: Dict) -> P.PlanNode:
        return P.NestedLoopJoinNode(
            self.ids.next(), left=self.rel(spec["left"]),
            right=self.rel(spec["right"]),
            join_type=P.JoinType.INNER)

    # -- windows (ConsistentPartitionWindowRel) -----------------------------

    def _window_bound(self, b: Optional[Dict], is_start: bool):
        from velox_tpu.exec.window import BoundType
        default = (BoundType.UNBOUNDED_PRECEDING if is_start
                   else BoundType.CURRENT_ROW)
        if not b:
            return default, 0
        if "unbounded" in b or "unbounded_" in b:
            return (BoundType.UNBOUNDED_PRECEDING if is_start
                    else BoundType.UNBOUNDED_FOLLOWING), 0
        if "currentRow" in b:
            return BoundType.CURRENT_ROW, 0
        if "preceding" in b:
            return (BoundType.PRECEDING,
                    int(b["preceding"].get("offset", 0)))
        if "following" in b:
            return (BoundType.FOLLOWING,
                    int(b["following"].get("offset", 0)))
        return default, 0

    def _rel_consistentPartitionWindow(self, spec: Dict) -> P.PlanNode:
        from velox_tpu.exec.window import (
            FrameType, WindowFrame, WindowFunctionCall,
        )
        src = self.rel(spec["input"])
        it = src.output_type()
        parts = []
        for pe in spec.get("partitionExpressions", ()):
            f = self.expr(pe, it)
            if not isinstance(f, ex.FieldAccess):
                raise ValueError("window partition must be a field ref")
            parts.append(f)
        keys, orders = [], []
        for s in spec.get("sorts", ()):
            keys.append(self.expr(s["expr"], it))
            orders.append(_SORT_DIRECTIONS[s.get(
                "direction", "SORT_DIRECTION_ASC_NULLS_LAST")])
        calls, names = [], []
        for i, wf in enumerate(spec.get("windowFunctions", ())):
            base = self.fns.get(int(wf.get("functionReference", 0)), "")
            name = _FN_MAP.get(base, base)
            args = tuple(self.expr(a["value"], it)
                         for a in wf.get("arguments", ()))
            rt = (_subs_type(wf["outputType"])
                  if "outputType" in wf
                  else (args[0].dtype if args else T.BIGINT))
            bt = wf.get("boundsType", "BOUNDS_TYPE_RANGE")
            ft = (FrameType.ROWS
                  if bt in ("BOUNDS_TYPE_ROWS", 2) else FrameType.RANGE)
            st, sv = self._window_bound(wf.get("lowerBound"), True)
            et, ev = self._window_bound(wf.get("upperBound"), False)
            frame = WindowFrame(ft, st, sv, et, ev)
            calls.append(WindowFunctionCall(
                name=name, inputs=args, result_type=rt, frame=frame))
            names.append(f"w{i}")
        return P.WindowNode(
            self.ids.next(), source=src,
            partition_keys=tuple(parts), sort_keys=tuple(keys),
            sort_orders=tuple(orders), output_names=tuple(names),
            functions=tuple(calls))

    def _rel_fetch(self, spec: Dict) -> P.PlanNode:
        src = self.rel(spec["input"])
        return P.LimitNode(self.ids.next(), source=src,
                           offset=int(spec.get("offset", 0)),
                           count=int(spec.get("count", 0)))

    def _rel_sort(self, spec: Dict) -> P.PlanNode:
        src = self.rel(spec["input"])
        it = src.output_type()
        keys, orders = [], []
        for s in spec.get("sorts", ()):
            f = self.expr(s["expr"], it)
            keys.append(f)
            orders.append(_SORT_DIRECTIONS[s.get(
                "direction", "SORT_DIRECTION_ASC_NULLS_LAST")])
        return P.OrderByNode(self.ids.next(), source=src,
                             keys=tuple(keys), orders=tuple(orders))


def from_substrait(plan, connector_id: str = "tpch") -> P.PlanNode:
    """Convert a Substrait plan (JSON string or dict) to a PlanNode."""
    if isinstance(plan, (str, bytes)):
        plan = json.loads(plan)
    conv = _Converter(plan, connector_id)
    root = plan["relations"][0]["root"]
    node = conv.rel(root["input"])
    names = root.get("names")
    if names:
        ot = node.output_type()
        node = P.ProjectNode(
            conv.ids.next(), source=node, names=tuple(names),
            expressions=tuple(ex.field(n, t)
                              for n, t in zip(ot.names, ot.children)))
    return node
