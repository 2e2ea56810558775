"""Randomized testing: vector fuzzer + expression/aggregation fuzzers.

Role parity: ``velox/vector/fuzzer/VectorFuzzer.h:43-88`` (random vectors
with random nulls) and ``velox/expression/fuzzer/ExpressionFuzzer.cpp`` /
``exec/fuzzer/AggregationFuzzer.cpp`` (random expressions/plans checked
against a reference evaluator — DuckDB there, an independent pandas
interpreter here).
"""

from __future__ import annotations

import math
import random
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np
import pandas as pd

from velox_tpu import types as T
from velox_tpu.core import expressions as ex


class VectorFuzzer:
    """Random columnar data with random nulls (host-side pandas/pyarrow)."""

    SCALAR_TYPES = (T.BIGINT, T.INTEGER, T.SMALLINT, T.DOUBLE, T.REAL,
                    T.BOOLEAN, T.DATE, T.VARCHAR, T.decimal(12, 2))

    def __init__(self, seed: int = 0, null_ratio: float = 0.1):
        self.rng = random.Random(seed)
        self.np_rng = np.random.RandomState(seed)
        self.null_ratio = null_ratio

    def random_type(self) -> T.DataType:
        return self.rng.choice(self.SCALAR_TYPES)

    def random_series(self, dtype: T.DataType, n: int,
                      with_nulls: bool = True) -> pd.Series:
        r = self.np_rng
        if dtype.kind is T.TypeKind.BOOLEAN:
            s = pd.Series(r.rand(n) > 0.5)
        elif dtype.is_integral:
            info = np.iinfo(dtype.np_dtype())
            lo, hi = max(info.min, -10**6), min(info.max, 10**6)
            s = pd.Series(r.randint(lo, hi, n).astype(dtype.np_dtype()))
        elif dtype.kind is T.TypeKind.DOUBLE:
            s = pd.Series(r.randn(n) * 100)
        elif dtype.kind is T.TypeKind.REAL:
            s = pd.Series((r.randn(n) * 100).astype(np.float32))
        elif dtype.kind is T.TypeKind.DATE:
            s = pd.Series(np.array(r.randint(0, 20000, n),
                                   dtype="datetime64[D]"))
        elif dtype.kind is T.TypeKind.DECIMAL:
            s = pd.Series(r.randint(-10**7, 10**7, n))  # scaled cents
        elif dtype.is_string:
            words = ["apple", "pear", "fig", "kiwi", "lime", "plum", ""]
            s = pd.Series(r.choice(words, n))
        else:
            raise TypeError(dtype)
        if with_nulls and self.null_ratio > 0:
            mask = r.rand(n) < self.null_ratio
            if mask.any():
                s = s.astype(object if dtype.is_string else s.dtype)
                s = s.mask(mask)
        return s

    def random_table(self, n: int, num_cols: int = 4):
        import pyarrow as pa
        cols, types = {}, {}
        for i in range(num_cols):
            dt = self.random_type()
            name = f"c{i}"
            s = self.random_series(dt, n)
            types[name] = dt
            if dt.kind is T.TypeKind.DECIMAL:
                import decimal as pydec
                vals = [None if pd.isna(v)
                        else pydec.Decimal(int(v)).scaleb(-2)
                        for v in s]
                cols[name] = pa.array(vals, pa.decimal128(12, 2))
            else:
                cols[name] = pa.array(s, T.to_arrow(dt), from_pandas=True)
        return pa.table(cols), types


# ---------------------------------------------------------------------------
# Independent reference evaluator (pandas, SQL null semantics).
# ---------------------------------------------------------------------------

def _null_series(n):
    return pd.Series([None] * n, dtype="object")


class RefEvaluator:
    """Evaluates a TypedExpr over a pandas frame with SQL 3-valued logic.

    Values are pd.Series of python objects / numpy values; None = NULL.
    Decimal columns are python floats of the unscaled-int / 10^s value with
    exact arithmetic on ints where needed — for fuzzing we restrict to
    comparisons/arith whose reference is exact in float64 (int ranges
    <= 2^52)."""

    def __init__(self, df: pd.DataFrame, types: Dict[str, T.DataType]):
        self.df = df
        self.types = types
        self.n = len(df)

    def eval(self, e: ex.TypedExpr) -> pd.Series:
        if isinstance(e, ex.FieldAccess):
            return self.df[e.name]
        if isinstance(e, ex.Constant):
            if e.value is None:
                return _null_series(self.n)
            v = e.value
            if e.dtype.kind is T.TypeKind.DECIMAL:
                v = v / 10.0 ** e.dtype.scale
            if e.dtype.kind is T.TypeKind.DATE and isinstance(v, str):
                v = np.datetime64(v)
            return pd.Series([v] * self.n)
        if isinstance(e, ex.Call):
            return self._call(e)
        raise NotImplementedError(type(e).__name__)

    def _binary(self, e, fn):
        a, b = self.eval(e.args[0]), self.eval(e.args[1])
        out = []
        for x, y in zip(a, b):
            if pd.isna(x) or pd.isna(y):
                out.append(None)
            else:
                out.append(fn(x, y))
        return pd.Series(out, dtype="object")

    def _call(self, e: ex.Call) -> pd.Series:
        name = e.name
        if name in ("plus", "minus", "multiply"):
            op = {"plus": lambda x, y: x + y,
                  "minus": lambda x, y: x - y,
                  "multiply": lambda x, y: x * y}[name]
            return self._binary(e, op)
        if name in ("eq", "neq", "lt", "lte", "gt", "gte"):
            op = {"eq": lambda x, y: x == y, "neq": lambda x, y: x != y,
                  "lt": lambda x, y: x < y, "lte": lambda x, y: x <= y,
                  "gt": lambda x, y: x > y, "gte": lambda x, y: x >= y}[name]
            return self._binary(e, op)
        if name == "and":
            a, b = self.eval(e.args[0]), self.eval(e.args[1])
            out = []
            for x, y in zip(a, b):
                xb = None if pd.isna(x) else bool(x)
                yb = None if pd.isna(y) else bool(y)
                if xb is False or yb is False:
                    out.append(False)
                elif xb is None or yb is None:
                    out.append(None)
                else:
                    out.append(True)
            return pd.Series(out, dtype="object")
        if name == "or":
            a, b = self.eval(e.args[0]), self.eval(e.args[1])
            out = []
            for x, y in zip(a, b):
                xb = None if pd.isna(x) else bool(x)
                yb = None if pd.isna(y) else bool(y)
                if xb is True or yb is True:
                    out.append(True)
                elif xb is None or yb is None:
                    out.append(None)
                else:
                    out.append(False)
            return pd.Series(out, dtype="object")
        if name == "not":
            a = self.eval(e.args[0])
            return pd.Series(
                [None if pd.isna(x) else (not bool(x)) for x in a],
                dtype="object")
        if name == "is_null":
            a = self.eval(e.args[0])
            return pd.Series([bool(pd.isna(x)) for x in a], dtype="object")
        if name == "coalesce":
            cols = [self.eval(a) for a in e.args]
            out = []
            for i in range(self.n):
                v = None
                for c in cols:
                    if not pd.isna(c.iloc[i]):
                        v = c.iloc[i]
                        break
                out.append(v)
            return pd.Series(out, dtype="object")
        if name == "if":
            c = self.eval(e.args[0])
            t = self.eval(e.args[1])
            f = self.eval(e.args[2]) if len(e.args) > 2 \
                else _null_series(self.n)
            out = []
            for i in range(self.n):
                cond = c.iloc[i]
                take = (not pd.isna(cond)) and bool(cond)
                out.append(t.iloc[i] if take else f.iloc[i])
            return pd.Series(out, dtype="object")
        if name == "between":
            x = self.eval(e.args[0])
            lo = self.eval(e.args[1])
            hi = self.eval(e.args[2])
            out = []
            for a, b, c in zip(x, lo, hi):
                if pd.isna(a) or pd.isna(b) or pd.isna(c):
                    out.append(None)
                else:
                    out.append(b <= a <= c)
            return pd.Series(out, dtype="object")
        raise NotImplementedError(name)


# ---------------------------------------------------------------------------
# Expression fuzzer
# ---------------------------------------------------------------------------

class ExpressionFuzzer:
    """Generates random boolean/numeric expression trees over a fuzzed
    table, evaluates both through the engine and the reference evaluator,
    and compares (nulls must match exactly; floats with tolerance)."""

    def __init__(self, seed: int = 0, rows: int = 200):
        self.seed = seed
        self.rows = rows

    def _gen_expr(self, rng: random.Random, types: Dict[str, T.DataType],
                  want: str, depth: int) -> Optional[ex.TypedExpr]:
        numeric_cols = [n for n, t in types.items()
                        if t.is_numeric and not t.kind is T.TypeKind.REAL]
        bool_cols = [n for n, t in types.items()
                     if t.kind is T.TypeKind.BOOLEAN]
        if want == "bool":
            choices = ["cmp", "and", "or", "not", "is_null", "between"]
            if bool_cols:
                choices.append("col")
            if depth <= 0:
                choices = ["col"] if bool_cols else ["cmp"]
            kind = rng.choice(choices)
            if kind == "col":
                c = rng.choice(bool_cols)
                return ex.field(c, types[c])
            if kind in ("and", "or"):
                a = self._gen_expr(rng, types, "bool", depth - 1)
                b = self._gen_expr(rng, types, "bool", depth - 1)
                if a is None or b is None:
                    return None
                return ex.Call(T.BOOLEAN, kind, (a, b))
            if kind == "not":
                a = self._gen_expr(rng, types, "bool", depth - 1)
                if a is None:
                    return None
                return ex.Call(T.BOOLEAN, "not", (a,))
            if kind == "is_null":
                a = self._gen_expr(rng, types, "num", depth - 1)
                if a is None:
                    return None
                return ex.Call(T.BOOLEAN, "is_null", (a,))
            if kind == "between":
                if not numeric_cols:
                    return None
                c = rng.choice(numeric_cols)
                f = ex.field(c, types[c])
                lo = ex.Constant(T.INTEGER, rng.randint(-100, 0))
                hi = ex.Constant(T.INTEGER, rng.randint(0, 100))
                return ex.Call(T.BOOLEAN, "between", (f, lo, hi))
            # cmp
            a = self._gen_expr(rng, types, "num", depth - 1)
            b = self._gen_expr(rng, types, "num", depth - 1)
            if a is None or b is None:
                return None
            op = rng.choice(["eq", "neq", "lt", "lte", "gt", "gte"])
            return ex.Call(T.BOOLEAN, op, (a, b))
        # numeric
        if depth <= 0 or not numeric_cols:
            if numeric_cols and rng.random() < 0.7:
                c = rng.choice(numeric_cols)
                return ex.field(c, types[c])
            return ex.Constant(T.INTEGER, rng.randint(-50, 50))
        kind = rng.choice(["col", "const", "arith", "if", "coalesce"])
        if kind == "col":
            c = rng.choice(numeric_cols)
            return ex.field(c, types[c])
        if kind == "const":
            return ex.Constant(T.INTEGER, rng.randint(-50, 50))
        if kind == "arith":
            a = self._gen_expr(rng, types, "num", depth - 1)
            b = self._gen_expr(rng, types, "num", depth - 1)
            if a is None or b is None:
                return None
            from velox_tpu.functions.scalar import arith_resolver
            op = rng.choice(["plus", "minus", "multiply"])
            try:
                out_t = arith_resolver(op)([a.dtype, b.dtype])
            except Exception:
                return None
            if out_t is None:
                return None
            if op == "multiply" and (
                    a.dtype.kind is T.TypeKind.DECIMAL
                    or b.dtype.kind is T.TypeKind.DECIMAL):
                return None  # scale bookkeeping diverges from float ref
            return ex.Call(out_t, op, (a, b))
        if kind == "if":
            c = self._gen_expr(rng, types, "bool", depth - 1)
            a = self._gen_expr(rng, types, "num", 0)
            b = self._gen_expr(rng, types, "num", 0)
            if None in (c, a, b) or a.dtype != b.dtype:
                return None
            return ex.Call(a.dtype, "if", (c, a, b))
        # coalesce
        a = self._gen_expr(rng, types, "num", 0)
        b = self._gen_expr(rng, types, "num", 0)
        if a is None or b is None or a.dtype != b.dtype:
            return None
        return ex.Call(a.dtype, "coalesce", (a, b))

    def run(self, iterations: int = 50) -> int:
        """Run fuzz iterations; returns number of expressions checked."""
        from velox_tpu.exec.task import Task
        from velox_tpu.testing.plan_builder import PlanBuilder
        checked = 0
        for it in range(iterations):
            rng = random.Random(self.seed + it)
            vf = VectorFuzzer(self.seed + it, null_ratio=0.15)
            # numeric/bool columns only for the expression fuzzer
            table, types = vf.random_table(self.rows, num_cols=4)
            keep = {n: t for n, t in types.items()
                    if t.is_numeric or t.kind is T.TypeKind.BOOLEAN}
            keep = {n: t for n, t in keep.items()
                    if t.kind is not T.TypeKind.REAL}
            if not keep:
                continue
            table = table.select(list(keep))
            expr = self._gen_expr(rng, keep, rng.choice(["bool", "num"]), 3)
            if expr is None:
                continue
            plan = (PlanBuilder().values([table])
                    .project_exprs([("out", expr)]).plan())
            got = Task(plan).run().to_pandas()["out"]
            ref = RefEvaluator(table.to_pandas(), keep).eval(expr)
            self._compare(got, ref, expr, it)
            checked += 1
        return checked

    @staticmethod
    def _compare(got: pd.Series, ref: pd.Series, expr, it):
        g_null = got.isna().to_numpy()
        r_null = ref.isna().to_numpy()
        if not np.array_equal(g_null, r_null):
            raise AssertionError(
                f"[iter {it}] null mismatch for {expr}: "
                f"{int(g_null.sum())} vs {int(r_null.sum())} nulls")
        gv = got[~g_null].to_numpy()
        rv = ref[~r_null].to_numpy()
        if len(gv) == 0:
            return
        if gv.dtype == object or rv.dtype == object:
            gv = np.asarray([float(x) for x in gv])
            rv = np.asarray([float(x) for x in rv])
        if not np.allclose(gv.astype(np.float64), rv.astype(np.float64),
                           rtol=1e-9, atol=1e-9):
            bad = np.nonzero(~np.isclose(
                gv.astype(np.float64), rv.astype(np.float64)))[0][:5]
            raise AssertionError(
                f"[iter {it}] value mismatch for {expr} at {bad}: "
                f"{gv[bad]} vs {rv[bad]}")


class AggregationFuzzer:
    """Random group-by plans checked against pandas groupby.
    Parity: exec/fuzzer/AggregationFuzzer.cpp."""

    def __init__(self, seed: int = 0, rows: int = 400):
        self.seed = seed
        self.rows = rows

    def run(self, iterations: int = 20) -> int:
        from velox_tpu.exec.task import Task
        from velox_tpu.testing.plan_builder import PlanBuilder
        checked = 0
        for it in range(iterations):
            rng = np.random.RandomState(self.seed + it)
            pyr = random.Random(self.seed + it)
            n = self.rows
            df = pd.DataFrame({
                "g": rng.randint(0, pyr.choice([1, 3, 17, 120]), n)
                .astype("int64"),
                "x": rng.randint(-1000, 1000, n).astype("int64"),
                "y": rng.randn(n) * 10,
            })
            if pyr.random() < 0.3:
                df.loc[rng.rand(n) < 0.2, "x"] = None
                df["x"] = df["x"].astype("Int64")
            import pyarrow as pa
            aggs = pyr.sample(
                ["sum(x) as s", "count(x) as c", "min(x) as mn",
                 "max(x) as mx", "sum(y) as sy", "count() as call"],
                k=pyr.randint(1, 4))
            plan = (PlanBuilder().values([pa.table(df)])
                    .single_aggregation(["g"], aggs)
                    .order_by(["g"]).plan())
            got = Task(plan).run().to_pandas()
            exp = df.groupby("g")
            for a in aggs:
                name = a.split(" as ")[1]
                fn = a.split("(")[0]
                col = a.split("(")[1].split(")")[0]
                if fn == "count" and col == "":
                    r = exp.size()
                elif fn == "count":
                    r = exp[col].count()
                else:
                    r = getattr(exp[col], {"sum": "sum", "min": "min",
                                           "max": "max"}[fn])()
                gv = got[name]
                g_null = gv.isna().to_numpy()
                rv = r.to_numpy(dtype="float64", na_value=np.nan)
                # pandas sum of all-null Int64 is 0; SQL sum is NULL
                if fn in ("sum", "min", "max"):
                    cnt = exp[col].count().to_numpy()
                    rv = np.where(cnt == 0, np.nan, rv)
                if not np.array_equal(g_null, np.isnan(rv)):
                    raise AssertionError(
                        f"[iter {it}] {a}: null mismatch")
                gvv = gv.to_numpy(dtype="float64", na_value=np.nan)
                ok = np.isclose(gvv[~g_null], rv[~np.isnan(rv)],
                                rtol=1e-9)
                if not ok.all():
                    raise AssertionError(f"[iter {it}] {a}: mismatch")
            checked += 1
        return checked
