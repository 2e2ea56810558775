"""Checked-arithmetic error semantics: TRY + deferred per-batch error
counts raised by the Task (parity: velox TryExpr.h + checked Arithmetic.h
+ Task::setError)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from velox_tpu.common.errors import VeloxUserError
from velox_tpu.exec.task import Task
from velox_tpu.testing.plan_builder import PlanBuilder


def run(plan):
    return Task(plan).run()


def test_divide_by_zero_raises():
    df = pd.DataFrame({"a": np.array([10, 20], "int64"),
                       "b": np.array([2, 0], "int64")})
    plan = (PlanBuilder().values([pa.table(df)])
            .project(["a / b as q"]).plan())
    with pytest.raises(VeloxUserError, match="checked operation"):
        run(plan)


def test_try_suppresses_divide_by_zero():
    df = pd.DataFrame({"a": np.array([10, 20, 30], "int64"),
                       "b": np.array([2, 0, 5], "int64")})
    plan = (PlanBuilder().values([pa.table(df)])
            .project(["try(a / b) as q"]).plan())
    got = run(plan).column("q").to_pylist()
    assert got == [5, None, 6]


def test_modulus_by_zero_raises():
    df = pd.DataFrame({"a": np.array([10], "int64"),
                       "b": np.array([0], "int64")})
    plan = (PlanBuilder().values([pa.table(df)])
            .project(["a % b as q"]).plan())
    with pytest.raises(VeloxUserError):
        run(plan)


def test_bigint_overflow_raises_and_try_nulls():
    big = (1 << 62) + 11
    df = pd.DataFrame({"a": np.array([big, 5], "int64"),
                       "b": np.array([big, 7], "int64")})
    plan = (PlanBuilder().values([pa.table(df)])
            .project(["a + b as s"]).plan())
    with pytest.raises(VeloxUserError):
        run(plan)
    plan2 = (PlanBuilder().values([pa.table(df)])
             .project(["try(a + b) as s"]).plan())
    got = run(plan2).column("s").to_pylist()
    assert got == [None, 12]
    # multiply overflow
    plan3 = (PlanBuilder().values([pa.table(df)])
             .project(["try(a * b) as m"]).plan())
    got = run(plan3).column("m").to_pylist()
    assert got == [None, 35]


def test_filtered_rows_do_not_raise():
    """Errors in PROJECTIONS of rows removed by the same superstep's
    filter must not raise (velox FilterProject semantics)."""
    df = pd.DataFrame({"a": np.array([10, 20], "int64"),
                       "b": np.array([2, 0], "int64")})
    plan = (PlanBuilder().values([pa.table(df)])
            .filter("b > 0")
            .project(["a / b as q"]).plan())
    got = run(plan).column("q").to_pylist()
    assert got == [5]


def test_error_in_aggregation_input_raises():
    df = pd.DataFrame({"k": np.array([1, 1, 2], "int64"),
                       "a": np.array([10, 20, 30], "int64"),
                       "b": np.array([2, 0, 5], "int64")})
    plan = (PlanBuilder().values([pa.table(df)])
            .single_aggregation(["k"], ["sum(a / b) as s"]).plan())
    with pytest.raises(VeloxUserError):
        run(plan)
    plan2 = (PlanBuilder().values([pa.table(df)])
             .single_aggregation(["k"], ["sum(try(a / b)) as s"]).plan())
    got = Task(plan2).run().to_pandas().sort_values("k")
    np.testing.assert_array_equal(got.s, [5, 6])
