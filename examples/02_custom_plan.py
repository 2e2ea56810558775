"""Build and run an ad-hoc plan with PlanBuilder.

Parity: velox/examples/OperatorExtensibility-adjacent usage of the test
PlanBuilder (exec/tests/utils/PlanBuilder.h).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_enable_x64", True)

import pyarrow as pa

from velox_tpu.exec.task import Task
from velox_tpu.testing.plan_builder import PlanBuilder

orders = pa.table({
    "o_id": pa.array([1, 2, 3, 4], pa.int64()),
    "cust": pa.array(["a", "b", "a", "c"], pa.string()),
    "total": pa.array([10.0, 22.5, 7.0, 99.0], pa.float64()),
})
plan = (PlanBuilder()
        .values([orders])
        .filter("total > 8.0")
        .single_aggregation(["cust"], ["sum(total) as spend",
                                       "count(*) as n"])
        .order_by(["spend desc"])
        .plan())
print(Task(plan).run().to_pandas())
