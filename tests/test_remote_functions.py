"""Remote scalar function SPI (functions/remote.py).

Parity: velox/functions/remote — batches page-serialized to a function
server; the LoopbackTransport exercises the full wire path in-process."""

import numpy as np
import pyarrow as pa
import pytest

from velox_tpu.exec.task import Task
from velox_tpu.functions.remote import (
    LoopbackTransport, register_remote_function,
)
from velox_tpu.testing.plan_builder import PlanBuilder
from velox_tpu import types as T


def test_remote_function_end_to_end():
    transport = LoopbackTransport()

    def hypot(a, b, valid):
        return np.sqrt(a * a + b * b), valid

    transport.serve("rhypot", hypot)
    register_remote_function("rhypot", [T.DOUBLE, T.DOUBLE], T.DOUBLE,
                             transport)
    t = pa.table({"x": pa.array([3.0, 6.0, None], pa.float64()),
                  "y": pa.array([4.0, 8.0, 1.0], pa.float64())})
    plan = (PlanBuilder().values([t])
            .project(["rhypot(x, y) as h", "x"]).plan())
    out = Task(plan).run()
    assert out.column("h").to_pylist() == [5.0, 10.0, None]


def test_remote_function_composes_with_local():
    transport = LoopbackTransport()
    transport.serve("rdouble", lambda a, valid: (a * 2, valid))
    register_remote_function("rdouble", [T.BIGINT], T.BIGINT, transport)
    t = pa.table({"x": pa.array([1, 2, 3], pa.int64())})
    plan = (PlanBuilder().values([t])
            .project(["rdouble(x) + 1 as r"])
            .filter("r > 3").plan())
    out = Task(plan).run()
    assert sorted(out.column("r").to_pylist()) == [5, 7]


def test_remote_function_rejects_strings():
    with pytest.raises(NotImplementedError):
        register_remote_function("rbad", [T.VARCHAR], T.BIGINT,
                                 LoopbackTransport())
