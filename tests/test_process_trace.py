"""Thread-state tracing (parity: common/process/TraceContext.h:54
statusLine + TraceHistory ring buffer)."""

import threading
import time

import numpy as np
import pyarrow as pa

from velox_tpu.common.process_trace import (TraceContext, recent,
                                            status_lines)


def test_status_line_and_history():
    seen = []
    gate = threading.Event()
    done = threading.Event()

    def work():
        with TraceContext("HashJoin[3] add_input"):
            gate.set()
            done.wait(5)

    t = threading.Thread(target=work, name="driver-1")
    t.start()
    gate.wait(5)
    lines = status_lines()
    assert any("HashJoin[3] add_input" in ln and "driver-1" in ln
               for ln in lines), lines
    done.set()
    t.join()
    assert not any("HashJoin[3]" in ln for ln in status_lines())
    hist = recent(t.ident)
    assert any("HashJoin[3] add_input" in h for h in hist)


def test_task_driver_emits_spans():
    """Operator phases appear in the thread history after a query."""
    from velox_tpu.exec.task import Task
    from velox_tpu.testing.plan_builder import PlanBuilder
    df = pa.table({"x": np.arange(100, dtype="int64")})
    Task(PlanBuilder().values([df])
         .single_aggregation([], ["sum(x) as s"]).plan()).run()
    hist = recent()
    assert any("finish" in h for h in hist), hist
