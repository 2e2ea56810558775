"""Query tracing record + replay tests (parity: tool/trace replayers)."""

import numpy as np
import pandas as pd
import pyarrow as pa

from velox_tpu.core.config import QueryConfig
from velox_tpu.exec.task import QueryCtx, Task
from velox_tpu.exec.trace import load_plan, replay_operator
from velox_tpu.testing.plan_builder import PlanBuilder


def test_trace_and_replay(tmp_path):
    rng = np.random.RandomState(1)
    df = pd.DataFrame({"g": rng.randint(0, 5, 300).astype("int64"),
                       "v": rng.randint(0, 100, 300).astype("int64")})
    plan = (PlanBuilder()
            .values([pa.table(df.iloc[:150]), pa.table(df.iloc[150:])])
            .filter("v > 10")
            .single_aggregation(["g"], ["sum(v) as s", "count() as c"])
            .plan())
    agg_node_id = plan.id
    ctx = QueryCtx({
        QueryConfig.TRACE_ENABLED: True,
        QueryConfig.TRACE_DIR: str(tmp_path / "trace"),
    })
    task = Task(plan, ctx)
    original = task.run().to_pandas().sort_values("g").reset_index(drop=True)

    # the plan + the aggregation's inputs were recorded
    assert (tmp_path / "trace" / "plan.txt").exists()
    assert load_plan(str(tmp_path / "trace")).id == plan.id

    # replay ONLY the aggregation over its recorded inputs
    replayed = replay_operator(str(tmp_path / "trace"), agg_node_id) \
        .to_pandas().sort_values("g").reset_index(drop=True)
    np.testing.assert_array_equal(replayed.g, original.g)
    np.testing.assert_array_equal(replayed.s, original.s)
    np.testing.assert_array_equal(replayed.c, original.c)

    # stats rendering works
    out = task.print_plan_with_stats()
    assert "Aggregation" in out and "ms" in out
