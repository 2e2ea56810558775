"""Write a partitioned parquet table, scan it back with pruning.

Parity: velox hive connector examples (partitioned writes +
row-group-stats split skipping).
"""
import tempfile

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np
import pandas as pd
import pyarrow as pa

from velox_tpu.connectors.hive import register_hive
from velox_tpu.exec.task import Task
from velox_tpu.testing.plan_builder import PlanBuilder

conn = register_hive()
root = tempfile.mkdtemp() + "/sales"
df = pd.DataFrame({
    "region": np.random.choice(["eu", "us"], 1000),
    "amount": np.random.randint(0, 500, 1000).astype("int64"),
})
Task(PlanBuilder().values([pa.table(df)])
     .table_write(root, partition_keys=["region"]).plan()).run()

conn.register_table("sales", root)
plan = (PlanBuilder()
        .table_scan("sales", ["region", "amount"],
                    connector_id="hive", filter="region = 'eu' and amount > 250")
        .single_aggregation(["region"], ["sum(amount) as s",
                                         "count(*) as n"])
        .plan())
print(Task(plan).run().to_pandas())
