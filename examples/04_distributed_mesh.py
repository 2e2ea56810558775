"""Distributed execution over a device mesh.

Run with a virtual 8-device CPU mesh:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python examples/04_distributed_mesh.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_enable_x64", True)

from velox_tpu.connectors.connector import register_connector
from velox_tpu.connectors.tpch import TpchConnector
from velox_tpu.parallel import DistributedTask, make_mesh
from velox_tpu.testing.plan_builder import PlanBuilder

register_connector(TpchConnector("tpch-d", scale_factor=0.01,
                                 rows_per_split=16384))
plan = (PlanBuilder()
        .table_scan("lineitem", ["l_returnflag", "l_quantity"],
                    connector_id="tpch-d")
        .single_aggregation(["l_returnflag"], ["sum(l_quantity) as q",
                                               "count(*) as n"])
        .plan())
print(DistributedTask(plan, make_mesh()).run().to_pandas())
