"""Run a TPC-H query end to end.

Parity: velox/examples + velox/benchmarks/tpch/TpchBenchmark.cpp usage.
Works on any backend; set JAX_PLATFORMS=cpu for the virtual CPU mesh.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_enable_x64", True)

from velox_tpu.connectors.tpch import register_tpch
from velox_tpu.exec.task import Task
from velox_tpu.tpch import tpch_plan

register_tpch(0.01)                    # scale factor (SF1 = 6M lineitem)
task = Task(tpch_plan(6))
print(task.run().to_pandas())
print(task.print_plan_with_stats())
