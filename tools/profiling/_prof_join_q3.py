"""Decompose Q3's big join probe (join[5]) on the real chip.

Builds the orders-semi-customer table, takes one lineitem probe batch,
then times: array-mode lookup alone, perm lookup, each build-column
gather, and the full fast-path program.
"""
import time

import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

from velox_tpu.connectors.tpch import register_tpch
from velox_tpu.exec.task import Task
from velox_tpu.tpch import tpch_plan
from velox_tpu.core import plan as P

register_tpch(1.0, rows_per_split=1 << 21)

plan = tpch_plan(3)


def find_joins(node, out):
    if isinstance(node, P.HashJoinNode):
        out.append(node)
    for ch in (getattr(node, "source", None), getattr(node, "left", None),
               getattr(node, "right", None)):
        if ch is not None:
            find_joins(ch, out)
    return out


joins = find_joins(plan, [])
big = [j for j in joins if j.left_keys[0].name == "l_orderkey"][0]
print("join type:", big.join_type, "keys:", [k.name for k in big.left_keys])

from velox_tpu.exec.join import array_join_range, HashBuildStage, \
    HashJoinOperator
rng = array_join_range(big)
print("array_join_range:", rng)

# build side batches (run the right subtree through a Task)
t = Task(big.right)
right_out = list(t.batches())
stage = HashBuildStage(big.right_keys, array_range=rng)
for b in right_out:
    stage.add_input(b)
bt = stage.finish()
jax.block_until_ready(bt.sorted_key)
print("built. arr mode:", bt.arr_start is not None,
      "build cap:", bt.batch.capacity)

# probe batches: run the left subtree
t2 = Task(big.left)
left_out = list(t2.batches())
print("probe batches:", len(left_out), "caps:",
      [b.capacity for b in left_out])

op = HashJoinOperator(big)
op.set_built_table(bt)

batch = left_out[0]


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best*1e3:.1f} ms")
    return out


lookup = jax.jit(lambda b, t: op._lookup(b, t))
probe_ok, loc, counts, hit = timeit("lookup(arr gathers)", lookup, batch, bt)

first_row = jax.jit(lambda t, l: op._first_build_row(t, l))
build_row = timeit("first_build_row (perm gather)", first_row, bt, loc)

gather = jax.jit(lambda bb, br, h: op._gather_build_cols(bb, br, None))
timeit("gather_build_cols", gather, bt.batch, build_row, hit)

fast = jax.jit(op._probe_fast)
timeit("full fast path", fast, batch, bt)

# all 4 batches through the operator (as the Task would)
t0 = time.perf_counter()
outs = []
for b in left_out:
    o, _ = op._fast_fn(b, bt)
    outs.append(o)
jax.block_until_ready([o.mask for o in outs])
print(f"all {len(left_out)} batches via _fast_fn: "
      f"{time.perf_counter()-t0:.3f} s")
