"""Disk tier below host-RAM offload (exec/memory.py DiskBatch).

Parity: velox Spiller writing spill files (exec/Spiller.h:29-92) — a
join build / sort state larger than the host-RAM budget completes by
round-tripping through spill files instead of dying.
"""
import glob
import os

import jax.numpy as jnp
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from velox_tpu.common import metrics as M
from velox_tpu.core.config import QueryConfig as QC
from velox_tpu.exec.memory import DiskBatch, HostBatch, OffloadBuffer
from velox_tpu.exec.task import QueryCtx, Task
from velox_tpu.testing.plan_builder import PlanBuilder
from velox_tpu.vector.device import from_arrow, to_arrow


def _batch(seed, n=1000):
    rng = np.random.RandomState(seed)
    return from_arrow(pa.table({
        "k": rng.randint(0, 50, n).astype("int64"),
        "v": rng.rand(n),
        "s": pa.array([f"row-{i}" for i in range(n)]),
    }))


def test_host_batch_preserves_children():
    """HostBatch round-trips the full pytree: raw-string lens and
    long-decimal limbs survive the offload (the columns-only mirror
    dropped them)."""
    import decimal
    t = pa.table({
        "d": pa.array([decimal.Decimal("12345678901234567890.12")] * 3,
                      pa.decimal128(38, 2)),
        "s": pa.array(["alpha", "beta", "gamma"]),
    })
    b = from_arrow(t, 4, string_encoding="raw")
    restored = HostBatch(b).restore()
    out = to_arrow(restored)
    assert out.column("d").to_pylist() == t.column("d").to_pylist()
    assert out.column("s").to_pylist() == t.column("s").to_pylist()


def test_disk_batch_roundtrip(tmp_path):
    b = _batch(0)
    d = DiskBatch(HostBatch(b), str(tmp_path))
    assert glob.glob(str(tmp_path / "spill-*"))
    out = to_arrow(d.restore())
    exp = to_arrow(b)
    assert out.equals(exp)
    assert not glob.glob(str(tmp_path / "spill-*"))  # deleted on restore


def test_offload_buffer_three_tiers(tmp_path):
    """device budget 0 -> everything offloads; host budget of ~2 batches
    pushes the oldest to disk; restore_all returns every batch in
    insertion order across all three tiers."""
    batches = [_batch(i) for i in range(5)]
    nbytes = HostBatch(batches[0]).nbytes
    buf = OffloadBuffer(0, host_budget_bytes=2 * nbytes + 1,
                        spill_dir=str(tmp_path))
    for b in batches:
        buf.add(b)
    assert len(buf._disk) == 3 and len(buf._host) == 2
    assert len(glob.glob(str(tmp_path / "spill-*.npz"))) == 3
    out = buf.restore_all()
    assert len(out) == 5
    # insertion order: device([]) + host(last 2) + disk(first 3) — the
    # CONTENTS must be exactly the five batches (order of restore lists
    # host then disk)
    outs = {to_arrow(b).column("k")[0].as_py() for b in out}
    exps = {to_arrow(b).column("k")[0].as_py() for b in batches}
    assert outs == exps
    assert not glob.glob(str(tmp_path / "spill-*"))


def test_join_build_larger_than_host_budget(tmp_path):
    """End-to-end: a hash-join build forced through the disk tier (HBM
    budget 0, tiny host budget) still answers correctly."""
    rng = np.random.RandomState(3)
    probe = pd.DataFrame({
        "pk": rng.randint(0, 200, 400).astype("int64"),
        "pv": rng.randint(0, 100, 400).astype("int64")})
    build = pd.DataFrame({
        "bk": np.arange(200, dtype="int64"),
        "bv": np.arange(200, dtype="int64") * 3})
    before = M.snapshot().get(M.K_SPILL_DISK_WRITES, 0) \
        if hasattr(M, "snapshot") else 0
    b = PlanBuilder()
    bb = b.new_builder().values(
        [pa.table(build.iloc[i::4]) for i in range(4)])
    plan = (b.values([pa.table(probe)])
            .hash_join(["pk"], ["bk"], bb, output=["pk", "pv", "bv"])
            .plan())
    ctx = QueryCtx({QC.JOIN_BUILD_OFFLOAD_BYTES: 0,
                    QC.OFFLOAD_HOST_BUDGET_BYTES: 1,
                    QC.SPILL_DIR: str(tmp_path)})
    got = Task(plan, ctx).run().to_pandas()
    exp = probe.merge(build, left_on="pk", right_on="bk")
    assert len(got) == len(exp)
    g = got.sort_values(["pk", "pv"]).reset_index(drop=True)
    e = exp[["pk", "pv", "bv"]].sort_values(["pk", "pv"]) \
        .reset_index(drop=True)
    np.testing.assert_array_equal(g.bv.to_numpy(), e.bv.to_numpy())
    # files cleaned up after the build consumed them
    assert not glob.glob(str(tmp_path / "spill-*"))


def test_orderby_through_disk_tier(tmp_path):
    rng = np.random.RandomState(9)
    dfs = [pd.DataFrame({"x": rng.permutation(500).astype("int64")})
           for _ in range(3)]
    plan = (PlanBuilder()
            .values([pa.table(d) for d in dfs])
            .order_by(["x"])
            .plan())
    ctx = QueryCtx({QC.SORT_OFFLOAD_BYTES: 0,
                    QC.OFFLOAD_HOST_BUDGET_BYTES: 1,
                    QC.SPILL_DIR: str(tmp_path)})
    got = Task(plan, ctx).run().to_pandas()
    assert got.x.is_monotonic_increasing and len(got) == 1500
