"""Serializer pages + memory pool + aggregation host-offload tests."""

import numpy as np
import pandas as pd
import pyarrow as pa

from velox_tpu.core.config import QueryConfig
from velox_tpu.exec.memory import MemoryPool, batch_nbytes
from velox_tpu.exec.task import QueryCtx, Task
from velox_tpu.serializers import PageSerde, deserialize_page, serialize_page
from velox_tpu.testing.plan_builder import PlanBuilder


def test_page_round_trip():
    df = pd.DataFrame({"a": np.arange(1000, dtype="int64"),
                       "s": np.random.RandomState(0).choice(
                           ["x", "y", "z"], 1000)})
    t = pa.table(df)
    for codec in ("none", "zlib"):
        buf = serialize_page(t, codec)
        back = deserialize_page(buf)
        assert back.equals(t)
    # checksum failure detected
    buf = bytearray(serialize_page(t, "zlib"))
    buf[40] ^= 0xFF
    try:
        deserialize_page(bytes(buf))
        assert False, "expected checksum error"
    except IOError:
        pass


def test_page_serde_device_batch():
    from velox_tpu.vector.device import from_arrow
    df = pd.DataFrame({"a": np.arange(100, dtype="int64")})
    serde = PageSerde("zlib")
    b = from_arrow(pa.table(df))
    buf = serde.serialize(b)
    back = serde.deserialize(buf)
    assert np.array_equal(
        np.asarray(back.columns["a"].data)[:100], df.a)


def test_memory_pool():
    root = MemoryPool("root")
    op = MemoryPool("op", cap_bytes=100, parent=root)
    assert op.reserve(60) and root.used == 60
    assert not op.reserve(50)  # over cap
    op.release(60)
    assert root.used == 0 and op.peak == 60


def test_aggregation_host_offload():
    rng = np.random.RandomState(2)
    dfs = [pd.DataFrame({
        "g": rng.randint(0, 50, 500).astype("int64"),
        "v": rng.randint(0, 100, 500).astype("int64")})
        for _ in range(6)]
    tables = [pa.table(d) for d in dfs]
    plan = (PlanBuilder().values(tables)
            .single_aggregation(["g"], ["sum(v) as s", "count() as c"])
            .order_by(["g"]).plan())
    # offload with a tiny compact threshold: every 2 batches spill to host
    ctx = QueryCtx({QueryConfig.AGG_HOST_OFFLOAD: True,
                    QueryConfig.AGG_COMPACT_THRESHOLD: 2})
    got = Task(plan, ctx).run().to_pandas()
    base = Task(plan).run().to_pandas()
    np.testing.assert_array_equal(got.g, base.g)
    np.testing.assert_array_equal(got.s, base.s)
    np.testing.assert_array_equal(got.c, base.c)
    exp = pd.concat(dfs).groupby("g").v.agg(["sum", "size"])
    np.testing.assert_array_equal(got.s, exp["sum"])


def test_batch_nbytes():
    from velox_tpu.vector.device import from_arrow
    b = from_arrow(pa.table({"a": np.arange(10, dtype="int64")}))
    assert batch_nbytes(b) >= 1024 * 8  # padded capacity * 8 bytes


def test_unsaferow_round_trip():
    from velox_tpu import types as T
    from velox_tpu.serializers.unsaferow import (
        deserialize_rows, serialize_rows,
    )
    rng = np.random.RandomState(3)
    df = pd.DataFrame({
        "a": rng.randint(-1000, 1000, 50).astype("int64"),
        "b": rng.randn(50),
        "s": rng.choice(["hello", "world", "x", ""], 50),
        "f": rng.rand(50) > 0.5,
    })
    df.loc[rng.rand(50) < 0.2, "a"] = None
    df["a"] = df["a"].astype("Int64")
    t = pa.table(df)
    rt = T.row(t.schema.names, [T.from_arrow(f.type) for f in t.schema])
    buf = serialize_rows(t)
    back = deserialize_rows(buf, rt)
    assert back.num_rows == 50
    for c in t.schema.names:
        av, bv = t.column(c).to_pylist(), back.column(c).to_pylist()
        for x, y in zip(av, bv):
            if x is None:
                assert y is None
            elif isinstance(x, float):
                assert abs(x - y) < 1e-12
            else:
                assert x == y


def test_compactrow_round_trip():
    from velox_tpu import types as T
    from velox_tpu.serializers.compactrow import (
        deserialize_rows, serialize_rows,
    )
    rng = np.random.RandomState(5)
    df = pd.DataFrame({
        "a": rng.randint(-100, 100, 40).astype("int32"),
        "b": rng.randn(40),
        "s": rng.choice(["aa", "", "zzz"], 40),
    })
    df.loc[rng.rand(40) < 0.25, "s"] = None
    t = pa.table(df)
    rt = T.row(t.schema.names, [T.from_arrow(f.type) for f in t.schema])
    buf = serialize_rows(t)
    back = deserialize_rows(buf, rt)
    assert back.num_rows == 40
    for c in t.schema.names:
        assert back.column(c).to_pylist() == t.column(c).to_pylist()
    # compact layout beats UnsafeRow on size
    from velox_tpu.serializers.unsaferow import serialize_rows as us
    assert len(buf) < len(us(t))


def test_try_expression():
    from velox_tpu.exec.task import Task
    from velox_tpu.testing.plan_builder import PlanBuilder
    df = pd.DataFrame({"a": np.array([10, 20, 30], "int64"),
                       "b": np.array([2, 0, 5], "int64")})
    got = Task(PlanBuilder().values([pa.table(df)])
               .project(["try(a / b) as q"]).plan()).run()
    vals = got.column("q").to_pylist()
    assert vals[0] == 5 and vals[1] is None and vals[2] == 6


def test_scan_cache():
    from velox_tpu.connectors.cache import DataCache
    from velox_tpu.connectors.tpch import TpchConnector, TpchDataSource
    cache = DataCache.instance()
    cache.clear()
    h0, m0 = cache.hits, cache.misses
    conn = TpchConnector("tpch-cache-test", scale_factor=0.001,
                         rows_per_split=2048)
    src = conn.create_data_source("orders", ["o_orderkey"], None)
    splits = conn.default_splits("orders")
    b1 = src.next(splits[0])
    src2 = conn.create_data_source("orders", ["o_orderkey"], None)
    b2 = src2.next(splits[0])
    assert cache.hits == h0 + 1 and b2 is b1  # second scan served cached
    # eviction under a tiny budget
    small = DataCache(budget_bytes=1)
    small.put(("k",), b1)  # larger than budget: not cached
    assert small.stats()["entries"] == 0


def test_unsaferow_golden_bytes():
    """Spark/Gluten wire layout (UnsafeRowFast.cpp:354): string slot packs
    (offset << 32) | size; REAL is a 4-byte float in the slot's low word."""
    import struct

    from velox_tpu import types as T
    from velox_tpu.serializers.unsaferow import serialize_rows
    t = pa.table({
        "a": pa.array([7], pa.int64()),
        "s": pa.array(["hi"], pa.string()),
        "r": pa.array([1.5], pa.float32()),
    })
    buf = serialize_rows(t)
    # frame: 4B big-endian row size
    row_size = 8 + 3 * 8 + 8  # nulls + 3 slots + padded "hi"
    assert buf[:4] == struct.pack(">i", row_size)
    row = buf[4:]
    assert row[0:8] == b"\0" * 8                      # no nulls
    assert row[8:16] == struct.pack("<q", 7)          # bigint inline
    off, size = 8 + 3 * 8, 2                          # var region start
    assert row[16:24] == struct.pack("<q", (off << 32) | size)
    assert row[24:28] == struct.pack("<f", 1.5)       # float32 low word
    assert row[28:32] == b"\0" * 4
    assert row[32:34] == b"hi"


def test_join_build_and_sort_offload():
    """Spill analogue for join builds and sort buffers: tiny budgets force
    host-RAM offload; results stay correct (velox Spiller parity)."""
    from velox_tpu.common import metrics as M
    from velox_tpu.core.config import QueryConfig as QC
    from velox_tpu.exec.task import QueryCtx, Task
    from velox_tpu.testing.plan_builder import PlanBuilder
    rng = np.random.RandomState(3)
    probe = pd.DataFrame({"pk": rng.randint(0, 50, 400).astype("int64"),
                          "pv": np.arange(400, dtype="int64")})
    build = pd.DataFrame({"bk": np.arange(50, dtype="int64"),
                          "bv": np.arange(50, dtype="int64") * 3})
    b = PlanBuilder()
    bb = b.new_builder().values([pa.table(build.iloc[:25]),
                                 pa.table(build.iloc[25:])])
    plan = (b.values([pa.table(probe)])
            .hash_join(["pk"], ["bk"], bb, output=["pk", "pv", "bv"])
            .order_by(["pk", "pv"]).plan())
    ctx = QueryCtx({QC.JOIN_BUILD_OFFLOAD_BYTES: 1,
                    QC.SORT_OFFLOAD_BYTES: 1})
    before = M.reporter().snapshot()["counters"]
    got = Task(plan, ctx).run().to_pandas()
    after = M.reporter().snapshot()["counters"]
    assert after.get(M.K_JOIN_BUILD_OFFLOADS, 0) > \
        before.get(M.K_JOIN_BUILD_OFFLOADS, 0)
    assert after.get(M.K_SORT_OFFLOADS, 0) > \
        before.get(M.K_SORT_OFFLOADS, 0)
    exp = probe.merge(build, left_on="pk", right_on="bk") \
        .sort_values(["pk", "pv"]).reset_index(drop=True)
    assert len(got) == len(exp)
    np.testing.assert_array_equal(got.bv.to_numpy(), exp.bv.to_numpy())
