"""ORC format support in the Hive connector: stripe-ranged splits, scan
round trips, writes, mixed parquet+ORC tables, and a non-local pyarrow
filesystem (fsspec memory) exercising the storage-adapter path.

Parity: the ORC flavor of the reference's dwio reader stack
(velox/dwio/dwrf serves ORC; dwio/common/ReaderFactory.h format dispatch)
and connectors/hive/storage_adapters/ (S3/GCS/ABFS) — here any pyarrow
FileSystem threads through the same code path the adapters use.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.orc as orc
import pyarrow.parquet as pq
import pytest

from velox_tpu.connectors.hive import register_hive
from velox_tpu.exec.task import Task
from velox_tpu.testing.plan_builder import PlanBuilder


@pytest.fixture()
def hive(tmp_path):
    return register_hive("hive")


def sample_df(n=4000, seed=11):
    rng = np.random.RandomState(seed)
    return pd.DataFrame({
        "k": rng.randint(0, 64, n).astype("int64"),
        "v": rng.randn(n),
        "s": rng.choice(["red", "green", "blue"], n),
    })


def test_orc_scan_round_trip(hive, tmp_path):
    df = sample_df()
    # small stripes -> multiple splits per file (stripe == split unit)
    orc.write_table(pa.table(df.iloc[:2500]), str(tmp_path / "a.orc"),
                    stripe_size=16 << 10)
    orc.write_table(pa.table(df.iloc[2500:]), str(tmp_path / "b.orc"),
                    stripe_size=16 << 10)
    t = hive.register_table("o1", str(tmp_path))
    assert len(t.splits()) > 2  # several stripes across the two files
    plan = (PlanBuilder()
            .table_scan("o1", ["k", "v", "s"], connector_id="hive")
            .plan())
    got = Task(plan).run().to_pandas().sort_values(
        ["k", "v"]).reset_index(drop=True)
    exp = df.sort_values(["k", "v"]).reset_index(drop=True)
    np.testing.assert_array_equal(got.k, exp.k)
    np.testing.assert_allclose(got.v, exp.v, rtol=1e-6)
    np.testing.assert_array_equal(got.s, exp.s)


def test_orc_filter_agg(hive, tmp_path):
    df = sample_df(3000)
    orc.write_table(pa.table(df), str(tmp_path / "t.orc"))
    hive.register_table("o2", str(tmp_path / "t.orc"))
    plan = (PlanBuilder()
            .table_scan("o2", ["k", "s"], connector_id="hive",
                        filter="s = 'red'")
            .single_aggregation([], ["count() as n", "sum(k) as sk"])
            .plan())
    got = Task(plan).run().to_pandas()
    assert got.n[0] == (df.s == "red").sum()
    assert got.sk[0] == df.k[df.s == "red"].sum()


def test_orc_table_writer(hive, tmp_path):
    df = sample_df(1200)
    out_path = str(tmp_path / "out" / "data.orc")
    plan = (PlanBuilder()
            .values([pa.table(df)])
            .filter("k < 32")
            .table_write(out_path, connector_id="hive")
            .plan())
    got = Task(plan).run().to_pandas()
    assert got.rows[0] == (df.k < 32).sum()
    back = orc.ORCFile(out_path).read().to_pandas()
    assert len(back) == (df.k < 32).sum()
    assert (back.k < 32).all()


def test_mixed_format_table(hive, tmp_path):
    """One table over a parquet file AND an ORC file: the split model is
    format-agnostic, per-split reads dispatch on extension."""
    df = sample_df(2000)
    pq.write_table(pa.table(df.iloc[:1000]), tmp_path / "p.parquet")
    orc.write_table(pa.table(df.iloc[1000:]), str(tmp_path / "q.orc"))
    hive.register_table("m1", str(tmp_path))
    plan = (PlanBuilder()
            .table_scan("m1", ["k"], connector_id="hive")
            .single_aggregation([], ["count() as n", "sum(k) as sk"])
            .plan())
    got = Task(plan).run().to_pandas()
    assert got.n[0] == len(df)
    assert got.sk[0] == df.k.sum()


def test_orc_split_pruning_conservative(hive, tmp_path):
    """ORC exposes no stripe stats through pyarrow: pushed-down filters
    must keep all ORC splits (no false pruning), results stay correct."""
    df = pd.DataFrame({"k": np.arange(1000, dtype="int64")})
    orc.write_table(pa.table(df), str(tmp_path / "t.orc"),
                    stripe_size=4 << 10)
    t = hive.register_table("o3", str(tmp_path / "t.orc"))
    from velox_tpu.parse.parser import parse_expression
    expr = parse_expression("k >= 900", t.row_type)
    kept = hive.prune_splits("o3", t.splits(), expr)
    assert len(kept) == len(t.splits())  # conservative: nothing dropped
    plan = (PlanBuilder()
            .table_scan("o3", ["k"], connector_id="hive", filter="k >= 900")
            .single_aggregation([], ["count() as n"])
            .plan())
    assert Task(plan).run().to_pandas().n[0] == 100


def test_orc_partitioned_write_and_scan(tmp_path):
    """Hive-partitioned ORC layout: key=value dirs, part files in ORC."""
    conn = register_hive("hive")
    df = pd.DataFrame({
        "region": ["eu", "us", "eu", "ap"] * 50,
        "v": np.arange(200, dtype="int64"),
    })
    root = str(tmp_path / "sales_orc")
    plan = (PlanBuilder().values([pa.table(df)])
            .table_write(root, partition_keys=["region"],
                         file_format="orc").plan())
    Task(plan).run()
    import glob
    files = glob.glob(root + "/region=*/part-0.orc")
    assert len(files) == 3
    conn.register_table("sales_orc", root)
    plan = (PlanBuilder()
            .table_scan("sales_orc", ["region", "v"], connector_id="hive",
                        filter="region = 'eu'")
            .single_aggregation([], ["sum(v) as sv"])
            .plan())
    got = Task(plan).run().to_pandas()
    assert got.sv[0] == df.v[df.region == "eu"].sum()


def test_fsspec_memory_filesystem_scan(tmp_path):
    """Storage-adapter machinery against a NON-local filesystem: pyarrow
    PyFileSystem over fsspec's in-memory FS drives the same fs-threaded
    code path as the S3/GCS adapters (open_input_file, get_file_info,
    FileSelector listing) without needing credentials."""
    import fsspec
    from pyarrow.fs import FSSpecHandler, PyFileSystem
    mem = fsspec.filesystem("memory")
    fs = PyFileSystem(FSSpecHandler(mem))
    df = sample_df(1500)
    buf = pa.BufferOutputStream()
    pq.write_table(pa.table(df.iloc[:700]), buf)
    mem.pipe_file("/bucket/t/a.parquet", buf.getvalue().to_pybytes())
    buf = pa.BufferOutputStream()
    orc.write_table(pa.table(df.iloc[700:]), buf)
    mem.pipe_file("/bucket/t/b.orc", buf.getvalue().to_pybytes())
    conn = register_hive("hive")
    conn.register_table("remote_t", "/bucket/t", filesystem=fs)
    plan = (PlanBuilder()
            .table_scan("remote_t", ["k", "v"], connector_id="hive")
            .single_aggregation([], ["count() as n"])
            .plan())
    got = Task(plan).run().to_pandas()
    assert got.n[0] == len(df)
