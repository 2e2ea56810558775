"""Hive connector tests: parquet write -> scan round trip, row-group
splits, column pruning, string dictionaries, filters."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from velox_tpu.connectors.hive import register_hive
from velox_tpu.exec.task import Task
from velox_tpu.testing.plan_builder import PlanBuilder


@pytest.fixture()
def hive(tmp_path):
    conn = register_hive("hive")
    conn._base = str(tmp_path)
    return conn


def sample_df(n=5000, seed=5):
    rng = np.random.RandomState(seed)
    return pd.DataFrame({
        "k": rng.randint(0, 100, n).astype("int64"),
        "v": rng.randn(n),
        "s": rng.choice(["red", "green", "blue", "cyan"], n),
        "d": np.array(rng.randint(8000, 12000, n), dtype="datetime64[D]"),
    })


def test_scan_round_trip(hive, tmp_path):
    df = sample_df()
    # write with small row groups to get multiple splits per file
    pq.write_table(pa.table(df.iloc[:3000]),
                   tmp_path / "part-0.parquet", row_group_size=1000)
    pq.write_table(pa.table(df.iloc[3000:]),
                   tmp_path / "part-1.parquet", row_group_size=1000)
    t = hive.register_table("t", str(tmp_path))
    assert len(t.splits()) == 5  # 3 + 2 row groups

    plan = (PlanBuilder()
            .table_scan("t", ["k", "v", "s"], connector_id="hive")
            .plan())
    got = Task(plan).run().to_pandas().sort_values(
        ["k", "v"]).reset_index(drop=True)
    exp = df[["k", "v", "s"]].sort_values(["k", "v"]).reset_index(drop=True)
    np.testing.assert_array_equal(got.k, exp.k)
    np.testing.assert_allclose(got.v, exp.v, rtol=1e-6)  # TPU f64 ~48 bits
    np.testing.assert_array_equal(got.s, exp.s)


def test_scan_with_filter_and_agg(hive, tmp_path):
    df = sample_df()
    pq.write_table(pa.table(df), tmp_path / "t.parquet",
                   row_group_size=1024)
    hive.register_table("t2", str(tmp_path / "t.parquet"))
    plan = (PlanBuilder()
            .table_scan("t2", ["k", "s"], connector_id="hive",
                        filter="s = 'red'")
            .single_aggregation([], ["count() as n"])
            .plan())
    got = Task(plan).run().to_pandas()
    assert got.n[0] == (df.s == "red").sum()


def test_table_writer(hive, tmp_path):
    df = sample_df(1000)
    out_path = str(tmp_path / "out" / "data.parquet")
    plan = (PlanBuilder()
            .values([pa.table(df)])
            .filter("k < 50")
            .table_write(out_path, connector_id="hive")
            .plan())
    got = Task(plan).run().to_pandas()
    assert got.rows[0] == (df.k < 50).sum()
    assert got.bytes[0] > 0
    back = pq.read_table(out_path).to_pandas()
    assert len(back) == (df.k < 50).sum()
    assert (back.k < 50).all()


def test_string_dictionary_order(hive, tmp_path):
    """Ordered string comparisons work in dictionary-id space."""
    df = sample_df(2000)
    pq.write_table(pa.table(df), tmp_path / "t.parquet")
    hive.register_table("t3", str(tmp_path / "t.parquet"))
    plan = (PlanBuilder()
            .table_scan("t3", ["s"], connector_id="hive")
            .filter("s > 'cyan'")  # green, red
            .single_aggregation([], ["count() as n"])
            .plan())
    got = Task(plan).run().to_pandas()
    assert got.n[0] == (df.s > "cyan").sum()
