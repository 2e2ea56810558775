"""Spark murmur3 hash() / xxhash64() bit-exact parity.

Expected values are the reference's own test vectors
(velox/functions/sparksql/tests/HashTest.cpp, XxHash64Test.cpp), which the
reference in turn validated against spark-sql CLI — required for
Gluten-compatible shuffles."""

import numpy as np
import pyarrow as pa

from velox_tpu.exec.task import Task
from velox_tpu.testing.plan_builder import PlanBuilder


def h(table, expr):
    plan = PlanBuilder().values([table]).project([f"{expr} as h"]).plan()
    return Task(plan).run().column("h").to_pylist()


def test_murmur3_int64():
    t = pa.table({"x": pa.array(
        [1, 0, -1, None, 2**63 - 1, -2**63], pa.int64())})
    assert h(t, "hash(x)") == [
        -1712319331, -1670924195, -939490007, 42,
        -1604625029, -853646085]


def test_murmur3_int32_bool():
    t = pa.table({"x": pa.array([1, 0, -1, None], pa.int32())})
    assert h(t, "hash(x)") == [-559580957, 933211791, -1604776387, 42]
    t = pa.table({"x": pa.array([True, False, None], pa.bool_())})
    assert h(t, "hash(x)") == [-559580957, 933211791, 42]


def test_murmur3_string():
    t = pa.table({"x": pa.array(
        ["Spark", "", "abcdefghijklmnopqrstuvwxyz", None, "12345678"],
        pa.string())})
    assert h(t, "hash(x)") == [
        228093765, 142593372, -1990933474, 42, 2036199019]


def test_murmur3_floats():
    t = pa.table({"x": pa.array(
        [-0.0, 0.0, 1.0, float("nan"), float("inf"), float("-inf"), None],
        pa.float64())})
    assert h(t, "hash(x)") == [
        -1670924195, -1670924195, -460888942, -1281358385,
        833680482, 461104036, 42]
    import numpy as np
    t = pa.table({"x": pa.array(
        [np.float32(-0.0), np.float32(0), np.float32(1),
         np.float32("nan"), np.float32("inf"), np.float32("-inf")],
        pa.float32())})
    assert h(t, "hash(x)") == [
        933211791, 933211791, -466301895, -349261430,
        2026854605, 427440766]


def test_murmur3_seed_chain():
    t = pa.table({"a": pa.array([None, "", None, ""], pa.string()),
                  "b": pa.array([None, None, 0, 0], pa.int32())})
    assert h(t, "hash(a, b)") == [42, 142593372, 933211791, 1143746540]


def test_xxhash64_ints():
    t = pa.table({"x": pa.array(
        [1, 0, -1, None, 2**63 - 1, -2**63], pa.int64())})
    assert h(t, "xxhash64(x)") == [
        -7001672635703045582, -5252525462095825812, 3858142552250413010,
        42, -3246596055638297850, -8619748838626508300]
    t = pa.table({"x": pa.array([1, 0, -1, None], pa.int32())})
    assert h(t, "xxhash64(x)") == [
        -6698625589789238999, 3614696996920510707,
        2017008487422258757, 42]


def test_xxhash64_string_all_tail_shapes():
    # "" (empty), 5 B (byte tail), 8 B (one word), 26 B (words + 4B + tail),
    # 34 B (>=32: the 4-lane stripe path)
    t = pa.table({"x": pa.array(
        ["Spark", "", "abcdefghijklmnopqrstuvwxyz", "12345678",
         "12345678djdejidecjjeijcneknceincne", None], pa.string())})
    assert h(t, "xxhash64(x)") == [
        -4294468057691064905, -7444071767201028348, -3265757659154784300,
        6863040065134489090, -633855189410948723, 42]


def test_xxhash64_double_and_chain():
    t = pa.table({"x": pa.array(
        [-0.0, 0.0, 1.0, float("nan"), float("inf"), float("-inf"), None],
        pa.float64())})
    assert h(t, "xxhash64(x)") == [
        -5252525462095825812, -5252525462095825812, -2162451265447482029,
        -3127944061524951246, 5810986238603807492, 5326262080505358431,
        42]
    t = pa.table({"a": pa.array([None, "", None, ""], pa.string()),
                  "b": pa.array([None, None, 0, 0], pa.int32())})
    assert h(t, "xxhash64(a, b)") == [
        42, -7444071767201028348, 3614696996920510707,
        5333022629466737987]


# ---------------------------------------------------------------------------
# Round-3 breadth batch
# ---------------------------------------------------------------------------

def _run_proj(df, exprs):
    import pyarrow as pa

    from velox_tpu.exec.task import Task
    from velox_tpu.testing.plan_builder import PlanBuilder
    return (Task(PlanBuilder().values([pa.table(df)])
                 .project(exprs).plan()).run().to_pandas())


def test_spark_date_functions():
    import pandas as pd
    df = pd.DataFrame({"d": pd.to_datetime(
        ["2020-02-15", "2021-12-31", "1999-01-01"]).date,
        "n": np.array([10, -400, 0], dtype="int64")})
    import pyarrow as pa
    t = pa.table({"d": pa.array(df.d, pa.date32()),
                  "n": pa.array(df.n, pa.int64())})
    from velox_tpu.exec.task import Task
    from velox_tpu.testing.plan_builder import PlanBuilder
    got = Task(PlanBuilder().values([t]).project([
        "date_add(d, n) as da", "date_sub(d, n) as ds",
        "unix_date(d) as ud", "weekday(d) as wd",
        "last_day(d) as ld",
        "make_date(2020, 2, 29) as md"]).plan()).run().to_pandas()
    import datetime as dtm
    assert got.da[0] == dtm.date(2020, 2, 25)
    assert got.ds[1] == dtm.date(2023, 2, 4)
    assert got.ud[2] == (dtm.date(1999, 1, 1)
                         - dtm.date(1970, 1, 1)).days
    # 2020-02-15 is a Saturday -> weekday()=5 (0=Monday)
    assert got.wd[0] == 5
    assert got.ld[0] == dtm.date(2020, 2, 29)   # leap year
    assert got.ld[1] == dtm.date(2021, 12, 31)
    assert got.md[0] == dtm.date(2020, 2, 29)


def test_spark_string_hashes_and_ascii():
    import pandas as pd
    import zlib
    df = pd.DataFrame({"s": ["hello", "", "Spark SQL"]})
    got = _run_proj(df, ["ascii(s) as a", "crc32(s) as c",
                         "md5(s) as m"])
    assert list(got.a) == [ord("h"), 0, ord("S")]
    assert list(got.c) == [zlib.crc32(b"hello"), zlib.crc32(b""),
                           zlib.crc32(b"Spark SQL")]
    import hashlib
    assert got.m[0] == hashlib.md5(b"hello").hexdigest()


def test_least_greatest_skip_nulls():
    import pandas as pd
    df = pd.DataFrame({
        "a": [1.0, None, None],
        "b": [5.0, 2.0, None],
        "c": [3.0, None, None]})
    got = _run_proj(df, ["least_skipnull(a, b, c) as lo",
                         "greatest_skipnull(a, b, c) as hi"])
    assert got.lo[0] == 1.0 and got.hi[0] == 5.0
    assert got.lo[1] == 2.0 and got.hi[1] == 2.0  # nulls skipped
    assert pd.isna(got.lo[2]) and pd.isna(got.hi[2])
