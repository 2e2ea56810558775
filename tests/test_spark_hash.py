"""Spark murmur3 hash() / xxhash64() bit-exact parity.

Expected values are the reference's own test vectors
(velox/functions/sparksql/tests/HashTest.cpp, XxHash64Test.cpp), which the
reference in turn validated against spark-sql CLI — required for
Gluten-compatible shuffles."""

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
