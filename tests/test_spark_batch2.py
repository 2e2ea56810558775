import datetime as dt
import numpy as np
import pandas as pd
import pyarrow as pa
from velox_tpu.exec.task import Task
from velox_tpu.testing.plan_builder import PlanBuilder


def run_proj(t, exprs):
    return Task(PlanBuilder().values([t]).project(exprs).plan()).run()


def test_string_batch2():
    t = pa.table({"s": pa.array(["hello world", "FOO bar", "", "a,b,c"])})
    out = run_proj(t, [
        "initcap(s) as ic", "lpad(s, 5, '*') as lp", "rpad(s, 5) as rp",
        "levenshtein(s, 'hello') as lv",
        "translate(s, 'lo', 'x') as tr",
        "locate('o', s) as lc", "substring_index(s, ' ', 1) as si",
        "repeat(s, 2) as rp2", "overlay(s, 'XY', 2) as ov",
        "soundex(s) as sx", "hex(s) as hx",
    ]).to_pandas()
    assert out.ic[0] == "Hello World" and out.ic[1] == "Foo Bar"
    assert out.lp[0] == "hello" and out.lp[2] == "*****"
    assert out.rp[1] == "FOO b" and out.rp[2] == "     "
    assert out.lv[0] == 6 and out.lv[2] == 5
    assert out.tr[0] == "hexx wrxd"  # l->x, o deleted... 
    assert out.lc[0] == 5 and out.lc[2] == 0
    assert out.si[0] == "hello" and out.si[2] == ""
    assert out.rp2[2] == "" and out.rp2[1] == "FOO barFOO bar"
    assert out.ov[0] == "hXYlo world"
    assert out.sx[0] == "H464"
    assert out.hx[2] == ""


def test_find_in_set_unhex():
    t = pa.table({"s": pa.array(["b", "d", "a,b"])})
    out = run_proj(t, ["find_in_set(s, 'a,b,c') as f",
                       "unhex(s) as u"]).to_pandas()
    assert list(out.f) == [2, 0, 0]
    assert out.u.isna().all()  # none are valid hex... 'b' invalid, 'd' invalid


def test_bitwise_factorial():
    t = pa.table({"x": pa.array([0, 1, 255, -1, 20], pa.int64())})
    out = run_proj(t, ["bit_count(x) as bc", "bit_get(x, 0) as bg",
                       "factorial(x) as fa"]).to_pandas()
    assert list(out.bc) == [0, 1, 8, 64, 2]
    assert list(out.bg) == [0, 1, 1, 1, 0]
    assert out.fa[2] is None or np.isnan(out.fa[2])  # 255 out of range -> NULL
    assert out.fa[4] == 2432902008176640000


def test_dates_batch2():
    days = [(dt.date(2024, 2, 29) - dt.date(1970, 1, 1)).days,
            (dt.date(2024, 3, 15) - dt.date(1970, 1, 1)).days]
    t = pa.table({"d": pa.array(days, pa.int32()).cast(pa.date32()),
                  "e": pa.array([days[1], days[0]], pa.int32()).cast(pa.date32())})
    out = run_proj(t, ["next_day(d, 'Mon') as nd",
                       "months_between(d, e) as mb"]).to_pandas()
    assert out.nd[0] == dt.date(2024, 3, 4)   # next Monday after Thu feb 29
    # spark months_between(2024-02-29, 2024-03-15) = -1 + (29-15)/31
    assert abs(out.mb[0] - (-1 + 14 / 31.0)) < 1e-9
    assert abs(out.mb[1] - (1 - 14 / 31.0)) < 1e-9


def test_unix_timestamp():
    t = pa.table({"ts": pa.array([dt.datetime(2020, 1, 1, 0, 0, 30)],
                                 pa.timestamp("us"))})
    out = run_proj(t, ["unix_timestamp(ts) as u"]).to_pandas()
    assert out.u[0] == 1577836830
