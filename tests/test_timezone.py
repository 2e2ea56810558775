"""IANA time zone functions (at_timezone / timezone_hour / timezone_minute)
validated against Python's zoneinfo across DST transitions.

Parity: velox/type/tz/TimeZoneMap.h + prestosql datetime zone functions —
TZif transition tables baked as device arrays (functions/datetime.py)."""

import datetime as dt
from zoneinfo import ZoneInfo

import pyarrow as pa

from velox_tpu.exec.task import Task
from velox_tpu.testing.plan_builder import PlanBuilder

INSTANTS = [
    dt.datetime(2024, 1, 15, 12, 0, tzinfo=dt.timezone.utc),
    dt.datetime(2024, 7, 15, 12, 0, tzinfo=dt.timezone.utc),
    # one second either side of the US spring-forward transition
    dt.datetime(2024, 3, 10, 9, 59, 59, tzinfo=dt.timezone.utc),
    dt.datetime(2024, 3, 10, 10, 0, 1, tzinfo=dt.timezone.utc),
    dt.datetime(1970, 1, 1, tzinfo=dt.timezone.utc),
    dt.datetime(2030, 6, 1, tzinfo=dt.timezone.utc),
]

ZONES = ["America/Los_Angeles", "Asia/Kolkata", "UTC", "Europe/Berlin",
         "Australia/Sydney", "Pacific/Marquesas"]  # incl. -9:30 offset


def test_tz_functions_vs_zoneinfo():
    micros = [int(i.timestamp() * 1_000_000) for i in INSTANTS]
    t = pa.table({"ts": pa.array(micros, pa.timestamp("us"))})
    for zone in ZONES:
        plan = (PlanBuilder().values([t])
                .project([f"at_timezone(ts, '{zone}') as lt",
                          f"timezone_hour(ts, '{zone}') as th",
                          f"timezone_minute(ts, '{zone}') as tm"]).plan())
        out = Task(plan).run()
        for inst, lt, th, tm in zip(INSTANTS,
                                    out.column("lt").to_pylist(),
                                    out.column("th").to_pylist(),
                                    out.column("tm").to_pylist()):
            loc = inst.astimezone(ZoneInfo(zone))
            off = int(loc.utcoffset().total_seconds())
            want = inst.replace(tzinfo=None) + dt.timedelta(seconds=off)
            assert lt.replace(tzinfo=None) == want, (zone, inst)
            sign = -1 if off < 0 else 1
            assert th == sign * (abs(off) // 3600), (zone, inst, th)
            assert tm == sign * ((abs(off) % 3600) // 60), (zone, inst, tm)


def test_tz_unknown_zone_raises():
    import pytest
    t = pa.table({"ts": pa.array([0], pa.timestamp("us"))})
    plan = (PlanBuilder().values([t])
            .project(["at_timezone(ts, 'Not/AZone') as x"]).plan())
    with pytest.raises(Exception):
        Task(plan).run()
