"""URL + IP function families (prestosql URLFunctions.cpp /
IPAddressFunctions.h parity; IPADDRESS/IPPREFIX map to canonical-form
VARCHAR)."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from velox_tpu.exec.task import Task
from velox_tpu.testing.plan_builder import PlanBuilder


def _run(df, exprs):
    plan = (PlanBuilder()
            .values([pa.table(df)])
            .project(exprs)
            .plan())
    return Task(plan).run().to_pandas()


URLS = [
    "https://user:pw@example.com:8443/a/b%20c?x=1&y=two#frag",
    "http://velox.io/docs",
    "ftp://files.example.org:21/pub",
    "not a url at all \x00",
    "https://example.com?x=%2Fenc",
    "",
]


def test_url_extracts():
    df = pd.DataFrame({"u": URLS})
    got = _run(df, [
        "url_extract_protocol(u) as proto",
        "url_extract_host(u) as host",
        "url_extract_port(u) as port",
        "url_extract_path(u) as path",
        "url_extract_query(u) as qry",
        "url_extract_fragment(u) as frag",
    ])
    assert got.proto.tolist()[:3] == ["https", "http", "ftp"]
    assert got.host.tolist()[:3] == ["example.com", "velox.io",
                                     "files.example.org"]
    assert got.port.tolist()[:3] == [8443, np.nan, 21] or \
        (got.port[0] == 8443 and pd.isna(got.port[1]) and got.port[2] == 21)
    # path stays percent-encoded (reference UrlExtractPathFunction
    # extracts without decoding)
    assert got.path[0] == "/a/b%20c"
    assert got.qry[0] == "x=1&y=two"
    assert got.frag[0] == "frag"
    # empty/invalid urls: no scheme/host -> NULL
    assert pd.isna(got.proto[5]) and pd.isna(got.host[5])


def test_url_parameter_and_codec():
    df = pd.DataFrame({"u": URLS})
    got = _run(df, [
        "url_extract_parameter(u, 'y') as y",
        "url_extract_parameter(u, 'x') as x",
    ])
    assert got.y[0] == "two" and pd.isna(got.y[1])
    assert got.x[0] == "1" and got.x[4] == "/enc"

    df2 = pd.DataFrame({"s": ["a b&c", "100%", "plain"]})
    enc = _run(df2, ["url_encode(s) as e"])
    assert enc.e.tolist() == ["a+b%26c", "100%25", "plain"]
    dec = _run(pd.DataFrame({"s": enc.e}), ["url_decode(s) as d"])
    assert dec.d.tolist() == df2.s.tolist()


def test_ip_functions():
    df = pd.DataFrame({"ip": [
        "10.0.0.200", "192.168.1.5", "8.8.8.8",
        "2001:db8::8:800:200c:417a", "garbage",
    ]})
    got = _run(df, [
        "ip_prefix(ip, 24) as p24",
        "is_private_ip(ip) as priv",
    ])
    assert got.p24[0] == "10.0.0.0/24"
    assert got.p24[1] == "192.168.1.0/24"
    assert pd.isna(got.p24[4])
    assert bool(got.priv[0]) and bool(got.priv[1])
    assert not bool(got.priv[2])

    nets = pd.DataFrame({"n": ["10.0.0.0/8", "10.1.0.0/16",
                               "192.168.0.0/24", "bad/99"]})
    got2 = _run(nets, [
        "ip_subnet_min(n) as lo",
        "ip_subnet_max(n) as hi",
        "is_subnet_of('10.0.0.0/8', n) as in8",
    ])
    assert got2.lo.tolist()[:3] == ["10.0.0.0", "10.1.0.0",
                                    "192.168.0.0"]
    assert got2.hi[0] == "10.255.255.255"
    assert pd.isna(got2.lo[3])
    assert bool(got2.in8[0]) and bool(got2.in8[1])
    assert not bool(got2.in8[2])


def test_is_subnet_of_ip_column():
    df = pd.DataFrame({"ip": ["10.2.3.4", "11.0.0.1", "10.255.0.1"]})
    got = _run(df, ["is_subnet_of('10.0.0.0/8', ip) as s"])
    assert got.s.tolist() == [True, False, True]


JDOCS = [
    '{"a": {"b": [1, 2, 3]}, "s": "x"}',
    '[10, 20, "t", true, null]',
    '"scalar"',
    'not json',
    '[]',
]


def test_json_family_completion():
    df = pd.DataFrame({"j": JDOCS})
    got = _run(df, [
        "json_array_get(j, 1) as g1",
        "json_array_get(j, -1) as gm1",
        "json_array_contains(j, 20) as c20",
        "json_size(j, '$') as sz",
        "json_size(j, '$.a') as sza",
        "json_format(j) as fmt",
    ])
    assert pd.isna(got.g1[0]) and got.g1[1] == "20"
    assert got.gm1[1] == "null"
    assert pd.isna(got.g1[3]) and pd.isna(got.g1[4])
    assert not bool(got.c20[0]) or pd.isna(got.c20[0])
    assert bool(got.c20[1])
    assert pd.isna(got.c20[2]) and pd.isna(got.c20[3])
    assert got.sz[0] == 2 and got.sz[1] == 5 and got.sz[2] == 0
    assert pd.isna(got.sz[3])
    assert got.sza[0] == 1
    assert got.fmt[0] == '{"a":{"b":[1,2,3]},"s":"x"}'
    assert pd.isna(got.fmt[3])


def test_json_parse():
    df = pd.DataFrame({"j": ['{"a": 1,  "b":[1, 2]}', '[1,2]']})
    got = _run(df, ["json_parse(j) as p"])
    assert got.p.tolist() == ['{"a":1,"b":[1,2]}', "[1,2]"]
    import pytest as _pytest
    from velox_tpu.common.errors import VeloxError
    bad = pd.DataFrame({"j": ["{oops"]})
    with _pytest.raises(VeloxError):
        _run(bad, ["json_parse(j) as p"])
