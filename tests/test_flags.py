"""Process-flag tier (common/flags.py).
Parity: velox/flag_definitions/flags.cpp — process gflags below
QueryConfig and connector session properties."""

import os

import pytest

from velox_tpu.common import flags as F


def test_default_and_env_resolution(monkeypatch):
    F.define_flag("t_alpha", 42, "test flag", int)
    assert F.get_flag("t_alpha") == 42
    F.define_flag("t_beta", False, "test flag", bool)
    monkeypatch.setenv("VELOX_TPU_T_BETA", "true")
    F.reset_flag("t_beta")
    assert F.get_flag("t_beta") is True
    monkeypatch.setenv("VELOX_TPU_T_BETA", "0")
    F.reset_flag("t_beta")
    assert F.get_flag("t_beta") is False


def test_set_overrides_env(monkeypatch):
    F.define_flag("t_gamma", "a", "test flag", str)
    monkeypatch.setenv("VELOX_TPU_T_GAMMA", "from_env")
    F.reset_flag("t_gamma")
    assert F.get_flag("t_gamma") == "from_env"
    F.set_flag("t_gamma", "explicit")
    assert F.get_flag("t_gamma") == "explicit"
    F.reset_flag("t_gamma")


def test_redefinition_is_idempotent():
    F.define_flag("dbgen_threads", 99, "different", int)  # ignored
    assert "dbgen_threads" in F.all_flags()
    # first definition wins (default 0)
    F.reset_flag("dbgen_threads")
    os.environ.pop("VELOX_TPU_DBGEN_THREADS", None)
    assert F.get_flag("dbgen_threads") == 0


def test_dbgen_threads_flag_reaches_native(monkeypatch):
    from velox_tpu.connectors import tpch_native as N
    monkeypatch.setenv("VELOX_TPU_DBGEN_THREADS", "2")
    assert N._nthreads() == 2
    monkeypatch.delenv("VELOX_TPU_DBGEN_THREADS")
    assert N._nthreads() == 0
