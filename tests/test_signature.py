"""Signature DSL (parity: expression/FunctionSignature.h +
SignatureBinder.cpp — type-variable signatures bound by unification)."""

import pytest

from velox_tpu import types as T
from velox_tpu.functions.signature import sig


def test_concrete_and_mismatch():
    r = sig("bigint, varchar -> boolean")
    assert r([T.BIGINT, T.VARCHAR]) == T.BOOLEAN
    assert r([T.BIGINT, T.BIGINT]) is None
    assert r([T.BIGINT]) is None


def test_type_variable_unification():
    r = sig("array(T), T -> boolean")
    assert r([T.array(T.BIGINT), T.BIGINT]) == T.BOOLEAN
    assert r([T.array(T.BIGINT), T.VARCHAR]) is None
    r2 = sig("array(T) -> T")
    assert r2([T.array(T.DOUBLE)]) == T.DOUBLE


def test_map_and_nested():
    r = sig("map(K, V) -> array(K)")
    assert r([T.map_(T.VARCHAR, T.BIGINT)]) == T.array(T.VARCHAR)
    r2 = sig("array(array(T)) -> array(T)")
    assert r2([T.array(T.array(T.BIGINT))]) == T.array(T.BIGINT)
    assert r2([T.array(T.BIGINT)]) is None


def test_pseudo_kinds():
    r = sig("numeric, numeric -> double")
    assert r([T.INTEGER, T.decimal(10, 2)]) == T.DOUBLE
    assert r([T.VARCHAR, T.BIGINT]) is None
    r2 = sig("string -> bigint")
    assert r2([T.VARCHAR]) == T.BIGINT
    assert r2([T.VARBINARY]) == T.BIGINT


def test_decimal_variables():
    # Presto-style decimal computation: scales add on multiply
    r = sig("decimal(p1, s1), decimal(p2, s2) -> decimal(38, s1)")
    out = r([T.decimal(10, 2), T.decimal(12, 4)])
    assert out == T.decimal(38, 2)
    r2 = sig("decimal(p, s) -> decimal(p, 0)")
    assert r2([T.decimal(9, 3)]) == T.decimal(9, 0)


def test_variadic():
    r = sig("varchar... -> varchar")
    assert r([T.VARCHAR]) == T.VARCHAR
    assert r([T.VARCHAR, T.VARCHAR, T.VARCHAR]) == T.VARCHAR
    assert r([T.VARCHAR, T.BIGINT]) is None
    r2 = sig("bigint, T... -> array(T)")
    assert r2([T.BIGINT, T.DOUBLE, T.DOUBLE]) == T.array(T.DOUBLE)
    assert r2([T.BIGINT, T.DOUBLE, T.BIGINT]) is None


def test_registry_integration():
    """A sig() resolver drives overload dispatch in the live registry."""
    from velox_tpu.expression.eval import EvalValue
    from velox_tpu.functions.registry import (
        lookup, register, resolve_return_type,
    )

    def eval_fn(ctx, out_dtype, args):
        return EvalValue(args[0].data, None, out_dtype)

    register("__sig_demo", sig("array(T), bigint -> T"), eval_fn)
    assert resolve_return_type(
        "__sig_demo", [T.array(T.VARCHAR), T.BIGINT]) == T.VARCHAR
    assert lookup("__sig_demo",
                  [T.array(T.BIGINT), T.BIGINT]) is not None
    with pytest.raises(KeyError):
        lookup("__sig_demo", [T.BIGINT, T.BIGINT])
