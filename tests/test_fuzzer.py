"""Fuzzer runs as part of the suite (deterministic seeds).

Parity: the reference runs its fuzzers in CI with fixed iteration budgets
(docs/develop/testing/fuzzer.rst)."""

from velox_tpu.testing.fuzzer import (
    AggregationFuzzer, ExpressionFuzzer, VectorFuzzer,
)


def test_vector_fuzzer_roundtrip():
    """Fuzzed tables survive the host->device->host round trip."""
    import numpy as np
    import pandas as pd
    from velox_tpu.vector.device import from_arrow, to_arrow
    for seed in range(5):
        vf = VectorFuzzer(seed)
        table, types = vf.random_table(100)
        back = to_arrow(from_arrow(table))
        assert back.num_rows == table.num_rows
        for c in table.schema.names:
            a = table.column(c).to_pandas()
            b = back.column(c).to_pandas()
            na, nb = a.isna().to_numpy(), b.isna().to_numpy()
            np.testing.assert_array_equal(na, nb, err_msg=f"{seed}:{c}")
            av, bv = a[~na], b[~nb]
            if len(av):
                if av.dtype == object:
                    assert list(map(str, av)) == list(map(str, bv))
                else:
                    np.testing.assert_allclose(
                        av.astype("float64"), bv.astype("float64"),
                        rtol=1e-6)


def test_expression_fuzzer():
    checked = ExpressionFuzzer(seed=42, rows=150).run(iterations=30)
    assert checked >= 15  # most iterations yield a valid expression


def test_aggregation_fuzzer():
    checked = AggregationFuzzer(seed=7, rows=300).run(iterations=12)
    assert checked == 12


def test_plan_fuzzer_vs_sqlite():
    """Random filter/project/aggregate plans row-compared against SQLite
    (testing/plan_fuzzer.py; parity: velox exec fuzzers)."""
    from velox_tpu.testing.plan_fuzzer import run_many
    results = run_many(range(20))
    assert len(results) == 20
