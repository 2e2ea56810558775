"""segmented_reduce_sorted float-sum semantics.

The float sum must stay correct across the cases that kill cheaper
formulations: group mixing (a global cumsum-difference absorbs small
groups after huge ones), negatives, f32, huge/tiny magnitudes, and
non-finite values (IEEE inf/nan propagation per group).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from velox_tpu.ops.wide import segmented_reduce_sorted


def _run(values, group_sizes, combine="sum", dtype=np.float64, cap=None):
    """Rows pre-sorted by group; returns dense per-group results."""
    values = np.asarray(values, dtype)
    n = len(values)
    cap = cap or n
    gid = np.repeat(np.arange(len(group_sizes)), group_sizes)
    assert len(gid) == n
    boundary = np.zeros(n, bool)
    boundary[np.cumsum([0] + list(group_sizes[:-1]))] = True
    active = np.ones(cap, bool)
    if cap > n:
        # engine contract: inactive rows trail as their own run (the
        # active bit is the most significant sort word), carrying the
        # combine identity
        ident = 0.0 if combine == "sum" else np.inf
        values = np.concatenate([values, np.full(cap - n, ident, dtype)])
        gid = np.concatenate(
            [gid, np.full(cap - n, gid[-1] + 1, np.int32)])
        pad_b = np.zeros(cap - n, bool)
        pad_b[0] = True
        boundary = np.concatenate([boundary, pad_b])
        active[n:] = False
    out = jax.jit(segmented_reduce_sorted, static_argnums=(4, 5))(
        jnp.asarray(values), jnp.asarray(gid.astype(np.int32)),
        jnp.asarray(boundary), jnp.asarray(active), cap, combine)
    return np.asarray(out)[:len(group_sizes)]


def test_float_sum_basic():
    vals = [1.5, 2.5, 3.0, -1.0, 10.0]
    got = _run(vals, [2, 2, 1])
    # implementations may round a few times at the end: ulp tolerance
    np.testing.assert_allclose(got, [4.0, 2.0, 10.0], rtol=1e-14)


def test_float_sum_random_exact():
    rng = np.random.RandomState(7)
    sizes = rng.randint(1, 50, 200)
    vals = rng.uniform(-1e4, 1e4, sizes.sum())
    got = _run(vals, sizes)
    expect = [s.sum() for s in np.split(vals, np.cumsum(sizes)[:-1])]
    np.testing.assert_allclose(got, expect, rtol=1e-14)


def test_float_sum_group_mixing():
    """A huge group must not absorb the small groups that follow it
    (the cumsum-difference pathology)."""
    got = _run([2e18, 5.0, 7.0], [1, 1, 1])
    np.testing.assert_array_equal(got, [2e18, 5.0, 7.0])


def test_float_sum_huge_magnitudes():
    """Values beyond f32's exponent range must not overflow any internal
    f32 staging."""
    got = _run([2e300, 1e290, -2e300], [1, 1, 1])
    np.testing.assert_array_equal(got, [2e300, 1e290, -2e300])


def test_float_sum_extreme_dynamic_range():
    """Groups must never mix: a tiny group is exact even when another
    group holds values 2^100 larger (the segmented scan reduces each
    run independently)."""
    got = _run([2.0 ** 80, 5.0, 2.0 ** -20], [1, 1, 1])
    np.testing.assert_array_equal(got, [2.0 ** 80, 5.0, 2.0 ** -20])


def test_float_sum_tiny_magnitudes():
    got = _run([3e-300, 2e-300, -1e-300], [2, 1])
    np.testing.assert_allclose(got, [5e-300, -1e-300], rtol=1e-14)


def test_float_sum_nonfinite():
    got = _run([np.inf, 3.0, 1.0, -np.inf, np.inf, -np.inf, 2.0],
               [2, 2, 2, 1])
    assert got[0] == np.inf
    assert got[1] == -np.inf
    assert np.isnan(got[2])
    assert got[3] == 2.0


def test_float_sum_f32():
    vals = np.asarray([0.5, 0.25, 8.0, -1.5], np.float32)
    got = _run(vals, [2, 2], dtype=np.float32)
    np.testing.assert_array_equal(got, np.asarray([0.75, 6.5], np.float32))


def test_float_sum_zeros_and_padding():
    got = _run([0.0, 0.0, 1.25], [2, 1], cap=8)
    np.testing.assert_array_equal(got, [0.0, 1.25])


def test_float_sum_negative_cancellation():
    vals = [1e10, -1e10, 1.0, 2.0]
    got = _run(vals, [3, 1])
    np.testing.assert_array_equal(got, [1.0, 2.0])


@pytest.mark.parametrize("combine", ["min", "max"])
def test_minmax_unchanged(combine):
    rng = np.random.RandomState(3)
    sizes = rng.randint(1, 20, 50)
    vals = rng.uniform(-100, 100, sizes.sum())
    got = _run(vals, sizes, combine=combine)
    op = np.min if combine == "min" else np.max
    expect = [op(s) for s in np.split(vals, np.cumsum(sizes)[:-1])]
    np.testing.assert_array_equal(got, expect)


def test_int_sum_unchanged():
    got = _run([5, 7, 11], [2, 1], dtype=np.int64)
    np.testing.assert_array_equal(got, [12, 11])
