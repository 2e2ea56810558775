"""Pallas radix-pass kernel tests (interpret mode on the CPU mesh; the
real lowering is exercised on TPU by bench/verify runs)."""

import numpy as np
import pytest

from velox_tpu.ops import pallas_kernels as PK


@pytest.mark.parametrize("n", [2048, 4096, 5000, 100_000])
def test_radix_pass_positions_interpret(n):
    import jax.numpy as jnp
    rng = np.random.RandomState(3)
    d = rng.randint(0, 256, n).astype(np.int32)
    pos = np.asarray(PK.radix_pass_positions(
        jnp.asarray(d), n, interpret=True))
    # positions must be the stable counting-sort destinations
    expect = np.empty(n, np.int64)
    order = np.argsort(d, kind="stable")
    expect[order] = np.arange(n)
    np.testing.assert_array_equal(pos, expect)


def test_radix_pass_positions_matches_xla_path():
    """The scatter of a perm through the pallas positions equals the XLA
    one-hot path used in exec/sort.py."""
    import jax.numpy as jnp
    n = 10_000
    rng = np.random.RandomState(1)
    d = jnp.asarray(rng.randint(0, 256, n).astype(np.int32))
    iota = jnp.arange(n, dtype=jnp.int32)
    pos = PK.radix_pass_positions(d, n, interpret=True)
    perm_pallas = jnp.zeros((n,), jnp.int32).at[pos].set(iota)
    buckets = jnp.arange(256, dtype=jnp.int32)
    oh = (d[None, :] == buckets[:, None])
    ranks = jnp.cumsum(oh.astype(jnp.int32), axis=1)
    counts = ranks[:, -1]
    base = jnp.cumsum(counts) - counts
    pos_xla = base[d] + ranks[d, iota] - 1
    perm_xla = jnp.zeros((n,), jnp.int32).at[pos_xla].set(iota)
    np.testing.assert_array_equal(np.asarray(perm_pallas),
                                  np.asarray(perm_xla))


@pytest.mark.parametrize("n", [40_000, 70_000])
def test_radix_pass_positions_multisub_interpret(n, monkeypatch):
    """Batches beyond one call's VMEM budget split into sub-calls whose
    ranks/totals are recombined with int32 XLA glue."""
    import jax.numpy as jnp
    monkeypatch.setattr(PK, "SUB_ROWS", 8192)
    rng = np.random.RandomState(5)
    d = rng.randint(0, 256, n).astype(np.int32)
    pos = np.asarray(PK.radix_pass_positions(jnp.asarray(d), n,
                                             interpret=True))
    expect = np.empty(n, np.int64)
    order = np.argsort(d, kind="stable")
    expect[order] = np.arange(n)
    np.testing.assert_array_equal(pos, expect)


def test_flat_gather_interpret():
    """Lane-roll flat gather == XLA gather (interpret mode)."""
    import jax.numpy as jnp
    import numpy as np
    from velox_tpu.ops.pallas_kernels import flat_gather
    rng = np.random.RandomState(7)
    for n, m in [(1000, 3000), (1 << 16, 1 << 15), (129, 7)]:
        data = jnp.asarray(rng.randint(-10**9, 10**9, n)
                           .astype(np.int32))
        idx = jnp.asarray(rng.randint(0, n, m).astype(np.int32))
        out = flat_gather(data, idx, interpret=True)
        np.testing.assert_array_equal(
            np.asarray(out), np.asarray(data)[np.asarray(idx)])
