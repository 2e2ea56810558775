"""velox_tpu: a TPU-native vectorized query-execution engine.

A from-scratch reimplementation of the capabilities of Velox
(facebookincubator/velox, mounted at /root/reference) designed TPU-first:
columnar batches as statically-shaped jnp arrays in HBM, operators as
jit-compiled dense/masked programs, hash tables and sorts as XLA/Pallas
kernels, and multi-chip scaling via jax.sharding meshes and collectives.
"""

__version__ = "0.1.0"

import jax as _jax

# SQL semantics require 64-bit integers (BIGINT, scaled decimals). TPUs
# support s64 natively; f64 is kept off the device hot path (decimal money
# math is exact int64), so enabling x64 costs nothing where it matters.
_jax.config.update("jax_enable_x64", True)

from velox_tpu import types  # noqa: F401,E402
