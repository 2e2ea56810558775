"""Cost of lax.sort payload operands at 4M rows (drives payload-riding)."""
import time

import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

N = 1 << 22
np.random.seed(0)
k = jnp.asarray(np.random.randint(0, 1 << 60, N).astype(np.uint64))
p32 = jnp.asarray(np.random.randint(0, 1 << 30, N).astype(np.int32))
p64 = jnp.asarray(np.random.randint(0, 1 << 50, N).astype(np.int64))
pf = jnp.asarray(np.random.rand(N))


def bench(name, fn, *args, reps=3):
    out = fn(*args)
    jax.device_get(out[-1][0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.device_get(out[-1][0])
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {min(ts)*1000:.1f} ms ({min(ts)/(N/1e6)*1000:.2f} ms/M)",
          flush=True)


bench("sort u64+i32", jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=1)),
      k, p32)
bench("sort u64+i64", jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=1)),
      k, p64)
bench("sort u64+f64", jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=1)),
      k, pf)
bench("sort u64+i32+i64",
      jax.jit(lambda a, b, c: jax.lax.sort((a, b, c), num_keys=1)),
      k, p32, p64)
bench("sort u64+i64+i64+f64",
      jax.jit(lambda a, b, c, d: jax.lax.sort((a, b, c, d), num_keys=1)),
      k, p64, p64, pf)
bench("sort 2xu64keys+i64",
      jax.jit(lambda a, b, c: jax.lax.sort((a, b, c), num_keys=2)),
      k, (k >> jnp.uint64(7)), p64)
