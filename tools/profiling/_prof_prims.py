"""On-chip primitive costs that drive the round-3 redesign."""
import time, functools
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

N = 1 << 22  # 4M
D = 1 << 23  # 8M domain
np.random.seed(0)
idx = np.random.randint(0, D, N).astype(np.int32)
v32 = np.random.randint(0, 1 << 20, N).astype(np.int32)
v64 = np.random.randint(0, 1 << 42, N).astype(np.int64)
k64 = np.random.randint(0, 1 << 60, N).astype(np.uint64)

ji = jnp.asarray(idx); jv = jnp.asarray(v32); jv64 = jnp.asarray(v64)
jk = jnp.asarray(k64)

def bench(name, fn, *args, reps=3):
    out = fn(*args); jax.device_get(jnp.sum(out) if out.ndim else out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.device_get(jnp.sum(out) if out.ndim else out)
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {min(ts)*1000:.1f} ms  ({min(ts)/ (N/1e6)*1000:.2f} ms/M)", flush=True)

f_sadd32 = jax.jit(lambda i, v: jnp.zeros((D,), jnp.int32).at[i].add(v))
bench("scatter-add i32 4M->8M", f_sadd32, ji, jv)

def sadd_limbs(i, v):
    lo = (v & 0xFFFFF).astype(jnp.int32)
    hi = (v >> 20).astype(jnp.int32)
    slo = jnp.zeros((D,), jnp.int32).at[i].add(lo)
    shi = jnp.zeros((D,), jnp.int32).at[i].add(hi)
    return shi.astype(jnp.int64) * (1 << 20) + slo
bench("scatter-add i64-as-2xi32 limbs", jax.jit(sadd_limbs), ji, jv64)

f_g32 = jax.jit(lambda i, t: t[i])
tbl32 = jnp.asarray(np.random.randint(0, 100, D).astype(np.int32))
bench("gather i32 4M from 8M", f_g32, ji, tbl32)

f_sset32 = jax.jit(lambda i, v: jnp.zeros((D,), jnp.int32).at[i].set(v))
bench("scatter-set i32 4M->8M", f_sset32, ji, jv)

f_smax = jax.jit(lambda i, v: jnp.zeros((D,), jnp.int32).at[i].max(v))
bench("scatter-max i32 4M->8M", f_smax, ji, jv)

# pallas radix pos kernel alone (one 8-bit pass at 4M)
from velox_tpu.ops import pallas_kernels as PK
dig = jnp.asarray((idx & 255).astype(np.int32))
f_pos = jax.jit(lambda d: PK.radix_pass_positions_nogather(d, N))
bench("pallas pos kernel 4M (1 pass)", f_pos, dig)

# full radix pass: pos + 3 scatters
def full_pass(d, a, b, c):
    pos = PK.radix_pass_positions_nogather(d, N)
    return (jnp.zeros((N,), jnp.int32).at[pos].set(a)
            + jnp.zeros((N,), jnp.int32).at[pos].set(b)
            + jnp.zeros((N,), jnp.int32).at[pos].set(c))
bench("radix pass: pos+3 scatters 4M", jax.jit(full_pass), dig, jv, ji, jv)

# lax.sort u64 key + i32 payload
f_sort = jax.jit(lambda k, p: jax.lax.sort((k, p), num_keys=1)[1])
bench("lax.sort u64+i32 4M", f_sort, jk, ji)
