"""Absolute calibration of the v5e chip: HBM bw, VPU chain, MXU, per-op overhead.

Readback-forced: every timed call reduces to a scalar inside jit, is fed a
varying operand, and is read back with float() — block_until_ready alone
reports relay-cache fiction on the axon backend."""
import time, jax, jax.numpy as jnp

def timeit(name, fn, *args, inner=1):
    f = jax.jit(fn)
    float(f(jnp.float32(0.5), *args))
    best = 1e9
    for rep in range(5):
        s = jnp.float32(0.5 + 0.001 * rep)
        t0 = time.time()
        r = float(f(s, *args))
        best = min(best, time.time() - t0)
    print(f"{name}: {best*1e3:.3f} ms total, {best/inner*1e6:.2f} us/inner")
    return best / inner

key = jax.random.PRNGKey(0)

# 1. HBM bandwidth: fused mul-add over 32M floats (read 2x128MB, write+read for sum)
M = 1 << 25
x = jax.random.normal(key, (M,), jnp.float32)
y = jax.random.normal(key, (M,), jnp.float32)
t = timeit("axpy+sum 32M f32", lambda s, x, y: (x * s + y).sum(), x, y)
print(f"   -> {2*4*M/t/1e9:.0f} GB/s (2 reads)")

# 2. VPU compute: deep fused chain over 262k
N = 262144
xs = jax.random.normal(key, (N,), jnp.float32) + 2.0
def chain(s, x):
    x = x * s
    for i in range(200):
        x = x * 1.0001 + 0.3
    return x.sum()
t = timeit("fused fma chain d=200 N=262k", chain, xs, inner=200)
print(f"   -> {N/t/1e9:.1f} G fma-lane/s")

def chain_rsqrt(s, x):
    x = x * s
    for i in range(100):
        x = jax.lax.rsqrt(x + 1.1)
    return x.sum()
timeit("fused rsqrt chain d=100 N=262k", chain_rsqrt, xs, inner=100)

# 3. fori_loop per-iteration overhead
def loop_trivial(s, x):
    return jax.lax.fori_loop(0, 1000, lambda i, c: c * 1.0001 + s * 1e-9, x * s).sum()
timeit("fori 1000x (fma [262k])", loop_trivial, xs, inner=1000)

# 4. MXU: 4096^3 bf16 matmul
A = jax.random.normal(key, (4096, 4096), jnp.bfloat16)
B = jax.random.normal(key, (4096, 4096), jnp.bfloat16)
def mm(s, a, b):
    return (a * s.astype(jnp.bfloat16) @ b).sum().astype(jnp.float32)
t = timeit("matmul 4096^3 bf16", mm, A, B)
print(f"   -> {2*4096**3/t/1e12:.1f} TFLOP/s")

# 5. where chain
def chain_where(s, x):
    x = x * s
    m = x > 2.0
    for i in range(100):
        x = jnp.where(m, x * 1.0001, x + 0.001)
        m = x > 2.0
    return x.sum()
timeit("fused where chain d=100", chain_where, xs, inner=100)

# 6. transcendentals
def chain_sincos(s, x):
    x = x * s
    for i in range(50):
        x = jnp.sin(x) + 1.5
    return x.sum()
timeit("fused sin chain d=50", chain_sincos, xs, inner=50)

# 7. sum-only baseline (readback + reduction floor)
timeit("sum only [262k]", lambda s, x: (x * s).sum(), xs)
timeit("sum only [32M]", lambda s, x: (x * s).sum(), x)
