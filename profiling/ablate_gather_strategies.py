"""Gather strategy shootout: native gather vs one-hot MXU matmul, small + large tables."""
import time, jax, jax.numpy as jnp

N = 262144
ITER = 200

def timeit(name, fn, *args):
    f = jax.jit(fn)
    r = f(*args); float(jnp.asarray(r).ravel()[0].astype(jnp.float32))
    best = 1e9
    for rep in range(3):
        t0 = time.time(); r = f(*args)
        float(jnp.asarray(r).ravel()[0].astype(jnp.float32))
        best = min(best, time.time() - t0)
    print(f"{name}: {best/ITER*1e6:.2f} us/iter")
    return best

key = jax.random.PRNGKey(0)

for T, K in [(16, 8), (16, 3), (4096, 8)]:
    tbl = jax.random.normal(key, (T, K), jnp.float32)
    idx = jax.random.randint(key, (N,), 0, T)

    def g_native(idx, tbl=tbl, T=T):
        def body(i, c):
            v = tbl[(idx + i) % T]
            return c + v.sum()
        return jax.lax.fori_loop(0, ITER, body, jnp.zeros(()))
    timeit(f"native gather T={T} K={K}", g_native, idx)

    def g_onehot(idx, tbl=tbl, T=T):
        def body(i, c):
            oh = jax.nn.one_hot((idx + i) % T, T, dtype=jnp.float32)
            v = oh @ tbl
            return c + v.sum()
        return jax.lax.fori_loop(0, ITER, body, jnp.zeros(()))
    timeit(f"onehot-matmul T={T} K={K}", g_onehot, idx)

    def g_onehot_bf16(idx, tbl=tbl, T=T):
        tb = tbl.astype(jnp.bfloat16)
        def body(i, c):
            oh = jax.nn.one_hot((idx + i) % T, T, dtype=jnp.bfloat16)
            v = oh @ tb
            return c + v.sum().astype(jnp.float32)
        return jax.lax.fori_loop(0, ITER, body, jnp.zeros(()))
    timeit(f"onehot-bf16   T={T} K={K}", g_onehot_bf16, idx)

# dynamic-slice style: sorted segment? skip. Also test take_along_axis on transposed table
T, K = 16, 8
tblT = jax.random.normal(key, (K, T), jnp.float32)
idx = jax.random.randint(key, (N,), 0, T)
def g_takeT(idx):
    def body(i, c):
        j = (idx + i) % T
        v = jnp.take(tblT, j, axis=1)  # [K, N]
        return c + v.sum()
    return jax.lax.fori_loop(0, ITER, body, jnp.zeros(()))
timeit(f"take axis=1 [K,T]->[K,N] T={T} K={K}", g_takeT, idx)

# int hash cost check: 4 rounds of u32 mult-xor
u = jax.random.randint(key, (N,), 0, 2**31 - 1, jnp.int32).astype(jnp.uint32)
def f_hash(u):
    def body(i, c):
        h = c ^ jnp.uint32(i)
        for _ in range(4):
            h = h * jnp.uint32(0x9E3779B1)
            h ^= h >> 16
        return h
    return jax.lax.fori_loop(0, ITER, body, u).sum()
timeit("4-round u32 hash", f_hash, u)

def f_hashf(u):
    uf = u.astype(jnp.float32)
    def body(i, c):
        h = c + jnp.float32(i)
        for _ in range(4):
            h = (h * 12.9898 + 78.233)
            h = h - jnp.floor(h * (1/289.0)) * 289.0
        return h
    return jax.lax.fori_loop(0, ITER, body, uf).sum()
timeit("4-round float hash", f_hashf, u)
