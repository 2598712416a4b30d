"""Layout hypothesis test: [N,3] trailing-vec3 vs three [N] arrays on TPU."""
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
a = jax.random.normal(key, (N, 3), jnp.float32)
b = jax.random.normal(key, (N, 3), jnp.float32) + 1.0

# aos-ish: [N,3] with dots/normalizes (axis=-1 reductions)
def f_n3(a, b):
    def body(i, c):
        x, y = c
        d = (x * y).sum(-1)                      # dot
        x2 = x + d[:, None] * y                  # broadcast
        inv = jax.lax.rsqrt((x2 * x2).sum(-1) + 1e-12)
        x3 = x2 * inv[:, None]                   # normalize
        c3 = jnp.cross(x3, y)                    # cross
        return c3, y
    x, _ = jax.lax.fori_loop(0, ITER, body, (a, b))
    return x.sum()
timeit("[N,3] chain", f_n3, a, b)

ax, ay, az = a[:, 0], a[:, 1], a[:, 2]
bx, by, bz = b[:, 0], b[:, 1], b[:, 2]

def f_soa(ax, ay, az, bx, by, bz):
    def body(i, c):
        x0, x1, x2 = c
        d = x0 * bx + x1 * by + x2 * bz
        y0, y1, y2 = x0 + d * bx, x1 + d * by, x2 + d * bz
        inv = jax.lax.rsqrt(y0 * y0 + y1 * y1 + y2 * y2 + 1e-12)
        z0, z1, z2 = y0 * inv, y1 * inv, y2 * inv
        c0 = z1 * bz - z2 * by
        c1 = z2 * bx - z0 * bz
        c2 = z0 * by - z1 * bx
        return c0, c1, c2
    x0, x1, x2 = jax.lax.fori_loop(0, ITER, body, (ax, ay, az))
    return x0.sum() + x1.sum() + x2.sum()
timeit("3x[N] SoA chain", f_soa, ax, ay, az, bx, by, bz)

# [3,N] layout variant
a3 = a.T.copy(); b3 = b.T.copy()
def f_3n(a, b):
    def body(i, c):
        x, y = c
        d = (x * y).sum(0)
        x2 = x + d[None, :] * y
        inv = jax.lax.rsqrt((x2 * x2).sum(0) + 1e-12)
        x3 = x2 * inv[None, :]
        c3 = jnp.stack([x3[1]*y[2]-x3[2]*y[1], x3[2]*y[0]-x3[0]*y[2], x3[0]*y[1]-x3[1]*y[0]])
        return c3, y
    x, _ = jax.lax.fori_loop(0, ITER, body, (a3, b3))
    return x.sum()
timeit("[3,N] chain", f_3n, a3, b3)

# gather test: mat_id-style gather [N] from small table, [N,3] vs 3x[N]
tbl = jax.random.normal(key, (16, 3), jnp.float32)
idx = jax.random.randint(key, (N,), 0, 16)
def g_n3(idx):
    def body(i, c):
        v = tbl[(idx + i) % 16]
        return c + v.sum()
    return jax.lax.fori_loop(0, ITER, body, jnp.zeros(()))
timeit("gather [N,3] from table", g_n3, idx)

tbl0, tbl1, tbl2 = tbl[:, 0], tbl[:, 1], tbl[:, 2]
def g_soa(idx):
    def body(i, c):
        j = (idx + i) % 16
        return c + tbl0[j].sum() + tbl1[j].sum() + tbl2[j].sum()
    return jax.lax.fori_loop(0, ITER, body, jnp.zeros(()))
timeit("gather 3x[N] from table", g_soa, idx)
