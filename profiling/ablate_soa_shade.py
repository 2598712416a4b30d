"""Layout A/B on a REALISTIC shade bounce (not a synthetic chain).

Question: is the [N,3] trailing-vec3 layout costing us the ~2.85ms shade
stage (ablate_bounce_stages.py), and would a 3x[N] SoA rewrite pay?
Measures a faithful matte-bounce shade (shading frame + to_local/to_world,
9-dim RNG, Lambertian NEE against a rect light, cosine BSDF sample, RR) in:

  a) [N,3] arrays, axis=-1 math        (current production layout)
  b) 3x[N] separate component arrays   (pure SoA)
  c) 3x[N] but entering/leaving as [N,3] (stage-local SoA: what a bounded
     refactor inside the bounce step would actually ship)

Hit state enters as (point, normal, dpdu, wo) and leaves as (new_o, new_d,
beta_scale, L_add) so the comparison includes everything the real shade
stage does between the intersect and the next traversal.
"""
import time

import jax
import jax.numpy as jnp

N = 262144
ITER = 50
GOLDEN = 0x9E3779B9


def hash_u32(x):
    x = (x ^ (x >> 16)) * jnp.uint32(0x7FEB352D)
    x = (x ^ (x >> 15)) * jnp.uint32(0x846CA68B)
    return x ^ (x >> 16)


def uniforms9(pix, spp):
    h = hash_u32(pix.astype(jnp.uint32))
    h = hash_u32(h ^ hash_u32(jnp.uint32(spp)))
    dims = jnp.arange(9, dtype=jnp.uint32) * jnp.uint32(GOLDEN)
    u = hash_u32(h[:, None] ^ dims[None, :])
    return u.astype(jnp.float32) * (1.0 / 4294967296.0)


# rect light constants (cornell lamp)
LP = (1.0, 10.0, 1.0)
LU = (2.0, 0.0, 0.0)
LV = (0.0, 0.0, 2.0)
LN = (0.0, -1.0, 0.0)
LAREA = 4.0
LEMIT = 40.0
ALBEDO = 0.7


def shade_aos(point, normal, dpdu, wo_w, pix, spp):
    def dot(a, b, keepdims=False):
        return jnp.sum(a * b, axis=-1, keepdims=keepdims)

    def normalize(a):
        return a * jax.lax.rsqrt(dot(a, a, keepdims=True) + 1e-20)

    # frame
    t = dpdu - dot(normal, dpdu, keepdims=True) * normal
    t = normalize(t)
    b = normalize(jnp.cross(normal, t))
    wo_l = jnp.stack([dot(wo_w, t), dot(wo_w, b), dot(wo_w, normal)], -1)
    u = uniforms9(pix, spp)
    # NEE: sample rect
    lp = jnp.array(LP) + u[:, 0:1] * jnp.array(LU) + u[:, 1:2] * jnp.array(LV)
    to_l = lp - point
    d2 = dot(to_l, to_l)
    dist = jnp.sqrt(d2 + 1e-12)
    wi = to_l / dist[:, None]
    cos_l = jnp.maximum(-dot(wi, jnp.array(LN)[None, :]), 0.0)
    pdf = d2 / jnp.maximum(cos_l * LAREA, 1e-9)
    f = ALBEDO / jnp.pi
    cos_s = jnp.abs(dot(wi, normal))
    Ladd = (f * LEMIT * cos_s / jnp.maximum(pdf, 1e-9))[:, None] * jnp.ones(3)
    # BSDF cosine sample
    r = jnp.sqrt(u[:, 5])
    phi = u[:, 6] * (2 * jnp.pi)
    wl = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi),
                    jnp.sqrt(jnp.maximum(1 - u[:, 5], 1e-9))], -1)
    wi_w = wl[:, 0:1] * t + wl[:, 1:2] * b + wl[:, 2:3] * normal
    pdf_s = wl[:, 2] / jnp.pi
    beta_scale = (f * jnp.abs(dot(wi_w, normal)) / jnp.maximum(pdf_s, 1e-9))[:, None] * jnp.ones(3)
    # RR
    q = jnp.maximum(0.05, 1.0 - jnp.max(beta_scale, -1))
    keep = u[:, 8] >= q
    beta_scale = jnp.where(keep[:, None], beta_scale / jnp.maximum(1 - q, 1e-6)[:, None], 0.0)
    mag = jnp.max(jnp.abs(point), -1, keepdims=True)
    new_o = point + normal * (mag + 1.0) * 1e-4
    return new_o, wi_w, beta_scale, Ladd, wo_l


def _soa_core(px, py, pz, nx, ny, nz, ux, uy, uz, wx, wy, wz, pix, spp):
    def rs(x):
        return jax.lax.rsqrt(x + 1e-20)

    nd = nx * ux + ny * uy + nz * uz
    tx, ty, tz = ux - nd * nx, uy - nd * ny, uz - nd * nz
    inv = rs(tx * tx + ty * ty + tz * tz)
    tx, ty, tz = tx * inv, ty * inv, tz * inv
    bx = ny * tz - nz * ty
    by = nz * tx - nx * tz
    bz = nx * ty - ny * tx
    inv = rs(bx * bx + by * by + bz * bz)
    bx, by, bz = bx * inv, by * inv, bz * inv
    wol = (wx * tx + wy * ty + wz * tz,
           wx * bx + wy * by + wz * bz,
           wx * nx + wy * ny + wz * nz)
    u = uniforms9(pix, spp)
    lpx = LP[0] + u[:, 0] * LU[0] + u[:, 1] * LV[0]
    lpy = LP[1] + u[:, 0] * LU[1] + u[:, 1] * LV[1]
    lpz = LP[2] + u[:, 0] * LU[2] + u[:, 1] * LV[2]
    dx, dy, dz = lpx - px, lpy - py, lpz - pz
    d2 = dx * dx + dy * dy + dz * dz
    invd = rs(d2)
    wix, wiy, wiz = dx * invd, dy * invd, dz * invd
    cos_l = jnp.maximum(-(wix * LN[0] + wiy * LN[1] + wiz * LN[2]), 0.0)
    pdf = d2 / jnp.maximum(cos_l * LAREA, 1e-9)
    f = ALBEDO / jnp.pi
    cos_s = jnp.abs(wix * nx + wiy * ny + wiz * nz)
    Ladd = f * LEMIT * cos_s / jnp.maximum(pdf, 1e-9)
    r = jnp.sqrt(u[:, 5])
    phi = u[:, 6] * (2 * jnp.pi)
    wl0, wl1 = r * jnp.cos(phi), r * jnp.sin(phi)
    wl2 = jnp.sqrt(jnp.maximum(1 - u[:, 5], 1e-9))
    wiwx = wl0 * tx + wl1 * bx + wl2 * nx
    wiwy = wl0 * ty + wl1 * by + wl2 * ny
    wiwz = wl0 * tz + wl1 * bz + wl2 * nz
    pdf_s = wl2 / jnp.pi
    bsc = f * jnp.abs(wiwx * nx + wiwy * ny + wiwz * nz) / jnp.maximum(pdf_s, 1e-9)
    q = jnp.maximum(0.05, 1.0 - bsc)
    keep = u[:, 8] >= q
    bsc = jnp.where(keep, bsc / jnp.maximum(1 - q, 1e-6), 0.0)
    mag = jnp.maximum(jnp.maximum(jnp.abs(px), jnp.abs(py)), jnp.abs(pz))
    eps = (mag + 1.0) * 1e-4
    nox, noy, noz = px + nx * eps, py + ny * eps, pz + nz * eps
    return (nox, noy, noz), (wiwx, wiwy, wiwz), bsc, Ladd, wol


def shade_soa(p, n, dp, wo, pix, spp):
    return _soa_core(p[0], p[1], p[2], n[0], n[1], n[2],
                     dp[0], dp[1], dp[2], wo[0], wo[1], wo[2], pix, spp)


def shade_boundary(point, normal, dpdu, wo_w, pix, spp):
    """[N,3] in/out, SoA inside (the bounded-refactor shape)."""
    args = []
    for a in (point, normal, dpdu, wo_w):
        args += [a[:, 0], a[:, 1], a[:, 2]]
    no, wi, bsc, Ladd, wol = _soa_core(*args, pix, spp)
    return (jnp.stack(no, -1), jnp.stack(wi, -1),
            bsc[:, None] * jnp.ones(3), Ladd[:, None] * jnp.ones(3),
            jnp.stack(wol, -1))


def bench(name, fn, args):
    f = jax.jit(fn)

    def loop(args, spp0):
        def body(i, c):
            no, wi, bsc, La, _ = f(*args[:-1], spp0 + i)
            a0 = c[0] + (La[..., 0] if La.ndim > 1 else La)
            return (a0,)
        return jax.lax.fori_loop(0, ITER, body,
                                 (jnp.zeros(N, jnp.float32),))

    lj = jax.jit(loop)
    r = lj(args, 0)
    float(r[0][0])
    best = 1e9
    for rep in range(3):
        t0 = time.time()
        r = lj(args, (rep + 1) * 1000 + int(time.time()) % 997)
        float(r[0][0])
        best = min(best, time.time() - t0)
    print(f"{name}: {best / ITER * 1e3:.3f} ms/bounce "
          f"({N / (best / ITER) / 1e6:.0f} Mlanes/s)")


def main():
    key = jax.random.PRNGKey(0)
    point = jax.random.normal(key, (N, 3)) * 2
    normal = point / jnp.linalg.norm(point, axis=-1, keepdims=True)
    dpdu = jax.random.normal(jax.random.PRNGKey(1), (N, 3))
    wo = jax.random.normal(jax.random.PRNGKey(2), (N, 3))
    wo = wo / jnp.linalg.norm(wo, axis=-1, keepdims=True)
    pix = jnp.arange(N, dtype=jnp.int32)

    bench("[N,3] aos shade     ", shade_aos, (point, normal, dpdu, wo, pix, 0))
    soa_args = (tuple(point[:, i] for i in range(3)),
                tuple(normal[:, i] for i in range(3)),
                tuple(dpdu[:, i] for i in range(3)),
                tuple(wo[:, i] for i in range(3)), pix, 0)
    bench("3x[N] soa shade     ", shade_soa, soa_args)
    bench("[N,3]-boundary soa  ", shade_boundary, (point, normal, dpdu, wo, pix, 0))


if __name__ == "__main__":
    main()
