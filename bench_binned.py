"""TPU A/B: binned-treelet traversal (accel/binned.py) vs the XLA
fat-row while_loop (accel/bvh4.py) on the icosphere-city scene.

The binned design removes per-step gathers entirely (the measured wall
of the while_loop path); its cost is pure VPU flops:
visits/ray * (T*25 + L*35). Sweep L/block to find the knee.

Usage: python bench_binned.py [--tris 64000] [--rays 262144] [--cpu]
       [--L 512] [--block 2048] [--incoherent] [--sort] [--anyhit]
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def build_city(tris: int, rng_seed: int = 0):
    import numpy as np

    sys.path.insert(0, "scenes")
    from make_fixtures import icosphere

    v, f = icosphere(3)
    count = max(1, tris // f.shape[0])
    rng = np.random.default_rng(rng_seed)
    grid = int(np.ceil(np.sqrt(count)))
    v0s, v1s, v2s = [], [], []
    n = 0
    for i in range(grid):
        for j in range(grid):
            if n >= count:
                break
            c = np.array([i * 4.0 - 2 * grid, rng.random() * 3,
                          j * 4.0 - 2 * grid])
            w = v * (0.8 + rng.random()) + c
            v0s.append(w[f[:, 0]])
            v1s.append(w[f[:, 1]])
            v2s.append(w[f[:, 2]])
            n += 1
    g = 3.0 * 2 * grid
    v0s.append(np.array([[-g, 0, -g], [g, 0, g]]))
    v1s.append(np.array([[g, 0, -g], [-g, 0, g]]))
    v2s.append(np.array([[g, 0, g], [-g, 0, -g]]))
    return (np.concatenate(v0s).astype(np.float32),
            np.concatenate(v1s).astype(np.float32),
            np.concatenate(v2s).astype(np.float32), 2.0 * grid)


def make_rays(n_rays, seed, ext, incoherent, tiled=False):
    import jax
    import jax.numpy as jnp

    k = jax.random.PRNGKey(seed)
    if tiled:
        # raster of a pinhole camera — the order a real render dispatches
        # primary rays in. tiled="morton" interleaves the pixel bits so a
        # 2048-ray block is a compact ~45x45 tile instead of a 4-row strip
        # spanning the whole image width (strip unions touch every treelet
        # in the frustum; tiles don't).
        w = int(n_rays ** 0.5)
        eye = jnp.array([0.0, ext * 0.9 + 6.0, ext * 1.8 + 8.0])
        if tiled == "morton":
            import numpy as _np
            code = _np.arange(n_rays, dtype=_np.uint64)
            i = _np.zeros(n_rays, _np.int64)
            j = _np.zeros(n_rays, _np.int64)
            for b in range(16):
                i |= ((code >> (2 * b)) & 1).astype(_np.int64) << b
                j |= ((code >> (2 * b + 1)) & 1).astype(_np.int64) << b
            i = jnp.asarray(i % w)
            j = jnp.asarray(j % w)
        else:
            i = jnp.arange(n_rays) % w
            j = jnp.arange(n_rays) // w
        ji = jax.random.uniform(k, (2, n_rays))
        tx = ((i + ji[0]) / w * 2 - 1) * ext
        tz = ((j + ji[1]) / w * 2 - 1) * ext
        tgt = jnp.stack([tx, jnp.zeros_like(tx) + 1.0, tz], axis=-1)
        o = jnp.broadcast_to(eye, (n_rays, 3))
        d = tgt - o
        return o, d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    if incoherent:
        u = jax.random.uniform(k, (n_rays, 3))
        o = jnp.stack([(u[:, 0] * 2 - 1) * ext, u[:, 1] * 3.0 + 0.2,
                       (u[:, 2] * 2 - 1) * ext], axis=-1)
        d = jax.random.normal(jax.random.fold_in(k, 1), (n_rays, 3))
        return o, d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    eye = jnp.array([0.0, ext * 0.9 + 6.0, ext * 1.8 + 8.0])
    o = jnp.broadcast_to(eye, (n_rays, 3))
    tx = jax.random.uniform(k, (n_rays,), minval=-ext, maxval=ext)
    tz = jax.random.uniform(jax.random.fold_in(k, 1), (n_rays,),
                            minval=-ext, maxval=ext)
    tgt = jnp.stack([tx, jnp.zeros_like(tx) + 1.0, tz], axis=-1)
    d = tgt - o
    return o, d / jnp.linalg.norm(d, axis=-1, keepdims=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tris", type=int, default=64000)
    ap.add_argument("--rays", type=int, default=262144)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--L", type=int, default=512)
    ap.add_argument("--block", type=int, default=2048)
    ap.add_argument("--k", type=int, default=2, help="treelets fetched per round")
    ap.add_argument("--sort", action="store_true")
    ap.add_argument("--incoherent", action="store_true")
    ap.add_argument("--anyhit", action="store_true")
    ap.add_argument("--tiled", nargs="?", const=True, default=False,
                    help="raster order; --tiled morton for tile order")
    ap.add_argument("--skip-xla", action="store_true")
    ap.add_argument("--mxu", action="store_true")
    ap.add_argument("--precision", default="highest", choices=["default", "high", "highest"])
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from craytracer_tpu.accel.binned import (binned_any_hit,
                                             binned_closest_hit,
                                             build_binned)
    from craytracer_tpu.accel.bvh4 import (build_bvh4, bvh4_any_hit,
                                           bvh4_closest_hit)
    from craytracer_tpu.ops.raysort import sorted_traversal

    v0, v1, v2, ext = build_city(args.tris)
    t0 = time.time()
    acc = build_binned(v0, v1, v2, L=args.L, mxu=args.mxu)
    t_build_binned = time.time() - t0
    bvh = build_bvh4(v0, v1, v2)
    print(f"# {acc.n_tris} tris, {acc.n_treelets} treelets (L={args.L}, "
          f"pool {acc.tris.size * 4 / 1e6:.1f} MB, build "
          f"{t_build_binned:.1f}s)", file=sys.stderr)

    md_val = ext * 0.6
    prec = {"default": jax.lax.Precision.DEFAULT,
            "high": jax.lax.Precision.HIGH,
            "highest": jax.lax.Precision.HIGHEST}[args.precision]

    def fn_xla(o, d):
        if args.anyhit:
            t = bvh4_any_hit(bvh, o, d, jnp.full((o.shape[0],), md_val))
            return t, (t < md_val).astype(jnp.int32)
        return bvh4_closest_hit(bvh, o, d)

    def fn_binned_raw(o, d):
        if args.anyhit:
            t = binned_any_hit(acc, o, d, jnp.full((o.shape[0],), md_val),
                               block=args.block, k_fetch=args.k,
                               mxu=args.mxu, precision=prec)
            return t, (t < md_val).astype(jnp.int32)
        return binned_closest_hit(acc, o, d, block=args.block,
                                  k_fetch=args.k, mxu=args.mxu,
                                  precision=prec)

    def fn_binned(o, d):
        if args.sort:
            return sorted_traversal(fn_binned_raw, o, d)
        return fn_binned_raw(o, d)

    def make_run(fn):
        @jax.jit
        def run(o, d, iters):
            def body(i, a):
                t, tri = fn(o + 1e-5 * i, d)
                return a + t.sum() + tri.sum()
            return jax.lax.fori_loop(0, iters, body, jnp.zeros(()))
        return run

    # correctness cross-check, smallest-first compile
    o_s, d_s = make_rays(512, 1, ext, args.incoherent, args.tiled)
    t_x, tri_x = jax.jit(fn_xla)(o_s, d_s)
    t_b, tri_b = jax.jit(fn_binned)(o_s, d_s)
    agree = float(jnp.mean((tri_x == tri_b).astype(jnp.float32)))
    max_dt = float(jnp.max(jnp.abs(jnp.where(tri_x == tri_b,
                                             t_x - t_b, 0.0))))
    print(f"# 512-ray cross-check: agree {agree:.4f}, max |dt| "
          f"{max_dt:.2e}", file=sys.stderr)
    assert agree > (0.98 if args.mxu else 0.995), "binned disagrees with bvh4"

    o, d = make_rays(args.rays, 2, ext, args.incoherent, args.tiled)

    def slope(run):
        base = int(time.time()) % 100000
        float(run(o + 1e-6 * base, d, args.iters))
        best = 0.0
        for rep in range(2):
            t0 = time.time()
            float(run(o + 1e-6 * (base + rep), d, args.iters))
            dt1 = time.time() - t0
            t0 = time.time()
            float(run(o + 1e-6 * (base + rep + 17), d, 3 * args.iters))
            dt3 = time.time() - t0
            if dt3 > dt1:
                best = max(best, 2 * args.iters * args.rays / (dt3 - dt1))
        return best

    rps_b = slope(make_run(fn_binned))
    rps_x = 0.0 if args.skip_xla else slope(make_run(fn_xla))
    print(json.dumps({
        "metric": ("binned_anyhit_rays_per_sec" if args.anyhit
                   else "binned_traversal_rays_per_sec"),
        "tris": int(acc.n_tris), "rays": args.rays, "L": args.L,
        "block": args.block, "k": args.k, "treelets": int(acc.n_treelets),
        "sort": bool(args.sort), "incoherent": bool(args.incoherent),
        "tiled": bool(args.tiled), "mxu": bool(args.mxu),
        "precision": args.precision,
        "xla_while_loop": round(rps_x, 1),
        "binned": round(rps_b, 1),
        "speedup": round(rps_b / max(rps_x, 1.0), 3),
        "value": round(max(rps_b, rps_x), 1), "unit": "rays/s",
        "vs_baseline": round(max(rps_b, rps_x) / 150e6, 4)}))


if __name__ == "__main__":
    main()
