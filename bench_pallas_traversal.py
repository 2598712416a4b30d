"""TPU A/B: Pallas VMEM-resident BVH4 traversal vs the XLA while_loop.

VERDICT round-1 item #4's missing half — the Pallas kernel
(accel/pallas_bvh4.py) was interpret-verified but never timed on hardware.
The kernel keeps the whole fat node table in VMEM, so the scene must stay
under ~21k nodes (~90k triangles); default 64k tris.

Runs closest-hit over a primary-ray batch, two-point slope timing (the
axon relay adds erratic per-call latency). Compiles the SMALLEST kernel
first (512 rays) before the full batch, per the tunnel-wedge precaution
in CLAUDE.md.

Usage: python bench_pallas_traversal.py [--tris 64000] [--rays 262144] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tris", type=int, default=64000)
    ap.add_argument("--rays", type=int, default=262144)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--block", type=int, default=0,
                    help="Pallas ray-block lanes (0 = module default)")
    ap.add_argument("--sort", action="store_true",
                    help="coherence-sort rays before the Pallas kernel "
                         "(ops/raysort.py) — expect wins only with "
                         "--incoherent")
    ap.add_argument("--incoherent", action="store_true",
                    help="bounce-like ray batch (scattered origins + "
                         "random directions) instead of a camera cone")
    ap.add_argument("--leaf", type=int, default=0,
                    help="BVH4 leaf size (0 = module default). The XLA "
                         "path wants leaf2 (128-col gather cliff); the "
                         "Pallas kernel reads rows by scalar slice so "
                         "bigger leaves = shallower tree = fewer pops")
    ap.add_argument("--skip-xla", action="store_true",
                    help="time only the Pallas kernel (cross-check still "
                         "runs against XLA at 512 rays)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, "scenes")
    from make_fixtures import icosphere

    from craytracer_tpu.accel.bvh4 import build_bvh4, bvh4_closest_hit
    from craytracer_tpu.accel.pallas_bvh4 import pallas_bvh4_closest_hit

    v, f = icosphere(3)
    count = max(1, args.tris // f.shape[0])
    rng = np.random.default_rng(0)
    grid = int(np.ceil(np.sqrt(count)))
    v0s, v1s, v2s = [], [], []
    n = 0
    for i in range(grid):
        for j in range(grid):
            if n >= count:
                break
            c = np.array([i * 4.0 - 2 * grid, rng.random() * 3, j * 4.0 - 2 * grid])
            w = v * (0.8 + rng.random()) + c
            v0s.append(w[f[:, 0]])
            v1s.append(w[f[:, 1]])
            v2s.append(w[f[:, 2]])
            n += 1
    # ground quad so every ray terminates on real geometry
    g = 3.0 * 2 * int(np.ceil(np.sqrt(count)))
    v0s.append(np.array([[-g, 0, -g], [g, 0, g]]))
    v1s.append(np.array([[g, 0, -g], [-g, 0, g]]))
    v2s.append(np.array([[g, 0, g], [-g, 0, -g]]))
    leaf_kw = {"leaf_size": args.leaf} if args.leaf else {}
    bvh = build_bvh4(np.concatenate(v0s).astype(np.float32),
                     np.concatenate(v1s).astype(np.float32),
                     np.concatenate(v2s).astype(np.float32), **leaf_kw)
    n_tris = bvh.n_tris
    fat_mb = bvh.fat.size * 4 / 1e6
    print(f"# {n_tris} tris, {bvh.fat.shape[0]} nodes, leaf{bvh.leaf_size}, "
          f"fat {fat_mb:.1f} MB (VMEM budget 120 MB)", file=sys.stderr)
    if fat_mb > 118:
        print("# fat table exceeds VMEM budget - aborting", file=sys.stderr)
        sys.exit(3)

    ext = 2.0 * grid  # city half-extent in x/z

    def make_rays(n_rays, seed):
        k = jax.random.PRNGKey(seed)
        if args.incoherent:
            # bounce-like batch: origins scattered through the city volume,
            # directions uniform on the sphere — the wavefront's secondary-
            # ray regime where per-block trip counts diverge most
            u = jax.random.uniform(k, (n_rays, 3))
            o = jnp.stack([(u[:, 0] * 2 - 1) * ext, u[:, 1] * 3.0 + 0.2,
                           (u[:, 2] * 2 - 1) * ext], axis=-1)
            d = jax.random.normal(jax.random.fold_in(k, 1), (n_rays, 3))
            return o, d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        eye = jnp.array([0.0, ext * 0.9 + 6.0, ext * 1.8 + 8.0])
        o = jnp.broadcast_to(eye, (n_rays, 3))
        # jittered look-at cone covering the city footprint so most rays
        # traverse real geometry (a traversal bench of misses is a bench
        # of the root box test)
        tx = jax.random.uniform(k, (n_rays,), minval=-ext, maxval=ext)
        tz = jax.random.uniform(jax.random.fold_in(k, 1), (n_rays,),
                                minval=-ext, maxval=ext)
        tgt = jnp.stack([tx, jnp.zeros_like(tx) + 1.0, tz], axis=-1)
        d = tgt - o
        return o, d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    @jax.jit
    def run_xla(o, d, iters):
        def body(i, acc):
            t, tri = bvh4_closest_hit(bvh, o + 1e-5 * i, d)
            return acc + t.sum() + tri.sum()
        return jax.lax.fori_loop(0, iters, body, jnp.zeros(()))

    interp = bool(args.cpu)  # no Mosaic on the CPU backend
    from craytracer_tpu.accel.pallas_bvh4 import RAY_BLOCK
    from craytracer_tpu.ops.raysort import sorted_traversal

    block = args.block or RAY_BLOCK

    def one_pallas(o, d):
        fn = lambda oo, dd: pallas_bvh4_closest_hit(  # noqa: E731
            bvh, oo, dd, interpret=interp, block=block)
        if args.sort:
            return sorted_traversal(fn, o, d)
        return fn(o, d)

    @jax.jit
    def run_pallas(o, d, iters):
        def body(i, acc):
            t, tri = one_pallas(o + 1e-5 * i, d)
            return acc + t.sum() + tri.sum()
        return jax.lax.fori_loop(0, iters, body, jnp.zeros(()))

    # correctness cross-check + smallest-first compile
    o_s, d_s = make_rays(512, 1)
    t_x, tri_x = jax.jit(lambda o, d: bvh4_closest_hit(bvh, o, d))(o_s, d_s)
    t_p, tri_p = jax.jit(one_pallas)(o_s, d_s)
    same_tri = float(jnp.mean((tri_x == tri_p).astype(jnp.float32)))
    same_t = float(jnp.max(jnp.abs(jnp.where(tri_x == tri_p, t_x - t_p, 0.0))))
    hit_rate = float(jnp.mean((tri_x >= 0).astype(jnp.float32)))
    print(f"# 512-ray cross-check: tri agree {same_tri:.4f}, max |dt| "
          f"{same_t:.2e}, hit rate {hit_rate:.2f}", file=sys.stderr)
    assert same_tri > 0.999, "pallas kernel disagrees with XLA traversal"

    o, d = make_rays(args.rays, 2)

    def slope(run):
        base = int(time.time()) % 100000
        float(run(o + 1e-6 * base, d, args.iters))  # compile + warm
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

    rps_xla = 0.0 if args.skip_xla else slope(run_xla)
    rps_pal = slope(run_pallas)
    print(json.dumps({
        "metric": "bvh4_traversal_rays_per_sec",
        "tris": int(n_tris), "rays": args.rays, "block": block,
        "leaf": int(bvh.leaf_size),
        "sort": bool(args.sort), "incoherent": bool(args.incoherent),
        "xla_while_loop": round(rps_xla, 1),
        "pallas_vmem_kernel": round(rps_pal, 1),
        "speedup": round(rps_pal / max(rps_xla, 1.0), 3),
        "value": round(max(rps_pal, rps_xla), 1), "unit": "rays/s",
        "vs_baseline": round(max(rps_pal, rps_xla) / 150e6, 4)}))


if __name__ == "__main__":
    main()
