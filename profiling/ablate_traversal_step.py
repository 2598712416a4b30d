"""Per-step cost ablation of the BVH4 fat-row traversal body on TPU.

Answers (round-2 "next levers", CLAUDE.md): of the ~6ms/step measured on
the dense rewrite, how much is (a) the fat-row gather, (b) the 4-box slab
test, (c) the 16-slot inline leaf Moller-Trumbore, (d) the [N, S] stack
pop/push traffic — and does K-node multi-pop (one [N, K] gather feeding
K x dense math per step) amortize the latency-bound gather?

Variants (fixed trip count, slope-timed):
  gather   — fat-row gather only, summed into the carry
  box      — gather + 4-box slab test
  leaf     — gather + box + 16-slot MT winner chain (no stack)
  full     — the real production body (stack pop/push included)
  kpop2/4  — gather [N, K] rows + K x (box + leaf), fake node walk

Fake node indices are a per-step hash (varies per lane and per step) so
the gather pattern matches real traversal incoherence and nothing folds.

Usage: python profiling/ablate_traversal_step.py [--cpu] [--lanes 262144]
       [--tris 81920] [--trips 24]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--lanes", type=int, default=262144)
    ap.add_argument("--tris", type=int, default=81920)
    ap.add_argument("--trips", type=int, default=24)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from bench_mesh import build_scene
    from craytracer_tpu.accel.bvh4 import (LEAF_SIZE, WIDTH, _FAT_TRI0,
                                           _TRI_COLS, _traverse4)
    from craytracer_tpu.core import math as vm

    scene, n_tris, build_s = build_scene(args.tris, "bvh4")
    bvh = scene.tri_bvh
    fat = bvh.fat
    m = fat.shape[0]
    print(f"# {n_tris} tris, {m} fat nodes, build {build_s:.1f}s",
          file=sys.stderr)

    k_slots = WIDTH * bvh.leaf_size
    n = args.lanes
    rng = np.random.default_rng(1)
    o = jnp.asarray(rng.normal(0, 30, (n, 3)).astype(np.float32) + np.array([0, 20, 0], np.float32))
    d = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    inv_d = 1.0 / vm._safe(d)
    lane = jnp.arange(n, dtype=jnp.uint32)

    def fake_nodes(step, k):
        # per-lane, per-step pseudo-random node ids (matches gather
        # incoherence of real traversal; cannot constant-fold)
        h = lane * jnp.uint32(0x9E3779B9) + step.astype(jnp.uint32) * jnp.uint32(0x85EBCA6B)
        h = h ^ (h >> 16)
        h = h * jnp.uint32(0x7FEB352D)
        out = []
        for i in range(k):
            hi = h + jnp.uint32((i * 0x68E31DA4) & 0xFFFFFFFF)
            hi = hi ^ (hi >> 15)
            out.append((hi % jnp.uint32(m)).astype(jnp.int32))
        return out

    def box_leaf(row, best_t, do_leaf):
        cmin = row[:, 0:12].reshape(n, WIDTH, 3)
        cmax = row[:, 12:24].reshape(n, WIDTH, 3)
        t0 = (cmin - o[:, None, :]) * inv_d[:, None, :]
        t1 = (cmax - o[:, None, :]) * inv_d[:, None, :]
        tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
        tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
        acc = jnp.sum(jnp.where(tn <= tf, tn, 0.0), axis=1)
        if not do_leaf:
            return best_t + acc * 1e-30
        tris = row[:, _FAT_TRI0:_FAT_TRI0 + k_slots * _TRI_COLS].reshape(
            n, k_slots, _TRI_COLS)
        tv0, te1, te2 = tris[..., 0:3], tris[..., 3:6], tris[..., 6:9]
        tid = tris[..., 9].astype(jnp.int32)
        dN = d[:, None, :]
        pvec = jnp.cross(dN, te2)
        det = jnp.sum(te1 * pvec, axis=-1)
        inv_det = 1.0 / vm._safe(det)
        tvec = o[:, None, :] - tv0
        beta = jnp.sum(tvec * pvec, axis=-1) * inv_det
        qvec = jnp.cross(tvec, te1)
        gamma = jnp.sum(dN * qvec, axis=-1) * inv_det
        tt = jnp.sum(te2 * qvec, axis=-1) * inv_det
        ok = ((tid >= 0) & (beta >= 0) & (gamma >= 0)
              & (beta + gamma <= 1) & (tt > 1e-4) & (tt < best_t[:, None]))
        tt = jnp.where(ok, tt, 1e30)
        for k in range(k_slots):
            best_t = jnp.minimum(best_t, tt[:, k])
        return best_t + acc * 1e-30

    def make_fake(kind, kpop=1):
        do_box = kind in ("box", "leaf", "kpop")
        do_leaf = kind in ("leaf", "kpop")

        def run(trips, salt):
            def body(i, best_t):
                nodes = fake_nodes(i + salt, kpop)
                for nd in nodes:
                    row = jnp.take(fat, nd, axis=0)
                    if not do_box:
                        best_t = best_t + jnp.sum(row[:, :4], axis=1) * 1e-30
                    else:
                        best_t = box_leaf(row, best_t, do_leaf)
                return best_t
            return jax.lax.fori_loop(0, trips, body, jnp.full((n,), 1e30))
        return run

    def make_full():
        def run(trips, salt):
            # real traversal, but per-lane max_dist jittered by salt so the
            # relay cache can't replay; trips is not controllable -> report
            # total time and the real trip count separately.
            md = jnp.full((n,), 1e30) * (1.0 + salt.astype(jnp.float32) * 1e-12)
            t, tri = _traverse4(bvh, o, d, any_hit=False, max_dist=md)
            return t + tri.astype(jnp.float32) * 1e-30
        return run

    def slope_time(fn, trips):
        f = jax.jit(fn, static_argnums=0)
        base = jnp.int32(int(time.time()) % 100000)
        # warm BOTH trip counts: static_argnums means f(3*trips) is a
        # separate compilation — warming only one puts ~4s of compile time
        # inside the timed region (CLAUDE.md bench trap #2 variant)
        float(f(trips, base).sum())
        float(f(3 * trips, base + 1).sum())
        t0 = time.time(); float(f(trips, base + 2).sum()); t1 = time.time()
        float(f(3 * trips, base + 3).sum()); t2 = time.time()
        per_step = ((t2 - t1) - (t1 - t0)) / (2 * trips)
        return per_step

    results = {}
    for kind in ("gather", "box", "leaf"):
        ps = slope_time(make_fake(kind), args.trips)
        results[kind] = ps
        print(f"{kind:8s}: {ps * 1e3:7.3f} ms/step", flush=True)
    for kp in (2, 4):
        ps = slope_time(make_fake("kpop", kp), args.trips)
        results[f"kpop{kp}"] = ps
        print(f"kpop{kp:d}   : {ps * 1e3:7.3f} ms/step "
              f"({ps * 1e3 / kp:6.3f} ms/node)", flush=True)

    # full body: time one real traversal (trips = device-measured max pops)
    full = jax.jit(make_full())
    base = jnp.int32(int(time.time()) % 100000)
    float(full(jnp.int32(0), base).sum())
    t0 = time.time(); float(full(jnp.int32(0), base + 1).sum()); t1 = time.time()
    print(f"full traversal: {(t1 - t0) * 1e3:.1f} ms total "
          f"(divide by trip count; leaf-step cost above)", flush=True)
    import json
    print(json.dumps({k: round(v * 1e3, 3) for k, v in results.items()}))


if __name__ == "__main__":
    main()
