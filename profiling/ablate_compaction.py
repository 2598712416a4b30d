"""Stream-compaction A/B at deep depth (VERDICT r3 weak #7: compact_at=4
is a hardcoded heuristic with no recorded TPU measurement).

Renders Cornell (brute-force triangles path) and the 327k-tri mesh
(packet-kernel path) at max_depth 8 and 10 with compact_at in
{0 (off), 2, 4, 6} and reports rays/s via the production metrics
counters with two-point slope timing.

Run on TPU: python profiling/ablate_compaction.py [--quick]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "scenes")


def bench(scene, cam, film, depth, compact_at, iters=2):
    from craytracer_tpu.camera import generate_rays
    from craytracer_tpu.integrator.wavefront import CAMERA_BOUNCE, trace_paths
    from craytracer_tpu.sampling import uniforms

    ids = jnp.arange(film.num_pixels, dtype=jnp.int32)

    @jax.jit
    def passes(scene, s0, n):
        def body(s, carry):
            acc, rays = carry
            spp = jnp.full_like(ids, s0 + s)
            jitter = uniforms(0, ids, spp, CAMERA_BOUNCE, 2, 0)
            o, d = generate_rays(cam, film, ids, jitter)
            L, good, m = trace_paths(scene, o, d, 0, ids, spp, depth,
                                     with_metrics=True,
                                     compact_at=compact_at)
            return acc + L.sum(), rays + m["rays"] + m["shadow_rays"]

        return jax.lax.fori_loop(0, n, body,
                                 (jnp.zeros(()), jnp.zeros((), jnp.int32)))

    base = int(time.time()) % 100000
    acc, _ = passes(scene, base, iters)
    float(acc)
    best = 0.0
    for rep in range(2):
        t0 = time.time()
        a1, r1 = passes(scene, base + 7 * rep + 1, iters)
        float(a1)
        dt1 = time.time() - t0
        t0 = time.time()
        a3, r3 = passes(scene, base + 7 * rep + 3, 3 * iters)
        float(a3)
        dt3 = time.time() - t0
        if dt3 > dt1:
            best = max(best, (int(r3) - int(r1)) / (dt3 - dt1))
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--json", default="")
    args = ap.parse_args()

    from craytracer_tpu.camera import Film, make_camera
    from craytracer_tpu.io.scenefile import load_scene_file

    results = {}

    # Cornell (brute-force path, RR-heavy paths in a closed box)
    scene, cam, film = load_scene_file("/root/reference/cornell_box.txt")
    film = Film(fov=film.fov, width=256, height=256)
    for depth in (8,) if args.quick else (8, 10):
        for ca in (0, 2, 4, 6):
            r = bench(scene, cam, film, depth, ca)
            key = f"cornell_d{depth}_compact{ca}"
            results[key] = round(r, 1)
            print(key, f"{r/1e6:.2f}M rays/s", flush=True)

    # mesh scene (packet-kernel path, most paths escape early)
    scene, cam, film = load_scene_file("scenes/bench_mesh.txt", accel="bvh4")
    film = Film(fov=film.fov, width=256, height=256)
    for depth in (8,) if args.quick else (8, 10):
        for ca in (0, 2, 4, 6):
            r = bench(scene, cam, film, depth, ca)
            key = f"mesh327k_d{depth}_compact{ca}"
            results[key] = round(r, 1)
            print(key, f"{r/1e6:.3f}M rays/s", flush=True)

    if args.json:
        json.dump(results, open(args.json, "w"), indent=1)
        print("wrote", args.json)


if __name__ == "__main__":
    main()
