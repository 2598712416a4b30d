"""Analytic-primitive acceleration bench: a 10k-sphere field through the
sphere fat-row BVH vs brute force (VERDICT round-1 weak #3: the reference
indexes ALL object types in its accelerators, scene/scenedata.h:12-18;
round 1 brute-forced every analytic primitive O(N*M) per bounce).

Usage: python bench_spheres.py [--spheres 10000] [--size 256] [--cpu]
Prints one JSON line per mode.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def build_scene(n_spheres: int, accel: str):
    import numpy as np

    from craytracer_tpu.scene import SceneBuilder

    rng = np.random.default_rng(7)
    b = SceneBuilder()
    b.add_matte("w", (0.7, 0.7, 0.7))
    b.add_emissive("l", (1, 1, 1), 40.0)
    b.add_rect((-200, 0, -200), (400, 0, 0), (0, 0, 400), "w")
    b.add_rect((-10, 80, -10), (20, 0, 0), (0, 0, 20), "l")
    side = int(np.ceil(n_spheres ** 0.5))
    n = 0
    for i in range(side):
        for j in range(side):
            if n >= n_spheres:
                break
            c = (i * 3.0 - 1.5 * side + rng.uniform(-0.8, 0.8),
                 0.6 + rng.random() * 2.5,
                 j * 3.0 - 1.5 * side + rng.uniform(-0.8, 0.8))
            b.add_sphere(c, 0.4 + rng.random() * 0.5, "w")
            n += 1
    return b.build(accel=accel)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spheres", type=int, default=10000)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--depth", type=int, default=3)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--brute", action="store_true",
                    help="also time the brute-force path (slow)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from craytracer_tpu.camera import Film, generate_rays, make_camera
    from craytracer_tpu.integrator.wavefront import CAMERA_BOUNCE, trace_paths
    from craytracer_tpu.sampling import uniforms

    cam = make_camera((0, 40, 2.0 * args.spheres ** 0.5 + 30), (0, 1, 0))
    film = Film(fov=jnp.float32(np.radians(50.0)), width=args.size,
                height=args.size)
    ids = jnp.arange(film.num_pixels, dtype=jnp.int32)

    modes = [("bvh4s", "bvh4")] + ([("brute", "none")] if args.brute else [])
    for label, accel in modes:
        t0 = time.time()
        scene = build_scene(args.spheres, accel)
        build_s = time.time() - t0
        print(f"# {label}: {args.spheres} spheres, build {build_s:.2f}s "
              f"(sph_bvh={'yes' if scene.sph_bvh is not None else 'no'})",
              file=sys.stderr)

        @jax.jit
        def passes(scene, s0):
            def body(s, carry):
                acc, rays = carry
                jitter = uniforms(0, ids, s0 + s, CAMERA_BOUNCE, 2, 0)
                o, d = generate_rays(cam, film, ids, jitter)
                L, good, m = trace_paths(scene, o, d, 0, ids, s0 + s,
                                         args.depth, with_metrics=True)
                return acc + L, rays + m["rays"] + m["shadow_rays"]

            acc, rays = jax.lax.fori_loop(
                0, args.iters, body,
                (jnp.zeros((film.num_pixels, 3)), jnp.zeros((), jnp.int32)))
            return acc.mean(), rays

        base = int(time.time()) % 1000000  # defeat the axon relay cache
        m, rays = passes(scene, base)
        float(m)  # forced readback (relay acks block_until_ready early)
        dts = []
        for rep in range(2):
            t0 = time.time()
            m, rays = passes(scene, base + (rep + 1) * args.iters)
            float(m)
            dts.append(time.time() - t0)
        rps = int(rays) / min(dts)
        print(json.dumps({
            "metric": f"spheres{args.spheres}_{label}_rays_per_sec",
            "value": round(rps, 1), "unit": "rays/s",
            "vs_baseline": round(rps / 150e6, 4)}))


if __name__ == "__main__":
    main()
