"""Scaling-efficiency harness (BASELINE: >=85% rays/s scaling at 1 chip /
1 host / N hosts).

Measures the sharded forward pass on meshes of 1, 2, 4, ... devices and
reports throughput scaling efficiency. On the single-TPU environment this
exercises the virtual CPU mesh (the same `shard_map` program that runs on a
pod slice); on real multi-chip hardware the identical code path measures ICI
scaling.

Usage: python bench_scaling.py [--devices 8] [--cpu]
Prints one JSON line per mesh size + a final efficiency summary line.
"""

from __future__ import annotations

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=0, help="max devices (0=all)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend with 8 virtual devices")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    import os

    if args.cpu:
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from __graft_entry__ import _cornell
    from craytracer_tpu.parallel import make_mesh, sharded_render_pass

    n_dev_all = len(jax.devices())
    max_dev = args.devices or n_dev_all
    sizes = []
    d = 1
    while d <= min(max_dev, n_dev_all):
        sizes.append(d)
        d *= 2

    scene, camera, film = _cornell(args.size, args.size)
    n = film.num_pixels
    pixel_ids = jnp.arange(n, dtype=jnp.int32)

    results = {}
    for nd in sizes:
        mesh = make_mesh(nd)
        fwd = sharded_render_pass(mesh, max_depth=args.depth)
        img = fwd(scene, camera, film, pixel_ids, 0, 0)
        img.block_until_ready()
        t0 = time.time()
        for s in range(1, args.iters + 1):
            img = fwd(scene, camera, film, pixel_ids, 0, s)
        img.block_until_ready()
        dt = time.time() - t0
        rps = args.iters * n / dt
        results[nd] = rps
        print(json.dumps({"metric": f"scaling_paths_per_sec_{nd}dev",
                          "value": round(rps, 1), "unit": "paths/s",
                          "vs_baseline": 0.0}))

    if len(sizes) > 1:
        base = results[sizes[0]]
        eff = results[sizes[-1]] / (base * sizes[-1])
        print(json.dumps({"metric": "scaling_efficiency",
                          "value": round(eff, 4), "unit": "fraction",
                          "vs_baseline": round(eff / 0.85, 4)}))


if __name__ == "__main__":
    main()
