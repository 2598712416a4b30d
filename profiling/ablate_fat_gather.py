"""Fat-row gather microbench: cost vs row width, alignment, and locality.

The traversal's one-gather-per-step design makes jnp.take(fat, ids) THE
per-step primitive. This measures its cost at N=262k lanes as a function
of (a) row width in f32 columns (128 / 188 = FAT_WIDTH / 192 / 256), and
(b) index locality (ids drawn from a window of W rows around a shared
per-step base: W = m (fully random), 4096, 256, 1 (broadcast row)).

Usage: python profiling/ablate_fat_gather.py [--cpu] [--lanes 262144]
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--lanes", type=int, default=262144)
    ap.add_argument("--rows", type=int, default=21845)
    ap.add_argument("--trips", type=int, default=24)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    n = args.lanes
    m = args.rows
    lane = jnp.arange(n, dtype=jnp.uint32)

    def run_case(width, window):
        table = jnp.asarray(
            np.random.default_rng(0).random((m, width), np.float32))

        def body(i, acc):
            h = lane * jnp.uint32(0x9E3779B9) + i.astype(jnp.uint32) * jnp.uint32(0x85EBCA6B)
            h = h ^ (h >> 16)
            h = h * jnp.uint32(0x7FEB352D)
            base = (i.astype(jnp.uint32) * jnp.uint32(2654435761)) % jnp.uint32(max(1, m - window))
            ids = (base + h % jnp.uint32(window)).astype(jnp.int32)
            row = jnp.take(table, ids, axis=0)
            return acc + jnp.sum(row[:, :4], axis=1) * 1e-30

        def run(trips, salt):
            return jax.lax.fori_loop(
                salt, salt + trips, body, jnp.zeros((n,)))

        f = jax.jit(run, static_argnums=0)
        base = int(time.time()) % 100000
        float(f(args.trips, jnp.int32(base)).sum())
        t0 = time.time(); float(f(args.trips, jnp.int32(base + 7)).sum()); t1 = time.time()
        float(f(3 * args.trips, jnp.int32(base + 13)).sum()); t2 = time.time()
        per = ((t2 - t1) - (t1 - t0)) / (2 * args.trips)
        gb = n * width * 4 / 1e9
        print(f"width {width:4d} window {window:6d}: {per * 1e3:8.3f} ms/gather "
              f"({gb / max(per, 1e-9):6.1f} GB/s)", flush=True)
        return per

    out = {}
    for width in (128, 188, 192, 256):
        for window in (m, 4096, 256, 1):
            out[f"w{width}_win{window}"] = round(run_case(width, window) * 1e3, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
