"""Empirically find the VMEM-residency ceiling for the Pallas traversal's
fat node table on this TPU (the generic guide says ~16 MB/core, but a
19.9 MB table compiled and ran on v5e — probe the real limit).

FINDINGS (2026-08-19, v5e via axon relay):
- Without compiler_params, fresh compiles fail above ~16 MiB of resident
  table (32000 rows OK, 32768 FAIL) — that is Mosaic's DEFAULT vmem
  limit, not the hardware. (The 19.9 MB success was a remote compile
  cache hit from an earlier session.)
- With pltpu.CompilerParams(vmem_limit_bytes=127 MiB), tables up to
  124 MiB (253952 rows) compile AND run: v5e VMEM is 128 MiB.
- accel/pallas_bvh4.py now always passes the knob; its auto-selection
  budget is 120 MiB ≈ 1.9M tris at leaf2.

Builds synthetic fat tables of increasing row counts (valid single-leaf
trees: root with 4 leaf children, rest of the rows unreachable padding so
traversal work stays O(1)) and tries one tiny compiled dispatch each.
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp

from craytracer_tpu.accel.bvh4 import BVH4Arrays
from craytracer_tpu.accel.pallas_bvh4 import pallas_bvh4_closest_hit


def make_table(rows: int) -> BVH4Arrays:
    fat = np.zeros((rows, 128), np.float32)
    # root: 4 children, all leaves (child id -1), each with one degenerate
    # triangle that can never hit (tid -1 in the id column)
    fat[0, 0:12] = -1.0   # mins
    fat[0, 12:24] = 1.0   # maxs
    fat[0, 24:28] = -1.0  # no internal children
    for k in range(8):
        fat[0, 28 + k * 10 + 9] = -1.0  # tid = -1 pad
    # unreachable rows stay zero
    return BVH4Arrays(fat=jnp.asarray(fat), n_tris=1, leaf_size=2,
                      stack_size=16)


def main():
    o = jnp.zeros((256, 3), jnp.float32).at[:, 2].set(-5.0)
    d = jnp.zeros((256, 3), jnp.float32).at[:, 2].set(1.0)
    for mb in [16, 20, 24, 32, 48, 64, 96]:
        rows = mb * 1024 * 1024 // (128 * 4)
        bvh = make_table(rows)
        ok = False
        for attempt in range(2):
            t0 = time.time()
            try:
                t, tri = pallas_bvh4_closest_hit(bvh, o, d)
                v = float(t[0])
                print(f"{mb:4d} MB ({rows} rows): OK t={v:.3g} "
                      f"({time.time()-t0:.1f}s)", flush=True)
                ok = True
                break
            except Exception as e:
                msg = str(e).split(chr(10))[0][:160]
                print(f"{mb:4d} MB ({rows} rows) try{attempt}: FAIL "
                      f"{type(e).__name__}: {msg}", flush=True)
        if not ok:
            break


if __name__ == "__main__":
    main()
