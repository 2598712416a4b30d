"""Evidence for grad-bucket overlap: where do the all-reduces sit in the
compiled schedule?

Compiles the single-pmean train step and the per-bounce-bucketed one
(parallel/overlap.py) on the 8-virtual-device CPU mesh and counts distinct
all-reduce ops in the optimized HLO.

MEASURED FINDING (2026-08-17, this host): both compile to ONE tuple
all-reduce — XLA's AllReduceCombiner pass re-merges the per-bounce buckets
because this test scene's whole gradient tree is a few KB, far below the
combine threshold. That is the right call by the compiler: bucket overlap
only pays when per-bounce gradient volume is large enough to hide ICI time
(e.g. recovering multi-MB texture atlases), and in that regime the
combiner's byte threshold keeps the buckets separate and the latency-hiding
scheduler can overlap them with the remaining backward segments. Secondary
cost worth knowing: the bucketed trace must unroll the bounce loop (custom
VJP per bounce), inflating optimized HLO ~5x (24k -> 122k lines here) and
CPU step wall ~14x — so single-pmean stays the production default and
bucketed_train_step is the opt-in for texture-scale inverse problems.
tests/test_overlap.py proves gradient equivalence of the two paths.

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python profiling/overlap_schedule.py
"""
import sys

sys.path.insert(0, ".")
import tests.conftest  # noqa: F401  (CPU backend, 8 virtual devices)

import jax
import jax.numpy as jnp
import numpy as np

from craytracer_tpu.camera import Film, make_camera
from craytracer_tpu.parallel.overlap import bucketed_train_step
from craytracer_tpu.parallel.sharded import make_mesh, sharded_train_step
from tests.test_overlap import _tiny_scene


def analyze(name, fn, args):
    import time

    lowered = fn.lower(*args)
    compiled = lowered.compile()
    hlo = compiled.as_text()
    n_ar = hlo.count(" all-reduce(")
    print(f"{name}: {n_ar} distinct all-reduce ops, "
          f"{len(hlo.splitlines())} HLO lines")
    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        jax.block_until_ready(fn(*args))
        best = min(best, time.time() - t0)
    print(f"  step wall (CPU 8-dev mesh): {best * 1e3:.0f} ms")
    return n_ar


def main():
    scene = _tiny_scene()
    cam = make_camera((0, 2.0, 6.0), (0, 1.0, 0))
    film = Film(fov=jnp.float32(np.radians(45.0)), width=16, height=16)
    ids = jnp.arange(film.num_pixels, dtype=jnp.int32)
    target = jnp.zeros((film.num_pixels, 3), jnp.float32)
    mesh = make_mesh(8)
    args = (scene, cam, film, ids, 7, 0, target)

    analyze("single-pmean", sharded_train_step(mesh, 3), args)
    analyze("bucketed    ", bucketed_train_step(mesh, 3), args)


if __name__ == "__main__":
    main()
