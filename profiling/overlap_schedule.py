"""Evidence for grad-bucket overlap: where do the all-reduces sit in the
compiled schedule?

Compiles the single-pmean train step and the per-bounce-bucketed one
(parallel/overlap.py) on the 8-virtual-device CPU mesh and counts distinct
all-reduce ops in the optimized HLO.

MEASURED FINDING (2026-08-17; texture-scale re-run 2026-08-19, VERDICT r2
item #7): both paths compile to ONE tuple all-reduce at EVERY measured
gradient volume — a few KB, 12.6 MB (--tex 1024) and 50.3 MB (--tex 2048):
XLA's AllReduceCombiner re-merges the per-bounce buckets regardless of
size on this backend, and the bucketed trace's unrolled per-bounce VJP
costs ~10x HLO lines (28k -> 281k) and 7x step wall. So the bucketed
path buys NOTHING on this compiler: the merged tuple all-reduce is
already issued once at the end of backward, and on TPU the
latency-hiding scheduler overlaps that single async collective with
remaining compute without any manual bucketing. single-pmean stays the
production default; bucketed_train_step remains as the measured-negative
record + the hook if a future XLA exposes a combiner threshold knob on
TPU. tests/test_overlap.py proves gradient equivalence of the paths.

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


def tiny_scene_big_tex(k=1024):
    """The overlap regime the north star names: a texture-scale gradient
    (k x k x 3 f32 = 12.6 MB at 1024) riding the floor material."""
    from craytracer_tpu.scene import SceneBuilder

    b = SceneBuilder()
    tex = np.linspace(0.2, 0.8, k * k * 3, dtype=np.float32).reshape(k, k, 3)
    tid = b.add_texture("atlas", tex)
    b.add_matte("w", (0.7, 0.7, 0.7), diffuse_tex=tid)
    b.add_matte("r", (0.6, 0.1, 0.1))
    b.add_emissive("l", (1.0, 1.0, 1.0), 6.0)
    b.add_rect((-2, 0, -2), (4, 0, 0), (0, 0, 4), "w")
    b.add_rect((-2, 4, -2), (4, 0, 0), (0, 0, 4), "w")
    b.add_sphere((0.0, 1.0, 0.0), 0.8, "r")
    b.add_rect((-0.5, 3.9, -0.5), (1, 0, 0), (0, 0, 1), "l")
    return b.build()


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--tex", type=int, default=0,
                    help="side of a k x k x 3 floor texture whose texels "
                         "join the gradient (0 = the original KB-scale "
                         "scene; 1024 = the 12.6 MB texture-atlas regime)")
    a = ap.parse_args()

    scene = tiny_scene_big_tex(a.tex) if a.tex else _tiny_scene()
    gbytes = sum(np.asarray(l).nbytes
                 for l in jax.tree_util.tree_leaves(scene))
    print(f"scene leaves {gbytes / 1e6:.1f} MB "
          f"({'texture-atlas regime' if a.tex else 'KB regime'})")
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
