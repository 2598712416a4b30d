"""Part-count sensitivity probe for the partitioned packet kernel.

Question (scripts/tpu_queue_r5.sh lever 1a / VERDICT r4 item 2): bf16 fat
tables would halve part bytes and so halve the part count at 7M (17 -> ~9).
Before paying the kernel surgery, measure what part count is actually WORTH
on hardware: re-partition the same monolithic BVH4 at several budgets and
time the full parts closest-hit on identical production-like rays.

If 2x the parts costs ~nothing, halving them gains ~nothing and bf16 is a
measured negative by proxy (its other effect — halved table DMA — is
bounded by parts * table/688GB/s per dispatch, computed below).

Usage: python profiling/probe_part_count.py [--cache /tmp/scene7m.pkl]
       [--budgets 240,120,60,30] [--n 262144]
"""

import argparse
import pickle
import time

import jax
import jax.numpy as jnp
import numpy as np

from craytracer_tpu.accel.bvh4_parts import partition_bvh4, pallas_parts_closest_hit
from craytracer_tpu.camera import generate_rays
from craytracer_tpu.integrator.wavefront import CAMERA_BOUNCE
from craytracer_tpu.sampling import uniforms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cache", default="/tmp/scene7m.pkl")
    ap.add_argument("--budgets", default="240,120,60,30")
    ap.add_argument("--n", type=int, default=262144)
    ap.add_argument("--bounce", action="store_true",
                    help="probe with bounce-like rays: origins at the "
                         "camera hit points, random unit directions (the "
                         "incoherent regime where part unions are widest)")
    args = ap.parse_args()

    with open(args.cache, "rb") as f:
        scene = pickle.load(f)
    bvh = scene.tri_bvh
    rows, width = bvh.fat.shape
    n_tris = scene.triangles.mat_id.shape[0]
    print(f"scene: {n_tris} tris, fat {rows}x{width} "
          f"({rows * width * 4 / 2**20:.0f} MiB)")

    # production-like rays: Morton-ordered camera batch (the renderer's
    # dispatch order, bench_mesh camera) sized to one wavefront
    from craytracer_tpu.camera import Film, make_camera
    from craytracer_tpu.ops.raysort import sorted_traversal

    n = args.n
    side = int(np.sqrt(n))
    cam = make_camera((0, 40, 3.2 * (n_tris / 1280) ** 0.5 + 40), (0, 2, 0))
    film = Film(fov=jnp.float32(np.radians(50.0)), width=side, height=side)
    code = np.arange(side * side, dtype=np.int64)
    x = np.zeros_like(code)
    y = np.zeros_like(code)
    for b in range(16):
        x |= ((code >> (2 * b)) & 1) << b
        y |= ((code >> (2 * b + 1)) & 1) << b
    pid = (y * side + x).astype(np.int32)
    pix = jnp.asarray(pid)
    jit0 = uniforms(0, pix, 0, CAMERA_BOUNCE, 2, 0)
    o, d = generate_rays(cam, film, pix, jit0)

    # parts must be jit ARGUMENTS (closed-over tables bake into the HLO
    # and blow the relay's remote_compile cap — bench_mesh.py HTTP 413)
    fn = jax.jit(lambda pp, o, d: sorted_traversal(
        lambda a, b: pallas_parts_closest_hit(pp, a, b), o, d))

    if args.bounce:
        parts0 = partition_bvh4(bvh)
        t0_, _ = fn(parts0, o, d)
        hitm = np.asarray(t0_) < 1e17
        hp = np.asarray(o) + np.asarray(t0_)[:, None] * np.asarray(d)
        rng = np.random.default_rng(1)
        nd = rng.normal(size=(n, 3)).astype(np.float32)
        nd /= np.linalg.norm(nd, axis=-1, keepdims=True)
        o = jnp.asarray(np.where(hitm[:, None], hp, np.asarray(o)))
        o = o + 1e-3 * jnp.asarray(nd)
        d = jnp.asarray(nd)
        print(f"bounce-ray probe: {hitm.mean():.2%} lanes seeded at hits")

    for mb in [float(x) for x in args.budgets.split(",")]:
        parts = partition_bvh4(bvh, budget_bytes=int(mb * 2**20))
        total_mb = sum(p.fat.size * 4 for p in parts) / 2**20
        t, tri = fn(parts, o, d)
        float(t.sum())  # warm + readback
        times = []
        for rep in range(3):
            t0 = time.time()
            t, tri = fn(parts, o + 1e-5 * (rep + 1), d)
            float(t.sum())
            times.append(time.time() - t0)
        med = sorted(times)[1]
        dma_ms = total_mb / 1024 / 688 * 1e3
        print(f"budget {mb:6.0f} MiB: {len(parts):3d} parts "
              f"(total {total_mb:5.0f} MiB) -> {med * 1e3:8.1f} ms "
              f"({n / med / 1e6:6.2f}M rays/s; table DMA bound {dma_ms:.1f} ms)",
              flush=True)


if __name__ == "__main__":
    main()
