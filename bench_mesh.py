"""Large-mesh throughput bench: San-Miguel-class triangle counts through the
BVH path (SURVEY.md §7 step 6 "meshes at scale").

Builds a procedural city of icospheres (default ~327k triangles, --tris to
scale up), renders on the available backend, and prints one JSON line.

Usage: python bench_mesh.py [--tris 327680] [--size 256] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def build_scene(target_tris: int, accel: str = "bvh",
                warm_build: bool = False):
    import numpy as np

    sys.path.insert(0, "scenes")
    from make_fixtures import icosphere

    from craytracer_tpu.scene import SceneBuilder

    v, f = icosphere(3)  # 1280 tris per sphere
    per = f.shape[0]
    count = max(1, target_tris // per)
    grid = int(np.ceil(np.sqrt(count)))

    b = SceneBuilder()
    b.add_matte("w", (0.7, 0.7, 0.7))
    b.add_emissive("l", (1, 1, 1), 40.0)
    b.add_rect((-200, 0, -200), (400, 0, 0), (0, 0, 400), "w")
    b.add_rect((-10, 80, -10), (20, 0, 0), (0, 0, 20), "l")

    rng = np.random.default_rng(0)
    v0s, v1s, v2s = [], [], []
    n = 0
    for i in range(grid):
        for j in range(grid):
            if n >= count:
                break
            c = np.array([i * 6.0 - 3 * grid, 1.0 + rng.random() * 2, j * 6.0 - 3 * grid])
            s = 0.8 + rng.random()
            w = v * s + c
            v0s.append(w[f[:, 0]])
            v1s.append(w[f[:, 1]])
            v2s.append(w[f[:, 2]])
            n += 1
    b.add_triangles_array(np.concatenate(v0s), np.concatenate(v1s),
                          np.concatenate(v2s), "w")
    t0 = time.time()
    scene = b.build(accel=accel)
    build_s = time.time() - t0
    if warm_build:
        # Second build with every buffer already faulted in: the steady-
        # state number. This host's hypervisor hands back freed pages and
        # re-faults them at ~us/page, so a process's FIRST large build
        # pays a one-time page-fault tax unrelated to the builder itself.
        t0 = time.time()
        scene = b.build(accel=accel)
        build_s = (build_s, time.time() - t0)
    return scene, scene.triangles.mat_id.shape[0], build_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tris", type=int, default=327680)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--accel", default="bvh",
                    help="bvh | bvh4 | bvh4q | binned | grid | none")
    ap.add_argument("--order", default="morton",
                    help="pixel dispatch order: morton | scan (morton makes "
                         "each traversal block a compact tile; bit-identical "
                         "image)")
    ap.add_argument("--warm-build", action="store_true",
                    help="build twice, report (cold, warm) build seconds")
    ap.add_argument("--spp-batch", type=int, default=1,
                    help="trace B spp per dispatch (lanes = B * pixels): "
                         "traversal per-step cost is gather-LATENCY bound "
                         "and nearly flat in lane count, so batching spp "
                         "amortizes it (profiling/README.md)")
    ap.add_argument("--image", default="", help="save a PNG of the render")
    ap.add_argument("--scene-cache", default="",
                    help="pickle path: save the built scene on first run, "
                         "load it on later runs (skips the multi-minute "
                         "host build + page-fault tax at San-Miguel scale)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from craytracer_tpu.camera import Film, make_camera
    from craytracer_tpu.camera import generate_rays
    from craytracer_tpu.integrator.wavefront import CAMERA_BOUNCE, trace_paths
    from craytracer_tpu.sampling import uniforms

    import os
    import pickle

    if args.scene_cache and os.path.exists(args.scene_cache):
        t0 = time.time()
        with open(args.scene_cache, "rb") as f:
            scene = pickle.load(f)
        # caches written before BVH*Arrays.stack_size fall back to the
        # class default (128); recompute the per-tree bound host-side
        tb = getattr(scene, "tri_bvh", None)
        if tb is not None and hasattr(tb, "fat") and hasattr(tb, "stack_size"):
            from craytracer_tpu.accel.bvh4 import BVH4Arrays, _stack_bound
            from craytracer_tpu.accel.bvh import BVHArrays, _stack_bound_bin

            if isinstance(tb, BVH4Arrays):
                scene = scene.replace(tri_bvh=tb.replace(
                    stack_size=_stack_bound(np.asarray(tb.fat))))
                # caches from before Scene.tri_parts: cut oversized fat
                # tables for the partitioned packet kernel (build.py does
                # this for fresh builds)
                from craytracer_tpu.accel.bvh4_parts import (
                    PART_BUDGET_BYTES, partition_bvh4)

                if (getattr(scene, "tri_parts", None) is None
                        and scene.tri_bvh.fat.size * 4 > PART_BUDGET_BYTES):
                    t0 = time.time()
                    scene = scene.replace(
                        tri_parts=partition_bvh4(scene.tri_bvh))
                    print(f"# partitioned fat table into "
                          f"{len(scene.tri_parts)} parts in "
                          f"{time.time() - t0:.1f}s", file=sys.stderr)
            elif isinstance(tb, BVHArrays):
                scene = scene.replace(tri_bvh=tb.replace(
                    stack_size=_stack_bound_bin(np.asarray(tb.fat))))
        scene = jax.tree_util.tree_map(jnp.asarray, scene)
        n_tris, build_s = scene.triangles.mat_id.shape[0], 0.0
        print(f"# scene: {n_tris} triangles, loaded from cache in "
              f"{time.time() - t0:.1f}s", file=sys.stderr)
    else:
        scene, n_tris, build_s = build_scene(args.tris, args.accel,
                                             args.warm_build)
        if args.scene_cache:
            host = jax.tree_util.tree_map(np.asarray, scene)
            with open(args.scene_cache, "wb") as f:
                pickle.dump(host, f, protocol=4)
    print(f"# scene: {n_tris} triangles, BVH build {build_s}s", file=sys.stderr)

    # HBM budget guard (SURVEY.md §7 step 6 "triangle count vs HBM"):
    # sum every device leaf; v5e has 16 GB and the wavefront state adds
    # ~20 arrays x N lanes on top.
    scene_bytes = sum(
        np.asarray(l).nbytes for l in jax.tree_util.tree_leaves(scene))
    state_bytes = 24 * 4 * args.size * args.size
    budget = 16e9
    print(f"# HBM: scene {scene_bytes / 1e9:.2f} GB + state "
          f"{state_bytes / 1e9:.2f} GB (budget {budget / 1e9:.0f} GB)",
          file=sys.stderr)
    if scene_bytes + state_bytes > 0.8 * budget:
        print("# HBM guard: scene exceeds 80% of device memory - aborting "
              "before a device OOM wedges the tunnel", file=sys.stderr)
        sys.exit(3)

    # Dispatch-time probe (the axon relay kills dispatches over ~60-120s
    # and the worker can wedge for hours — CLAUDE.md): time ONE bare
    # traversal on a small ray batch and extrapolate a full pass before
    # committing to the multi-pass dispatch.
    if not args.cpu and n_tris > 0:
        from craytracer_tpu.accel import bvh4 as _b4

        if args.accel in ("bvh4", "binned"):
            import jax as _jax

            probe_arg = None
            rngp = np.random.default_rng(0)
            if args.accel == "binned":
                # binned cost is COHERENCE-dependent: random rays are its
                # worst case (block union ~ all treelets) and overestimate
                # the real Morton-tiled render ~10x. Probe with a compact
                # camera-cone bundle instead.
                eye = np.array([0.0, 30.0, 60.0], np.float32)
                op = jnp.asarray(np.broadcast_to(eye, (4096, 3)).copy())
                t = rngp.normal(0, 2, (4096, 3)).astype(np.float32)
                dp = t - eye
                dp = jnp.asarray(dp / np.linalg.norm(dp, axis=-1,
                                                     keepdims=True))
            else:
                op = jnp.asarray(
                    rngp.normal(0, 30, (4096, 3)).astype(np.float32))
                dp = rngp.normal(size=(4096, 3)).astype(np.float32)
                dp = jnp.asarray(dp / np.linalg.norm(dp, axis=-1,
                                                     keepdims=True))
            # tri_bvh must be an ARGUMENT: a closed-over tree is baked
            # into the HLO as literal constants and a 7M-tri table blows
            # the relay's remote_compile request cap (HTTP 413).
            if args.accel == "binned":
                from craytracer_tpu.accel.binned import binned_closest_hit
                import jax.lax as _lax

                f = _jax.jit(lambda tb, o, d: binned_closest_hit(
                    tb, o, d, mxu=True, precision=_lax.Precision.HIGH))
            else:
                # Mirror the production selection (ops/intersect.py): the
                # Pallas packet kernel engages automatically on TPU when
                # the fat table is VMEM-resident-sized — probing the XLA
                # loop instead would abort runs the kernel handles fine.
                from craytracer_tpu.accel.pallas_bvh4 import fits_vmem

                gate = os.environ.get("CRAYTRACER_PALLAS_TRAVERSAL", "auto")
                on_tpu = gate == "1" or (gate != "0"
                                         and _jax.default_backend() == "tpu")
                use_pallas = on_tpu and fits_vmem(scene.tri_bvh)
                use_parts = (on_tpu and not use_pallas
                             and getattr(scene, "tri_parts", None)
                             is not None)
                if use_parts:
                    from craytracer_tpu.accel.bvh4_parts import (
                        pallas_parts_closest_hit)
                    from craytracer_tpu.ops.raysort import sorted_traversal

                    # parts must be an ARGUMENT too (same HTTP 413 trap
                    # as tb: closed-over trees bake into the HLO)
                    f = _jax.jit(lambda pp, o, d: sorted_traversal(
                        lambda a, b: pallas_parts_closest_hit(pp, a, b),
                        o, d))
                    probe_arg = scene.tri_parts
                elif use_pallas:
                    from craytracer_tpu.accel.pallas_bvh4 import (
                        pallas_bvh4_closest_hit)
                    from craytracer_tpu.ops.raysort import sorted_traversal

                    f = _jax.jit(lambda tb, o, d: sorted_traversal(
                        lambda a, b: pallas_bvh4_closest_hit(tb, a, b), o, d))
                else:
                    f = _jax.jit(
                        lambda tb, o, d: _b4.bvh4_closest_hit(tb, o, d))
            if probe_arg is None:
                probe_arg = scene.tri_bvh
            float(f(probe_arg, op, dp)[0].min())  # compile + warm
            t0 = time.time()
            float(f(probe_arg, op, dp * (1 + 1e-6))[0].min())
            walk_s = time.time() - t0
            # a pass is ~2*depth walks; timed dispatches run 3*iters passes
            est = walk_s * 2 * args.depth * 3 * args.iters
            print(f"# probe: one traversal {walk_s:.2f}s -> est worst "
                  f"dispatch {est:.0f}s", file=sys.stderr)
            if est > 50:
                print("# dispatch guard: projected dispatch exceeds the "
                      "relay kill threshold; rerun with smaller --iters/"
                      "--depth/--size", file=sys.stderr)
                sys.exit(4)

    cam = make_camera((0, 40, 3.2 * (n_tris / 1280) ** 0.5 + 40), (0, 2, 0))
    film = Film(fov=jnp.float32(np.radians(50.0)), width=args.size, height=args.size)
    if args.order == "morton":
        w = args.size
        bits = max(int(np.ceil(np.log2(max(w, 2)))), 1)
        code = np.arange(1 << (2 * bits), dtype=np.int64)
        mx = np.zeros_like(code)
        my = np.zeros_like(code)
        for bb in range(bits):
            mx |= ((code >> (2 * bb)) & 1) << bb
            my |= ((code >> (2 * bb + 1)) & 1) << bb
        perm = (my * w + mx)[(mx < w) & (my < w)].astype(np.int32)
        ids = jnp.asarray(perm)
    else:
        perm = None
        ids = jnp.arange(film.num_pixels, dtype=jnp.int32)

    B = max(1, args.spp_batch)
    npix = film.num_pixels
    ids_b = jnp.tile(ids, B)

    # same fast-path decision the production Renderer takes (round-5
    # fused shade kernel; this scene is matte + one rect lamp -> "shade")
    from craytracer_tpu.integrator.pallas_shade import production_fast_shade

    fast = False if args.cpu else production_fast_shade(scene)
    if fast:
        print(f"# fast_shade mode: {fast}", file=sys.stderr)

    @jax.jit
    def passes(scene, s0, iters):
        def body(s, carry):
            acc, rays = carry
            # B spp in one dispatch: per-lane spp index s0 + s*B + replica
            spp_lane = s0 + s * B + jnp.repeat(
                jnp.arange(B, dtype=jnp.int32), npix)
            jitter = uniforms(0, ids_b, spp_lane, CAMERA_BOUNCE, 2, 0)
            o, d = generate_rays(cam, film, ids_b, jitter)
            L, good, m = trace_paths(scene, o, d, 0, ids_b, spp_lane,
                                     args.depth, with_metrics=True,
                                     fast_shade=fast)
            acc = acc + L.reshape(B, npix, 3).sum(axis=0)
            return acc, rays + m["rays"] + m["shadow_rays"]

        return jax.lax.fori_loop(
            0, iters, body,
            (jnp.zeros((film.num_pixels, 3)), jnp.zeros((), jnp.int32)))

    import time as _t
    base = int(_t.time()) % 1000000  # defeat the axon relay result cache
    acc, rays = passes(scene, base, args.iters)
    float(acc.mean())  # forced readback (relay acks block_until_ready early)

    def timed(s0, iters):
        t0 = time.time()
        acc, rays = passes(scene, s0, iters)
        f = float(acc.mean())
        return time.time() - t0, int(rays), acc

    # Two-point slope timing: the axon relay adds an erratic per-call
    # latency; timing (3k iters) - (k iters) cancels it and leaves pure
    # on-device throughput.
    rps_best = 0.0
    for rep in range(2):
        dt1, rays1, _ = timed(base + (4 * rep + 1) * args.iters, args.iters)
        dt3, rays3, acc = timed(base + (4 * rep + 2) * args.iters,
                                3 * args.iters)
        if dt3 > dt1:
            rps_best = max(rps_best, (rays3 - rays1) / (dt3 - dt1))
    rps = rps_best
    assert not bool(jnp.isnan(acc).any())
    bs = (round(build_s[0], 3) if isinstance(build_s, tuple)
          else round(build_s, 3))
    print(json.dumps({"accel": args.accel, "tris": n_tris,
                      "build_s": bs,
                      **({"build_warm_s": round(build_s[1], 3)}
                         if isinstance(build_s, tuple) else {}),
                      "metric": f"mesh_{n_tris}tris_rays_per_sec",
                      "value": round(rps, 1), "unit": "rays/s",
                      "vs_baseline": round(rps / 150e6, 4)}))
    if args.image:
        from PIL import Image

        from craytracer_tpu.utils.tonemap import tone_map

        img_flat = np.asarray(tone_map(acc / args.iters))
        if perm is not None:
            inv = np.empty_like(perm)
            inv[perm] = np.arange(perm.shape[0], dtype=np.int32)
            img_flat = img_flat[inv]
        img = img_flat.reshape(args.size, args.size, 3)
        Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(args.image)


if __name__ == "__main__":
    main()
