"""Benchmark: forward path-tracing throughput on the Cornell box.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured rays/s divided by the 150M rays/s/chip north-star
target (BASELINE.md; the reference publishes no numbers of its own).

The HEADLINE metric runs the PRODUCTION pipeline: the reference's own
cornell_box.txt through io.scenefile.load_scene_file (parser -> scene
build -> accel select -> wavefront integrator). A secondary
"integrator ceiling" number keeps the round-1/2 hand-built scene for
continuity (it brute-forces 8 primitives with no parser in the loop);
both are printed, the production number is `value`.

Rays/s counts every traced ray: closest-hit rays for live lanes at each
bounce plus NEE shadow rays — measured on-device, not assumed.
"""

from __future__ import annotations

import json
import time

import numpy as np

TARGET_RAYS_PER_SEC = 150e6


def main():
    import argparse
    import os
    import signal
    import sys

    ap = argparse.ArgumentParser()
    ap.add_argument("--profile", default="",
                    help="capture a JAX profiler trace into this directory "
                         "(the gperftools/-lprofiler analog, Makefile:2)")
    args = ap.parse_args()

    # Watchdog: the axon TPU tunnel can wedge (hangs instead of erroring);
    # fail loudly rather than hanging the driver.
    def _timeout(signum, frame):
        print("bench: TPU unreachable (tunnel hang) — aborting", file=sys.stderr)
        os._exit(1)

    signal.signal(signal.SIGALRM, _timeout)
    signal.alarm(480)

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _cornell
    from craytracer_tpu.camera import generate_rays
    from craytracer_tpu.integrator.wavefront import trace_paths
    from craytracer_tpu.sampling import uniforms
    from craytracer_tpu.integrator.wavefront import CAMERA_BOUNCE

    size = 512
    max_depth = 5
    iters = 16  # spp per timed call, looped ON DEVICE so host/tunnel round
    # trips are amortized; each pass uses a distinct spp_index -> distinct
    # RNG -> distinct work (nothing cacheable)

    from craytracer_tpu.integrator.pallas_shade import production_fast_shade

    def measure(scene, camera, film, profile_dir=""):
        n = film.num_pixels
        pixel_ids = jnp.arange(n, dtype=jnp.int32)
        # THE production decision (shared helper: backend, env override,
        # estimator/trace gates, and the in-kernel-raygen camera gates)
        fast = production_fast_shade(scene, camera, film)

        def many_passes(scene, camera, film, pixel_ids, spp0):
            def body(s, carry):
                acc, total_rays = carry
                if fast == "bounce":
                    # fully-fused pass: raygen joins the megakernel
                    from craytracer_tpu.integrator.pallas_shade import \
                        fused_pass

                    L, good, m = fused_pass(
                        scene, None, None, pixel_ids, spp0 + s, 0,
                        max_depth, raygen="plain", camera=camera,
                        film=film, width=int(film.width))
                else:
                    jitter = uniforms(0, pixel_ids, spp0 + s,
                                      CAMERA_BOUNCE, 2, 0)
                    o, d = generate_rays(camera, film, pixel_ids, jitter)
                    L, good, m = trace_paths(scene, o, d, 0, pixel_ids,
                                             spp0 + s, max_depth,
                                             with_metrics=True,
                                             fast_shade=fast)
                return acc + L, total_rays + m["rays"] + m["shadow_rays"]

            init = (jnp.zeros((n, 3), jnp.float32), jnp.zeros((), jnp.int32))
            acc, total = jax.lax.fori_loop(0, iters, body, init)
            # Reduce to scalars on device: timing MUST fetch a value
            # derived from the result — the axon relay acknowledges
            # block_until_ready before execution finishes, so un-fetched
            # timings are fiction.
            return acc.mean(), total

        step = jax.jit(many_passes)
        acc, rays = step(scene, camera, film, pixel_ids, 0)  # compile+warm
        float(acc)

        # Base the spp offset on wall time so no two invocations ever
        # issue identical device calls: the axon relay caches results for
        # repeated identical executables+inputs and replies absurdly
        # fast, which round 1 measured as a fake 12x speedup.
        base = int(time.time()) % 1000000
        times = []
        if profile_dir:
            with jax.profiler.trace(profile_dir):
                acc, rays = step(scene, camera, film, pixel_ids,
                                 base + 99 * iters)
                float(acc)
        # Median of 5 independently-dispatched runs (distinct spp offsets
        # -> distinct RNG -> nothing cacheable), spread recorded: a single
        # noisy dispatch must not set the record either way (round-4's
        # driver record landed 13% under the same-day in-session number
        # on one bad session; median + spread makes the variance visible).
        reps = 5
        for rep in range(reps):
            t0 = time.time()
            acc, rays = step(scene, camera, film, pixel_ids,
                             base + (rep + 1) * iters)
            float(acc)  # forced readback: includes one tunnel RTT
            times.append(time.time() - t0)
        med = sorted(times)[len(times) // 2]
        r = int(rays)
        return r / med, {"reps": reps,
                         "rays_per_sec_min": round(r / max(times), 1),
                         "rays_per_sec_max": round(r / min(times), 1)}

    # HEADLINE: the reference's own scene file through the production
    # pipeline (parser -> build -> accel -> wavefront).
    from craytracer_tpu.io.scenefile import load_scene_file

    scene_p, cam_p, film_p = load_scene_file(
        os.environ.get("CRAY_BENCH_SCENE", "/root/reference/cornell_box.txt"))
    film_p = film_p.replace(width=size, height=size)
    rps, spread = measure(scene_p, cam_p, film_p, args.profile)

    # secondary: the round-1/2 hand-built scene, kept for cross-round
    # continuity. NOTE since round 5 this is no longer a "ceiling": it
    # carries a sphere, so it takes the fused-SHADE path while the
    # production scene (rects+tris only) takes the faster whole-BOUNCE
    # kernel — the production number can legitimately exceed it.
    scene_c, cam_c, film_c = _cornell(size, size)
    rps_ceiling, _ = measure(scene_c, cam_c, film_c)

    signal.alarm(0)
    print(json.dumps({
        "metric": "cornell_fwd_rays_per_sec_per_chip",
        "value": round(rps, 1),
        "unit": "rays/s",
        "pipeline": "load_scene_file(cornell_box.txt) -> build -> wavefront",
        "integrator_ceiling_rays_per_sec": round(rps_ceiling, 1),
        "timing": "median of %d dispatches" % spread["reps"],
        "spread": spread,
        "vs_baseline": round(rps / TARGET_RAYS_PER_SEC, 4),
    }))


if __name__ == "__main__":
    main()
