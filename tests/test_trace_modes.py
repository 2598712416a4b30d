"""Trace-type parity tests (RAYCAST / WHITTED / sample log / AO)."""

import jax.numpy as jnp
import numpy as np

from craytracer_tpu.integrator.wavefront import trace_paths_logged
from craytracer_tpu.integrator.whitted import trace_raycast, trace_whitted
from craytracer_tpu.scene import SceneBuilder


def _scene_with_mirror():
    b = SceneBuilder()
    b.add_matte("floor", (0.6, 0.6, 0.6))
    b.add_mirror("mir", (0.9, 0.9, 0.9))
    b.add_emissive("lamp", (1, 1, 1), 10.0)
    b.add_rect((-20, 0, -20), (40, 0, 0), (0, 0, 40), "floor")
    b.add_rect((-2, 12, -2), (4, 0, 0), (0, 0, 4), "lamp")
    b.add_sphere((0, 2, 0), 1.0, "mir")
    return b.build()


def _rays(n=64):
    # aimed at open floor at x~6 (clear of the mirror sphere's shadow)
    o = jnp.tile(jnp.asarray([[6.0, 3.0, 8.0]], jnp.float32), (n, 1))
    d = jnp.tile(jnp.asarray([[0.0, -0.35, -0.93]], jnp.float32), (n, 1))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return o, d, jnp.arange(n, dtype=jnp.uint32)


def test_raycast_direct_only():
    scene = _scene_with_mirror()
    o, d, ids = _rays()
    L = trace_raycast(scene, o, d, 0, ids, 0)
    assert np.isfinite(np.asarray(L)).all()
    assert float(np.asarray(L).mean()) > 0.01  # floor lit by the lamp


def test_whitted_mirror_reflects():
    """Whitted continues through the mirror; raycast stops (mirror = black
    except direct, and mirrors get no diffuse direct light)."""
    scene = _scene_with_mirror()
    n = 16
    # rays onto the lower front of the mirror sphere: the reflection
    # deflects downward onto lit floor at (0, 0, ~1.7)
    o = jnp.tile(jnp.asarray([[0.0, 1.5, 5.0]], jnp.float32), (n, 1))
    d = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32), (n, 1))
    ids = jnp.arange(n, dtype=jnp.uint32)
    L_ray = trace_raycast(scene, o, d, 0, ids, 0)
    L_whit = trace_whitted(scene, o, d, 0, ids, 0, max_depth=3)
    assert float(np.asarray(L_ray).mean()) < 1e-4  # mirror: no direct diffuse
    assert float(np.asarray(L_whit).mean()) > 1e-3  # reflection sees the scene


def test_sample_log_shapes_and_consistency():
    from craytracer_tpu.integrator.wavefront import trace_paths

    scene = _scene_with_mirror()
    o, d, ids = _rays(8)
    L, good = trace_paths(scene, o, d, 0, ids, 0, 3)
    L2, good2, log = trace_paths_logged(scene, o, d, 0, ids, 0, 3)
    np.testing.assert_allclose(np.asarray(L), np.asarray(L2), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(good), np.asarray(good2))
    assert log["t"].shape == (4, 8)
    assert log["beta"].shape == (4, 8, 3)
    assert log["direct_contrib"].shape == (4, 8, 3)
    # bounce 0 beta is all ones
    np.testing.assert_allclose(np.asarray(log["beta"][0]), 1.0)


def test_ao_probe():
    from craytracer_tpu.utils.ao import ao_test
    from craytracer_tpu.constants import TMAX

    b = SceneBuilder()
    b.add_matte("m", (0.5, 0.5, 0.5))
    b.add_rect((-10, 0, -10), (20, 0, 0), (0, 0, 20), "m")
    b.add_rect((-10, 5, -10), (20, 0, 0), (0, 0, 20), "m")  # ceiling occluder
    scene = b.build()
    n = 256
    hp = jnp.tile(jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32), (n, 1))
    nrm = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32), (n, 1))
    from craytracer_tpu.sampling import uniforms

    u2 = uniforms(0, jnp.arange(n, dtype=jnp.uint32), 0, 0, 2)
    t = np.asarray(ao_test(scene, hp, nrm, u2))
    # nearly everything occluded by the ceiling at ~5/cos units (grazing
    # directions can slip past the finite rect's edge)
    occluded = t < TMAX
    assert occluded.mean() > 0.7  # analytic escape prob past the rect edge ~0.2
    assert t[occluded].min() > 4.9


def test_compaction_with_per_lane_spp():
    """Per-lane spp_index (spp-batched dispatch) under stream compaction:
    the step must index the full-size spp array by each lane's ORIGINAL
    id after the alive-first permutation halves the working set —
    round-4 regression (crashed with a broadcast error before)."""
    import jax.numpy as jnp
    import numpy as np

    from craytracer_tpu.camera import Film, generate_rays, make_camera
    from craytracer_tpu.integrator.wavefront import CAMERA_BOUNCE, trace_paths
    from craytracer_tpu.sampling import uniforms
    from craytracer_tpu.scene import SceneBuilder

    b = SceneBuilder()
    b.add_matte("w", (0.7, 0.7, 0.7))
    b.add_emissive("l", (1, 1, 1), 20.0)
    b.add_rect((-9, 0, -9), (18, 0, 0), (0, 0, 18), "w")
    b.add_sphere((0.0, 1.0, 0.0), 1.0, "w")
    b.add_rect((-2, 6, -2), (4, 0, 0), (0, 0, 4), "l")
    scene = b.build()
    cam = make_camera((0.0, 3.0, 7.0), (0.0, 1.0, 0.0))
    film = Film(fov=jnp.float32(np.radians(45.0)), width=16, height=16)
    ids = jnp.arange(film.num_pixels, dtype=jnp.int32)
    spp = jnp.full_like(ids, 3)  # per-lane array, constant value
    jitter = uniforms(0, ids, spp, CAMERA_BOUNCE, 2, 0)
    o, d = generate_rays(cam, film, ids, jitter)
    L_c, _ = trace_paths(scene, o, d, 0, ids, spp, 9, compact_at=3)
    L_s, _ = trace_paths(scene, o, d, 0, ids, 3, 9, compact_at=0)
    np.testing.assert_allclose(np.asarray(L_c), np.asarray(L_s),
                               rtol=1e-5, atol=1e-6)
