"""Intersect diagnostics (utils/stats.py): the reference's per-object
intersection-test counters and traversal breakdown (intersect.h:363-364,
shapes/shapes.cpp:3-6) as an explicit stats pass."""

import numpy as np
import jax.numpy as jnp

from craytracer_tpu.camera import Film, generate_rays, make_camera
from craytracer_tpu.sampling import uniforms
from craytracer_tpu.scene import SceneBuilder
from craytracer_tpu.utils.stats import format_stats, intersect_stats


def _mesh_scene(accel):
    rng = np.random.default_rng(0)
    b = SceneBuilder()
    b.add_matte("w", (0.7, 0.7, 0.7))
    b.add_emissive("l", (1, 1, 1), 20.0)
    b.add_rect((-20, 0, -20), (40, 0, 0), (0, 0, 40), "w")
    b.add_rect((-2, 15, -2), (4, 0, 0), (0, 0, 4), "l")
    base = rng.normal(0, 3, (300, 3)) + np.array([0, 3, 0])
    b.add_triangles_array(base, base + rng.normal(0, 0.5, (300, 3)),
                          base + rng.normal(0, 0.5, (300, 3)), "w")
    return b.build(accel=accel)


def _camera_rays(film):
    cam = make_camera((0, 6, 18), (0, 2, 0))
    ids = jnp.arange(film.num_pixels, dtype=jnp.int32)
    jit = uniforms(0, ids, jnp.zeros_like(ids), 0, 2, 0)
    return generate_rays(cam, film, ids, jit)


def test_stats_brute_counts():
    scene = _mesh_scene("none")
    film = Film(fov=jnp.float32(np.radians(45.0)), width=16, height=16)
    o, d = _camera_rays(film)
    st = intersect_stats(scene, o, d)
    n = film.num_pixels
    assert st["rays"] == n
    # brute-forced: every lane tests every primitive
    assert st["groups"]["triangles"]["tests"] == n * 300
    assert st["groups"]["rects"]["tests"] == n * 2
    assert "triangles" in format_stats(st)


def test_stats_bvh4_pops():
    from craytracer_tpu.accel.bvh4 import bvh4_closest_hit

    scene = _mesh_scene("bvh4")
    film = Film(fov=jnp.float32(np.radians(45.0)), width=16, height=16)
    o, d = _camera_rays(film)
    st = intersect_stats(scene, o, d)
    assert st["groups"]["triangles"]["tests"] == "accelerated"
    b = st["bvh4"]
    assert 1 <= b["pops_mean"] <= b["pops_max"]
    assert b["tri_tests"] > 0
    assert "pops mean" in format_stats(st)

    # the stats path must not perturb the traversal result
    t0, i0 = bvh4_closest_hit(scene.tri_bvh, o, d)
    from craytracer_tpu.accel.bvh4 import bvh4_closest_hit_stats

    t1, i1, pops = bvh4_closest_hit_stats(scene.tri_bvh, o, d)
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    assert pops.shape == t0.shape
