"""Accelerator equivalence tests (SURVEY.md §4: grid == BVH == brute force
on identical rays)."""

import jax.numpy as jnp
import numpy as np
import pytest

from craytracer_tpu.accel.bvh import build_bvh, bvh_any_hit, bvh_closest_hit
from craytracer_tpu.accel.grid import build_grid, grid_any_hit, grid_closest_hit
from craytracer_tpu.constants import TMAX
from craytracer_tpu.ops.intersect import triangle_ts
from craytracer_tpu.scene import SceneBuilder


def _random_soup(num_tris=200, seed=0, spread=10.0, size=1.0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(-spread, spread, (num_tris, 3))
    v0 = base + rng.normal(0, size, (num_tris, 3))
    v1 = base + rng.normal(0, size, (num_tris, 3))
    v2 = base + rng.normal(0, size, (num_tris, 3))
    return v0.astype(np.float32), v1.astype(np.float32), v2.astype(np.float32)


def _random_rays(n=512, seed=1, spread=15.0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3))
    d = (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)
    return jnp.asarray(o), jnp.asarray(d)


def _brute_ts(v0, v1, v2, o, d):
    b = SceneBuilder()
    b.add_matte("m")
    for a, bb, c in zip(v0, v1, v2):
        b.add_triangle(a, bb, c, "m")
    scene = b.build(accel="none")
    ts, _, _ = triangle_ts(o, d, scene.triangles)
    return jnp.min(ts, axis=1)


@pytest.fixture(scope="module")
def soup():
    v0, v1, v2 = _random_soup()
    o, d = _random_rays()
    t_ref = _brute_ts(v0, v1, v2, o, d)
    return v0, v1, v2, o, d, t_ref


def test_bvh_matches_bruteforce(soup):
    v0, v1, v2, o, d, t_ref = soup
    bvh = build_bvh(v0, v1, v2)
    t_bvh, tri = bvh_closest_hit(bvh, o, d)
    hit_ref = np.asarray(t_ref) < TMAX
    hit_bvh = np.asarray(t_bvh) < TMAX
    np.testing.assert_array_equal(hit_ref, hit_bvh)
    np.testing.assert_allclose(np.asarray(t_bvh)[hit_ref], np.asarray(t_ref)[hit_ref],
                               rtol=1e-4)
    assert hit_ref.sum() > 30  # the fixture actually exercises hits


def test_grid_matches_bruteforce(soup):
    v0, v1, v2, o, d, t_ref = soup
    grid = build_grid(v0, v1, v2)
    t_grid, tri = grid_closest_hit(grid, o, d)
    hit_ref = np.asarray(t_ref) < TMAX
    hit_grid = np.asarray(t_grid) < TMAX
    np.testing.assert_array_equal(hit_ref, hit_grid)
    np.testing.assert_allclose(np.asarray(t_grid)[hit_ref], np.asarray(t_ref)[hit_ref],
                               rtol=1e-4)


def test_any_hit_consistency(soup):
    v0, v1, v2, o, d, t_ref = soup
    bvh = build_bvh(v0, v1, v2)
    grid = build_grid(v0, v1, v2)
    max_dist = jnp.full((o.shape[0],), 12.0)
    t_b = np.asarray(bvh_any_hit(bvh, o, d, max_dist))
    t_g = np.asarray(grid_any_hit(grid, o, d, max_dist))
    blocked_ref = np.asarray(t_ref) < 12.0
    np.testing.assert_array_equal(t_b < 12.0, blocked_ref)
    np.testing.assert_array_equal(t_g < 12.0, blocked_ref)


def test_bvh_render_matches_bruteforce():
    """Cornell-style closed scene rendered with accel='bvh' vs 'none' must
    produce identical images (same RNG stream)."""
    from craytracer_tpu.camera import Film, make_camera
    from craytracer_tpu.integrator.wavefront import render_sample

    def build(accel):
        b = SceneBuilder()
        b.add_matte("w", (0.7, 0.7, 0.7))
        b.add_emissive("l", (1, 1, 1), 20.0)
        # tessellated floor (8x8 quads -> 128 tris) + light
        xs = np.linspace(-20, 20, 9)
        for i in range(8):
            for j in range(8):
                p00 = (xs[i], 0, xs[j])
                p10 = (xs[i + 1], 0, xs[j])
                p01 = (xs[i], 0, xs[j + 1])
                p11 = (xs[i + 1], 0, xs[j + 1])
                b.add_triangle(p00, p10, p11, "w")
                b.add_triangle(p00, p11, p01, "w")
        b.add_rect((-4, 30, -4), (8, 0, 0), (0, 0, 8), "l")
        return b.build(accel=accel)

    cam = make_camera((0, 15, 40), (0, 0, 0))
    film = Film(fov=jnp.float32(np.radians(45.0)), width=24, height=24)
    ids = jnp.arange(film.num_pixels, dtype=jnp.int32)
    img_none = render_sample(build("none"), cam, film, ids, 0, 0, 3)
    img_bvh = render_sample(build("bvh"), cam, film, ids, 0, 0, 3)
    img_grid = render_sample(build("grid"), cam, film, ids, 0, 0, 3)
    np.testing.assert_allclose(np.asarray(img_bvh), np.asarray(img_none),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(img_grid), np.asarray(img_none),
                               rtol=1e-3, atol=1e-4)


def test_bvh4_matches_bruteforce(soup):
    from craytracer_tpu.accel.bvh4 import build_bvh4, bvh4_closest_hit, bvh4_any_hit

    v0, v1, v2, o, d, t_ref = soup
    bvh4 = build_bvh4(v0, v1, v2)
    t4, tri = bvh4_closest_hit(bvh4, o, d)
    hit_ref = np.asarray(t_ref) < TMAX
    np.testing.assert_array_equal(hit_ref, np.asarray(t4) < TMAX)
    np.testing.assert_allclose(np.asarray(t4)[hit_ref], np.asarray(t_ref)[hit_ref],
                               rtol=1e-4)
    max_dist = jnp.full((o.shape[0],), 12.0)
    t_a = np.asarray(bvh4_any_hit(bvh4, o, d, max_dist))
    np.testing.assert_array_equal(t_a < 12.0, np.asarray(t_ref) < 12.0)


def test_bvh4_render_matches_bvh():
    from craytracer_tpu.camera import Film, make_camera
    from craytracer_tpu.integrator.wavefront import render_sample
    from craytracer_tpu.io.scenefile import load_scene_file
    import os

    scenes = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          "scenes")
    path = os.path.join(scenes, "mesh_scene.txt")
    s_bvh, cam, film = load_scene_file(path, accel="bvh")
    s_bvh4, _, _ = load_scene_file(path, accel="bvh4")
    film = film.replace(width=24, height=24)
    ids = jnp.arange(film.num_pixels, dtype=jnp.int32)
    img_a = render_sample(s_bvh, cam, film, ids, 0, 0, 3)
    img_b = render_sample(s_bvh4, cam, film, ids, 0, 0, 3)
    np.testing.assert_allclose(np.asarray(img_b), np.asarray(img_a),
                               rtol=1e-3, atol=1e-4)


def test_bvh4q_matches_bruteforce(soup):
    """Quantized QBVH: conservative u8 bounds -> identical hit results."""
    from craytracer_tpu.accel.bvh4q import build_bvh4q, bvh4q_closest_hit, bvh4q_any_hit

    v0, v1, v2, o, d, t_ref = soup
    q = build_bvh4q(v0, v1, v2)
    tq, tri = bvh4q_closest_hit(q, o, d)
    hit_ref = np.asarray(t_ref) < TMAX
    np.testing.assert_array_equal(hit_ref, np.asarray(tq) < TMAX)
    np.testing.assert_allclose(np.asarray(tq)[hit_ref], np.asarray(t_ref)[hit_ref],
                               rtol=1e-4)
    max_dist = jnp.full((o.shape[0],), 12.0)
    t_a = np.asarray(bvh4q_any_hit(q, o, d, max_dist))
    np.testing.assert_array_equal(t_a < 12.0, np.asarray(t_ref) < 12.0)


def test_tiny_trees():
    """Degenerate sizes: 1-5 triangles through every accel backend."""
    from craytracer_tpu.accel.bvh4 import build_bvh4, bvh4_closest_hit
    from craytracer_tpu.accel.bvh4q import build_bvh4q, bvh4q_closest_hit

    for ntri in (1, 3, 5):
        v0, v1, v2 = _random_soup(ntri, seed=ntri)
        o, d = _random_rays(128, seed=ntri + 10)
        t_ref = _brute_ts(v0, v1, v2, o, d)
        hit_ref = np.asarray(t_ref) < TMAX
        for build, query in [(build_bvh, bvh_closest_hit),
                             (build_bvh4, bvh4_closest_hit),
                             (build_bvh4q, bvh4q_closest_hit),
                             (build_grid, grid_closest_hit)]:
            acc = build(v0, v1, v2)
            t, _ = query(acc, o, d)
            np.testing.assert_array_equal(hit_ref, np.asarray(t) < TMAX,
                                          err_msg=f"{build.__name__} ntri={ntri}")
            np.testing.assert_allclose(np.asarray(t)[hit_ref],
                                       np.asarray(t_ref)[hit_ref], rtol=1e-4)


def test_sphere_bvh_matches_brute_force():
    """Analytic-primitive acceleration (scene/scenedata.h:12-18: the
    reference's accelerators hold all object types): a 600-sphere scene
    through the sphere fat-row BVH must produce the same image as the
    brute-force [N, M] path."""
    import numpy as np

    from craytracer_tpu.camera import Film, make_camera
    from craytracer_tpu.integrator.wavefront import render_sample
    from craytracer_tpu.scene import SceneBuilder

    def build(accel):
        rng = np.random.default_rng(5)  # identical scene per accel mode
        b = SceneBuilder()
        b.add_matte("w", (0.7, 0.7, 0.7))
        b.add_emissive("l", (1, 1, 1), 30.0)
        b.add_rect((-40, 0, -40), (80, 0, 0), (0, 0, 80), "w")
        b.add_rect((-4, 30, -4), (8, 0, 0), (0, 0, 8), "l")
        for i in range(600):
            c = rng.uniform(-20, 20, 3)
            c[1] = rng.uniform(0.5, 6.0)
            b.add_sphere(tuple(c), rng.uniform(0.3, 0.9), "w")
        return b.build(accel=accel)

    s_acc = build("bvh4")
    s_brt = build("none")
    assert s_acc.sph_bvh is not None and s_brt.sph_bvh is None

    cam = make_camera((0, 18, 45), (0, 2, 0))
    film = Film(fov=jnp.float32(np.radians(45.0)), width=24, height=24)
    ids = jnp.arange(film.num_pixels, dtype=jnp.int32)
    img_a = np.asarray(render_sample(s_acc, cam, film, ids, 3, 0, 3,
                                     estimator="physical"))
    img_b = np.asarray(render_sample(s_brt, cam, film, ids, 3, 0, 3,
                                     estimator="physical"))
    np.testing.assert_allclose(img_a, img_b, rtol=2e-4, atol=2e-4)
