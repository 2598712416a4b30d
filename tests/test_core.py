"""Unit tests for the math substrate (L0): vec ops, solvers, sampling, camera."""

import jax.numpy as jnp
import numpy as np
import pytest

from craytracer_tpu.constants import TMAX
from craytracer_tpu.core import math as vm
from craytracer_tpu.core.solvers import solve_quadratic, solve_quartic
from craytracer_tpu.sampling import uniforms
from craytracer_tpu.sampling.mappings import map_to_hemisphere_cosine


def test_normalize_safe():
    v = jnp.array([[3.0, 4.0, 0.0], [0.0, 0.0, 0.0]])
    n = vm.normalize(v)
    np.testing.assert_allclose(n[0], [0.6, 0.8, 0.0], atol=1e-6)
    np.testing.assert_allclose(n[1], [0.0, 0.0, 0.0], atol=1e-6)


def test_shading_frame_orthonormal():
    rng = np.random.default_rng(0)
    n = vm.normalize(jnp.asarray(rng.normal(size=(64, 3)), jnp.float32))
    dpdu = jnp.asarray(rng.normal(size=(64, 3)), jnp.float32)
    t, b, nn = vm.make_shading_frame(n, dpdu)
    for a, bb in [(t, b), (t, nn), (b, nn)]:
        np.testing.assert_allclose(vm.dot(a, bb), 0.0, atol=1e-5)
    np.testing.assert_allclose(vm.length(t), 1.0, atol=1e-5)
    np.testing.assert_allclose(vm.length(b), 1.0, atol=1e-5)


def test_to_local_world_roundtrip():
    rng = np.random.default_rng(1)
    n = vm.normalize(jnp.asarray(rng.normal(size=(32, 3)), jnp.float32))
    t, b, _ = vm.orthonormal_basis(n)
    v = vm.normalize(jnp.asarray(rng.normal(size=(32, 3)), jnp.float32))
    v2 = vm.to_world(vm.to_local(v, t, b, n), t, b, n)
    np.testing.assert_allclose(v, v2, atol=1e-5)


def test_reflect():
    wo = jnp.array([[0.5, 0.0, jnp.sqrt(0.75)]])
    n = jnp.array([[0.0, 0.0, 1.0]])
    wi = vm.reflect(wo, n)
    np.testing.assert_allclose(wi[0], [-0.5, 0.0, np.sqrt(0.75)], atol=1e-6)


def test_refract_snell():
    # straight-on ray refracts straight through
    wi = jnp.array([[0.0, 0.0, 1.0]])
    n = jnp.array([[0.0, 0.0, 1.0]])
    ok, wt = vm.refract(wi, n, 1.0 / 1.5)
    assert bool(ok[0])
    np.testing.assert_allclose(wt[0], [0.0, 0.0, -1.0], atol=1e-6)


def test_quadratic_roots():
    # (x-2)(x-5) = x^2 -7x + 10
    ok, t0, t1 = solve_quadratic(jnp.array([1.0]), jnp.array([-7.0]), jnp.array([10.0]))
    assert bool(ok[0])
    np.testing.assert_allclose([t0[0], t1[0]], [2.0, 5.0], rtol=1e-6)


def test_quadratic_no_roots():
    ok, t0, _ = solve_quadratic(jnp.array([1.0]), jnp.array([0.0]), jnp.array([1.0]))
    assert not bool(ok[0])
    assert t0[0] == TMAX


def test_quartic_known_roots():
    # (x-1)(x-2)(x-3)(x-4) = x^4 -10x^3 +35x^2 -50x +24
    roots, valid = solve_quartic(
        jnp.array([-10.0]), jnp.array([35.0]), jnp.array([-50.0]), jnp.array([24.0])
    )
    got = sorted(float(r) for r, v in zip(roots[0], valid[0]) if v and r < TMAX)
    np.testing.assert_allclose(got, [1.0, 2.0, 3.0, 4.0], atol=1e-3)


def test_rng_uniform_range_and_determinism():
    ids = jnp.arange(4096, dtype=jnp.uint32)
    u1 = uniforms(7, ids, 3, 2, 4)
    u2 = uniforms(7, ids, 3, 2, 4)
    assert u1.shape == (4096, 4)
    assert float(u1.min()) >= 0.0 and float(u1.max()) < 1.0
    np.testing.assert_array_equal(u1, u2)
    # mean ~ 0.5
    assert abs(float(u1.mean()) - 0.5) < 0.01
    # different bounce -> decorrelated
    u3 = uniforms(7, ids, 3, 4, 4)
    assert abs(float(jnp.mean((u1 - 0.5) * (u3 - 0.5)))) < 0.01


def test_cosine_hemisphere_mean_z():
    ids = jnp.arange(1 << 14, dtype=jnp.uint32)
    u = uniforms(0, ids, 0, 0, 2)
    w = map_to_hemisphere_cosine(u)
    assert float(w[:, 2].min()) >= 0.0
    # E[cos theta] under pdf cos/pi = 2/3
    assert abs(float(w[:, 2].mean()) - 2.0 / 3.0) < 0.01


def test_camera_pinhole_center_ray():
    from craytracer_tpu.camera import Film, generate_rays, make_camera

    cam = make_camera((0, 0, 10), (0, 0, 0))
    film = Film(fov=jnp.float32(np.radians(60.0)), width=9, height=9)
    center = jnp.array([4 * 9 + 4], jnp.int32)  # middle pixel
    o, d = generate_rays(cam, film, center, jnp.full((1, 2), 0.5))
    np.testing.assert_allclose(d[0], [0.0, 0.0, -1.0], atol=1e-5)
    np.testing.assert_allclose(o[0], [0.0, 0.0, 10.0], atol=1e-5)


def test_multijittered_table_stratification():
    from craytracer_tpu.sampling.multijitter import multijittered_table

    tbl = multijittered_table(16, 3, seed=1)
    assert tbl.shape == (3, 16, 2)
    for s in range(3):
        pts = tbl[s]
        # 4x4 grid stratification: exactly one point per coarse cell
        cells = (pts * 4).astype(int)
        ids = cells[:, 0] * 4 + cells[:, 1]
        assert len(set(ids.tolist())) == 16
        # n^2 fine stratification in each 1-D projection
        fx = (pts[:, 0] * 16).astype(int)
        fy = (pts[:, 1] * 16).astype(int)
        assert len(set(fx.tolist())) == 16
        assert len(set(fy.tolist())) == 16


def test_stratified_jitter_covers_strata():
    import jax.numpy as jnp
    import numpy as np

    from craytracer_tpu.sampling.multijitter import stratified_jitter

    ids = jnp.zeros((1,), jnp.int32)
    pts = np.concatenate([np.asarray(stratified_jitter(0, ids, s)) for s in range(16)])
    cells = (pts * 4).astype(int)
    cell_ids = cells[:, 0] * 4 + cells[:, 1]
    # 16 consecutive samples of one pixel hit all 16 strata exactly once
    assert sorted(cell_ids.tolist()) == list(range(16))


def test_thin_lens_camera_focus():
    """Thin-lens rays converge at the focal plane: two different lens
    samples aimed at the same pixel intersect at z = -focal_length."""
    from craytracer_tpu.camera import THINLENS, Film, generate_rays, make_camera

    cam = make_camera((0, 0, 0), (0, 0, -1), camera_type=THINLENS,
                      focal_length=3.0, lens_radius=0.2)
    film = Film(fov=jnp.float32(np.radians(50.0)), width=9, height=9)
    pix = jnp.array([4 * 9 + 2], jnp.int32)  # off-center pixel
    o1, d1 = generate_rays(cam, film, pix, jnp.full((1, 2), 0.5),
                           lens_u=jnp.asarray([[0.1, 0.2]]))
    o2, d2 = generate_rays(cam, film, pix, jnp.full((1, 2), 0.5),
                           lens_u=jnp.asarray([[0.8, 0.9]]))
    # different lens origins
    assert float(jnp.linalg.norm(o1 - o2)) > 1e-4
    # propagate both to the focal plane (z = -focal_length in world here)
    t1 = (-3.0 - o1[0, 2]) / d1[0, 2]
    t2 = (-3.0 - o2[0, 2]) / d2[0, 2]
    p1 = o1[0] + t1 * d1[0]
    p2 = o2[0] + t2 * d2[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-4)
