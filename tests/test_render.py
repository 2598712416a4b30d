"""End-to-end integrator tests (SURVEY.md §4: furnace test, Cornell box)."""

import jax.numpy as jnp
import numpy as np
import pytest

from craytracer_tpu.camera import Film, make_camera
from craytracer_tpu.integrator import RenderConfig, Renderer
from craytracer_tpu.integrator.wavefront import trace_paths
from craytracer_tpu.scene import SceneBuilder


def test_albedo_check_matte_sphere():
    """Albedo check: constant env light Li=1 over a matte sphere with albedo
    rho. One surface vertex (convex shape) -> NEE estimate is exactly rho
    per lane (the cos terms cancel analytically in f*cos*Li/pdf), with zero
    variance. Validates NEE + env sampling + the Lambertian lobe jointly."""
    rho = 0.5
    b = SceneBuilder()
    b.add_matte("s", (rho, rho, rho))
    b.add_sphere((0, 0, 0), 1.0, "s")
    b.set_env_light("constant", (1, 1, 1), 1.0)
    scene = b.build()

    n = 4096
    o = jnp.tile(jnp.array([[0.0, 0.0, 5.0]], jnp.float32), (n, 1))
    d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]], jnp.float32), (n, 1))
    ids = jnp.arange(n, dtype=jnp.uint32)
    L, good = trace_paths(scene, o, d, 0, ids, 0, 6)
    np.testing.assert_allclose(np.asarray(L), rho, atol=1e-4)


def test_mirror_env_readd():
    """A specular bounce must re-add env radiance on escape
    (trace.h:419-455: emitted/env only at bounce 0 or after spec/glossy)."""
    b = SceneBuilder()
    b.add_mirror("m", (1.0, 1.0, 1.0))
    b.add_sphere((0, 0, 0), 1.0, "m")
    b.set_env_light("constant", (0.7, 0.7, 0.7), 1.0)
    scene = b.build()
    n = 64
    o = jnp.tile(jnp.array([[0.0, 0.0, 5.0]], jnp.float32), (n, 1))
    d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]], jnp.float32), (n, 1))
    ids = jnp.arange(n, dtype=jnp.uint32)
    L, good = trace_paths(scene, o, d, 0, ids, 0, 4)
    # head-on: mirror reflects straight back, escapes, env added with beta=1
    np.testing.assert_allclose(np.asarray(L), 0.7, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(good), 1)


def test_furnace_escape_counts_good_paths():
    """Rays that miss everything count one good path and collect env."""
    b = SceneBuilder()
    b.add_matte("s", (0.5, 0.5, 0.5))
    b.add_sphere((100, 100, 100), 0.1, "s")
    b.set_env_light("constant", (2.0, 2.0, 2.0), 1.0)
    scene = b.build()
    n = 16
    o = jnp.zeros((n, 3), jnp.float32)
    d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]], jnp.float32), (n, 1))
    ids = jnp.arange(n, dtype=jnp.uint32)
    L, good = trace_paths(scene, o, d, 0, ids, 0, 3)
    np.testing.assert_array_equal(np.asarray(good), 1)
    np.testing.assert_allclose(np.asarray(L), 2.0, rtol=1e-5)


def _cornell_scene():
    """Programmatic Cornell box (same geometry as cornell_box.txt)."""
    b = SceneBuilder()
    white = (0.740064, 0.742313, 0.733934)
    b.add_matte("white", white)
    b.add_matte("red", (0.366046, 0.0371827, 0.0416385))
    b.add_matte("green", (0.162928, 0.408903, 0.0833759))
    b.add_emissive("light", (1.0, 0.85, 0.5), 90.0)
    # two halves of the ceiling light
    b.add_rect((213.0, 548, -227.0), (130, 0, 0), (0, 0, -105), "light")
    b.add_rect((343.0, 548, -227.0), (-130, 0, 0), (0, 0, -105), "light")
    b.add_rect((0, 0, 0), (552.8, 0, 0), (0, 0, -559.2), "white")  # floor
    b.add_rect((0, 548.8, 0), (0, 0, -559.2), (556.0, 0, 0), "white")  # ceiling
    b.add_rect((0, 0, -559.2), (553.6, 0, 0), (0, 548.8, 0), "white")  # back
    b.add_rect((0, 0, 0), (0, 0, -559.2), (0, 548.8, 0), "green")  # right (x=0)
    b.add_rect((552.8, 0, 0), (0, 548.8, 0), (0, 0, -559.2), "red")  # left
    return b.build()


@pytest.fixture(scope="module")
def cornell_render():
    scene = _cornell_scene()
    cam = make_camera((278.0, 273.0, 800.0), (278.0, 273.0, 0.0))
    film = Film(fov=jnp.float32(np.radians(40.0)), width=64, height=64)
    r = Renderer(scene, cam, film, RenderConfig(num_samples=8, max_depth=4, seed=1))
    r.render()
    return r


def test_cornell_smoke(cornell_render):
    mean = cornell_render.raw_mean()
    assert np.isfinite(mean).all()
    assert mean.max() > 1.0  # light source visible
    assert mean.mean() > 0.01  # scene is lit
    # light region (top middle) is the brightest area
    top = mean[4:12, 24:40].mean()
    bottom = mean[52:60, 24:40].mean()
    assert top > bottom
    # color bleeding: left wall (image right side) reddish, right wall greenish
    left_strip = mean[24:40, 56:63]  # +x wall appears on image right? (camera looks -z)
    right_strip = mean[24:40, 1:8]
    # camera x_axis = up x z; with z=+Z, x=(1,0,0)->image +u is world +x,
    # so world x=552 (red) is on the image right.
    assert left_strip[..., 0].mean() > left_strip[..., 1].mean()
    assert right_strip[..., 1].mean() > right_strip[..., 0].mean()


def test_cornell_energy_reasonable(cornell_render):
    mean = cornell_render.raw_mean()
    # interior mostly in a sane radiance range (not NaN explosion / black)
    inner = mean[16:48, 16:48]
    assert 0.05 < inner.mean() < 50.0


def test_tiled_render_matches_untiled(cornell_render):
    """tile_pixels splits passes into fixed-size pixel blocks without
    changing the image (the pixel-range job decomposition, parallel.h:5-44)."""
    scene = _cornell_scene()
    cam = make_camera((278.0, 273.0, 800.0), (278.0, 273.0, 0.0))
    film = Film(fov=jnp.float32(np.radians(40.0)), width=16, height=16)
    r1 = Renderer(scene, cam, film, RenderConfig(num_samples=2, max_depth=2, seed=3))
    r2 = Renderer(scene, cam, film, RenderConfig(num_samples=2, max_depth=2, seed=3,
                                                 tile_pixels=64))
    img1 = r1.render()
    img2 = r2.render()
    np.testing.assert_allclose(img1, img2, atol=1e-6)


def test_resume_equals_straight_render():
    """Checkpoint/resume reproduces the uninterrupted render bit-for-bit
    (imagestate.h:5-43 semantics + stateless RNG)."""
    scene = _cornell_scene()
    cam = make_camera((278.0, 273.0, 800.0), (278.0, 273.0, 0.0))
    film = Film(fov=jnp.float32(np.radians(40.0)), width=16, height=16)
    r_full = Renderer(scene, cam, film, RenderConfig(num_samples=4, max_depth=2, seed=9))
    img_full = r_full.render()

    r_a = Renderer(scene, cam, film, RenderConfig(num_samples=2, max_depth=2, seed=9))
    r_a.render()
    accum = np.asarray(r_a.accum)
    r_b = Renderer(scene, cam, film, RenderConfig(num_samples=2, max_depth=2, seed=9))
    r_b.resume_from(accum, 2)
    img_resumed = r_b.render()
    np.testing.assert_allclose(img_resumed, img_full, atol=1e-6)


def test_seed_determinism():
    scene = _cornell_scene()
    cam = make_camera((278.0, 273.0, 800.0), (278.0, 273.0, 0.0))
    film = Film(fov=jnp.float32(np.radians(40.0)), width=16, height=16)

    def render(seed):
        r = Renderer(scene, cam, film, RenderConfig(num_samples=2, max_depth=2, seed=seed))
        return r.render()

    a1 = render(5)
    a2 = render(5)
    b = render(6)
    np.testing.assert_array_equal(a1, a2)
    assert np.abs(a1 - b).max() > 1e-4


def test_stream_compaction_equivalence():
    """compact_at (north-star stream compaction) must be invisible in the
    output: same radiance, good_paths, and bounce_live histogram as the
    full-width loop on a deep RR-heavy trace."""
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _cornell
    from craytracer_tpu.camera import generate_rays
    from craytracer_tpu.integrator.wavefront import (CAMERA_BOUNCE,
                                                     trace_paths)
    from craytracer_tpu.sampling import uniforms

    scene, cam, film = _cornell(24, 24)
    ids = jnp.arange(film.num_pixels, dtype=jnp.int32)
    o, d = generate_rays(cam, film, ids, uniforms(0, ids, 0, CAMERA_BOUNCE, 2, 0))
    L0, g0, m0 = trace_paths(scene, o, d, 0, ids, 0, 16, with_metrics=True)
    L1, g1, m1 = trace_paths(scene, o, d, 0, ids, 0, 16, with_metrics=True,
                             compact_at=4)
    np.testing.assert_allclose(np.asarray(L0), np.asarray(L1), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(g0), np.asarray(g1))
    np.testing.assert_array_equal(np.asarray(m0["bounce_live"]),
                                  np.asarray(m1["bounce_live"]))


def test_spp_batch_equivalence():
    """spp_batch=B traces the same per-sample RNG streams as the
    sequential loop: the batched image must equal the sequential one up to
    fp accumulation order."""
    import dataclasses

    scene = _cornell_scene()
    cam = make_camera((278, 273, 800), (278, 273, 0))
    film = Film(fov=jnp.float32(np.radians(38.0)), width=12, height=12)
    base = RenderConfig(num_samples=4, max_depth=3, seed=5)
    r1 = Renderer(scene, cam, film, base)
    img1 = r1.render()
    rb = Renderer(scene, cam, film, dataclasses.replace(base, spp_batch=4))
    imgb = rb.render()
    np.testing.assert_allclose(np.asarray(img1), np.asarray(imgb),
                               rtol=2e-5, atol=2e-6)
    # and an uneven batch (num_samples not a multiple of spp_batch)
    ru = Renderer(scene, cam, film,
                  dataclasses.replace(base, num_samples=5, spp_batch=3))
    r5 = Renderer(scene, cam, film,
                  dataclasses.replace(base, num_samples=5))
    np.testing.assert_allclose(np.asarray(ru.render()),
                               np.asarray(r5.render()),
                               rtol=2e-5, atol=2e-6)


def test_ansi_preview():
    scene = _cornell_scene()
    cam = make_camera((278, 273, 800), (278, 273, 0))
    film = Film(fov=jnp.float32(np.radians(38.0)), width=16, height=16)
    r = Renderer(scene, cam, film, RenderConfig(num_samples=1, max_depth=2))
    r.render()
    s = r.ansi_preview(cols=8)
    lines = s.split("\n")
    assert all(line.endswith("\x1b[0m") for line in lines)
    assert s.count("▀") == 8 * len(lines)
