"""MIS estimator tests: unbiasedness (agrees with the physical estimator in
expectation) and variance reduction on a glossy-highlight scene."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from craytracer_tpu.camera import Film, make_camera
from craytracer_tpu.integrator.wavefront import render_sample
from craytracer_tpu.scene import SceneBuilder


def _glossy_scene(light_size):
    """Rough-metal floor lit by a small bright area light — the classic
    case where NEE-only (small light good) and BSDF-only (glossy good)
    each fail; MIS handles both."""
    b = SceneBuilder()
    b.add_metal("floor", preset="SILVER", roughness=0.25)
    b.add_matte("wall", (0.4, 0.4, 0.4))
    i = 400.0 / (light_size * light_size)  # constant total power
    b.add_emissive("lamp", (1, 1, 1), i)
    b.add_rect((-20, 0, -20), (40, 0, 0), (0, 0, 40), "floor")
    b.add_rect((-light_size / 2, 8, -light_size / 2), (light_size, 0, 0),
               (0, 0, light_size), "lamp")
    return b.build()


@pytest.fixture(scope="module")
def setup():
    scene = _glossy_scene(1.0)
    cam = make_camera((0, 4, 14), (0, 0, 0))
    film = Film(fov=jnp.float32(np.radians(40.0)), width=12, height=12)
    ids = jnp.arange(film.num_pixels, dtype=jnp.int32)
    return scene, cam, film, ids


def _passes(scene, cam, film, ids, estimator, n_spp):
    step = jax.jit(lambda s: render_sample(scene, cam, film, ids, 11, s, 3,
                                           estimator=estimator),
                   static_argnames=())
    vals = [np.asarray(step(s)) for s in range(n_spp)]
    return np.stack(vals)  # [spp, N, 3]


def test_mis_unbiased_vs_physical():
    # Unbiasedness is checked on a LARGER light than the variance test:
    # with a 1x1 lamp the physical estimator's glossy spikes are so
    # heavy-tailed that its 96-spp image mean swings by >20% with the RNG
    # stream (measured 0.66..0.87 against a 0.66 converged value) — any
    # pass/fail there measures luck, not bias.
    scene = _glossy_scene(4.0)
    cam = make_camera((0, 4, 14), (0, 0, 0))
    film = Film(fov=jnp.float32(np.radians(40.0)), width=12, height=12)
    ids = jnp.arange(film.num_pixels, dtype=jnp.int32)
    n = 96
    mis = _passes(scene, cam, film, ids, "mis", n)
    phys = _passes(scene, cam, film, ids, "physical", n)
    m_mis = mis.mean(axis=0)
    m_phys = phys.mean(axis=0)
    assert np.isfinite(mis).all() and np.isfinite(phys).all()
    # means agree within combined MC error on the image average
    np.testing.assert_allclose(m_mis.mean(), m_phys.mean(), rtol=0.12)


def test_mis_reduces_variance(setup):
    scene, cam, film, ids = setup
    n = 64
    mis = _passes(scene, cam, film, ids, "mis", n)
    phys = _passes(scene, cam, film, ids, "physical", n)
    v_mis = mis.var(axis=0).mean()
    v_phys = phys.var(axis=0).mean()
    assert v_mis < v_phys * 0.9, (v_mis, v_phys)


def test_mesh_light_nee_principled():
    """Mesh lights participate in NEE under the principled power mode
    (the reference leaves them at power 0): an emissive quad mesh lights a
    floor about as strongly as an identical rect light."""
    import numpy as np

    def build(use_mesh):
        b = SceneBuilder()
        b.add_matte("floor", (0.7, 0.7, 0.7))
        b.add_emissive("lamp", (1, 1, 1), 30.0)
        b.add_rect((-20, 0, -20), (40, 0, 0), (0, 0, 40), "floor")
        if use_mesh:
            # 2-triangle quad at y=8 facing down (wound so face normal is -y)
            b.add_mesh(
                positions=[(-2, 8, -2), (2, 8, -2), (2, 8, 2), (-2, 8, 2)],
                indices=[(0, 1, 2), (0, 2, 3)], mat="lamp")
        else:
            b.add_rect((-2, 8, -2), (4, 0, 0), (0, 0, 4), "lamp")
        return b.build(light_power="principled")

    cam = make_camera((0, 4, 14), (0, 0, 0))
    film = Film(fov=jnp.float32(np.radians(40.0)), width=10, height=10)
    ids = jnp.arange(film.num_pixels, dtype=jnp.int32)

    def mean_radiance(scene):
        step = jax.jit(lambda spp: render_sample(scene, cam, film, ids, 5, spp, 2,
                                                 estimator="physical"))
        vals = [np.asarray(step(s)) for s in range(24)]
        return np.stack(vals).mean()

    m_mesh = mean_radiance(build(True))
    m_rect = mean_radiance(build(False))
    assert m_mesh > 0.005  # mesh light actually illuminates via NEE
    np.testing.assert_allclose(m_mesh, m_rect, rtol=0.25)


def test_mesh_light_cdf_boundaries():
    """Binary search hits the right triangle at CDF boundaries (u near 0,
    0.5, 1) for a single-light two-triangle mesh."""
    from craytracer_tpu.lights.lights import sample_light_index

    b = SceneBuilder()
    b.add_matte("f", (0.5, 0.5, 0.5))
    b.add_emissive("lamp", (1, 1, 1), 5.0)
    b.add_rect((-20, 0, -20), (40, 0, 0), (0, 0, 40), "f")
    b.add_mesh(positions=[(-2, 8, -2), (2, 8, -2), (2, 8, 2), (-2, 8, 2)],
               indices=[(0, 1, 2), (0, 2, 3)], mat="lamp")
    scene = b.build(light_power="principled")
    row = int(np.argmax(np.asarray(scene.lights.light_type) == 4))
    n = 5
    idx = jnp.full((n,), row, jnp.int32)
    hp = jnp.zeros((n, 3), jnp.float32)
    nrm = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32), (n, 1))
    u2 = jnp.asarray([[0.0, 0.5], [0.49, 0.5], [0.51, 0.5], [0.999, 0.5],
                      [1.0, 0.5]], jnp.float32)
    ls = sample_light_index(scene, idx, u2, hp, nrm, nrm, nrm)
    assert bool(jnp.all(ls.valid))
    # all sample points lie on the quad at y=8 within its extent
    wi = np.asarray(ls.wi)
    dist = np.asarray(ls.distance)
    pts = np.asarray(hp) + wi * dist[:, None]
    np.testing.assert_allclose(pts[:, 1], 8.0, atol=1e-3)
    assert (np.abs(pts[:, 0]) <= 2.001).all() and (np.abs(pts[:, 2]) <= 2.001).all()


def test_mis_backface_emission_keeps_full_weight():
    """ADVICE round-1 (medium): BSDF-strategy hits on the BACK side of a
    one-sided area light must keep weight 1 — NEE has zero density there
    (sample_one_light rejects dot(to_sample, sn) > 0), so any w_emit < 1
    loses energy. Scene: lamp facing UP (away from the floor); the floor
    sees its emission only through BSDF sampling."""
    b = SceneBuilder()
    b.add_matte("w", (0.6, 0.6, 0.6))
    b.add_emissive("l", (1, 1, 1), 6.0)
    b.add_rect((-8, 0, -8), (16, 0, 0), (0, 0, 16), "w")
    # width x height -> normal +y (UP); the floor below sees the back side
    b.add_rect((-1, 4, -1), (2, 0, 0), (0, 0, 2), "l")
    scene = b.build()
    cam = make_camera((0, 2, 9), (0, 1, 0))
    film = Film(fov=jnp.float32(np.radians(40.0)), width=10, height=10)
    ids = jnp.arange(film.num_pixels, dtype=jnp.int32)
    n = 192
    mis = _passes(scene, cam, film, ids, "mis", n).mean()
    phys = _passes(scene, cam, film, ids, "physical", n).mean()
    assert phys > 1e-3  # the lamp's back face does light the floor
    np.testing.assert_allclose(mis, phys, rtol=0.15)
