"""Geometry sharding (SURVEY.md §5.7 SP/CP analog): the triangle soup is
sharded across a `geom` mesh axis with per-bounce argmin hit reduction;
the rendered image and inverse-rendering grads must match the unsharded
path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from craytracer_tpu.camera import Film, make_camera
from craytracer_tpu.integrator.wavefront import render_sample
from craytracer_tpu.parallel.geom import (geom_sharded_render_pass,
                                          geom_sharded_train_step,
                                          make_geom_mesh,
                                          shard_scene_geometry)
from craytracer_tpu.scene import SceneBuilder


def _mesh_scene(accel="bvh4"):
    import sys

    sys.path.insert(0, "scenes")
    from make_fixtures import icosphere

    b = SceneBuilder()
    b.add_matte("w", (0.7, 0.6, 0.5))
    b.add_plastic("p", kd=(0.2, 0.4, 0.6), ks=(0.3, 0.3, 0.3), roughness=0.2)
    b.add_emissive("l", (1, 1, 1), 20.0)
    b.add_rect((-20, 0, -20), (40, 0, 0), (0, 0, 40), "w")
    b.add_rect((-2, 10, -2), (4, 0, 0), (0, 0, 4), "l")
    b.add_sphere((4.0, 1.2, 0.0), 1.2, "p")  # replicated analytic prim
    v, f = icosphere(2)  # 320 tris
    rng = np.random.default_rng(3)
    for i in range(4):
        c = np.array([i * 2.5 - 4.0, 1.0 + rng.random(), rng.random() * 3 - 1.5])
        w = v * (0.7 + 0.4 * rng.random()) + c
        b.add_triangles_array(w[f[:, 0]], w[f[:, 1]], w[f[:, 2]],
                              "p" if i % 2 else "w")
    return b.build(accel=accel)


@pytest.fixture(scope="module")
def setup():
    scene = _mesh_scene()
    cam = make_camera((0, 6, 14), (0, 1, 0))
    film = Film(fov=jnp.float32(np.radians(45.0)), width=16, height=16)
    ids = jnp.arange(film.num_pixels, dtype=jnp.int32)
    return scene, cam, film, ids


@pytest.mark.parametrize("accel", ["bvh4", "bvh"])
def test_sharded_image_matches_unsharded(setup, accel):
    scene, cam, film, ids = setup
    if accel != "bvh4":
        scene = _mesh_scene(accel)
    ref = jax.jit(lambda: render_sample(scene, cam, film, ids, 5, 0, 3))()

    stacked, bases = shard_scene_geometry(scene, 4, accel=accel)
    mesh = make_geom_mesh(2, 4)
    render = geom_sharded_render_pass(mesh, 3)
    img = render(stacked, bases, cam, film, ids, jnp.int32(5), jnp.int32(0))

    np.testing.assert_allclose(np.asarray(img), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    assert not np.isnan(np.asarray(img)).any()


def test_sharded_uneven_split(setup):
    """Triangle count not divisible by the shard count: padding with
    duplicate rows must not change the image."""
    scene, cam, film, ids = setup
    ref = jax.jit(lambda: render_sample(scene, cam, film, ids, 9, 0, 3))()
    stacked, bases = shard_scene_geometry(scene, 8, accel="bvh4")
    mesh = make_geom_mesh(1, 8)
    render = geom_sharded_render_pass(mesh, 3)
    img = render(stacked, bases, cam, film, ids, jnp.int32(9), jnp.int32(0))
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_sharded_train_step_matches_unsharded_grads(setup):
    scene, cam, film, ids = setup
    target = jnp.zeros((film.num_pixels, 3))

    def loss_fn(scene):
        img = render_sample(scene, cam, film, ids, 5, 0, 2,
                            estimator="physical")
        return jnp.mean((img - target) ** 2)

    ref_loss, ref_grads = jax.jit(
        jax.value_and_grad(loss_fn, allow_int=True))(scene)

    stacked, bases = shard_scene_geometry(scene, 4, accel="bvh4")
    mesh = make_geom_mesh(2, 4)
    step = geom_sharded_train_step(mesh, 2)
    loss, grads = step(stacked, bases, cam, film, ids, jnp.int32(5),
                       jnp.int32(0), jnp.tile(target, (1, 1)))

    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    # replicated-table grads: every geom member holds the same full copy
    for name in ("color", "intensity", "sigma"):
        g = np.asarray(getattr(grads.materials, name))
        r = np.asarray(getattr(ref_grads.materials, name))
        for k in range(g.shape[0]):
            np.testing.assert_allclose(g[k], r, rtol=1e-4, atol=1e-6,
                                       err_msg=f"materials.{name} shard {k}")


def test_mesh_lights_rejected():
    b = SceneBuilder()
    b.add_matte("w", (0.5, 0.5, 0.5))
    b.add_emissive("l", (1, 1, 1), 5.0)
    tri = np.array([[0, 0, 0]]), np.array([[1, 0, 0]]), np.array([[0, 1, 0]])
    b.add_triangles_array(*tri, "l")
    for i in range(8):
        b.add_triangle((i, 0, 0), (i + 1, 0, 0), (i, 1, 0), "w")
    scene = b.build(accel="bvh4", light_power="principled")
    with pytest.raises(AssertionError):
        shard_scene_geometry(scene, 2)
