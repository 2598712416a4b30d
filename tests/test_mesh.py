"""Mesh pipeline tests: OBJ -> scene -> BVH -> render."""

import os

import jax.numpy as jnp
import numpy as np

from craytracer_tpu.integrator.wavefront import render_sample
from craytracer_tpu.io.scenefile import load_scene_file

SCENES = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scenes")


def test_mesh_scene_renders():
    scene, cam, film = load_scene_file(os.path.join(SCENES, "mesh_scene.txt"),
                                       accel="bvh")
    assert scene.accel == "bvh"
    assert scene.triangles.mat_id.shape[0] == 5120
    assert bool(scene.triangles.smooth[0])
    film = film.replace(width=32, height=32)
    ids = jnp.arange(film.num_pixels, dtype=jnp.int32)
    img = render_sample(scene, cam, film, ids, 0, 0, 3)
    img = np.asarray(img).reshape(32, 32, 3)
    assert np.isfinite(img).all()
    # sphere visible in the center, lit from above
    center = img[12:20, 12:20]
    assert center.mean() > 0.05
    # smooth normals: blue ball -> blue channel dominates at the center
    assert center[..., 2].mean() > center[..., 0].mean()


def test_smooth_normals_from_obj():
    scene, cam, film = load_scene_file(os.path.join(SCENES, "mesh_scene.txt"),
                                       accel="none")
    tr = scene.triangles
    # icosphere with baked location (0,1,0): vertex normals == vert - center
    v0 = np.asarray(tr.v0[:8]) - np.array([0, 1, 0])
    n0 = np.asarray(tr.n0[:8])
    cos = (v0 * n0).sum(-1) / np.linalg.norm(v0, axis=-1)
    np.testing.assert_allclose(cos, 1.0, atol=1e-3)
