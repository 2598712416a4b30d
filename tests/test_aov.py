"""First-hit AOV buffers (integrator/aov.py) — beyond-reference feature."""

import numpy as np
import jax.numpy as jnp

from craytracer_tpu.camera import Film, make_camera
from craytracer_tpu.integrator.aov import render_aovs
from craytracer_tpu.scene import SceneBuilder


def test_aovs_geometry():
    b = SceneBuilder()
    b.add_matte("floor", (0.3, 0.5, 0.7))
    b.add_emissive("l", (1, 1, 1), 5.0)
    b.add_rect((-10, 0, -10), (20, 0, 0), (0, 0, 20), "floor")
    b.add_rect((-1, 8, -1), (2, 0, 0), (0, 0, 2), "l")
    scene = b.build()
    cam = make_camera((0, 5, 10), (0, 0, 0))
    film = Film(fov=jnp.float32(np.radians(40.0)), width=16, height=16)
    aovs = render_aovs(scene, cam, film)

    n = np.asarray(aovs["normal"]).reshape(16, 16, 3)
    d = np.asarray(aovs["depth"]).reshape(16, 16, 3)
    a = np.asarray(aovs["albedo"]).reshape(16, 16, 3)
    # center pixel: floor hit — up normal, known albedo, sane depth
    c = (8, 8)
    np.testing.assert_allclose(n[c], [0, 1, 0], atol=1e-5)
    np.testing.assert_allclose(a[c], [0.3, 0.5, 0.7], atol=1e-6)
    assert 10.0 < d[c][0] < 13.0
    # top rows look above the floor -> miss -> zeros
    assert np.all(n[0] == 0) and np.all(d[0] == 0)
