"""Ground-truth anchor: the renderer's direct lighting against numerical
quadrature of the rendering equation (SURVEY.md §4: "Cornell box mean
radiance vs analytic/brute-force")."""

import jax.numpy as jnp
import numpy as np
import pytest

from craytracer_tpu.integrator.wavefront import trace_paths
from craytracer_tpu.scene import SceneBuilder


def test_direct_lighting_matches_quadrature():
    """Floor point under a rect light: MC NEE estimate (depth 1, physical)
    must converge to the quadrature value of
    L = (rho/pi) * integral Li cos(theta) cos(theta_l) / d^2 dA."""
    rho = 0.6
    li = 8.0
    b = SceneBuilder()
    b.add_matte("floor", (rho, rho, rho))
    b.add_emissive("lamp", (1, 1, 1), li)
    b.add_rect((-50, 0, -50), (100, 0, 0), (0, 0, 100), "floor")
    # light: 2x3 rect at height 5, offset to (1, 5, 0.5)
    lp = np.array([1.0, 5.0, 0.5])
    w = np.array([2.0, 0.0, 0.0])
    h = np.array([0.0, 0.0, 3.0])
    b.add_rect(tuple(lp), tuple(w), tuple(h), "lamp")
    scene = b.build()

    # shading point: floor origin; rays arrive from above
    n = 1 << 15
    o = jnp.tile(jnp.asarray([[0.3, 3.0, 0.2]], jnp.float32), (n, 1))
    d = jnp.tile(jnp.asarray([[-0.1, -1.0, -0.0667]], jnp.float32), (n, 1))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    ids = jnp.arange(n, dtype=jnp.uint32)
    L, good = trace_paths(scene, o, d, 0, ids, 0, 1)
    mc = float(np.asarray(L).mean(axis=0)[0])

    # the shading point the rays actually hit
    t_hit = 3.0 / (1.0 / np.linalg.norm([-0.1, -1.0, -0.0667]))
    dirn = np.array([-0.1, -1.0, -0.0667])
    dirn /= np.linalg.norm(dirn)
    x = np.array([0.3, 3.0, 0.2]) + (3.0 / -dirn[1]) * dirn  # y=0 plane

    # quadrature over the light: L = rho/pi * sum Li cos cos_l / d^2 dA
    k = 256
    us = (np.arange(k) + 0.5) / k
    uu, vv = np.meshgrid(us, us, indexing="ij")
    pts = lp[None, None] + uu[..., None] * w[None, None] + vv[..., None] * h[None, None]
    to_l = pts - x
    dist = np.linalg.norm(to_l, axis=-1)
    wi = to_l / dist[..., None]
    cos_x = np.maximum(wi[..., 1], 0.0)  # floor normal +y
    # light normal: width x height = (2,0,0)x(0,0,3) = (0,-6,0) -> -y,
    # facing the floor; cos_l = dot(n_l, -wi) = +wi_y
    cos_l = np.maximum(wi[..., 1], 0.0)
    area_el = (np.linalg.norm(w) * np.linalg.norm(h)) / (k * k)
    quad = (rho / np.pi) * np.sum(li * cos_x * cos_l / dist**2) * area_el

    # depth-1 trace adds only the NEE term at the first vertex (indirect
    # bounce escapes to nothing: no env light)
    np.testing.assert_allclose(mc, quad, rtol=0.03)


def test_load_test_scene2():
    """The third shipped fixture parses (mesh files absent -> skipped;
    'SIGMA 0.o' exercises C-atof)."""
    import os

    ref = "/root/reference/test_scene2.txt"
    if not os.path.exists(ref):
        pytest.skip("no reference")
    from craytracer_tpu.io.scenefile import load_scene_file

    scene, cam, film = load_scene_file(ref)
    assert scene.rects.mat_id.shape[0] == 3
    # materials: default + matte1 + emissive1 + plastic_black + floor
    assert scene.materials.mat_type.shape[0] == 5
    np.testing.assert_allclose(np.asarray(cam.position),
                               [0.00306164, 0.165588, 0.835307], rtol=1e-5)
