"""Camera-bounce binned accel (T.Scene.tri_cam, CRAY_CAM_BINNED=1):
bounce 0 is peeled out of the fori_loop and its Morton-tiled camera rays
take the treelet-vote traversal; bounces >= 1 keep the fat-row path.
The image must match the plain bvh4 render."""

import os

import numpy as np
import pytest
import sys

sys.path.insert(0, "scenes")


def _scene(accel="bvh4", cam_binned=False, mxu=True):
    from make_fixtures import icosphere

    from craytracer_tpu.scene import SceneBuilder

    env = {"CRAY_CAM_BINNED": "1" if cam_binned else "0",
           "CRAY_BINNED_MXU": "1" if mxu else "0",
           "CRAY_BINNED_L": "64"}
    old = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        b = SceneBuilder()
        b.add_matte("w", (0.7, 0.7, 0.7))
        b.add_emissive("l", (1, 1, 1), 25.0)
        b.add_rect((-20, 0, -20), (40, 0, 0), (0, 0, 40), "w")
        v, f = icosphere(2)
        import numpy as np

        for c in ([-2, 1, 0], [2, 1, 0], [0, 1, -2.5]):
            w = v + np.asarray(c, np.float64)
            b.add_triangles_array(w[f[:, 0]], w[f[:, 1]], w[f[:, 2]], "w")
        b.add_rect((-2, 8, -2), (4, 0, 0), (0, 0, 4), "l")
        return b.build(accel=accel)
    finally:
        for k, val in old.items():
            if val is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = val


def _render(scene, depth=3):
    import jax.numpy as jnp

    from craytracer_tpu.camera import Film, generate_rays, make_camera
    from craytracer_tpu.integrator.wavefront import CAMERA_BOUNCE, trace_paths
    from craytracer_tpu.sampling import uniforms

    cam = make_camera((0.0, 4.0, 9.0), (0.0, 1.0, 0.0))
    film = Film(fov=jnp.float32(np.radians(45.0)), width=32, height=32)
    ids = jnp.arange(film.num_pixels, dtype=jnp.int32)
    spp = jnp.zeros_like(ids)
    jitter = uniforms(0, ids, spp, CAMERA_BOUNCE, 2, 0)
    o, d = generate_rays(cam, film, ids, jitter)
    L, good = trace_paths(scene, o, d, 0, ids, spp, depth)
    return np.asarray(L)


@pytest.mark.parametrize("mxu", [False, True])
def test_cam_binned_matches_bvh4(mxu):
    base = _render(_scene())
    camb = _render(_scene(cam_binned=True, mxu=mxu))
    if mxu:
        # the MXU Moller-Trumbore evaluates in bf16x3 (Precision.HIGH):
        # bounce-0 hit t may differ in the last ulps, shifting hit points
        # by ~1e-5 — image-level agreement, not bit-equality
        np.testing.assert_allclose(camb, base, rtol=2e-2, atol=2e-2)
        assert np.abs(camb - base).mean() < 1e-3
    else:
        np.testing.assert_allclose(camb, base, rtol=1e-5, atol=1e-5)


def test_cam_binned_remat_matches():
    base = _render(_scene())
    import jax.numpy as jnp

    from craytracer_tpu.camera import Film, generate_rays, make_camera
    from craytracer_tpu.integrator.wavefront import CAMERA_BOUNCE, trace_paths
    from craytracer_tpu.sampling import uniforms

    scene = _scene(cam_binned=True, mxu=False)
    cam = make_camera((0.0, 4.0, 9.0), (0.0, 1.0, 0.0))
    film = Film(fov=jnp.float32(np.radians(45.0)), width=32, height=32)
    ids = jnp.arange(film.num_pixels, dtype=jnp.int32)
    spp = jnp.zeros_like(ids)
    jitter = uniforms(0, ids, spp, CAMERA_BOUNCE, 2, 0)
    o, d = generate_rays(cam, film, ids, jitter)
    L, good = trace_paths(scene, o, d, 0, ids, spp, 3, remat=True)
    np.testing.assert_allclose(np.asarray(L), base, rtol=1e-5, atol=1e-5)
