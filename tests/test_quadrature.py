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


def test_cylinder_direct_lighting_matches_quadrature():
    """Instanced open-cylinder point under a rect lamp: our depth-1 NEE
    estimate must converge to exact quadrature.

    This anchors the shape family the golden-parity suite deliberately
    EXCLUDES: the reference binary renders cylinder direct lighting ~2.3x
    above the exact value (measured 2026-08-18 on this exact scene:
    quadrature 0.0868, ours 0.0883, reference 0.1992 on the red channel).
    Its shadow ray starts exactly ON the quadric so the near root clears
    K_EPSILON by f32 luck (false self-occlusion, generic.cpp:82-124) and
    the good-paths ratio estimator (trace.h:528) divides by the reduced
    contributing count — per-sample luck no reimplementation can match,
    so the exact integral is the arbiter and we match IT."""
    from craytracer_tpu.camera import Film, generate_rays, make_camera
    from craytracer_tpu.ops.intersect import intersect_scene

    b = SceneBuilder()
    b.add_matte("grey", (0.73, 0.73, 0.73))
    b.add_matte("red", (0.65, 0.1, 0.08))
    b.add_emissive("lamp", (1, 0.95, 0.85), 12.0)
    b.add_rect((-3, 0, -3), (6, 0, 0), (0, 0, 6), "grey")
    b.add_rect((-3, 0, -2), (6, 0, 0), (0, 3.5, 0), "grey")
    from craytracer_tpu.scene import types as T

    b.add_open_cylinder(6.2831853, "red", location=(0.9, 0.75, 0.9),
                        scale=(0.35, 0.45, 0.35),
                        normal_type=T.NORMAL_CONVEX)
    lamp_p = np.array([-0.2, 3.2, 1.2])
    b.add_rect(tuple(lamp_p), (2, 0, 0), (0, 0, 2), "lamp")
    scene = b.build()

    cam = make_camera((0, 1.2, 4.2), (0, 0.8, 0))
    film = Film(fov=jnp.float32(np.radians(38.0)), width=64, height=64)
    px, py = 48, 36  # mid-height on the lamp-facing cylinder wall
    pid = jnp.asarray([py * 64 + px], jnp.int32)
    o, d = generate_rays(cam, film, pid, jnp.full((1, 2), 0.5))
    hit = intersect_scene(scene, o, d)
    p = np.asarray(o + hit.t[:, None] * d)[0]
    nrm = np.asarray(hit.normal)[0]

    # exact quadrature over the lamp (no occluder between wall and lamp)
    Le = np.array([1, 0.95, 0.85]) * 12.0
    albedo = np.array([0.65, 0.1, 0.08])
    K = 64
    u = (np.arange(K * K) % K + 0.5) / K
    v = (np.arange(K * K) // K + 0.5) / K
    lp = np.stack([lamp_p[0] + 2 * u, np.full(K * K, lamp_p[1]),
                   lamp_p[2] + 2 * v], axis=1)
    wi = lp - p
    dist = np.linalg.norm(wi, axis=1)
    wiN = wi / dist[:, None]
    cos_s = np.maximum(wiN @ nrm, 0.0)
    cos_l = np.maximum(wiN[:, 1], 0.0)  # lamp normal (0,-1,0)
    exact = (albedo / np.pi)[None] * Le[None] * (
        cos_s * cos_l / dist ** 2)[:, None]
    exact = exact.mean(axis=0) * 4.0  # lamp area

    # MC: many replicas of the same camera ray, depth 1, physical
    n = 1 << 14
    oN = jnp.tile(o, (n, 1))
    dN = jnp.tile(d, (n, 1))
    ids = jnp.arange(n, dtype=jnp.int32)
    L, good = trace_paths(scene, oN, dN, 0, ids, 0, 1)
    mc = np.asarray(L).mean(axis=0)
    np.testing.assert_allclose(mc, exact, rtol=0.05)
