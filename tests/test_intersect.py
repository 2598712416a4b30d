"""Ray-primitive intersection tests against closed-form cases (SURVEY.md §4:
unit tests per kernel — sphere/triangle/AABB hits)."""

import jax.numpy as jnp
import numpy as np

from craytracer_tpu.constants import TMAX
from craytracer_tpu.ops import intersect_scene, shadow_distance
from craytracer_tpu.scene import SceneBuilder
from craytracer_tpu.scene import types as T


def _rays(rows):
    o = jnp.asarray([r[0] for r in rows], jnp.float32)
    d = jnp.asarray([r[1] for r in rows], jnp.float32)
    return o, d


def test_sphere_hit_and_normal():
    b = SceneBuilder()
    b.add_matte("m", (1, 1, 1))
    b.add_sphere((0, 0, 0), 1.0, "m")
    scene = b.build()
    o, d = _rays([
        ((0, 0, 5), (0, 0, -1)),  # hit at t=4
        ((0, 3, 0), (0, -1, 0)),  # hit at t=2 from above
        ((5, 5, 5), (0, 0, -1)),  # miss
        ((0, 0, 0), (0, 0, -1)),  # from inside: exit at t=1
    ])
    h = intersect_scene(scene, o, d)
    np.testing.assert_allclose(h.t[0], 4.0, rtol=1e-5)
    np.testing.assert_allclose(h.t[1], 2.0, rtol=1e-5)
    assert h.t[2] == TMAX
    np.testing.assert_allclose(h.t[3], 1.0, rtol=1e-4)
    np.testing.assert_allclose(h.normal[0], [0, 0, 1], atol=1e-5)
    np.testing.assert_allclose(h.normal[1], [0, 1, 0], atol=1e-5)


def test_sphere_theta_clip():
    b = SceneBuilder()
    b.add_matte("m")
    # upper hemisphere only: theta in [0, pi/2]
    b.add_sphere((0, 0, 0), 1.0, "m", max_theta=np.pi / 2)
    scene = b.build()
    o, d = _rays([((0, 5, 0), (0, -1, 0)), ((0, -5, 0), (0, 1, 0))])
    h = intersect_scene(scene, o, d)
    np.testing.assert_allclose(h.t[0], 4.0, rtol=1e-5)  # top pole hit
    # from below, the first root (bottom pole) is clipped; exits via top pole
    np.testing.assert_allclose(h.t[1], 6.0, rtol=1e-5)


def test_plane_rect_disk():
    b = SceneBuilder()
    b.add_matte("m")
    b.add_plane((0, -1, 0), (0, 1, 0), "m")
    b.add_rect((0, 0, -3), (2, 0, 0), (0, 2, 0), "m")
    b.add_disk((5, 0, 0), (1, 0, 0), 1.0, "m")
    scene = b.build()
    o, d = _rays([
        ((0, 1, 0), (0, -1, 0)),        # plane at t=2
        ((1, 1, 0), (0, 0, -1)),        # rect at t=3 (u,v inside)
        ((3, 0, 0), (0, 0, -1)),        # miss rect (x outside [0,2]... actually inside? x=3 > 2) -> plane? no. miss
        ((0, 0, 0), (1, 0, 0)),         # disk at t=5
        ((0, 2.5, 0), (1, 0, 0)),       # miss disk (outside radius), parallel to plane
    ])
    h = intersect_scene(scene, o, d)
    np.testing.assert_allclose(h.t[0], 2.0, rtol=1e-5)
    assert int(h.group[0]) == T.GROUP_PLANE
    np.testing.assert_allclose(h.t[1], 3.0, rtol=1e-5)
    assert int(h.group[1]) == T.GROUP_RECT
    np.testing.assert_allclose(h.uv[1], [0.5, 0.5], atol=1e-5)
    assert h.t[2] == TMAX
    np.testing.assert_allclose(h.t[3], 5.0, rtol=1e-5)
    assert int(h.group[3]) == T.GROUP_DISK
    # disk normal faces the incoming ray
    np.testing.assert_allclose(h.normal[3], [-1, 0, 0], atol=1e-5)
    assert h.t[4] == TMAX


def test_triangle_barycentric_uv():
    b = SceneBuilder()
    b.add_matte("m")
    b.add_triangle((0, 0, 0), (2, 0, 0), (0, 2, 0), "m",
                   uv0=(0, 0), uv1=(1, 0), uv2=(0, 1))
    scene = b.build()
    o, d = _rays([
        ((0.5, 0.5, 5), (0, 0, -1)),
        ((1.5, 1.5, 5), (0, 0, -1)),  # outside (beta+gamma > 1)
    ])
    h = intersect_scene(scene, o, d)
    np.testing.assert_allclose(h.t[0], 5.0, rtol=1e-5)
    np.testing.assert_allclose(h.uv[0], [0.25, 0.25], atol=1e-5)
    assert h.t[1] == TMAX


def test_instanced_box():
    b = SceneBuilder()
    b.add_matte("m")
    b.add_box(2.0, 4.0, 6.0, "m", location=(10, 0, 0))
    scene = b.build()
    o, d = _rays([
        ((0, 0, 0), (1, 0, 0)),   # hits x face at 10-1=9
        ((10, 10, 0), (0, -1, 0)),  # hits top face at 10-2=8
        ((0, 3, 0), (1, 0, 0)),   # passes above (y=3 > 2)
    ])
    h = intersect_scene(scene, o, d)
    np.testing.assert_allclose(h.t[0], 9.0, rtol=1e-4)
    np.testing.assert_allclose(h.normal[0], [-1, 0, 0], atol=1e-4)
    np.testing.assert_allclose(h.t[1], 8.0, rtol=1e-4)
    np.testing.assert_allclose(h.normal[1], [0, 1, 0], atol=1e-4)
    assert h.t[2] == TMAX


def test_instanced_box_rotated_scaled():
    b = SceneBuilder()
    b.add_matte("m")
    # unit cube scaled by 2 in x, rotated 90 deg about y: x-span becomes z-span
    b.add_box(1.0, 1.0, 1.0, "m", location=(0, 0, -5), scale=(2, 1, 1),
              orientation=(0, np.pi / 2, 0))
    scene = b.build()
    o, d = _rays([((0, 0, 0), (0, 0, -1))])
    h = intersect_scene(scene, o, d)
    # rotated: local x (scaled to half-width 1.0) now along world z
    np.testing.assert_allclose(h.t[0], 4.0, rtol=1e-4)


def test_torus():
    b = SceneBuilder()
    b.add_matte("m")
    b.add_torus(2.0, 0.5, np.pi, "m")  # swept 2, tube 0.5 in xz plane
    scene = b.build()
    o, d = _rays([
        ((5, 0, 0), (-1, 0, 0)),  # hits outer rim at x=2.5 -> t=2.5
        ((0, 5, 0), (0, -1, 0)),  # through the hole -> miss
        ((2, 5, 0), (0, -1, 0)),  # down onto the tube top at y=0.5 -> t=4.5
    ])
    h = intersect_scene(scene, o, d)
    np.testing.assert_allclose(h.t[0], 2.5, rtol=1e-3)
    assert h.t[1] == TMAX
    np.testing.assert_allclose(h.t[2], 4.5, rtol=1e-3)
    np.testing.assert_allclose(h.normal[2], [0, 1, 0], atol=1e-2)


def test_cylinder():
    b = SceneBuilder()
    b.add_matte("m")
    b.add_open_cylinder(np.pi, "m", location=(0, 0, 0), scale=(3, 2, 3))
    scene = b.build()
    o, d = _rays([
        ((10, 0, 0), (-1, 0, 0)),   # side hit at x=3 -> t=7
        ((10, 5, 0), (-1, 0, 0)),   # above (|y/2| > 1) -> miss
    ])
    h = intersect_scene(scene, o, d)
    np.testing.assert_allclose(h.t[0], 7.0, rtol=1e-4)
    assert h.t[1] == TMAX


def test_shadow_distance_matches_closest():
    b = SceneBuilder()
    b.add_matte("m")
    b.add_sphere((0, 0, -3), 1.0, "m")
    b.add_plane((0, 0, -10), (0, 0, 1), "m")
    scene = b.build()
    o = jnp.asarray([[0, 0, 0]], jnp.float32)
    d = jnp.asarray([[0, 0, -1]], jnp.float32)
    t = shadow_distance(scene, o, d)
    np.testing.assert_allclose(t[0], 2.0, rtol=1e-5)
