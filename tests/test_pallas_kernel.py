"""Pallas ray-triangle kernel correctness (interpret mode; the compiled
Mosaic path is environment-gated — see ops/pallas_tri.py docstring)."""

import jax.numpy as jnp
import numpy as np

from craytracer_tpu.constants import TMAX
from craytracer_tpu.ops.pallas_tri import pack_triangles, pallas_triangle_closest
from craytracer_tpu.ops.intersect import triangle_ts
from craytracer_tpu.scene import SceneBuilder


def test_pallas_matches_xla_interpret():
    rng = np.random.default_rng(0)
    T = 300
    base = rng.uniform(-10, 10, (T, 3))
    v0 = base + rng.normal(0, 1, (T, 3))
    v1 = base + rng.normal(0, 1, (T, 3))
    v2 = base + rng.normal(0, 1, (T, 3))
    o = jnp.asarray(rng.uniform(-15, 15, (700, 3)), jnp.float32)
    d = rng.normal(size=(700, 3))
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True), jnp.float32)
    t, idx = pallas_triangle_closest(o, d, pack_triangles(v0, v1, v2), interpret=True)

    b = SceneBuilder()
    b.add_matte("m")
    for a, bb, c in zip(v0, v1, v2):
        b.add_triangle(a, bb, c, "m")
    ts, _, _ = triangle_ts(o, d, b.build(accel="none").triangles)
    t_ref = jnp.min(ts, axis=1)
    hit = np.asarray(t_ref) < TMAX
    np.testing.assert_array_equal(hit, np.asarray(t) < TMAX)
    np.testing.assert_allclose(np.asarray(t)[hit], np.asarray(t_ref)[hit], rtol=1e-4)
    assert hit.sum() > 30
