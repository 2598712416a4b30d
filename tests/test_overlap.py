"""Per-bounce grad-bucket overlap (parallel/overlap.py) equivalence.

The bucketed step must produce the same loss and the same parameter
gradients as the single-tree-pmean step (sharded.py) — pmean is linear, so
bucketing by bounce only reassociates the floating-point sum.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from craytracer_tpu.camera import Film, make_camera
from craytracer_tpu.parallel.overlap import bucketed_train_step
from craytracer_tpu.parallel.sharded import make_mesh, sharded_train_step
from craytracer_tpu.scene import SceneBuilder


def _tiny_scene():
    b = SceneBuilder()
    b.add_matte("w", (0.7, 0.7, 0.7))
    b.add_matte("r", (0.6, 0.1, 0.1))
    b.add_emissive("l", (1.0, 1.0, 1.0), 6.0)
    b.add_rect((-2, 0, -2), (4, 0, 0), (0, 0, 4), "w")
    b.add_rect((-2, 4, -2), (4, 0, 0), (0, 0, 4), "w")
    b.add_sphere((0.0, 1.0, 0.0), 0.8, "r")
    b.add_rect((-0.5, 3.9, -0.5), (1, 0, 0), (0, 0, 1), "l")
    return b.build()


@pytest.mark.parametrize("depth", [3])
def test_bucketed_matches_single_pmean(depth):
    scene = _tiny_scene()
    cam = make_camera((0, 2.0, 6.0), (0, 1.0, 0))
    film = Film(fov=jnp.float32(np.radians(45.0)), width=16, height=16)
    ids = jnp.arange(film.num_pixels, dtype=jnp.int32)
    target = jnp.zeros((film.num_pixels, 3), jnp.float32)

    mesh = make_mesh(8)
    base = sharded_train_step(mesh, depth)
    bucketed = bucketed_train_step(mesh, depth)

    loss_a, grads_a = base(scene, cam, film, ids, 7, 0, target)
    loss_b, grads_b = bucketed(scene, cam, film, ids, 7, 0, target)

    assert np.allclose(float(loss_a), float(loss_b), rtol=1e-6)
    flat_a, _ = jax.tree.flatten(grads_a)
    flat_b, _ = jax.tree.flatten(grads_b)
    assert len(flat_a) == len(flat_b)
    checked = 0
    for ga, gb in zip(flat_a, flat_b):
        if ga.dtype == jax.dtypes.float0:
            continue
        assert np.allclose(np.asarray(ga), np.asarray(gb),
                           rtol=1e-4, atol=1e-6)
        checked += 1
    assert checked > 5
    # and the gradients are not all trivially zero
    total = sum(float(np.abs(np.asarray(g)).sum()) for g in flat_a
                if g.dtype != jax.dtypes.float0)
    assert total > 0.0
