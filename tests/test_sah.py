"""SAH build correctness: the sweep-SAH split (native/craynative.cpp::
sah_split, a quality improvement over the reference's median split,
accelerator/bvh.h:85-154) must produce identical intersections — only the
tree shape may differ."""

import numpy as np
import jax.numpy as jnp
import pytest

from craytracer_tpu.accel.bvh4 import build_bvh4, bvh4_any_hit, bvh4_closest_hit
from craytracer_tpu.native import _load


def _cluster_scene(seed=3, clusters=30, tris_per=97):
    """Irregular scene: clusters of random triangles at varying scales
    plus a big ground quad — the shape class where SAH beats median."""
    rng = np.random.default_rng(seed)
    v0s, v1s, v2s = [], [], []
    for _ in range(clusters):
        c = rng.normal(0, 20, 3)
        s = 10.0 ** rng.uniform(-1, 1)
        base = rng.normal(0, s, (tris_per, 3)) + c
        e1 = rng.normal(0, 0.3 * s, (tris_per, 3))
        e2 = rng.normal(0, 0.3 * s, (tris_per, 3))
        v0s.append(base)
        v1s.append(base + e1)
        v2s.append(base + e2)
    g = 60.0
    v0s.append(np.array([[-g, -5, -g], [-g, -5, -g]]))
    v1s.append(np.array([[g, -5, -g], [g, -5, g]]))
    v2s.append(np.array([[-g, -5, g], [-g, -5, g]]))
    return (np.concatenate(v0s).astype(np.float32),
            np.concatenate(v1s).astype(np.float32),
            np.concatenate(v2s).astype(np.float32))


@pytest.mark.skipif(_load() is None, reason="native builder unavailable")
@pytest.mark.parametrize("leaf_size", [2, 4])
def test_sah_equals_median_hits(leaf_size):
    v0, v1, v2 = _cluster_scene()
    bm = build_bvh4(v0, v1, v2, leaf_size=leaf_size, split="median")
    bs = build_bvh4(v0, v1, v2, leaf_size=leaf_size, split="sah")

    rng = np.random.default_rng(0)
    n = 4096
    o = jnp.asarray(rng.normal(0, 30, (n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))

    tm, im = bvh4_closest_hit(bm, o, d)
    ts, isa = bvh4_closest_hit(bs, o, d)
    assert jnp.allclose(tm, ts, rtol=1e-6, atol=1e-6)
    assert bool(jnp.all(im == isa))

    md = jnp.full((n,), 25.0)
    am = bvh4_any_hit(bm, o, d, md)
    asah = bvh4_any_hit(bs, o, d, md)
    assert bool(jnp.all((am < md) == (asah < md)))


@pytest.mark.skipif(_load() is None, reason="native builder unavailable")
def test_sah_restricts_depth():
    # Adversarial input — many near-identical triangles — must not
    # produce a tree deeper than the traversal stack supports.
    from craytracer_tpu.accel.bvh import MAX_STACK

    n = 20000
    v0 = np.zeros((n, 3), np.float32)
    v1 = np.tile(np.array([1, 0, 0], np.float32), (n, 1))
    v2 = np.tile(np.array([0, 1, 0], np.float32), (n, 1))
    b = build_bvh4(v0, v1, v2, leaf_size=2, split="sah")
    fat = np.asarray(b.fat)
    child = fat[:, 24:28].astype(np.int64)  # [M, 4]

    # BFS depth of the 4-wide DAG
    depth = 0
    frontier = np.array([0])
    seen_leafless = 0
    while frontier.size and depth < 10 * MAX_STACK:
        kids = child[frontier].reshape(-1)
        frontier = np.unique(kids[kids >= 0])
        depth += 1
    assert frontier.size == 0, "cycle or runaway depth"
    # worst-case stack: 3 pushes net per level
    assert 3 * depth + 4 <= MAX_STACK, depth
