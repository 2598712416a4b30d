"""Binned-treelet traversal (accel/binned.py) vs the fat-row BVH4 —
equivalence on closest-hit and any-hit, plus treelet-cut invariants.

Reference analog: the traversals must agree with accelerator/bvh4.h
semantics (closest hit t/prim, shadow occlusion boolean)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from craytracer_tpu.accel.binned import (BinnedArrays, binned_any_hit,
                                         binned_closest_hit, build_binned,
                                         _subtree_ranges)
from craytracer_tpu.accel.bvh4 import build_bvh4, bvh4_any_hit, \
    bvh4_closest_hit


def _soup(n_tri, seed=0, spread=10.0):
    rng = np.random.default_rng(seed)
    c = rng.uniform(-spread, spread, (n_tri, 3)).astype(np.float32)
    v0 = c + rng.normal(0, .5, (n_tri, 3)).astype(np.float32)
    v1 = c + rng.normal(0, .5, (n_tri, 3)).astype(np.float32)
    v2 = c + rng.normal(0, .5, (n_tri, 3)).astype(np.float32)
    return v0, v1, v2


def _rays(n, seed=1, spread=12.0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    d = rng.normal(0, 1, (n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


@pytest.mark.parametrize("L,k", [(64, 1), (128, 2), (256, 4)])
def test_closest_hit_matches_bvh4(L, k):
    v0, v1, v2 = _soup(3000)
    bvh = build_bvh4(v0, v1, v2)
    acc = build_binned(v0, v1, v2, L=L)
    o, d = _rays(2048)
    t_r, tri_r = jax.jit(lambda o, d: bvh4_closest_hit(bvh, o, d))(o, d)
    t_b, tri_b = jax.jit(
        lambda o, d: binned_closest_hit(acc, o, d, block=512, k_fetch=k))(o, d)
    assert float(jnp.mean((tri_r == tri_b).astype(jnp.float32))) == 1.0
    np.testing.assert_allclose(np.asarray(t_b)[np.asarray(tri_r) >= 0],
                               np.asarray(t_r)[np.asarray(tri_r) >= 0],
                               rtol=1e-4, atol=1e-4)


def test_any_hit_occlusion_matches_bvh4():
    v0, v1, v2 = _soup(3000)
    bvh = build_bvh4(v0, v1, v2)
    acc = build_binned(v0, v1, v2, L=128)
    o, d = _rays(2048, seed=3)
    md = jnp.full((2048,), 7.5)
    ta = jax.jit(lambda o, d: bvh4_any_hit(bvh, o, d, md))(o, d)
    tb = jax.jit(lambda o, d: binned_any_hit(acc, o, d, md, block=512))(o, d)
    assert (np.asarray(ta) < 7.5).tolist() == (np.asarray(tb) < 7.5).tolist()


def test_treelet_cut_partitions_triangles():
    """Every triangle appears in exactly one treelet (subtree-cut law)."""
    v0, v1, v2 = _soup(1777, seed=5)
    for L in (32, 256):
        acc = build_binned(v0, v1, v2, L=L)
        ids = np.asarray(acc.tris)[9].astype(np.int64)
        real = np.sort(ids[ids >= 0])
        assert real.shape[0] == 1777
        assert (real == np.arange(1777)).all()


def test_subtree_ranges_small_tree():
    """Hand-checked DFS tree: root(0) -> leaf(1), internal(2) -> leaves 3,4."""
    right = np.array([2, -1, 4, -1, -1], np.int32)
    first = np.array([0, 0, 0, 2, 5], np.int32)
    count = np.array([0, 2, 0, 3, 1], np.int32)
    rfirst, rcount = _subtree_ranges(right, first, count)
    assert rfirst.tolist() == [0, 0, 2, 2, 5]
    assert rcount.tolist() == [6, 2, 4, 3, 1]


def test_empty_and_tiny_scene():
    acc = build_binned(np.zeros((0, 3)), np.zeros((0, 3)), np.zeros((0, 3)))
    o, d = _rays(128)
    t, tri = binned_closest_hit(acc, o, d)
    assert (np.asarray(tri) == -1).all()
    v0 = np.array([[-1, -1, 5.0]], np.float32)
    v1 = np.array([[1, -1, 5.0]], np.float32)
    v2 = np.array([[0, 1, 5.0]], np.float32)
    acc1 = build_binned(v0, v1, v2, L=64)
    o = jnp.zeros((4, 3))
    d = jnp.asarray(np.array([[0, 0, 1], [0, 0, -1], [1, 0, 0],
                              [0.05, 0.05, 1]], np.float32))
    t, tri = binned_closest_hit(acc1, o, d)
    assert np.asarray(tri).tolist() == [0, -1, -1, 0]
    np.testing.assert_allclose(np.asarray(t)[0], 5.0, rtol=1e-5)
