"""Partitioned BVH4 (accel/bvh4_parts.py): the VMEM-budget cut must be
hit-identical to the monolithic traversal, through both the XLA per-part
fallback and the carried-init Pallas kernel (interpret mode)."""

import sys

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, "scenes")


def _mesh_bvh():
    from make_fixtures import icosphere

    from craytracer_tpu.accel.bvh4 import build_bvh4

    v, f = icosphere(2)
    rng = np.random.default_rng(3)
    v0s, v1s, v2s = [], [], []
    for _ in range(16):
        c = rng.normal(0, 8, 3)
        s = 0.5 + rng.random()
        w = v * s + c
        v0s.append(w[f[:, 0]])
        v1s.append(w[f[:, 1]])
        v2s.append(w[f[:, 2]])
    v0, v1, v2 = (np.concatenate(x) for x in (v0s, v1s, v2s))
    return build_bvh4(v0, v1, v2)


def _rays(n=700):
    rng = np.random.default_rng(4)
    o = rng.uniform(-12, 12, (n, 3)).astype(np.float32)
    # aim at jittered points near the cluster so most rays hit something
    d = rng.normal(0, 5, (n, 3)).astype(np.float32) - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_partition_covers_all_triangles():
    from craytracer_tpu.accel.bvh4 import _FAT_TRI0, _TRI_COLS
    from craytracer_tpu.accel.bvh4_parts import partition_bvh4

    bvh = _mesh_bvh()
    # force a cut: budget of ~1/5 of the table
    budget = int(bvh.fat.size * 4 // 5)
    parts = partition_bvh4(bvh, budget_bytes=budget)
    assert len(parts) > 2
    for p in parts:
        assert p.fat.size * 4 <= budget

    def tri_ids(fat):
        fat = np.asarray(fat)
        k_slots = 4 * bvh.leaf_size
        ids = fat[:, _FAT_TRI0 + _TRI_COLS - 1:
                  _FAT_TRI0 + k_slots * _TRI_COLS:_TRI_COLS]
        return ids[ids >= 0].astype(np.int64)

    whole = np.sort(tri_ids(bvh.fat))
    split = np.sort(np.concatenate([tri_ids(p.fat) for p in parts]))
    # every triangle appears in exactly one part
    np.testing.assert_array_equal(whole, split)


def test_parts_match_monolithic_xla_and_pallas():
    from craytracer_tpu.accel.bvh4 import bvh4_closest_hit
    from craytracer_tpu.accel.bvh4_parts import (
        pallas_parts_closest_hit, partition_bvh4, parts_closest_hit)

    bvh = _mesh_bvh()
    parts = partition_bvh4(bvh, budget_bytes=int(bvh.fat.size * 4 // 5))
    o, d = _rays()
    t0, i0 = bvh4_closest_hit(bvh, o, d)
    t1, i1 = parts_closest_hit(parts, o, d)
    np.testing.assert_allclose(np.asarray(t0), np.asarray(t1), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    t2, i2 = pallas_parts_closest_hit(parts, o, d, interpret=True)
    np.testing.assert_allclose(np.asarray(t0), np.asarray(t2), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i2))
    assert (np.asarray(t0) < 1e8).sum() > 30


def test_parts_any_hit_matches():
    from craytracer_tpu.accel.bvh4 import bvh4_any_hit
    from craytracer_tpu.accel.bvh4_parts import (parts_any_hit,
                                                 partition_bvh4)

    bvh = _mesh_bvh()
    parts = partition_bvh4(bvh, budget_bytes=int(bvh.fat.size * 4 // 5))
    o, d = _rays()
    md = jnp.full((o.shape[0],), 15.0)
    t0 = bvh4_any_hit(bvh, o, d, md)
    t1 = parts_any_hit(parts, o, d, md)
    occ0 = np.asarray(t0) < 15.0
    occ1 = np.asarray(t1) < 15.0
    np.testing.assert_array_equal(occ0, occ1)
    assert occ0.sum() > 20


def test_pallas_parts_any_hit_matches_monolithic():
    """Parts packet any-hit (occluded lanes carry md=0 into later parts)
    equals the monolithic any-hit occlusion verdict."""
    import sys

    sys.path.insert(0, "scenes")
    import numpy as np
    import jax.numpy as jnp
    from make_fixtures import icosphere

    from craytracer_tpu.accel.bvh4 import build_bvh4, bvh4_any_hit
    from craytracer_tpu.accel.bvh4_parts import (pallas_parts_any_hit,
                                                 partition_bvh4)
    from craytracer_tpu.constants import TMAX

    v, f = icosphere(2)
    bvh = build_bvh4(v[f[:, 0]] * 3, v[f[:, 1]] * 3, v[f[:, 2]] * 3,
                     leaf_size=2)
    parts = partition_bvh4(bvh, budget_bytes=bvh.fat.size)  # force a cut
    assert len(parts) > 1
    rng = np.random.default_rng(5)
    n = 400
    o = jnp.asarray(np.tile([[0.0, 0.5, 8.0]], (n, 1)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d[:, 2] -= 1.5
    d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True))
    md = jnp.full((n,), 12.0)
    t_ref = bvh4_any_hit(bvh, o, d, md)
    t_parts = pallas_parts_any_hit(parts, o, d, md, interpret=True)
    # any-hit may find a DIFFERENT occluder (any t < md is a valid
    # verdict) — occlusion VERDICTS must match exactly
    np.testing.assert_array_equal(np.asarray(t_ref) < np.asarray(md),
                                  np.asarray(t_parts) < np.asarray(md))
    assert (np.asarray(t_ref) < TMAX).sum() > 30
