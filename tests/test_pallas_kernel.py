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


def test_pallas_bvh4_traversal_matches_xla():
    """North-star Pallas traversal kernel (accel/pallas_bvh4.py):
    interpret-mode equivalence against the XLA while_loop traversal on a
    real mesh — identical t and triangle ids."""
    import sys

    sys.path.insert(0, "scenes")
    import numpy as np
    import jax.numpy as jnp
    from make_fixtures import icosphere

    from craytracer_tpu.accel.bvh4 import build_bvh4, bvh4_closest_hit
    from craytracer_tpu.accel.pallas_bvh4 import pallas_bvh4_closest_hit

    v, f = icosphere(2)
    bvh = build_bvh4(v[f[:, 0]] * 3, v[f[:, 1]] * 3, v[f[:, 2]] * 3)
    rng = np.random.default_rng(1)
    n = 500  # non-multiple of RAY_BLOCK exercises the padding path
    o = jnp.asarray(np.tile([[0.0, 0.5, 8.0]], (n, 1)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d[:, 2] -= 1.5
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    t0, i0 = bvh4_closest_hit(bvh, o, d)
    t1, i1 = pallas_bvh4_closest_hit(bvh, o, d, interpret=True)
    np.testing.assert_allclose(np.asarray(t0), np.asarray(t1), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    assert (np.asarray(t0) < 1e8).sum() > 50  # real hits exercised


def test_pallas_bvh4_push_modes_match_xla():
    """Every push-mode/mt-skip combination of the packet kernel is
    t/id-identical to the XLA traversal: "sorted" (far-to-near network),
    "fixed" (child order), "culled" (unordered + pop-cull), "cnear"
    (rank-offset far-to-near + pop-cull) — x mt_skip off/on/"child"
    (per-child box-vote MT gating) — the pop
    order must never change WHICH closest hit wins, only how many pops
    it takes (profiling/ablate_pallas_pop.py measures the cost side)."""
    import sys

    sys.path.insert(0, "scenes")
    import numpy as np
    import jax.numpy as jnp
    from make_fixtures import icosphere

    from craytracer_tpu.accel.bvh4 import build_bvh4, bvh4_closest_hit
    from craytracer_tpu.accel.pallas_bvh4 import pallas_bvh4_closest_hit

    v, f = icosphere(2)
    bvh = build_bvh4(v[f[:, 0]] * 3, v[f[:, 1]] * 3, v[f[:, 2]] * 3)
    rng = np.random.default_rng(7)
    n = 500
    o = jnp.asarray(rng.uniform(-6, 6, (n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    t0, i0 = bvh4_closest_hit(bvh, o, d)
    for push_mode in ("sorted", "fixed", "culled", "cnear"):
        for mt_skip in (False, True, "child"):
            t1, i1 = pallas_bvh4_closest_hit(
                bvh, o, d, interpret=True,
                push_mode=push_mode, mt_skip=mt_skip)
            np.testing.assert_allclose(np.asarray(t0), np.asarray(t1),
                                       rtol=1e-6,
                                       err_msg=f"{push_mode}/{mt_skip}")
            np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1),
                                          err_msg=f"{push_mode}/{mt_skip}")
    assert (np.asarray(t0) < 1e8).sum() > 50


def test_pallas_bvh4_any_hit_matches_xla():
    """Occlusion packet kernel (accel/pallas_bvh4.py::_anyhit_kernel):
    interpret-mode equivalence with bvh4_any_hit on occlusion verdicts —
    the shadow test only consumes (t < max_dist), so verdict equality is
    the correctness contract (the two may find different occluders)."""
    import sys

    sys.path.insert(0, "scenes")
    import numpy as np
    import jax.numpy as jnp
    from make_fixtures import icosphere

    from craytracer_tpu.accel.bvh4 import build_bvh4, bvh4_any_hit
    from craytracer_tpu.accel.pallas_bvh4 import pallas_bvh4_any_hit

    v, f = icosphere(2)
    bvh = build_bvh4(v[f[:, 0]] * 3, v[f[:, 1]] * 3, v[f[:, 2]] * 3)
    rng = np.random.default_rng(2)
    n = 500  # non-multiple of RAY_BLOCK exercises the md=0 padded lanes
    o = jnp.asarray(rng.uniform(-6, 6, (n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    md = jnp.asarray(rng.uniform(0.5, 20.0, n).astype(np.float32))
    t0 = bvh4_any_hit(bvh, o, d, md)
    t1 = pallas_bvh4_any_hit(bvh, o, d, md, interpret=True)
    occ0 = np.asarray(t0) < np.asarray(md)
    occ1 = np.asarray(t1) < np.asarray(md)
    np.testing.assert_array_equal(occ0, occ1)
    assert occ0.sum() > 50 and (~occ0).sum() > 50  # both verdicts exercised


def test_pallas_split_table_matches_xla():
    """Split-table kernel (topology VMEM + per-pop HBM DMA of leaf rows;
    measured-negative design study, kept as the per-pop-streaming
    reference): interpret-mode t/id equivalence, plain and with carried
    best hit."""
    import sys

    sys.path.insert(0, "scenes")
    import numpy as np
    import jax.numpy as jnp
    from make_fixtures import icosphere

    from craytracer_tpu.accel.bvh4 import build_bvh4, bvh4_closest_hit
    from craytracer_tpu.accel.pallas_bvh4 import pallas_bvh4_closest_hit_hbm

    v, f = icosphere(2)
    bvh = build_bvh4(v[f[:, 0]] * 3, v[f[:, 1]] * 3, v[f[:, 2]] * 3,
                     leaf_size=2)
    rng = np.random.default_rng(1)
    n = 500
    o = jnp.asarray(np.tile([[0.0, 0.5, 8.0]], (n, 1)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d[:, 2] -= 1.5
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    t0, i0 = bvh4_closest_hit(bvh, o, d)
    t1, i1 = pallas_bvh4_closest_hit_hbm(bvh, o, d, interpret=True)
    np.testing.assert_allclose(np.asarray(t0), np.asarray(t1), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    tc = jnp.where(jnp.arange(n) % 2 == 0, t0 * 0.5, jnp.full((n,), 3.0e38))
    ic = jnp.where(jnp.arange(n) % 2 == 0, 7777, -1)
    t2, i2 = pallas_bvh4_closest_hit_hbm(bvh, o, d, tc, ic, interpret=True,
                                         with_init=True)
    keep = np.asarray(tc) <= np.asarray(t0)
    np.testing.assert_allclose(np.asarray(t2),
                               np.minimum(np.asarray(tc), np.asarray(t0)),
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(i2),
                                  np.where(keep, np.asarray(ic),
                                           np.asarray(i0)))
