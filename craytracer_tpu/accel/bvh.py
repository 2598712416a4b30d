"""BVH over the triangle soup: host build -> flat SoA arrays -> batched
stack traversal.

Build mirrors the reference's median-split strategy (BVH_build,
accelerator/bvh.h:117-154: split the largest-extent axis at the centroid
median) but with <=4-triangle leaves like the QBVH (accelerator/
bvh4.h:258-296) so the leaf test vectorizes — the SSE 1-ray-4-triangle
kernel (shapes/triangle.cpp:81-151) becomes a masked 4-wide batched test.

Traversal replaces the reference's recursion (intersect.h:310-342) with an
iterative near-child-first ordered stack walk (the QBVH's sign-ordered
descent, accelerator/bvh4.h:306-352), vectorized across the whole ray batch
inside one `lax.while_loop`: every live lane processes one node per
iteration; t-bound culling prunes as best hits tighten. Any-hit
(shadow) terminates a lane as soon as any occluder closer than its bound is
found (intersect.h:443-545 semantics).

Node layout (depth-first): internal nodes store the right-child index and
split axis (left child is node+1); leaves store (first_tri, count) into a
leaf-reordered triangle index array.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from craytracer_tpu.constants import K_EPSILON, TMAX
from craytracer_tpu.core import math as vm

LEAF_SIZE = 4
MAX_STACK = 64


@flax.struct.dataclass
class BVHArrays:
    node_min: jnp.ndarray  # [M, 3]
    node_max: jnp.ndarray  # [M, 3]
    right: jnp.ndarray  # [M] right-child node index (internal) or -1
    axis: jnp.ndarray  # [M] split axis (internal)
    first: jnp.ndarray  # [M] first tri slot (leaf) or -1
    count: jnp.ndarray  # [M] tri count (leaf) or 0
    tri_index: jnp.ndarray  # [T_padded] original triangle ids, leaf-ordered
    # packed leaf triangle data (gather-free leaf tests)
    v0: jnp.ndarray  # [T_padded, 3]
    e1: jnp.ndarray  # [T_padded, 3]
    e2: jnp.ndarray  # [T_padded, 3]


def _build_arrays(v0, v1, v2, leaf_size=LEAF_SIZE):
    t = v0.shape[0]
    tri_min = np.minimum(np.minimum(v0, v1), v2)
    tri_max = np.maximum(np.maximum(v0, v1), v2)
    centroid = (tri_min + tri_max) * 0.5

    nodes = []  # dicts
    order: list[int] = []

    import sys

    def build(ids):
        idx = len(nodes)
        nodes.append({})
        n = nodes[idx]
        n["min"] = tri_min[ids].min(axis=0)
        n["max"] = tri_max[ids].max(axis=0)
        if len(ids) <= leaf_size:
            n["first"] = len(order)
            n["count"] = len(ids)
            n["right"] = -1
            n["axis"] = 0
            order.extend(ids.tolist())
            return idx
        ext = centroid[ids].max(axis=0) - centroid[ids].min(axis=0)
        ax = int(np.argmax(ext))
        med = np.argsort(centroid[ids, ax], kind="stable")
        half = len(ids) // 2
        n["first"] = -1
        n["count"] = 0
        n["axis"] = ax
        build(ids[med[:half]])
        n["right"] = build(ids[med[half:]])
        return idx

    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old_limit, 10000 + 2 * int(np.ceil(np.log2(max(t, 2)))) * 64))
    try:
        build(np.arange(t))
    finally:
        sys.setrecursionlimit(old_limit)
    return nodes, order


def build_bvh_arrays(v0: np.ndarray, v1: np.ndarray, v2: np.ndarray,
                     leaf_size: int = LEAF_SIZE) -> BVHArrays:
    """Host-side build -> BVHArrays (device)."""
    v0 = np.asarray(v0, np.float64)
    v1 = np.asarray(v1, np.float64)
    v2 = np.asarray(v2, np.float64)
    t = v0.shape[0]
    if t == 0:
        z3 = jnp.zeros((1, 3), jnp.float32)
        zi = jnp.zeros((1,), jnp.int32)
        return BVHArrays(node_min=z3, node_max=z3, right=zi - 1, axis=zi,
                         first=zi, count=zi, tri_index=zi, v0=z3, e1=z3, e2=z3)
    from craytracer_tpu.native import build_bvh_native

    nat = build_bvh_native(v0, v1, v2, leaf_size)
    if nat is not None:
        node_min, node_max, right, axis, first, count, order_np = nat
        order_np = order_np.astype(np.int64)
        pv0 = v0[order_np]
        pe1 = v1[order_np] - v0[order_np]
        pe2 = v2[order_np] - v0[order_np]
        f32 = np.float32
        return BVHArrays(
            node_min=jnp.asarray(node_min), node_max=jnp.asarray(node_max),
            right=jnp.asarray(right), axis=jnp.asarray(axis),
            first=jnp.asarray(first), count=jnp.asarray(count),
            tri_index=jnp.asarray(order_np, jnp.int32),
            v0=jnp.asarray(pv0.astype(f32)), e1=jnp.asarray(pe1.astype(f32)),
            e2=jnp.asarray(pe2.astype(f32)),
        )

    nodes, order = _build_arrays(v0, v1, v2, leaf_size)
    order_np = np.asarray(order, np.int64)
    pv0 = v0[order_np]
    pe1 = v1[order_np] - v0[order_np]
    pe2 = v2[order_np] - v0[order_np]
    f32 = np.float32
    return BVHArrays(
        node_min=jnp.asarray(np.stack([n["min"] for n in nodes]).astype(f32)),
        node_max=jnp.asarray(np.stack([n["max"] for n in nodes]).astype(f32)),
        right=jnp.asarray([n["right"] for n in nodes], jnp.int32),
        axis=jnp.asarray([n["axis"] for n in nodes], jnp.int32),
        first=jnp.asarray([n["first"] for n in nodes], jnp.int32),
        count=jnp.asarray([n["count"] for n in nodes], jnp.int32),
        tri_index=jnp.asarray(order_np, jnp.int32),
        v0=jnp.asarray(pv0.astype(f32)),
        e1=jnp.asarray(pe1.astype(f32)),
        e2=jnp.asarray(pe2.astype(f32)),
    )


# keep the public name pointing at the working implementation
build_bvh = build_bvh_arrays


def _leaf_test(bvh: BVHArrays, o, d, leaf_first, leaf_count, best_t, best_tri,
               any_hit: bool, max_dist):
    """Masked <=LEAF_SIZE-triangle Moller-Trumbore for the current leaf of
    every lane (the batched form of calcTriangleIntersect4)."""
    for j in range(LEAF_SIZE):
        slot = leaf_first + j
        valid = j < leaf_count
        slot_c = jnp.clip(slot, 0, bvh.v0.shape[0] - 1)
        tv0 = jnp.take(bvh.v0, slot_c, axis=0)
        te1 = jnp.take(bvh.e1, slot_c, axis=0)
        te2 = jnp.take(bvh.e2, slot_c, axis=0)
        pvec = vm.cross(d, te2)
        det = vm.dot(te1, pvec)
        inv_det = 1.0 / vm._safe(det)
        tvec = o - tv0
        beta = vm.dot(tvec, pvec) * inv_det
        qvec = vm.cross(tvec, te1)
        gamma = vm.dot(d, qvec) * inv_det
        tt = vm.dot(te2, qvec) * inv_det
        ok = (
            valid & (beta >= 0.0) & (gamma >= 0.0) & (beta + gamma <= 1.0)
            & (tt > K_EPSILON) & (tt < best_t)
        )
        if any_hit:
            ok = ok & (tt < max_dist)
        best_tri = jnp.where(ok, jnp.take(bvh.tri_index, slot_c), best_tri)
        best_t = jnp.where(ok, tt, best_t)
    return best_t, best_tri


def _traverse(bvh: BVHArrays, o, d, any_hit: bool, max_dist=None):
    n = o.shape[0]
    inv_d = 1.0 / vm._safe(d)
    neg_dir = d < 0.0  # [N, 3]
    if max_dist is None:
        max_dist = jnp.full((n,), TMAX)

    stack = jnp.zeros((n, MAX_STACK), jnp.int32)
    sp = jnp.ones((n,), jnp.int32)  # root pushed
    best_t = jnp.full((n,), TMAX)
    best_tri = jnp.full((n,), -1, jnp.int32)

    def cond(state):
        sp, *_ = state
        return jnp.any(sp > 0)

    def body(state):
        sp, stack, best_t, best_tri = state
        active = sp > 0
        top = jnp.maximum(sp - 1, 0)
        node = jnp.take_along_axis(stack, top[:, None], axis=1)[:, 0]
        sp = jnp.where(active, sp - 1, sp)

        nmin = jnp.take(bvh.node_min, node, axis=0)
        nmax = jnp.take(bvh.node_max, node, axis=0)
        t0 = (nmin - o) * inv_d
        t1 = (nmax - o) * inv_d
        tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
        tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
        tlimit = jnp.minimum(best_t, max_dist)
        box_hit = active & (tn <= tf) & (tf > 0.0) & (tn < tlimit)

        count = jnp.take(bvh.count, node)
        first = jnp.take(bvh.first, node)
        right = jnp.take(bvh.right, node)
        axis = jnp.take(bvh.axis, node)
        is_leaf = count > 0

        # Leaf: masked triangle tests.
        do_leaf = box_hit & is_leaf
        lt, ltri = _leaf_test(bvh, o, d, first, jnp.where(do_leaf, count, 0),
                              best_t, best_tri, any_hit, max_dist)
        best_t, best_tri = lt, ltri

        # Internal: push far then near (near popped first), ordered by ray
        # sign along the split axis (accelerator/bvh4.h:306-352).
        do_push = box_hit & ~is_leaf
        left = node + 1
        go_left_first = ~jnp.take_along_axis(neg_dir, axis[:, None], axis=1)[:, 0]
        near = jnp.where(go_left_first, left, right)
        far = jnp.where(go_left_first, right, left)
        sp_ok = sp <= MAX_STACK - 2
        do_push = do_push & sp_ok
        stack = jnp.where(
            do_push[:, None]
            & (jnp.arange(MAX_STACK)[None, :] == sp[:, None]),
            far[:, None], stack,
        )
        stack = jnp.where(
            do_push[:, None]
            & (jnp.arange(MAX_STACK)[None, :] == sp[:, None] + 1),
            near[:, None], stack,
        )
        sp = jnp.where(do_push, sp + 2, sp)

        # Any-hit early out: a sufficient occluder ends the lane.
        if any_hit:
            sp = jnp.where(best_t < max_dist, 0, sp)
        return sp, stack, best_t, best_tri

    sp, stack, best_t, best_tri = jax.lax.while_loop(
        cond, body, (sp, stack, best_t, best_tri)
    )
    return best_t, best_tri


def bvh_closest_hit(bvh: BVHArrays, o, d):
    """Returns (t[N], tri_id[N]) with t=TMAX / tri=-1 on miss."""
    return _traverse(bvh, o, d, any_hit=False)


def bvh_any_hit(bvh: BVHArrays, o, d, max_dist):
    """Returns t[N] of some occluder with t < max_dist, else TMAX."""
    t, _ = _traverse(bvh, o, d, any_hit=True, max_dist=max_dist)
    return t
