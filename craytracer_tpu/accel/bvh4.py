"""4-wide (QBVH) traversal: the reference's shallow-BVH design
(accelerator/bvh4.h, after Dammertz/Hanika/Keller) in batched form.

Built by collapsing the binary BVH one level (each node adopts its
grandchildren), so the tree is half as deep — and since the batched
traversal's wall time is dominated by the `lax.while_loop` trip count (the
max node-visit chain over all lanes), the 4-box-per-iteration test roughly
halves the serial depth at the cost of wider (but VPU-friendly) per-step
work — exactly the trade the reference's SSE 4-box slab test makes
(rayIntersectAABB4, accelerator/bvh4.h:23-97).

Node layout (SoA, the batched analog of BVHNode4's float[24] box block):
  child_min/child_max: [M, 4, 3] — 4 child boxes per node
  child:               [M, 4]    — child node index, or -1 empty
  leaf_first/leaf_count:[M, 4]   — per-child leaf triangle range (count 0 =
                                   internal child)
Children are tested simultaneously; hits are pushed far-to-near (insertion
sort over 4 via masked swaps) so the nearest pops first.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from craytracer_tpu.constants import K_EPSILON, TMAX
from craytracer_tpu.core import math as vm
from craytracer_tpu.accel.bvh import LEAF_SIZE, MAX_STACK, _build_arrays

WIDTH = 4


@flax.struct.dataclass
class BVH4Arrays:
    child_min: jnp.ndarray  # [M, 4, 3]
    child_max: jnp.ndarray  # [M, 4, 3]
    child: jnp.ndarray  # [M, 4] node index or -1
    leaf_first: jnp.ndarray  # [M, 4]
    leaf_count: jnp.ndarray  # [M, 4]
    tri_index: jnp.ndarray  # [T] leaf-ordered original triangle ids
    v0: jnp.ndarray  # [T, 3] packed leaf triangles
    e1: jnp.ndarray
    e2: jnp.ndarray


def build_bvh4(v0: np.ndarray, v1: np.ndarray, v2: np.ndarray,
               leaf_size: int = LEAF_SIZE) -> BVH4Arrays:
    """Collapse the binary median-split BVH into 4-wide nodes."""
    v0 = np.asarray(v0, np.float64)
    v1 = np.asarray(v1, np.float64)
    v2 = np.asarray(v2, np.float64)
    t = v0.shape[0]
    if t == 0:
        z3 = jnp.zeros((1, WIDTH, 3), jnp.float32)
        zi = jnp.full((1, WIDTH), -1, jnp.int32)
        z1 = jnp.zeros((1, 3), jnp.float32)
        return BVH4Arrays(child_min=z3, child_max=z3, child=zi,
                          leaf_first=zi, leaf_count=jnp.zeros((1, WIDTH), jnp.int32),
                          tri_index=jnp.zeros((1,), jnp.int32), v0=z1, e1=z1, e2=z1)

    from craytracer_tpu.native import build_bvh_native

    nat = build_bvh_native(v0, v1, v2, leaf_size)
    if nat is not None:
        node_min, node_max, right, axis, first, count, order = nat
    else:
        nodes, order_l = _build_arrays(v0, v1, v2, leaf_size)
        node_min = np.stack([n["min"] for n in nodes]).astype(np.float32)
        node_max = np.stack([n["max"] for n in nodes]).astype(np.float32)
        right = np.asarray([n["right"] for n in nodes], np.int32)
        first = np.asarray([n["first"] for n in nodes], np.int32)
        count = np.asarray([n["count"] for n in nodes], np.int32)
        order = np.asarray(order_l, np.int32)

    # binary children: left = i + 1, right = right[i]; leaves have count > 0
    def bin_children(i):
        return (i + 1, int(right[i]))

    def is_leaf(i):
        return count[i] > 0

    q_nodes = []  # rows: (mins[4,3], maxs[4,3], child[4], lf[4], lc[4])

    def emit(i) -> int:
        """Create the 4-wide node for binary internal node i; returns its
        index in the q arrays."""
        # gather up to 4 descendants: grandchildren where possible
        slots: list[int] = []
        l, r = bin_children(i)
        for c in (l, r):
            if is_leaf(c):
                slots.append(c)
            else:
                cl, cr = bin_children(c)
                slots.append(cl)
                slots.append(cr)
        idx = len(q_nodes)
        q_nodes.append(None)  # reserve
        mins = np.zeros((WIDTH, 3), np.float32)
        maxs = np.zeros((WIDTH, 3), np.float32)
        child = np.full(WIDTH, -1, np.int32)
        lf = np.full(WIDTH, -1, np.int32)
        lc = np.zeros(WIDTH, np.int32)
        for k, c in enumerate(slots):
            mins[k] = node_min[c]
            maxs[k] = node_max[c]
            if is_leaf(c):
                lf[k] = first[c]
                lc[k] = count[c]
            else:
                child[k] = emit(c)
        # empty slots: inverted boxes never hit
        for k in range(len(slots), WIDTH):
            mins[k] = 1.0
            maxs[k] = -1.0
        q_nodes[idx] = (mins, maxs, child, lf, lc)
        return idx

    import sys

    old = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old, 100000))
    try:
        if is_leaf(0):
            # single-leaf tree: one q node whose first child is the leaf
            mins = np.ones((WIDTH, 3), np.float32)
            maxs = -np.ones((WIDTH, 3), np.float32)
            child = np.full(WIDTH, -1, np.int32)
            lf = np.full(WIDTH, -1, np.int32)
            lc = np.zeros(WIDTH, np.int32)
            mins[0] = node_min[0]
            maxs[0] = node_max[0]
            lf[0] = first[0]
            lc[0] = count[0]
            q_nodes.append((mins, maxs, child, lf, lc))
        else:
            emit(0)
    finally:
        sys.setrecursionlimit(old)

    order64 = order.astype(np.int64)
    pv0 = v0[order64]
    pe1 = v1[order64] - v0[order64]
    pe2 = v2[order64] - v0[order64]
    f32 = np.float32
    return BVH4Arrays(
        child_min=jnp.asarray(np.stack([q[0] for q in q_nodes])),
        child_max=jnp.asarray(np.stack([q[1] for q in q_nodes])),
        child=jnp.asarray(np.stack([q[2] for q in q_nodes])),
        leaf_first=jnp.asarray(np.stack([q[3] for q in q_nodes])),
        leaf_count=jnp.asarray(np.stack([q[4] for q in q_nodes])),
        tri_index=jnp.asarray(order, jnp.int32),
        v0=jnp.asarray(pv0.astype(f32)),
        e1=jnp.asarray(pe1.astype(f32)),
        e2=jnp.asarray(pe2.astype(f32)),
    )


def _leaf_test4(bvh: BVH4Arrays, o, d, leaf_first, leaf_count, best_t, best_tri,
                any_hit, max_dist):
    """Masked <=LEAF_SIZE-triangle test for one child-leaf per lane."""
    for j in range(LEAF_SIZE):
        slot = leaf_first + j
        valid = (leaf_first >= 0) & (j < leaf_count)
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
        ok = (valid & (beta >= 0.0) & (gamma >= 0.0) & (beta + gamma <= 1.0)
              & (tt > K_EPSILON) & (tt < best_t))
        if any_hit:
            ok = ok & (tt < max_dist)
        best_tri = jnp.where(ok, jnp.take(bvh.tri_index, slot_c), best_tri)
        best_t = jnp.where(ok, tt, best_t)
    return best_t, best_tri


def _traverse4(bvh: BVH4Arrays, o, d, any_hit: bool, max_dist=None):
    n = o.shape[0]
    inv_d = 1.0 / vm._safe(d)
    if max_dist is None:
        max_dist = jnp.full((n,), TMAX)

    # Stack entries encode child slots: node*4 + slot for internal pushes is
    # unnecessary — we push NODE indices; leaf children are resolved at test
    # time. An entry is (node_index); the 4 children of the popped node are
    # box-tested together, leaf children get their triangles tested
    # immediately, internal children are pushed near-first.
    stack = jnp.zeros((n, MAX_STACK), jnp.int32)
    sp = jnp.ones((n,), jnp.int32)  # root node 0 pushed
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
        node_c = jnp.clip(node, 0, bvh.child.shape[0] - 1)

        cmin = jnp.take(bvh.child_min, node_c, axis=0)  # [N, 4, 3]
        cmax = jnp.take(bvh.child_max, node_c, axis=0)
        t0 = (cmin - o[:, None, :]) * inv_d[:, None, :]
        t1 = (cmax - o[:, None, :]) * inv_d[:, None, :]
        tn = jnp.max(jnp.minimum(t0, t1), axis=-1)  # [N, 4]
        tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
        tlimit = jnp.minimum(best_t, max_dist)
        box_hit = active[:, None] & (tn <= tf) & (tf > 0.0) & (tn < tlimit[:, None])

        child = jnp.take(bvh.child, node_c, axis=0)  # [N, 4]
        lf = jnp.take(bvh.leaf_first, node_c, axis=0)
        lc = jnp.take(bvh.leaf_count, node_c, axis=0)
        is_leaf_child = (lc > 0) & box_hit
        is_int_child = (child >= 0) & box_hit

        # test all hit leaf children (up to 4 per lane)
        for k in range(WIDTH):
            best_t, best_tri = _leaf_test4(
                bvh, o, d,
                jnp.where(is_leaf_child[:, k], lf[:, k], -1),
                lc[:, k], best_t, best_tri, any_hit, max_dist)

        # push internal children ordered far-to-near by tn (nearest on top):
        # insertion sort of 4 (tn, child) pairs via masked compare-swaps
        key = jnp.where(is_int_child, tn, -jnp.inf)  # far = larger key first

        def swap(key, val, i, j):
            # ensure key[i] >= key[j] (descending)
            do = key[:, i] < key[:, j]
            ki = jnp.where(do, key[:, j], key[:, i])
            kj = jnp.where(do, key[:, i], key[:, j])
            vi = jnp.where(do, val[:, j], val[:, i])
            vj = jnp.where(do, val[:, i], val[:, j])
            key = key.at[:, i].set(ki).at[:, j].set(kj)
            val = val.at[:, i].set(vi).at[:, j].set(vj)
            return key, val

        ckey = key
        cval = jnp.where(is_int_child, child, -1)
        for (i, j) in ((0, 1), (2, 3), (0, 2), (1, 3), (1, 2)):
            ckey, cval = swap(ckey, cval, i, j)
        # now cval sorted descending by tn; push in order (furthest first)
        for k in range(WIDTH):
            do_push = (cval[:, k] >= 0) & (sp <= MAX_STACK - 1)
            stack = jnp.where(
                do_push[:, None]
                & (jnp.arange(MAX_STACK)[None, :] == sp[:, None]),
                cval[:, k][:, None], stack)
            sp = jnp.where(do_push, sp + 1, sp)

        if any_hit:
            sp = jnp.where(best_t < max_dist, 0, sp)
        return sp, stack, best_t, best_tri

    sp, stack, best_t, best_tri = jax.lax.while_loop(
        cond, body, (sp, stack, best_t, best_tri))
    return best_t, best_tri


def bvh4_closest_hit(bvh: BVH4Arrays, o, d):
    return _traverse4(bvh, o, d, any_hit=False)


def bvh4_any_hit(bvh: BVH4Arrays, o, d, max_dist):
    t, _ = _traverse4(bvh, o, d, any_hit=True, max_dist=max_dist)
    return t
