"""Quantized 4-wide BVH: u8 child bounds decoded against parent boxes.

Implements the memory-traffic reduction of "Minimizing Ray Tracing Memory
Traffic through Quantized Structures and Ray Stream Tracing" (PAPERS.md):
each node stores its own bounds in f32 once, and its 4 children's boxes as
u8 offsets within them — 48 bytes of box data per node instead of 96, so
every traversal step moves ~2.4x less HBM per node gather. Quantization is
conservative (floor the mins, ceil the maxs), so traversal visits a strict
superset of the exact-BVH nodes and returns identical hits; only box-test
culling is (slightly) looser.

Built by re-encoding a BVH4Arrays; traversal mirrors accel/bvh4.py with a
decode step after the node gather.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from craytracer_tpu.constants import TMAX
from craytracer_tpu.core import math as vm
from craytracer_tpu.accel.bvh import MAX_STACK
from craytracer_tpu.accel.bvh4 import WIDTH, BVH4Arrays, build_bvh4, _leaf_test4


@flax.struct.dataclass
class BVH4QArrays:
    node_min: jnp.ndarray  # [M, 3] f32 parent bounds
    node_scale: jnp.ndarray  # [M, 3] f32 extent / 255
    qmin: jnp.ndarray  # [M, 4, 3] u8 quantized child mins
    qmax: jnp.ndarray  # [M, 4, 3] u8 quantized child maxs
    child: jnp.ndarray  # [M, 4]
    leaf_first: jnp.ndarray  # [M, 4]
    leaf_count: jnp.ndarray  # [M, 4]
    tri_index: jnp.ndarray
    v0: jnp.ndarray
    e1: jnp.ndarray
    e2: jnp.ndarray


def build_bvh4q(v0: np.ndarray, v1: np.ndarray, v2: np.ndarray,
                leaf_size: int = 4) -> BVH4QArrays:
    b4 = build_bvh4(v0, v1, v2, leaf_size)
    cmin = np.asarray(b4.child_min)  # [M, 4, 3]
    cmax = np.asarray(b4.child_max)
    child = np.asarray(b4.child)
    lc = np.asarray(b4.leaf_count)
    valid = (child >= 0) | (lc > 0)  # [M, 4]

    # parent bounds = union of valid child boxes
    big = np.where(valid[..., None], cmin, np.inf)
    node_min = np.min(big, axis=1)
    big = np.where(valid[..., None], cmax, -np.inf)
    node_max = np.max(big, axis=1)
    empty = ~valid.any(axis=1)
    node_min[empty] = 0.0
    node_max[empty] = 1.0
    extent = np.maximum(node_max - node_min, 1e-12)
    scale = (extent / 255.0).astype(np.float32)

    rel_min = (cmin - node_min[:, None, :]) / scale[:, None, :]
    rel_max = (cmax - node_min[:, None, :]) / scale[:, None, :]
    qmin = np.clip(np.floor(rel_min), 0, 255).astype(np.uint8)
    qmax = np.clip(np.ceil(rel_max), 0, 255).astype(np.uint8)
    # invalid (empty) slots: inverted boxes that never hit
    qmin = np.where(valid[..., None], qmin, 255).astype(np.uint8)
    qmax = np.where(valid[..., None], qmax, 0).astype(np.uint8)

    return BVH4QArrays(
        node_min=jnp.asarray(node_min.astype(np.float32)),
        node_scale=jnp.asarray(scale),
        qmin=jnp.asarray(qmin), qmax=jnp.asarray(qmax),
        child=b4.child, leaf_first=b4.leaf_first, leaf_count=b4.leaf_count,
        tri_index=b4.tri_index, v0=b4.v0, e1=b4.e1, e2=b4.e2,
    )


def _traverse4q(bvh: BVH4QArrays, o, d, any_hit: bool, max_dist=None):
    n = o.shape[0]
    inv_d = 1.0 / vm._safe(d)
    if max_dist is None:
        max_dist = jnp.full((n,), TMAX)

    stack = jnp.zeros((n, MAX_STACK), jnp.int32)
    sp = jnp.ones((n,), jnp.int32)
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

        nmin = jnp.take(bvh.node_min, node_c, axis=0)  # [N, 3]
        nscale = jnp.take(bvh.node_scale, node_c, axis=0)
        qmin = jnp.take(bvh.qmin, node_c, axis=0).astype(jnp.float32)  # [N,4,3]
        qmax = jnp.take(bvh.qmax, node_c, axis=0).astype(jnp.float32)
        cmin = nmin[:, None, :] + qmin * nscale[:, None, :]
        cmax = nmin[:, None, :] + qmax * nscale[:, None, :]

        t0 = (cmin - o[:, None, :]) * inv_d[:, None, :]
        t1 = (cmax - o[:, None, :]) * inv_d[:, None, :]
        tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
        tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
        tlimit = jnp.minimum(best_t, max_dist)
        box_hit = active[:, None] & (tn <= tf) & (tf > 0.0) & (tn < tlimit[:, None])

        child = jnp.take(bvh.child, node_c, axis=0)
        lf = jnp.take(bvh.leaf_first, node_c, axis=0)
        lc = jnp.take(bvh.leaf_count, node_c, axis=0)
        is_leaf_child = (lc > 0) & box_hit
        is_int_child = (child >= 0) & box_hit

        for k in range(WIDTH):
            best_t, best_tri = _leaf_test4(
                bvh, o, d,
                jnp.where(is_leaf_child[:, k], lf[:, k], -1),
                lc[:, k], best_t, best_tri, any_hit, max_dist)

        key = jnp.where(is_int_child, tn, -jnp.inf)
        cval = jnp.where(is_int_child, child, -1)

        def swap(key, val, i, j):
            do = key[:, i] < key[:, j]
            ki = jnp.where(do, key[:, j], key[:, i])
            kj = jnp.where(do, key[:, i], key[:, j])
            vi = jnp.where(do, val[:, j], val[:, i])
            vj = jnp.where(do, val[:, i], val[:, j])
            return (key.at[:, i].set(ki).at[:, j].set(kj),
                    val.at[:, i].set(vi).at[:, j].set(vj))

        for (i, j) in ((0, 1), (2, 3), (0, 2), (1, 3), (1, 2)):
            key, cval = swap(key, cval, i, j)
        for k in range(WIDTH):
            do_push = (cval[:, k] >= 0) & (sp <= MAX_STACK - 1)
            stack = jnp.where(
                do_push[:, None] & (jnp.arange(MAX_STACK)[None, :] == sp[:, None]),
                cval[:, k][:, None], stack)
            sp = jnp.where(do_push, sp + 1, sp)

        if any_hit:
            sp = jnp.where(best_t < max_dist, 0, sp)
        return sp, stack, best_t, best_tri

    sp, stack, best_t, best_tri = jax.lax.while_loop(
        cond, body, (sp, stack, best_t, best_tri))
    return best_t, best_tri


def bvh4q_closest_hit(bvh: BVH4QArrays, o, d):
    return _traverse4q(bvh, o, d, any_hit=False)


def bvh4q_any_hit(bvh: BVH4QArrays, o, d, max_dist):
    t, _ = _traverse4q(bvh, o, d, any_hit=True, max_dist=max_dist)
    return t
