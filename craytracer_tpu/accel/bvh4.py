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

TPU note — the FAT-ROW traversal: XLA gathers on TPU are latency-bound
per gather op (~1.4-4.6ms at 65k-262k lanes on v5e) but row width is
nearly free (measured: [262k]<-[M,13] == [M,256] within 12%). Round 1
issued ~69 gathers per while-loop step (5 node fields + 4 child slots x
LEAF_SIZE tris x 3 vertex arrays); this build instead packs EVERYTHING a
traversal step needs into one [M, 192] row — 4 child boxes, child ids,
leaf counts, and all 4 leaf children's triangles (v0/e1/e2/orig-id,
padded to LEAF_SIZE) — so each step is ONE gather plus dense VPU math.
Triangles of missed child boxes are tested anyway (correctness-neutral:
a triangle inside a missed or too-far box can never beat best_t; padded
slots carry degenerate data that never hits) — masking would cost more
than the 16 extra Moller-Trumbore lanes.
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


# Fat-row layout (see module docstring): per-node f32 columns
#   [0:12)   4 child mins, [12:24) 4 child maxs, [24:28) child node ids
#   [28:28+16*10) 4 children x LEAF_SIZE tris x (v0[3], e1[3], e2[3], id)
_TRI_COLS = 10
_FAT_TRI0 = 28
FAT_WIDTH = _FAT_TRI0 + WIDTH * LEAF_SIZE * _TRI_COLS


@flax.struct.dataclass
class BVH4Arrays:
    fat: jnp.ndarray  # [M, FAT_WIDTH] fat node rows (one gather per step)
    n_tris: int = flax.struct.field(pytree_node=False, default=0)


def collapse4(v0: np.ndarray, v1: np.ndarray, v2: np.ndarray,
              leaf_size: int = LEAF_SIZE):
    """Host-side binary-BVH build + one-level collapse into 4-wide nodes.

    Returns numpy (mins[M,4,3], maxs[M,4,3], child[M,4], lf[M,4], lc[M,4],
    order[T], pv0/pe1/pe2[T,3]) — shared by the fat-row builder here and the
    quantized builder in bvh4q.py."""
    v0 = np.asarray(v0, np.float64)
    v1 = np.asarray(v1, np.float64)
    v2 = np.asarray(v2, np.float64)
    t = v0.shape[0]

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

    node_min = np.asarray(node_min, np.float64)
    node_max = np.asarray(node_max, np.float64)
    right = np.asarray(right, np.int64)
    first = np.asarray(first, np.int64)
    count = np.asarray(count, np.int64)
    is_leaf_arr = count > 0

    if is_leaf_arr[0]:
        # single-leaf tree: one q node whose first slot is the leaf
        mins = np.ones((1, WIDTH, 3), np.float32)
        maxs = -np.ones((1, WIDTH, 3), np.float32)
        child = np.full((1, WIDTH), -1, np.int64)
        lf = np.full((1, WIDTH), -1, np.int64)
        lc = np.zeros((1, WIDTH), np.int64)
        mins[0, 0] = node_min[0]
        maxs[0, 0] = node_max[0]
        lf[0, 0] = first[0]
        lc[0, 0] = count[0]
    else:
        # Vectorized level-order collapse (the recursive per-node emit was
        # the build bottleneck at millions of triangles): each BFS wave of
        # binary internal nodes becomes a wave of 4-wide nodes; a node's 4
        # slots are its grandchildren where its children are internal, the
        # children themselves where they are leaves (-1 = empty slot).
        waves = []  # (slots[F,4] binary ids or -1)
        frontier = np.array([0], np.int64)
        total = 0
        starts = []
        while frontier.size:
            starts.append(total)
            total += frontier.size
            l = frontier + 1
            r = right[frontier]
            leaf_l = is_leaf_arr[l]
            leaf_r = is_leaf_arr[r]
            s0 = np.where(leaf_l, l, l + 1)
            s1 = np.where(leaf_l, -1, right[l])
            s2 = np.where(leaf_r, r, r + 1)
            s3 = np.where(leaf_r, -1, right[r])
            slots = np.stack([s0, s1, s2, s3], axis=1)  # [F, 4]
            waves.append(slots)
            flat = slots.reshape(-1)
            internal = flat[(flat >= 0) & ~is_leaf_arr[np.maximum(flat, 0)]]
            frontier = internal

        slots = np.concatenate(waves, axis=0)  # [M, 4] binary ids or -1
        m = slots.shape[0]
        # q-node id per binary internal node: BFS visit order
        q_of_binary = np.full(node_min.shape[0], -1, np.int64)
        visit = np.concatenate(
            [w.reshape(-1) for w in waves])  # appearance order of slots
        # ids are assigned wave by wave in row-major slot order:
        flat_internal = visit[(visit >= 0) & ~is_leaf_arr[np.maximum(visit, 0)]]
        q_of_binary[0] = 0
        q_of_binary[flat_internal] = np.arange(1, 1 + flat_internal.size)

        valid = slots >= 0
        sc = np.maximum(slots, 0)
        slot_leaf = valid & is_leaf_arr[sc]
        slot_int = valid & ~is_leaf_arr[sc]
        mins = np.where(valid[..., None], node_min[sc], 1.0).astype(np.float32)
        maxs = np.where(valid[..., None], node_max[sc], -1.0).astype(np.float32)
        child = np.where(slot_int, q_of_binary[sc], -1)
        lf = np.where(slot_leaf, first[sc], -1)
        lc = np.where(slot_leaf, count[sc], 0)

    order64 = order.astype(np.int64)
    pv0 = v0[order64].astype(np.float32)
    pe1 = (v1[order64] - v0[order64]).astype(np.float32)
    pe2 = (v2[order64] - v0[order64]).astype(np.float32)
    return (mins.reshape(-1, WIDTH, 3), maxs.reshape(-1, WIDTH, 3), child,
            lf, lc, order, pv0, pe1, pe2)


def build_bvh4(v0: np.ndarray, v1: np.ndarray, v2: np.ndarray,
               leaf_size: int = LEAF_SIZE) -> BVH4Arrays:
    """4-wide BVH with fat node rows (see module docstring)."""
    t = np.asarray(v0).shape[0]
    if t == 0:
        fat = np.zeros((1, FAT_WIDTH), np.float32)
        fat[:, 24:28] = -1.0  # no children
        fat[:, _FAT_TRI0 + _TRI_COLS - 1::_TRI_COLS] = -1.0  # no tris
        return BVH4Arrays(fat=jnp.asarray(fat), n_tris=0)
    if t >= (1 << 24):
        raise ValueError("fat-row BVH4 inlines f32 triangle ids; "
                         "triangle count must stay below 2^24")
    from craytracer_tpu.native import build_bvh4_fat_native

    # Full C++ path: binary build + BFS collapse + fat assembly in one
    # native call (the numpy assembly below runs at MB/s on the target
    # host — San-Miguel-scale meshes need this; bit-identical output).
    fat_nat = build_bvh4_fat_native(v0, v1, v2, leaf_size)
    if fat_nat is not None:
        return BVH4Arrays(fat=jnp.asarray(fat_nat), n_tris=t)

    mins, maxs, child, lf, lc, order, pv0, pe1, pe2 = collapse4(
        v0, v1, v2, leaf_size)
    m = mins.shape[0]
    child = child.astype(np.float32)

    # vectorized fat-row assembly
    tri_rows = np.concatenate(
        [pv0, pe1, pe2, order.astype(np.float32)[:, None]], axis=1)  # [T,10]
    slots = lf[:, :, None] + np.arange(LEAF_SIZE)[None, None, :]  # [M,4,L]
    valid = (lf[:, :, None] >= 0) & (np.arange(LEAF_SIZE)[None, None, :] < lc[:, :, None])
    pad = np.zeros(_TRI_COLS, np.float32)
    pad[-1] = -1.0  # degenerate tri: zero edges never hit, id -1 guards
    blocks = np.where(valid[..., None],
                      tri_rows[np.clip(slots, 0, t - 1)], pad)  # [M,4,L,10]
    fat = np.concatenate([
        mins.reshape(m, 12), maxs.reshape(m, 12), child,
        blocks.reshape(m, WIDTH * LEAF_SIZE * _TRI_COLS),
    ], axis=1).astype(np.float32)
    return BVH4Arrays(fat=jnp.asarray(fat), n_tris=t)


def _traverse4(bvh: BVH4Arrays, o, d, any_hit: bool, max_dist=None):
    """Fat-row stack traversal: ONE [N] gather per step (module docstring).

    TPU cost model (measured, see profiling/README.md): dynamic gathers
    are LATENCY-bound (~0.9ms flat at 262k lanes) while dense elementwise
    traffic runs at HBM bandwidth — so the loop body keeps exactly one
    gather (the fat row) and expresses everything else as dense masked
    ops: the stack pop is a masked reduction over [N, S], the four child
    pushes collapse into one relative-offset select, and the 16-slot leaf
    winner is an unrolled compare chain instead of argmin + take_along.
    This took the measured per-step cost from ~15ms to gather+bandwidth."""
    n = o.shape[0]
    inv_d = 1.0 / vm._safe(d)
    if max_dist is None:
        max_dist = jnp.full((n,), TMAX)

    stack = jnp.zeros((n, MAX_STACK), jnp.int32)
    sp = jnp.ones((n,), jnp.int32)  # root node 0 pushed
    best_t = jnp.full((n,), TMAX)
    best_tri = jnp.full((n,), -1, jnp.int32)
    n_nodes = bvh.fat.shape[0]
    k_slots = WIDTH * LEAF_SIZE
    iota_s = jnp.arange(MAX_STACK, dtype=jnp.int32)[None, :]

    def cond(state):
        sp, *_ = state
        return jnp.any(sp > 0)

    def body(state):
        sp, stack, best_t, best_tri = state
        active = sp > 0
        # dense pop: masked reduction instead of take_along_axis (gather)
        top = sp - 1
        node = jnp.sum(jnp.where(iota_s == top[:, None], stack, 0), axis=1)
        sp = jnp.where(active, top, sp)
        node_c = jnp.where(active, jnp.clip(node, 0, n_nodes - 1), 0)

        row = jnp.take(bvh.fat, node_c, axis=0)  # [N, FAT_WIDTH] — THE gather
        cmin = row[:, 0:12].reshape(n, WIDTH, 3)
        cmax = row[:, 12:24].reshape(n, WIDTH, 3)
        child = row[:, 24:28].astype(jnp.int32)  # [N, 4]

        # 4-box slab test (rayIntersectAABB4, accelerator/bvh4.h:23-97)
        t0 = (cmin - o[:, None, :]) * inv_d[:, None, :]
        t1 = (cmax - o[:, None, :]) * inv_d[:, None, :]
        tn = jnp.max(jnp.minimum(t0, t1), axis=-1)  # [N, 4]
        tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
        tlimit = jnp.minimum(best_t, max_dist)
        box_hit = active[:, None] & (tn <= tf) & (tf > 0.0) & (tn < tlimit[:, None])

        # All 16 inlined leaf triangles, tested unconditionally (dense VPU
        # math beats masking; misses/pads cannot produce a valid closer t).
        tris = row[:, _FAT_TRI0:].reshape(n, k_slots, _TRI_COLS)
        tv0 = tris[..., 0:3]
        te1 = tris[..., 3:6]
        te2 = tris[..., 6:9]
        tid = tris[..., 9].astype(jnp.int32)  # [N, 16]
        dN = d[:, None, :]
        pvec = jnp.cross(dN, te2)
        det = jnp.sum(te1 * pvec, axis=-1)
        inv_det = 1.0 / vm._safe(det)
        tvec = o[:, None, :] - tv0
        beta = jnp.sum(tvec * pvec, axis=-1) * inv_det
        qvec = jnp.cross(tvec, te1)
        gamma = jnp.sum(dN * qvec, axis=-1) * inv_det
        tt = jnp.sum(te2 * qvec, axis=-1) * inv_det
        ok = (active[:, None] & (tid >= 0) & (beta >= 0.0) & (gamma >= 0.0)
              & (beta + gamma <= 1.0) & (tt > K_EPSILON) & (tt < best_t[:, None]))
        if any_hit:
            ok = ok & (tt < max_dist[:, None])
        tt = jnp.where(ok, tt, TMAX)
        # dense 16-slot winner: unrolled compare chain, no argmin gathers.
        # Deviation-free: identical result to argmin + take_along (first
        # minimum wins either way — strict < keeps the earliest slot).
        for k in range(k_slots):
            better = tt[:, k] < best_t
            best_t = jnp.where(better, tt[:, k], best_t)
            best_tri = jnp.where(better, tid[:, k], best_tri)

        # push internal children ordered far-to-near by tn (nearest on top):
        # insertion sort of 4 (tn, child) pairs via masked compare-swaps
        is_int_child = (child >= 0) & box_hit
        key = jnp.where(is_int_child, tn, -jnp.inf)  # far = larger key first

        def swap(kc, i, j):
            # ensure key[i] >= key[j] (descending); invalid (-inf) sink last
            key, cval = kc
            do = key[i] < key[j]
            ki = jnp.where(do, key[j], key[i])
            kj = jnp.where(do, key[i], key[j])
            vi = jnp.where(do, cval[j], cval[i])
            vj = jnp.where(do, cval[i], cval[j])
            key = [ki if s == i else kj if s == j else key[s] for s in range(WIDTH)]
            cval = [vi if s == i else vj if s == j else cval[s] for s in range(WIDTH)]
            return key, cval

        kc = ([key[:, s] for s in range(WIDTH)],
              [jnp.where(is_int_child[:, s], child[:, s], -1) for s in range(WIDTH)])
        for ij in ((0, 1), (2, 3), (0, 2), (1, 3), (1, 2)):
            kc = swap(kc, *ij)
        cval = kc[1]  # descending by tn; valid children first
        npush = sum((c >= 0).astype(jnp.int32) for c in cval)
        npush = jnp.minimum(npush, MAX_STACK - sp)
        # one combined write: slot sp+r takes the r-th sorted child
        rel = iota_s - sp[:, None]  # [N, S]
        pick = cval[0][:, None]
        for r in range(1, WIDTH):
            pick = jnp.where(rel >= r, cval[r][:, None], pick)
        stack = jnp.where((rel >= 0) & (rel < npush[:, None]), pick, stack)
        sp = sp + npush

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
