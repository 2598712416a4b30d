"""Pallas TPU kernel for fat-row BVH4 traversal (north-star: traversal as
"a stackless breadth-wise Pallas kernel with stream compaction").

Design: BLOCK-SYNCHRONOUS PACKET TRAVERSAL. Each grid step owns one block
of rays; the block walks the tree with ONE scalar stack in SMEM — a pop
fetches a single fat node row by scalar dynamic-slice (Mosaic-supported,
unlike per-lane row gathers, whose lowering TPU rejects) and every lane
tests that node's 4 child boxes + inlined leaf triangles as dense [B]
vector ops on the VPU. A child is pushed when ANY lane's box test passes
(scalar or-reduce), ordered far-to-near by the packet-min entry distance
so the nearest child pops first. This is the classic SIMD packet
traversal re-shaped for the TPU's scalar-core + 128-lane-VPU split; the
reference traverses one ray per CPU thread instead
(accelerator/bvh4.h:299-389).

Cost model: a block's wall time is the UNION of its lanes' node visits,
so the kernel wants spatially/directionally coherent blocks — pair with
ops/raysort.sorted_traversal, which Morton-orders the wavefront's bounce
rays. Camera rays are coherent by construction.

The ENTIRE fat node table rides in VMEM (BlockSpec with a constant index
map — DMA'd once, resident across grid steps), so the per-pop fetch is
on-chip: supported tree size is bounded by VMEM — 128 MiB on v5e
(measured, profiling/probe_vmem_limit.py; Mosaic's default limit is
~16 MiB until compiler_params raises it) ≈ 245k nodes ≈ 1.9M tris at
leaf2. Larger scenes keep the XLA path (accel/bvh4.py), whose batched
HBM gathers are the right tool when the table cannot be resident.

Selection: intersect_scene picks this kernel AUTOMATICALLY on the TPU
backend when the fat node table fits the VMEM budget (fits_vmem below) —
measured on hardware 2026-08-19: compiled kernel + coherence sort =
1.51M rays/s vs 778k for the XLA while-loop on a real 131k-tri render
(bench_mesh 256^2 depth 4). Env overrides: CRAYTRACER_PALLAS_TRAVERSAL=0
forces the XLA path, =1 forces the kernel even past the auto criteria;
CRAYTRACER_RAY_SORT=0 disables the coherence sort (on by default with
the kernel, a no-op for the monolithic XLA loop). interpret=True is what
CI exercises on CPU.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from craytracer_tpu.constants import K_EPSILON, TMAX
from craytracer_tpu.accel.bvh import LEAF_SIZE, MAX_STACK
from craytracer_tpu.accel.bvh4 import _FAT_TRI0, _TRI_COLS, WIDTH, BVH4Arrays

# Block width tuned end-to-end on hardware (2026-08-20, 327k-tri render,
# bench_ref_compare.py matrix): 256->2048 lanes is +44% — [B]-lane vector
# ops below 1024 underfill the VPU's native (8,128) tile and the per-pop
# scalar work amortizes over 8x more lanes; 4096 gives the union growth
# back. Overridable per-call (block=) or via CRAYTRACER_PALLAS_BLOCK.
RAY_BLOCK = 2048
_K_SLOTS = WIDTH * LEAF_SIZE  # default; the kernel factory is leaf-general
_BIG = 3.0e38  # plain float: jnp scalars would be captured tracer consts

# VMEM on this chip (v5e) is 128 MiB, not the ~16 MiB the generic guide
# quotes — measured 2026-08-19 (profiling/probe_vmem_limit.py): a 124 MiB
# fat table compiles and runs once compiler_params raises Mosaic's
# default vmem limit; without the knob fresh compiles fail above ~16 MiB.
# Budget 120 MiB of node rows ≈ 245k nodes ≈ 1.9M tris at leaf2; the
# ray/output blocks and scratch need only a few hundred KiB on top.
VMEM_FAT_BUDGET_BYTES = 120 * 1024 * 1024
_VMEM_LIMIT_BYTES = 127 * 1024 * 1024


def fits_vmem(bvh: BVH4Arrays) -> bool:
    """True when the whole fat node table can ride in VMEM (see budget)."""
    m, w = bvh.fat.shape
    return m * w * 4 <= VMEM_FAT_BUDGET_BYTES


# Per-pop cost knobs. ROUND-4 RE-TUNE (hardware, end-to-end production
# renders at block 2048): push="sorted" + mt_skip OFF is the fastest
# combination — at wide blocks the scalar sorting network/push chain is
# amortized over 8x more vector lanes and near-first pop order cuts pops
# (culled 967k -> sorted 1.165M rays/s), while every lax.cond variant
# (mt_skip, mt_skip='child') costs more in scalar-branch serialization
# than the vector work it skips (1.190M with dense MT). The round-3
# defaults (culled + mt_skip) were tuned at block 256, where the
# opposite held (profiling/ablate_pallas_pop.py: ~812ns pop — row 44,
# box 22, MT 340, sort network + serial push chain ~406):
#   push_mode "sorted"  — far-to-near sorting network (the original)
#   push_mode "fixed"   — push in child order, no network (ablation)
#   push_mode "cnear"   — culled + rank-based far-to-near push offsets
#                         (nearest child pops first; no sorting network,
#                         no serial sp chain) — see the kernel body
#   push_mode "culled"  — UNORDERED pushes with parallel prefix offsets
#                         (no serial sp chain) + the packet-min entry
#                         distance stored alongside; a pop whose stored
#                         tn can no longer beat ANY lane's best_t skips
#                         the whole body via lax.cond. Recovers sorted-
#                         order pruning without the per-pop network.
#   mt_skip             — lax.cond around the Moller-Trumbore slots when
#                         no child of the popped node is a leaf (upper-
#                         tree pops pay box tests only).
PUSH_MODES = ("sorted", "fixed", "culled", "cnear")
_PUSH_MODE = os.environ.get("CRAY_PALLAS_PUSH", "sorted")
if _PUSH_MODE not in PUSH_MODES:
    # An unknown mode would silently fall through to the 'sorted' branch
    # chain and benchmark the wrong variant (e.g. the simulator-only
    # 'cnearb'); fail loudly at import instead.
    raise ValueError(f"CRAY_PALLAS_PUSH={_PUSH_MODE!r} not in {PUSH_MODES}")
# CRAY_PALLAS_MTSKIP: "0" = dense (default since the round-4 re-tune:
# every cond variant loses to dense vector work at block 2048), "1" =
# whole-section cond, "child" = per-child cond + box-vote gating (exact;
# see kernel body)
_MT_SKIP_ENV = os.environ.get("CRAY_PALLAS_MTSKIP", "0")
_MT_SKIP = "child" if _MT_SKIP_ENV == "child" else _MT_SKIP_ENV == "1"


def _make_traversal_kernel(k_slots, push_mode, mt_skip):
    def kernel(o_ref, d_ref, fat_ref, t_ref, tri_ref, stack_ref, tns_ref):
        return _traversal_kernel(o_ref, d_ref, fat_ref, t_ref, tri_ref,
                                 stack_ref, tns_ref, k_slots,
                                 push_mode=push_mode, mt_skip=mt_skip)
    return kernel


def _make_traversal_kernel_init(k_slots, push_mode, mt_skip):
    """Variant whose best_t/best_tri start from carried-in rows — the
    per-part step of the partitioned traversal (accel/bvh4_parts.py):
    part k prunes against the best hit found in parts 0..k-1."""
    def kernel(o_ref, d_ref, t0_ref, tri0_ref, fat_ref, t_ref, tri_ref,
               stack_ref, tns_ref):
        return _traversal_kernel(o_ref, d_ref, fat_ref, t_ref, tri_ref,
                                 stack_ref, tns_ref, k_slots,
                                 t0_ref=t0_ref, tri0_ref=tri0_ref,
                                 push_mode=push_mode, mt_skip=mt_skip)
    return kernel


def _make_anyhit_kernel(k_slots):
    def kernel(o_ref, d_ref, md_ref, fat_ref, t_ref, stack_ref):
        return _anyhit_kernel(o_ref, d_ref, md_ref, fat_ref, t_ref,
                              stack_ref, k_slots)
    return kernel


def _traversal_kernel(o_ref, d_ref, fat_ref, t_ref, tri_ref, stack_ref,
                      tns_ref, k_slots=_K_SLOTS, t0_ref=None, tri0_ref=None,
                      push_mode="sorted", mt_skip=False):
    """One ray block vs the whole tree. stack_ref: SMEM [stack_cap] i32;
    tns_ref: SMEM [stack_cap] f32 (packet-min entry t; culled/cnear modes).

    Rays arrive TRANSPOSED ([3, B]) and results leave as a [1, B] row:
    1-D blocked operands trip an XLA-vs-Mosaic tiling mismatch
    (T(512) vs T(256) for f32[512]), and [B, 3] blocks lane-pad the
    3-wide minor dim; [3, B] rows keep the 128-lane minor dim dense."""
    stack_cap = stack_ref.shape[0]
    ox, oy, oz = o_ref[0, :], o_ref[1, :], o_ref[2, :]
    dx, dy, dz = d_ref[0, :], d_ref[1, :], d_ref[2, :]

    def safe(v, eps):
        return jnp.where(jnp.abs(v) < eps, jnp.where(v < 0, -eps, eps), v)

    ivx = 1.0 / safe(dx, 1e-12)
    ivy = 1.0 / safe(dy, 1e-12)
    ivz = 1.0 / safe(dz, 1e-12)

    stack_ref[0] = 0  # root
    if push_mode in ("culled", "cnear"):
        tns_ref[0] = -_BIG  # the root is never culled

    def cond(state):
        sp, *_ = state
        return sp > 0

    def visit(node, sp, best_t, best_tri):
        row = fat_ref[node, :]  # scalar-indexed row: [FAT_WIDTH]
        col = lambda j: row[j]  # noqa: E731 — scalar columns

        # 4-box slab test, dense over lanes per child
        # (rayIntersectAABB4, accelerator/bvh4.h:23-97)
        tn_c, hit_any_c, child_c = [], [], []
        for c in range(WIDTH):
            t0x = (col(c * 3 + 0) - ox) * ivx
            t1x = (col(12 + c * 3 + 0) - ox) * ivx
            t0y = (col(c * 3 + 1) - oy) * ivy
            t1y = (col(12 + c * 3 + 1) - oy) * ivy
            t0z = (col(c * 3 + 2) - oz) * ivz
            t1z = (col(12 + c * 3 + 2) - oz) * ivz
            tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                         jnp.minimum(t0y, t1y)),
                             jnp.minimum(t0z, t1z))
            tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                         jnp.maximum(t0y, t1y)),
                             jnp.maximum(t0z, t1z))
            lane_hit = (tn <= tf) & (tf > 0.0) & (tn < best_t)
            # packet vote: nearest entry over the lanes that hit
            tn_c.append(jnp.min(jnp.where(lane_hit, tn, _BIG)))
            hit_any_c.append(jnp.any(lane_hit))
            child_c.append(col(24 + c).astype(jnp.int32))

        # Inlined leaf triangles (every child's: a miss or pad can never
        # produce a closer valid t), dense Moller-Trumbore per slot over
        # the lanes. With mt_skip, pops whose children are ALL internal
        # (every slot id < 0) branch around the whole section — upper-tree
        # pops pay box tests only (~340ns of ~812ns saved at block 256).
        def mt_slots(lo, hi):
            def run(carry):
                best_t, best_tri = carry
                for k in range(lo, hi):
                    b = _FAT_TRI0 + k * _TRI_COLS
                    v0x, v0y, v0z = col(b + 0), col(b + 1), col(b + 2)
                    e1x, e1y, e1z = col(b + 3), col(b + 4), col(b + 5)
                    e2x, e2y, e2z = col(b + 6), col(b + 7), col(b + 8)
                    tid = col(b + 9).astype(jnp.int32)
                    px = dy * e2z - dz * e2y
                    py = dz * e2x - dx * e2z
                    pz = dx * e2y - dy * e2x
                    det = e1x * px + e1y * py + e1z * pz
                    inv_det = 1.0 / safe(det, 1e-20)
                    tx, ty, tz = ox - v0x, oy - v0y, oz - v0z
                    beta = (tx * px + ty * py + tz * pz) * inv_det
                    qx = ty * e1z - tz * e1y
                    qy = tz * e1x - tx * e1z
                    qz = tx * e1y - ty * e1x
                    gamma = (dx * qx + dy * qy + dz * qz) * inv_det
                    tt = (e2x * qx + e2y * qy + e2z * qz) * inv_det
                    ok = ((tid >= 0) & (beta >= 0.0) & (gamma >= 0.0)
                          & (beta + gamma <= 1.0) & (tt > K_EPSILON)
                          & (tt < best_t))
                    best_tri = jnp.where(ok, tid, best_tri)
                    best_t = jnp.where(ok, tt, best_t)
                return best_t, best_tri
            return run

        if mt_skip == "child":
            # Per-CHILD MT gating (exact, not heuristic): child c's slots
            # run only when (a) its first slot holds a triangle AND (b)
            # ANY lane entered its box this pop — a box no lane entered
            # cannot contain a winning triangle (tri t >= the lane's box
            # entry t >= best_t for culled lanes; a full box miss bounds
            # every contained tri out). Tree stats (327k-tri mesh): leaf
            # pops average 5 occupied of 8 slots across 3 leaf children,
            # and deep pops usually enter 1-2 children, so this skips
            # most of the ~340ns dense-MT section without changing any
            # result.
            leaf_l = k_slots // WIDTH
            for c in range(WIDTH):
                pc = ((col(_FAT_TRI0 + (c * leaf_l) * _TRI_COLS + 9) >= 0)
                      & hit_any_c[c])
                best_t, best_tri = jax.lax.cond(
                    pc, mt_slots(c * leaf_l, (c + 1) * leaf_l),
                    lambda cr: cr, (best_t, best_tri))
        elif mt_skip:
            run_mt = mt_slots(0, k_slots)
            has_leaf = col(_FAT_TRI0 + 9) >= 0
            for k in range(1, k_slots):
                has_leaf = has_leaf | (col(_FAT_TRI0 + k * _TRI_COLS + 9)
                                       >= 0)
            best_t, best_tri = jax.lax.cond(
                has_leaf, run_mt, lambda c: c, (best_t, best_tri))
        else:
            best_t, best_tri = mt_slots(0, k_slots)((best_t, best_tri))

        if push_mode in ("culled", "cnear"):
            # UNORDERED pushes, parallel prefix offsets: no serial sp
            # chain and no sorting network. Ordered-traversal pruning is
            # recovered at POP time — the packet-min entry t rides the
            # stack and a popped node that cannot beat any lane's best_t
            # skips its visit entirely (see body()).
            want = [hit_any_c[c] & (child_c[c] >= 0) for c in range(WIDTH)]
            wi = [w.astype(jnp.int32) for w in want]
            if push_mode == "culled":
                off = [jnp.int32(0), wi[0], wi[0] + wi[1],
                       wi[0] + wi[1] + wi[2]]
            else:
                # "cnear": rank-based far-to-near offsets. Among the
                # wanted children, a LARGER packet-min entry t gets a
                # smaller offset (deeper in the stack), so the NEAREST
                # child lands on top and pops first — sorted-order
                # pruning recovered with 12 parallel scalar compares
                # instead of the 5-stage sorting network + serial sp
                # chain the "sorted" mode pays (~406ns of an ~812ns pop,
                # profiling/ablate_pallas_pop.py). Composes with the
                # pop-cull: earlier near pops tighten best_t, so more
                # later pops cull.
                key = [jnp.where(want[c], tn_c[c], -_BIG)
                       for c in range(WIDTH)]
                off = []
                for c in range(WIDTH):
                    r = jnp.int32(0)
                    for c2 in range(WIDTH):
                        if c2 == c:
                            continue
                        gt = (key[c2] > key[c]) | ((key[c2] == key[c])
                                                   & (c2 < c))
                        r = r + (want[c2] & gt).astype(jnp.int32)
                    off.append(r)
            n_push = jnp.int32(0)
            for c in range(WIDTH):
                push = want[c] & (sp + off[c] < stack_cap)
                idx = jnp.where(push, sp + off[c], 0)
                stack_ref[idx] = jnp.where(push, child_c[c], stack_ref[0])
                tns_ref[idx] = jnp.where(push, tn_c[c], tns_ref[0])
                n_push = n_push + push.astype(jnp.int32)
            return sp + n_push, best_t, best_tri

        if push_mode == "fixed":
            for c in range(WIDTH):
                push = hit_any_c[c] & (child_c[c] >= 0) & (sp < stack_cap)
                stack_ref[jnp.where(push, sp, 0)] = jnp.where(
                    push, child_c[c], stack_ref[0])
                sp = sp + push.astype(jnp.int32)
            return sp, best_t, best_tri

        # "sorted": push far-to-near by the packet-min tn (scalar sorting
        # network of 4, nearest on top).
        key = [jnp.where(hit_any_c[c] & (child_c[c] >= 0), tn_c[c], -_BIG)
               for c in range(WIDTH)]
        cval = [jnp.where(hit_any_c[c] & (child_c[c] >= 0), child_c[c], -1)
                for c in range(WIDTH)]
        for (i, j) in ((0, 1), (2, 3), (0, 2), (1, 3), (1, 2)):
            do = key[i] < key[j]  # descending: far first
            ki = jnp.where(do, key[j], key[i])
            kj = jnp.where(do, key[i], key[j])
            vi = jnp.where(do, cval[j], cval[i])
            vj = jnp.where(do, cval[i], cval[j])
            key = [ki if s == i else kj if s == j else key[s]
                   for s in range(WIDTH)]
            cval = [vi if s == i else vj if s == j else cval[s]
                    for s in range(WIDTH)]
        for k in range(WIDTH):
            push = (cval[k] >= 0) & (sp < stack_cap)
            stack_ref[jnp.where(push, sp, 0)] = jnp.where(
                push, cval[k], stack_ref[0])
            sp = sp + push.astype(jnp.int32)
        return sp, best_t, best_tri

    def body(state):
        sp, best_t, best_tri = state
        node = stack_ref[sp - 1]
        sp = sp - 1
        if push_mode not in ("culled", "cnear"):
            return visit(node, sp, best_t, best_tri)
        # pop-cull: the stored packet-min entry t can no longer beat any
        # lane's current best — skip the visit (box+MT+push) outright
        tnp = tns_ref[sp]
        return jax.lax.cond(
            tnp < jnp.max(best_t),
            lambda a: visit(*a),
            lambda a: (a[1], a[2], a[3]),
            (node, sp, best_t, best_tri))

    n = ox.shape[0]
    if t0_ref is None:
        best_t0 = jnp.full((n,), TMAX, jnp.float32)
        best_tri0 = jnp.full((n,), -1, jnp.int32)
    else:
        best_t0 = t0_ref[0, :]
        best_tri0 = tri0_ref[0, :]
    if t0_ref is not None:
        # PART-LEVEL BLOCK EARLY-EXIT (the per-part compaction lever,
        # gallery/mesh_7m_scale.json): with a carried-in best hit, a
        # whole block whose every lane either misses this part's root
        # boxes or already holds a hit closer than its entry skips the
        # ENTIRE walk with one box test. Morton-sorted lanes cluster
        # spatially, so most blocks need only the parts covering their
        # region — late parts cost ~1 pop instead of a full traversal.
        row0 = fat_ref[0, :]
        live = False
        for c in range(WIDTH):
            t0x = (row0[c * 3 + 0] - ox) * ivx
            t1x = (row0[12 + c * 3 + 0] - ox) * ivx
            t0y = (row0[c * 3 + 1] - oy) * ivy
            t1y = (row0[12 + c * 3 + 1] - oy) * ivy
            t0z = (row0[c * 3 + 2] - oz) * ivz
            t1z = (row0[12 + c * 3 + 2] - oz) * ivz
            tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                         jnp.minimum(t0y, t1y)),
                             jnp.minimum(t0z, t1z))
            tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                         jnp.maximum(t0y, t1y)),
                             jnp.maximum(t0z, t1z))
            live = live | jnp.any((tn <= tf) & (tf > 0.0) & (tn < best_t0))

        def run(carry):
            return jax.lax.while_loop(cond, body, carry)

        sp, best_t, best_tri = jax.lax.cond(
            live, run, lambda c: c, (jnp.int32(1), best_t0, best_tri0))
    else:
        sp, best_t, best_tri = jax.lax.while_loop(
            cond, body, (jnp.int32(1), best_t0, best_tri0))
    t_ref[0, :] = best_t
    tri_ref[0, :] = best_tri


@functools.partial(jax.jit, static_argnames=("interpret", "block",
                                             "push_mode", "mt_skip"))
def pallas_bvh4_closest_hit_init(bvh: BVH4Arrays, o, d, t0, tri0,
                                 interpret: bool = False,
                                 block: int = RAY_BLOCK,
                                 push_mode: str | None = None,
                                 mt_skip: bool | None = None):
    """pallas_bvh4_closest_hit with carried-in (t0, tri0): the winner of
    previous parts prunes this part's walk (accel/bvh4_parts.py). Padded
    lanes carry t0 = -1 so their packet slots retire immediately."""
    push_mode = _PUSH_MODE if push_mode is None else push_mode
    if push_mode not in PUSH_MODES:
        raise ValueError(f"push_mode={push_mode!r} not in {PUSH_MODES}")
    mt_skip = _MT_SKIP if mt_skip is None else mt_skip
    n = o.shape[0]
    pad = (-n) % block
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
        d = jnp.concatenate([d, jnp.ones((pad, 3), d.dtype)])
        # best_t = -1 on padded lanes: every box test has tn >= 0 > -1,
        # so pads never vote a child in and never win a leaf slot
        t0 = jnp.concatenate([t0, jnp.full((pad,), -1.0, t0.dtype)])
        tri0 = jnp.concatenate([tri0, jnp.full((pad,), -1, tri0.dtype)])
    blocks = (n + pad) // block
    stack_cap = min(int(bvh.stack_size), MAX_STACK)

    t, tri = pl.pallas_call(
        _make_traversal_kernel_init(WIDTH * bvh.leaf_size, push_mode,
                                    mt_skip),
        grid=(blocks,),
        in_specs=[
            pl.BlockSpec((3, block), lambda i: (0, i)),
            pl.BlockSpec((3, block), lambda i: (0, i)),
            pl.BlockSpec((1, block), lambda i: (0, i)),
            pl.BlockSpec((1, block), lambda i: (0, i)),
            pl.BlockSpec(bvh.fat.shape, lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block), lambda i: (0, i)),
            pl.BlockSpec((1, block), lambda i: (0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, blocks * block), jnp.float32),
            jax.ShapeDtypeStruct((1, blocks * block), jnp.int32),
        ],
        scratch_shapes=[pltpu.SMEM((stack_cap,), jnp.int32),
                        pltpu.SMEM((stack_cap,), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(o.T, d.T, t0.reshape(1, -1), tri0.reshape(1, -1), bvh.fat)
    return t.reshape(-1)[:n], tri.reshape(-1)[:n]


def _anyhit_kernel(o_ref, d_ref, md_ref, fat_ref, t_ref, stack_ref,
                   k_slots=_K_SLOTS):
    """Shadow-ray (occlusion) packet walk: bvh4_any_hit semantics
    (accel/bvh4.py:425-427) — a lane retires the moment any triangle hit
    lands under its max_dist, the packet retires when EVERY live lane is
    occluded or the stack drains, and no child ordering is needed (any
    hit is as good as the nearest). Returns best_t (TMAX = unoccluded).
    Padded lanes arrive with md = 0 and count as done from the start."""
    stack_cap = stack_ref.shape[0]
    ox, oy, oz = o_ref[0, :], o_ref[1, :], o_ref[2, :]
    dx, dy, dz = d_ref[0, :], d_ref[1, :], d_ref[2, :]
    md = md_ref[0, :]

    def safe(v, eps):
        return jnp.where(jnp.abs(v) < eps, jnp.where(v < 0, -eps, eps), v)

    ivx = 1.0 / safe(dx, 1e-12)
    ivy = 1.0 / safe(dy, 1e-12)
    ivz = 1.0 / safe(dz, 1e-12)

    stack_ref[0] = 0  # root

    def done(best_t):
        return (best_t < md) | (md <= 0.0)

    def cond(state):
        sp, best_t = state
        return (sp > 0) & jnp.logical_not(jnp.all(done(best_t)))

    def body(state):
        sp, best_t = state
        node = stack_ref[sp - 1]
        sp = sp - 1

        row = fat_ref[node, :]
        col = lambda j: row[j]  # noqa: E731

        live = jnp.logical_not(done(best_t))
        tlimit = jnp.where(live, jnp.minimum(best_t, md), -_BIG)

        hit_any_c, child_c = [], []
        for c in range(WIDTH):
            t0x = (col(c * 3 + 0) - ox) * ivx
            t1x = (col(12 + c * 3 + 0) - ox) * ivx
            t0y = (col(c * 3 + 1) - oy) * ivy
            t1y = (col(12 + c * 3 + 1) - oy) * ivy
            t0z = (col(c * 3 + 2) - oz) * ivz
            t1z = (col(12 + c * 3 + 2) - oz) * ivz
            tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                         jnp.minimum(t0y, t1y)),
                             jnp.minimum(t0z, t1z))
            tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                         jnp.maximum(t0y, t1y)),
                             jnp.maximum(t0z, t1z))
            hit_any_c.append(jnp.any((tn <= tf) & (tf > 0.0) & (tn < tlimit)))
            child_c.append(col(24 + c).astype(jnp.int32))

        for k in range(k_slots):
            b = _FAT_TRI0 + k * _TRI_COLS
            v0x, v0y, v0z = col(b + 0), col(b + 1), col(b + 2)
            e1x, e1y, e1z = col(b + 3), col(b + 4), col(b + 5)
            e2x, e2y, e2z = col(b + 6), col(b + 7), col(b + 8)
            tid = col(b + 9).astype(jnp.int32)
            px = dy * e2z - dz * e2y
            py = dz * e2x - dx * e2z
            pz = dx * e2y - dy * e2x
            det = e1x * px + e1y * py + e1z * pz
            inv_det = 1.0 / safe(det, 1e-20)
            tx, ty, tz = ox - v0x, oy - v0y, oz - v0z
            beta = (tx * px + ty * py + tz * pz) * inv_det
            qx = ty * e1z - tz * e1y
            qy = tz * e1x - tx * e1z
            qz = tx * e1y - ty * e1x
            gamma = (dx * qx + dy * qy + dz * qz) * inv_det
            tt = (e2x * qx + e2y * qy + e2z * qz) * inv_det
            ok = ((tid >= 0) & (beta >= 0.0) & (gamma >= 0.0)
                  & (beta + gamma <= 1.0) & (tt > K_EPSILON)
                  & (tt < best_t) & (tt < md))
            best_t = jnp.where(ok, tt, best_t)

        # push internal children the packet wants — unordered (no sorting
        # network: any-hit does not care which child pops first)
        for c in range(WIDTH):
            push = hit_any_c[c] & (child_c[c] >= 0) & (sp < stack_cap)
            stack_ref[jnp.where(push, sp, 0)] = jnp.where(
                push, child_c[c], stack_ref[0])
            sp = sp + push.astype(jnp.int32)
        return sp, best_t

    n = ox.shape[0]
    best_t0 = jnp.full((n,), TMAX, jnp.float32)
    sp, best_t = jax.lax.while_loop(cond, body, (jnp.int32(1), best_t0))
    t_ref[0, :] = best_t


@functools.partial(jax.jit, static_argnames=("interpret", "block"))
def pallas_bvh4_any_hit(bvh: BVH4Arrays, o, d, max_dist,
                        interpret: bool = False, block: int = RAY_BLOCK):
    """Drop-in for bvh4_any_hit (returns t; TMAX = unoccluded under
    max_dist). Same block/VMEM layout story as pallas_bvh4_closest_hit."""
    n = o.shape[0]
    pad = (-n) % block
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
        d = jnp.concatenate([d, jnp.ones((pad, 3), d.dtype)])
        # md = 0 marks the padded lanes done from the first cond check
        max_dist = jnp.concatenate(
            [max_dist, jnp.zeros((pad,), max_dist.dtype)])
    blocks = (n + pad) // block
    stack_cap = min(int(bvh.stack_size), MAX_STACK)

    t = pl.pallas_call(
        _make_anyhit_kernel(WIDTH * bvh.leaf_size),
        grid=(blocks,),
        in_specs=[
            pl.BlockSpec((3, block), lambda i: (0, i)),
            pl.BlockSpec((3, block), lambda i: (0, i)),
            pl.BlockSpec((1, block), lambda i: (0, i)),
            pl.BlockSpec(bvh.fat.shape, lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((1, blocks * block), jnp.float32),
        scratch_shapes=[pltpu.SMEM((stack_cap,), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(o.T, d.T, max_dist.reshape(1, -1), bvh.fat)
    return t.reshape(-1)[:n]


@functools.partial(jax.jit, static_argnames=("interpret", "block",
                                             "push_mode", "mt_skip"))
def pallas_bvh4_closest_hit(bvh: BVH4Arrays, o, d, interpret: bool = False,
                            block: int = RAY_BLOCK,
                            push_mode: str | None = None,
                            mt_skip: bool | None = None):
    """Drop-in for bvh4_closest_hit. Pads the ray batch to `block` lanes.

    Each grid step runs its OWN packet while-loop over one `block`-lane
    slice, so per-block node-visit unions (not the global max) set the
    cost — pair with ops/raysort.sorted_traversal so coherent rays share
    blocks."""
    push_mode = _PUSH_MODE if push_mode is None else push_mode
    if push_mode not in PUSH_MODES:
        raise ValueError(f"push_mode={push_mode!r} not in {PUSH_MODES}")
    mt_skip = _MT_SKIP if mt_skip is None else mt_skip
    n = o.shape[0]
    pad = (-n) % block
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
        d = jnp.concatenate([d, jnp.ones((pad, 3), d.dtype)])
    blocks = (n + pad) // block
    bvh_fat_shape = bvh.fat.shape
    # packet stack: one node per pop, net +3 per step — the per-lane bound
    # (3*depth+4) holds for the union walk too
    stack_cap = min(int(bvh.stack_size), MAX_STACK)

    # Rays ride transposed ([3, N]) so each block is [3, block] with the
    # 128-lane minor dim dense; outputs are [blocks, block] rows for the
    # same reason (1-D f32 blocks hit an XLA T(512) vs Mosaic T(256)
    # layout mismatch).
    t, tri = pl.pallas_call(
        _make_traversal_kernel(WIDTH * bvh.leaf_size, push_mode, mt_skip),
        grid=(blocks,),
        in_specs=[
            pl.BlockSpec((3, block), lambda i: (0, i)),
            pl.BlockSpec((3, block), lambda i: (0, i)),
            # Whole fat table as ONE block with a constant index map: the
            # Pallas pipeline sees the same block every grid step, DMAs it
            # to VMEM once, and keeps it resident — memory_space=ANY would
            # leave it in HBM and re-copy per step.
            pl.BlockSpec(bvh_fat_shape, lambda i: (0, 0)),
        ],
        out_specs=[
            # [1, blocks*block] rows indexed along the LANE dim: Mosaic
            # requires output block dims divisible by (8, 128) or equal to
            # the full array dims — a (1, block) slice of [blocks, block]
            # has sublane 1 ∤ 8, but of [1, blocks*block] the sublane
            # equals the array dim and 256 lanes divide cleanly.
            pl.BlockSpec((1, block), lambda i: (0, i)),
            pl.BlockSpec((1, block), lambda i: (0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, blocks * block), jnp.float32),
            jax.ShapeDtypeStruct((1, blocks * block), jnp.int32),
        ],
        scratch_shapes=[pltpu.SMEM((stack_cap,), jnp.int32),
                        pltpu.SMEM((stack_cap,), jnp.float32)],
        # Raise Mosaic's VMEM allocation limit to the chip's real 128 MiB
        # (minus margin): the default rejects tables above ~16 MiB.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(o.T, d.T, bvh.fat)
    return t.reshape(-1)[:n], tri.reshape(-1)[:n]


# ---------------------------------------------------------------------------
# SPLIT-TABLE traversal: topology resident in VMEM, leaf data DMA'd from
# HBM per pop — a DESIGN STUDY, measured NEGATIVE on hardware
# (2026-08-20): at 7M tris, 5 topology-parts ran 97k rays/s vs 139k for
# 17 resident full-fat parts on the same ray set, and at 327k (single
# part either way) the split walk is 0.70x the resident walk. Two
# lessons the numbers teach: (a) total pops are dominated by the DEEP
# tree levels, which are visited once regardless of how the tree is cut
# — extra parts only duplicate the cheap upper levels, so cutting part
# count 4x saves little; (b) the per-pop aligned 8-row DMA
# (HBM->VMEM, Mosaic tiling) costs ~44% even with its latency hidden
# behind the box tests. Kept compiled-tested as the reference
# implementation of per-pop HBM streaming (make_async_copy with dynamic
# row index, packed 4-nodes-per-128-col topology with branchless
# sub-row selects); the production >VMEM path remains resident parts
# (accel/bvh4_parts.py). Sorted pushes only.


def _make_traversal_kernel_split(k_slots, with_init):
    def kernel_init(o_ref, d_ref, t0_ref, tri0_ref, topo_ref, fat_hbm,
                    t_ref, tri_ref, stack_ref, row_ref, sem_ref):
        return _traversal_kernel_split(o_ref, d_ref, topo_ref, fat_hbm,
                                       t_ref, tri_ref, stack_ref, row_ref,
                                       sem_ref, k_slots,
                                       t0_ref=t0_ref, tri0_ref=tri0_ref)

    def kernel(o_ref, d_ref, topo_ref, fat_hbm, t_ref, tri_ref,
               stack_ref, row_ref, sem_ref):
        return _traversal_kernel_split(o_ref, d_ref, topo_ref, fat_hbm,
                                       t_ref, tri_ref, stack_ref, row_ref,
                                       sem_ref, k_slots)

    return kernel_init if with_init else kernel


def _traversal_kernel_split(o_ref, d_ref, topo_ref, fat_hbm, t_ref,
                            tri_ref, stack_ref, row_ref, sem_ref,
                            k_slots, t0_ref=None, tri0_ref=None):
    stack_cap = stack_ref.shape[0]
    ox, oy, oz = o_ref[0, :], o_ref[1, :], o_ref[2, :]
    dx, dy, dz = d_ref[0, :], d_ref[1, :], d_ref[2, :]

    def safe(v, eps):
        return jnp.where(jnp.abs(v) < eps, jnp.where(v < 0, -eps, eps), v)

    ivx = 1.0 / safe(dx, 1e-12)
    ivy = 1.0 / safe(dy, 1e-12)
    ivz = 1.0 / safe(dz, 1e-12)

    stack_ref[0] = 0  # root

    def cond(state):
        sp, *_ = state
        return sp > 0

    def body(state):
        sp, best_t, best_tri = state
        node = stack_ref[sp - 1]
        sp = sp - 1
        # leaf-data DMA first: the fetch rides behind the box tests
        # below. Mosaic requires HBM slices aligned to the (8,128)
        # tiling, so fetch the aligned 8-row tile containing the node
        # (4 KB at 128 cols) and select the row in VMEM.
        base = (node // 8) * 8
        dma = pltpu.make_async_copy(fat_hbm.at[pl.ds(base, 8), :],
                                    row_ref, sem_ref)
        dma.start()
        # topo is PACKED 4 nodes per 128-col row (a [M,32] VMEM window
        # would lane-pad to 128 and burn 4x the budget). Mosaic cannot
        # dynamic-slice a loaded row, so each column is a branchless
        # 4-way select over the packed sub-segments (scalar loads with
        # STATIC offsets + 3 selects — ~100ns of a ~2us pop).
        trow = topo_ref[node // 4, :]
        sub = node % 4

        def tcol(j):
            v = trow[96 + j]
            v = jnp.where(sub == 2, trow[64 + j], v)
            v = jnp.where(sub == 1, trow[32 + j], v)
            return jnp.where(sub == 0, trow[j], v)

        tn_c, hit_any_c, child_c = [], [], []
        for c in range(WIDTH):
            t0x = (tcol(c * 3 + 0) - ox) * ivx
            t1x = (tcol(12 + c * 3 + 0) - ox) * ivx
            t0y = (tcol(c * 3 + 1) - oy) * ivy
            t1y = (tcol(12 + c * 3 + 1) - oy) * ivy
            t0z = (tcol(c * 3 + 2) - oz) * ivz
            t1z = (tcol(12 + c * 3 + 2) - oz) * ivz
            tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                         jnp.minimum(t0y, t1y)),
                             jnp.minimum(t0z, t1z))
            tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                         jnp.maximum(t0y, t1y)),
                             jnp.maximum(t0z, t1z))
            lane_hit = (tn <= tf) & (tf > 0.0) & (tn < best_t)
            tn_c.append(jnp.min(jnp.where(lane_hit, tn, _BIG)))
            hit_any_c.append(jnp.any(lane_hit))
            child_c.append(tcol(24 + c).astype(jnp.int32))

        dma.wait()
        row = row_ref[node - base, :]
        col = lambda j: row[j]  # noqa: E731
        for k in range(k_slots):
            b = _FAT_TRI0 + k * _TRI_COLS
            v0x, v0y, v0z = col(b + 0), col(b + 1), col(b + 2)
            e1x, e1y, e1z = col(b + 3), col(b + 4), col(b + 5)
            e2x, e2y, e2z = col(b + 6), col(b + 7), col(b + 8)
            tid = col(b + 9).astype(jnp.int32)
            px = dy * e2z - dz * e2y
            py = dz * e2x - dx * e2z
            pz = dx * e2y - dy * e2x
            det = e1x * px + e1y * py + e1z * pz
            inv_det = 1.0 / safe(det, 1e-20)
            tx, ty, tz = ox - v0x, oy - v0y, oz - v0z
            beta = (tx * px + ty * py + tz * pz) * inv_det
            qx = ty * e1z - tz * e1y
            qy = tz * e1x - tx * e1z
            qz = tx * e1y - ty * e1x
            gamma = (dx * qx + dy * qy + dz * qz) * inv_det
            tt = (e2x * qx + e2y * qy + e2z * qz) * inv_det
            ok = ((tid >= 0) & (beta >= 0.0) & (gamma >= 0.0)
                  & (beta + gamma <= 1.0) & (tt > K_EPSILON)
                  & (tt < best_t))
            best_tri = jnp.where(ok, tid, best_tri)
            best_t = jnp.where(ok, tt, best_t)

        # sorted far-to-near pushes (the production push mode)
        key = [jnp.where(hit_any_c[c] & (child_c[c] >= 0), tn_c[c], -_BIG)
               for c in range(WIDTH)]
        cval = [jnp.where(hit_any_c[c] & (child_c[c] >= 0), child_c[c], -1)
                for c in range(WIDTH)]
        for (i, j) in ((0, 1), (2, 3), (0, 2), (1, 3), (1, 2)):
            do = key[i] < key[j]
            ki = jnp.where(do, key[j], key[i])
            kj = jnp.where(do, key[i], key[j])
            vi = jnp.where(do, cval[j], cval[i])
            vj = jnp.where(do, cval[i], cval[j])
            key = [ki if s2 == i else kj if s2 == j else key[s2]
                   for s2 in range(WIDTH)]
            cval = [vi if s2 == i else vj if s2 == j else cval[s2]
                    for s2 in range(WIDTH)]
        for k in range(WIDTH):
            push = (cval[k] >= 0) & (sp < stack_cap)
            stack_ref[jnp.where(push, sp, 0)] = jnp.where(
                push, cval[k], stack_ref[0])
            sp = sp + push.astype(jnp.int32)
        return sp, best_t, best_tri

    n = ox.shape[0]
    if t0_ref is None:
        best_t0 = jnp.full((n,), TMAX, jnp.float32)
        best_tri0 = jnp.full((n,), -1, jnp.int32)
    else:
        best_t0 = t0_ref[0, :]
        best_tri0 = tri0_ref[0, :]
    if t0_ref is not None:
        # same whole-block early-exit as the resident-table init kernel
        live = False
        trow0 = topo_ref[0, :]  # node 0 sits at packed offset 0
        for c in range(WIDTH):
            t0x = (trow0[c * 3 + 0] - ox) * ivx
            t1x = (trow0[12 + c * 3 + 0] - ox) * ivx
            t0y = (trow0[c * 3 + 1] - oy) * ivy
            t1y = (trow0[12 + c * 3 + 1] - oy) * ivy
            t0z = (trow0[c * 3 + 2] - oz) * ivz
            t1z = (trow0[12 + c * 3 + 2] - oz) * ivz
            tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                         jnp.minimum(t0y, t1y)),
                             jnp.minimum(t0z, t1z))
            tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                         jnp.maximum(t0y, t1y)),
                             jnp.maximum(t0z, t1z))
            live = live | jnp.any((tn <= tf) & (tf > 0.0) & (tn < best_t0))

        def run(carry):
            return jax.lax.while_loop(cond, body, carry)

        sp, best_t, best_tri = jax.lax.cond(
            live, run, lambda c: c, (jnp.int32(1), best_t0, best_tri0))
    else:
        sp, best_t, best_tri = jax.lax.while_loop(
            cond, body, (jnp.int32(1), best_t0, best_tri0))
    t_ref[0, :] = best_t
    tri_ref[0, :] = best_tri


@functools.partial(jax.jit, static_argnames=("interpret", "block",
                                             "with_init"))
def pallas_bvh4_closest_hit_hbm(bvh: BVH4Arrays, o, d, t0=None, tri0=None,
                                interpret: bool = False,
                                block: int = RAY_BLOCK,
                                with_init: bool = False):
    """Split-table packet traversal: `bvh.fat[:, :32]` (boxes+children,
    padded with 4 junk tri columns the box test never reads) rides VMEM;
    the full fat table stays in HBM and each pop DMAs its 128-col row.
    Supported table size is bounded by TOPOLOGY bytes — 4x the monolithic
    kernel's reach per VMEM part. Pass t0/tri0 (with_init=True) for the
    parts variant's carried best hit."""
    n = o.shape[0]
    pad = (-n) % block
    if with_init and t0 is None:
        raise ValueError("with_init requires t0/tri0")
    if not with_init:
        t0 = jnp.full((n,), TMAX, jnp.float32)
        tri0 = jnp.full((n,), -1, jnp.int32)
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
        d = jnp.concatenate([d, jnp.ones((pad, 3), d.dtype)])
        t0 = jnp.concatenate([t0, jnp.full((pad,), -1.0, t0.dtype)])
        tri0 = jnp.concatenate([tri0, jnp.full((pad,), -1, tri0.dtype)])
    blocks = (n + pad) // block
    stack_cap = min(int(bvh.stack_size), MAX_STACK)
    topo = bvh.fat[:, :32]
    # Mosaic constrains HBM DMA slices to the (8,128) tiling: rows are
    # padded to a multiple of 8 here (one cheap pad per dispatch), and
    # the column width must already be a 128 multiple — true for the
    # production leaf2 layout (exactly 128 cols); other leaf sizes keep
    # the resident-table kernels.
    if bvh.fat.shape[1] % 128 != 0:
        raise ValueError(
            f"split kernel needs fat width %128==0, got {bvh.fat.shape[1]} "
            f"(leaf_size={bvh.leaf_size}); use leaf_size=2")
    rpad = (-bvh.fat.shape[0]) % 8
    fat_p = (jnp.pad(bvh.fat, ((0, rpad), (0, 0))) if rpad else bvh.fat)
    # pack topology 4 nodes per 128-col row (see kernel comment)
    topo = jnp.pad(topo, ((0, (-topo.shape[0]) % 4), (0, 0))).reshape(-1, 128)

    t, tri = pl.pallas_call(
        _make_traversal_kernel_split(WIDTH * bvh.leaf_size, True),
        grid=(blocks,),
        in_specs=[
            pl.BlockSpec((3, block), lambda i: (0, i)),
            pl.BlockSpec((3, block), lambda i: (0, i)),
            pl.BlockSpec((1, block), lambda i: (0, i)),
            pl.BlockSpec((1, block), lambda i: (0, i)),
            pl.BlockSpec(topo.shape, lambda i: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, block), lambda i: (0, i)),
            pl.BlockSpec((1, block), lambda i: (0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, blocks * block), jnp.float32),
            jax.ShapeDtypeStruct((1, blocks * block), jnp.int32),
        ],
        scratch_shapes=[pltpu.SMEM((stack_cap,), jnp.int32),
                        pltpu.VMEM((8, bvh.fat.shape[1]), jnp.float32),
                        pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(o.T, d.T, t0.reshape(1, -1), tri0.reshape(1, -1), topo, fat_p)
    return t.reshape(-1)[:n], tri.reshape(-1)[:n]
