"""Partitioned fat-row BVH4: VMEM-sized sub-trees for the Pallas packet
kernel at San-Miguel scale.

The packet traversal (accel/pallas_bvh4.py) wants the whole fat node
table resident in VMEM (128 MiB on v5e) — a ~1 GB table at 7M triangles
cannot ride. The reference handles big scenes with pointer-chasing from
CPU caches (accelerator/bvh4.h:299-389); the TPU answer is to CUT the
tree into an antichain of sub-trees, each under the VMEM budget, and run
the packet kernel once per part with the running (best_t, best_tri)
carried across parts:

- part 0 is the TOP of the tree (every node above the cut, cut children
  marked empty) — its rows still inline the shallow leaf triangles;
- parts 1..K are the cut sub-trees, rows renumbered part-locally;
- a part whose root box a ray block misses costs that block ONE node pop
  (the while loop drains immediately), so the skip is ~free;
- each pallas_call DMAs its part table HBM->VMEM once, so a full
  traversal streams the whole tree once per wavefront step, amortized
  over every ray in the batch — the opposite cost model from the XLA
  path's per-step row gathers.

Correctness is order-independent: every triangle lives in exactly one
part (inline leaf blocks follow their parent node), and carried best_t
only ever prunes work, never hits. Ties at exactly equal t may pick a
different triangle than the monolithic walk (different visit order) —
image-invisible.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from craytracer_tpu.constants import TMAX
from craytracer_tpu.accel.bvh4 import (BVH4Arrays, WIDTH,
                                       stack_bound_children)

# One part per VMEM residency budget (accel/pallas_bvh4.py measured the
# 128 MiB ceiling; 120 MiB leaves scratch headroom).
PART_BUDGET_BYTES = 120 * 1024 * 1024


def _subtree_sizes(child: np.ndarray) -> np.ndarray:
    """Row counts of every subtree. Children always carry LARGER q-ids
    than their parent (BFS assignment, accel/bvh4.py collapse), so sizes
    converge bottom-up in depth() vectorized passes."""
    m = child.shape[0]
    valid = child >= 0
    cidx = np.maximum(child, 0)
    size = np.ones(m, np.int64)
    for _ in range(256):
        new = 1 + np.where(valid, size[cidx], 0).sum(axis=1)
        if np.array_equal(new, size):
            return size
        size = new
    raise ValueError("BVH4 deeper than 256 levels (cycle?)")


def partition_bvh4(bvh: BVH4Arrays,
                   budget_bytes: int = PART_BUDGET_BYTES):
    """Cut `bvh` into parts each with fat-table bytes <= budget_bytes.

    Returns a tuple of BVH4Arrays: (top, cut subtrees...). A tree already
    under budget returns (bvh,) unchanged."""
    fat = np.asarray(bvh.fat)
    m, w = fat.shape
    budget_rows = max(1, budget_bytes // (w * 4))
    if m <= budget_rows:
        return (bvh,)

    child = fat[:, 24:28].astype(np.int64)
    size = _subtree_sizes(child)

    # cut: recursive descent — a node that fits becomes a part root,
    # one that doesn't joins the top part and exposes its children
    part_roots, top_rows = [], []
    stack = [0]
    while stack:
        nd = stack.pop()
        if size[nd] <= budget_rows:
            part_roots.append(nd)
        else:
            top_rows.append(nd)
            for c in child[nd]:
                if c >= 0:
                    stack.append(c)
    part_roots.sort()
    top_rows.sort()

    # label every row with its part: 0 = top, k+1 = subtree of root k.
    # Downward wave propagation (children inherit unless they are roots).
    part_of = np.full(m, -1, np.int64)
    part_of[np.asarray(top_rows, np.int64)] = 0
    for k, r in enumerate(part_roots):
        part_of[r] = k + 1
    valid = child >= 0
    cidx = np.maximum(child, 0)
    root_set = np.zeros(m, bool)
    root_set[np.asarray(part_roots, np.int64)] = True
    for _ in range(256):
        lab = np.broadcast_to(part_of[:, None], child.shape)
        target = cidx[valid]
        src = lab[valid]
        take = (part_of[target] < 0) & (src >= 0) & ~root_set[target]
        if not take.any():
            break
        part_of[target[take]] = src[take]
    assert (part_of >= 0).all(), "orphan rows after label propagation"

    parts = []
    for k in range(len(part_roots) + 1):
        rows = np.where(part_of == k)[0]  # ascending: part root first
        new_id = np.full(m, -1, np.int64)
        new_id[rows] = np.arange(rows.size)
        pf = fat[rows].copy()
        ch = child[rows]
        # children outside the part (the top part's cut children) -> -1
        remap = np.where(ch >= 0, new_id[np.maximum(ch, 0)], -1)
        pf[:, 24:28] = remap.astype(np.float32)
        parts.append(BVH4Arrays(
            fat=jnp.asarray(pf), n_tris=int(bvh.n_tris),
            leaf_size=int(bvh.leaf_size),
            stack_size=stack_bound_children(remap)))
    return tuple(parts)


def parts_closest_hit(parts, o, d):
    """XLA fallback (CPU correctness / non-TPU backends): monolithic
    while-loop traversal per part, min-combined."""
    from craytracer_tpu.accel.bvh4 import bvh4_closest_hit

    n = o.shape[0]
    best_t = jnp.full((n,), TMAX)
    best_tri = jnp.full((n,), -1, jnp.int32)
    for p in parts:
        t, tri = bvh4_closest_hit(p, o, d)
        better = t < best_t
        best_tri = jnp.where(better, tri, best_tri)
        best_t = jnp.where(better, t, best_t)
    return best_t, best_tri


def parts_any_hit(parts, o, d, max_dist):
    """XLA fallback any-hit across parts (first part that occludes wins)."""
    from craytracer_tpu.accel.bvh4 import bvh4_any_hit

    best_t = jnp.full((o.shape[0],), TMAX)
    for p in parts:
        best_t = jnp.minimum(best_t, bvh4_any_hit(p, o, d, max_dist))
    return best_t


def pallas_parts_any_hit(parts, o, d, max_dist, interpret: bool = False,
                         block: int = None):
    """Packet-kernel any-hit across parts: each part runs the occlusion
    walk; lanes already occluded by an earlier part carry max_dist 0, so
    their packet slots retire at that part's first pop."""
    from craytracer_tpu.accel.pallas_bvh4 import (RAY_BLOCK,
                                                  pallas_bvh4_any_hit)

    best_t = jnp.full((o.shape[0],), TMAX, jnp.float32)
    md = max_dist
    for p in parts:
        t = pallas_bvh4_any_hit(p, o, d, md, interpret=interpret,
                                block=RAY_BLOCK if block is None else block)
        best_t = jnp.minimum(best_t, t)
        md = jnp.where(best_t < max_dist, 0.0, max_dist)
    return best_t


def _part_entry(p, o, d):
    """Packet-min entry distance of rays into part p's root children
    boxes (TMAX when the ray misses all of them): 4 slab tests against
    row 0 — the same test the kernel's early-exit runs."""
    row0 = p.fat[0]
    ox, oy, oz = o[:, 0], o[:, 1], o[:, 2]

    def safe(v):
        return jnp.where(jnp.abs(v) < 1e-12,
                         jnp.where(v < 0, -1e-12, 1e-12), v)

    ivx, ivy, ivz = 1.0 / safe(d[:, 0]), 1.0 / safe(d[:, 1]), 1.0 / safe(d[:, 2])
    best = jnp.full((o.shape[0],), TMAX, jnp.float32)
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
        hit = (tn <= tf) & (tf > 0.0)
        best = jnp.minimum(best, jnp.where(hit, jnp.maximum(tn, 0.0), TMAX))
    return best


def pallas_parts_closest_hit(parts, o, d, interpret: bool = False,
                             block: int = None, part_sort: bool = None):
    """Packet-kernel traversal across parts with carried (t, tri).

    part_sort (default on for >2 parts; CRAY_PARTS_SORT=0 disables):
    rays are grouped by the part they ENTER FIRST before the part loop,
    so each block becomes nearly part-pure — blocks whose lanes all miss
    a part (or already beat its entry) take the kernel's whole-block
    early-exit instead of a full walk. Order/grouping cannot change the
    result: every part is still walked for every ray block that needs
    it, with the carried best hit pruning as before."""
    import os

    from craytracer_tpu.accel.pallas_bvh4 import (
        RAY_BLOCK, pallas_bvh4_closest_hit_init)

    n = o.shape[0]
    if part_sort is None:
        part_sort = (len(parts) > 2
                     and os.environ.get("CRAY_PARTS_SORT", "1") == "1")
    if part_sort:
        entries = jnp.stack([_part_entry(p, o, d) for p in parts], axis=0)
        first = jnp.argmin(entries, axis=0).astype(jnp.uint32)
        # secondary key: 8-bit Morton of the entry point keeps blocks
        # spatially tight within a part group
        from craytracer_tpu.ops.raysort import ray_key

        key = (first << jnp.uint32(27)) | (ray_key(o, d) >> jnp.uint32(5))
        perm = jnp.argsort(key)
        o_s = jnp.take(o, perm, axis=0)
        d_s = jnp.take(d, perm, axis=0)
    else:
        o_s, d_s = o, d
    t = jnp.full((n,), TMAX, jnp.float32)
    tri = jnp.full((n,), -1, jnp.int32)
    for p in parts:
        t, tri = pallas_bvh4_closest_hit_init(
            p, o_s, d_s, t, tri, interpret=interpret,
            block=RAY_BLOCK if block is None else block)
    if part_sort:
        t = jnp.zeros((n,), t.dtype).at[perm].set(t)
        tri = jnp.zeros((n,), tri.dtype).at[perm].set(tri)
    return t, tri
