"""Uniform grid over the triangle soup: host CSR build -> batched 3D-DDA.

Build follows the reference's density-derived resolution
(UniformGrid_create, accelerator/uniformgrid.h:54-134): per-axis cell count
n_i = w_i * (multiplier * num_tris / volume)^(1/3) with multiplier 3
(buildscene.h:705). Cell membership uses conservative AABB overlap (the
reference adds an exact triangle-box SAT cull, uniformgrid.h:94-134; the
superset only costs a few extra masked tests). Cells are CSR arrays in HBM:
(cell_offset[C+1], tri_slot[total]) — the IntVector-per-cell layout
(util/intvector.h) flattened.

Traversal is the Amanatides-Woo 3D-DDA (gridIntersectTest,
intersect.h:61-194) as one `lax.while_loop` over the whole ray batch: each
lane alternates between draining its current cell's triangle list (K at a
time) and stepping the DDA; a lane retires when its best hit lies inside
the current cell (closest-hit) or any occluder is inside the distance bound
(any-hit, gridShadowIntersectTest intersect.h:196-308).
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from craytracer_tpu.constants import K_EPSILON, TMAX
from craytracer_tpu.core import math as vm

TESTS_PER_ITER = 4


@flax.struct.dataclass
class GridArrays:
    bbox_min: jnp.ndarray  # [3]
    bbox_max: jnp.ndarray  # [3]
    res: jnp.ndarray  # [3] int32 (nx, ny, nz)
    cell_offset: jnp.ndarray  # [C+1] int32
    tri_slot: jnp.ndarray  # [total] int32 slots into packed tri arrays
    # packed triangle data (deduped by original id, slot-indexed)
    tri_index: jnp.ndarray  # [T] original ids (identity here)
    v0: jnp.ndarray  # [T, 3]
    e1: jnp.ndarray  # [T, 3]
    e2: jnp.ndarray  # [T, 3]


def build_grid(v0: np.ndarray, v1: np.ndarray, v2: np.ndarray,
               multiplier: float = 3.0) -> GridArrays:
    v0 = np.asarray(v0, np.float64)
    v1 = np.asarray(v1, np.float64)
    v2 = np.asarray(v2, np.float64)
    t = v0.shape[0]
    if t == 0:
        z3 = jnp.zeros((1, 3), jnp.float32)
        zi = jnp.zeros((1,), jnp.int32)
        return GridArrays(bbox_min=jnp.zeros(3), bbox_max=jnp.ones(3),
                          res=jnp.ones(3, jnp.int32), cell_offset=jnp.zeros(2, jnp.int32),
                          tri_slot=zi, tri_index=zi, v0=z3, e1=z3, e2=z3)
    tri_min = np.minimum(np.minimum(v0, v1), v2)
    tri_max = np.maximum(np.maximum(v0, v1), v2)
    bmin = tri_min.min(axis=0) - 1e-4
    bmax = tri_max.max(axis=0) + 1e-4
    w = bmax - bmin
    vol = max(float(np.prod(w)), 1e-12)
    s = (multiplier * t / vol) ** (1.0 / 3.0)
    res = np.maximum(1, np.minimum(128, np.round(w * s).astype(np.int64)))
    nx, ny, nz = int(res[0]), int(res[1]), int(res[2])
    cell_w = w / res

    lo = np.clip(((tri_min - bmin) / cell_w).astype(np.int64), 0, res - 1)
    hi = np.clip(((tri_max - bmin) / cell_w).astype(np.int64), 0, res - 1)

    cells: list[list[int]] = [[] for _ in range(nx * ny * nz)]
    for i in range(t):
        for iz in range(lo[i, 2], hi[i, 2] + 1):
            for iy in range(lo[i, 1], hi[i, 1] + 1):
                base = (iz * ny + iy) * nx
                for ix in range(lo[i, 0], hi[i, 0] + 1):
                    cells[base + ix].append(i)

    offsets = np.zeros(nx * ny * nz + 1, np.int64)
    flat: list[int] = []
    for c, lst in enumerate(cells):
        flat.extend(lst)
        offsets[c + 1] = len(flat)

    f32 = np.float32
    return GridArrays(
        bbox_min=jnp.asarray(bmin, f32),
        bbox_max=jnp.asarray(bmax, f32),
        res=jnp.asarray([nx, ny, nz], jnp.int32),
        cell_offset=jnp.asarray(offsets, jnp.int32),
        tri_slot=jnp.asarray(flat if flat else [0], jnp.int32),
        tri_index=jnp.arange(t, dtype=jnp.int32),
        v0=jnp.asarray(v0, f32),
        e1=jnp.asarray(v1 - v0, f32),
        e2=jnp.asarray(v2 - v0, f32),
    )


def _tri_test(grid: GridArrays, o, d, slot, valid, best_t, best_tri, any_hit,
              max_dist):
    slot_c = jnp.clip(slot, 0, grid.v0.shape[0] - 1)
    tv0 = jnp.take(grid.v0, slot_c, axis=0)
    te1 = jnp.take(grid.e1, slot_c, axis=0)
    te2 = jnp.take(grid.e2, slot_c, axis=0)
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
    best_tri = jnp.where(ok, slot_c, best_tri)
    best_t = jnp.where(ok, tt, best_t)
    return best_t, best_tri


def _traverse(grid: GridArrays, o, d, any_hit: bool, max_dist=None):
    n = o.shape[0]
    if max_dist is None:
        max_dist = jnp.full((n,), TMAX)
    inv_d = 1.0 / vm._safe(d)
    res = grid.res
    resf = res.astype(o.dtype)
    cell_w = (grid.bbox_max - grid.bbox_min) / resf

    # Ray-box entry (intersect.h:75-104): rays starting inside use t=0.
    t0 = (grid.bbox_min - o) * inv_d
    t1 = (grid.bbox_max - o) * inv_d
    tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
    t_enter = jnp.maximum(tn, 0.0)
    inside = (tn <= tf) & (tf > 0.0)

    p_enter = o + (t_enter + 1e-5)[:, None] * d
    cell = jnp.clip(
        ((p_enter - grid.bbox_min) / cell_w).astype(jnp.int32), 0, res - 1
    )
    step = jnp.where(d > 0.0, 1, -1).astype(jnp.int32)
    next_boundary = grid.bbox_min + (cell + jnp.where(d > 0.0, 1, 0)) * cell_w
    t_max = jnp.where(
        jnp.abs(d) > 1e-12, (next_boundary - o) * inv_d, TMAX
    )
    t_delta = jnp.abs(cell_w * inv_d)

    def cell_range(cell):
        lin = (cell[:, 2] * res[1] + cell[:, 1]) * res[0] + cell[:, 0]
        lin = jnp.clip(lin, 0, grid.cell_offset.shape[0] - 2)
        return jnp.take(grid.cell_offset, lin), jnp.take(grid.cell_offset, lin + 1)

    cur, end = cell_range(cell)

    best_t = jnp.full((n,), TMAX)
    best_tri = jnp.full((n,), -1, jnp.int32)
    alive = inside

    state = (alive, cell, t_max, cur, end, best_t, best_tri)

    def cond(state):
        alive, *_ = state
        return jnp.any(alive)

    def body(state):
        alive, cell, t_max, cur, end, best_t, best_tri = state
        drain = alive & (cur < end)

        # Test up to K triangles from the current cell.
        for j in range(TESTS_PER_ITER):
            valid = drain & (cur + j < end)
            slot = jnp.take(grid.tri_slot, jnp.clip(cur + j, 0, grid.tri_slot.shape[0] - 1))
            best_t, best_tri = _tri_test(grid, o, d, slot, valid, best_t,
                                         best_tri, any_hit, max_dist)
        cur = jnp.where(drain, jnp.minimum(cur + TESTS_PER_ITER, end), cur)

        # Advance the DDA for lanes whose cell is drained.
        advance = alive & (cur >= end)
        t_exit = jnp.min(t_max, axis=-1)
        # hit inside the current cell -> done (intersect.h:151-166)
        done_hit = advance & (best_t <= t_exit + 1e-5)
        if any_hit:
            done_hit = done_hit | (alive & (best_t < max_dist))
        ax = jnp.argmin(t_max, axis=-1)
        onehot = jax.nn.one_hot(ax, 3, dtype=jnp.int32)
        new_cell = cell + onehot * step
        oob = jnp.any((new_cell < 0) | (new_cell >= res), axis=-1)
        new_t_max = t_max + onehot.astype(t_max.dtype) * t_delta
        stepping = advance & ~done_hit & ~oob
        cell = jnp.where(stepping[:, None], new_cell, cell)
        t_max = jnp.where(stepping[:, None], new_t_max, t_max)
        new_cur, new_end = cell_range(cell)
        cur = jnp.where(stepping, new_cur, cur)
        end = jnp.where(stepping, new_end, end)
        alive = alive & ~(advance & (done_hit | oob))
        return alive, cell, t_max, cur, end, best_t, best_tri

    state = jax.lax.while_loop(cond, body, state)
    *_, best_t, best_tri = state
    # slots are original triangle ids (no reordering in the grid layout)
    return best_t, best_tri


def grid_closest_hit(grid: GridArrays, o, d):
    return _traverse(grid, o, d, any_hit=False)


def grid_any_hit(grid: GridArrays, o, d, max_dist):
    t, _ = _traverse(grid, o, d, any_hit=True, max_dist=max_dist)
    return t
