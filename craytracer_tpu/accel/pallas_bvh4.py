"""Pallas TPU kernel for fat-row BVH4 traversal (north-star: traversal as
"a stackless breadth-wise Pallas kernel with stream compaction").

Shape: the ray batch is blocked over the Pallas grid (RAY_BLOCK lanes per
step); the ENTIRE fat node table rides in VMEM (its BlockSpec has no
blocking), so the per-step node fetch — the cost that dominates the XLA
`lax.while_loop` traversal, ~ms-scale HBM gather latency per step at
262k lanes — becomes an on-chip VMEM gather. That bounds the supported
tree size to VMEM (~16 MB ≈ 80k nodes ≈ 650k triangles); larger scenes
keep the XLA path (accel/bvh4.py), whose HBM gathers are the right tool
when the table cannot be resident.

Per-lane short stacks live in VMEM scratch ([RAY_BLOCK, STACK] i32); the
while-loop body is the same 4-box slab + 16-inlined-triangle step as the
XLA traversal, so results are identical by construction (asserted by
tests/test_pallas_kernel.py in interpret mode).

Env-gated: set CRAYTRACER_PALLAS_TRAVERSAL=1 to use the compiled kernel
in intersect_scene. Gated because large Pallas compiles have wedged the
remote-TPU tunnel in this environment (memory: axon-tpu-environment) —
interpret mode is always safe and is what CI exercises.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from craytracer_tpu.constants import K_EPSILON, TMAX
from craytracer_tpu.accel.bvh import LEAF_SIZE, MAX_STACK
from craytracer_tpu.accel.bvh4 import _FAT_TRI0, _TRI_COLS, WIDTH, BVH4Arrays

RAY_BLOCK = 128
_K_SLOTS = WIDTH * LEAF_SIZE  # default; the kernel factory is leaf-general


def _make_traversal_kernel(k_slots):
    def kernel(o_ref, d_ref, fat_ref, t_ref, tri_ref, stack_ref):
        return _traversal_kernel(o_ref, d_ref, fat_ref, t_ref, tri_ref,
                                 stack_ref, k_slots)
    return kernel


def _traversal_kernel(o_ref, d_ref, fat_ref, t_ref, tri_ref, stack_ref,
                      k_slots=_K_SLOTS):
    o = o_ref[:]  # [B, 3]
    d = d_ref[:]
    n = o.shape[0]
    stack_cap = stack_ref.shape[1]
    inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-12,
                            jnp.where(d < 0, -1e-12, 1e-12), d)
    n_nodes = fat_ref.shape[0]

    stack_ref[:, :] = jnp.zeros((n, stack_cap), jnp.int32)
    fat = fat_ref[:]  # resident table

    def cond(state):
        sp, *_ = state
        return jnp.any(sp > 0)

    def body(state):
        sp, best_t, best_tri = state
        active = sp > 0
        top = jnp.maximum(sp - 1, 0)
        node = jnp.take_along_axis(stack_ref[:, :], top[:, None], axis=1)[:, 0]
        sp = jnp.where(active, sp - 1, sp)
        node_c = jnp.where(active, jnp.clip(node, 0, n_nodes - 1), 0)

        row = jnp.take(fat, node_c, axis=0)  # VMEM gather
        cmin = row[:, 0:12].reshape(n, WIDTH, 3)
        cmax = row[:, 12:24].reshape(n, WIDTH, 3)
        child = row[:, 24:28].astype(jnp.int32)

        t0 = (cmin - o[:, None, :]) * inv_d[:, None, :]
        t1 = (cmax - o[:, None, :]) * inv_d[:, None, :]
        tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
        tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
        box_hit = active[:, None] & (tn <= tf) & (tf > 0.0) & (tn < best_t[:, None])

        tris = row[:, _FAT_TRI0:_FAT_TRI0 + k_slots * _TRI_COLS].reshape(
            n, k_slots, _TRI_COLS)
        tv0 = tris[..., 0:3]
        te1 = tris[..., 3:6]
        te2 = tris[..., 6:9]
        tid = tris[..., 9].astype(jnp.int32)
        dN = d[:, None, :]
        pvec = jnp.cross(dN, te2)
        det = jnp.sum(te1 * pvec, axis=-1)
        inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-20,
                                  jnp.where(det < 0, -1e-20, 1e-20), det)
        tvec = o[:, None, :] - tv0
        beta = jnp.sum(tvec * pvec, axis=-1) * inv_det
        qvec = jnp.cross(tvec, te1)
        gamma = jnp.sum(dN * qvec, axis=-1) * inv_det
        tt = jnp.sum(te2 * qvec, axis=-1) * inv_det
        ok = (active[:, None] & (tid >= 0) & (beta >= 0.0) & (gamma >= 0.0)
              & (beta + gamma <= 1.0) & (tt > K_EPSILON)
              & (tt < best_t[:, None]))
        tt = jnp.where(ok, tt, TMAX)
        slot = jnp.argmin(tt, axis=1)
        t_min = jnp.take_along_axis(tt, slot[:, None], axis=1)[:, 0]
        better = t_min < best_t
        best_tri = jnp.where(
            better, jnp.take_along_axis(tid, slot[:, None], axis=1)[:, 0],
            best_tri)
        best_t = jnp.where(better, t_min, best_t)

        is_int = (child >= 0) & box_hit
        key = jnp.where(is_int, tn, -jnp.inf)
        cval = jnp.where(is_int, child, -1)

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
            do_push = (cval[:, k] >= 0) & (sp <= stack_cap - 1)
            stack_ref[:, :] = jnp.where(
                do_push[:, None]
                & (jnp.arange(stack_cap)[None, :] == sp[:, None]),
                cval[:, k][:, None], stack_ref[:, :])
            sp = jnp.where(do_push, sp + 1, sp)
        return sp, best_t, best_tri

    sp0 = jnp.ones((n,), jnp.int32)
    best_t0 = jnp.full((n,), TMAX, jnp.float32)
    best_tri0 = jnp.full((n,), -1, jnp.int32)
    sp, best_t, best_tri = jax.lax.while_loop(
        cond, body, (sp0, best_t0, best_tri0))
    t_ref[:] = best_t
    tri_ref[:] = best_tri


@functools.partial(jax.jit, static_argnames=("interpret", "block"))
def pallas_bvh4_closest_hit(bvh: BVH4Arrays, o, d, interpret: bool = False,
                            block: int = RAY_BLOCK):
    """Drop-in for bvh4_closest_hit. Pads the ray batch to `block` lanes.

    Each grid step runs its OWN while-loop over one `block`-lane slice, so
    per-block trip counts (not the global max) set the cost — pair with
    ops/raysort.sorted_traversal so coherent rays share blocks."""
    n = o.shape[0]
    pad = (-n) % block
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
        d = jnp.concatenate([d, jnp.ones((pad, 3), d.dtype)])
    blocks = (n + pad) // block
    bvh_fat_shape = bvh.fat.shape
    stack_cap = min(int(bvh.stack_size), MAX_STACK)

    t, tri = pl.pallas_call(
        _make_traversal_kernel(WIDTH * bvh.leaf_size),
        grid=(blocks,),
        in_specs=[
            pl.BlockSpec((block, 3), lambda i: (i, 0)),
            pl.BlockSpec((block, 3), lambda i: (i, 0)),
            # Whole fat table as ONE block with a constant index map: the
            # Pallas pipeline sees the same block every grid step, DMAs it
            # to VMEM once, and keeps it resident — memory_space=ANY would
            # leave it in HBM and re-copy per step.
            pl.BlockSpec(bvh_fat_shape, lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((block,), lambda i: (i,)),
            pl.BlockSpec((block,), lambda i: (i,)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n + pad,), jnp.float32),
            jax.ShapeDtypeStruct((n + pad,), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((block, stack_cap), jnp.int32)],
        interpret=interpret,
    )(o, d, bvh.fat)
    return t[:n], tri[:n]
