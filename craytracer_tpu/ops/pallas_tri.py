"""Pallas TPU kernel: batched ray x triangle intersection.

The hot pair-test of the wavefront tracer (SURVEY.md §2 #8/#9 [native-perf]:
the batched form of `calcTriangleIntersect4`, shapes/triangle.cpp:81-151) as
a hand-tiled TPU kernel:

* rays are tiled over the grid (one program per ray tile), components in
  SoA layout [6, N] (ox, oy, oz, dx, dy, dz) so every load is a full lane
  vector;
* triangles live VMEM-resident in SoA layout [9, T] (v0, e1, e2 components),
  streamed tile-by-tile through a fori loop inside the program — no [N, T]
  intermediate ever touches HBM;
* each (ray-tile, tri-tile) step evaluates Moller-Trumbore on an
  [TN, TC] block on the VPU and folds the running (min-t, argmin) pair.

Returns (t[N], tri_idx[N]); t = TMAX and idx = -1 on miss. The XLA-fused
`triangle_ts` path remains the fallback (and the autodiff path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from craytracer_tpu.constants import K_EPSILON, TMAX

RAY_TILE = 1024
TRI_TILE = 128


def _kernel(rays_ref, tris_ref, t_ref, idx_ref, *, num_tris: int):
    ox = rays_ref[0, :]
    oy = rays_ref[1, :]
    oz = rays_ref[2, :]
    dx = rays_ref[3, :]
    dy = rays_ref[4, :]
    dz = rays_ref[5, :]

    n_chunks = pl.cdiv(num_tris, TRI_TILE)

    def body(c, carry):
        best_t, best_i = carry
        base = c * TRI_TILE
        tv = tris_ref[:, pl.ds(base, TRI_TILE)]  # [9, TC]
        v0x, v0y, v0z = tv[0, :], tv[1, :], tv[2, :]
        e1x, e1y, e1z = tv[3, :], tv[4, :], tv[5, :]
        e2x, e2y, e2z = tv[6, :], tv[7, :], tv[8, :]

        # pvec = d x e2  -> [TN, TC]
        px = dy[:, None] * e2z[None, :] - dz[:, None] * e2y[None, :]
        py = dz[:, None] * e2x[None, :] - dx[:, None] * e2z[None, :]
        pz = dx[:, None] * e2y[None, :] - dy[:, None] * e2x[None, :]
        det = e1x[None, :] * px + e1y[None, :] * py + e1z[None, :] * pz
        inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)
        tx = ox[:, None] - v0x[None, :]
        ty = oy[:, None] - v0y[None, :]
        tz = oz[:, None] - v0z[None, :]
        beta = (tx * px + ty * py + tz * pz) * inv_det
        # qvec = tvec x e1
        qx = ty * e1z[None, :] - tz * e1y[None, :]
        qy = tz * e1x[None, :] - tx * e1z[None, :]
        qz = tx * e1y[None, :] - ty * e1x[None, :]
        gamma = (dx[:, None] * qx + dy[:, None] * qy + dz[:, None] * qz) * inv_det
        tt = (e2x[None, :] * qx + e2y[None, :] * qy + e2z[None, :] * qz) * inv_det

        tri_ids = base + jax.lax.broadcasted_iota(jnp.int32, (RAY_TILE, TRI_TILE), 1)
        ok = (
            (beta >= 0.0) & (gamma >= 0.0) & (beta + gamma <= 1.0)
            & (tt > K_EPSILON) & (tri_ids < num_tris)
        )
        tt = jnp.where(ok, tt, TMAX)
        chunk_t = jnp.min(tt, axis=1)
        chunk_arg = jnp.argmin(tt, axis=1).astype(jnp.int32) + base
        better = chunk_t < best_t
        return (jnp.where(better, chunk_t, best_t),
                jnp.where(better, chunk_arg, best_i))

    init = (jnp.full((RAY_TILE,), TMAX, jnp.float32),
            jnp.full((RAY_TILE,), -1, jnp.int32))
    best_t, best_i = jax.lax.fori_loop(0, n_chunks, body, init)
    t_ref[:] = best_t
    idx_ref[:] = jnp.where(best_t < TMAX, best_i, -1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_triangle_closest(o, d, tri_soa, interpret: bool = False):
    """o, d: [N, 3]; tri_soa: [9, T] f32 (v0x..z, e1x..z, e2x..z), T padded
    to a TRI_TILE multiple (pad with degenerate tris). Returns (t[N], idx[N]).
    """
    n = o.shape[0]
    num_tris = tri_soa.shape[1]
    n_pad = -(-n // RAY_TILE) * RAY_TILE
    rays = jnp.concatenate([o.T, d.T], axis=0)  # [6, N]
    if n_pad != n:
        rays = jnp.pad(rays, ((0, 0), (0, n_pad - n)))

    t, idx = pl.pallas_call(
        functools.partial(_kernel, num_tris=num_tris),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad,), jnp.float32),
            jax.ShapeDtypeStruct((n_pad,), jnp.int32),
        ),
        grid=(n_pad // RAY_TILE,),
        in_specs=[
            pl.BlockSpec((6, RAY_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((9, tri_soa.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((RAY_TILE,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_TILE,), lambda i: (i,), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(rays, tri_soa)
    return t[:n], idx[:n]


def pack_triangles(v0, v1, v2):
    """[T,3] vertices -> padded [9, T'] SoA for the kernel."""
    import numpy as np

    t = v0.shape[0]
    t_pad = max(TRI_TILE, -(-t // TRI_TILE) * TRI_TILE)
    out = np.zeros((9, t_pad), np.float32)
    e1 = np.asarray(v1, np.float32) - np.asarray(v0, np.float32)
    e2 = np.asarray(v2, np.float32) - np.asarray(v0, np.float32)
    out[0:3, :t] = np.asarray(v0, np.float32).T
    out[3:6, :t] = e1.T
    out[6:9, :t] = e2.T
    return jnp.asarray(out)
