"""What does ONE pop cost in the Pallas packet traversal kernel?

The block-size/leaf-size sweeps (bench_pallas_traversal.py) plateau at
~1.0M rays/s no matter how the pop count vs per-pop VPU work is traded,
which smells like a large FIXED per-pop cost. This microbench walks a
PRELOADED stack of P pseudo-random node ids (no pushes, so the trip
count is exactly P) and times variants of the loop body:

  empty    pop + consume the node id, nothing else
  rowload  pop + load the 128-col fat row, consume col 0
  cols     rowload + extract all 108 scalar columns (sum them)
  colsdir  like cols but each column is a DIRECT fat_ref[node, j]
           scalar load (no row-vector extract)
  box      rowload + the 4-child slab test over the lanes
  mt       rowload + the 8-slot Moller-Trumbore over the lanes
  full     box + mt + the far-to-near push sorting network (pushes
           masked off so the trip count stays P)

Per-pop time = slope over P (two trip counts, same compile), per block.
Run on TPU: python profiling/ablate_pallas_pop.py [--block 256]
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WIDTH = 4
K_SLOTS = 8
FATW = 128
_BIG = 3.0e38


def make_kernel(mode: str, pops: int, m_nodes: int):
    def kernel(o_ref, d_ref, fat_ref, t_ref, stack_ref):
        ox, oy, oz = o_ref[0, :], o_ref[1, :], o_ref[2, :]
        dx, dy, dz = d_ref[0, :], d_ref[1, :], d_ref[2, :]
        ivx, ivy, ivz = 1.0 / dx, 1.0 / dy, 1.0 / dz

        def fill(i, _):
            # LCG walk over node ids — defeats any trivial load CSE
            stack_ref[i] = (i * 1103515245 + 12345) % m_nodes
            return 0

        jax.lax.fori_loop(0, pops, fill, 0)

        def cond(state):
            sp, *_ = state
            return sp > 0

        def body(state):
            sp, best_t, acc = state
            node = stack_ref[sp - 1]
            sp = sp - 1
            if mode == "empty":
                return sp, best_t, acc + node
            row = fat_ref[node, :]
            col = lambda j: row[j]  # noqa: E731
            if mode == "colsdir":
                col = lambda j: fat_ref[node, j]  # noqa: E731
            if mode == "rowload":
                return sp, best_t, acc + col(0).astype(jnp.int32)
            if mode in ("cols", "colsdir"):
                s = col(0)
                for j in range(1, 108):
                    s = s + col(j)
                return sp, best_t, acc + s.astype(jnp.int32)

            if mode in ("box", "full"):
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
                    tn_c.append(jnp.min(jnp.where(lane_hit, tn, _BIG)))
                    hit_any_c.append(jnp.any(lane_hit))
                    child_c.append(col(24 + c).astype(jnp.int32))

            if mode in ("mt", "full"):
                for k in range(K_SLOTS):
                    b = 28 + k * 10
                    v0x, v0y, v0z = col(b + 0), col(b + 1), col(b + 2)
                    e1x, e1y, e1z = col(b + 3), col(b + 4), col(b + 5)
                    e2x, e2y, e2z = col(b + 6), col(b + 7), col(b + 8)
                    tid = col(b + 9).astype(jnp.int32)
                    px = dy * e2z - dz * e2y
                    py = dz * e2x - dx * e2z
                    pz = dx * e2y - dy * e2x
                    det = e1x * px + e1y * py + e1z * pz
                    inv_det = 1.0 / det
                    tx, ty, tz = ox - v0x, oy - v0y, oz - v0z
                    beta = (tx * px + ty * py + tz * pz) * inv_det
                    qx = ty * e1z - tz * e1y
                    qy = tz * e1x - tx * e1z
                    qz = tx * e1y - ty * e1x
                    gamma = (dx * qx + dy * qy + dz * qz) * inv_det
                    tt = (e2x * qx + e2y * qy + e2z * qz) * inv_det
                    ok = ((tid >= 0) & (beta >= 0.0) & (gamma >= 0.0)
                          & (beta + gamma <= 1.0) & (tt > 1e-4)
                          & (tt < best_t))
                    best_t = jnp.where(ok, tt, best_t)

            if mode == "full":
                key = [jnp.where(hit_any_c[c] & (child_c[c] >= 0),
                                 tn_c[c], -_BIG) for c in range(WIDTH)]
                cval = [jnp.where(hit_any_c[c] & (child_c[c] >= 0),
                                  child_c[c], -1) for c in range(WIDTH)]
                for (i, j) in ((0, 1), (2, 3), (0, 2), (1, 3), (1, 2)):
                    do = key[i] < key[j]
                    ki = jnp.where(do, key[j], key[i])
                    kj = jnp.where(do, key[i], key[j])
                    vi = jnp.where(do, cval[j], cval[i])
                    vj = jnp.where(do, cval[i], cval[j])
                    key = [ki if s == i else kj if s == j else key[s]
                           for s in range(WIDTH)]
                    cval = [vi if s == i else vj if s == j else cval[s]
                            for s in range(WIDTH)]
                for k in range(WIDTH):
                    # push masked OFF (never taken) so trips stay == pops,
                    # but the scalar chain is real
                    push = (cval[k] >= 0) & (sp < 0)
                    stack_ref[jnp.where(push, sp, 0)] = jnp.where(
                        push, cval[k], stack_ref[0])
                    sp = sp + push.astype(jnp.int32)
                acc = acc + cval[0]

            return sp, best_t, acc

        n = ox.shape[0]
        sp, best_t, acc = jax.lax.while_loop(
            cond, body,
            (jnp.int32(pops), jnp.full((n,), _BIG, jnp.float32),
             jnp.int32(0)))
        t_ref[0, :] = best_t + acc.astype(jnp.float32)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("mode", "pops", "block", "blocks"))
def run(fat, o, d, mode, pops, block, blocks):
    return pl.pallas_call(
        make_kernel(mode, pops, fat.shape[0]),
        grid=(blocks,),
        in_specs=[
            pl.BlockSpec((3, block), lambda i: (0, i)),
            pl.BlockSpec((3, block), lambda i: (0, i)),
            pl.BlockSpec(fat.shape, lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((1, blocks * block), jnp.float32),
        scratch_shapes=[pltpu.SMEM((8192,), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
    )(o.T, d.T, fat)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--block", type=int, default=256)
    ap.add_argument("--blocks", type=int, default=32)
    ap.add_argument("--nodes", type=int, default=20000)
    ap.add_argument("--pops", type=int, default=512)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    fat = jnp.asarray(rng.random((args.nodes, FATW), np.float32) + 0.5)
    n = args.blocks * args.block
    o = jnp.asarray(rng.random((n, 3), np.float32))
    d = jnp.asarray(rng.random((n, 3), np.float32) + 0.1)

    out = {"block": args.block, "blocks": args.blocks}
    for mode in ("empty", "rowload", "cols", "colsdir", "box", "mt", "full"):
        per_pop = None
        # slope over two static trip counts, same inputs
        for rep in range(2):
            ts = []
            for p in (args.pops, 3 * args.pops):
                r = run(fat, o + 1e-6 * rep, d, mode, p,
                        args.block, args.blocks)
                float(r.sum())  # warm/compile
                t0 = time.time()
                float(run(fat, o + 1e-5 * rep, d, mode, p,
                          args.block, args.blocks).sum())
                ts.append(time.time() - t0)
            dt = (ts[1] - ts[0]) / (2 * args.pops) / args.blocks
            per_pop = dt if per_pop is None else min(per_pop, dt)
        out[mode] = round(per_pop * 1e9, 1)
        print(f"# {mode}: {out[mode]} ns/pop/block", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
