"""Microbench: what does one binned-traversal round actually cost on TPU?

Times, via on-device fori loops with forced scalar readback:
  1. trivial while_loop iteration (loop overhead floor)
  2. MT pass [B, L] single reduction (min only)
  3. MT pass [B, L] min + winner-id reduction (the production shape)
  4. candidate pass [B, Tpad]
Usage: python profiling/ablate_binned_round.py [--B 2048] [--L 512]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=3):
    fn(*args, 1).block_until_ready()
    out = []
    for _ in range(iters):
        t0 = time.time()
        float(fn(*args, 200))
        t1 = (time.time() - t0)
        t0 = time.time()
        float(fn(*args, 600))
        t3 = (time.time() - t0)
        if t3 > t1:
            out.append((t3 - t1) / 400)
    return min(out) if out else float("nan")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=2048)
    ap.add_argument("--L", type=int, default=512)
    ap.add_argument("--T", type=int, default=128)
    args = ap.parse_args()
    B, L, T = args.B, args.L, args.T

    key = jax.random.PRNGKey(0)
    o = jax.random.uniform(key, (3, B))
    d = jax.random.normal(jax.random.fold_in(key, 1), (3, B))
    tri = jax.random.uniform(jax.random.fold_in(key, 2), (10, T * L))
    boxes = jax.random.uniform(jax.random.fold_in(key, 3), (6, T))

    @jax.jit
    def loop_floor(x, n):
        def cond(s):
            i, a = s
            return i < n
        def body(s):
            i, a = s
            return i + 1, a + 1.0
        return jax.lax.while_loop(cond, body, (0, x))[1]

    def mt(ts, best_t, with_wid):
        blk = jax.lax.dynamic_slice(tri, (0, ts * L), (10, L))
        ox, oy, oz = o[0][:, None], o[1][:, None], o[2][:, None]
        dx, dy, dz = d[0][:, None], d[1][:, None], d[2][:, None]
        v0x, v0y, v0z = blk[0][None], blk[1][None], blk[2][None]
        e1x, e1y, e1z = blk[3][None], blk[4][None], blk[5][None]
        e2x, e2y, e2z = blk[6][None], blk[7][None], blk[8][None]
        tid = blk[9].astype(jnp.int32)[None]
        px = dy * e2z - dz * e2y
        py = dz * e2x - dx * e2z
        pz = dx * e2y - dy * e2x
        det = e1x * px + e1y * py + e1z * pz
        inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)
        tx, ty, tz = ox - v0x, oy - v0y, oz - v0z
        beta = (tx * px + ty * py + tz * pz) * inv_det
        qx = ty * e1z - tz * e1y
        qy = tz * e1x - tx * e1z
        qz = tx * e1y - ty * e1x
        gamma = (dx * qx + dy * qy + dz * qz) * inv_det
        tt = (e2x * qx + e2y * qy + e2z * qz) * inv_det
        ok = ((beta >= 0) & (gamma >= 0) & (beta + gamma <= 1)
              & (tt > 1e-4) & (tt < best_t[:, None]))
        val = jnp.where(ok, tt, 3e38)
        won = jnp.min(val, axis=1)
        if not with_wid:
            return won, jnp.zeros((B,), jnp.int32)
        wid = jnp.min(jnp.where(val == won[:, None], tid, 1 << 30), axis=1)
        return won, wid

    def make_mt_loop(with_wid):
        @jax.jit
        def f(x, n):
            def body(i, s):
                bt, acc = s
                won, wid = mt(i % T, bt, with_wid)
                return jnp.minimum(bt, won + x), acc + wid.sum()
            bt = jnp.full((B,), 3e38)
            bt, acc = jax.lax.fori_loop(0, n, body, (bt, jnp.zeros((), jnp.int32)))
            return bt.sum() + acc
        return f

    @jax.jit
    def cand_loop(x, n):
        ox, oy, oz = o[0][:, None], o[1][:, None], o[2][:, None]
        ivx = 1.0 / d[0][:, None]
        ivy = 1.0 / d[1][:, None]
        ivz = 1.0 / d[2][:, None]
        iota_t = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)
        def body(i, a):
            t0x = (boxes[0][None] - ox) * ivx
            t1x = (boxes[3][None] - ox) * ivx
            t0y = (boxes[1][None] - oy) * ivy
            t1y = (boxes[4][None] - oy) * ivy
            t0z = (boxes[2][None] - oz) * ivz
            t1z = (boxes[5][None] - oz) * ivz
            tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                         jnp.minimum(t0y, t1y)),
                             jnp.minimum(t0z, t1z))
            tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                         jnp.maximum(t0y, t1y)),
                             jnp.maximum(t0z, t1z))
            needed = (tn <= tf) & (tf > 0) & (iota_t > i - x)
            c = jnp.min(jnp.where(needed, iota_t, T), axis=1)
            return a + c.sum()
        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.int32))

    x0 = jnp.zeros(())
    print(f"B={B} L={L} T={T}")
    print(f"while-loop floor: {timeit(loop_floor, x0) * 1e6:8.1f} us/iter")
    print(f"MT min-only:      {timeit(make_mt_loop(False), x0) * 1e6:8.1f} us/iter")
    print(f"MT min+wid:       {timeit(make_mt_loop(True), x0) * 1e6:8.1f} us/iter")
    print(f"candidate pass:   {timeit(cand_loop, jnp.zeros((), jnp.int32)) * 1e6:8.1f} us/iter")


if __name__ == "__main__":
    main()
