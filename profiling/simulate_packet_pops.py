"""Per-BLOCK pop counts of the Pallas packet traversal, by push mode.

The packet kernel's wall time is (pops per block) x (per-pop cost): the
per-pop cost was measured on hardware (ablate_pallas_pop.py — ~812ns full,
~half of it the sorting network + serial push chain), but the POP COUNT
side of each mode is hardware-independent, so this host-side simulation
of the exact kernel control flow (accel/pallas_bvh4.py::_traversal_kernel)
ranks the modes without a TPU in the loop:

  fixed   push wanted children in child order, no cull
  sorted  far-to-near sorting network (nearest pops first), no cull
  culled  child-order pushes + pop-time cull (packet-min entry t vs the
          block's max best_t)
  cnear   far-to-near rank offsets + pop-time cull (the round-3 mode)
  cnearb  cnear + per-lane scene-exit bound tightening the cull —
          SIMULATION-ONLY: no kernel implements this mode (its
          numbers are a what-if, not a runnable configuration)

Counts reported per mode: full visits (box+MT+push body), culled pops
(cheap lax.cond skips), and leaf visits (the MT section runs — with
mt_skip=1 internal-only visits skip it).

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
         python profiling/simulate_packet_pops.py [--tris 64000]
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "scenes")


def build_city(target_tris: int):
    from make_fixtures import icosphere

    from craytracer_tpu.accel.bvh4 import build_bvh4

    v, f = icosphere(3)
    per = f.shape[0]
    count = max(1, target_tris // per)
    grid = int(np.ceil(np.sqrt(count)))
    rng = np.random.default_rng(0)
    v0s, v1s, v2s = [], [], []
    n = 0
    for i in range(grid):
        for j in range(grid):
            if n >= count:
                break
            c = np.array([i * 6.0 - 3 * grid, 1.0 + rng.random() * 2,
                          j * 6.0 - 3 * grid])
            w = v * (0.8 + rng.random()) + c
            v0s.append(w[f[:, 0]])
            v1s.append(w[f[:, 1]])
            v2s.append(w[f[:, 2]])
            n += 1
    bvh = build_bvh4(np.concatenate(v0s).astype(np.float32),
                     np.concatenate(v1s).astype(np.float32),
                     np.concatenate(v2s).astype(np.float32))
    return bvh, 2.0 * grid


def gen_rays(n_rays: int, ext: float, incoherent: bool, seed: int = 3):
    rng = np.random.default_rng(seed)
    if incoherent:
        u = rng.uniform(size=(n_rays, 3))
        o = np.stack([(u[:, 0] * 2 - 1) * ext, u[:, 1] * 3.0 + 0.2,
                      (u[:, 2] * 2 - 1) * ext], axis=-1)
        d = rng.normal(size=(n_rays, 3))
    else:
        eye = np.array([0.0, ext * 0.9 + 6.0, ext * 1.8 + 8.0])
        o = np.broadcast_to(eye, (n_rays, 3)).copy()
        tgt = np.stack([rng.uniform(-ext, ext, n_rays),
                        np.ones(n_rays),
                        rng.uniform(-ext, ext, n_rays)], axis=-1)
        d = tgt - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return o.astype(np.float32), d.astype(np.float32)


def simulate_block(fat, o, d, mode: str, k_slots: int, eps=None):
    """One block of rays through the kernel's control flow; numpy lanes."""
    from craytracer_tpu.accel.bvh4 import _FAT_TRI0, _TRI_COLS, WIDTH
    from craytracer_tpu.constants import K_EPSILON

    if eps is None:
        eps = K_EPSILON  # match the kernel's triangle-hit epsilon exactly

    BIG = 3.0e38
    iv = 1.0 / np.where(np.abs(d) < 1e-12, np.where(d < 0, -1e-12, 1e-12), d)
    best_t = np.full(o.shape[0], BIG, np.float32)
    ordered = mode in ("sorted", "cnear", "cnearb")
    cull = mode in ("culled", "cnear", "cnearb")
    bound = np.full(o.shape[0], BIG, np.float32)
    if mode == "cnearb":
        # per-lane scene-exit bound: any acceptable hit lies inside some
        # root child box, so lane i can never accept t beyond its largest
        # hit-child exit; root-missing lanes (incl. parked escape rays)
        # can never accept anything and stop poisoning the cull max
        from craytracer_tpu.accel.bvh4 import WIDTH

        row0 = fat[0]
        bound = np.full(o.shape[0], -BIG, np.float32)
        for c in range(WIDTH):
            lo, hi = row0[c * 3:c * 3 + 3], row0[12 + c * 3:12 + c * 3 + 3]
            t0 = (lo[None, :] - o) * iv
            t1 = (hi[None, :] - o) * iv
            tn = np.minimum(t0, t1).max(axis=1)
            tf = np.maximum(t0, t1).min(axis=1)
            hit = (tn <= tf) & (tf > 0.0)
            bound = np.maximum(bound, np.where(hit, tf * (1 + 1e-5), -BIG))
    stack = [(0, -BIG)]  # (node, packet-min entry t)
    pops = visits = leaf_visits = 0
    while stack:
        node, tn_pack = stack.pop()
        pops += 1
        if cull and tn_pack >= np.minimum(best_t, bound).max():
            continue
        visits += 1
        row = fat[node]
        cands = []
        for c in range(WIDTH):
            lo = row[c * 3:c * 3 + 3]
            hi = row[12 + c * 3:12 + c * 3 + 3]
            t0 = (lo[None, :] - o) * iv
            t1 = (hi[None, :] - o) * iv
            tn = np.minimum(t0, t1).max(axis=1)
            tf = np.maximum(t0, t1).min(axis=1)
            hit = (tn <= tf) & (tf > 0.0) & (tn < best_t)
            child = int(row[24 + c])
            if hit.any():
                cands.append((float(np.where(hit, tn, BIG).min()), child))
        has_leaf = any(row[_FAT_TRI0 + k * _TRI_COLS + 9] >= 0
                       for k in range(k_slots))
        if has_leaf:
            leaf_visits += 1
            for k in range(k_slots):
                b = _FAT_TRI0 + k * _TRI_COLS
                if row[b + 9] < 0:
                    continue
                v0, e1, e2 = row[b:b + 3], row[b + 3:b + 6], row[b + 6:b + 9]
                p = np.cross(d, e2[None, :])
                det = (e1[None, :] * p).sum(1)
                inv = 1.0 / np.where(np.abs(det) < 1e-20, 1e-20, det)
                tv = o - v0[None, :]
                beta = (tv * p).sum(1) * inv
                q = np.cross(tv, e1[None, :])
                gamma = (d * q).sum(1) * inv
                tt = (e2[None, :] * q).sum(1) * inv
                ok = ((beta >= 0) & (gamma >= 0) & (beta + gamma <= 1)
                      & (tt > eps) & (tt < best_t))
                best_t = np.where(ok, tt, best_t)
        wanted = [(ch, tn) for tn, ch in cands if ch >= 0]
        if ordered:  # far-to-near on the stack => nearest pops first
            wanted.sort(key=lambda x: -x[1])
        stack.extend(wanted)
    return pops, visits, leaf_visits


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tris", type=int, default=64000)
    ap.add_argument("--rays", type=int, default=16384)
    ap.add_argument("--block", type=int, default=256)
    args = ap.parse_args()

    bvh, ext = build_city(args.tris)
    fat = np.asarray(bvh.fat)
    k_slots = 4 * bvh.leaf_size
    print(f"# {bvh.n_tris} tris, {fat.shape[0]} nodes, leaf{bvh.leaf_size}",
          file=sys.stderr)

    from craytracer_tpu.ops.raysort import ray_key

    out = {"tris": int(bvh.n_tris), "rays": args.rays, "block": args.block}
    for regime in ("coherent", "incoherent"):
        o, d = gen_rays(args.rays, ext, regime == "incoherent")
        perm = np.argsort(np.asarray(ray_key(o, d)))  # the production sort
        o, d = o[perm], d[perm]
        rows = {}
        for mode in ("fixed", "sorted", "culled", "cnear", "cnearb"):  # cnearb: simulation-only (no kernel mode)
            tot = np.zeros(3, np.int64)
            for b0 in range(0, args.rays, args.block):
                tot += simulate_block(fat, o[b0:b0 + args.block],
                                      d[b0:b0 + args.block], mode, k_slots)
            nb = args.rays // args.block
            rows[mode] = {"pops": round(tot[0] / nb, 1),
                          "visits": round(tot[1] / nb, 1),
                          "leaf_visits": round(tot[2] / nb, 1)}
            print(f"{regime:10s} {mode:7s} pops/block {rows[mode]['pops']:8.1f}"
                  f"  full visits {rows[mode]['visits']:8.1f}"
                  f"  leaf visits {rows[mode]['leaf_visits']:8.1f}",
                  file=sys.stderr)
        out[regime] = rows
    print(json.dumps(out))


if __name__ == "__main__":
    main()
