"""Accelerator A/B on the large-mesh scene: bvh / bvh4 / bvh4q / grid.

VERDICT round-1 item #2/#4: the round-1 accel='auto' choice (bvh4) was made
from CPU timings; this script produces the TPU evidence. Runs bench_mesh.py
once per backend in a subprocess (so each gets a clean compile cache and a
wedged backend cannot take down the others), collects the JSON lines, and
writes ACCEL_AB_TPU.json.

Usage: python bench_accel_ab.py [--tris 327680] [--size 256] [--cpu]
       [--accels bvh,bvh4,bvh4q,grid]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tris", type=int, default=327680)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--accels", default="bvh,bvh4,bvh4q,grid")
    ap.add_argument("--timeout", type=int, default=900)
    ap.add_argument("--spp-batch", type=int, default=8)
    ap.add_argument("--out", default="ACCEL_AB_TPU.json")
    args = ap.parse_args()

    results = []
    for accel in args.accels.split(","):
        cmd = [sys.executable, "bench_mesh.py", "--tris", str(args.tris),
               "--size", str(args.size), "--depth", str(args.depth),
               "--accel", accel, "--spp-batch", str(args.spp_batch)]
        if args.cpu:
            cmd.append("--cpu")
        t0 = time.time()
        try:
            proc = subprocess.run(cmd, capture_output=True, text=True,
                                  timeout=args.timeout)
        except subprocess.TimeoutExpired:
            print(f"# {accel}: TIMEOUT after {args.timeout}s", file=sys.stderr)
            results.append({"accel": accel, "error": "timeout"})
            continue
        line = [l for l in proc.stdout.splitlines() if l.startswith("{")]
        if proc.returncode != 0 or not line:
            print(f"# {accel}: FAILED\n{proc.stderr[-2000:]}", file=sys.stderr)
            results.append({"accel": accel, "error": proc.stderr[-500:]})
            continue
        rec = json.loads(line[-1])
        rec["wall_s"] = round(time.time() - t0, 1)
        results.append(rec)
        print(f"# {accel}: {rec['value']:.3g} rays/s "
              f"(build {rec.get('build_s', '?')}s)", file=sys.stderr)

    ok = [r for r in results if "value" in r]
    payload = {
        "tris": args.tris, "size": args.size, "depth": args.depth,
        "platform": "cpu" if args.cpu else "tpu",
        "results": results,
        "winner": max(ok, key=lambda r: r["value"])["accel"] if ok else None,
    }
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
