#!/bin/bash
# Measure the reference binary's render throughput on a scene: run it
# headless, harvest ITS OWN timing and ray counters (main.cpp:319-334
# prints total render seconds, intersect_call_count and
# shadow_intersect_call_count; rays/s = (closest + shadow) / seconds —
# the same two counters bench_mesh.py sums on the repo side).
#
# Bounded retry is load-bearing: the reference nondeterministically
# wedges inside its render worker on OBJECT MESH scenes (see
# run_ref_golden.sh). A try only counts when the final printout appears.
#
# Usage: run_ref_perf.sh <binary> <scene.txt> <out.json> [spp] [depth] [accel] [tries] [timeout_s]
set -u
BIN=$(realpath "$1"); SCENE=$(realpath "$2"); OUT=$(realpath -m "$3")
SPP=${4:-16}; DEPTH=${5:-4}; ACCEL=${6:-BVH4}; TRIES=${7:-6}; TMO=${8:-1800}
WORK=$(mktemp -d)
trap 'rm -rf "$WORK"' EXIT
cp "$SCENE" "$WORK/scene.txt"
for f in "$(dirname "$SCENE")"/*.obj; do
    [ -e "$f" ] && ln -s "$f" "$WORK/" 2>/dev/null
done
cat > "$WORK/config.txt" <<CFG
scene_file scene.txt
num_samples $SPP
num_sample_sets 83
max_depth $DEPTH
trace_type PATHTRACE
accel_struct $ACCEL
image_save no
CFG
cd "$WORK"
for i in $(seq 1 "$TRIES"); do
    echo "-- try $i ($BIN, spp=$SPP depth=$DEPTH accel=$ACCEL)" >&2
    timeout "$TMO" "$BIN" > run.log 2>&1
    if grep -q "shadow_intersect_call_count" run.log; then
        python3 - "$OUT" "$BIN" "$SPP" "$DEPTH" "$ACCEL" <<'PY'
import json, re, sys
log = open("run.log").read()
sec = float(re.search(r"([0-9.]+) seconds\.", log).group(1))
ic = int(re.search(r"intersect_call_count = (\d+)", log).group(1))
sc = int(re.search(r"shadow_intersect_call_count = (\d+)", log).group(1))
trav = re.search(r"Traversal time = ([0-9.]+)", log)
out = {"binary": sys.argv[2].split("/")[-1], "spp": int(sys.argv[3]),
       "depth": int(sys.argv[4]), "accel": sys.argv[5],
       "render_s": sec, "closest_rays": ic, "shadow_rays": sc,
       "rays_per_sec": round((ic + sc) / sec, 1),
       "traversal_s": float(trav.group(1)) if trav else None}
json.dump(out, open(sys.argv[1], "w"), indent=1)
print(json.dumps(out))
PY
        rc=$?
        # main.cpp force-sets image_save=true and writes output.ppm —
        # keep it next to the JSON so views can be compared by eye
        [ -s output.ppm ] && cp output.ppm "${OUT%.json}.ppm"
        [ -s savestate.is ] && cp savestate.is "${OUT%.json}.is"
        exit $rc
    fi
    tail -2 run.log >&2
done
echo "FAILED after $TRIES tries" >&2
exit 1
