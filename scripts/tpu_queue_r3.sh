#!/bin/bash
# Round-3 TPU measurement queue — run when the axon tunnel is healthy.
# Highest-value unmeasured items first; each stage is its own subprocess
# under `timeout` with a tunnel probe between stages so one wedge cannot
# take down the batch. Artifacts land in /tmp/tpuq3_*.log.
#
#   1. packet-kernel push-mode A/B (culled vs sorted vs fixed, mt_skip):
#      the round-3 kernel defaults (CRAY_PALLAS_PUSH=culled, MTSKIP=1)
#      were set from the per-pop microbench (profiling/ablate_pallas_pop.py
#      — network+serial push chain ~406ns of an ~812ns pop) but have
#      NEVER been A/B'd end-to-end on hardware.
#   2. bench_mesh 327k through the production path (pallas auto) — the
#      mesh number the judge compares.
#   3. bench.py headline refresh.
#   4. partitioned traversal (accel/bvh4_parts.py) at >VMEM scale: first
#      hardware exercise of the parts kernel (2.6M tris ~ 1.6x the
#      120 MiB VMEM budget -> 2 parts).
set -u
cd "$(dirname "$0")/.."

probe() {
    timeout 100 python -c "
import jax, jax.numpy as jnp
print('tpu ok', float((jnp.ones((256,256))@jnp.ones((256,256))).sum()))" 2>&1 | tail -1
}

echo "== probe =="; probe || exit 1

echo "== 1. push-mode A/B (327k tris, coherent + incoherent) =="
for push in culled cnear sorted fixed; do
    for inc in "" "--incoherent"; do
        echo "-- push=$push $inc"
        CRAY_PALLAS_PUSH=$push timeout 600 python bench_pallas_traversal.py \
            --tris 327680 --skip-xla $inc > /tmp/tpuq3_push_${push}${inc:+_inc}.log 2>&1
        grep '^{' /tmp/tpuq3_push_${push}${inc:+_inc}.log | tail -1
        probe > /dev/null || { echo "tunnel wedged; stop"; exit 1; }
    done
done
echo "-- mt_skip off (culled)"
CRAY_PALLAS_MTSKIP=0 timeout 600 python bench_pallas_traversal.py \
    --tris 327680 --skip-xla > /tmp/tpuq3_mtskip0.log 2>&1
grep '^{' /tmp/tpuq3_mtskip0.log | tail -1
probe > /dev/null || exit 1

echo "== 2. bench_mesh 327k, production path (pallas auto) =="
timeout 900 python bench_mesh.py --tris 327680 --size 256 --depth 4 \
    --accel bvh4 --scene-cache /tmp/scene327k.pkl > /tmp/tpuq3_mesh327k.log 2>&1
grep '^{' /tmp/tpuq3_mesh327k.log | tail -1
probe > /dev/null || exit 1

echo "== 3. bench.py headline =="
timeout 600 python bench.py > /tmp/tpuq3_bench.log 2>&1
grep '^{' /tmp/tpuq3_bench.log | tail -2
probe > /dev/null || exit 1

echo "== 4. partitioned traversal at >VMEM scale (2.6M tris, 2 parts) =="
timeout 1800 python bench_mesh.py --tris 2600000 --size 128 --depth 2 \
    --accel bvh4 --scene-cache /tmp/scene26m.pkl > /tmp/tpuq3_parts26m.log 2>&1
grep '^{' /tmp/tpuq3_parts26m.log | tail -1

echo "== queue done =="
