#!/bin/bash
# Round-2 TPU measurement queue — run when the axon tunnel is healthy.
# Each phase runs in its own subprocess with a timeout so one wedge
# cannot take down the batch. Artifacts land in /tmp/tpuq_*.log and the
# repo JSON files.
set -u
cd "$(dirname "$0")/.."

probe() {
    timeout 100 python -c "
import jax, jax.numpy as jnp
print('tpu ok', float((jnp.ones((256,256))@jnp.ones((256,256))).sum()))" 2>&1 | tail -1
}

echo "== probe =="; probe || exit 1

echo "== 1. fat-gather vs table size (the 7M-hang suspect) =="
timeout 500 python profiling/ablate_fat_gather.py --rows 2000000 \
    > /tmp/tpuq_gather2m.log 2>&1
tail -5 /tmp/tpuq_gather2m.log

echo "== 2. spp-batch A/B on the 327k mesh =="
for B in 1 4; do
    timeout 500 python bench_mesh.py --tris 327680 --size 256 --depth 4 \
        --accel bvh4 --spp-batch $B > /tmp/tpuq_sppb$B.log 2>&1
    grep '^{' /tmp/tpuq_sppb$B.log | tail -1
done

echo "== 2b. Pallas traversal A/B (VMEM kernel vs XLA; sort x block) =="
for cfg in "" "--incoherent" "--incoherent --sort" \
           "--incoherent --sort --block 512" "--block 512"; do
    echo "-- pallas $cfg"
    timeout 500 python bench_pallas_traversal.py --tris 64000 $cfg \
        > /tmp/tpuq_pallas.log 2>&1
    grep '^{' /tmp/tpuq_pallas.log | tail -1
    probe > /dev/null || { echo "-- tunnel wedged after pallas; stop"; exit 1; }
done

echo "== 3. bench.py (Cornell headline) =="
timeout 500 python bench.py > /tmp/tpuq_bench.log 2>&1
grep '^{' /tmp/tpuq_bench.log | tail -1

echo "== 4. 7M-tri staged retry (scene cache) =="
if [ -f /tmp/scene7m.pkl ]; then
    for cfg in "--size 64 --depth 1 --iters 1" \
               "--size 128 --depth 2 --iters 1" \
               "--size 256 --depth 4 --iters 1 --image gallery/mesh_7m_scale.png"; do
        echo "-- 7M $cfg"
        timeout 900 python bench_mesh.py --tris 7000000 --accel bvh4 \
            --scene-cache /tmp/scene7m.pkl $cfg \
            > /tmp/tpuq_7m.log 2>&1
        grep -E '^{|^# ' /tmp/tpuq_7m.log | tail -3
        grep -q '^{' /tmp/tpuq_7m.log || { echo "-- 7M stage failed; stop"; break; }
        probe || { echo "-- tunnel wedged; stop"; exit 1; }
    done
else
    echo "no /tmp/scene7m.pkl cache; skipping"
fi
echo "== queue done =="
