#!/bin/bash
# Round-3 TPU measurement queue — phase 1: re-measure the Pallas matrix
# (the previous session's results were lost to an API error) and the
# spp-batch A/B on the mesh bench. Each run has its own timeout + a
# tunnel probe between runs.
set -u
cd "$(dirname "$0")/.."

probe() {
    timeout 100 python -c "
import jax, jax.numpy as jnp
print('tpu ok', float((jnp.ones((256,256))@jnp.ones((256,256))).sum()))" 2>&1 | tail -1
}

echo "== probe =="; probe || exit 1

echo "== 1. Pallas matrix (64k tris) =="
for cfg in "--sort --block 2048" "--block 2048" \
           "--incoherent --sort --block 2048" "--incoherent --block 2048"; do
    tag=$(echo "$cfg" | tr -d '- ' )
    echo "-- pallas $cfg"
    timeout 500 python bench_pallas_traversal.py --tris 64000 $cfg \
        > /tmp/r3_pallas_$tag.log 2>&1
    grep '^{' /tmp/r3_pallas_$tag.log | tail -1
    probe > /dev/null || { echo "-- tunnel wedged; stop"; exit 1; }
done

echo "== 2. spp-batch A/B on the 327k mesh (latency-flat gather => ~free) =="
for B in 1 4 8; do
    timeout 900 python bench_mesh.py --tris 327680 --size 256 --depth 4 \
        --accel bvh4 --spp-batch $B --scene-cache /tmp/scene327k.pkl \
        > /tmp/r3_sppb$B.log 2>&1
    grep '^{' /tmp/r3_sppb$B.log | tail -1
    probe > /dev/null || { echo "-- tunnel wedged; stop"; exit 1; }
done
echo "== queue r3 phase 1 done =="
