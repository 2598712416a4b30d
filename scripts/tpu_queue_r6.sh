#!/bin/bash
# Round-6 open queue — what round 5 left on the table, highest value first.
# Round 5 closed: EVERY VERDICT-r4 item (Cornell unloseable at 383M via
# the fused-shade -> whole-bounce -> whole-PASS megakernel ladder; 7M
# bf16/compaction measured negatives via the part-count probe; textured
# golden #6 with reference-exact texel/spherical conventions; NaN retrace
# wired; ACCEL_AB restructured; env importance A/B + estimator-gated
# default; fullscene_xl 2.67M-tri full-fidelity artifact) plus the
# Cornell head-to-head (97.5x wall vs reference -O2 best-accel).
#
# 1. MEGAKERNEL HEADROOM: 383M vs ~2x compute-bound estimate (57ms/16
#    passes; VPU-work ~1.3ms/pass vs 3.1ms measured). Levers: fuse the
#    camera raygen + film jitter into the pass kernel's bounce-0 (saves
#    the 0.4ms/pass external raygen + 6 HBM rows), per-bounce early-exit
#    when a whole BLOCK is dead (late bounces are <15% alive; needs a
#    block-level vote like pallas_bvh4's early-exit), and re-checking
#    block 4096 vs 8192 cross-session. Measured negatives to not repeat:
#    blocks >=16384 regress (354M@16k -> 220M@262k).
# 2. FAST-PATH COVERAGE: add PLASTIC (two-lobe sample + FB NEE) and
#    sphere AREA LIGHTS to the shade core -> parity_mix-class scenes take
#    the fast path; add planes/disks/aaboxes to the prim table. Gate
#    stays exact-math-parity: every extension needs the interpret A/B
#    vs the XLA step (tests/test_pallas_shade.py pattern).
# 3. MESH-SCALE SHADE: at 327k+ tris the step is traversal-bound (fused
#    shade measured flat, bench_mesh 1.41M). The open traversal lever
#    remains incoherent-ray trip-count reduction (block-union pops).
# 4. Real multi-chip scaling if hardware appears (>=85% ICI criterion
#    untestable on the 1-chip tunnel; see README wording).
# 5. The reference binary's nondeterministic mesh-scene hang: never
#    diagnosed (refbuild retry harness works around it).
set -u
echo "this is a queue DOCUMENT for round 6 — see comments"
