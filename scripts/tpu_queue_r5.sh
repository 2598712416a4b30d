#!/bin/bash
# Round-5 open measurement/engineering queue — what round 4 left on the
# table, highest value first. Round 4 closed: the 327k head-to-head
# (WON, REF_PERF.json), push/block/spp-batch tuning, parts kernel on
# hardware (2.6M/7M), roofline, compaction policy, env importance
# sampling, mid-scale golden, split-table design study (negative).
#
# [DONE ROUND 4 LATE] items 1+2 fell together: the pallas ANY-HIT at
# block 2048 (round-3's 'XLA 5x faster' was a narrow-block artifact) +
# a parts any-hit variant flipped the whole scale sweep — repo now
# 2.76x/2.13x/1.41x faster than reference -O2 at 327k/2.6M/7M.
# Remaining 7M levers if more margin is wanted:
# 1. FURTHER 7M margin (repo wins 1.41x; the resident regime wins 2.8x).
#    Candidate levers, in order of expected value:
#    a. bf16 fat tables for the packet kernel: rows halve -> parts
#       17 -> ~10 (tri ids need an i32 side table — bf16 cannot hold
#       7M ids). Deviation: bf16-quantized geometry can flip winners at
#       ties within ~0.4% — must stay an OPT-IN fast mode with exact
#       refill (the detached-search/differentiable-fill already
#       recomputes exact t for the winner).
#    b. Fewer, bigger leaves via a leaf-merging SAH pass (leaf-bearing
#       nodes carry 5 of 8 slots; merging siblings into full nodes cuts
#       leaf-node count ~1.6x -> fewer pops).
#    c. Per-part ray compaction with REAL shrinking batches (needs a
#       host-side round trip per part — weigh the dispatch latency).
# 2. [DONE] any-hit A/B — see above (+41% at 327k, +92% at 2.6M).
# 3. [PARTIALLY DONE] ACCEL_AB_TPU.json carries a round4_update note
#    with the tuned headline; a full per-accel re-sweep with the round-4 tuned kernel so the
#    committed A/B table reflects the new defaults (today: bvh4 row
#    implicitly 658-944k from round 3; reality is 1.19M).
# 4. Real multi-chip scaling if hardware ever appears (the >=85% ICI
#    criterion is untestable on the 1-chip tunnel; the 8-virtual-device
#    CPU proxy measures host contention — SCALING.json documents this).
# 5. Shade-stage fusion study for the Cornell ceiling (161M of a 165M
#    integrator ceiling): ROOFLINE.json shows the stage is
#    fusion/layout-bound, not FLOP- or mixer-bound; the tool is a
#    profiler trace diff, not another mixer.
set -u
echo "this is a queue DOCUMENT for round 5 — see comments"
