#!/bin/bash
# Round-4 follow-up chip sequence (after tools/hw_queue.sh drained):
#  1. th=28 at the shipped 392x512 geometry WITH hardware parity (the
#     queue's th=28 run used --skip_parity; it is now the auto default);
#  2. valar_profile --impl auto (the queue's attempt died to the 64-lane
#     experiment, since reverted);
#  3. Valar sidecar refresh (bench -m r picks auto tile_h=28 at the
#     shipped fit-tile geometry);
#  4. headline bench TWICE in one session (round-3 verdict item 2: decide
#     whether r03's 21.1 vs r02's 24.8 was regression or tunnel noise).
set -u
cd "$(dirname "$0")/.."
export UPSCALE_TPU_MODEL_PATH=${UPSCALE_TPU_MODEL_PATH:-/root/reference/models}
R=.hwlogs
mkdir -p "$R"
mark() { echo "$(date -u +%H:%M:%S) $1" >> "$R/QUEUE_STATE"; }

mark "hw_queue2(r4) start"

mark "rdb28_parity start"
timeout 2400 python tools/rdb_bench.py --size 392x512 --tile_h 28 \
    --reps 3 > "$R/rdb28_parity.log" 2>&1
mark "rdb28_parity rc=$?"

mark "valar_profile2 start"
timeout 2400 python tools/valar_profile.py --impl auto \
    > "$R/valar_profile2.log" 2>&1
mark "valar_profile2 rc=$?"

mark "bench_valar start"
timeout 3000 python bench.py --models r --verbose \
    > "$R/bench_valar.log" 2>&1
mark "bench_valar rc=$?"

mark "bench_headline_1 start"
timeout 1800 python bench.py --verbose > "$R/bench_headline_1.log" 2>&1
mark "bench_headline_1 rc=$?"
mark "bench_headline_2 start"
timeout 1800 python bench.py --verbose > "$R/bench_headline_2.log" 2>&1
mark "bench_headline_2 rc=$?"

mark "hw_queue2(r4) ALL DONE"
