#!/bin/bash
# Unattended sequential TPU measurement queue — pending items as of round 3
# session 4 (NOTES.md).  One TPU process at a time (CLAUDE.md); logs land in
# .hwlogs/ (gitignored).  Run: nohup bash tools/hw_queue.sh & — and KILL the
# whole tree before any other TPU job (incl. the driver's round-end bench).
set -u
cd "$(dirname "$0")/.."
export UPSCALE_TPU_MODEL_PATH=${UPSCALE_TPU_MODEL_PATH:-/root/reference/models}
R=.hwlogs
mkdir -p "$R"
mark() { echo "$(date -u +%H:%M:%S) $1" >> "$R/QUEUE_STATE"; }

mark "hw_queue start"

# Parity sweep refresh incl. the two symmetric-4:2:0 rows (session-4 launch
# failed only because UPSCALE_TPU_MODEL_PATH was not exported).
mark "parity_oracle start"
timeout 1200 python tools/parity_sweep.py --phase oracle \
    > "$R/parity_oracle.log" 2>&1
mark "parity_oracle rc=$?"
mark "parity_tpu start"
timeout 2400 python tools/parity_sweep.py --phase tpu \
    > "$R/parity_tpu.log" 2>&1
mark "parity_tpu rc=$?"

# RDB tile_h A/B at the shipped 392x512 geometry.  CAUTION: the th=32
# compile at this geometry ran >20 min twice (session 4) — budget a
# 45-min timeout and treat compile cost as part of the verdict (th=64
# was disqualified on compile time alone).  If th=56 wins, ship it via
# UPSCALE_TPU_RDB_TILE_H (no code change) + refresh the sidecar below.
mark "rdb_tileh start"
timeout 2700 python tools/rdb_bench.py --size 392x512 --tile_h 32,56 \
    --reps 3 > "$R/rdb_tileh.log" 2>&1
mark "rdb_tileh rc=$?"

# Valar sidecar + headline refresh (the sidecar rides the headline artifact).
mark "valar_bench start"
timeout 2400 python bench.py --models r --verbose > "$R/valar_bench.log" 2>&1
mark "valar_bench rc=$?"
mark "headline start"
timeout 1800 python bench.py --verbose > "$R/headline.log" 2>&1
mark "headline rc=$?"

# Where the remaining ~204 ms/480px Valar tile goes after the RDB kernel.
mark "valar_profile start"
timeout 2400 python tools/valar_profile.py --impl auto \
    > "$R/valar_profile.log" 2>&1
mark "valar_profile rc=$?"

# Batch-depth A/B for the Compact headline (pending since round-3 s2).
mark "batch_ab start"
timeout 1800 python tools/batch_ab.py --batches 4,8 --reps 3 \
    > "$R/batch_ab.log" 2>&1
mark "batch_ab rc=$?"

mark "hw_queue ALL DONE"
