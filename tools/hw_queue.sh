#!/bin/bash
# Unattended sequential TPU measurement queue — round-4 items (VERDICT #1).
# One TPU process at a time (CLAUDE.md); logs land in .hwlogs/ (gitignored).
# Run: nohup bash tools/hw_queue.sh & — and KILL the whole tree before any
# other TPU job (incl. the driver's round-end bench).
#
# bench.py headline/valar runs are NOT here: they run after the round-4
# bench.py rework (median+spread+mfu contract) so the artifacts carry the
# new fields.
set -u
cd "$(dirname "$0")/.."
export UPSCALE_TPU_MODEL_PATH=${UPSCALE_TPU_MODEL_PATH:-/root/reference/models}
R=.hwlogs
mkdir -p "$R"
mark() { echo "$(date -u +%H:%M:%S) $1" >> "$R/QUEUE_STATE"; }

mark "hw_queue(r4) start"

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

# RDB tile_h A/B at the shipped 392x512 geometry.  ADVICE r3: th=56 (the
# actually-pending measurement; 392 = 7x56 exact fit) runs FIRST with its
# own timeout so the pathological th=32 compile cannot starve it.  Then two
# controls decide the Mosaic compile-pathology trigger: th=28 (392 = 14x28,
# tile-aligned) vs th=32 (392/32 = 12.25, ragged padding path).  th=64 was
# already disqualified on compile time (round 3).
mark "rdb_tileh_56 start"
timeout 2400 python tools/rdb_bench.py --size 392x512 --tile_h 56 \
    --reps 3 > "$R/rdb_tileh_56.log" 2>&1
mark "rdb_tileh_56 rc=$?"
mark "rdb_tileh_28 start"
timeout 1800 python tools/rdb_bench.py --size 392x512 --tile_h 28 \
    --reps 3 --skip_parity > "$R/rdb_tileh_28.log" 2>&1
mark "rdb_tileh_28 rc=$?"
mark "rdb_tileh_32 start"
timeout 2700 python tools/rdb_bench.py --size 392x512 --tile_h 32 \
    --reps 3 --skip_parity > "$R/rdb_tileh_32.log" 2>&1
mark "rdb_tileh_32 rc=$?"

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

mark "hw_queue(r4) ALL DONE"
