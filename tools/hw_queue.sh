#!/bin/bash
# Unattended sequential TPU measurement queue — round-5 items (VERDICT r4).
# One TPU process at a time (CLAUDE.md); logs land in .hwlogs/ (gitignored).
# Run: nohup bash tools/hw_queue.sh & — and KILL the whole tree before any
# other TPU job (incl. the driver's round-end bench).
#
# Phase 2 (winner refresh: bf16 Valar sidecar with the measured im2col
# mode, vsr-test-chips -m r tile sweep) launches MANUALLY after reading
# phase-1 results — the winner selection needs a human/agent in the loop.
set -u
cd "$(dirname "$0")/.."
PHASE="${1:-1}"
# Host resets wipe the editable install; scripts under tools/ then can't
# import the package (script dir != repo root).  PREPEND the repo root —
# never overwrite PYTHONPATH, the axon PJRT plugin rides it (NOTES r4s4).
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
export UPSCALE_TPU_MODEL_PATH=${UPSCALE_TPU_MODEL_PATH:-/root/reference/models}
R=.hwlogs
mkdir -p "$R"
mark() { echo "$(date -u +%H:%M:%S) $1" >> "$R/QUEUE_STATE"; }

if [ "$PHASE" = "2" ]; then
  # Phase 2 — re-run the pack12/row3 arms on the FIXED kernel (phase-1
  # arms b/c ran 19 min before the 2D-reshape fix commit c3ab3e9 landed;
  # .hwlogs/rdb_ablate_{b,c}_r5.log show the pre-fix Mosaic
  # offset-mismatch failure), plus the slab frame-mask hardware A/B
  # (9c16e25 — interpret-bit-exact, needs one hardware run before any
  # default flip).  xla-scatter + rdb:48 ride along as in-session
  # baselines (both persistent-cache-warm after phase 1).
  mark "hw_queue(r5p2) start"
  mark "p2_pack12 start"
  timeout 7200 python tools/rdb_bench.py --size 576x512 --tile_w 512 \
      --impls xla-scatter,rdb:48,rdb:48:pack12 \
      --reps 3 --compile_budget 2700 > "$R/rdb_p2_pack12_r5.log" 2>&1
  mark "p2_pack12 rc=$?"
  mark "p2_row3 start"
  timeout 9000 python tools/rdb_bench.py --size 576x512 --tile_w 512 \
      --impls xla-scatter,rdb:48,rdb:48:row3h,rdb:48:row3 \
      --reps 3 --compile_budget 2700 > "$R/rdb_p2_row3_r5.log" 2>&1
  mark "p2_row3 rc=$?"
  mark "p2_slab start"
  timeout 7200 python tools/rdb_bench.py --size 576x512 --tile_w 512 \
      --impls xla-scatter,rdb:48,rdb:48:slab \
      --reps 3 --compile_budget 2700 > "$R/rdb_p2_slab_r5.log" 2>&1
  mark "p2_slab rc=$?"
  mark "hw_queue(r5p2) done"
  exit 0
fi

if [ "$PHASE" = "2b" ]; then
  # Phase 2b — the decisive default-flip A/B after phase 2's single-lever
  # results.  Slab is DROPPED: its Mosaic compile blew the 2700s budget
  # at the shipped geometry (rdb_p2_slab_r5.log) — compile-pathological,
  # refuted on compile cost alone (the th=64 precedent).  What remains is
  # rdb:48 (patch9) vs rdb:48:row3h head-to-head at reps=5 against the
  # observed session-to-session baseline drift (2.58..3.29 ms/RDB);
  # both impls are compile-cache-warm from phase 2 (kernel file
  # untouched since).  xla-scatter rides as the scale anchor.
  mark "hw_queue(r5p2b) start"
  mark "p2b_combo start"
  timeout 7200 python tools/rdb_bench.py --size 576x512 --tile_w 512 \
      --impls xla-scatter,rdb:48,rdb:48:row3h \
      --reps 5 --compile_budget 2700 > "$R/rdb_p2b_combo_r5.log" 2>&1
  mark "p2b_combo rc=$?"
  mark "hw_queue(r5p2b) done"
  exit 0
fi

if [ "$PHASE" = "3" ]; then
  # Phase 3 — product-facing refreshes AFTER the phase-2 winners are
  # folded into the defaults (any kernel-file commit invalidates the
  # whole compile cache — NOTES r5s3 — so these runs pay one cold
  # compile per geometry and re-warm the cache the driver's round-end
  # bench will ride).
  mark "hw_queue(r5p3) start"
  # (a) vsr-test-chips -m r tile sweep: the hardware table VERDICT item
  #     6 asks for, via the PRODUCT calibration tool (3 tile specs x 2
  #     depths; synthetic Valar — upstream .bin is absent).
  mark "p3_tilesweep start"
  timeout 10800 python -m upscale_video_tpu.cli.test_chips -m r \
      --synthetic_models -r 3 > "$R/test_chips_r_r5.log" 2>&1
  mark "p3_tilesweep rc=$?"
  # (b) Valar bf16 sidecar refresh on the shipped (post-flip) defaults.
  mark "p3_valar_sidecar start"
  timeout 7200 python bench.py --models r --verbose \
      > "$R/valar_sidecar_r5.log" 2>&1
  mark "p3_valar_sidecar rc=$?"
  # (c) headline warm-up + refresh so the driver's round-end bench runs
  #     cache-warm (its Compact program is untouched by kernel edits but
  #     a fresh measurement median belongs in the round artifact).
  mark "p3_headline start"
  timeout 5400 python bench.py --verbose > "$R/headline_r5.log" 2>&1
  mark "p3_headline rc=$?"
  mark "hw_queue(r5p3) done"
  exit 0
fi

if [ "$PHASE" = "4" ]; then
  # Phase 4 — `--precision mixed` hardware numbers (round-5 session 5).
  # (a) Valar mixed speed cost: the mixed program is a NEW XLA program
  #     (f32 spine) so it pays one cold compile; the bf16 anchor is the
  #     phase-3b sidecar minutes earlier in this same queue, and a warm
  #     bf16 control run AFTER brackets tunnel drift.  bench_valar.json
  #     must keep carrying the shipped bf16 config (f32-run precedent).
  mark "hw_queue(r5p4) start"
  mark "p4_valar_mixed start"
  cp -f bench_valar.json /tmp/bench_valar_bf16_backup.json 2>/dev/null || true
  timeout 10800 python bench.py --models r --precision mixed --verbose \
      > "$R/valar_mixed_r5.log" 2>&1
  mark "p4_valar_mixed rc=$?"
  cp -f /tmp/bench_valar_bf16_backup.json bench_valar.json 2>/dev/null || true
  mark "p4_valar_bf16_control start"
  timeout 7200 python bench.py --models r --verbose \
      > "$R/valar_bf16_control_r5.log" 2>&1
  mark "p4_valar_bf16_control rc=$?"
  # (b) hardware parity sweep with the mixed PSNR column (PARITY.md
  #     refresh; small 72x96 inputs — compiles are cheap).
  mark "p4_parity_mixed start"
  timeout 7200 env UPSCALE_TPU_MODEL_PATH=/root/reference/models \
      python tools/parity_sweep.py --mixed > "$R/parity_mixed_r5.log" 2>&1
  mark "p4_parity_mixed rc=$?"
  mark "hw_queue(r5p4) done"
  exit 0
fi

mark "hw_queue(r5) start"

# 1. RDB kernel ablation at the SHIPPED 576x512/th=48 geometry (VERDICT
#    #1: split the ~2x VPU overhead — 192 ms measured vs ~96 ms MXU
#    floor; VERDICT #2: the pack12 K-pad lever).  nomask prices the
#    frame mask; row3h/row3 price the im2col patch copies (3
#    sublane-shifted copies per stage instead of 9); pack12 removes the
#    K=288->384 pad on stages 3-5.  Parity of each non-nomask impl vs
#    xla-scatter rides along.
#    SPLIT into three invocations so one compile-budget abort can't lose
#    every arm's timings (rdb_bench compiles ALL impls before timing
#    any): the baseline pair rides in each — xla-scatter compiles in
#    seconds and rdb:48 is persistent-cache-warm after invocation (a).
mark "rdb_ablate_a(mask) start"
timeout 7200 python tools/rdb_bench.py --size 576x512 --tile_w 512 \
    --impls xla-scatter,rdb:48,rdb:48:nomask \
    --reps 3 --compile_budget 2400 > "$R/rdb_ablate_a_r5.log" 2>&1
mark "rdb_ablate_a rc=$?"
mark "rdb_ablate_b(pack12) start"
timeout 7200 python tools/rdb_bench.py --size 576x512 --tile_w 512 \
    --impls xla-scatter,rdb:48,rdb:48:pack12 \
    --reps 3 --compile_budget 2400 > "$R/rdb_ablate_b_r5.log" 2>&1
mark "rdb_ablate_b rc=$?"
mark "rdb_ablate_c(row3) start"
timeout 9000 python tools/rdb_bench.py --size 576x512 --tile_w 512 \
    --impls xla-scatter,rdb:48,rdb:48:row3h,rdb:48:row3 \
    --reps 3 --compile_budget 2400 > "$R/rdb_ablate_c_r5.log" 2>&1
mark "rdb_ablate_c rc=$?"

# 2. Ragged-vs-exact compile-time control (VERDICT #3): same row-count
#    class, th=32, cold cache each run, alternating order so tunnel
#    congestion can't masquerade as the ragged effect.  384 = 12x32
#    exact; 392 -> grid pads to 416 rows (the ragged path).
for rep in 1 2; do
  mark "compile_exact_$rep start"
  timeout 2700 python tools/rdb_bench.py --size 384x512 --tile_w 512 \
      --impls rdb:32 --compile_only --fresh_cache --compile_budget 2400 \
      > "$R/compile_exact_r5_$rep.log" 2>&1
  mark "compile_exact_$rep rc=$?"
  mark "compile_ragged_$rep start"
  timeout 2700 python tools/rdb_bench.py --size 392x512 --tile_w 512 \
      --impls rdb:32 --compile_only --fresh_cache --compile_budget 2400 \
      > "$R/compile_ragged_r5_$rep.log" 2>&1
  mark "compile_ragged_$rep rc=$?"
done

# 3. est_vmem_bytes boundary calibration (VERDICT #4).  The one known
#    failure (th=56/tw=512: est 113.9M, ACTUAL 129.7M) says est
#    underestimates true need ~1.14x — so the dangerous side is the
#    ADMITTED one: a geometry estimating just under 110M could still
#    exceed the chip's 128M.  (a)/(b) compile the two largest admitted
#    estimates (110.0M / 108.7M) under the default limit — an OOM here
#    means the guard is too lax; (c) compiles the smallest REJECTED
#    estimate (110.4M) with the stated budget raised to the chip's 128M
#    to locate the true boundary from the other side.
mark "vmem_admit_52x528 start"
timeout 2700 python tools/rdb_bench.py --size 104x528 --tile_w 528 \
    --impls rdb:52 --compile_only --compile_budget 2400 \
    > "$R/vmem_admit_52x528_r5.log" 2>&1
mark "vmem_admit_52x528 rc=$?"
mark "vmem_admit_56x488 start"
timeout 2700 python tools/rdb_bench.py --size 112x488 --tile_w 488 \
    --impls rdb:56 --compile_only --compile_budget 2400 \
    > "$R/vmem_admit_56x488_r5.log" 2>&1
mark "vmem_admit_56x488 rc=$?"
mark "vmem_reject_56x496 start"
timeout 2700 env UPSCALE_TPU_RDB_VMEM_LIMIT=134217728 \
    python tools/rdb_bench.py --size 112x496 --tile_w 496 \
    --impls rdb:56 --compile_only --compile_budget 2400 \
    > "$R/vmem_reject_56x496_r5.log" 2>&1
mark "vmem_reject_56x496 rc=$?"

# 4. Compact step re-profile on TODAY'S contract (VERDICT #5): planar +
#    packed 4:2:0 + i420 input + batch 4 — attribute the residual
#    between 61.7 TFLOP/s and the ~98 N=64 lane-fill ceiling.
mark "compact_profile start"
timeout 2700 python tools/valar_profile.py --models '' --pipe yuv420 \
    --batch 4 --size 1080x1920 --k1 2 --k2 6 --reps 3 \
    --trace /tmp/compact_trace_r5 > "$R/compact_profile_r5.log" 2>&1
mark "compact_profile rc=$?"

# 5. f32 Valar (VERDICT #7): quality-class guidance number.  The sidecar
#    is backed up and restored — bench_valar.json must keep carrying the
#    SHIPPED bf16 config for the driver's headline artifact.
mark "valar_f32 start"
cp -f bench_valar.json /tmp/bench_valar_bf16_backup.json 2>/dev/null || true
timeout 7200 python bench.py --models r --precision f32 --verbose \
    > "$R/valar_f32_r5.log" 2>&1
mark "valar_f32 rc=$?"
cp -f /tmp/bench_valar_bf16_backup.json bench_valar.json 2>/dev/null || true

mark "hw_queue(r5) done"
