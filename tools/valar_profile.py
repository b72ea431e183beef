"""Device step profiling + A/B harness (VERDICT round-3 item 2, extended
round 5 to profile ANY chain/contract, not just Valar).

Captures a jax.profiler trace of the shipped step at a given input size
and prints grouped device-op totals (the round-2 method that attributed
the Compact step), plus the chained-protocol per-step time.

Usage: python tools/valar_profile.py [--size 480 | HxW] [--k1 1 --k2 3]
       [--trace /tmp/valar_trace] [--impl auto]
       [--models r] [--pipe rgb|yuv420] [--batch 1]

The engine is built whole-frame (tile=0) so ``--size`` IS the profiled
tile — the product's per-family default-tile policy never re-tiles it.
The round-5 Compact re-profile is:
    python tools/valar_profile.py --models '' --pipe yuv420 --batch 4 \
        --size 1080x1920 --k1 2 --k2 6 --trace /tmp/compact_trace
(``--models ''`` = the default 2x Compact chain; yuv420 = the shipped
``--pipe_pix auto`` device contract: flat I420 in, packed 4:2:0 out.)
"""

import argparse
import glob
import gzip
import json
import os
import statistics
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def grouped_totals(trace_dir):
    """Parse the trace's trace.json.gz into device-op name -> total ms."""
    pats = glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True
    )
    if not pats:
        return {}
    with gzip.open(sorted(pats)[-1], "rt") as f:
        data = json.load(f)
    # device lanes: pid whose process_name mentions TPU / device
    names = {}
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            names[ev["pid"]] = ev["args"].get("name", "")
    device_pids = {
        pid for pid, n in names.items()
        if "TPU" in n or "/device:" in n or "Chip" in n
    }
    totals = {}
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X" or ev.get("pid") not in device_pids:
            continue
        name = ev.get("name", "?")
        key = name.split(".")[0].split("(")[0][:40]
        totals[key] = totals.get(key, 0.0) + ev.get("dur", 0) / 1000.0
    return totals


def main():
    def size_spec(s):
        hw = str(s).lower().split("x")
        if len(hw) not in (1, 2) or not all(v.strip().isdigit() for v in hw):
            raise argparse.ArgumentTypeError(
                f"--size {s!r}: expected a square px count or HxW"
            )
        return [int(v) for v in hw]

    p = argparse.ArgumentParser()
    p.add_argument("--size", default="480", type=size_spec,
                   help="square px or HxW (e.g. 576x512 = the shipped 1080p\n                   544-budget tile + 16px halo)")
    p.add_argument("--k1", type=int, default=1)
    p.add_argument("--k2", type=int, default=3)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--trace", default=None)
    p.add_argument("--impl", default="auto")
    p.add_argument("--models", default="r",
                   help="chain DSL ('' = the default 2x Compact chain)")
    p.add_argument("--pipe", choices=["rgb", "yuv420"], default="rgb",
                   help="device contract: rgb = raw (planar if available) "
                        "step; yuv420 = the shipped --pipe_pix auto "
                        "contract (flat I420 in, packed 4:2:0 out)")
    p.add_argument("--batch", type=int, default=1,
                   help="frames per step (the shipped Compact default is 4)")
    p.add_argument("--compile_budget", type=float, default=0,
                   help="seconds; a compile exceeding this aborts the "
                        "process (exit 3) with a report instead of "
                        "hanging the session (0 = unbounded)")
    args = p.parse_args()

    from upscale_video_tpu.pipeline.chain import ChainEngine, ChainSpec

    # tile=0: the INPUT is the tile under test — without it the engine's
    # per-family default tile policy (544 budget since round 4 s5) would
    # re-tile the input internally and profile a different geometry.
    # scale 2 unconditionally: ChainSpec.effective_scale forces 4 for 'r'
    # (reference semantics), and every other family ships at 2x — the old
    # "4 if any models" guess profiled e.g. --models 'n=3' as a 4x Compact
    # program the product never dispatches
    eng = ChainEngine.build(
        ChainSpec.parse(args.models or None), 2,
        compute_dtype=jnp.bfloat16,
        synthetic=True, conv_impl=args.impl, tile=0,
    )
    rng = np.random.default_rng(0)
    hw = args.size
    sh, sw = (hw[0], hw[0]) if len(hw) == 1 else (hw[0], hw[1])

    if args.pipe == "yuv420":
        nbytes = sh * sw * 3 // 2
        planar_ok = bool(eng.planar_scale)
        step = eng.yuv_step(True, planar_ok, i420_in=(sh, sw, True))
        x = rng.integers(0, 256, (args.batch, nbytes), dtype=np.uint8)

        def link(y):
            # feed the packed 4:2:0 output's leading bytes back as the
            # next flat-I420 input (content is garbage; the DEPENDENCY is
            # what the chained protocol needs)
            return y.reshape(y.shape[0], -1)[:, :nbytes]
    else:
        planar = bool(eng.planar_scale)
        step = eng.raw_planar_step if planar else eng.raw_step
        scale = eng.scale
        x = rng.integers(0, 256, (args.batch, sh, sw, 3), dtype=np.uint8)
        if planar:
            def link(y):
                return y[:, :, :, :3]
        else:
            def link(y):
                return y[:, ::scale, ::scale, :]

    def chained(K):
        @jax.jit
        def go(v):
            def body(_, u):
                return link(step(u))

            return jnp.sum(jax.lax.fori_loop(0, K, body, v).astype(jnp.uint32))

        return go

    c1, c2 = chained(args.k1), chained(args.k2)
    print("compiling...", file=sys.stderr, flush=True)
    if args.compile_budget > 0:
        import threading

        done = threading.Event()
        t0 = time.perf_counter()

        def watchdog():
            if not done.wait(args.compile_budget):
                print(f"[compile-budget] exceeded {args.compile_budget:.0f}s "
                      f"(elapsed {time.perf_counter() - t0:.0f}s) — "
                      "aborting; record this geometry as "
                      "compile-pathological", flush=True)
                os._exit(3)

        threading.Thread(target=watchdog, daemon=True).start()
    tc = time.perf_counter()
    # AOT lower+compile under the budget window; the first executions
    # (and their possible 100-550 s D2H stalls — documented tunnel
    # flakiness) run AFTER done.set(), so a transfer stall can no longer
    # be mislabeled compile-pathological (round-5 review finding)
    c1 = c1.lower(x).compile()
    c2 = c2.lower(x).compile()
    if args.compile_budget > 0:
        done.set()
    print(f"compile {time.perf_counter() - tc:.1f}s", flush=True)
    int(c1(x))
    int(c2(x))

    def timed(f):
        t0 = time.perf_counter()
        int(f())
        return time.perf_counter() - t0

    t1 = statistics.median([timed(lambda: c1(x)) for _ in range(args.reps)])
    t2 = statistics.median([timed(lambda: c2(x)) for _ in range(args.reps)])
    per = (t2 - t1) / (args.k2 - args.k1)
    print(f"[{args.impl}|{args.models or 'compact'}|{args.pipe}] "
          f"{sh}x{sw} batch={args.batch}: {per*1e3:.1f} ms/step "
          f"({per*1e3/args.batch:.2f} ms/frame)", flush=True)

    if args.trace:
        with jax.profiler.trace(args.trace):
            int(c2(x))
        totals = grouped_totals(args.trace)
        top = sorted(totals.items(), key=lambda kv: -kv[1])[:20]
        scale = 1.0 / args.k2
        print(f"\ntop device op groups (ms per step, /{args.k2}):")
        for name, ms in top:
            print(f"  {ms*scale:8.2f}  {name}")


if __name__ == "__main__":
    main()
