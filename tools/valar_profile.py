"""Valar (RRDBNet) device profiling + A/B harness (VERDICT round-3 item 2).

Captures a jax.profiler trace of the scatter-rewrite step at a given tile
size and prints grouped device-op totals (the round-2 method that
attributed the Compact step), plus the chained-protocol per-tile time.

Usage: python tools/valar_profile.py [--size 480] [--k1 1 --k2 3]
       [--trace /tmp/valar_trace] [--impl auto]
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
    p = argparse.ArgumentParser()
    p.add_argument("--size", default="480",
                   help="square px or HxW (e.g. 576x512 = the shipped 1080p\n                   544-budget tile + 16px halo)")
    p.add_argument("--k1", type=int, default=1)
    p.add_argument("--k2", type=int, default=3)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--trace", default=None)
    p.add_argument("--impl", default="auto")
    args = p.parse_args()

    from upscale_video_tpu.pipeline.chain import ChainEngine, ChainSpec

    # tile=0: the INPUT is the tile under test — without it the engine's
    # per-family default tile policy (544 budget since round 4 s5) would
    # re-tile the input internally and profile a different geometry.
    eng = ChainEngine.build(
        ChainSpec.parse("r"), 4, compute_dtype=jnp.bfloat16,
        synthetic=True, conv_impl=args.impl, tile=0,
    )
    step = eng.raw_step
    rng = np.random.default_rng(0)
    hw = [int(v) for v in str(args.size).lower().split("x")]
    sh, sw = (hw[0], hw[0]) if len(hw) == 1 else (hw[0], hw[1])
    x = rng.integers(0, 256, (1, sh, sw, 3), dtype=np.uint8)

    def chained(K):
        @jax.jit
        def go(v):
            def body(_, u):
                y = step(u)
                return y[:, ::4, ::4, :]

            return jnp.sum(jax.lax.fori_loop(0, K, body, v).astype(jnp.uint32))

        return go

    c1, c2 = chained(args.k1), chained(args.k2)
    print("compiling...", file=sys.stderr, flush=True)
    int(c1(x))
    int(c2(x))

    def timed(f):
        t0 = time.perf_counter()
        int(f())
        return time.perf_counter() - t0

    t1 = statistics.median([timed(lambda: c1(x)) for _ in range(args.reps)])
    t2 = statistics.median([timed(lambda: c2(x)) for _ in range(args.reps)])
    per = (t2 - t1) / (args.k2 - args.k1)
    print(f"[{args.impl}] {sh}x{sw} tile: {per*1e3:.1f} ms/tile", flush=True)

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
