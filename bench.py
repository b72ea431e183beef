"""Benchmark: upscaled frames/sec/chip, 1080p -> 4K via 2x Compact.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline anchor: the reference's published figure of 1.4 fps for a 2x
upscale of a 1920x800 Blu-ray on an Intel Arc A750 (README.md:149;
BASELINE.md).  This bench runs the same model architecture
(SRVGGNetCompact 2x: 17 conv3x3(64)+PReLU + conv->12ch + pixel-shuffle +
nearest skip) as ONE fused uint8->uint8 XLA program on a single TPU chip,
including host->device transfer of the uint8 frames each step.

Usage: python bench.py [--height 1080 --width 1920 --frames-per-step N
                        --steps 20 --precision bf16]
"""

import argparse
import json
import statistics
import sys
import time


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--frames-per-step", type=int, default=2)
    p.add_argument("--steps", type=int, default=15)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--precision", choices=["bf16", "f32"], default="bf16")
    p.add_argument("--verbose", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from upscale_video_tpu.pipeline.chain import ChainEngine, ChainSpec

    dev = jax.devices()[0]
    if args.verbose:
        print(f"device: {dev}", file=sys.stderr)

    dtype = jnp.bfloat16 if args.precision == "bf16" else jnp.float32
    engine = ChainEngine.build(
        ChainSpec.parse(None), scale=2, compute_dtype=dtype, synthetic=True
    )
    step = engine.step

    rng = np.random.default_rng(0)
    n = args.frames_per_step
    frames = rng.integers(0, 256, (n, args.height, args.width, 3), dtype=np.uint8)

    # compile + warmup
    out = step(jnp.asarray(frames))
    out.block_until_ready()
    for _ in range(args.warmup):
        step(jnp.asarray(frames)).block_until_ready()

    times = []
    for _ in range(args.steps):
        t0 = time.perf_counter()
        step(jnp.asarray(frames)).block_until_ready()
        times.append(time.perf_counter() - t0)

    med = statistics.median(times)
    fps = n / med
    if args.verbose:
        print(
            f"median step {med*1000:.1f} ms for {n} frames "
            f"({args.height}x{args.width} -> {args.height*2}x{args.width*2}), "
            f"min {min(times)*1000:.1f} ms",
            file=sys.stderr,
        )

    baseline_fps = 1.4  # README.md:149 (Arc A750, 1920x800 2x)
    print(json.dumps({
        "metric": "upscaled_frames_per_sec_per_chip_1080p_to_4k_2x_compact",
        "value": round(fps, 3),
        "unit": "frames/sec",
        "vs_baseline": round(fps / baseline_fps, 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
