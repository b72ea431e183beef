"""Benchmark: upscaled frames/sec/chip, 1080p -> 4K via 2x Compact.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline anchor: the reference's published 1.4 fps for a 2x upscale of a
1920x800 Blu-ray on an Intel Arc A750 (README.md:149; BASELINE.md).

Measurement protocol: K model applications CHAINED by data dependency
inside one jitted ``lax.fori_loop``, synchronized by fetching a scalar
reduction of the final result to the host.  This is required because on
the remote ("axon") TPU platform ``block_until_ready`` can return before
execution finishes, which inflates naive timings by >10x.  The host
round-trip cost is eliminated by differencing two chain lengths:
``per_step = (t(K2) - t(K1)) / (K2 - K1)``.  Each chained iteration runs
the full fused model (17 conv3x3(64)+PReLU + conv->12ch + pixel-shuffle +
nearest-skip add, ~2.5 TFLOP/frame at 1080p) and then a dependent
downsample back to the input shape.
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
    p.add_argument("--chain", type=int, default=10, help="short chain length K1")
    p.add_argument("--chain2", type=int, default=60, help="long chain length K2")
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--batch", type=int, default=1, help="frames per chained step")
    p.add_argument("--precision", choices=["bf16", "f32"], default="bf16")
    p.add_argument("--conv_impl", choices=["xla", "pallas"], default="xla",
                   help="conv backend (pallas: fused kernels, 2.2x faster per-layer; "
                        "model-level parity pending boundary-glue elimination)")
    p.add_argument("--verbose", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from upscale_video_tpu.models.zoo import make_synthetic_model

    dev = jax.devices()[0]
    if args.verbose:
        print(f"device: {dev}", file=sys.stderr)

    dtype = jnp.bfloat16 if args.precision == "bf16" else jnp.float32
    model = make_synthetic_model(scale=2, num_conv=16, num_feat=64,
                                 compute_dtype=dtype)
    model.pallas_conv = args.conv_impl == "pallas" 
    params = model.params
    fwd = model.forward

    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (args.batch, args.height, args.width, 3)).astype(np.float32)

    def make_chained(K):
        @jax.jit
        def chained(v):
            def body(i, u):
                y = fwd(params, u)
                return y[:, ::2, ::2, :]  # data-dependent next input

            return jnp.sum(jax.lax.fori_loop(0, K, body, v))

        return chained

    k1, k2 = args.chain, args.chain2
    c1, c2 = make_chained(k1), make_chained(k2)
    float(c1(x))  # compile + warm + absorb any first-transfer stall
    float(c2(x))
    t1 = statistics.median([_timed(lambda: float(c1(x))) for _ in range(args.reps)])
    t2 = statistics.median([_timed(lambda: float(c2(x))) for _ in range(args.reps)])
    per_frame = (t2 - t1) / ((k2 - k1) * args.batch)
    fps = 1.0 / per_frame

    if args.verbose:
        print(
            f"t(K={k1})={t1*1000:.0f} ms, t(K={k2})={t2*1000:.0f} ms -> "
            f"{per_frame*1000:.2f} ms/frame "
            f"({args.height}x{args.width} -> {args.height*2}x{args.width*2}, "
            f"{args.precision}); ~{2.48/per_frame/1000:.0f} TFLOP/s effective",
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


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    sys.exit(main())
