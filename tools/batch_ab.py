"""Same-session A/B of device batch depth for the Compact headline step.

The pipeline's frames_per_step default is 4 (bench --batch 4).  Deeper
batches amortize dispatch and may improve XLA's conv fusion efficiency;
HBM bounds the ceiling (1080p batch 8 holds ~2 GB live activations per
layer boundary).  Chained-dependency protocol as bench.py (the broken
block_until_ready on axon forces it).

Usage: python tools/batch_ab.py [--batches 4,8] [--reps 3]
"""

import argparse
import statistics
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batches", default="4,8")
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--k1", type=int, default=5)
    p.add_argument("--k2", type=int, default=20)
    p.add_argument("--reps", type=int, default=3)
    args = p.parse_args()

    from upscale_video_tpu.pipeline.chain import ChainEngine, ChainSpec

    engine = ChainEngine.build(
        ChainSpec.parse(None), 2, compute_dtype=jnp.bfloat16, synthetic=True,
    )
    planar = engine.planar_scale
    step_fn = engine.raw_planar_step if planar else engine.raw_step
    link = ((lambda y: y[:, :, :, :3]) if planar
            else (lambda y: y[:, ::2, ::2, :]))

    def chained(K):
        @jax.jit
        def go(v):
            def body(_, u):
                return link(step_fn(u))

            return jnp.sum(jax.lax.fori_loop(0, K, body, v).astype(jnp.uint32))

        return go

    def timed(f):
        t0 = time.perf_counter()
        int(f())
        return time.perf_counter() - t0

    rng = np.random.default_rng(0)
    batches = [int(b) for b in args.batches.split(",")]
    xs = {
        b: jnp.asarray(rng.integers(
            0, 256, (b, args.height, args.width, 3), dtype=np.uint8))
        for b in batches
    }
    fns = {}
    for b in batches:
        c1, c2 = chained(args.k1), chained(args.k2)
        print(f"[batch {b}] compiling...", file=sys.stderr, flush=True)
        int(c1(xs[b])); int(c2(xs[b]))
        fns[b] = (c1, c2)

    t1 = {b: [] for b in batches}
    t2 = {b: [] for b in batches}
    for _ in range(args.reps):
        for b in batches:
            c1, c2 = fns[b]
            t1[b].append(timed(lambda: c1(xs[b])))
            t2[b].append(timed(lambda: c2(xs[b])))
    for b in batches:
        per = (statistics.median(t2[b]) - statistics.median(t1[b])) / (
            (args.k2 - args.k1) * b
        )
        print(f"[batch {b}] {per*1e3:.2f} ms/frame = {1/per:.1f} fps",
              flush=True)


if __name__ == "__main__":
    main()
