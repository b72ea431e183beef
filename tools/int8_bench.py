"""int8 conv-body experiment: can MXU int8 (2x bf16 peak) beat the bf16
body despite per-layer requantization?  (Round-3 follow-on to the Winograd
refutation: the Compact body is lane-fill-limited, so the remaining
single-chip levers are precision, not MACs.)

Realistic int8 inference pipeline per layer:
  x_q(int8) conv w_q(int8) -> int32 -> scale -> f32 bias+PReLU -> requant
  to the next layer's int8 with a static scale.

Usage: python tools/int8_bench.py [--height 1080] [--width 1920]
       [--layers 16] [--k1 2 --k2 6] [--reps 3]
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
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--layers", type=int, default=16)
    p.add_argument("--channels", type=int, default=64)
    p.add_argument("--k1", type=int, default=2)
    p.add_argument("--k2", type=int, default=6)
    p.add_argument("--reps", type=int, default=3)
    args = p.parse_args()

    rng = np.random.default_rng(0)
    c = args.channels
    ws = tuple(
        jnp.asarray(rng.integers(-127, 128, (3, 3, c, c)), jnp.int8)
        for _ in range(args.layers)
    )
    wsb = tuple(w.astype(jnp.bfloat16) * jnp.bfloat16(1 / 64.0) for w in ws)
    bs = tuple(
        jnp.asarray(rng.normal(0, 0.1, (c,)), jnp.float32)
        for _ in range(args.layers)
    )
    ss = tuple(
        jnp.asarray(rng.uniform(0.1, 0.3, (c,)), jnp.float32)
        for _ in range(args.layers)
    )
    x8 = jnp.asarray(
        rng.integers(-127, 128, (args.height, args.width, c)), jnp.int8
    )

    def int8_layer(xq, w, b, s, out_scale):
        y = jax.lax.conv_general_dilated(
            xq[None], w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )[0]
        yf = y.astype(jnp.float32) * (1.0 / (64.0 * 127.0))
        yf = yf + b
        yf = jnp.where(yf >= 0, yf, yf * s)
        q = jnp.clip(jnp.round(yf * out_scale), -127, 127)
        return q.astype(jnp.int8)

    def bf16_layer(xb, w, b, s):
        y = jax.lax.conv_general_dilated(
            xb[None], w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )[0]
        y = y + b.astype(jnp.bfloat16)
        return jnp.where(y >= 0, y, y * s.astype(jnp.bfloat16))

    def body_int8(v, ws, bs, ss):
        for w, b, s in zip(ws, bs, ss):
            v = int8_layer(v, w, b, s, 127.0)
        return v

    def body_bf16(v, ws, bs, ss):
        for w, b, s in zip(ws, bs, ss):
            v = bf16_layer(v, w, b, s)
        return v

    def chained(body, K, cast):
        @jax.jit
        def go(v, ws, bs, ss):
            def step(_, u):
                return cast(body(u, ws, bs, ss))

            out = jax.lax.fori_loop(0, K, step, v)
            return jnp.sum(out.astype(jnp.float32))

        return go

    def timed(f):
        t0 = time.perf_counter()
        float(f())
        return time.perf_counter() - t0

    flop = 2 * 9 * args.height * args.width * c * c * args.layers
    cases = {
        "int8": (body_int8, x8, ws, lambda y: y),
        "bf16": (body_bf16, x8.astype(jnp.bfloat16), wsb,
                 lambda y: y.astype(jnp.bfloat16)),
    }
    fns = {}
    for name, (body, x, w, cast) in cases.items():
        c1 = chained(body, args.k1, cast)
        c2 = chained(body, args.k2, cast)
        print(f"[{name}] compiling...", file=sys.stderr, flush=True)
        float(c1(x, w, bs, ss))
        float(c2(x, w, bs, ss))
        fns[name] = (c1, c2, x, w)

    t1 = {n: [] for n in cases}
    t2 = {n: [] for n in cases}
    for _ in range(args.reps):
        for name in cases:
            c1, c2, x, w = fns[name]
            t1[name].append(timed(lambda: c1(x, w, bs, ss)))
            t2[name].append(timed(lambda: c2(x, w, bs, ss)))
    for name in cases:
        per = (statistics.median(t2[name]) - statistics.median(t1[name])) / (
            args.k2 - args.k1
        )
        print(
            f"[{name}] body {per*1e3:.1f} ms/frame, "
            f"{per*1e3/args.layers:.2f} ms/layer, "
            f"{flop/per/1e12:.1f} TFLOP/s-equiv",
            flush=True,
        )


if __name__ == "__main__":
    main()
