"""Hardware A/B: int8 bordered chain vs bf16 direct chain vs XLA bf16
body (round-3 precision experiment; see ops/conv_chain_q8.py docstring
for why this is the last single-chip lever on the Compact body).

Protocol: chained-dependency + host-fetch (NOTES.md), operands as jit
arguments, interleaved reps.  Also runs ONE hardware equality check of
the q8 kernel vs its XLA int oracle (the NL-means lesson: interpret-mode
equality does not rule out Mosaic miscompiles).

Usage:  python tools/q8_bench.py [--height 1080] [--width 1920]
        [--layers 16] [--k1 2] [--k2 6] [--reps 3] [--tile_h 48]
        [--tile_w 384] [--impls q8,direct,xla]
"""

import argparse
import statistics
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from upscale_video_tpu.ops.conv_pallas import ACT_PRELU
from upscale_video_tpu.ops.conv_chain import conv3x3_chain
from upscale_video_tpu.ops.conv_chain_q8 import conv3x3_chain_q8, q8_oracle


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--layers", type=int, default=16)
    p.add_argument("--channels", type=int, default=64)
    p.add_argument("--k1", type=int, default=2)
    p.add_argument("--k2", type=int, default=6)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--tile_h", type=int, default=48)
    p.add_argument("--tile_w", type=int, default=384)
    p.add_argument("--impls", default="q8,direct,xla")
    p.add_argument("--skip_parity", action="store_true")
    p.add_argument("--interpret", action="store_true",
                   help="CPU smoke-test mode (timings meaningless)")
    args = p.parse_args()

    rng = np.random.default_rng(0)
    c = args.channels
    n = args.layers
    wq = tuple(
        jnp.asarray(rng.integers(-127, 128, (3, 3, c, c)), jnp.int8)
        for _ in range(n)
    )
    # bf16 twins of the same weights (scale 1/64 keeps activations O(1))
    wb = tuple(w.astype(jnp.bfloat16) * jnp.bfloat16(1 / 64.0) for w in wq)
    scale = tuple(
        jnp.full((c,), 1.0 / (64.0 * 127.0), jnp.float32) for _ in range(n)
    )
    bias = tuple(
        jnp.asarray(rng.normal(0, 0.02, (c,)), jnp.float32) for _ in range(n)
    )
    slope = tuple(
        jnp.asarray(rng.uniform(0.1, 0.3, (c,)), jnp.float32)
        for _ in range(n)
    )
    inv_out = tuple(jnp.float32(127.0) for _ in range(n))
    x8 = jnp.asarray(
        rng.integers(-127, 128, (args.height, args.width, c)), jnp.int8
    )

    kw = dict(tile_h=args.tile_h, tile_w=args.tile_w,
              interpret=args.interpret)

    def q8_body(v8, wq, scale, bias, slope, inv_out):
        ls = [
            {"wq": w, "scale": sc, "bias": b, "slope": s, "inv_out": io,
             "act": ACT_PRELU}
            for w, sc, b, s, io in zip(wq, scale, bias, slope, inv_out)
        ]
        return conv3x3_chain_q8(v8, ls, **kw)

    def direct_body(vb, wb, bias, slope):
        ls = [
            {"weight": w.astype(jnp.float32), "bias": b, "slope": s,
             "act": ACT_PRELU}
            for w, b, s in zip(wb, bias, slope)
        ]
        return conv3x3_chain(vb, ls, **kw)

    def xla_body(vb, wb, bias, slope):
        y = vb
        for w, b, s in zip(wb, bias, slope):
            y = jax.lax.conv_general_dilated(
                y[None].astype(jnp.bfloat16),
                w, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )[0]
            y = y + b.astype(jnp.bfloat16)
            y = jnp.where(y >= 0, y, y * s.astype(jnp.bfloat16))
        return y

    # chained feedbacks: q8 requantizes the bf16 body output back to int8
    # (exactly what a model integration's boundary does); bf16 impls cast.
    def chained(impl, K):
        if impl == "q8":
            @jax.jit
            def go(v, wq, scale, bias, slope, inv_out):
                def body(_, u):
                    y = q8_body(u[:, :, :c], wq, scale, bias, slope, inv_out)
                    q = jnp.clip(jnp.round(y.astype(jnp.float32) * 127.0),
                                 -127.0, 127.0).astype(jnp.int8)
                    return jnp.pad(q, ((0, 0), (0, 0), (0, 128 - c)))

                v0 = jnp.pad(v, ((0, 0), (0, 0), (0, 128 - c)))
                out = jax.lax.fori_loop(0, K, body, v0)
                return jnp.sum(out.astype(jnp.float32))

            return lambda: float(go(x8, wq, scale, bias, slope, inv_out))
        body_fn = direct_body if impl == "direct" else xla_body

        @jax.jit
        def go(v, wb, bias, slope):
            def body(_, u):
                return body_fn(u, wb, bias, slope).astype(jnp.bfloat16)

            out = jax.lax.fori_loop(0, K, body, v)
            return jnp.sum(out.astype(jnp.float32))

        xb = x8.astype(jnp.bfloat16) / jnp.bfloat16(127.0)
        return lambda: float(go(xb, wb, bias, slope))

    impls = args.impls.split(",")
    fns = {}
    for impl in impls:
        c1 = chained(impl, args.k1)
        c2 = chained(impl, args.k2)
        print(f"[{impl}] compiling...", file=sys.stderr, flush=True)
        c1(); c2()
        fns[impl] = (c1, c2)

    def timed(f):
        t0 = time.perf_counter()
        f()
        return time.perf_counter() - t0

    t1 = {i: [] for i in impls}
    t2 = {i: [] for i in impls}
    for _ in range(args.reps):
        for impl in impls:
            c1, c2 = fns[impl]
            t1[impl].append(timed(c1))
            t2[impl].append(timed(c2))
    flop = 2 * 9 * args.height * args.width * c * c * n
    for impl in impls:
        m1 = statistics.median(t1[impl])
        m2 = statistics.median(t2[impl])
        per = (m2 - m1) / (args.k2 - args.k1)
        print(
            f"[{impl}] t(K={args.k1})={m1*1e3:.0f} ms t(K={args.k2})="
            f"{m2*1e3:.0f} ms -> body {per*1e3:.1f} ms/frame, "
            f"{per*1e3/n:.2f} ms/layer, {flop/per/1e12:.1f} TOP/s-equiv",
            flush=True,
        )

    if not args.skip_parity and "q8" in impls:
        hs, ws_ = min(args.height, 128), min(args.width, 256)
        xs = x8[:hs, :ws_, :]
        ls = [
            {"wq": w, "scale": sc, "bias": b, "slope": s, "inv_out": io,
             "act": ACT_PRELU}
            for w, sc, b, s, io in zip(wq, scale, bias, slope, inv_out)
        ]
        a = np.asarray(
            conv3x3_chain_q8(xs, ls, **kw), np.float32
        )
        b = np.asarray(q8_oracle(xs, ls), np.float32)
        d = np.abs(a - b)
        print(
            f"[parity] q8 kernel vs int oracle ON HARDWARE: "
            f"maxabs={d.max():.6f} mean={d.mean():.8f} "
            f"bit-equal={np.mean(a == b):.4%}",
            flush=True,
        )


if __name__ == "__main__":
    main()
