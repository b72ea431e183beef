"""Hardware A/B/C for the conv body: XLA fusions vs direct Pallas chain vs
row-Winograd chain (VERDICT round-3 item 1).

Protocol: chained-dependency + host-fetch (NOTES.md: block_until_ready lies
on this platform; per-transfer timing measures the tunnel).  All operands
are jit ARGUMENTS (closures bake into the remote compile request, HTTP 413
above ~100 MB).  One TPU process at a time.

Usage:  python tools/wino_bench.py [--height 1080] [--width 1920]
        [--layers 16] [--k1 2] [--k2 6] [--reps 3] [--tile_h 48]
        [--tile_w 384] [--impls xla,direct,wino]
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
from upscale_video_tpu.ops.conv_winograd import winograd_chain


def make_layers(rng, n, c):
    out = []
    for _ in range(n):
        out.append({
            "weight": jnp.asarray(rng.normal(0, 0.05, (3, 3, c, c)), jnp.float32),
            "bias": jnp.asarray(rng.normal(0, 0.05, (c,)), jnp.float32),
            "slope": jnp.asarray(rng.uniform(0.1, 0.3, (c,)), jnp.float32),
            "act": ACT_PRELU,
        })
    return out


def xla_body(x, ws, bs, ss):
    y = x
    for w, b, s in zip(ws, bs, ss):
        y = jax.lax.conv_general_dilated(
            y[None], w.astype(jnp.bfloat16), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )[0]
        y = y + b.astype(jnp.bfloat16)
        y = jnp.where(y >= 0, y, y * s.astype(jnp.bfloat16))
    return y


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
    p.add_argument("--impls", default="xla,direct,wino")
    p.add_argument("--skip_parity", action="store_true")
    args = p.parse_args()

    rng = np.random.default_rng(0)
    layers = make_layers(rng, args.layers, args.channels)
    ws = tuple(l["weight"] for l in layers)
    bs = tuple(l["bias"] for l in layers)
    ss = tuple(l["slope"] for l in layers)
    x = jnp.asarray(
        rng.uniform(0, 1, (args.height, args.width, args.channels)),
        jnp.bfloat16,
    )

    def stack_fn(impl):
        if impl == "xla":
            return lambda v, ws, bs, ss: xla_body(v, ws, bs, ss)
        kw = dict(tile_h=args.tile_h, tile_w=args.tile_w, interpret=False)
        chain = conv3x3_chain if impl == "direct" else winograd_chain

        def run(v, ws, bs, ss):
            ls = [
                {"weight": w, "bias": b, "slope": s, "act": ACT_PRELU}
                for w, b, s in zip(ws, bs, ss)
            ]
            return chain(v, ls, **kw)

        return run

    def chained(impl, K):
        fn = stack_fn(impl)

        @jax.jit
        def go(v, ws, bs, ss):
            def body(_, u):
                return fn(u, ws, bs, ss).astype(jnp.bfloat16)

            out = jax.lax.fori_loop(0, K, body, v)
            return jnp.sum(out.astype(jnp.float32))

        return go

    def timed(f):
        t0 = time.perf_counter()
        float(f())
        return time.perf_counter() - t0

    impls = args.impls.split(",")
    per_layer = {}
    fns = {}
    for impl in impls:
        c1 = chained(impl, args.k1)
        c2 = chained(impl, args.k2)
        print(f"[{impl}] compiling...", file=sys.stderr, flush=True)
        float(c1(x, ws, bs, ss))
        float(c2(x, ws, bs, ss))
        fns[impl] = (c1, c2)

    # interleaved A/B/C: one rep of every impl per round (NOTES hygiene)
    t1 = {i: [] for i in impls}
    t2 = {i: [] for i in impls}
    for _ in range(args.reps):
        for impl in impls:
            c1, c2 = fns[impl]
            t1[impl].append(timed(lambda: c1(x, ws, bs, ss)))
            t2[impl].append(timed(lambda: c2(x, ws, bs, ss)))
    flop = 2 * 9 * args.height * args.width * args.channels**2 * args.layers
    for impl in impls:
        m1 = statistics.median(t1[impl])
        m2 = statistics.median(t2[impl])
        per = (m2 - m1) / (args.k2 - args.k1)
        per_layer[impl] = per / args.layers
        print(
            f"[{impl}] t(K={args.k1})={m1*1e3:.0f} ms t(K={args.k2})="
            f"{m2*1e3:.0f} ms -> body {per*1e3:.1f} ms/frame, "
            f"{per_layer[impl]*1e3:.2f} ms/layer, "
            f"{flop/per/1e12:.1f} TFLOP/s-direct-equiv",
            flush=True,
        )

    if not args.skip_parity and "wino" in impls:
        # hardware equality: one shot, fetched bytes, vs the XLA body
        a = np.asarray(
            jax.jit(stack_fn("wino"))(x, ws, bs, ss), dtype=np.float32
        )
        b = np.asarray(
            jax.jit(stack_fn("xla"))(x, ws, bs, ss), dtype=np.float32
        )
        d = np.abs(a - b)
        print(
            f"[parity] wino vs xla on hardware: maxabs={d.max():.4f} "
            f"mean={d.mean():.6f} (bf16 reassociation class)",
            flush=True,
        )


if __name__ == "__main__":
    main()
