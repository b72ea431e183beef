"""Hardware A/B: fused RDB kernel vs the XLA dense-scatter formulation
(round-3 Valar item).  Chained protocol, operands as jit args.

Usage: python tools/rdb_bench.py [--size 480] [--k1 2 --k2 6] [--reps 3]
       [--tile_h 32 --tile_w 256]
"""

import argparse
import statistics
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from upscale_video_tpu.ops.rdb_pallas import GC, NF, pack_rdb_weights, rdb_apply


def make_weights(rng):
    ws, bs = [], []
    for t in range(5):
        cin = NF + t * GC
        cout = NF if t == 4 else GC
        ws.append(jnp.asarray(rng.normal(0, 0.05, (3, 3, cin, cout)),
                              jnp.float32))
        bs.append(jnp.asarray(rng.normal(0, 0.02, (cout,)), jnp.float32))
    return ws, bs


def xla_scatter_rdb(x, ws, bs, slope=0.2):
    """The shipped dense-scatter formulation in plain XLA (mirror of
    executor._run_scatter/dense_targets): per-source wide conv, bf16 piece
    buffers, deferred accumulation + bias + leaky at each target."""
    wmats, biases = pack_rdb_weights(ws, bs)
    widths = (GC, GC, GC, GC, NF)
    pieces = {t: [] for t in range(5)}

    def wide(src, s):
        w = wmats[s].reshape(3, 3, src.shape[-1], -1)
        y = jax.lax.conv_general_dilated(
            src[None], w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )[0].astype(jnp.bfloat16)
        off = 0
        for t in range(s, 5):
            pieces[t].append(y[..., off : off + widths[t]])
            off += widths[t]

    feats = [x.astype(jnp.bfloat16)]
    wide(feats[0], 0)
    for t in range(5):
        acc = pieces[t][0].astype(jnp.float32)
        for extra in pieces[t][1:]:
            acc = acc + extra.astype(jnp.float32)
        acc = acc + biases[t][0, :]
        if t < 4:
            acc = jnp.where(acc >= 0, acc, acc * slope)
            c = acc.astype(jnp.bfloat16)
            feats.append(c)
            wide(c, t + 1)
        else:
            c5 = acc
    return (feats[0].astype(jnp.float32) + 0.2 * c5).astype(jnp.bfloat16)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", default="480",
                   help="N or HxW (the SHIPPED 1080p tiled config feeds "
                        "the kernel 392x512 haloed tiles: 360x480 fit "
                        "tile + 2*16 halo)")
    p.add_argument("--k1", type=int, default=2)
    p.add_argument("--k2", type=int, default=6)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--tile_h", default="32",
                   help="comma list A/Bs kernel tile heights in-process")
    p.add_argument("--tile_w", type=int, default=256)
    p.add_argument("--skip_parity", action="store_true")
    args = p.parse_args()

    rng = np.random.default_rng(0)
    ws, bs = make_weights(rng)
    if "x" in str(args.size):
        hgt, wid = (int(v) for v in str(args.size).split("x"))
    else:
        hgt = wid = int(args.size)
    x = jnp.asarray(rng.normal(0, 0.5, (hgt, wid, NF)), jnp.bfloat16)

    def impl_fn(name):
        if name == "xla-scatter":
            return lambda v, ws, bs: xla_scatter_rdb(v, ws, bs)
        th = int(name.split(":")[1])
        return lambda v, ws, bs: rdb_apply(
            v, ws, bs, tile_h=th, tile_w=args.tile_w,
            interpret=False,
        )

    def chained(name, K):
        fn = impl_fn(name)

        @jax.jit
        def go(v, ws, bs):
            def body(_, u):
                return fn(u, ws, bs).astype(jnp.bfloat16)

            return jnp.sum(
                jax.lax.fori_loop(0, K, body, v).astype(jnp.float32)
            )

        return go

    def timed(f):
        t0 = time.perf_counter()
        float(f())
        return time.perf_counter() - t0

    tile_hs = [int(t) for t in str(args.tile_h).split(",")]
    impls = ["xla-scatter"] + [f"rdb:{th}" for th in tile_hs]
    fns = {}
    for name in impls:
        c1, c2 = chained(name, args.k1), chained(name, args.k2)
        print(f"[{name}] compiling...", file=sys.stderr, flush=True)
        float(c1(x, ws, bs))
        float(c2(x, ws, bs))
        fns[name] = (c1, c2)

    t1 = {n: [] for n in impls}
    t2 = {n: [] for n in impls}
    for _ in range(args.reps):
        for name in impls:
            c1, c2 = fns[name]
            t1[name].append(timed(lambda: c1(x, ws, bs)))
            t2[name].append(timed(lambda: c2(x, ws, bs)))
    # one RDB's MACs (valid region)
    flop = 2 * 9 * hgt * wid * (
        NF * GC + (NF + GC) * GC + (NF + 2 * GC) * GC
        + (NF + 3 * GC) * GC + (NF + 4 * GC) * NF
    )
    for name in impls:
        per = (statistics.median(t2[name]) - statistics.median(t1[name])) / (
            args.k2 - args.k1
        )
        print(f"[{name}] {per*1e3:.2f} ms/RDB at {hgt}x{wid}, "
              f"{flop/per/1e12:.1f} TFLOP/s", flush=True)

    if not args.skip_parity:
        a = np.asarray(jax.jit(impl_fn(f"rdb:{tile_hs[0]}"))(x, ws, bs),
                       dtype=np.float32)
        b = np.asarray(jax.jit(impl_fn("xla-scatter"))(x, ws, bs),
                       dtype=np.float32)
        d = np.abs(a - b)
        print(f"[parity] kernel vs xla-scatter on hardware: "
              f"maxabs={d.max():.4f} mean={d.mean():.6f}", flush=True)


if __name__ == "__main__":
    main()
