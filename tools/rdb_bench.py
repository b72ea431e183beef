"""Hardware A/B: fused RDB kernel vs the XLA dense-scatter formulation
(round-3 Valar item).  Chained protocol, operands as jit args.

Usage: python tools/rdb_bench.py [--size 480 | HxW] [--k1 2 --k2 6]
       [--reps 3] [--tile_h 32 --tile_w 256]
       [--impls xla-scatter,rdb:48,rdb:48:row3h,rdb:48:nomask]
       [--compile_budget 1500] [--fresh_cache]

Impl grammar: ``xla-scatter`` or ``rdb:<tile_h>[:<im2col>][:<mask>]``
where im2col is patch9 (default) / row3 / row3h / pack12 (see
ops/rdb_pallas.pack_rdb_weights) and mask is ``iota`` (default),
``slab`` (static column pad + 4-row edge-strip masking, exact-fit
single-column grids only), or ``nomask`` — the round-5 VPU ablation
(numerically wrong at frame borders; timing only, parity is skipped
for it automatically).

Compile seconds are printed per impl (the Mosaic ragged-padding
pathology data); ``--compile_budget`` aborts the process with a report
instead of hanging a session when a compile exceeds it.
"""

import argparse
import os
import statistics
import sys
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np

from upscale_video_tpu.ops.rdb_pallas import (
    GC, NF, est_vmem_bytes, pack_rdb_weights, rdb_apply, vmem_limit_bytes,
)
from upscale_video_tpu.utils.compcache import enable_compilation_cache


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
    p.add_argument("--impls", default=None,
                   help="comma list overriding the default impl set; see "
                        "the impl grammar in the module docstring")
    p.add_argument("--compile_budget", type=float, default=0,
                   help="seconds; a compile exceeding this aborts the "
                        "process (exit 3) with a report instead of "
                        "hanging the session (0 = unbounded)")
    p.add_argument("--fresh_cache", action="store_true",
                   help="point the persistent compile cache at a throwaway "
                        "dir so compile TIMES are cold (the ragged-padding "
                        "pathology experiment)")
    p.add_argument("--compile_only", action="store_true",
                   help="compile each impl (K=k1 program only) and exit — "
                        "the est_vmem_bytes boundary experiment; combine "
                        "with UPSCALE_TPU_RDB_VMEM_LIMIT=134217728 to let "
                        "a guard-rejected geometry reach Mosaic")
    args = p.parse_args()

    if args.fresh_cache:
        import tempfile

        os.environ["UPSCALE_TPU_COMPILATION_CACHE_DIR"] = tempfile.mkdtemp(
            prefix="rdbbench_cache_")
    enable_compilation_cache()

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
        parts = name.split(":")
        th = int(parts[1])
        im2col = "patch9"
        frame_mask = True
        for flag in parts[2:]:
            if flag == "nomask":
                frame_mask = False
            elif flag in ("iota", "slab", "auto"):
                frame_mask = flag
            else:
                im2col = flag
        return lambda v, ws, bs: rdb_apply(
            v, ws, bs, tile_h=th, tile_w=args.tile_w,
            interpret=False, im2col=im2col, frame_mask=frame_mask,
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

    if args.impls:
        impls = [s.strip() for s in args.impls.split(",") if s.strip()]
    else:
        tile_hs = [int(t) for t in str(args.tile_h).split(",")]
        impls = ["xla-scatter"] + [f"rdb:{th}" for th in tile_hs]
    fns = {}
    for name in impls:
        if name != "xla-scatter":
            th = int(name.split(":")[1])
            print(f"[{name}] est_vmem={est_vmem_bytes(th, args.tile_w)/2**20:.1f}M "
                  f"limit={vmem_limit_bytes()/2**20:.0f}M", flush=True)
        c1, c2 = chained(name, args.k1), chained(name, args.k2)
        print(f"[{name}] compiling...", file=sys.stderr, flush=True)
        done = threading.Event()
        if args.compile_budget > 0:
            t_start = time.perf_counter()

            def watchdog(nm=name, t0=t_start):
                if not done.wait(args.compile_budget):
                    print(f"[compile-budget] {nm} exceeded "
                          f"{args.compile_budget:.0f}s "
                          f"(elapsed {time.perf_counter() - t0:.0f}s) — "
                          "aborting; record this geometry as "
                          "compile-pathological", flush=True)
                    os._exit(3)

            threading.Thread(target=watchdog, daemon=True).start()
        tc = time.perf_counter()
        try:
            # AOT lower+compile so the watchdog window bounds COMPILE
            # only: the first execution's D2H fetch can stall 100-550 s
            # (documented tunnel flakiness), and a budget window that
            # included it mislabeled transfer stalls as
            # compile-pathological geometries (round-5 review finding)
            c1 = c1.lower(x, ws, bs).compile()
            if not args.compile_only:
                c2 = c2.lower(x, ws, bs).compile()
        except Exception as e:
            done.set()
            print(f"[{name}] compile FAILED after "
                  f"{time.perf_counter() - tc:.1f}s: "
                  f"{type(e).__name__}: {str(e)[:300]}", flush=True)
            if not args.compile_only:
                raise
            continue
        done.set()
        print(f"[{name}] compile {time.perf_counter() - tc:.1f}s",
              flush=True)
        if not args.compile_only:
            # warm both programs (first run + transfer stall absorbed
            # here, outside the compile budget)
            float(c1(x, ws, bs))
            float(c2(x, ws, bs))
        fns[name] = (c1, c2)
    if args.compile_only:
        print("[compile_only] done", flush=True)
        return

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
        b = np.asarray(jax.jit(impl_fn("xla-scatter"))(x, ws, bs),
                       dtype=np.float32)
        for name in impls:
            if name == "xla-scatter" or ":nomask" in name:
                continue  # nomask is wrong at frame borders by design
            a = np.asarray(jax.jit(impl_fn(name))(x, ws, bs),
                           dtype=np.float32)
            d = np.abs(a - b)
            print(f"[parity] {name} vs xla-scatter on hardware: "
                  f"maxabs={d.max():.4f} mean={d.mean():.6f}", flush=True)


if __name__ == "__main__":
    main()
