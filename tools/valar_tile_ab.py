"""Same-session interleaved A/B of the '-m r' (Valar) bench tile size.

Cross-session runs measured tile 480 at 0.365 fps and tile 540 at
0.299 fps — opposite of the geometric prediction (540 fits 1080 rows
exactly; 480 pads to 3x480 = 33% row waste) and inside the documented
+-25% tunnel variance, so only an in-process interleave can settle it.
Builds one engine per tile size, compiles both chained programs once,
then alternates reps (NOTES.md measurement hygiene).

Usage: python tools/valar_tile_ab.py [--tiles 480,540] [--reps 3]

Tile specs: a bare int is a BUDGET (geometry-fit via ops.tiling
.fit_tile_grid, the shipped behavior); ``HxW`` forces an exact interior
tile pair (e.g. ``480x480`` reproduces the pre-fit square config).
"""

import argparse
import statistics
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])  # repo root for bench.py

import bench  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--tiles", default="480,540")
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--k1", type=int, default=1)
    p.add_argument("--k2", type=int, default=3)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    def parse_tile(s):
        return tuple(int(v) for v in s.split("x")) if "x" in s else int(s)

    tiles = [parse_tile(t) for t in args.tiles.split(",")]
    rng = np.random.default_rng(0)
    x = rng.integers(0, 256, (1, args.height, args.width, 3), dtype=np.uint8)

    from upscale_video_tpu.pipeline.chain import ChainEngine, ChainSpec

    fns = {}
    for tile in tiles:
        engine = ChainEngine.build(
            ChainSpec.parse("r"), 2, compute_dtype=jnp.bfloat16,
            synthetic=True, conv_impl="auto", tile=tile,
        )
        scale = engine.scale
        step_fn = engine.raw_step

        def make_chained(K, step_fn=step_fn, scale=scale):
            @jax.jit
            def chained(v):
                def body(i, u):
                    y = step_fn(u)
                    return y[:, ::scale, ::scale, :]

                out = jax.lax.fori_loop(0, K, body, v)
                return jnp.sum(out.astype(jnp.uint32))

            return chained

        c1, c2 = make_chained(args.k1), make_chained(args.k2)
        print(f"[tile {tile}] compiling...", file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        int(c1(x)); int(c2(x))
        print(f"[tile {tile}] compiled+warm in {time.perf_counter()-t0:.0f}s",
              file=sys.stderr, flush=True)
        fns[tile] = (c1, c2)

    t1 = {t: [] for t in tiles}
    t2 = {t: [] for t in tiles}
    for r in range(args.reps):
        for tile in tiles:
            c1, c2 = fns[tile]
            t0 = time.perf_counter(); int(c1(x)); t1[tile].append(time.perf_counter() - t0)
            t0 = time.perf_counter(); int(c2(x)); t2[tile].append(time.perf_counter() - t0)
        print(f"[round {r}] done", file=sys.stderr, flush=True)
    for tile in tiles:
        m1 = statistics.median(t1[tile])
        m2 = statistics.median(t2[tile])
        per = (m2 - m1) / (args.k2 - args.k1)
        print(
            f"[tile {tile}] t(K={args.k1})={m1*1e3:.0f} ms "
            f"t(K={args.k2})={m2*1e3:.0f} ms -> {per*1e3:.0f} ms/frame "
            f"= {1.0/per:.3f} fps",
            flush=True,
        )


if __name__ == "__main__":
    main()
