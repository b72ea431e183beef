"""Does Mosaic emit int8 MXU matmuls?  (Decides the q8 kernel's ceiling.)

XLA-level int8 dots measure ~3x bf16 (tools/int8_dot_probe.py: 571 vs
190 T(FL)OP/s fat), but the q8 chain kernel only beat the bf16 chain by
4% (tools/q8_bench.py) — consistent with Mosaic upcasting int8 dot
operands instead of using the MXU's int8 mode, leaving only the halved
DMA traffic as the win.  This probe times ONE pallas kernel that loops a
conv-shaped [m,576]@[576,64] dot in VMEM (feedback = tile the output back
to the input shape, identical structure for both dtypes), isolating the
Mosaic dot from DMA/epilogue costs.

Usage: python tools/mosaic_dot_probe.py [--m 6144] [--iters 64] [--reps 5]
"""

import argparse
import functools
import statistics
import time

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_fn(m, k, n, iters, dtype):
    def kernel(a_ref, b_ref, out_ref):
        def body(i, a):
            y = jnp.dot(a, b_ref[:, :],
                        preferred_element_type=jnp.int32
                        if dtype == jnp.int8 else jnp.float32)
            if dtype == jnp.int8:
                nxt = (y & 63).astype(jnp.int8)
            else:
                nxt = (y * jnp.float32(1e-3)).astype(jnp.bfloat16)
            return jnp.tile(nxt, (1, k // n))

        a = jax.lax.fori_loop(0, iters, body, a_ref[:, :])
        out_ref[:, :] = a[:, :n].astype(jnp.float32)

    @jax.jit
    def run(a, b):
        return pl.pallas_call(
            kernel,
            in_specs=[
                pl.BlockSpec((m, k), lambda: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k, n), lambda: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((m, n), lambda: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(a, b)

    return run


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--m", type=int, default=6144)
    p.add_argument("--k", type=int, default=576)
    p.add_argument("--n", type=int, default=64)
    p.add_argument("--i1", type=int, default=8)
    p.add_argument("--i2", type=int, default=64)
    p.add_argument("--reps", type=int, default=5)
    args = p.parse_args()
    m, k, n = args.m, args.k, args.n

    rng = np.random.default_rng(0)
    flop = 2.0 * m * k * n
    for dtype, name in ((jnp.int8, "int8"), (jnp.bfloat16, "bf16")):
        a = jnp.asarray(rng.integers(-63, 64, (m, k)), dtype)
        b = jnp.asarray(rng.integers(-63, 64, (k, n)), dtype)
        f1 = make_fn(m, k, n, args.i1, dtype)
        f2 = make_fn(m, k, n, args.i2, dtype)
        float(jnp.sum(f1(a, b))); float(jnp.sum(f2(a, b)))
        t1, t2 = [], []
        for _ in range(args.reps):
            t0 = time.perf_counter(); float(jnp.sum(f1(a, b)))
            t1.append(time.perf_counter() - t0)
            t0 = time.perf_counter(); float(jnp.sum(f2(a, b)))
            t2.append(time.perf_counter() - t0)
        per = (statistics.median(t2) - statistics.median(t1)) / (
            args.i2 - args.i1
        )
        print(
            f"[{name}] {per*1e6:.1f} us/iter (dot+tile), "
            f"{flop/per/1e12:.1f} T(FL)OP/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
