"""Micro-probe: is the MXU's 2x int8 rate reachable from XLA at all?

Times a plain im2col-shaped matmul [M,576]@[576,64] -> int32 with int8
operands vs the same shape in bf16, plus a fat control [4096,4096]^2.
If int8 dots do not beat bf16 even here, the int8 lever is dead at the
XLA level on this platform (a Pallas int8 kernel would be the only
remaining route and inherits the chain-glue losses measured in round 2).

Chained protocol (NOTES.md): each step's input is computed from the
previous step's output (wraparound int8 cast / bf16 cast + column tile),
timing = (t(K2)-t(K1))/(K2-K1), result fetched to host.

Usage: python tools/int8_dot_probe.py [--reps 5]
"""

import argparse
import statistics
import time

import jax
import jax.numpy as jnp
import numpy as np


def bench(name, a, b, feedback, dot, flop, reps, k1=2, k2=10):
    def chained(k):
        @jax.jit
        def go(a, b):
            def step(_, acc):
                return feedback(dot(acc, b))

            out = jax.lax.fori_loop(0, k, step, a)
            return jnp.sum(out.astype(jnp.float32))

        return go

    f1, f2 = chained(k1), chained(k2)
    float(f1(a, b)); float(f2(a, b))
    t1, t2 = [], []
    for _ in range(reps):
        t0 = time.perf_counter(); float(f1(a, b)); t1.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(f2(a, b)); t2.append(time.perf_counter() - t0)
    per = (statistics.median(t2) - statistics.median(t1)) / (k2 - k1)
    print(f"[{name}] {per*1e6:.0f} us/dot, {flop/per/1e12:.1f} T(FL)OP/s", flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--reps", type=int, default=5)
    args = p.parse_args()
    rng = np.random.default_rng(0)

    def dot_i8(x, y):
        return jax.lax.dot_general(
            x, y, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    def dot_bf(x, y):
        return jax.lax.dot_general(
            x, y, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    # im2col shape of the Compact body conv at quarter-1080p: the [M,64]
    # output is column-tiled 9x back to [M,576] to close the chain.
    m, k, n = 129600, 576, 64
    a8 = jnp.asarray(rng.integers(-127, 128, (m, k)), jnp.int8)
    b8 = jnp.asarray(rng.integers(-127, 128, (k, n)), jnp.int8)
    flop = 2.0 * m * k * n
    bench("conv-shape int8->int32", a8, b8,
          lambda y: jnp.tile(y, (1, 9)).astype(jnp.int8), dot_i8, flop,
          args.reps)
    bench("conv-shape bf16->f32", a8.astype(jnp.bfloat16),
          b8.astype(jnp.bfloat16),
          lambda y: jnp.tile(y, (1, 9)).astype(jnp.bfloat16), dot_bf, flop,
          args.reps)

    # fat control where bf16 measured 138-193 TFLOP/s in earlier rounds
    m = k = n = 4096
    a8 = jnp.asarray(rng.integers(-127, 128, (m, k)), jnp.int8)
    b8 = jnp.asarray(rng.integers(-127, 128, (k, n)), jnp.int8)
    flop = 2.0 * m * k * n
    bench("fat int8->int32", a8, b8, lambda y: y.astype(jnp.int8), dot_i8,
          flop, args.reps)
    bench("fat bf16->f32", a8.astype(jnp.bfloat16), b8.astype(jnp.bfloat16),
          lambda y: y.astype(jnp.bfloat16), dot_bf, flop, args.reps)


if __name__ == "__main__":
    main()
