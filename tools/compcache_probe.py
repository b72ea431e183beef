"""Persistent-compilation-cache capability probe for the attached backend.

NOTES.md pending item: the compcache wiring (utils/compcache.py) is live,
but whether the remote axon backend can SERIALIZE executables decides if
the 7-10 min Valar/Mosaic compiles amortize across processes.  This probe
answers it empirically: two fresh subprocesses compile the same
distinctive program against a shared cache dir; if the backend supports
serialization the second process compiles ~instantly and the cache dir
gains entries.

Usage: python tools/compcache_probe.py [--cache_dir /tmp/ccprobe]
"""

import argparse
import os
import subprocess
import sys
import tempfile
import textwrap

CHILD = textwrap.dedent(
    """
    import os, sys, time
    import jax, jax.numpy as jnp
    from upscale_video_tpu.utils.compcache import enable_compilation_cache

    d = enable_compilation_cache(sys.argv[1])
    print("cache dir in effect:", d, flush=True)

    # distinctive shapes so no other session's entries collide
    def fn(x, w1, w2):
        y = jax.lax.conv_general_dilated(
            x, w1, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = jnp.where(y >= 0, y, 0.17 * y)
        y = jax.lax.conv_general_dilated(
            y, w2, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.tanh(y)

    x = jnp.zeros((1, 217, 331, 61), jnp.bfloat16)
    w1 = jnp.zeros((3, 3, 61, 67), jnp.bfloat16)
    w2 = jnp.zeros((3, 3, 67, 61), jnp.bfloat16)
    lowered = jax.jit(fn).lower(x, w1, w2)
    t0 = time.perf_counter()
    lowered.compile()
    dt = time.perf_counter() - t0
    print(f"COMPILE_SECONDS {dt:.3f}", flush=True)
    """
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cache_dir", default=None)
    args = p.parse_args()
    cache = args.cache_dir or tempfile.mkdtemp(prefix="ccprobe_")
    os.makedirs(cache, exist_ok=True)
    with tempfile.NamedTemporaryFile(
        "w", suffix=".py", delete=False
    ) as f:
        f.write(CHILD)
        child = f.name

    times = []
    try:
        for run in (1, 2):
            r = subprocess.run(
                [sys.executable, child, cache],
                capture_output=True, text=True, timeout=900,
            )
            sys.stderr.write(r.stderr[-2000:])
            print(f"--- run {run} ---\n{r.stdout}", flush=True)
            if r.returncode != 0:
                print(f"RESULT: run {run} failed (rc={r.returncode})")
                return 1
            for line in r.stdout.splitlines():
                if line.startswith("COMPILE_SECONDS"):
                    times.append(float(line.split()[1]))
            entries = sum(len(fs) for _, _, fs in os.walk(cache))
            print(f"cache entries after run {run}: {entries}", flush=True)
    finally:
        os.unlink(child)

    if len(times) != 2:
        # a child that exits 0 without printing COMPILE_SECONDS must not
        # read as success to an unattended queue
        print(f"RESULT: INCONCLUSIVE (parsed {len(times)}/2 compile times)")
        return 2
    speedup = times[0] / max(times[1], 1e-9)
    verdict = (
        "SUPPORTED (executables serialize; compiles amortize)"
        if entries > 0 and times[1] < 0.5 * times[0]
        else "NOT EFFECTIVE on this backend"
    )
    print(
        f"RESULT: cold {times[0]:.2f}s -> warm {times[1]:.2f}s "
        f"({speedup:.1f}x), entries={entries} -> {verdict}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
