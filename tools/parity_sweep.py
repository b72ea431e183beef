"""On-chip parity sweep: every model chain vs its oracle (VERDICT round-3
item 4).

The ncnn/Vulkan ground truth is unreachable in this image (SURVEY.md §4),
so the oracle stack is:

- CPU f32 execution of the SAME fused chain program (JAX CPU backend,
  HIGHEST precision) — catches TPU-compilation/Mosaic/XLA-TPU deviations,
  which is precisely what "on-chip parity" must certify;
- the independent numpy executor (models/numpy_ref.py) certifies the
  chain program itself in the hermetic suite (tests/test_executor.py).

Phases (one JAX backend per process): ``--phase oracle`` runs on CPU and
saves outputs; the default run spawns that subprocess, then runs the TPU
phase and prints one markdown row per chain: max u8 LSB diff (TPU f32 vs
CPU f32) and PSNR (TPU bf16 vs f32 oracle).

Real pretrained weights: set UPSCALE_TPU_MODEL_PATH=/root/reference/models
(Valar's .bin is absent upstream -> architecture-faithful synthetic
stand-in, seed-pinned so both phases build identical weights).
"""

import argparse
import os
import subprocess
import sys

import numpy as np

CHAINS = [
    # (label, models DSL, scale, synthetic, mode)
    # mode: "rgb" = uint8 frames step; "yuv" = the symmetric 4:2:0
    # contract (flat I420 in -> packed 4:2:0 out; ops/yuv.py)
    ("compact-2x", None, 2, False, "rgb"),
    ("compact-4x", None, 4, False, "rgb"),
    ("anime-1x", "a", 1, False, "rgb"),
    ("denoise-n3", "n=3", 1, False, "rgb"),
    ("chain-a-n3-2x", "a,n=3", 2, False, "rgb"),
    ("valar-4x-synth", "r", 4, True, "rgb"),
    ("compact-2x-yuv420-io", None, 2, False, "yuv"),
    ("chain-a-n3-2x-yuv420-io", "a,n=3", 2, False, "yuv"),
]


def make_input(h=72, w=96):
    rng = np.random.default_rng(7)
    small = rng.integers(0, 256, ((h + 3) // 4, (w + 3) // 4, 3), np.uint8)
    img = np.repeat(np.repeat(small, 4, 0), 4, 1)[:h, :w]
    return img[None]  # (1, H, W, 3)


def build_engine(models, scale, synthetic, dtype):
    from upscale_video_tpu.pipeline.chain import (
        ChainEngine, ChainSpec, precision_dtypes,
    )

    compute_dtype, residual_dtype = precision_dtypes(dtype)
    return ChainEngine.build(
        ChainSpec.parse(models), scale,
        compute_dtype=compute_dtype,
        residual_dtype=residual_dtype,
        synthetic=synthetic,
    )


def run_chains(dtype):
    x = make_input()
    outs = {}
    for label, models, scale, synthetic, mode in CHAINS:
        eng = build_engine(models, scale, synthetic, dtype)
        if mode == "yuv":
            import jax.numpy as jnp

            from upscale_video_tpu.ops.yuv import (
                packed_to_i420, yuv420_from_frames,
            )

            h, w = x.shape[1], x.shape[2]
            flat = np.stack([
                packed_to_i420(p, 2) for p in
                np.asarray(yuv420_from_frames(jnp.asarray(x), True))
            ])
            use_planar = bool(eng.planar_scale) and eng.planar_scale % 2 == 0
            step = eng.yuv_step(True, planar=use_planar,
                                i420_in=(h, w, True))
            outs[label] = np.asarray(step(jnp.asarray(flat)))
        else:
            outs[label] = np.asarray(eng.step(x))
        print(f"  [{dtype}] {label}: {outs[label].shape}",
              file=sys.stderr, flush=True)
    return outs


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--phase", choices=["oracle", "tpu"], default=None)
    p.add_argument("--oracle_file", default="/tmp/parity_oracle.npz")
    p.add_argument("--mixed", action="store_true",
                   help="also run --precision mixed (bf16 convs, f32 "
                        "residual spine) and print its PSNR column — "
                        "the -m r quality/speed middle path")
    args = p.parse_args()

    if args.phase == "oracle":
        # this image's jax plugin ignores the JAX_PLATFORMS env var
        # (verify-skill gotcha); the config API before first backend use
        # is authoritative
        import jax

        jax.config.update("jax_platforms", "cpu")
        outs = run_chains("f32")
        np.savez(args.oracle_file, **outs)
        return 0

    if args.phase is None:
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        print("running CPU oracle phase...", file=sys.stderr, flush=True)
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--phase", "oracle",
             "--oracle_file", args.oracle_file],
            check=True, env=env,
        )

    oracle = dict(np.load(args.oracle_file))
    tpu_f32 = run_chains("f32")
    tpu_bf16 = run_chains("bf16")
    tpu_mixed = run_chains("mixed") if args.mixed else None

    from upscale_video_tpu.ops.pixel import psnr

    mix_head = " PSNR dB (TPU mixed vs f32 oracle) |" if args.mixed else ""
    print("\n| chain | maxLSB (TPU f32 vs CPU f32) | PSNR dB (TPU bf16 vs "
          "f32 oracle) |" + mix_head)
    print("|---|---|---|" + ("---|" if args.mixed else ""))
    for label, _, _, _, _ in CHAINS:
        lsb = int(np.max(np.abs(
            tpu_f32[label].astype(np.int32) - oracle[label].astype(np.int32)
        )))
        q = psnr(tpu_bf16[label], oracle[label])
        mix_col = ""
        if args.mixed:
            mix_col = f" {psnr(tpu_mixed[label], oracle[label]):.1f} |"
        print(f"| {label} | {lsb} | {q:.1f} |" + mix_col, flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
