"""Full-pipeline orchestrator: the ``process_file`` workflow.

TPU-native rebuild of the reference's main driver
(upscale/upscale_processing.py:733-972).  Capability surface preserved:

- scale validation {1,2,4} (:768), ``-m`` chain DSL (:774-789)
- default output name ``input.{N}x.{ext}`` (:819-823)
- temp-dir state machine: ``<temp>/upscale_video``, purge-unless-resume
  (:827-839), ``completed.txt`` short-circuit (:844-845)
- batch math incl. negative batch_size = split-into-N (:857-860)
- per-batch fragments with skip-if-exists resume (:923-926), final concat
  (:962), cleanup-unless-resume (:969-972)
- ``--extract_only`` mid-pipeline checkpoint for sampling (:253-255)

Mechanism replaced: the PNG-per-frame-per-stage data plane and spawn pools
become a **streaming plane** — one sequential decode, frames batched
through a single fused device program (denoise->deblur->SR in one XLA
executable), fragments encoded from device output directly.  The PNG plane
survives as ``data_plane="png"`` for sampling/repair workflows.
"""

from __future__ import annotations

import logging
import os
import shutil
import tempfile
import time
from dataclasses import dataclass
from typing import Optional

import jax.numpy as jnp
import numpy as np

from upscale_video_tpu.pipeline.chain import (
    BatchedStepper, ChainEngine, ChainSpec, default_frames_per_step,
)
from upscale_video_tpu.pipeline import stages
from upscale_video_tpu.utils.logsetup import setup_logging
from upscale_video_tpu.video import ffmpeg as ff
from upscale_video_tpu.video.backend import make_backend
from upscale_video_tpu.video.frames import (
    SENTINEL_COMPLETED,
    calc_batches,
    frames_per_batch,
    has_sentinel,
    write_sentinel,
)

log = logging.getLogger(__name__)

VALID_SCALES = (1, 2, 4)


def default_output_name(input_file: str, scale: int) -> str:
    """``input.{N}x.{ext}`` (reference upscale_processing.py:819-823);
    PNG-dir inputs get a ``.y4m`` container."""
    if os.path.isdir(input_file):
        return input_file.rstrip(os.sep) + f".{scale}x.y4m"
    parts = input_file.split(".")
    return ".".join(parts[:-1] + [f"{scale}x", parts[-1]])


def prepare_workdir(temp_dir: Optional[str], resume: bool) -> str:
    """Create/purge ``<temp>/upscale_video`` (reference :827-839)."""
    base = temp_dir or tempfile.gettempdir()
    workdir = os.path.abspath(os.path.join(base, "upscale_video"))
    if os.path.exists(workdir) and not resume:
        shutil.rmtree(workdir)
    os.makedirs(workdir, exist_ok=True)
    return workdir


@dataclass
class PipelineResult:
    output_file: str
    frames_processed: int
    elapsed_seconds: float
    frames_per_second: float
    pipe_pix: str = "rgb24"  # the RESOLVED stream-plane contract


def process_file(
    input_file: str,
    output_file: Optional[str] = None,
    ffmpeg: Optional[str] = None,
    ffmpeg_encoder: str = "libx264",
    pix_fmt: str = "yuv420p",
    scale: int = 2,
    temp_dir: Optional[str] = None,
    batch_size: int = 10,
    chips: Optional[str] = None,
    resume_processing: bool = False,
    extract_only: bool = False,
    models: Optional[str] = None,
    log_level: Optional[int] = None,
    log_dir: Optional[str] = None,
    model_path: Optional[str] = None,
    precision: str = "auto",
    tile_size: "int | tuple | None" = None,
    halo: int = 16,
    frames_per_step: Optional[int] = None,
    global_quality: Optional[int] = 20,
    data_plane: str = "stream",
    synthetic_models: bool = False,
    conv_impl: str = "auto",
    parallel_mode: str = "dp",
    copy_audio: bool = False,
    pipe_pix: str = "auto",
    tta: bool = False,
    engine: Optional[ChainEngine] = None,
) -> Optional[PipelineResult]:
    """Upscale a video file end to end.  Returns a PipelineResult, or None
    when the resume sentinel short-circuits.

    Beyond-reference flags: ``tile_size``/``halo`` (hardcoded 960/10 in the
    reference, upscale_processing.py:489/:409), ``global_quality``
    (hardcoded 20 at :634), ``precision`` (bf16 MXU fast path vs f32),
    ``frames_per_step`` (on-chip batch), ``data_plane``, ``pipe_pix``
    (``yuv420p`` = the device emits 4:2:0 directly — half the
    device->host bytes, no encoder-side swscale; ops/yuv.py.  The
    default ``auto`` picks yuv420p whenever that is lossless for this
    run — see :func:`_auto_pipe_pix` — and rgb24 otherwise).
    """
    if scale not in VALID_SCALES:
        raise ValueError(f"scale must be one of {VALID_SCALES}")
    if not os.path.exists(input_file):
        raise FileNotFoundError(input_file)

    spec = ChainSpec.parse(models)
    scale = spec.effective_scale(scale)

    setup_logging(log_level, log_dir, input_file)

    # absolutize: FfmpegBackend.concat runs chdir'd into the workdir, so a
    # relative output path would land there and be destroyed by the final
    # workdir cleanup (same hazard _extract_all guards for input_file)
    output_file = os.path.abspath(
        output_file or default_output_name(input_file, scale)
    )
    log.info("processing %s -> %s", input_file, output_file)

    workdir = prepare_workdir(temp_dir, resume_processing)
    if resume_processing and has_sentinel(workdir, SENTINEL_COMPLETED):
        log.info("%s already processed (completed.txt)", input_file)
        return None

    backend = make_backend(
        ffmpeg, ffmpeg_encoder, pix_fmt,
        # fragments carry the OUTPUT container's extension so the concat
        # list references the files that actually exist (reference names
        # its fragments by the output extension too,
        # upscale_processing.py:615-639); deriving from the input ext
        # broke `-o out.mkv` for an .mp4 input at the final concat
        output_format=(output_file.split(".")[-1] if ffmpeg else "y4m"),
        global_quality=global_quality,
    )

    info = backend.probe(input_file, workdir)
    frames_count = info["number_of_frames"]
    crop = backend.crop_detect(input_file, info["duration"], workdir)
    if crop:
        log.info("crop detected: %s", crop)

    per_batch = frames_per_batch(info["frame_rate"], frames_count, batch_size)
    batches = calc_batches(frames_count, per_batch)

    if extract_only:
        _extract_all(backend, input_file, info, crop, workdir, ffmpeg)
        log.info("extract only — frames extraction completed")
        return None

    from upscale_video_tpu.parallel.mesh import initialize_multihost

    n_procs = initialize_multihost()  # no-op outside jointly-scheduled pods
    if n_procs > 1:
        log.info("multi-host pod initialized (%d processes)", n_procs)

    if engine is None:
        from upscale_video_tpu.pipeline.chain import precision_dtypes

        compute_dtype, residual_dtype = precision_dtypes(precision, spec)
        engine = ChainEngine.build(
            spec, scale, model_path=model_path, compute_dtype=compute_dtype,
            tile=tile_size, halo=halo, synthetic=synthetic_models,
            conv_impl=conv_impl, tta=tta, residual_dtype=residual_dtype,
        )  # callers may pass a pre-built engine to reuse compiled programs
    if frames_per_step is None:
        frames_per_step = default_frames_per_step(spec)
    frames_per_step = engine.configure_chips(chips, frames_per_step, parallel_mode)
    log.info("model chain: %s", engine.describe())

    from upscale_video_tpu.utils.wake import keep_awake

    if pipe_pix == "auto":
        pipe_pix = _auto_pipe_pix(backend, engine, info, crop, data_plane)

    t0 = time.time()
    with keep_awake():  # reference holds wakepy for the whole job (:847)
        if data_plane == "png":
            if pipe_pix != "rgb24":
                log.warning(
                    "--pipe_pix %s applies to the stream plane only — the "
                    "png plane encodes from RGB files; ignoring", pipe_pix,
                )
            processed = _run_png_plane(
                engine, backend, input_file, info, crop, workdir, batches,
                frames_per_step, ffmpeg,
            )
        else:
            processed = _run_stream_plane(
                engine, backend, input_file, info, crop, workdir, batches,
                frames_per_step, pipe_pix=pipe_pix,
            )
    elapsed = time.time() - t0

    backend.concat(len(batches), output_file, workdir)
    if copy_audio and ffmpeg:
        _mux_audio(ffmpeg, output_file, input_file)
    write_sentinel(workdir, SENTINEL_COMPLETED, "Completed")
    fps = processed / elapsed if elapsed > 0 else 0.0
    log.info(
        "finished %s: %d frames in %.1fs (%.2f fps)",
        output_file, processed, elapsed, fps,
    )

    if not resume_processing:
        shutil.rmtree(workdir)
    return PipelineResult(output_file, processed, elapsed, fps,
                          pipe_pix=pipe_pix)


def _auto_pipe_pix(backend, engine, info, crop, data_plane) -> str:
    """Resolve ``--pipe_pix auto``: pick the device-side 4:2:0 contract
    (measured 1.60x sustained on a D2H-bound link, 1.55x host plane —
    NOTES.md) whenever it is lossless versus the rgb24 path, else rgb24.

    Every gate here mirrors a hard fallback the explicit ``yuv420p`` mode
    already enforces downstream (_run_stream_plane / the backends); auto
    just turns those fallbacks into the default policy, silently — a
    policy choice is not a user-override worth warning about.  The decode
    side keeps its own probed-pix_fmt gate (backend.open_source), so a
    4:4:4/10-bit SOURCE is never downsampled on input regardless of what
    auto picks for output.
    """
    src_h, src_w = backend.source_geometry(info, crop)
    out_h, out_w = src_h * engine.scale, src_w * engine.scale
    why = None
    if data_plane != "stream":
        why = "png plane encodes from RGB files"
    elif out_h % 2 or out_w % 2:
        why = f"odd output geometry {out_w}x{out_h}"
    elif not backend.auto_yuv420(info):
        why = "encode target is not 4:2:0 8-bit"
    elif getattr(engine, "_mesh_mode", "dp") == "sp" and not (
        engine.planar_scale and engine.planar_scale % 2 == 0
    ):
        why = "sp row-sharding needs the even planar contract"
    if why is not None:
        log.info("pipe_pix auto -> rgb24 (%s)", why)
        return "rgb24"
    log.info("pipe_pix auto -> yuv420p (4:2:0 device contract, "
             "half the transfer bytes each way)")
    return "yuv420p"


def _mux_audio(ffmpeg, output_file, input_file) -> None:
    """Stream-copy the source's audio/subs into the upscaled output
    (beyond reference: its concat output is video-only)."""
    tmp = output_file + ".mux.tmp" + os.path.splitext(output_file)[1]
    result = ff.run_logged(ff.mux_audio_cmd(ffmpeg, output_file, input_file, tmp))
    if result.returncode != 0 or not os.path.exists(tmp):
        if os.path.exists(tmp):
            os.remove(tmp)
        log.warning("audio mux failed (output kept video-only): %s",
                    (result.stderr or "")[-200:])
        return
    os.replace(tmp, output_file)
    log.info("muxed original audio/subtitle streams into %s", output_file)


def _extract_all(backend, input_file, info, crop, workdir, ffmpeg) -> int:
    """Spill every frame as ``{n}.extract.png`` (reference :203-255)."""
    from upscale_video_tpu.video.backend import FfmpegBackend

    if isinstance(backend, FfmpegBackend):
        cwd = os.getcwd()
        os.chdir(workdir)
        try:
            result = ff.run_logged(ff.extract_cmd(ffmpeg, os.path.join(cwd, input_file)
                                                  if not os.path.isabs(input_file) else input_file,
                                                  crop))
            if result.returncode != 0:
                raise RuntimeError(f"frame extraction failed: {result.stderr[-400:]}")
        finally:
            os.chdir(cwd)
        return info["number_of_frames"]
    with backend.open_source(input_file, info, crop) as src:
        return stages.extract_to_pngs(src, workdir)


def _run_stream_plane(
    engine, backend, input_file, info, crop, workdir, batches, frames_per_step,
    pipe_pix: str = "rgb24",
) -> int:
    """Streaming loop: sequential decode -> fused device program ->
    fragment encoders, with skip-if-exists resume per fragment."""
    from upscale_video_tpu.parallel.executor import AsyncSink, PrefetchSource
    from upscale_video_tpu.utils.profiling import StageTimer

    src_h, src_w = backend.source_geometry(info, crop)
    out_h, out_w = src_h * engine.scale, src_w * engine.scale
    yuv420 = pipe_pix == "yuv420p"
    if yuv420 and (out_h % 2 or out_w % 2):
        log.warning(
            "--pipe_pix yuv420p needs even output geometry, got %dx%d — "
            "falling back to rgb24", out_w, out_h,
        )
        yuv420 = False
    processed = 0
    timer = StageTimer()

    # resume: seek straight past the contiguous completed-fragment prefix
    # (time-based -ss / file skip — O(1) in prefix length, unlike the
    # decode-and-discard this replaces); interior gaps after the prefix
    # still fast-forward by reading (rare: only a hand-deleted fragment)
    first_todo = 1
    while first_todo <= len(batches) and os.path.exists(
        os.path.join(workdir, backend.fragment_name(first_todo))
    ):
        first_todo += 1
    if first_todo > len(batches):
        log.info("all %d fragments exist, nothing to upscale", len(batches))
        return 0
    start_frame = batches[first_todo][0]
    if start_frame > 1:
        log.info("resume: %d fragments done, seeking to frame %d",
                 first_todo - 1, start_frame)

    # shuffle-planar contract: the device skips the pixel-shuffle
    # interleave (hostile relayout, ~6.5 ms/frame at 4K); the sink thread
    # interleaves instead (overlapped with device compute)
    planar = engine.planar_scale
    # resume: fragments already on disk fix the contract — a mismatch
    # would only surface at the final concat, after all the compute
    existing = backend.fragment_yuv420(workdir, 1)
    if existing is not None and existing != yuv420:
        log.warning(
            "resume: existing fragments use the %s contract — continuing "
            "with that instead of the requested --pipe_pix",
            "yuv420" if existing else "rgb24",
        )
        yuv420 = existing
    if yuv420 and getattr(engine, "_mesh_mode", "dp") == "sp" and not (
        planar and planar % 2 == 0
    ):
        # sp row-sharding pads H to the chip count with no evenness
        # guarantee, and the packed half-res grid breaks its crop ratio
        # for the full-frame contract — only the planar packed grid (LR
        # rows, one packed row per input row) composes with sp
        log.warning(
            "--pipe_pix yuv420p under --parallel sp needs the planar "
            "contract (unavailable here) — falling back to rgb24",
        )
        yuv420 = False
    # the decode source opens before the step is built: under the 4:2:0
    # contract the INPUT side converts on device too when the stream
    # supports it (flat I420 straight from the decoder — half the H2D
    # bytes, zero host/decoder colour work; ops/yuv.i420_to_model)
    inner_src = backend.open_source(
        input_file, info, crop, start_frame=start_frame,
        # a flat I420 buffer has no row axis for sp's H-sharding spec
        # (chain.py owns the policy)
        raw_i420=(yuv420 and src_h % 2 == 0 and src_w % 2 == 0
                  and engine.input_rank_flexible),
    )
    i420_in = ((src_h, src_w, inner_src.i420_full_range)
               if getattr(inner_src, "raw_i420", False) else None)

    try:
        if yuv420:
            # 4:2:0 output contract: the step emits packed [Y|Cb|Cr]
            # planes (ops/yuv.py) — half the D2H bytes, no encoder-side
            # swscale; the sink thread assembles the contiguous I420
            # buffer
            from upscale_video_tpu.ops.yuv import packed_to_i420

            use_planar = bool(planar) and planar % 2 == 0
            step_fn = engine.yuv_step(backend.yuv_full_range,
                                      planar=use_planar, i420_in=i420_in)
            pack_s = planar if use_planar else 2
            _ybuf = []
            total = out_h * out_w * 3 // 2

            def transform(p):  # noqa: E306
                if not _ybuf:
                    _ybuf[:] = [np.empty((total,), np.uint8)]
                return packed_to_i420(p, pack_s, out=_ybuf[0])

            log.info(
                "yuv420 output contract active (%s range%s%s)",
                "full" if backend.yuv_full_range else "limited",
                f", planar s={planar}" if use_planar else "",
                ", i420 input" if i420_in else "",
            )
        elif planar:
            from upscale_video_tpu.ops.pixel import planar_to_frames

            step_fn = engine.planar_step
            # one reused interleave target: transform and the sink's write
            # run sequentially on the writer thread (the pipe ring memcpys
            # on submit), so the buffer is free again by the next frame —
            # a fresh 25 MB alloc per 4K frame measurably stalls small
            # hosts
            _ibuf = []

            def transform(p):  # noqa: E306
                if not _ibuf or _ibuf[0].shape[0] != p.shape[0] * planar:
                    _ibuf[:] = [np.empty(
                        (p.shape[0] * planar, p.shape[1] * planar, 3),
                        np.uint8
                    )]
                return planar_to_frames(p, planar, out=_ibuf[0])

            log.info("planar output contract active (s=%d)", planar)
        else:
            step_fn = engine.step
            transform = None
    except BaseException:
        # a live decoder pipe must not outlive a failed step build
        # (orphaned ffmpeg blocked writing a full pipe + reader thread)
        inner_src.close()
        raise

    source = PrefetchSource(inner_src, depth=2 * frames_per_step)
    try:
        for batch, (start, end) in batches.items():
            if batch < first_todo:
                continue  # before the seek point; nothing was decoded
            frag = os.path.join(workdir, backend.fragment_name(batch))
            if os.path.exists(frag):
                # interior gap: fast-forward the decoder past this fragment
                for _ in range(start, end + 1):
                    if source.read() is None:
                        break
                log.info("batch %d exists, skipped", batch)
                continue
            sink = AsyncSink(
                backend.open_fragment_sink(batch, out_w, out_h, info, workdir,
                                           yuv420=yuv420),
                depth=2 * frames_per_step,
                transform=transform,
            )
            stepper = BatchedStepper(step_fn, frames_per_step)
            wrote = 0
            ended_early = False
            try:
                try:
                    for f in range(start, end + 1):
                        with timer.stage("decode", 1):
                            frame = source.read()
                        if frame is None:
                            log.warning("stream ended early at frame %d", f)
                            ended_early = True
                            break
                        with timer.stage("infer"):
                            outs = stepper.feed(frame)
                        with timer.stage("encode", len(outs)):
                            for out in outs:
                                sink.write(out)
                                wrote += 1
                    with timer.stage("infer"):
                        outs = stepper.flush()
                    with timer.stage("encode", len(outs)):
                        for out in outs:
                            sink.write(out)
                            wrote += 1
                finally:
                    sink.close()
            except Exception:
                # never leave a partial fragment for resume to trust
                # (reference deletes it at upscale_processing.py:653-654)
                if os.path.exists(frag):
                    os.remove(frag)
                raise
            if ended_early:
                # probe metadata overstated the frame count (VFR/imprecise
                # containers): never leave short/empty fragments for resume
                # and concat to trust as complete
                if os.path.exists(frag):
                    os.remove(frag)
                processed += wrote
                raise RuntimeError(
                    f"decoded stream ended at frame {start + wrote - 1} but "
                    f"the probe reported {batches[len(batches)][1]} frames; "
                    f"batch {batch}'s fragment was discarded — re-probe or "
                    "fix the source, then resume"
                )
            processed += wrote
            log.info("batch %d: %d frames upscaled+encoded", batch, wrote)
    finally:
        source.close()
    timer.log_summary()
    return processed


def _run_png_plane(
    engine, backend, input_file, info, crop, workdir, batches,
    frames_per_step, ffmpeg,
) -> int:
    """Reference-layout plane: extract PNGs, stage passes with tagged
    artifacts, fragment encode from final PNGs (upscale_processing.py
    :866-959 semantics, device-batched instead of process pools)."""
    frames_count = info["number_of_frames"]
    all_frames = range(1, frames_count + 1)

    last_frag = os.path.join(workdir, backend.fragment_name(len(batches)))
    need_extract = not any(
        os.path.exists(os.path.join(workdir, f"{frames_count}.{t}.png"))
        for t in ("extract", "denoise", "anime")
    ) and not os.path.exists(last_frag)
    if need_extract:
        _extract_all(backend, input_file, info, crop, workdir, ffmpeg)

    in_tag = stages.run_chain_stages(engine, workdir, all_frames,
                                     frames_per_step)

    processed = 0
    for batch, (start, end) in batches.items():
        frag = os.path.join(workdir, backend.fragment_name(batch))
        if os.path.exists(frag):
            continue
        if engine.scale == 1:
            stages.rename_stage_to_final(workdir, range(start, end + 1), in_tag)
        else:
            stages.run_stage_pass(
                workdir, range(start, end + 1), in_tag, "",
                engine.stage_fn("sr"), frames_per_step,
                progress_label=f"Upscaling batch {batch}:",
            )
        src_h, src_w = backend.source_geometry(info, crop)
        sink = backend.open_fragment_sink(
            batch, src_w * engine.scale, src_h * engine.scale, info, workdir,
        )
        try:
            try:
                stages.pngs_to_sink(workdir, start, end, sink)
            finally:
                sink.close()
        except Exception:
            if os.path.exists(frag):
                os.remove(frag)
            raise
        for f in range(start, end + 1):
            os.remove(os.path.join(workdir, f"{f}.png"))
        processed += end - start + 1
        log.info("batch %d merged (%d frames total)", batch, end)
    return processed
