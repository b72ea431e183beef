"""PNG-compat data plane: per-stage passes over the frame store.

Reproduces the reference's stage semantics — each pass reads
``{frame}.{in_tag}.png``, writes ``{frame}.{out_tag}.png``, and deletes its
input on success so file existence encodes per-frame progress
(upscale_processing.py:295-296, 358-359, 521-522; pool drivers at
:302-347, :364-392, :545-601).  Instead of spawn pools of GPU workers,
frames are batched through one jitted device program via
:class:`~upscale_video_tpu.pipeline.chain.BatchedStepper`.

This plane exists for the workflows that *need* on-disk artifacts:
``--extract_only`` sampling, ``fix-frames`` repair, ``test-images``
parameter sweeps, and the zip-based split-machine hand-off.
"""

from __future__ import annotations

import logging
import os
from typing import Callable, Iterable, List, Optional, Sequence

import numpy as np
from PIL import Image

from upscale_video_tpu.pipeline.chain import BatchedStepper
from upscale_video_tpu.video.frames import frame_name

log = logging.getLogger(__name__)


def _read_png(path: str) -> np.ndarray:
    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"))


def run_stage_pass(
    workdir: str,
    frames: Sequence[int],
    in_tag: str,
    out_tag: str,
    step_fn: Callable,
    frames_per_step: int = 4,
    remove: bool = True,
    progress_label: str = "",
) -> int:
    """Run one model stage over the frame store; returns frames processed.

    Skips frames whose input artifact is missing (exactly the reference's
    ``os.path.exists`` guard at upscale_processing.py:339, 585 — missing
    means an earlier resume already consumed it).
    """
    todo: List[int] = []
    for f in frames:
        if os.path.exists(os.path.join(workdir, frame_name(f, in_tag))):
            todo.append(f)
    if not todo:
        return 0

    stepper = BatchedStepper(step_fn, frames_per_step)
    pending: List[int] = []
    done = 0

    def _write(outputs: List[np.ndarray]):
        nonlocal done
        for out in outputs:
            f = pending.pop(0)
            Image.fromarray(out).save(os.path.join(workdir, frame_name(f, out_tag)))
            if remove:
                os.remove(os.path.join(workdir, frame_name(f, in_tag)))
            done += 1
            if progress_label:
                log.info("%s %d/%d", progress_label, done, len(todo))

    for f in todo:
        img = _read_png(os.path.join(workdir, frame_name(f, in_tag)))
        pending.append(f)
        _write(stepper.feed(img))
    _write(stepper.flush())
    return done


def extract_to_pngs(source, workdir: str, tag: str = "extract") -> int:
    """Hermetic extraction: stream a FrameSource into ``{n}.extract.png``
    (the ffmpeg backend uses extract_cmd instead; reference
    upscale_processing.py:203-255)."""
    n = 0
    for frame in source:
        n += 1
        Image.fromarray(frame).save(os.path.join(workdir, frame_name(n, tag)))
    return n


def pngs_to_sink(workdir: str, start: int, end: int, sink) -> None:
    """Feed final ``{n}.png`` frames into a fragment sink (hermetic
    replacement for the image2-sequence encode at
    upscale_processing.py:615-639).

    On any decode/encode failure, scans the batch for corrupt PNGs and
    raises with the ``fix-frames -b`` repair hint (reference behaviour at
    upscale_processing.py:650-672).
    """
    try:
        for f in range(start, end + 1):
            sink.write(_read_png(os.path.join(workdir, frame_name(f))))
    except Exception as e:
        from upscale_video_tpu.video.frames import format_frame_ranges

        bad = []
        from PIL import Image

        for f in range(start, end + 1):
            path = os.path.join(workdir, frame_name(f))
            try:
                with Image.open(path) as im:
                    im.verify()
            except Exception:
                bad.append(f)
        hint = (
            f"; corrupt frames detected: run fix-frames -b "
            f"{format_frame_ranges(bad)}" if bad else ""
        )
        raise RuntimeError(f"fragment encode failed ({e}){hint}") from e


def rename_stage_to_final(workdir: str, frames: Iterable[int], in_tag: str) -> None:
    """scale==1 path: the last stage's artifact IS the final frame
    (reference upscale_processing.py:928-932)."""
    for f in frames:
        os.rename(
            os.path.join(workdir, frame_name(f, in_tag)),
            os.path.join(workdir, frame_name(f)),
        )

def run_chain_stages(engine, workdir, frames, frames_per_step, remove=True):
    """Denoise -> anime pre-SR passes over the PNG store; returns the final
    input tag.  The ONE place the PNG plane's stage order lives — shared by
    process_file's png plane and the upscale_only/fix_frames/process_image
    workflows (reference stage sequence at upscale_processing.py:883-909).
    """
    in_tag = "extract"
    if engine.spec.denoise:
        log.info("starting denoise touchup...")
        run_stage_pass(
            workdir, frames, in_tag, "denoise", engine.stage_fn("denoise"),
            frames_per_step, remove=remove, progress_label="Denoised",
        )
        in_tag = "denoise"
    if engine.spec.anime:
        log.info("starting anime touchup...")
        run_stage_pass(
            workdir, frames, in_tag, "anime", engine.stage_fn("anime"),
            frames_per_step, remove=remove, progress_label="Deblurred",
        )
        in_tag = "anime"
    return in_tag
