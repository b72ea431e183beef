"""Video I/O: ffmpeg integration, hermetic Y4M/PNG codecs, frame store."""

from upscale_video_tpu.video.io import (
    FrameSink,
    FrameSource,
    PngDirSink,
    PngDirSource,
    Y4MSink,
    Y4MSource,
    open_sink,
    open_source,
)

__all__ = [
    "FrameSource",
    "FrameSink",
    "Y4MSource",
    "Y4MSink",
    "PngDirSource",
    "PngDirSink",
    "open_source",
    "open_sink",
]
