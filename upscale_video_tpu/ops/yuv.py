"""YUV 4:2:0 output contract: halve device->host bytes, skip swscale.

The stream plane normally ships uint8 RGB (or shuffle-planar RGB) to the
host and lets the encoder convert to its native 4:2:0 (ffmpeg swscale does
this for every frame the reference or this framework pipes in as rgb24).
That conversion is pure epilogue math the TPU can fuse into the step for
free — and emitting 4:2:0 directly cuts the device->host transfer from
12 to 6 bytes per 4 output pixels (2x) and deletes the host-side
conversion work entirely.  With several chips per host the D2H + swscale
stream is the scaling ceiling (24 fps/chip x 25 MB/frame = 600 MB/s per
chip before this), so the contract is a first-class production knob
(``--pipe_pix yuv420p``); the default stays rgb24, whose bytes match the
reference's encode input bit-for-bit.

Layout: one packed uint8 array per frame on the low-res grid —
``(N, H, W, s*s + 2*(s//2)**2)`` with channels ``[Y(i,j) | Cb(p,q) |
Cr(p,q)]`` — so the flagship s=2 planar path needs NO device relayout at
all (the 2x2 Y block and the single chroma sample of one LR pixel are
exactly that pixel's shuffle positions).  The host interleaves Y (1-byte
planar_to_frames) and chroma into a contiguous I420 buffer on the sink
thread, overlapped with device compute (ops/pixel.planar_to_frames
precedent).

Conversion is BT.601 from the final uint8 RGB (identical input to what
swscale would see), chroma box-averaged over each 2x2 (convert-then-
average); ``full_range=True`` emits JPEG levels (Y4M ``C420jpeg``),
``False`` emits studio/limited levels (what ``-pix_fmt yuv420p`` rawvideo
feeds expect by default).  Chroma siting is the 2x2 box center; swscale's
default siting is left-aligned — a sub-pixel chroma phase difference well
inside the encoder's own chroma loss (tested >= 38 dB vs the rgb24 path
end to end).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

# BT.601 luma; full-range chroma scale factors
_KR, _KG, _KB = 0.299, 0.587, 0.114
_CB_K = 0.5 / (1.0 - _KB)
_CR_K = 0.5 / (1.0 - _KR)
# limited (studio) range: Y 16..235, C 16..240
_Y_SCALE, _Y_OFF = 219.0 / 255.0, 16.0
_C_SCALE = 224.0 / 255.0


def _encode(r, g, b, full_range: bool):
    """RGB (f32, 0..255) -> (y, cb_centered, cr_centered) f32; chroma is
    returned WITHOUT the +128 offset so callers can average first."""
    y = _KR * r + _KG * g + _KB * b
    cb = (b - y) * _CB_K
    cr = (r - y) * _CR_K
    if not full_range:
        y = _Y_OFF + y * _Y_SCALE
        cb = cb * _C_SCALE
        cr = cr * _C_SCALE
    return y, cb, cr


def _quant(x):
    return jnp.clip(jnp.round(x), 0.0, 255.0).astype(jnp.uint8)


def yuv420_from_planar(p: jnp.ndarray, s: int,
                       full_range: bool = False) -> jnp.ndarray:
    """Shuffle-planar uint8 RGB ``(N, H, W, 3*s*s)`` (the planar-tail
    contract, (i, j, c) channel order with c fastest) -> packed 4:2:0
    ``(N, H, W, s*s + 2*(s//2)**2)``.  ``s`` must be even (4:2:0 needs
    even output dims)."""
    if s % 2:
        raise ValueError(f"yuv420 planar contract needs even s, got {s}")
    n, h, w, c = p.shape
    if c != 3 * s * s:
        raise ValueError(f"{c} channels != 3*{s}*{s}")
    cs = s // 2
    x = p.astype(jnp.float32).reshape(n, h, w, s * s, 3)
    y, cb, cr = _encode(x[..., 0], x[..., 1], x[..., 2], full_range)
    # chroma: average each 2x2 block of shuffle positions (i, j)
    def pool(u):
        v = u.reshape(n, h, w, cs, 2, cs, 2)
        v = v.mean(axis=(4, 6))
        return v.reshape(n, h, w, cs * cs)

    return jnp.concatenate(
        [_quant(y), _quant(pool(cb) + 128.0), _quant(pool(cr) + 128.0)],
        axis=-1,
    )


def yuv420_from_frames(f: jnp.ndarray,
                       full_range: bool = False) -> jnp.ndarray:
    """uint8 RGB frames ``(N, H, W, 3)`` (H, W even) -> packed 4:2:0 on the
    half-res grid ``(N, H//2, W//2, 6)`` = [Y 2x2 block | Cb | Cr] — the
    same packed class as :func:`yuv420_from_planar` with s=2, so the host
    assembly below serves both contracts."""
    n, h, w, c = f.shape
    if c != 3 or h % 2 or w % 2:
        raise ValueError(f"yuv420 needs (N, even, even, 3); got {f.shape}")
    x = f.astype(jnp.float32)
    y, cb, cr = _encode(x[..., 0], x[..., 1], x[..., 2], full_range)
    # space-to-depth the luma into 2x2 blocks; box-average the chroma
    y = y.reshape(n, h // 2, 2, w // 2, 2).transpose(0, 1, 3, 2, 4)
    y = y.reshape(n, h // 2, w // 2, 4)
    cb = cb.reshape(n, h // 2, 2, w // 2, 2).mean(axis=(2, 4))[..., None]
    cr = cr.reshape(n, h // 2, 2, w // 2, 2).mean(axis=(2, 4))[..., None]
    return jnp.concatenate(
        [_quant(y), _quant(cb + 128.0), _quant(cr + 128.0)], axis=-1
    )


def packed_to_i420(packed: np.ndarray, s: int,
                   out: Optional[np.ndarray] = None) -> np.ndarray:
    """Host side: one packed frame ``(H, W, s*s + 2*(s//2)**2)`` ->
    contiguous I420 bytes ``(H*s*W*s*3//2,)`` (Y plane, Cb, Cr).

    Runs on the sink thread (AsyncSink transform), like the RGB planar
    interleave; ``out`` reuses a caller buffer on the hot path."""
    from upscale_video_tpu.native.imgproc import (
        native_available, planar_interleave_view,
    )
    from upscale_video_tpu.ops.pixel import planar_to_frames

    h, w, c = packed.shape
    cs = s // 2
    if c != s * s + 2 * cs * cs:
        raise ValueError(f"{c} channels != packed 4:2:0 for s={s}")
    oh, ow = h * s, w * s
    total = oh * ow * 3 // 2
    if out is None:
        out = np.empty((total,), np.uint8)
    elif out.shape != (total,) or out.dtype != np.uint8:
        raise ValueError(f"out buffer {out.shape}/{out.dtype} mismatch")
    y = out[: oh * ow].reshape(oh, ow, 1)
    chw, cww = oh // 2, ow // 2
    cb = out[oh * ow: oh * ow + chw * cww].reshape(chw, cww, 1)
    cr = out[oh * ow + chw * cww:].reshape(chw, cww, 1)
    # the channel sections are strided VIEWS of the packed buffer: the
    # native stride-aware interleave reads them in place — forcing each
    # plane contiguous first would copy ~oh*ow bytes per 4K frame on the
    # sink hot path, giving back part of the contract's savings
    native = (native_available()
              if packed.dtype == np.uint8 and packed.flags.c_contiguous
              else False)
    if native:
        planar_interleave_view(packed[..., : s * s], s, 1, out=y)
    else:
        planar_to_frames(np.ascontiguousarray(packed[..., : s * s]), s, out=y)
    if cs == 1:
        np.copyto(cb, packed[..., s * s: s * s + 1])
        np.copyto(cr, packed[..., s * s + 1:])
    elif native:
        planar_interleave_view(
            packed[..., s * s: s * s + cs * cs], cs, 1, out=cb)
        planar_interleave_view(packed[..., s * s + cs * cs:], cs, 1, out=cr)
    else:
        planar_to_frames(
            np.ascontiguousarray(packed[..., s * s: s * s + cs * cs]),
            cs, out=cb)
        planar_to_frames(
            np.ascontiguousarray(packed[..., s * s + cs * cs:]), cs, out=cr)
    return out


def i420_frame_bytes(width: int, height: int) -> int:
    if width % 2 or height % 2:
        raise ValueError(f"I420 needs even geometry, got {width}x{height}")
    return width * height * 3 // 2


def i420_to_model(flat: jnp.ndarray, h: int, w: int,
                  full_range: bool = False,
                  channel_order: str = "bgr") -> jnp.ndarray:
    """Device-side 4:2:0 INPUT contract: flat I420 uint8 ``(N, h*w*3//2)``
    (exactly the decoder's native buffer — no host colour work at all) ->
    float32 model-domain frames ``(N, h, w, 3)`` in [0, 1].

    Slicing the flat buffer into planes is free on device (contiguous
    reshapes), the 2x chroma upsample is a nearest ``repeat`` (cheap VPU
    work, fusable — NOT a pixel-shuffle-class relayout), and the BT.601
    inverse + /255 + BGR flip fuse into the first conv's input processing
    like frames_to_model's epilogue does.  Nearest chroma siting matches
    the hermetic Y4M reader; one fewer uint8 rounding than decoding to
    RGB first."""
    n = flat.shape[0]
    hw = h * w
    y = flat[:, :hw].reshape(n, h, w).astype(jnp.float32)
    cb = flat[:, hw:hw + hw // 4].reshape(n, h // 2, w // 2)
    cr = flat[:, hw + hw // 4:].reshape(n, h // 2, w // 2)
    up = lambda u: jnp.repeat(  # noqa: E731
        jnp.repeat(u.astype(jnp.float32), 2, axis=1), 2, axis=2)
    cb = up(cb) - 128.0
    cr = up(cr) - 128.0
    if not full_range:
        y = (y - _Y_OFF) / _Y_SCALE
        cb = cb / _C_SCALE
        cr = cr / _C_SCALE
    r = y + cr / _CR_K
    b = y + cb / _CB_K
    g = (y - _KR * r - _KB * b) / _KG
    chans = (b, g, r) if channel_order == "bgr" else (r, g, b)
    rgb = jnp.stack(chans, axis=-1)
    return jnp.clip(rgb / 255.0, 0.0, 1.0)
