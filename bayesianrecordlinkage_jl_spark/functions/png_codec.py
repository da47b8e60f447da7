"""Dependency-free media codecs (stdlib zlib/struct + numpy only).

The sandbox has no PIL/opencv/ffmpeg, but PNG's critical path is just
zlib + per-scanline byte filters, and WAV is a RIFF header over raw PCM —
both are fully specified public formats, so the decode slot of the
multimodal pipeline (operators/multimodal.py) can run a REAL kernel:

  * PNG: 8-bit greyscale / grey+alpha / RGB / RGBA, critical chunks only
    (IHDR, IDAT, IEND; ancillary chunks skipped), CRC-validated, all five
    scanline filters (None/Sub/Up/Average/Paeth) on decode, filter 0 on
    encode. No interlacing, no palette, no 16-bit — out of scope for the
    feature-extraction fixture, rejected loudly.
  * WAV: RIFF/PCM parse (8-bit unsigned or 16-bit signed, any channel
    count), 8-bit mono encode.

Reference parity note: the reference repo has no media layer at all —
this backs the beyond-reference training-data operators (SURVEY §6).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"
# PNG color type -> channel count
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_COLOR_OF_CHANNELS = {1: 0, 2: 4, 3: 2, 4: 6}


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png(pixels) -> bytes:
    """8-bit PNG from an (h, w) grey or (h, w, c) array. Filter 0 on every
    scanline (the decoder handles all five, tested with hand-filtered
    fixtures)."""
    arr = np.ascontiguousarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _COLOR_OF_CHANNELS[c], 0, 0, 0)
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 9))
        + _chunk(b"IEND", b"")
    )


def _unfilter(ft: int, line: np.ndarray, prev: np.ndarray, c: int) -> np.ndarray:
    """Reverse one scanline filter. `line` = raw filtered bytes, `prev` =
    unfiltered previous scanline (zeros for the first), `c` = bytes per
    pixel (the 'left neighbor' distance the spec defines filters over)."""
    n = line.size
    cur = line.astype(np.int32)
    if ft == 0:  # None
        return line.copy()
    if ft == 2:  # Up — no left dependency, vectorized
        return ((cur + prev) & 0xFF).astype(np.uint8)
    out = np.zeros(n, dtype=np.int32)
    if ft == 1:  # Sub
        for i in range(n):
            left = out[i - c] if i >= c else 0
            out[i] = (cur[i] + left) & 0xFF
    elif ft == 3:  # Average
        for i in range(n):
            left = out[i - c] if i >= c else 0
            out[i] = (cur[i] + (left + int(prev[i])) // 2) & 0xFF
    elif ft == 4:  # Paeth
        for i in range(n):
            a = out[i - c] if i >= c else 0
            b = int(prev[i])
            cc = int(prev[i - c]) if i >= c else 0
            p = a + b - cc
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
            pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
            out[i] = (cur[i] + pr) & 0xFF
    else:
        raise ValueError(f"unknown PNG filter type {ft}")
    return out.astype(np.uint8)


def decode_png(payload: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced PNG to (h, w) grey or (h, w, c)
    uint8 pixels. CRCs validated; truncated/corrupt streams raise."""
    if payload[:8] != PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, meta, idat = 8, None, []
    while pos + 12 <= len(payload):
        (ln,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        if len(data) != ln:
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack(">I", payload[pos + 8 + ln : pos + 12 + ln])
        if zlib.crc32(tag + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in chunk {tag!r}")
        if tag == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth} (8 only)")
            if color not in _CHANNELS:
                raise ValueError(f"unsupported color type {color}")
            if interlace:
                raise ValueError("interlaced PNG not supported")
            if comp or filt:
                raise ValueError("nonstandard compression/filter method")
            meta = (w, h, _CHANNELS[color])
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if meta is None:
        raise ValueError("missing IHDR")
    w, h, c = meta
    raw = zlib.decompress(b"".join(idat))
    stride = w * c
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT length mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    pos = 0
    for y in range(h):
        ft = raw[pos]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos + 1)
        pos += 1 + stride
        cur = _unfilter(ft, line, prev, c)
        out[y] = cur
        prev = cur
    return out.reshape(h, w) if c == 1 else out.reshape(h, w, c)


def encode_wav_pcm8(samples, sample_rate: int = 8000) -> bytes:
    """Mono 8-bit-unsigned PCM WAV."""
    data = np.ascontiguousarray(samples, dtype=np.uint8).tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate, 1, 8)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Parse a RIFF/PCM WAV. Returns (samples, sample_rate); samples are
    uint8 (8-bit) or int16 (16-bit), shape (n,) mono or (n, channels)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (ln,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        chunk = payload[pos + 8 : pos + 8 + ln]
        if tag == b"fmt ":
            fmt = struct.unpack("<HHIIHH", chunk[:16])
        elif tag == b"data":
            data = chunk
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, rate, _, _, bits = fmt
    if audio_format != 1:
        raise ValueError(f"unsupported WAV format {audio_format} (PCM only)")
    if bits == 8:
        arr = np.frombuffer(data, dtype=np.uint8)
    elif bits == 16:
        arr = np.frombuffer(data, dtype="<i2")
    else:
        raise ValueError(f"unsupported bit depth {bits}")
    if channels > 1:
        arr = arr[: (arr.size // channels) * channels].reshape(-1, channels)
    return arr, rate


# ---------------------------------------------------------------------------
# PNGV: a dependency-free video-frame container (magic + u32 frame count +
# per frame u32 length + PNG bytes). Real containers (mp4/mkv) need codec
# libraries the environment lacks; PNGV keeps the FRAME PIPELINE real —
# container parse, per-frame decode, batch shapes, sampling arithmetic —
# while staying stdlib-only like the PNG/WAV kernels above.

_PNGV_MAGIC = b"PNGV"


def encode_pngv(frames: list) -> bytes:
    """Container-encode a list of uint8 pixel arrays as PNG frames."""
    out = [_PNGV_MAGIC, struct.pack("<I", len(frames))]
    for fr in frames:
        png = encode_png(fr)
        out.append(struct.pack("<I", len(png)))
        out.append(png)
    return b"".join(out)


def pngv_n_frames(payload: bytes) -> int:
    if payload[:4] != _PNGV_MAGIC:
        raise ValueError("not a PNGV container")
    return struct.unpack("<I", payload[4:8])[0]


def decode_pngv_frame(payload: bytes, idx: int) -> np.ndarray:
    """Decode frame `idx` without touching other frames' PNG bytes (the
    container is seekable: length-prefixed frames)."""
    n = pngv_n_frames(payload)
    if not 0 <= idx < n:
        raise IndexError(f"frame {idx} of {n}")
    pos = 8
    for k in range(n):
        (ln,) = struct.unpack("<I", payload[pos : pos + 4])
        if k == idx:
            return decode_png(payload[pos + 4 : pos + 4 + ln])
        pos += 4 + ln
    raise ValueError("truncated PNGV container")
