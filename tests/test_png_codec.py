"""Dependency-free PNG/WAV codec tests (pure Python, no Spark)."""

import struct
import zlib

import numpy as np
import pytest

from bayesianrecordlinkage_jl_spark.functions.png_codec import (
    PNG_SIG,
    _chunk,
    decode_png,
    decode_wav,
    encode_png,
    encode_wav_pcm8,
)


@pytest.mark.parametrize("shape", [(1, 1), (5, 3), (16, 16), (7, 13, 3), (4, 6, 4), (3, 3, 2)])
def test_png_round_trip(shape):
    rng = np.random.default_rng(hash(shape) % 2**32)
    arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
    out = decode_png(encode_png(arr))
    assert out.shape == arr.shape
    assert (out == arr).all()


def _png_with_filters(arr: np.ndarray, filters: list[int]) -> bytes:
    """Hand-build a PNG whose scanlines use the given filter types — the
    encoder always emits filter 0, so this exercises the decoder's
    Sub/Up/Average/Paeth reconstruction against a reference forward
    filter implemented independently here."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    raw = b""
    prev = np.zeros(w * c, dtype=np.int32)
    for y in range(h):
        cur = arr[y].ravel().astype(np.int32)
        ft = filters[y % len(filters)]
        filt = np.zeros(w * c, dtype=np.int32)
        for i in range(w * c):
            a = int(cur[i - c]) if i >= c else 0
            b = int(prev[i])
            cc = int(prev[i - c]) if i >= c else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) // 2
            else:
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
            filt[i] = (cur[i] - pred) & 0xFF
        raw += bytes([ft]) + filt.astype(np.uint8).tobytes()
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("filters", [[1], [2], [3], [4], [0, 1, 2, 3, 4]])
@pytest.mark.parametrize("channels", [1, 3])
def test_png_decoder_all_filters(filters, channels):
    rng = np.random.default_rng(7 * channels + filters[0])
    shape = (9, 11) if channels == 1 else (9, 11, channels)
    arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
    out = decode_png(_png_with_filters(arr, filters))
    assert (out == arr).all()


def test_png_rejects_garbage_and_corruption():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"xx")
    good = encode_png(np.zeros((4, 4), dtype=np.uint8))
    bad = bytearray(good)
    bad[40] ^= 0xFF  # flip a byte inside IDAT -> CRC must catch it
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(bad))
    with pytest.raises(ValueError):
        decode_png(good[:20])  # truncated


def test_wav_round_trip_and_16bit():
    s = (np.arange(300) * 7 % 256).astype(np.uint8)
    payload = encode_wav_pcm8(s, sample_rate=8000)
    out, rate = decode_wav(payload)
    assert rate == 8000
    assert (out == s).all()
    # hand-built 16-bit stereo
    pcm = (np.arange(64, dtype=np.int16) * 321 - 9000).astype("<i2")
    data = pcm.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 2, 44100, 44100 * 4, 4, 16)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    out, rate = decode_wav(payload)
    assert rate == 44100
    assert out.shape == (32, 2)
    assert (out.ravel() == pcm).all()
    with pytest.raises(ValueError):
        decode_wav(b"nonsense")


def test_pngv_container_roundtrip():
    import numpy as np

    from bayesianrecordlinkage_jl_spark.functions.png_codec import (
        decode_pngv_frame,
        encode_pngv,
        pngv_n_frames,
    )

    frames = [
        ((np.arange(48, dtype=np.uint8) * k + 7) % 256).reshape(6, 8)
        for k in range(1, 4)
    ]
    b = encode_pngv(frames)
    assert pngv_n_frames(b) == 3
    for k in range(3):
        assert (decode_pngv_frame(b, k) == frames[k]).all()
    import pytest

    with pytest.raises(IndexError):
        decode_pngv_frame(b, 3)
    with pytest.raises(ValueError):
        pngv_n_frames(b"nope" + b[4:])
