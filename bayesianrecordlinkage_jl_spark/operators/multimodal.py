"""Multimodal (image/audio/video) column plumbing.

Media payloads ride as opaque `binary` columns with typed metadata structs;
decode / feature-extract / resize / frame-sample run as Arrow-batched
pandas UDFs over mapInPandas. The image and audio decode kernels are REAL
(dependency-free PNG/WAV codecs in functions/png_codec.py — stdlib zlib +
struct); only video decode remains a stub (no container parser is feasible
without ffmpeg), its payload is an opaque deterministic byte string.

At scale: media tables are partitioned by content-hash prefix so batches are
size-uniform; metadata-only predicates (width/duration/mime) prune at the
parquet scan WITHOUT touching the binary column (column pruning) — keep
metadata in separate top-level columns, never inside the blob.

Oracle strategy: the synthesized payloads encode pixel/sample values given
by closed-form integer formulas of (media_id, x, y), so a pure-SQL DuckDB
twin re-derives the DECODED content without any codec — if the Spark side's
decode → histogram round-trip is wrong anywhere (filters, CRC, layout), the
value hash breaks. Histogram denominators are powers of two, so the
normalized features are dyadic rationals and the comparison is bit-strict.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..functions.png_codec import (
    decode_png,
    decode_wav,
    encode_png,
    encode_wav_pcm8,
)

MEDIA_SCHEMA = (
    "media_id long, payload binary, mime string, width int, height int, "
    "duration_ms int"
)

# synthesized-content formulas — single source of truth for the Python
# encoders AND the SQL oracles (powers of two keep the feature divisions
# dyadic => bit-strict cross-engine comparison)
IMG_DIMS = (8, 16, 32)
AUDIO_N_SAMPLES = 512
AUDIO_SAMPLE_RATE = 8000
AUDIO_DURATION_MS = AUDIO_N_SAMPLES * 1000 // AUDIO_SAMPLE_RATE  # 64


def _img_dims(mid: int) -> tuple[int, int]:
    k = mid // 3
    return IMG_DIMS[k % 3], IMG_DIMS[(k // 3) % 3]


def _img_pixels(mid: int) -> np.ndarray:
    w, h = _img_dims(mid)
    y, x = np.mgrid[0:h, 0:w]
    return ((mid * 31 + y * 13 + x * 7) % 256).astype(np.uint8)


def _audio_samples(mid: int) -> np.ndarray:
    i = np.arange(AUDIO_N_SAMPLES)
    return ((mid * 17 + i * 11) % 256).astype(np.uint8)


def feature_schema(dim: int = 8) -> str:
    """Scalar feature columns (f0..f{dim-1}) rather than array<float>: sortable,
    prunable, and oracle-comparable column-by-column."""
    cols = ", ".join(f"f{k} double" for k in range(dim))
    return f"media_id long, n_bytes long, {cols}"


def synthesize_media(spark, n: int = 64, payload_bytes: int = 256) -> DataFrame:
    """Deterministic media table with REAL payloads: image rows are valid
    PNGs of the formula pixels, audio rows are valid WAVs of the formula
    samples, video rows are opaque md5-repeat bytes (decode stub). Built
    distributed (mapInPandas over a range), no driver-side collect."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for raw_id in pdf["id"]:
                mid = int(raw_id)
                if mid % 3 == 0:
                    w, h = _img_dims(mid)
                    rows.append(
                        (mid, encode_png(_img_pixels(mid)), "image/png",
                         w, h, (mid * 97) % 60_000 + 1)
                    )
                elif mid % 3 == 1:
                    rows.append(
                        (mid,
                         encode_wav_pcm8(_audio_samples(mid), AUDIO_SAMPLE_RATE),
                         "audio/wav",
                         (mid * 37) % 1920 + 1, (mid * 53) % 1080 + 1,
                         AUDIO_DURATION_MS)
                    )
                else:
                    blob = hashlib.md5(str(mid).encode()).digest() * (
                        payload_bytes // 16
                    )
                    rows.append(
                        (mid, blob, "video/mp4",
                         (mid * 37) % 1920 + 1, (mid * 53) % 1080 + 1,
                         (mid * 97) % 60_000 + 1)
                    )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "payload", "mime", "width", "height",
                         "duration_ms"],
            )

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)


def decode_image(payload: bytes) -> np.ndarray:
    """Decode a PNG payload to uint8 pixels (real kernel — see
    functions/png_codec.py; raises ValueError on non-PNG bytes)."""
    return decode_png(payload)


def decode_audio(payload: bytes) -> np.ndarray:
    """Decode a WAV payload to PCM samples (real kernel)."""
    return decode_wav(payload)[0]


def decoded_bytes(payload: bytes, mime: str) -> np.ndarray:
    """The content bytes features are computed over: decoded pixels for
    images, decoded PCM for audio, the raw payload for opaque mimes."""
    if mime == "image/png":
        return decode_image(payload).ravel()
    if mime == "audio/wav":
        return decode_audio(payload).astype(np.uint8).ravel()
    return np.frombuffer(payload, dtype=np.uint8)


def fake_feature(payload: bytes, dim: int = 8) -> np.ndarray:
    """Histogram kernel over raw bytes (the opaque-mime path): byte values
    folded to `dim` float32 buckets, L1-normalized."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr % dim, minlength=dim).astype(np.float32)
    total = hist.sum()
    return hist / total if total else hist


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """mapInPandas feature extraction: Arrow batches in, one feature row per
    media item out, feature emitted as `dim` scalar double columns. Images
    and audio are DECODED (real PNG/WAV kernels) and the histogram runs
    over the decoded content; n_bytes is the decoded byte count. The exact
    values are oracle-checked against a pure-SQL re-derivation of the
    synthesized content (features_oracle_sql)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [
                decoded_bytes(p, m) for p, m in zip(pdf["payload"], pdf["mime"])
            ]
            feats = (
                np.stack(
                    [
                        np.bincount(d % dim, minlength=dim).astype(np.float32)
                        / max(d.size, 1)
                        for d in decoded
                    ]
                )
                if len(pdf)
                else np.zeros((0, dim), dtype=np.float32)
            )
            out = {
                "media_id": pdf["media_id"],
                "n_bytes": [d.size for d in decoded],
            }
            for k in range(dim):
                out[f"f{k}"] = feats[:, k].astype(np.float64)
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=feature_schema(dim))


def features_oracle_sql(n: int = 64, dim: int = 8, payload_bytes: int = 256) -> str:
    """Pure-SQL (DuckDB) re-derivation of synthesize_media + extract_features
    — WITHOUT running any codec, from the content formulas:

      image rows: pixel(x, y) = (id*31 + y*13 + x*7) % 256 over w*h pixels
        (dims from IMG_DIMS cycling) — if the Spark side's PNG encode →
        decode → histogram round-trip deviates anywhere, the hash breaks;
      audio rows: sample(i) = (id*17 + i*11) % 256 over 512 samples;
      video rows: payload bytes recovered from the md5 hex string (the only
        cross-engine hash, per the repo invariant); repeats cancel so the
        histogram divides by 16.

    All denominators are powers of two => dyadic rationals => bit-strict."""
    img_w = "CASE (media_id // 3) % 3 WHEN 0 THEN 8 WHEN 1 THEN 16 ELSE 32 END"
    img_h = (
        "CASE ((media_id // 3) // 3) % 3 WHEN 0 THEN 8 WHEN 1 THEN 16 "
        "ELSE 32 END"
    )

    def hist_cols(denom: str) -> str:
        return ",\n           ".join(
            f"CAST(sum(CASE WHEN byte % {dim} = {k} THEN 1 ELSE 0 END) AS DOUBLE)"
            f" / CAST({denom} AS DOUBLE) AS f{k}"
            for k in range(dim)
        )

    return f"""
    WITH ids AS (SELECT range AS media_id FROM range({n})),
    img AS (
      SELECT media_id, {img_w} AS w, {img_h} AS h
      FROM ids WHERE media_id % 3 = 0
    ),
    img_bytes AS (
      SELECT m.media_id, m.w * m.h AS n_bytes,
             (m.media_id * 31 + (i.range // m.w) * 13 + (i.range % m.w) * 7)
               % 256 AS byte
      FROM img m, range(1024) i WHERE i.range < m.w * m.h
    ),
    img_f AS (
      SELECT media_id, CAST(any_value(n_bytes) AS BIGINT) AS n_bytes,
             {hist_cols('any_value(n_bytes)')}
      FROM img_bytes GROUP BY media_id
    ),
    wav_bytes AS (
      SELECT media_id, (media_id * 17 + i.range * 11) % 256 AS byte
      FROM ids, range({AUDIO_N_SAMPLES}) i WHERE media_id % 3 = 1
    ),
    wav_f AS (
      SELECT media_id, CAST({AUDIO_N_SAMPLES} AS BIGINT) AS n_bytes,
             {hist_cols(AUDIO_N_SAMPLES)}
      FROM wav_bytes GROUP BY media_id
    ),
    vid AS (
      SELECT media_id, md5(CAST(media_id AS VARCHAR)) AS hx
      FROM ids WHERE media_id % 3 = 2
    ),
    vid_bytes AS (
      SELECT media_id,
             (strpos('0123456789abcdef', substr(hx, 2 * i.range + 1, 1)) - 1) * 16
             + (strpos('0123456789abcdef', substr(hx, 2 * i.range + 2, 1)) - 1)
             AS byte
      FROM vid, range(16) i
    ),
    vid_f AS (
      SELECT media_id, CAST({(payload_bytes // 16) * 16} AS BIGINT) AS n_bytes,
             {hist_cols(16)}
      FROM vid_bytes GROUP BY media_id
    )
    SELECT * FROM img_f
    UNION ALL SELECT * FROM wav_f
    UNION ALL SELECT * FROM vid_f
    """


def resize_plan(
    media: DataFrame, max_w: int = 256, max_h: int = 256
) -> DataFrame:
    """Resize planning over image/video metadata: aspect-preserving target
    dims, never upscaled — pure Catalyst arithmetic over the metadata
    columns (the parquet scan never touches the payload blob; column
    pruning is the point of keeping dims top-level). The pixel resample
    itself would chain decode_image -> area-average -> encode_png in the
    same mapInPandas shape as extract_features."""
    w = F.col("width").cast("double")
    h = F.col("height").cast("double")
    scale = F.least(
        F.lit(1.0), F.lit(float(max_w)) / w, F.lit(float(max_h)) / h
    )
    return media.where(
        F.col("mime").startswith("image/") | F.col("mime").startswith("video/")
    ).select(
        "media_id",
        "width",
        "height",
        F.greatest(F.lit(1), F.floor(w * scale)).cast("int").alias("target_w"),
        F.greatest(F.lit(1), F.floor(h * scale)).cast("int").alias("target_h"),
        (scale < 1.0).alias("downscaled"),
    )


def resize_plan_oracle_sql(n: int = 64, max_w: int = 256, max_h: int = 256) -> str:
    """DuckDB twin over the synthesize_media metadata formulas (pure
    integer arithmetic; float ops are division/least/floor — IEEE-identical
    in both engines, no transcendentals). Image rows carry their REAL PNG
    dims (IMG_DIMS cycling); video rows the 1920x1080 formulas."""
    return f"""
    WITH m AS (
      SELECT range AS media_id,
             CASE WHEN range % 3 = 0 THEN
               CASE (range // 3) % 3 WHEN 0 THEN 8 WHEN 1 THEN 16 ELSE 32 END
             ELSE CAST((range * 37) % 1920 + 1 AS INT) END AS width,
             CASE WHEN range % 3 = 0 THEN
               CASE ((range // 3) // 3) % 3 WHEN 0 THEN 8 WHEN 1 THEN 16
               ELSE 32 END
             ELSE CAST((range * 53) % 1080 + 1 AS INT) END AS height,
             CASE WHEN range % 3 = 0 THEN 'image/png'
                  WHEN range % 3 = 1 THEN 'audio/wav'
                  ELSE 'video/mp4' END AS mime
      FROM range({n})
    ),
    s AS (
      SELECT *, least(1.0e0, {float(max_w)!r}e0 / CAST(width AS DOUBLE),
                      {float(max_h)!r}e0 / CAST(height AS DOUBLE)) AS scale
      FROM m
      WHERE mime LIKE 'image/%' OR mime LIKE 'video/%'
    )
    SELECT media_id, CAST(width AS INT) AS width, CAST(height AS INT) AS height,
           CAST(greatest(1, floor(CAST(width AS DOUBLE) * scale)) AS INT)
             AS target_w,
           CAST(greatest(1, floor(CAST(height AS DOUBLE) * scale)) AS INT)
             AS target_h,
           scale < 1.0e0 AS downscaled
    FROM s
    """


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per (media_id, frame_ts_ms) —
    pure Catalyst sequence explode; the decode of each frame would be a
    downstream mapInPandas with the same batch shape as extract_features."""
    return (
        media.where(F.col("mime").startswith("video/"))
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )
