"""Multimodal (image/audio/video) column plumbing.

Media payloads ride as opaque `binary` columns with typed metadata structs;
decode / feature-extract / resize / frame-sample run as Arrow-batched
pandas UDFs over mapInPandas. The image and audio decode kernels are REAL
(dependency-free PNG/WAV codecs in functions/png_codec.py — stdlib zlib +
struct), and the video FRAME pipeline is real too via the PNGV container
(length-prefixed PNG frames; see synthesize_videos /
sampled_frame_features below): parse, seek, per-frame decode, sampling
arithmetic all execute and are oracle-checked. What stays out of scope is
parsing real-world containers (mp4/mkv need codec libraries the
environment lacks) — synthesize_media's video/mp4 rows therefore stay
opaque byte strings on the raw-byte feature path.

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


# ---------------------------------------------------------------------------
# Video frames: PNGV container (functions/png_codec.py) — the frame pipeline
# is REAL end-to-end (container parse, per-frame PNG decode, sampling
# arithmetic); only the container format is bespoke (mp4 parsing needs
# codec libraries the environment lacks). Frame pixels follow a closed-form
# formula so the whole synthesize -> sample -> decode -> histogram loop is
# oracle-checked without any codec in SQL.

FRAME_MS = 250  # fixed frame duration; frame f covers [f*250, (f+1)*250)


def _n_frames(mid: int) -> int:
    return (mid % 4) + 2  # 2..5 frames


def _frame_pixels(mid: int, fidx: int) -> np.ndarray:
    w, h = _img_dims(mid)
    y, x = np.mgrid[0:h, 0:w]
    return ((mid * 31 + fidx * 19 + y * 13 + x * 7) % 256).astype(np.uint8)


VIDEO_SCHEMA = MEDIA_SCHEMA + ", n_frames int"


def synthesize_videos(spark, n: int = 32) -> DataFrame:
    """Deterministic video table with REAL (PNGV) payloads: frame f of
    video mid holds the formula pixels (mid*31 + f*19 + y*13 + x*7) % 256
    at the image-table dims. duration_ms = n_frames * FRAME_MS, so the
    sampling arithmetic is exact. Built distributed (mapInPandas)."""
    from ..functions.png_codec import encode_pngv

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for raw_id in pdf["id"]:
                mid = int(raw_id)
                nf = _n_frames(mid)
                w, h = _img_dims(mid)
                payload = encode_pngv([_frame_pixels(mid, f) for f in range(nf)])
                rows.append(
                    (mid, payload, "video/x-pngv", w, h, nf * FRAME_MS, nf)
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "payload", "mime", "width", "height",
                         "duration_ms", "n_frames"],
            )

    return spark.range(n).mapInPandas(gen, schema=VIDEO_SCHEMA)


def frame_feature_schema(dim: int = 8) -> str:
    cols = ", ".join(f"f{k} double" for k in range(dim))
    return f"media_id long, frame_ts_ms long, n_pixels long, {cols}"


def sampled_frame_features(
    videos: DataFrame, every_ms: int = 500, dim: int = 8
) -> DataFrame:
    """Frame-sample plan -> per-frame decode -> dyadic histogram features.

    Shape at scale: frame_sample_plan (pure Catalyst) explodes ONLY
    (media_id, frame_ts_ms); the timestamps are re-aggregated to one list
    per media row BEFORE joining the payload, so the (large) binary column
    is shuffled and decoded once per video, not once per sampled frame.
    The mapInPandas kernel seeks each sampled frame in the PNGV container
    (length-prefixed => decodes only sampled frames) and emits one feature
    row per (media_id, frame_ts_ms). Sampling arithmetic (mirrored in the
    SQL oracle): frame_idx = least(frame_ts_ms // FRAME_MS, n_frames-1)."""
    from ..functions.png_codec import decode_pngv_frame

    plan = frame_sample_plan(videos, every_ms=every_ms)
    ts_lists = plan.groupBy("media_id").agg(
        F.sort_array(F.collect_list("frame_ts_ms")).alias("tss")
    )
    joined = videos.select("media_id", "payload", "n_frames").join(
        ts_lists, on="media_id"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_rows = []
            for r in pdf.itertuples(index=False):
                payload = bytes(r.payload)
                for ts in r.tss:
                    fidx = min(int(ts) // FRAME_MS, int(r.n_frames) - 1)
                    px = decode_pngv_frame(payload, fidx).ravel()
                    hist = np.bincount(px % dim, minlength=dim).astype(
                        np.float64
                    ) / px.size
                    out_rows.append(
                        (int(r.media_id), int(ts), int(px.size), *hist)
                    )
            cols = ["media_id", "frame_ts_ms", "n_pixels"] + [
                f"f{k}" for k in range(dim)
            ]
            yield pd.DataFrame(out_rows, columns=cols)

    return joined.mapInPandas(run, schema=frame_feature_schema(dim))


def frame_features_oracle_sql(n: int = 32, every_ms: int = 500, dim: int = 8) -> str:
    """Pure-SQL re-derivation of synthesize_videos + sampled_frame_features
    from the frame formulas (no codec): if the container encode -> seek ->
    PNG decode -> histogram loop deviates anywhere, the value hash breaks.
    Pixel counts are powers of two => dyadic features, bit-strict."""
    img_w = "(CASE (media_id // 3) % 3 WHEN 0 THEN 8 WHEN 1 THEN 16 ELSE 32 END)"
    img_h = (
        "(CASE ((media_id // 3) // 3) % 3 WHEN 0 THEN 8 WHEN 1 THEN 16 "
        "ELSE 32 END)"
    )
    fcols = ", ".join(
        f"(CAST(count(CASE WHEN val % {dim} = {k} THEN 1 END) AS DOUBLE) "
        f"/ (w * h)) AS f{k}"
        for k in range(dim)
    )
    return f"""
    WITH v AS (
      SELECT range AS media_id, (range % 4) + 2 AS n_frames,
             {img_w} AS w, {img_h} AS h
      FROM range({n})
    ),
    ts AS (
      SELECT media_id, n_frames, w, h,
             unnest(generate_series(0, n_frames * {FRAME_MS}, {every_ms})) AS frame_ts_ms
      FROM v
    ),
    fr AS (
      SELECT media_id, frame_ts_ms, w, h,
             least(frame_ts_ms // {FRAME_MS}, n_frames - 1) AS fidx
      FROM ts
    ),
    px AS (
      SELECT media_id, frame_ts_ms, w, h,
             (media_id * 31 + fidx * 19 + (p // w) * 13 + (p % w) * 7) % 256 AS val
      FROM fr, LATERAL (SELECT unnest(generate_series(0, w * h - 1)) AS p)
    )
    SELECT media_id, CAST(frame_ts_ms AS BIGINT) AS frame_ts_ms,
           CAST(w * h AS BIGINT) AS n_pixels, {fcols}
    FROM px
    GROUP BY media_id, frame_ts_ms, w, h
    """
