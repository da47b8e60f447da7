"""Multimodal (image/audio/video) column plumbing.

Media payloads ride as opaque `binary` columns with typed metadata structs;
decode / feature-extract / resize / frame-sample run as Arrow-batched
pandas UDFs over mapInPandas. The image/audio codecs are NOT available in
this environment, so the decode kernels are stubbed (deterministic fake or
NotImplementedError) — the Spark-side plumbing (schemas, batch iteration,
partitioning, UDF signatures) is real and tested.

At scale: media tables are partitioned by content-hash prefix so batches are
size-uniform; metadata-only predicates (width/duration/mime) prune at the
parquet scan WITHOUT touching the binary column (column pruning) — keep
metadata in separate top-level columns, never inside the blob.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "media_id long, payload binary, mime string, width int, height int, "
    "duration_ms int"
)

def feature_schema(dim: int = 8) -> str:
    """Scalar feature columns (f0..f{dim-1}) rather than array<float>: sortable,
    prunable, and oracle-comparable column-by-column."""
    cols = ", ".join(f"f{k} double" for k in range(dim))
    return f"media_id long, n_bytes long, {cols}"


def synthesize_media(spark, n: int = 64, payload_bytes: int = 256) -> DataFrame:
    """Deterministic fake media table (payload = repeated md5 bytes)."""
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        F.repeat(F.unhex(F.md5(F.col("id").cast("string"))), payload_bytes // 16)
        .cast("binary")
        .alias("payload"),
        F.when(F.col("id") % 3 == 0, "image/png")
        .when(F.col("id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("mime"),
        (F.pmod(F.col("id") * 37, 1920) + 1).cast("int").alias("width"),
        (F.pmod(F.col("id") * 53, 1080) + 1).cast("int").alias("height"),
        (F.pmod(F.col("id") * 97, 60_000) + 1).cast("int").alias("duration_ms"),
    )


def decode_image(payload: bytes) -> "np.ndarray":
    """Real codec not available in this container — see module docstring."""
    raise NotImplementedError(
        "image decode requires PIL/opencv (not installed); "
        "use fake_feature for plumbing tests"
    )


def fake_feature(payload: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic stand-in for a decode+embed kernel: byte histogram
    folded to `dim` float32 buckets, L1-normalized."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr % dim, minlength=dim).astype(np.float32)
    total = hist.sum()
    return hist / total if total else hist


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """mapInPandas feature extraction: Arrow batches in, one feature row per
    media item out, feature emitted as `dim` scalar double columns. The batch
    loop is the real production shape; only the kernel (fake_feature) is a
    stub. The exact feature values are oracle-checked against a pure-SQL
    re-derivation of the byte histogram (plans/oracle_queries.py)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = np.stack(
                [fake_feature(p, dim) for p in pdf["payload"]]
            ) if len(pdf) else np.zeros((0, dim), dtype=np.float32)
            out = {
                "media_id": pdf["media_id"],
                "n_bytes": [len(p) for p in pdf["payload"]],
            }
            for k in range(dim):
                out[f"f{k}"] = feats[:, k].astype(np.float64)
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=feature_schema(dim))


def features_oracle_sql(n: int = 64, dim: int = 8, payload_bytes: int = 256) -> str:
    """Pure-SQL (DuckDB) re-derivation of synthesize_media + extract_features.

    The payload is md5(id) bytes repeated `payload_bytes//16` times, so the
    normalized byte histogram equals the histogram over the 16 md5 bytes
    divided by 16 — repeats cancel. Bytes are recovered from the md5 hex
    string via strpos arithmetic (the only cross-engine hash is md5, per the
    repo invariant). Division is exact in BOTH engines when dim and the byte
    count are powers of two (counts/16 are dyadic rationals, exactly
    representable in float32 and float64), so the value-hash comparison is
    bit-strict, not tolerance-based.
    """
    feature_cols = ",\n           ".join(
        f"CAST(sum(CASE WHEN byte % {dim} = {k} THEN 1 ELSE 0 END) AS DOUBLE)"
        f" / CAST(16 AS DOUBLE) AS f{k}"
        for k in range(dim)
    )
    return f"""
    WITH h AS (
      SELECT range AS media_id, md5(CAST(range AS VARCHAR)) AS hx
      FROM range({n})
    ),
    b AS (
      SELECT media_id,
             (strpos('0123456789abcdef', substr(hx, 2 * i.range + 1, 1)) - 1) * 16
             + (strpos('0123456789abcdef', substr(hx, 2 * i.range + 2, 1)) - 1)
             AS byte
      FROM h, range(16) i
    )
    SELECT media_id,
           CAST({(payload_bytes // 16) * 16} AS BIGINT) AS n_bytes,
           {feature_cols}
    FROM b
    GROUP BY media_id
    """


def resize_plan(
    media: DataFrame, max_w: int = 256, max_h: int = 256
) -> DataFrame:
    """Resize planning over image/video metadata: aspect-preserving target
    dims, never upscaled — pure Catalyst arithmetic over the metadata
    columns (the parquet scan never touches the payload blob; column
    pruning is the point of keeping dims top-level). The pixel resample
    itself is the decode-kernel slot (stubbed in this environment)."""
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
    in both engines, no transcendentals)."""
    return f"""
    WITH m AS (
      SELECT range AS media_id,
             CAST((range * 37) % 1920 + 1 AS INT) AS width,
             CAST((range * 53) % 1080 + 1 AS INT) AS height,
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
    SELECT media_id, width, height,
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
