"""Stage checkpoint store: resumable pipeline state with per-stage lineage.

Reference analog: read_write_h5.jl persists every struct (ComparisonSummary,
ConnectedComponents, ParameterChain, PosthocBlocks) to chunked/gzip HDF5
groups so long runs can resume (/root/reference/src/read_write_h5.jl:8-288).

Spark-first form: each stage writes a snappy/zstd Parquet table plus a JSON
manifest entry carrying (stage name, config fingerprint, row count,
partition count, per-partition row counters, wall time). `load_or_run`
resumes mid-pipeline: a stage whose manifest entry matches the current
config fingerprint is read back instead of recomputed. (Parquet + manifest
stands in for Iceberg snapshots — no Iceberg jars in this sandbox; the
interface is table-path + atomic manifest swap, which Iceberg's
createOrReplace would subsume 1:1 on a real cluster.)
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F


def config_fingerprint(cfg: dict) -> str:
    return hashlib.md5(json.dumps(cfg, sort_keys=True, default=str).encode()).hexdigest()


@dataclass
class StageStore:
    root: str

    def _manifest_path(self) -> str:
        return os.path.join(self.root, "_manifest.json")

    def _read_manifest(self) -> dict:
        p = self._manifest_path()
        if os.path.exists(p):
            with open(p) as f:
                return json.load(f)
        return {"stages": {}}

    def _write_manifest(self, m: dict) -> None:
        os.makedirs(self.root, exist_ok=True)
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f, indent=1, default=str)
        os.replace(tmp, self._manifest_path())  # atomic swap

    def table_path(self, stage: str) -> str:
        return os.path.join(self.root, stage)

    def write(self, stage: str, df: DataFrame, cfg: dict) -> DataFrame:
        """Persist a stage table + manifest entry with per-partition counters."""
        path = self.table_path(stage)
        t0 = time.time()
        df.write.mode("overwrite").parquet(path)
        spark = df.sparkSession
        back = spark.read.parquet(path)
        per_part = (
            back.groupBy(F.spark_partition_id().alias("pid"))
            .count()
            .orderBy("pid")
            .collect()
        )
        m = self._read_manifest()
        m["stages"][stage] = {
            "fingerprint": config_fingerprint(cfg),
            "rows": sum(r["count"] for r in per_part),
            "partitions": len(per_part),
            "partition_rows": {int(r["pid"]): int(r["count"]) for r in per_part},
            "wall_sec": round(time.time() - t0, 3),
            "completed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        self._write_manifest(m)
        return back

    def load_or_run(
        self,
        spark: SparkSession,
        stage: str,
        cfg: dict,
        fn: Callable[[], DataFrame],
    ) -> tuple[DataFrame, bool]:
        """Return (df, resumed). Resumes when a completed checkpoint with the
        same config fingerprint exists."""
        m = self._read_manifest()
        ent = m["stages"].get(stage)
        path = self.table_path(stage)
        if ent and ent["fingerprint"] == config_fingerprint(cfg) and os.path.exists(path):
            return spark.read.parquet(path), True
        return self.write(stage, fn(), cfg), False

    def counters(self) -> dict:
        return self._read_manifest()["stages"]
