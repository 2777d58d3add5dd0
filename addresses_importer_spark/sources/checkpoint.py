"""Stage checkpoints + lineage manifest → resumable pipeline.

The reference's stage boundary IS a SQLite file (SURVEY §3.1): each
phase writes durable state the next phase reads, and `--keep` reuses an
existing DB (bin/main.rs:90-103). The graft mirrors that with one
parquet table + one manifest JSON per stage; a stage is skipped on
resume iff its manifest exists AND records the same config hash +
upstream fingerprint chain.

Layout:  {root}/{stage}/data.parquet/…   +   {root}/{stage}/MANIFEST.json

The manifest also carries row counts and per-stage counters — the A2-A5
metrics surface of the reference (db_hashes.rs:124-213).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, types as T


def _count_rows_from_footers(path: str) -> int:
    """Row count from parquet file footers — metadata-only, no Spark
    job. Stage manifests record counts for 8+ stages per run; a full
    scan per stage is pure serial driver overhead at scale."""
    import pyarrow.parquet as pq

    total = 0
    for dirpath, _dirnames, filenames in os.walk(path):
        for fn in filenames:
            if fn.endswith(".parquet"):
                total += pq.ParquetFile(os.path.join(dirpath, fn)).metadata.num_rows
    return total


@dataclass
class StageResult:
    stage: str
    df: DataFrame
    rows: int
    resumed: bool


class CheckpointStore:
    def __init__(self, root: str, config_hash: str):
        self.root = root
        self.config_hash = config_hash
        os.makedirs(root, exist_ok=True)

    def _dir(self, stage: str) -> str:
        return os.path.join(self.root, stage)

    def _manifest_path(self, stage: str) -> str:
        return os.path.join(self._dir(stage), "MANIFEST.json")

    def _data_path(self, stage: str) -> str:
        return os.path.join(self._dir(stage), "data.parquet")

    def manifest(self, stage: str) -> dict | None:
        path = self._manifest_path(stage)
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)

    def is_complete(self, stage: str, upstream: list[str]) -> bool:
        m = self.manifest(stage)
        if m is None or m.get("config_hash") != self.config_hash:
            return False
        for up in upstream:
            um = self.manifest(up)
            if um is None or m.get("upstream", {}).get(up) != um.get("fingerprint"):
                return False
        return True

    def read(self, spark: SparkSession, stage: str) -> DataFrame:
        reader = spark.read
        m = self.manifest(stage)
        if m and m.get("schema"):
            # pinned schema: survives 0-row stages (no files to infer from)
            reader = reader.schema(
                T.StructType.fromJson(json.loads(m["schema"]))
            )
        return reader.parquet(self._data_path(stage))

    def write(self, stage: str, df: DataFrame, upstream: list[str],
              counters: dict | None = None,
              partition_by: list[str] | None = None) -> StageResult:
        """Materialize a stage: parquet (zstd) + manifest. The manifest
        fingerprint is (config_hash, rows) — enough to invalidate
        downstream stages when an upstream is recomputed."""
        path = self._data_path(stage)
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(path)
        # explicit schema: a 0-row stage writes no parquet files and
        # schema inference would fail (empty-corpus / fully-filtered runs)
        out = df.sparkSession.read.schema(df.schema).parquet(path)
        rows = _count_rows_from_footers(path)
        manifest = {
            "stage": stage,
            "config_hash": self.config_hash,
            "schema": df.schema.json(),
            "rows": rows,
            "fingerprint": f"{self.config_hash}:{rows}",
            "upstream": {
                up: (self.manifest(up) or {}).get("fingerprint") for up in upstream
            },
            "counters": counters or {},
            "num_files": sum(
                1 for _, _, files in os.walk(path) for fn in files
                if fn.endswith(".parquet")
            ),
        }
        with open(self._manifest_path(stage), "w") as f:
            json.dump(manifest, f, indent=2, sort_keys=True)
        return StageResult(stage, out, rows, resumed=False)

    def run_stage(self, spark: SparkSession, stage: str, upstream: list[str],
                  compute, counters: dict | None = None,
                  partition_by: list[str] | None = None) -> StageResult:
        """Resume-or-compute: skip `compute` entirely when the manifest
        chain matches (the kill-and-resume contract)."""
        if self.is_complete(stage, upstream):
            df = self.read(spark, stage)
            m = self.manifest(stage)
            return StageResult(stage, df, int(m["rows"]), resumed=True)
        return self.write(stage, compute(), upstream, counters, partition_by)
