"""Clips table IO: ingest filter + errors side-channel, export sink.

Graft of the reference's source layer:

- mandatory-field filter at insert (tools/src/lib.rs:543-546: NULL
  street/number dropped) → here: NULL/empty transcript AND undecodable
  bytes both missing ⇒ row is an error, else kept;
- `addresses_errors` side table capturing rejects with an error kind
  (tools/src/lib.rs:262-277) → `errors(clip_id, kind)` DataFrame;
- gzip CSV dump sink (deduplicator.rs:262-282, bin/main.rs:177-181) →
  gzip CSV export of survivors (transcript metadata; audio stays in
  parquet — CSV carries no binary, matching OpenAddressLegacy's
  text-only interchange, tools/src/lib.rs:149-162).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

ERROR_EMPTY_PAYLOAD = "empty_payload"
ERROR_BAD_DURATION = "bad_duration"


def read_clips(spark: SparkSession, path: str) -> DataFrame:
    """In the sandbox: parquet. On a cluster this is the Iceberg scan
    (`spark.read.format("iceberg")`) — same DataFrame contract."""
    return spark.read.parquet(path)


def error_kind_expr() -> F.Column:
    """NULL for valid rows, else the error kind. A clip is valid if it
    has at least one signal to dedup on (non-empty transcript or
    non-empty bytes) and a sane duration. Mirrors F1/F2 ingest filters
    (tools/src/lib.rs:543-546, deduplicator.rs:471-477)."""
    has_text = F.col("transcript").isNotNull() & (F.trim("transcript") != "")
    has_audio = F.col("bytes").isNotNull() & (F.length("bytes") > 44)
    dur_ok = F.col("dur_ms").isNull() | (
        (F.col("dur_ms") > 0) & (F.col("dur_ms") < 6 * 3600 * 1000)
    )
    return (
        F.when(~(has_text | has_audio), F.lit(ERROR_EMPTY_PAYLOAD))
        .when(~dur_ok, F.lit(ERROR_BAD_DURATION))
    )


def split_valid(clips: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(valid, errors) — standalone split; the staged pipeline instead
    folds the flag into the features scan so the corpus payload is read
    once (plans/pipeline.py)."""
    flagged = clips.withColumn("_error_kind", error_kind_expr())
    valid = flagged.filter(F.col("_error_kind").isNull()).drop("_error_kind")
    errors = (
        flagged.filter(F.col("_error_kind").isNotNull())
        .select("clip_id", F.col("_error_kind").alias("kind"))
    )
    return valid, errors


def export_survivors_csv(survivors: DataFrame, path: str) -> None:
    """gzip CSV export of survivor metadata (S6 sink analog). Empty
    string for NULLs, as OpenAddressLegacy does (tools/src/lib.rs:149-162)."""
    (
        survivors.select("clip_id", "sr_hz", "dur_ms", "codec", "transcript")
        .na.fill({"codec": "", "transcript": ""})
        .write.mode("overwrite")
        .option("compression", "gzip")
        .option("header", True)
        .csv(path)
    )


def read_survivors_csv(spark: SparkSession, path: str) -> DataFrame:
    """Round-trip reader for the export-fidelity test (tests.rs:147-177)."""
    return (
        spark.read.option("header", True)
        .schema("clip_id string, sr_hz int, dur_ms int, codec string, transcript string")
        .csv(path)
    )
