"""Structured Streaming ingest: incremental signature computation.

The reference is strictly batch (bin/main.rs:90-193) — but its ingest
stage (record → blocking hashes → signature store, deduplicator.rs:
288-305) is embarrassingly incremental: signatures depend only on the
row itself. This module expresses exactly that stage as a streaming
job: new clip files land → signatures append to the signatures table;
the collision scan + verify + CC stages then run as the usual batch
pipeline over the accumulated table (micro-batch re-dedup).

No watermarks/state needed — the map is stateless per row, so the
pipeline is restart-safe via the sink's checkpointLocation alone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..config import DedupConfig
from ..datagen import CLIPS_SCHEMA
from ..operators.signatures import build_features, build_signatures


def read_clip_stream(spark: SparkSession, path: str,
                     max_files_per_trigger: int | None = None) -> DataFrame:
    reader = spark.readStream.schema(CLIPS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def signature_stream(clips_stream: DataFrame, cfg: DedupConfig,
                     with_audio: bool = True,
                     detectors: tuple[str, ...] = ("minhash", "simhash"),
                     ) -> DataFrame:
    """clips stream → exploded signatures stream (stateless map+explode;
    the pandas UDF and all JVM expressions work unchanged on streaming
    DataFrames).

    The suffix detector is excluded by default: its rarest-shingle query
    keys need global document frequencies (a groupBy over the whole
    corpus), which is not a stateless per-row map — it stays a batch
    pass over the accumulated table."""
    feats = build_features(clips_stream, cfg, with_audio=with_audio)
    return build_signatures(feats, cfg, detectors=detectors)


def start_signature_ingest(spark: SparkSession, clips_path: str,
                           out_path: str, checkpoint_path: str,
                           cfg: DedupConfig, with_audio: bool = True,
                           available_now: bool = True) -> StreamingQuery:
    """File-source → parquet-sink signature ingest. availableNow=True
    drains everything currently present and stops (the batch-catch-up
    trigger); False runs continuously on new files."""
    sigs = signature_stream(
        read_clip_stream(spark, clips_path), cfg, with_audio=with_audio
    )
    writer = (
        sigs.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
