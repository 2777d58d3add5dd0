"""Streaming signature ingest == batch signatures (stateless stage
equivalence), plus restart/exactly-once via checkpointLocation."""

import os

from addresses_importer_spark.config import DedupConfig
from addresses_importer_spark.datagen import fixture_with_dupes, to_spark
from addresses_importer_spark.operators.signatures import (
    build_features, build_signatures,
)
from addresses_importer_spark.streaming.ingest import start_signature_ingest

CFG = DedupConfig()


def test_stream_matches_batch(spark, tmp_path):
    pdf, _ = fixture_with_dupes()
    clips = to_spark(spark, pdf)
    src = str(tmp_path / "clips_parquet")
    clips.write.parquet(src)

    out = str(tmp_path / "sigs_out")
    ckpt = str(tmp_path / "sigs_ckpt")
    q = start_signature_ingest(spark, src, out, ckpt, CFG)
    q.awaitTermination(300)

    streamed = spark.read.parquet(out)
    batch = build_signatures(
        build_features(clips, CFG), CFG, detectors=("minhash", "simhash")
    )
    s = {tuple(r) for r in streamed.collect()}
    b = {tuple(r) for r in batch.collect()}
    assert s == b


def test_stream_restart_no_duplicates(spark, tmp_path):
    """Second availableNow run over the same checkpoint must not
    re-emit already-processed files; new files are picked up."""
    pdf, _ = fixture_with_dupes()
    clips = to_spark(spark, pdf)
    src = str(tmp_path / "clips_parquet")
    clips.limit(10).write.parquet(src)

    out = str(tmp_path / "sigs_out")
    ckpt = str(tmp_path / "sigs_ckpt")
    q = start_signature_ingest(spark, src, out, ckpt, CFG)
    q.awaitTermination(300)
    n1 = spark.read.parquet(out).count()

    # restart with no new data -> no new rows
    q = start_signature_ingest(spark, src, out, ckpt, CFG)
    q.awaitTermination(300)
    assert spark.read.parquet(out).count() == n1

    # add files -> only the delta appears
    more = to_spark(spark, pdf.iloc[10:14])
    more.write.mode("append").parquet(src)
    q = start_signature_ingest(spark, src, out, ckpt, CFG)
    q.awaitTermination(300)
    n3 = spark.read.parquet(out).count()
    assert n3 > n1
    # ids seen exactly once per (clip, detector, band, bucket) row
    dup = (
        spark.read.parquet(out)
        .groupBy("clip_id", "detector", "band", "bucket_key")
        .count()
        .filter("count > 1")
        .count()
    )
    assert dup == 0
