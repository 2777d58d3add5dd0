"""Streaming incremental dedup: probe arriving clips against an index.

The reference re-runs its whole pairwise scan per import batch
(bin/main.rs:90-193 loads every provider then dedupes the union); at
10^12 clips a full re-dedup per arrival batch is not a plan. This
module is the incremental form a training-data ingestion service needs:
a *static* signature index (the features checkpoint of a previous
pipeline run) stays put, and each micro-batch of NEW clips is

  featurized -> banded (minhash + simhash blocking keys) -> equi-joined
  against the index's bucket keys -> verified with the SAME 3-clause
  ``is_duplicate`` disjunction the batch pipeline uses (operators/
  verify.py, dedupe.rs:129-198) -> appended as (src, dst, detector,
  score) dup edges.

Cost shape per batch of b clips against an index of N: the probe join
touches only bucket keys that occur in the batch (|batch keys| ~ b *
bands), so work is O(b) + the index-side shuffle of matching buckets —
never O(N) and never O(N*b). The index signature table is partitioned
by bucket-key hash on disk, so on a real cluster the probe join prunes
to the matching partitions.

Batches run inside ``foreachBatch``: candidate generation + verify are
multi-join batch plans (not expressible as a pure stateless streaming
map), and the per-epoch sink write is made idempotent by writing each
epoch to its own ``epoch_id=<n>`` partition with overwrite — a replayed
epoch after a crash overwrites its own output instead of duplicating
it (exactly-once at the sink, checkpointLocation tracks the source
offsets).

Suffix containment stays batch-only, as in streaming/ingest.py: its
rarest-shingle query keys need global document frequencies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F
from pyspark.sql.streaming import StreamingQuery

from ..config import DedupConfig
from ..operators.signatures import (
    DETECTOR_MINHASH, DETECTOR_SIMHASH, build_features, build_signatures,
)
from ..operators.verify import verify_edges
from .ingest import read_clip_stream

#: feature columns the 3-clause verify reads (operators/verify.py); the
#: probe never ships audio bytes or raw transcripts of the index
_VERIFY_COLS = ["clip_id", "shingle_hashes", "simhash", "norm"]

#: per-(detector, band, bucket_key) cap on index-side members joined per
#: probe key — the streaming twin of the batch pipeline's hot-bucket cap
#: (C3, deduplicator.rs:118-135): a pathological bucket bounds per-batch
#: edge volume at b * bands * cap instead of b * bands * |bucket|
PROBE_BUCKET_CAP = 200


def _capped_index_signatures(index_feats: DataFrame,
                             cfg: DedupConfig) -> DataFrame:
    sigs = build_signatures(
        index_feats, cfg, detectors=(DETECTOR_MINHASH, DETECTOR_SIMHASH)
    ).select("clip_id", "detector", "band", "bucket_key")
    w_rank = F.row_number().over(
        Window.partitionBy("detector", "band", "bucket_key").orderBy("clip_id")
    )
    return (
        sigs.withColumn("_r", w_rank)
        .filter(F.col("_r") <= PROBE_BUCKET_CAP)
        .drop("_r")
    )


def probe_edges(batch_clips: DataFrame, index_feats: DataFrame,
                index_sigs: DataFrame, cfg: DedupConfig,
                with_audio: bool = True) -> DataFrame:
    """Verified dup edges between one batch of new clips and the index.

    Orientation: src = the NEW clip, dst = the matched INDEX clip (the
    consumer decides retention policy; this operator only reports
    evidence). New-vs-new dups inside one batch are the batch
    pipeline's job on the next full run — emitting them here would
    double-count edges against the next compaction.

    ``index_feats`` needs only the verify columns (_VERIFY_COLS);
    ``index_sigs`` must be banded from FULL features (signature columns
    included) — see start_dedup_probe.
    """
    feats_b = build_features(batch_clips, cfg, with_audio=with_audio)
    sigs_b = build_signatures(
        feats_b, cfg, detectors=(DETECTOR_MINHASH, DETECTOR_SIMHASH)
    ).select(
        F.col("clip_id").alias("probe_id"), "detector", "band", "bucket_key"
    )
    cand = (
        sigs_b.join(index_sigs, ["detector", "band", "bucket_key"])
        .filter(F.col("probe_id") != F.col("clip_id"))
        .select(
            F.col("probe_id").alias("src"),
            F.col("clip_id").alias("dst"),
            "detector",
        )
        .distinct()
    )
    feats_all = feats_b.select(*_VERIFY_COLS).unionByName(
        index_feats.select(*_VERIFY_COLS)
    )
    return verify_edges(cand, feats_all, cfg)


def start_dedup_probe(spark: SparkSession, clips_path: str,
                      index_features_path: str, out_path: str,
                      checkpoint_path: str, cfg: DedupConfig,
                      with_audio: bool = True,
                      available_now: bool = True,
                      max_files_per_trigger: int | None = None,
                      ) -> StreamingQuery:
    """File-source stream of new clips -> per-epoch verified dup edges
    under ``out_path/epoch_id=<n>/``. The index (a features checkpoint
    written by run_pipeline) is loaded and banded ONCE at query start;
    restart the query to pick up a recompacted index."""
    index_full = spark.read.parquet(index_features_path)
    index_sigs = _capped_index_signatures(index_full, cfg)
    index_feats = index_full.select(*_VERIFY_COLS)

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        edges = probe_edges(
            batch_df, index_feats, index_sigs, cfg, with_audio=with_audio
        )
        # overwrite-own-partition => replayed epochs are idempotent
        edges.write.mode("overwrite").parquet(
            f"{out_path}/epoch_id={epoch_id}"
        )

    writer = (
        read_clip_stream(spark, clips_path,
                         max_files_per_trigger=max_files_per_trigger)
        .writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_path)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
