"""Stage 2 — candidate pair generation from LSH bucket collisions.

Graft of the reference's collisions query + pack iteration
(db_hashes.rs:484-513: equi-join + EXISTS semi-join keeping only hash
groups of size >= 2, ORDER BY hash; deduplicator.rs:98-180: group_by
hash → pack → pairwise). One shuffle: groupBy(bucket_key) with
collect_list, then JVM-side pair expansion (i<j) via array transforms —
no self-join, no second shuffle of the signatures table.

Skew guard: the reference silently DROPS packs > 5000 members
(deduplicator.rs:120-155, logging the first 10). We do the same cap but
surface it as a metrics row (`oversize_buckets`, `oversize_rows`) so
nothing disappears silently (SURVEY §4 custom-work item 3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..config import DedupConfig


def bucket_groups(signatures: DataFrame) -> DataFrame:
    """(detector, bucket_key, members sorted-array, n) for groups of >=2.

    The sort makes pair orientation (src < dst) and downstream results
    deterministic — the reference's deterministic pack ordering
    (deduplicator.rs:157-164)."""
    return (
        signatures.groupBy("detector", "bucket_key")
        .agg(F.array_sort(F.collect_set("clip_id")).alias("members"))
        .withColumn("n", F.size("members"))
        .filter(F.col("n") >= 2)
    )


def oversize_metrics(groups: DataFrame, cfg: DedupConfig) -> DataFrame:
    """metrics rows: how many buckets/rows the cap discarded, per
    detector (stage, key, value)."""
    over = groups.filter(F.col("n") > cfg.bucket_cap)
    return (
        over.groupBy("detector")
        .agg(
            F.count("*").alias("oversize_buckets"),
            F.sum("n").alias("oversize_rows"),
        )
        .select(
            F.lit("candidates").alias("stage"),
            F.concat_ws(":", F.lit("oversize"), "detector").alias("key"),
            F.col("oversize_buckets").cast("long").alias("value"),
            F.col("oversize_rows").cast("long").alias("value2"),
        )
    )


def build_candidates(signatures: DataFrame, cfg: DedupConfig) -> DataFrame:
    """(src, dst, detector) with src < dst, distinct.

    Pair expansion is a JVM array comprehension over the sorted member
    list:  flatten(transform(m, (x,i) -> transform(slice(m, i+2, n), y
    -> (x,y)))). Buckets above bucket_cap are excluded (capped), as the
    reference drops oversize packs (deduplicator.rs:120-135)."""
    groups = bucket_groups(signatures).filter(F.col("n") <= cfg.bucket_cap)
    pairs = F.flatten(
        F.transform(
            F.col("members"),
            lambda x, i: F.transform(
                F.slice(F.col("members"), i + 2, F.size("members")),
                lambda y: F.struct(x.alias("src"), y.alias("dst")),
            ),
        )
    )
    return (
        groups.select("detector", F.explode(pairs).alias("p"))
        .select(F.col("p.src").alias("src"), F.col("p.dst").alias("dst"), "detector")
        .dropDuplicates(["src", "dst", "detector"])
    )
