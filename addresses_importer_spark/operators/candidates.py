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


#: buckets up to this size expand pairs via a JVM array comprehension in
#: one task row (<= ~2k structs); larger buckets go through a self-join
#: so the pair set is produced across many tasks instead of one giant
#: in-memory array (a 5000-member bucket is 12.5M pairs — never build
#: that inside a single row).
PAIR_EXPAND_MAX = 64


def build_candidates(signatures: DataFrame, cfg: DedupConfig) -> DataFrame:
    """(src, dst, detector) with src < dst, distinct.

    Hybrid pair generation:
    - small buckets (n <= PAIR_EXPAND_MAX, the overwhelming majority
      under a healthy LSH config): flatten(transform(...)) over the
      sorted member array — one shuffle total, no join;
    - large buckets (PAIR_EXPAND_MAX < n <= bucket_cap): exploded back
      to rows and self-joined on bucket_key, letting AQE split the skew;
    - oversize buckets (n > bucket_cap): dropped, as the reference drops
      packs > 5000 (deduplicator.rs:120-135) — counted by the caller.
    """
    groups = bucket_groups(signatures).filter(F.col("n") <= cfg.bucket_cap)

    small = groups.filter(F.col("n") <= PAIR_EXPAND_MAX)
    pairs_small = F.flatten(
        F.transform(
            F.col("members"),
            lambda x, i: F.transform(
                F.slice(F.col("members"), i + 2, F.size("members")),
                lambda y: F.struct(x.alias("src"), y.alias("dst")),
            ),
        )
    )
    small_pairs = (
        small.select("detector", F.explode(pairs_small).alias("p"))
        .select(F.col("p.src").alias("src"), F.col("p.dst").alias("dst"), "detector")
    )

    large = groups.filter(F.col("n") > PAIR_EXPAND_MAX)
    lmembers = large.select(
        "detector", "bucket_key", F.explode("members").alias("clip_id")
    )
    l = lmembers.alias("l")
    r = lmembers.alias("r")
    large_pairs = (
        l.join(
            r,
            (F.col("l.detector") == F.col("r.detector"))
            & (F.col("l.bucket_key") == F.col("r.bucket_key"))
            & (F.col("l.clip_id") < F.col("r.clip_id")),
        )
        .select(
            F.col("l.clip_id").alias("src"),
            F.col("r.clip_id").alias("dst"),
            F.col("l.detector").alias("detector"),
        )
    )

    return small_pairs.unionByName(large_pairs).dropDuplicates(
        ["src", "dst", "detector"]
    )
