"""Skew-guard bench: planted hot bucket + suffix-postings pruning probe.

Round-2 verdict asks for MEASURED evidence (not just unit tests) that:

1. (C3) a planted boilerplate bucket of 10k identical transcripts keeps
   the candidates stage LINEAR — pairs ~ n*cap/2, never C(n,2) — and
   costs bounded wall time. The reference DROPS such packs silently
   (deduplicator.rs:120-155); the graft salts them into ~cap-sized
   sub-buckets and must prove the volume bound at bench scale.
2. (suffix pruning) whether df-based pruning of index postings that sit
   in buckets no query key ever probes would materially shrink the
   job's largest table. The asymmetric inner join already drops those
   rows AT the join; pruning would only help if it could cut the
   shuffle beforehand — so the decision number is the fraction of
   postings rows in never-probed buckets.

Usage: python bench_hotbucket.py   → one JSON line + BENCH.md fodder.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from addresses_importer_spark.config import DedupConfig
from addresses_importer_spark.operators.candidates import build_candidates
from addresses_importer_spark.operators.signatures import (
    ROLE_IDX, ROLE_QRY, build_features, build_signatures,
)
from addresses_importer_spark.session import get_spark

N_UNIQUE = 50_000
N_HOT = 10_000
CAP = 200  # cap sized so the linear bound n*cap/2 is bench-tractable

BOILERPLATE = (
    "this transcript is the standard boilerplate disclaimer that every "
    "episode of the show repeats verbatim before the content begins "
    "including the usual notices about rights and redistribution"
)


def corpus(spark, with_hot: bool):
    """Text-only clips: N_UNIQUE unique transcripts (+ N_HOT identical
    boilerplate rows when with_hot)."""
    uniq = spark.range(N_UNIQUE).select(
        F.lpad(F.col("id").cast("string"), 9, "0").alias("clip_id"),
        F.concat(
            F.lit("document number "), F.md5(F.col("id").cast("string")),
            F.lit(" discusses topic "), F.md5((F.col("id") + 1).cast("string")),
            F.lit(" in considerable detail today"),
        ).alias("transcript"),
    )
    parts = [uniq]
    if with_hot:
        parts.append(
            spark.range(N_HOT).select(
                F.lpad((F.col("id") + 2_000_000).cast("string"), 9, "0").alias("clip_id"),
                F.lit(BOILERPLATE).alias("transcript"),
            )
        )
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    df = df.repartition(spark.sparkContext.defaultParallelism)
    return df.select(
        "clip_id",
        F.lit(None).cast("binary").alias("bytes"),
        F.lit(None).cast("int").alias("sr_hz"),
        F.lit(None).cast("int").alias("dur_ms"),
        F.lit(None).cast("string").alias("codec"),
        "transcript",
    )


def candidates_leg(spark, cfg, with_hot: bool) -> dict:
    feats = build_features(corpus(spark, with_hot), cfg, with_audio=False)
    feats = feats.localCheckpoint(eager=True)  # isolate the candidates stage
    sigs = build_signatures(
        feats, cfg, detectors=("minhash", "suffix")
    ).localCheckpoint(eager=True)
    stats: dict = {}
    handles: list = []
    t0 = time.time()
    pairs = build_candidates(sigs, cfg, stats_out=stats, handles_out=handles)
    n_pairs = pairs.count()
    wall = time.time() - t0
    for h in handles:
        h.unpersist()
    return {
        "hot": with_hot,
        "clips": N_UNIQUE + (N_HOT if with_hot else 0),
        "candidates_wall_sec": round(wall, 2),
        "candidate_pairs": n_pairs,
        "oversize_buckets": stats,
    }


def suffix_pruning_probe(spark, cfg) -> dict:
    """Fraction of index postings in buckets never probed by a query
    key — the upper bound on what df-based pruning could remove."""
    feats = build_features(corpus(spark, True), cfg, with_audio=False)
    sigs = build_signatures(feats, cfg, detectors=("suffix",)).localCheckpoint(
        eager=True
    )
    idx = sigs.filter(F.col("role") == ROLE_IDX)
    qry_keys = sigs.filter(F.col("role") == ROLE_QRY).select("bucket_key").distinct()
    n_idx = idx.count()
    n_unprobed = idx.join(qry_keys, "bucket_key", "left_anti").count()
    return {
        "postings_rows": n_idx,
        "postings_in_unprobed_buckets": n_unprobed,
        "prunable_fraction": round(n_unprobed / max(n_idx, 1), 4),
    }


def main() -> None:
    cfg = DedupConfig(bucket_cap=CAP)
    spark = get_spark(app_name="hotbucket-bench", cores=8)
    spark.sparkContext.setLogLevel("ERROR")

    base = candidates_leg(spark, cfg, with_hot=False)
    hot = candidates_leg(spark, cfg, with_hot=True)
    prune = suffix_pruning_probe(spark, cfg)

    hot_pairs = hot["candidate_pairs"] - base["candidate_pairs"]
    out = {
        "metric": "hot_bucket_candidates",
        "cap": CAP,
        "n_hot": N_HOT,
        "base": base,
        "hot": hot,
        "hot_bucket_extra_pairs": hot_pairs,
        "linear_bound_n_cap_over_2": N_HOT * CAP // 2,
        "quadratic_would_be": N_HOT * (N_HOT - 1) // 2,
        "suffix_pruning": prune,
    }
    print(json.dumps(out))
    with open("HOTBUCKET.json", "w") as f:
        json.dump(out, f, indent=2)
    spark.stop()


if __name__ == "__main__":
    main()
