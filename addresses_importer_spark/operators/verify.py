"""Stage 3 — pairwise verification of candidate edges.

Graft of ``is_duplicate`` (deduplicator/src/lib/dedupe.rs:129-198): a
3-clause disjunction with cheap→expensive short-circuiting (the
reference lazy-gates libpostal calls behind the haversine test,
dedupe.rs:137-176). Here each detector contributes one clause:

  minhash  : exact Jaccard(shingles) >= threshold    (street/number tier)
  simhash  : Hamming(simhash) <= max_hamming         (10m/100m distance tier)
  suffix   : exact substring containment of the shorter normalized
             transcript inside the longer one        (exact tier)

NULL semantics mirror utils.rs:84-131: a missing field (NULL simhash /
empty shingles) never CONFIRMS a match — clauses with NULL inputs
evaluate false, they don't poison the disjunction.

All checks are JVM expressions over the features columns — the
"expensive" libpostal work has already been paid once per clip in the
signature stage, so verification is cheap per edge and never touches
audio bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..config import DedupConfig
from ..functions.hashing import hamming64, jaccard
from .signatures import DETECTOR_MINHASH, DETECTOR_SIMHASH, DETECTOR_SUFFIX

def _joined(cands: DataFrame, features: DataFrame,
            cols: list[str]) -> DataFrame:
    """Candidates joined with ONLY the feature columns the detector's
    clause reads — verifying simhash pairs used to ship each clip's
    5 KB shingle array plus the normalized transcript through both join
    shuffles just to read one int64."""
    f_src = features.select(*[F.col(c).alias(f"src_{c}") for c in cols])
    f_dst = features.select(*[F.col(c).alias(f"dst_{c}") for c in cols])
    return (
        cands
        .join(f_src, cands.src == f_src.src_clip_id, "inner")
        .join(f_dst, cands.dst == f_dst.dst_clip_id, "inner")
    )


def verify_edges(candidates: DataFrame, features: DataFrame,
                 cfg: DedupConfig) -> DataFrame:
    """(src, dst, detector, score) for edges passing their detector's
    check; one row per (src, dst) after detector-level dedup is the
    caller's choice — components only need distinct (src, dst).

    One slim join pair per detector, unioned — a single Spark job, but
    each exchange carries only that clause's inputs."""
    jac = jaccard(F.col("src_shingle_hashes"), F.col("dst_shingle_hashes"))
    minhash = (
        _joined(
            candidates.filter(F.col("detector") == DETECTOR_MINHASH),
            features, ["clip_id", "shingle_hashes"],
        )
        .filter(
            (F.size("src_shingle_hashes") > 0)
            & (F.size("dst_shingle_hashes") > 0)
            & (jac >= cfg.jaccard_threshold)
        )
        .select("src", "dst", "detector", jac.alias("score"))
    )

    ham = hamming64(F.col("src_simhash"), F.col("dst_simhash"))
    simhash = (
        _joined(
            candidates.filter(F.col("detector") == DETECTOR_SIMHASH),
            features, ["clip_id", "simhash"],
        )
        .filter(
            F.col("src_simhash").isNotNull()
            & F.col("dst_simhash").isNotNull()
            & (ham <= cfg.simhash_max_hamming)
        )
        .select(
            "src", "dst", "detector",
            (1.0 - ham.cast("double") / cfg.simhash_bits).alias("score"),
        )
    )

    shorter = F.when(
        F.length("src_norm") <= F.length("dst_norm"), F.col("src_norm")
    ).otherwise(F.col("dst_norm"))
    longer = F.when(
        F.length("src_norm") <= F.length("dst_norm"), F.col("dst_norm")
    ).otherwise(F.col("src_norm"))
    contained = (
        (F.length(shorter) >= cfg.min_containment_len)
        & F.contains(longer, shorter)
    )
    suffix = (
        _joined(
            candidates.filter(F.col("detector") == DETECTOR_SUFFIX),
            features, ["clip_id", "norm"],
        )
        .filter(contained)
        .select("src", "dst", "detector", F.lit(1.0).alias("score"))
    )

    return minhash.unionByName(simhash).unionByName(suffix)
