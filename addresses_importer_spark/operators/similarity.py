"""Similarity search over embedding columns.

- brute-force cosine top-k: the exactness baseline (oracle-checked in
  plans/driver_queries.q_cosine_topk);
- sign-bit LSH bucketing: the scale path — seeded random hyperplanes
  (constants shared with the DuckDB oracle) map each vector to a small
  integer bucket; candidate pairs come from same-bucket joins, verified
  by exact cosine. Same blocking→verify shape as the dedup detectors.

All vector math is JVM-side Column expressions (zip_with/aggregate) —
no Python in the scan path.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, Window, functions as F


def cosine_expr(a: Column, b: Column) -> Column:
    """NULL for zero vectors: an unguarded division would fail the whole
    job under Spark 4's default ANSI mode (DIVIDE_BY_ZERO) on the first
    all-zero embedding. NULL never passes a `>= threshold` filter, so
    zero vectors are simply unmatched — same convention as the DuckDB
    oracle fragment (driver_queries._SQL_COS_AB)."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v,
    )
    na = F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v,
    ))
    nb = F.sqrt(F.aggregate(
        F.transform(b, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v,
    ))
    return F.when(na * nb > 0, dot / (na * nb))


def lsh_planes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Seeded hyperplanes as plain floats — inlinable into both Spark
    expressions and oracle SQL (determinism contract)."""
    rng = random.Random(seed)
    return [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)
    ]


def lsh_bucket_expr(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id: bit i = (vec · plane_i > 0)."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        dot = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(float(w)) for w in plane]),
                lambda x, w: x.cast("double") * w,
            ),
            F.lit(0.0), lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(dot > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def brute_force_topk(emb: DataFrame, query_vec: DataFrame, k: int = 10,
                     id_col: str = "vec_id") -> DataFrame:
    """Exact top-k by cosine vs a single (broadcast) query vector."""
    sim = cosine_expr(F.col("embedding"), F.col("q_embedding"))
    return (
        emb.crossJoin(F.broadcast(query_vec.select(F.col("embedding").alias("q_embedding"))))
        .select(id_col, sim.alias("sim"))
        .orderBy(F.desc("sim"), F.asc(id_col))
        .limit(k)
    )


def ann_near_dup_pairs(emb: DataFrame, planes: list[list[float]],
                       threshold: float, id_col: str = "vec_id") -> DataFrame:
    """LSH-bucketed near-dup pairs: same sign-bucket → exact cosine >=
    threshold. At 16 planes, expected bucket size = n / 2^16 — the
    O(n²) brute-force cross join becomes a per-bucket join. Recall vs
    brute force is probabilistic (near-identical vectors agree on every
    sign bit with high probability); tests measure it."""
    with_bucket = emb.select(
        F.col(id_col), "embedding",
        lsh_bucket_expr(F.col("embedding"), planes).alias("bucket"),
    )
    a = with_bucket.select(
        F.col(id_col).alias("src_vec"), F.col("embedding").alias("ea"),
        F.col("bucket").alias("b"),
    )
    b = with_bucket.select(
        F.col(id_col).alias("dst_vec"), F.col("embedding").alias("eb"),
        F.col("bucket").alias("b"),
    )
    sim = cosine_expr(F.col("ea"), F.col("eb"))
    return (
        a.join(b, "b")
        .filter(F.col("src_vec") < F.col("dst_vec"))
        .select("src_vec", "dst_vec", sim.alias("sim"))
        .filter(F.col("sim") >= threshold)
    )


def ivf_topk(emb: DataFrame, query_vec: DataFrame, planes: list[list[float]],
             k: int = 10, n_probe_buckets: int = 1,
             id_col: str = "vec_id") -> DataFrame:
    """IVF-flavored ANN top-k: restrict the scan to the query's LSH
    bucket(s) then exact-rank inside. n_probe_buckets=1 searches only
    the query's own bucket; callers trade recall for speed."""
    q = query_vec.select(
        F.col("embedding").alias("q_embedding"),
        lsh_bucket_expr(F.col("embedding"), planes).alias("qb"),
    )
    with_bucket = emb.select(
        F.col(id_col), "embedding",
        lsh_bucket_expr(F.col("embedding"), planes).alias("bucket"),
    )
    sim = cosine_expr(F.col("embedding"), F.col("q_embedding"))
    return (
        with_bucket.join(F.broadcast(q), F.col("bucket") == F.col("qb"))
        .select(id_col, sim.alias("sim"))
        .orderBy(F.desc("sim"), F.asc(id_col))
        .limit(k)
    )
