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

import math
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


def lsh_sizing(n: int, target_cos: float = 0.97, target_recall: float = 0.999,
               slack: int = 1, min_planes: int = 8) -> tuple[int, int]:
    """(bands, planes_per_band) for banded sign-LSH over n vectors.

    Sizing rule (the round-1 plane count was fixed at 16, i.e. pair
    volume Θ(n²/2^16) — quadratic again at 10^9 vectors):

    - planes_per_band r = max(min_planes, ceil(log2 n) + slack), so a
      RANDOM pair collides in one band with prob 2^-r <= 2^-slack / n
      and expected per-band candidate volume C(n,2)/2^r <= n/2^(slack+1)
      stays linear in n by construction;
    - bands b = smallest count with banded recall 1-(1-a^r)^b >=
      target_recall for a true near-dup at cosine target_cos, where
      a = 1 - arccos(cos)/pi is the per-plane agreement probability.
      b grows ~n^(log2(1/a)) — for 0.97-cosine dups that is ~n^0.12, so
      total candidate volume is the classic near-linear LSH n^(1+rho),
      rho ≈ 0.12 (tested in tests/test_similarity.py).
    """
    r = max(min_planes, math.ceil(math.log2(max(n, 2))) + slack)
    a = 1.0 - math.acos(min(max(target_cos, -1.0), 1.0)) / math.pi
    p_band = a ** r
    b = max(1, math.ceil(math.log(1.0 - target_recall) / math.log(1.0 - p_band)))
    return b, r


def banded_planes(dim: int, bands: int, rows: int,
                  seed: int = 42) -> list[list[list[float]]]:
    """bands × rows hyperplanes, sliced from the same seeded stream as
    lsh_planes (single-band configs stay bit-compatible)."""
    flat = lsh_planes(dim, bands * rows, seed)
    return [flat[b * rows:(b + 1) * rows] for b in range(bands)]


def _fmt(w: float, engine: str) -> str:
    """A double literal both engines parse to the bit-identical value:
    scientific notation with 17 significant digits is a DOUBLE literal
    in Spark SQL and DuckDB alike (a bare '0.1...' is DECIMAL in both)."""
    return f"{w:.17e}"


def _dot_sql(col: str, plane: list[float], engine: str) -> str:
    """vec · plane with a left-to-right accumulation order that is
    bit-identical across engines, in each engine's cheapest-to-compile
    form:

    - Spark: aggregate(zip_with(...)) — codegen emits a LOOP. Unrolled
      64-term sums looked equivalent but Janino OOM'd the driver
      compiling ~10k unrolled multiply terms per projection (observed
      at 14 bands x 11 planes x 64 dims).
    - DuckDB: explicit unrolled sum — lambdas there are re-evaluated
      per reference (round 1's 4096x CTE blowup), and the oracle runs
      once per band branch so unrolled is both safe and fast.

    Parity: IEEE fold from 0.0 (0.0 + x == x exactly) then strictly
    left-assoc adds in both forms → identical doubles → identical
    sign-bit buckets."""
    if engine == "duckdb":  # 1-indexed lists
        return "(" + " + ".join(
            f"{col}[{i + 1}] * {_fmt(w, engine)}" for i, w in enumerate(plane)
        ) + ")"
    weights = ", ".join(_fmt(w, engine) for w in plane)
    return (
        f"aggregate(zip_with({col}, array({weights}), (x, y) -> x * y), "
        f"0.0e0, (acc, v) -> acc + v)"
    )


def band_bucket_sql(col: str, band_planes: list[list[float]],
                    engine: str) -> str:
    """One band's sign-bit bucket id: bit i = (vec · plane_i > 0)."""
    bits = " + ".join(
        f"(CASE WHEN {_dot_sql(col, p, engine)} > 0.0e0 THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(band_planes)
    )
    return f"({bits})"


def banded_bucket_structs_sql(col: str,
                              planes_by_band: list[list[list[float]]]) -> str:
    """Spark SQL: array of (band, bucket) structs, exploded 1:bands —
    the embedding analog of the minhash band-key fan-out."""
    entries = [
        f"named_struct('band', {b}, 'bucket', {band_bucket_sql(col, planes, 'spark')})"
        for b, planes in enumerate(planes_by_band)
    ]
    return "array(" + ", ".join(entries) + ")"


def ann_near_dup_pairs_banded(emb: DataFrame,
                              planes_by_band: list[list[list[float]]],
                              threshold: float,
                              id_col: str = "vec_id",
                              handles_out: list | None = None) -> DataFrame:
    """Banded sign-LSH near-dup pairs: same (band, bucket) → candidate,
    exact cosine >= threshold → pair. The blocking→verify shape of the
    dedup detectors applied to embeddings; with lsh_sizing this is the
    scale path (near-linear candidate volume), replacing the round-1
    contract/bench entry's O(n²) crossJoin.

    The bucket join shuffles only (id, band, bucket) int rows; the two
    verify joins move each embedding once per matched pair side.

    ROUND-6 note: two restructurings of the bucket computation were
    A/B'd against this literal-SQL projection and REJECTED on bench
    evidence — (a) planes in a broadcast DataFrame + crossJoin + one
    generic dot (tiny plan, but the 99x row blowup plus an extra
    groupBy shuffle cost more than the literal plan's parse:
    3.4 s -> 5.1 s for the contract query), and (b) an unrolled
    64-term subscript dot (128 ANSI-checked GetArrayItems per row lost
    to the interpreted fold, 4.0-4.6 s vs 2.7 s warm). What stayed is
    the `base` persist below.

    The slim (id, embedding) projection is materialized ONCE: the
    bucket projection reads it and the two verify joins read it twice
    more — against a live plan (e.g. the derived perturbed-copy
    corpus) every reference re-evaluated the embedding transform.
    Registered in handles_out for the caller to release with the
    bucket cache."""
    base = emb.select(id_col, "embedding").persist()
    if handles_out is not None:
        handles_out.append(base)
    bucketed = base.select(
        F.col(id_col),
        F.explode(F.expr(banded_bucket_structs_sql("embedding", planes_by_band))).alias("e"),
    ).select(id_col, F.col("e.band").alias("band"), F.col("e.bucket").alias("bucket"))
    # lineage cut: the bucket projection is a ~b*r*dim-node expression
    # tree; self-joining it unmaterialized duplicates that tree into
    # both join sides and the broadcast/codegen build OOMs the driver
    # (observed at 14 bands x 11 planes x 64 dims; localCheckpoint's
    # RDD-conversion codegen OOMs too — it lacks whole-stage codegen's
    # huge-method fallback). persist + eager count materializes through
    # the DataFrame path, so downstream joins see only the cached
    # (id, band, bucket) ints. MEMORY_AND_DISK: spills, never OOMs.
    bucketed = bucketed.persist()
    bucketed.count()
    if handles_out is not None:
        # caller unpersists once the pair frame is materialized —
        # otherwise the cached bucket blocks live until LRU eviction
        handles_out.append(bucketed)
    a = bucketed.select(F.col(id_col).alias("src_vec"), "band", "bucket")
    b = bucketed.select(F.col(id_col).alias("dst_vec"), "band", "bucket")
    cands = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("src_vec") < F.col("dst_vec"))
        .select("src_vec", "dst_vec")
        .dropDuplicates(["src_vec", "dst_vec"])
    )
    ea = base.select(F.col(id_col).alias("src_vec"), F.col("embedding").alias("ea"))
    eb = base.select(F.col(id_col).alias("dst_vec"), F.col("embedding").alias("eb"))
    sim = cosine_expr(F.col("ea"), F.col("eb"))
    return (
        cands.join(ea, "src_vec").join(eb, "dst_vec")
        .filter(sim >= threshold)
        .select("src_vec", "dst_vec")
    )


def run_embedding_dedup(emb: DataFrame, threshold: float = 0.9,
                        target_cos: float = 0.97, target_recall: float = 0.999,
                        id_col: str = "vec_id", dim: int | None = None,
                        seed: int = 42) -> tuple[DataFrame, dict]:
    """n-adaptive embedding near-dup pairs — the pipeline-level entry
    (VERDICT r3 task #5): count n once, derive (bands, planes_per_band)
    from lsh_sizing(n), and run the banded blocking→verify operator.

    Any FIXED plane count is wrong at some scale — too few planes is
    quadratic candidate volume at 10^9 vectors, too many is recall loss
    at 10^3 — so the sizing must be computed from the corpus, not
    pinned in a config. Costs one count() job up front; the pair frame
    is materialized (cluster-safe via materialize()) before return so
    the bucket-projection cache can be released here rather than
    leaking to the caller.

    Returns ``(pairs, info)`` where pairs is (src_vec, dst_vec) with
    exact cosine >= threshold, and info records n/dim/bands/rows.
    """
    from .materialize import materialize

    n = emb.count()

    def _empty(d: int) -> tuple[DataFrame, dict]:
        return emb.sparkSession.createDataFrame(
            [], "src_vec long, dst_vec long"
        ), {"n": n, "dim": d, "bands": 0, "rows": 0}

    # gate on n == 0 BEFORE the dim probe: with dim passed explicitly an
    # empty frame used to run lsh_sizing(0) and the full banded chain
    # for nothing (ADVICE r4)
    if n == 0:
        return _empty(dim or 0)
    if dim is None:
        # NULL embeddings carry no dimensionality — probe the first
        # non-null row (a leading NULL used to raise TypeError on len())
        first = (
            emb.filter(F.col("embedding").isNotNull())
            .select(id_col, "embedding").head()
        )
        if first is None:
            return _empty(0)
        dim = len(first["embedding"])
    bands, rows = lsh_sizing(n, target_cos=target_cos,
                             target_recall=target_recall)
    planes = banded_planes(dim, bands, rows, seed)
    handles: list = []
    pairs = ann_near_dup_pairs_banded(
        emb, planes, threshold, id_col=id_col, handles_out=handles
    )
    pairs = materialize(pairs, eager=True)
    for h in handles:
        h.unpersist()
    return pairs, {"n": n, "dim": dim, "bands": bands, "rows": rows}


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
