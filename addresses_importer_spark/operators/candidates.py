"""Stage 2 — candidate pair generation from LSH bucket collisions.

Graft of the reference's collisions query + pack iteration
(db_hashes.rs:484-513: equi-join + EXISTS semi-join keeping only hash
groups of size >= 2, ORDER BY hash; deduplicator.rs:98-180: group_by
hash → pack → pairwise).

Two pairing modes, driven by the signature `role` column:

- SYMMETRIC (role=both; minhash bands, simhash original values): all
  pairs within a bucket. Small buckets expand via a JVM array
  comprehension after one groupBy (no join); large buckets go through a
  self-join so no single row ever materializes a bucket's full pair set.
- ASYMMETRIC (role=qry vs role=idx/both; simhash probe flips, suffix
  rarest-shingle queries vs postings): a hash join of query keys
  against index postings. Probe×probe and posting×posting rows never
  pair — this is what keeps candidate volume linear-ish (measured on a
  2.6k synthetic corpus: 1.48M → ~10k candidates after the redesign).

Skew guard: the reference silently DROPS packs > 5000 members
(deduplicator.rs:120-155, logging the first 10). Round 1 capped +
counted (buckets over the cap contributed nothing). Round 2 SALTS
instead: members of a bucket with n > cap are split into S = ceil(n /
cap) sub-buckets by pmod(md5(clip_id), S) and paired within their
sub-bucket, so a hot bucket contributes at most ~n*cap/2 pairs (linear
in n, never quadratic) with non-zero in-bucket recall (~1/S of
in-bucket pairs, while other bands still catch most true dups). The
md5-based salt is oracle-expressible; the correctness-gate corpus has
no oversize buckets (asserted in tests), so the DuckDB CTEs stay
cap-only. oversize_bucket_stats still surfaces hot-bucket counts —
nothing disappears silently, and now nothing is dropped either.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row, functions as F

from ..config import DedupConfig
from ..functions.hashing import md5_long
from .signatures import (
    DETECTOR_SIMHASH, ROLE_BOTH, ROLE_QRY, simhash_probe_flips,
)

#: buckets up to this size expand pairs via a JVM array comprehension in
#: one task row (<= ~2k structs); larger buckets go through a self-join
#: so the pair set is produced across many tasks instead of one giant
#: in-memory array (a 5000-member bucket is 12.5M pairs — never build
#: that inside a single row).
PAIR_EXPAND_MAX = 64


def bucket_groups(signatures: DataFrame) -> DataFrame:
    """Symmetric-role buckets: (detector, bucket_key, members, n) for
    groups of >= 2. Sorted members make pair orientation (src < dst)
    deterministic — the reference's deterministic pack ordering
    (deduplicator.rs:157-164)."""
    return (
        signatures.filter(F.col("role") == ROLE_BOTH)
        .groupBy("detector", "bucket_key")
        .agg(F.array_sort(F.collect_set("clip_id")).alias("members"))
        .withColumn("n", F.size("members"))
        .filter(F.col("n") >= 2)
    )


def index_bucket_sizes(signatures: DataFrame) -> DataFrame:
    """Asymmetric-mode index-side bucket sizes (role != qry).

    count(*) not countDistinct: every emitter produces at most one
    (clip_id, bucket_key) row per role class (minhash bands / simhash
    band values / distinct suffix shingles are all de-duplicated at the
    source), and plain count keeps the aggregation single-phase with
    map-side combine — countDistinct added a full expand+reshuffle of
    the postings table, the largest in the job."""
    return (
        signatures.filter(F.col("role") != ROLE_QRY)
        .groupBy("detector", "bucket_key")
        .agg(F.count("*").alias("n"))
    )


#: hot-bucket key lists up to this many rows are broadcast into the
#: salt joins (~30 MB hashed at the bound). By construction there are
#: at most postings/cap oversize buckets, and real skew means FEW hot
#: keys — above the bound (pathological: >10^9 postings all hot) the
#: plan falls back to AQE-planned shuffle joins.
BROADCAST_HOT_BUCKETS_MAX = 1_000_000


def _probe_hot_sides(sym_groups: DataFrame, oversize_idx: DataFrame,
                     cfg: DedupConfig) -> tuple[int, int]:
    """(# symmetric buckets over the cap, # index buckets over the cap)
    in ONE driver round trip — a union of two count branches over the
    persisted grouped frames (which this fully materializes, warming
    the cache the pair paths read next). The counts gate the salting
    machinery out of the plan entirely in the common no-skew case, and
    size the broadcast decision for the hot case."""
    rows = (
        sym_groups.filter(F.col("n") > cfg.bucket_cap)
        .agg(F.count("*").alias("c"))
        .select(F.lit("sym").alias("side"), "c")
        .unionAll(
            oversize_idx.agg(F.count("*").alias("c"))
            .select(F.lit("idx").alias("side"), "c")
        )
        .collect()
    )
    by_side = {r["side"]: int(r["c"]) for r in rows}
    return by_side.get("sym", 0), by_side.get("idx", 0)


def qry_signatures(signatures: DataFrame, cfg: DedupConfig) -> DataFrame:
    """QUERY-side keys for the asymmetric pairing: stored qry-role rows
    (suffix rarest-shingle keys) plus the simhash 1-bit probe flips,
    which since round 6 are DERIVED from the stored band keys by bit
    math instead of being materialized through the signatures
    checkpoint (32 rows per (clip, band) that only the probe join ever
    read — see signatures.simhash_band_keys_sql)."""
    return signatures.filter(F.col("role") == ROLE_QRY).unionByName(
        simhash_probe_flips(signatures, cfg)
    )


def _oversize_stats(signatures: DataFrame, sym_groups: DataFrame,
                    oversize_idx: DataFrame, cfg: DedupConfig,
                    any_hot_sym: bool, any_hot_idx: bool) -> dict:
    """Per-detector counts of buckets over the cap — the reference's
    oversize-pack log (deduplicator.rs:141-147) as data, computed from
    the already-persisted grouped frames (round 1 re-aggregated the full
    signature table once per tally).

    The asymmetric tally is restricted to buckets actually probed by a
    qry-role key; a pure role=both bucket (minhash bands) otherwise
    appeared once in each tally. The probed-set distinct (a full scan
    of qry keys) only runs when oversize index buckets exist at all —
    and with no oversize buckets on either side the whole tally is a
    driver-side {} with zero Spark jobs."""
    if not any_hot_sym and not any_hot_idx:
        return {}
    parts = []
    if any_hot_sym:
        parts.append(
            sym_groups.filter(F.col("n") > cfg.bucket_cap).select("detector", "n")
        )
    if any_hot_idx:
        probed = qry_signatures(signatures, cfg).select(
            "detector", "bucket_key"
        ).distinct()
        parts.append(
            oversize_idx.join(probed, ["detector", "bucket_key"], "left_semi")
            .select("detector", "n")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    rows = (
        out.groupBy("detector")
        .agg(F.count("*").alias("buckets"), F.sum("n").alias("rows"))
        .collect()
    )
    return {r["detector"]: {"buckets": r["buckets"], "rows": r["rows"]}
            for r in rows}


def oversize_bucket_stats(signatures: DataFrame, cfg: DedupConfig) -> list:
    """Standalone stats entry point (tests / ad-hoc); the pipeline gets
    the same numbers from build_candidates(stats_out=...) without extra
    aggregations."""
    sym_groups = bucket_groups(signatures)
    oversize_idx = index_bucket_sizes(signatures).filter(
        F.col("n") > cfg.bucket_cap
    )
    n_hot_sym, n_hot_idx = _probe_hot_sides(sym_groups, oversize_idx, cfg)
    stats = _oversize_stats(signatures, sym_groups, oversize_idx, cfg,
                            n_hot_sym > 0, n_hot_idx > 0)
    return [
        Row(detector=d, buckets=v["buckets"], rows=v["rows"])
        for d, v in sorted(stats.items())
    ]


def _salt_expr(n_col: str, cap: int) -> F.Column:
    """pmod(md5(clip_id), ceil(n/cap)) — deterministic sub-bucket id,
    0 for buckets within the cap (S=1)."""
    s = F.ceil(F.col(n_col) / F.lit(cap)).cast("long")
    return F.pmod(md5_long(F.col("clip_id")), F.greatest(s, F.lit(1)))


def _symmetric_pairs(all_groups: DataFrame, cfg: DedupConfig,
                     any_hot: bool = True) -> DataFrame:
    if not any_hot:
        # probed skew-free: every group is under the cap, so the salted
        # explode/regroup branch (an extra shuffle of hot members) never
        # enters the plan at all
        groups = all_groups.withColumn("salt", F.lit(0).cast("long"))
    else:
        ok = all_groups.filter(F.col("n") <= cfg.bucket_cap).withColumn(
            "salt", F.lit(0).cast("long")
        )
        # hot buckets: explode, salt, regroup into ~cap-sized sub-buckets
        hot = (
            all_groups.filter(F.col("n") > cfg.bucket_cap)
            .select("detector", "bucket_key", "n",
                    F.explode("members").alias("clip_id"))
            .withColumn("salt", _salt_expr("n", cfg.bucket_cap))
            .groupBy("detector", "bucket_key", "salt")
            .agg(F.array_sort(F.collect_set("clip_id")).alias("members"))
            .withColumn("n", F.size("members"))
            .filter(F.col("n") >= 2)
        )
        groups = ok.unionByName(hot.select(*ok.columns))

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
        "detector", "bucket_key", "salt", F.explode("members").alias("clip_id")
    )
    l, r = lmembers.alias("l"), lmembers.alias("r")
    large_pairs = (
        l.join(
            r,
            (F.col("l.detector") == F.col("r.detector"))
            & (F.col("l.bucket_key") == F.col("r.bucket_key"))
            & (F.col("l.salt") == F.col("r.salt"))
            & (F.col("l.clip_id") < F.col("r.clip_id")),
        )
        .select(
            F.col("l.clip_id").alias("src"),
            F.col("r.clip_id").alias("dst"),
            F.col("l.detector").alias("detector"),
        )
    )
    return small_pairs.unionByName(large_pairs)


def _asymmetric_pairs(signatures: DataFrame, oversize: DataFrame,
                      cfg: DedupConfig, any_hot: bool = True) -> DataFrame:
    """qry keys × (idx|both) postings within a bucket. The suffix
    detector's postings join IS the distributed suffix-array probe; for
    simhash it matches probe flips against original band values.

    Hot index buckets (> cap postings) are salted on BOTH sides by
    pmod(md5(clip_id), S): a qry key meets only its own ~cap-sized
    sub-bucket, bounding its fan-out (round 1 dropped these buckets
    outright; the reference deletes every member, deduplicator.rs:
    120-155 — salting keeps partial in-bucket recall at linear cost).

    `oversize` = index buckets over the cap. Joining the FULL postings
    table against all bucket sizes would shuffle the biggest table in
    the job just to compute salts that are 0 almost everywhere; the
    left-join against only the oversize buckets (rare by construction —
    at most rows/cap of them) is AQE-broadcast in the common case,
    leaving the postings unshuffled. With `any_hot=False` (probed once
    per build) even that broadcast join drops out of the plan."""
    join_keys = ["detector", "bucket_key"]

    def _side(df: DataFrame, id_alias: str) -> DataFrame:
        slim = df.select("detector", "bucket_key", "clip_id")
        if not any_hot:
            return slim.select(*join_keys, F.col("clip_id").alias(id_alias))
        return (
            slim.join(oversize, join_keys, "left")
            .withColumn(
                "salt",
                F.when(F.col("n").isNull(), F.lit(0).cast("long"))
                .otherwise(_salt_expr("n", cfg.bucket_cap)),
            )
            .select(*join_keys, "salt", F.col("clip_id").alias(id_alias))
        )

    qry_sigs = qry_signatures(signatures, cfg)
    # the equi-join keys on (detector, bucket_key), so index rows of
    # detectors that never emit a query-role key (minhash: role=both
    # only — its pairs come from the symmetric path) can never match;
    # dropping them map-side keeps ~half the index rows out of the join
    # shuffle (416k of 468k+postings at sf0.1; 10x that at sf1.0). The
    # probed-detector set is data-driven: distinct detectors of STORED
    # qry rows (a 1-2 row broadcast) plus simhash when probe flips are
    # derived (qry_signatures).
    qry_dets = (
        signatures.filter(F.col("role") == ROLE_QRY)
        .select("detector").distinct()
    )
    if cfg.simhash_probe_bits >= 1:
        qry_dets = qry_dets.unionByName(
            signatures.sparkSession.createDataFrame(
                [(DETECTOR_SIMHASH,)], "detector string"
            )
        ).distinct()
    qry = _side(qry_sigs, "qry_id")
    idx = _side(
        signatures.filter(F.col("role") != ROLE_QRY).join(
            F.broadcast(qry_dets), "detector", "left_semi"
        ),
        "idx_id",
    )
    on = join_keys + (["salt"] if any_hot else [])
    return (
        qry.join(idx, on)
        .filter(F.col("qry_id") != F.col("idx_id"))
        .select(
            F.least("qry_id", "idx_id").alias("src"),
            F.greatest("qry_id", "idx_id").alias("dst"),
            "detector",
        )
    )


def build_candidates(signatures: DataFrame, cfg: DedupConfig,
                     stats_out: dict | None = None,
                     handles_out: list | None = None) -> DataFrame:
    """(src, dst, detector) with src < dst, distinct (A6 distinct-set
    semantics, deduplicator.rs:216-222).

    The two grouped frames (symmetric bucket groups, index bucket
    sizes) are each computed ONCE and persisted — round 1 re-aggregated
    the full signature table up to four times per run (pair paths +
    oversize stats), and those aggregations dominated the candidates
    stage wall (59 s of a 150 s pipeline at 130k clips).

    One limit-1 probe job then decides per side whether ANY bucket
    exceeds the cap; in the (by-construction common) skew-free case the
    salting joins/unions never enter the plan and the oversize tally is
    a zero-job {}.

    stats_out: pass a dict to receive the per-detector oversize-bucket
    counters computed from the same persisted frames.
    handles_out: pass a list to receive the persisted frames; unpersist
    them once the pair DataFrame is materialized (callers that don't,
    rely on LRU eviction — fine for short-lived test sessions, a slow
    cache leak for long-lived ones)."""
    sym_groups = bucket_groups(signatures).persist()
    idx_sizes = index_bucket_sizes(signatures).persist()
    oversize_idx = idx_sizes.filter(F.col("n") > cfg.bucket_cap)
    n_hot_sym, n_hot_idx = _probe_hot_sides(sym_groups, oversize_idx, cfg)
    any_hot_sym, any_hot_idx = n_hot_sym > 0, n_hot_idx > 0
    # explicit broadcast of the (by-construction small) hot-key list:
    # left AQE-planned, the salt left-joins executed as sort-merge and
    # hash-repartitioned the FULL postings table twice before the pair
    # join even started (measured on the 60k hot-bucket bench corpus) —
    # broadcast keeps the salt computation map-side, so postings cross
    # exactly one Exchange on their way to the pair join
    over_join = (
        F.broadcast(oversize_idx)
        if 0 < n_hot_idx <= BROADCAST_HOT_BUCKETS_MAX
        else oversize_idx
    )
    pairs = (
        _symmetric_pairs(sym_groups, cfg, any_hot=any_hot_sym)
        .unionByName(
            _asymmetric_pairs(signatures, over_join, cfg, any_hot=any_hot_idx)
        )
        .dropDuplicates(["src", "dst", "detector"])
    )
    if stats_out is not None:
        stats_out.update(
            _oversize_stats(signatures, sym_groups, oversize_idx, cfg,
                            any_hot_sym, any_hot_idx)
        )
    if handles_out is not None:
        handles_out.extend([sym_groups, idx_sizes])
    return pairs
