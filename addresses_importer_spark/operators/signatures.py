"""Stage 1 — per-clip features + exploded blocking signatures.

Graft of the reference's ingest pipeline (deduplicator.rs:288-305,
348-420): one record → k blocking hashes, fanned out into the 1:N
``_addresses_hashes`` table (db_hashes.rs:61-65). Here:

  features(clip_id, rank, norm, shingle_hashes, minhash_sig, simhash)
  signatures(clip_id, detector, band, bucket_key)

- transcript MinHash + suffix bottom-k are pure JVM expressions
  (whole-stage codegen; see functions/hashing.py);
- audio SimHash is the one pandas UDF (Arrow-batched numpy FFT) — the
  only stage that ever touches ``bytes``, so every later shuffle moves
  signatures, never audio payloads (SURVEY §7.4 risk 3).

Records with an empty blocking-key set are dropped exactly like the
reference drops empty hash sets (deduplicator.rs:371-374).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import LongType

from ..config import CODEC_PRIORITY, DedupConfig
from ..functions import audio as A
from ..functions.hashing import (
    band_keys, md5_long, minhash_signature, poly_codes_sql,
    poly_hashes_from_codes_sql,
)
from ..functions.text import normalize_text
from .materialize import materialize

DETECTOR_MINHASH = "minhash"
DETECTOR_SIMHASH = "simhash"
DETECTOR_SUFFIX = "suffix"


def rank_expr() -> F.Column:
    """Quality rank = codec priority + completeness bonus + payload
    richness, mirroring the reference's `priority +
    completeness/(1+NB_FIELDS)` ranking (sources.rs:86-88,
    tools/src/lib.rs:111-120). Deterministic.

    The transcript-length term (<= 0.001, below every other term's
    granularity) makes a containment pair keep the CONTAINER: without
    it, text-only rows rank identically and the (rank, clip_id) desc
    tiebreak can pick a truncated copy as the survivor — the wrong
    record for a training-data pipeline. The term is replicated
    verbatim in the DuckDB survivor oracles (driver_queries)."""
    codec_prio = F.coalesce(
        *[
            F.when(F.col("codec") == c, F.lit(float(p)))
            for c, p in CODEC_PRIORITY.items()
        ],
        F.lit(0.0),
    )
    completeness = (
        F.col("transcript").isNotNull().cast("int")
        + (F.coalesce(F.col("dur_ms"), F.lit(0)) > 0).cast("int")
        + F.col("bytes").isNotNull().cast("int")
    ).cast("double")
    dur_bonus = F.least(
        F.coalesce(F.col("dur_ms"), F.lit(0)).cast("double") / 60000.0, F.lit(1.0)
    )
    len_bonus = (
        F.least(
            F.coalesce(F.length("transcript"), F.lit(0)), F.lit(100000)
        ).cast("double")
        / 100000.0
        / 1000.0
    )
    return codec_prio + completeness / 10.0 + dur_bonus / 100.0 + len_bonus


def audio_simhash_udf(cfg: DedupConfig):
    """Arrow-batched pandas UDF: WAV bytes → 64-bit SimHash (int64).

    NULL for undecodable payloads (codec gate) — those clips simply emit
    no acoustic signatures, the reference's errors-side-channel pattern
    (tools/src/lib.rs:262-277)."""
    planes_broadcast = A.simhash_planes(cfg.n_mels, cfg.simhash_bits, cfg.seed)
    n_mels, frame_len, hop_len = cfg.n_mels, cfg.frame_len, cfg.hop_len

    @F.pandas_udf(LongType())
    def _simhash(blobs: pd.Series, srs: pd.Series, codecs: pd.Series) -> pd.Series:
        out = []
        for blob, sr, codec in zip(blobs, srs, codecs):
            if blob is None or sr is None:
                out.append(None)
                continue
            try:
                samples = A.decode_clip(bytes(blob), codec)
                u = A.audio_simhash(samples, int(sr), planes_broadcast,
                                    n_mels, frame_len, hop_len)
                out.append(A.to_int64(u))
            except (NotImplementedError, ValueError):
                out.append(None)
        return pd.Series(out, dtype="object")

    return _simhash


def build_features(clips: DataFrame, cfg: DedupConfig,
                   with_audio: bool = True,
                   with_error_kind: bool = False) -> DataFrame:
    """Per-clip feature table. Drops `bytes` immediately after the
    SimHash UDF — downstream stages shuffle only hashes/strings.

    with_error_kind=True also evaluates the ingest validity flag in the
    SAME scan (payload bytes are read exactly once per pipeline run;
    a separate errors pass would re-read the whole corpus)."""
    from ..sources.clips import error_kind_expr

    norm = normalize_text(F.col("transcript"))
    cols = [
        "clip_id",
        rank_expr().alias("rank"),
        norm.alias("norm"),
        "bytes", "sr_hz", "codec", "dur_ms",
    ]
    if with_error_kind:
        cols.append(error_kind_expr().alias("error_kind"))
    df = clips.select(*cols)
    # two-step projection for the polynomial rolling base hash (round-5
    # family swap; ~11x over md5-per-shingle on the round-4 A/B): _codes
    # is multi-referenced by the fold (size guard + per-window slice),
    # and norm by _codes + the verify stage — CollapseProject keeps
    # non-cheap multi-referenced aliases split, so the regexp chain and
    # the char split each run once per row (same pattern as
    # driver_queries.q_doc_fingerprint). Hash-value distinctness (set
    # semantics, exact Jaccard sizes) is inside the fold expression,
    # matching the DuckDB twin by construction.
    df = df.withColumn("_codes", F.expr(poly_codes_sql("norm")))
    df = df.withColumn(
        "shingle_hashes",
        F.expr(poly_hashes_from_codes_sql("_codes", cfg.shingle_width)),
    )
    if with_audio:
        df = df.withColumn(
            "simhash", audio_simhash_udf(cfg)(F.col("bytes"), F.col("sr_hz"), F.col("codec"))
        )
    else:
        df = df.withColumn("simhash", F.lit(None).cast("long"))
    df = df.withColumn(
        "minhash_sig",
        F.when(
            F.size("shingle_hashes") > 0, minhash_signature("shingle_hashes", cfg)
        ),
    )
    return df.drop("bytes", "_codes")


ROLE_BOTH = "both"   # symmetric blocking key (minhash bands)
ROLE_QRY = "qry"     # query-side only (simhash probe flips, suffix rarest)
ROLE_IDX = "idx"     # index-side only (suffix postings)


def simhash_band_keys_sql(cfg: DedupConfig, simhash_expr: str = "simhash") -> str:
    """Spark SQL text: bit-slice the int64 SimHash into band values —
    SYMMETRIC (role=both) keys only, one per band.

    Plain banding (geohash-cell-blocking analog, dedupe.rs:11-16) only
    guarantees a shared key for Hamming < bands. Multi-probe (HmSearch
    style) extends that: every single-bit flip of a band value is a
    QUERY-side key (role=qry) that pairs only against index rows, so a
    pair within Hamming <= 2*bands - 1 is guaranteed (pigeonhole: some
    band differs by <= 1 bit, and the 1-flip probe hits the other
    side's original), while probe×probe collisions never block. 32-bit
    slices keep the per-random-pair blocking FP rate ~1.5e-8 (see
    config.simhash_bands).

    ROUND-6 LAYOUT: the flip rows are NO LONGER emitted here. The
    bucket key is the raw band value bit-packed with its band id
    (``(band << width) | value`` — injective, and joins always include
    ``detector`` so no cross-detector collision is possible), which
    makes every 1-bit flip derivable from the stored key by one XOR
    (``simhash_probe_flips_sql``). Candidate generation and the
    streaming probe derive the 32-per-band flip rows on the fly, so
    the signatures checkpoint stores 2 simhash rows per clip instead
    of 66 (at sf0.1 that was 1.66M of the stage's 2.18M rows) and the
    33 md5-of-string key hashes per (clip, band) become pure bit math.
    The post-verify edge set is IDENTICAL: any pair within total
    Hamming <= simhash_max_hamming = 2*bands - 1 still shares a
    derived-flip/original key by the same pigeonhole, and the
    flip×flip collisions the old layout also generated can only come
    from pairs with >= 2 differing bits in EVERY band (>= 2*bands
    total), which the Hamming verify always rejected."""
    width = cfg.simhash_bits // cfg.simhash_bands
    mask = (1 << width) - 1
    entries = []
    for b in range(cfg.simhash_bands):
        val = f"(shiftrightunsigned({simhash_expr}, {b * width}) & {mask})"
        key = f"(cast({b} as bigint) * {1 << width} + {val})"
        entries.append(
            f"named_struct('band', {b}, "
            f"'bucket_key', {key}, "
            f"'role', '{ROLE_BOTH}')"
        )
    return "array(" + ", ".join(entries) + ")"


def simhash_probe_flips(signatures: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Derive the 1-bit multi-probe QUERY rows from stored simhash
    signature rows (see simhash_band_keys_sql: key = band<<width | value,
    so flipping value bit i is ``bucket_key ^ (1 << i)``). Emitted only
    when cfg.simhash_probe_bits == 1; map-side, never checkpointed."""
    if cfg.simhash_probe_bits < 1:
        return signatures.filter(F.lit(False))
    width = cfg.simhash_bits // cfg.simhash_bands
    return (
        signatures.filter(F.col("detector") == DETECTOR_SIMHASH)
        .select(
            "clip_id", "detector", "band",
            F.explode(
                F.expr(
                    f"transform(sequence(0, {width - 1}), "
                    f"i -> bucket_key ^ shiftleft(1L, i))"
                )
            ).alias("bucket_key"),
            F.lit(ROLE_QRY).alias("role"),
        )
        .select("clip_id", "detector", "band", "bucket_key", "role")
    )


def suffix_signatures(features: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Substring-containment blocking via rarest-shingle prefix filter
    (the distributed-suffix-array graft).

    If norm(A) ⊂ norm(B), every shingle of A — in particular A's
    globally rarest one — appears in B. So:
      - index side (role=idx): every clip posts ALL its shingle hashes
        (the sorted-postings table a suffix array is);
      - query side (role=qry): every containable clip emits exactly ONE
        key — its shingle with the minimal (document_frequency, hash)
        pair, computed with a df pre-pass (AllPairs/PPJoin-style global
        frequency ordering).
    Bucket fan-out per query = df(rarest shingle), small by
    construction; common-shingle hot buckets never become query keys.
    An earlier bottom-k-sketch scheme collided every pair of documents
    sharing one globally-small-hash shingle (observed 892-member
    buckets and ~1.1M candidate pairs on a 2.6k corpus)."""
    sw = cfg.suffix_shingle_width
    # same two-step codes→fold projection as build_features (the wide
    # suffix shingles were the heaviest md5 consumer pre-swap)
    containable = (
        features.filter(
            F.length("norm") >= F.lit(max(cfg.min_containment_len, sw))
        )
        .select("clip_id", F.expr(poly_codes_sql("norm")).alias("_codes"))
        .select(
            "clip_id",
            F.expr(poly_hashes_from_codes_sql("_codes", sw)).alias("sx"),
        )
    )
    # no size(sx) > 0 filter: the length(norm) >= sw filter above
    # already guarantees a non-empty window set, and a predicate on the
    # computed array would be pushdown-inlined into the scan filter,
    # re-evaluating the fold per row (see poly_hashes_from_codes_sql)
    posts = containable.select("clip_id", F.explode("sx").alias("h"))
    # the postings plan is referenced three times (df pre-pass, rarest
    # join, index keys) — unmaterialized, the wide-shingle md5 chain
    # would be evaluated three times over the whole corpus (measured:
    # suffix chain was the slowest contract query at 33 s / sf0.1).
    # materialize() (not raw localCheckpoint) so the cut takes the
    # RELIABLE checkpoint path on a cluster — executor loss mid-stage
    # re-reads replicated blocks instead of recomputing the shingle
    # chain (VERDICT r3 #3; same strategy as components.py).
    posts = materialize(posts, eager=False)
    # document frequency via count() OVER (PARTITION BY h): ONE exchange
    # of the postings table (by h) instead of the groupBy+join form's
    # separate df aggregation plus join build — interleaved A/B at 26k
    # clips / 4M postings: 2.6-3.2 s vs 4.2-5.7 s warm, values
    # bit-identical. arg-min stays min(struct(df, h)): lexicographic
    # struct ordering == the (df, h) sort with map-side partial
    # aggregation — a row_number window per clip here forced a second
    # full sort of the postings where the agg ships one struct per
    # (partition, clip).
    rarest = (
        posts.withColumn("df", F.count("*").over(Window.partitionBy("h")))
        .groupBy("clip_id")
        .agg(F.min(F.struct("df", "h")).alias("m"))
        .select("clip_id", F.col("m.h").alias("h"))
    )

    def keyed(df: DataFrame, role: str) -> DataFrame:
        return df.select(
            "clip_id",
            F.lit(DETECTOR_SUFFIX).alias("detector"),
            F.lit(-1).alias("band"),
            md5_long(
                F.concat_ws("_", F.lit(DETECTOR_SUFFIX), F.col("h").cast("string"))
            ).alias("bucket_key"),
            F.lit(role).alias("role"),
        )

    if cfg.suffix_prune_postings:
        # drop postings in buckets no rarest key ever probes — the pair
        # equi-join discards them anyway, but map-side (broadcast semi
        # on the distinct rarest-hash set, bucket-granular so surviving
        # bucket sizes are unchanged) they never enter the signatures
        # checkpoint or any Exchange. Measured: 99.3% of postings rows
        # at 130k clips (see BENCH.md / config.suffix_prune_postings).
        probed = rarest.select("h").distinct()
        posts = posts.join(F.broadcast(probed), "h", "left_semi")

    return keyed(rarest, ROLE_QRY).unionByName(keyed(posts, ROLE_IDX))


def build_signatures(features: DataFrame, cfg: DedupConfig,
                     detectors: tuple[str, ...] = (
                         DETECTOR_MINHASH, DETECTOR_SIMHASH, DETECTOR_SUFFIX
                     )) -> DataFrame:
    """Explode per-clip blocking keys → (clip_id, detector, band,
    bucket_key, role). The H2 fan-out (deduplicator.rs:369); `role`
    drives asymmetric candidate pairing (see operators/candidates.py)."""
    known = {DETECTOR_MINHASH, DETECTOR_SIMHASH, DETECTOR_SUFFIX}
    unknown = set(detectors) - known
    if unknown or not detectors:
        raise ValueError(
            f"unknown detectors {sorted(unknown)}; valid: {sorted(known)}"
        )
    parts = []
    if DETECTOR_MINHASH in detectors:
        # length(norm) >= width ⇔ minhash_sig IS NOT NULL (build_features
        # gates the sig on a non-empty window set, and the window set is
        # non-empty exactly when len(norm) >= shingle_width). The cheap
        # predicate matters when `features` is a LIVE plan (streaming
        # ingest / probe): filter pushdown would inline the computed
        # sig expression — 64 perms over the bound fold — into the scan
        # predicate and evaluate it once for the filter and once for
        # the projection. On checkpointed features both forms are one
        # attribute read.
        mh = (
            features.filter(F.length("norm") >= cfg.shingle_width)
            .select(
                "clip_id",
                F.explode(band_keys("minhash_sig", cfg)).alias("e"),
            )
            .select(
                "clip_id",
                F.lit(DETECTOR_MINHASH).alias("detector"),
                F.col("e.band").alias("band"),
                F.col("e.bucket_key").alias("bucket_key"),
                F.lit(ROLE_BOTH).alias("role"),
            )
        )
        parts.append(mh)
    if DETECTOR_SIMHASH in detectors:
        sh = (
            features.filter(F.col("simhash").isNotNull())
            .select(
                "clip_id",
                F.explode(F.expr(simhash_band_keys_sql(cfg))).alias("e"),
            )
            .select(
                "clip_id",
                F.lit(DETECTOR_SIMHASH).alias("detector"),
                F.col("e.band").alias("band"),
                F.col("e.bucket_key").alias("bucket_key"),
                F.col("e.role").alias("role"),
            )
        )
        parts.append(sh)
    if DETECTOR_SUFFIX in detectors:
        parts.append(suffix_signatures(features, cfg))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
