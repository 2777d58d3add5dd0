"""Blocking-hash math: shingle→int64 base hashes, MinHash, LSH band keys.

Graft of the reference's ``hash_address`` (deduplicator/src/lib/dedupe.rs:61-86):
there, libpostal ``near_dupe_hashes`` turns one record into a *set* of
u64 blocking keys (re-hashed through DefaultHasher, dedupe.rs:81-85) such
that near-duplicate records share at least one key. Here the same
contract is met by MinHash-over-shingles + LSH banding, built entirely
from JVM expressions (transform/aggregate/array_min) so the signature
stage is whole-stage-codegen'd — zero per-row Python.

Two hash families, both with bit-exact DuckDB oracle twins:

- shingle→int64 BASE hashes (the per-character-window hot path, O(len)
  per row) use the polynomial rolling fold ``poly_hashes_from_codes_sql``
  — pure integer multiply-mods in whole-stage codegen. The md5-per-
  shingle family it replaced materialized + parsed a hex string per
  shingle and measured ~11x slower (BENCH.md round-4 A/B); the swap is
  round 5, tagged into DedupConfig.config_hash so old checkpoints
  invalidate.
- bucket-key / content hashes (one per record-band, not per character)
  stay md5: ``('0x' || substr(md5(s),1,15))::BIGINT`` ==
  ``conv(substring(md5(s),1,15),16,10)``.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from ..config import DedupConfig


def md5_long(col: Column) -> Column:
    """First 60 bits of md5(col) as a non-negative int64."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


#: polynomial rolling-hash parameters (poly_hashes / sql twin). Base 131
#: over the Mersenne prime 2^31-1: acc*131 + code <= (2^31)*131 + 1114111
#: < 2^39, no overflow under ANSI arithmetic in either engine. POLY_MOD
#: == config.MINHASH_MOD, so poly base hashes land in the same 31-bit
#: domain the MinHash permutations (a*x+b) % MINHASH_MOD expect.
POLY_BASE = 131
POLY_MOD = 2_147_483_647


def poly_codes_sql(norm_expr: str) -> str:
    """Spark SQL: per-char code-point array of a normalized string.
    Project it into its own column before multi-referencing it (keeps
    the split to one evaluation per row under CollapseProject)."""
    return f"transform(split({norm_expr}, ''), c -> ascii(c))"


def poly_hashes_from_codes_sql(codes_expr: str, width: int) -> str:
    """Spark SQL: distinct polynomial rolling hashes of every
    ``width``-code window of a char-code array — the cheap base-hash
    family (VERDICT r3 task #3; whole-pipeline swap round 5).

    md5-per-shingle materializes a hex string and parses it back per
    shingle (O(len) md5 blocks + allocs per row); this computes the
    same shingle->int64 contract as pure integer folds (O(len*width)
    multiply-mods, zero string allocation). Distinctness is applied to
    the HASH values (not shingle strings) so the DuckDB twin
    (oracle_fragments.sql_poly_hashes_from_codes) is value-identical by
    construction. Input must derive from normalize_text output
    ([a-z0-9 ] only, so ascii()/ord() char codes agree across engines).

    SELF-BINDING against expression inlining: ``codes_expr`` is bound
    ONCE to the lambda variable ``cs`` via a 1-element transform, and
    every window reads ``cs``. Without the binding, this expression is
    only linear while ``codes_expr`` stays a projected attribute —
    Catalyst's filter pushdown substitutes projected aliases into
    predicates REGARDLESS of cost, and a predicate like
    ``size(hashes) > 0`` then re-evaluates the char split once per
    window position: O(len^2) per row, observed as a multi-minute
    straggler task on a 100k-char transcript (jstack: StringSplit
    inside ArrayTransform inside a GeneratedClass SpecificPredicate).
    With the binding, any inlining costs at most one extra LINEAR
    evaluation of the whole fold.

    UNROLLED window (round 6): higher-order functions (transform /
    aggregate) are evaluated INTERPRETED — they never enter whole-stage
    codegen — so the per-window ``aggregate(slice(cs, i, w), ...)``
    paid a slice allocation plus w boxed lambda steps per window. The
    window hash is instead emitted as one unrolled multiply-add
    expression over 0-based subscripts (``cs[i]`` .. ``cs[i+w-1]``)
    with the SAME mod applied at every step, so the value sequence is
    bit-identical (acc < 2^31, acc*131 + code < 2^39 — no overflow).
    Measured 4x on the sf0.1 feature corpus (1.49 s -> 0.36 s at w=8,
    1.33 s -> 0.41 s at w=16, 26k rows / 32 cores, zero mismatches vs
    the fold form).
    """
    window = "cast(0 as bigint)"
    for k in range(width):
        window = f"(({window} * {POLY_BASE} + cs[i + {k}]) % {POLY_MOD})"
    return (
        f"transform(array({codes_expr}), cs -> "
        f"CASE WHEN size(cs) >= {width} THEN "
        f"array_distinct(transform("
        f"sequence(0, size(cs) - {width}), i -> {window})) "
        f"ELSE array() END)[0]"
    )


def spark_sql_md5_long(expr: str) -> str:
    """Spark-SQL-dialect twin of md5_long (for F.expr plan building)."""
    return f"cast(conv(substring(md5({expr}), 1, 15), 16, 10) as bigint)"


def minhash_signature_sql(hashes_expr: str, cfg: DedupConfig) -> str:
    """Spark SQL text for the 64-perm MinHash signature.

    Built as ONE SQL string parsed JVM-side instead of thousands of
    py4j Column calls: constructing the same tree through the Python
    Column API measured ~12 s of driver time per plan (64 perms x
    transform/lit round-trips), which dominated the pipeline's serial
    fraction. Semantics are identical (oracle parity pins them)."""
    mod = cfg.minhash_mod
    mins = ", ".join(
        f"array_min(transform({hashes_expr}, x -> ({a} * x + {b}) % {mod}))"
        for (a, b) in cfg.minhash_perms()
    )
    return f"array({mins})"


def minhash_signature(hashes_col: Column | str, cfg: DedupConfig) -> Column:
    """array<long> of length num_perm: min over (a*x + b) % mod.

    ``hashes_col`` is a column NAME (or SQL fragment) for the distinct
    base-hash set of one record; records with no shingles are filtered
    upstream (mirroring deduplicator.rs:371-374)."""
    if not isinstance(hashes_col, str):
        raise TypeError("pass a column name / SQL fragment (F.expr plan path)")
    return F.expr(minhash_signature_sql(hashes_col, cfg))


def band_keys_sql(sig_expr: str, cfg: DedupConfig, detector: str = "minhash") -> str:
    """Spark SQL text: array<struct<band:int, bucket_key:long>> — one
    entry per LSH band. bucket_key = md5_long("detector:band_v1_..._vr")
    so keys are uniform int64 and never collide across detectors/bands.
    The 1→k fan-out mirrors the reference's hash fan-out into
    ``_addresses_hashes`` (deduplicator.rs:369, db_hashes.rs:61-65)."""
    entries = []
    for b in range(cfg.bands):
        vals = ", ".join(
            f"cast({sig_expr}[{i}] as string)"
            for i in range(b * cfg.rows, (b + 1) * cfg.rows)
        )
        key_str = f"concat_ws('_', '{detector}:{b}', {vals})"
        entries.append(
            f"named_struct('band', {b}, 'bucket_key', {spark_sql_md5_long(key_str)})"
        )
    return "array(" + ", ".join(entries) + ")"


def band_keys(sig_col: Column | str, cfg: DedupConfig,
              detector: str = "minhash") -> Column:
    if not isinstance(sig_col, str):
        raise TypeError("pass a column name / SQL fragment (F.expr plan path)")
    return F.expr(band_keys_sql(sig_col, cfg, detector))


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard of two distinct-element arrays (verify stage; the
    graft analog of is_duplicate's street/number comparators,
    dedupe.rs:177-195)."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = (F.size(a) + F.size(b)).cast("double") - inter
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def containment(small: Column, big: Column) -> Column:
    """|small ∩ big| / |small| — substring-containment proxy score."""
    inter = F.size(F.array_intersect(small, big)).cast("double")
    return F.when(F.size(small) > 0, inter / F.size(small)).otherwise(F.lit(0.0))


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit SimHashes stored as int64.

    Graft analog of the haversine distance tiers (dedupe.rs:133-135,
    177-195): closer in Hamming space == closer acoustically.
    """
    return F.bit_count(a.bitwiseXOR(b))
