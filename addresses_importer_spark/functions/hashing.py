"""Blocking-hash math: md5→int64 base hash, MinHash, LSH band keys.

Graft of the reference's ``hash_address`` (deduplicator/src/lib/dedupe.rs:61-86):
there, libpostal ``near_dupe_hashes`` turns one record into a *set* of
u64 blocking keys (re-hashed through DefaultHasher, dedupe.rs:81-85) such
that near-duplicate records share at least one key. Here the same
contract is met by MinHash-over-shingles + LSH banding, built entirely
from JVM expressions (md5/conv/transform/array_min) so the signature
stage is whole-stage-codegen'd — zero per-row Python.

All math is defined over md5 so the DuckDB oracle can replicate it
bit-for-bit (``('0x' || substr(md5(s),1,15))::BIGINT`` ==
``conv(substring(md5(s),1,15),16,10)``).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from ..config import DedupConfig


def md5_long(col: Column) -> Column:
    """First 60 bits of md5(col) as a non-negative int64."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def base_hashes(shingles_col: Column, cfg: DedupConfig) -> Column:
    """Map each shingle to md5_long % mod (31-bit base hash domain)."""
    mod = F.lit(cfg.minhash_mod)
    return F.transform(shingles_col, lambda s: md5_long(s) % mod)


def minhash_signature(hashes_col: Column, cfg: DedupConfig) -> Column:
    """array<long> of length num_perm: min over (a*x + b) % mod.

    ``hashes_col`` is the distinct base-hash set of one record; empty
    input yields NULL-free empty handling upstream (records with no
    shingles are filtered before this, mirroring deduplicator.rs:371-374).
    """
    mod = F.lit(cfg.minhash_mod)
    sig = [
        F.array_min(
            F.transform(hashes_col, lambda x: (F.lit(a) * x + F.lit(b)) % mod)
        )
        for (a, b) in cfg.minhash_perms()
    ]
    return F.array(*sig)


def band_keys(sig_col: Column, cfg: DedupConfig, detector: str = "minhash") -> Column:
    """array<struct<band:int, bucket_key:long>> — one entry per LSH band.

    bucket_key = md5_long("detector:band:v1_v2_..._vr") so keys are
    uniform int64 and never collide across detectors/bands. The 1→k
    fan-out mirrors the reference's hash fan-out into
    ``_addresses_hashes`` (deduplicator.rs:369, db_hashes.rs:61-65).
    """
    entries = []
    for b in range(cfg.bands):
        vals = [
            sig_col[i].cast("string") for i in range(b * cfg.rows, (b + 1) * cfg.rows)
        ]
        key_str = F.concat_ws("_", F.lit(f"{detector}:{b}"), *vals)
        entries.append(
            F.struct(
                F.lit(b).alias("band"), md5_long(key_str).alias("bucket_key")
            )
        )
    return F.array(*entries)


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
