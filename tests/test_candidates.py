"""Candidate pair generation: bucket pairing, determinism, skew cap
(the reference's collision query + pack guard, db_hashes.rs:484-513,
deduplicator.rs:120-155)."""

import pytest
from pyspark.sql import functions as F

from addresses_importer_spark.config import DedupConfig
from addresses_importer_spark.operators.candidates import (
    bucket_groups, build_candidates,
)


def _sigs(spark, rows):
    """rows: (clip_id, detector, band, bucket_key[, role]) — role
    defaults to 'both' (symmetric pairing)."""
    rows = [tuple(r) + ("both",) if len(r) == 4 else tuple(r) for r in rows]
    return spark.createDataFrame(
        rows,
        "clip_id string, detector string, band int, bucket_key long, role string",
    )


def test_pairs_within_bucket(spark):
    sigs = _sigs(spark, [
        ("a", "minhash", 0, 1), ("b", "minhash", 0, 1), ("c", "minhash", 0, 1),
        ("d", "minhash", 0, 2),
    ])
    got = {(r["src"], r["dst"]) for r in
           build_candidates(sigs, DedupConfig()).collect()}
    assert got == {("a", "b"), ("a", "c"), ("b", "c")}


def test_pair_orientation_sorted(spark):
    sigs = _sigs(spark, [("z", "minhash", 0, 1), ("a", "minhash", 0, 1)])
    rows = build_candidates(sigs, DedupConfig()).collect()
    assert [(r["src"], r["dst"]) for r in rows] == [("a", "z")]


def test_cross_bucket_dedup(spark):
    """Same pair colliding in several buckets appears once per detector
    (A6 distinct-deletion-set analog, deduplicator.rs:216-222)."""
    sigs = _sigs(spark, [
        ("a", "minhash", 0, 1), ("b", "minhash", 0, 1),
        ("a", "minhash", 1, 9), ("b", "minhash", 1, 9),
    ])
    rows = build_candidates(sigs, DedupConfig()).collect()
    assert len(rows) == 1


def test_bucket_cap_drops_oversize(spark):
    """Buckets above the cap contribute no pairs (reference drops packs
    > 5000, deduplicator.rs:120-135; fixture cap=5)."""
    cfg = DedupConfig(bucket_cap=5)
    hot = [(f"h{i}", "minhash", 0, 77) for i in range(6)]
    cold = [("x", "minhash", 0, 88), ("y", "minhash", 0, 88)]
    sigs = _sigs(spark, hot + cold)
    got = {(r["src"], r["dst"]) for r in build_candidates(sigs, cfg).collect()}
    assert got == {("x", "y")}
    over = (
        bucket_groups(sigs).filter(F.col("n") > cfg.bucket_cap).collect()
    )
    assert len(over) == 1 and over[0]["n"] == 6


def test_duplicate_signature_rows_collapse(spark):
    """(clip, key) emitted twice (multi-probe overlap) still yields a
    single membership — collect_set semantics."""
    sigs = _sigs(spark, [
        ("a", "simhash", 0, 5), ("a", "simhash", 0, 5), ("b", "simhash", 0, 5),
    ])
    rows = build_candidates(sigs, DedupConfig()).collect()
    assert [(r["src"], r["dst"]) for r in rows] == [("a", "b")]


def test_large_bucket_selfjoin_path(spark):
    """Buckets above PAIR_EXPAND_MAX go through the self-join path and
    still produce the exact pair set."""
    from addresses_importer_spark.operators.candidates import PAIR_EXPAND_MAX

    n = PAIR_EXPAND_MAX + 3
    sigs = _sigs(spark, [(f"m{i:03d}", "minhash", 0, 42) for i in range(n)])
    rows = build_candidates(sigs, DedupConfig()).collect()
    assert len(rows) == n * (n - 1) // 2
    assert all(r["src"] < r["dst"] for r in rows)


def test_asymmetric_qry_idx_pairing(spark):
    """qry rows pair with idx/both rows; qry×qry and idx×idx never pair."""
    sigs = _sigs(spark, [
        ("a", "suffix", -1, 7, "qry"), ("b", "suffix", -1, 7, "qry"),
        ("c", "suffix", -1, 7, "idx"), ("d", "suffix", -1, 7, "idx"),
    ])
    got = {(r["src"], r["dst"]) for r in build_candidates(sigs, DedupConfig()).collect()}
    assert got == {("a", "c"), ("a", "d"), ("b", "c"), ("b", "d")}


def test_asymmetric_self_pair_excluded(spark):
    """A clip that is both query and posting never pairs with itself."""
    sigs = _sigs(spark, [
        ("a", "suffix", -1, 7, "qry"), ("a", "suffix", -1, 7, "idx"),
        ("b", "suffix", -1, 7, "idx"),
    ])
    got = {(r["src"], r["dst"]) for r in build_candidates(sigs, DedupConfig()).collect()}
    assert got == {("a", "b")}


def test_asymmetric_index_cap(spark):
    """Buckets whose index side exceeds the cap are dropped (and show
    up in oversize stats)."""
    from addresses_importer_spark.operators.candidates import oversize_bucket_stats

    cfg = DedupConfig(bucket_cap=3)
    sigs = _sigs(spark, [("q", "suffix", -1, 7, "qry")] + [
        (f"i{k}", "suffix", -1, 7, "idx") for k in range(4)
    ])
    assert build_candidates(sigs, cfg).count() == 0
    stats = oversize_bucket_stats(sigs, cfg)
    assert stats and stats[0]["detector"] == "suffix" and stats[0]["rows"] == 4
