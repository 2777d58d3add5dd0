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


def _py_salt(clip_id: str, s: int) -> int:
    """Python twin of candidates._salt_expr: pmod(md5_long(id), S)."""
    import hashlib

    return int(hashlib.md5(clip_id.encode()).hexdigest()[:15], 16) % s


def test_bucket_cap_salts_oversize(spark):
    """Buckets above the cap are salted into sub-buckets, not dropped
    (round 1 dropped them; the reference deletes every member,
    deduplicator.rs:120-135). Expected pair set = pairs within each
    md5-salt sub-bucket, computed independently here."""
    import itertools

    cfg = DedupConfig(bucket_cap=5)
    hot_ids = [f"h{i}" for i in range(6)]
    hot = [(i, "minhash", 0, 77) for i in hot_ids]
    cold = [("x", "minhash", 0, 88), ("y", "minhash", 0, 88)]
    sigs = _sigs(spark, hot + cold)
    got = {(r["src"], r["dst"]) for r in build_candidates(sigs, cfg).collect()}

    s = -(-len(hot_ids) // cfg.bucket_cap)  # ceil(6/5) = 2
    expected = {("x", "y")} | {
        tuple(sorted(p))
        for p in itertools.combinations(hot_ids, 2)
        if _py_salt(p[0], s) == _py_salt(p[1], s)
    }
    assert got == expected
    assert len(got) > 1, "hot bucket contributed nothing — salting broken"
    over = (
        bucket_groups(sigs).filter(F.col("n") > cfg.bucket_cap).collect()
    )
    assert len(over) == 1 and over[0]["n"] == 6


def test_hot_bucket_candidate_volume_linear(spark):
    """The 10k-clips-one-shingle nightmare: a single bucket of n=3000
    with cap=200 must yield ~n²/(2S) = ~n*cap/2 pairs (linear in n),
    never C(n,2) = 4.5M (quadratic), and recall inside the bucket must
    be non-zero."""
    cfg = DedupConfig(bucket_cap=200)
    n = 3000
    sigs = _sigs(spark, [(f"c{i:05d}", "minhash", 0, 7) for i in range(n)])
    pairs = build_candidates(sigs, cfg).count()
    assert pairs > 0
    # bound: S=15 sub-buckets of ~200 → ~298k pairs; allow wide slack
    # for salt imbalance but stay an order of magnitude under C(n,2)
    assert pairs <= n * cfg.bucket_cap, pairs
    assert pairs >= n * cfg.bucket_cap // 4, pairs


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


def test_asymmetric_index_cap_salts(spark):
    """A hot index bucket is salted on both sides: the qry key pairs
    only with postings sharing its md5-salt sub-bucket (bounded
    fan-out, non-zero recall), and still shows up in oversize stats."""
    from addresses_importer_spark.operators.candidates import oversize_bucket_stats

    cfg = DedupConfig(bucket_cap=3)
    idx_ids = [f"i{k}" for k in range(4)]
    sigs = _sigs(spark, [("q", "suffix", -1, 7, "qry")] + [
        (i, "suffix", -1, 7, "idx") for i in idx_ids
    ])
    got = {(r["src"], r["dst"]) for r in build_candidates(sigs, cfg).collect()}
    s = -(-4 // cfg.bucket_cap)  # ceil(4/3) = 2
    q_salt = _py_salt("q", s)
    expected = {
        tuple(sorted(("q", i))) for i in idx_ids if _py_salt(i, s) == q_salt
    }
    assert got == expected and got, got
    stats = oversize_bucket_stats(sigs, cfg)
    assert stats and stats[0]["detector"] == "suffix" and stats[0]["rows"] == 4


def test_gate_corpus_has_no_oversize_buckets():
    """Oracle-validity guard: the DuckDB dedup-chain CTEs model the cap
    WITHOUT salting, which is only equivalent while the sf0.01 gate
    corpus has no bucket over the cap. If testdata or config ever
    changes that, this fails before the driver's hash check does."""
    import duckdb

    from addresses_importer_spark.plans.driver_queries import (
        CFG as QCFG, _CTE_CORPUS, _CTE_FEATS, _CTE_SIGS_MINHASH,
    )
    from addresses_importer_spark.functions import oracle_fragments as O
    from addresses_importer_spark.functions.hashing import POLY_BASE, POLY_MOD

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "'/root/testdata/sf0.01/documents.parquet'"
    )
    max_mh = con.execute(
        f"WITH {_CTE_CORPUS}, {_CTE_FEATS}, {_CTE_SIGS_MINHASH} "
        "SELECT max(n) FROM (SELECT count(DISTINCT clip_id) AS n "
        "FROM sigs GROUP BY bucket_key)"
    ).fetchone()[0]
    sw = QCFG.suffix_shingle_width
    max_df = con.execute(
        f"WITH {_CTE_CORPUS}, normed AS ("
        f"SELECT clip_id, {O.sql_normalize('transcript')} AS norm FROM corpus), "
        f"coded AS (SELECT clip_id, norm, {O.sql_poly_codes('norm')} AS codes "
        f"FROM normed) "
        f"SELECT max(df) FROM (SELECT count(*) AS df FROM ("
        f"SELECT clip_id, unnest("
        f"{O.sql_poly_hashes_from_codes('codes', sw, POLY_BASE, POLY_MOD)}) AS h "
        f"FROM coded WHERE length(norm) >= {max(QCFG.min_containment_len, sw)}"
        f") GROUP BY h)"
    ).fetchone()[0]
    assert max_mh < QCFG.bucket_cap, max_mh
    assert max_df < QCFG.bucket_cap, max_df
