"""Spark ↔ DuckDB parity of the blocking math + LSH properties.

This is the doctest-style contract layer of the reference
(dedupe.rs:36-59: hash_address collision property; utils.rs:20-26:
partition exactness) transposed: identical strings must produce
identical base hashes, MinHash signatures, and band keys in both
engines, and near-identical shingle sets must collide in >= 1 band.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from addresses_importer_spark.config import DedupConfig
from addresses_importer_spark.functions import oracle_fragments as O
from addresses_importer_spark.functions.hashing import (
    POLY_BASE, POLY_MOD, band_keys, jaccard, md5_long, minhash_signature,
    poly_codes_sql, poly_hashes_from_codes_sql,
)
from addresses_importer_spark.functions.text import normalize_text

CFG = DedupConfig(num_perm=16, bands=4, rows=4)  # small for test speed

TEXTS = [
    "The quick brown fox jumps over the lazy dog",
    "the QUICK brown fox jumped over a lazy dog!!",
    "Avenue de l'Europe, 26 — Montpellier",
    "short",
    "",
    "aaaaaaaaaaaaaaaaaaaaaaaa",
]


def spark_rows(spark, texts, cfg):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i int, t string")
    norm = normalize_text(F.col("t"))
    out = (
        df.select("i", norm.alias("norm"))
        .select("i", "norm", F.expr(poly_codes_sql("norm")).alias("codes"))
        .select(
            "i", "norm",
            F.expr(
                poly_hashes_from_codes_sql("codes", cfg.shingle_width)
            ).alias("h"),
        )
    )
    out = out.select(
        "i", "norm",
        F.array_sort("h").alias("hashes"),
        F.when(F.size("h") > 0, minhash_signature("h", cfg)).alias("sig"),
    )
    out = out.withColumn(
        "bands",
        F.when(
            F.col("sig").isNotNull(),
            F.transform(band_keys("sig", cfg), lambda e: e["bucket_key"]),
        ),
    )
    return {r["i"]: r for r in out.collect()}


def duck_rows(texts, cfg):
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM (VALUES " +
                ", ".join(f"({i}, ?)" for i in range(len(texts))) + ") v(i, t)",
                list(texts))
    norm = O.sql_normalize("t")
    codes = O.sql_poly_codes("norm")
    hashes = O.sql_poly_hashes_from_codes(
        "codes", cfg.shingle_width, POLY_BASE, POLY_MOD
    )
    sig = O.sql_minhash_signature("hashes", cfg)
    bands = O.sql_band_keys("sig", cfg)
    q = f"""
    WITH a AS (SELECT i, {norm} AS norm FROM t),
         b AS (SELECT i, norm, {codes} AS codes FROM a),
         c AS (SELECT i, norm, list_sort({hashes}) AS hashes FROM b),
         d AS (SELECT i, norm, hashes,
                      CASE WHEN len(hashes) > 0 THEN {sig} END AS sig FROM c)
    SELECT i, norm, hashes,
           sig,
           CASE WHEN sig IS NOT NULL
                THEN list_transform({bands}, e -> e.bucket_key) END AS bands
    FROM d ORDER BY i
    """
    rows = con.execute(q).fetchall()
    return {r[0]: {"norm": r[1], "hashes": r[2], "sig": r[3], "bands": r[4]}
            for r in rows}


def test_spark_duckdb_parity(spark):
    s = spark_rows(spark, TEXTS, CFG)
    d = duck_rows(TEXTS, CFG)
    for i in range(len(TEXTS)):
        assert s[i]["norm"] == d[i]["norm"], f"norm mismatch row {i}"
        assert list(s[i]["hashes"]) == list(d[i]["hashes"]), f"hashes row {i}"
        ssig = None if s[i]["sig"] is None else list(s[i]["sig"])
        dsig = None if d[i]["sig"] is None else list(d[i]["sig"])
        assert ssig == dsig, f"sig mismatch row {i}"
        sb = None if s[i]["bands"] is None else list(s[i]["bands"])
        db = None if d[i]["bands"] is None else list(d[i]["bands"])
        assert sb == db, f"band keys mismatch row {i}"


def test_md5_long_known_value(spark):
    # DuckDB: ('0x'||substr(md5('hello'),1,15))::BIGINT = 419982666956583591
    row = spark.range(1).select(md5_long(F.lit("hello")).alias("h")).collect()[0]
    assert row["h"] == 419982666956583591


def test_identical_text_identical_buckets(spark):
    s = spark_rows(spark, ["hello world this is a test sentence"] * 2, CFG)
    assert list(s[0]["bands"]) == list(s[1]["bands"])


def test_banding_collision_property(spark):
    """Near-identical shingle sets share >= 1 band; disjoint ones share
    none (the dedupe.rs:36-59 doctest property)."""
    a = "the quick brown fox jumps over the lazy dog again and again"
    b = a + " x"          # tiny perturbation -> high jaccard
    c = "completely different words about silver clouds and thunder"
    s = spark_rows(spark, [a, b, c], CFG)
    assert set(s[0]["bands"]) & set(s[1]["bands"]), "near-dup must collide"
    assert not set(s[0]["bands"]) & set(s[2]["bands"]), "unrelated must not"


def test_jaccard_expr(spark):
    df = spark.createDataFrame([([1, 2, 3], [2, 3, 4])], "a array<long>, b array<long>")
    v = df.select(jaccard(F.col("a"), F.col("b")).alias("j")).collect()[0]["j"]
    assert v == pytest.approx(2 / 4)


def test_empty_text_yields_no_signature(spark):
    s = spark_rows(spark, ["", "ab"], CFG)  # both shorter than shingle width
    assert s[0]["sig"] is None and s[1]["sig"] is None


def test_poly_hash_parity_spark_duckdb_python(spark):
    """The round-4 polynomial base-hash family (VERDICT r3 task #3):
    Spark fold, DuckDB fold, and a plain-Python reference must agree as
    SETS on every fixture text (DuckDB's list_distinct does not
    preserve order; all consumers are order-insensitive)."""
    from addresses_importer_spark.functions.hashing import (
        POLY_BASE, POLY_MOD, poly_codes_sql, poly_hashes_from_codes_sql,
    )

    w = CFG.shingle_width

    def py_norm(t):
        import re
        return re.sub(r"[^a-z0-9]+", " ", t.lower()).strip()

    def py_poly(s):
        out = set()
        for i in range(len(s) - w + 1):
            h = 0
            for c in s[i:i + w]:
                h = (h * POLY_BASE + ord(c)) % POLY_MOD
            out.add(h)
        return out

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "i int, t string"
    )
    got_spark = {
        r["i"]: set(r["h"])
        for r in df.select(
            "i", normalize_text(F.col("t")).alias("norm")
        ).select(
            "i", F.expr(poly_codes_sql("norm")).alias("codes")
        ).select(
            "i", F.expr(poly_hashes_from_codes_sql("codes", w)).alias("h")
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM (VALUES " +
                ", ".join(f"({i}, ?)" for i in range(len(TEXTS))) +
                ") v(i, txt)", TEXTS)
    sql = (
        f"SELECT i, {O.sql_poly_hashes_from_codes('codes', w, POLY_BASE, POLY_MOD)} AS h "
        f"FROM (SELECT i, {O.sql_poly_codes('norm')} AS codes "
        f"FROM (SELECT i, {O.sql_normalize('txt')} AS norm FROM t))"
    )
    got_duck = {i: set(h) for i, h in con.execute(sql).fetchall()}
    for i, t in enumerate(TEXTS):
        exp = py_poly(py_norm(t))
        assert got_spark[i] == exp, (t, sorted(got_spark[i])[:3], sorted(exp)[:3])
        assert got_duck[i] == exp, t
        assert len(got_spark[i]) == len(got_duck[i])
