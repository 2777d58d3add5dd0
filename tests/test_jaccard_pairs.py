"""First-class n-gram Jaccard near-dup queries over `documents`.

The exact-verification counterpart of the pipeline's MinHash estimate
(dedupe.rs:59-76 computes the same shingle-set Jaccard per candidate
pair): df-bounded inverted-index blocking (PPJoin-family prefix filter)
+ exact intersection/union verify, and the corpus-level dedup-rate
threshold curve built from the same pair frame.
"""

import duckdb
import pytest

from addresses_importer_spark.plans.driver_queries import (
    COPY_OFFSET, DEDUP_RATE_TAUS, ORACLES, QUERIES,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def pairs_pdf(spark):
    return QUERIES["ngram_jaccard_pairs"](spark, SF_DIR).toPandas()


@pytest.fixture(scope="module")
def curve_pdf(spark):
    return QUERIES["dedup_rate_curve"](spark, SF_DIR).toPandas()


def _duck(sql):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    return con.execute(sql).fetchdf()


def _key(pdf):
    cols = sorted(pdf.columns)
    return sorted(tuple(str(v) for v in row)
                  for row in pdf[cols].itertuples(index=False, name=None))


def test_planted_prefix_copies_are_found(pairs_pdf):
    """Every 80%-prefix copy planted by the derived corpus must pair
    with its base doc at Jaccard >= 0.6 (an 80% prefix shares ~80% of
    the shingle set -> J ~ 0.8/1.2 ~ 0.67 floor)."""
    found = {(r.a_id, r.b_id) for r in pairs_pdf.itertuples()}
    base_ids = {int(a) for a, _ in found} | {int(b) for _, b in found}
    planted = [i for i in base_ids if i < COPY_OFFSET and i % 5 == 0]
    assert planted, "fixture lost its planted near-dup copies"
    for i in planted:
        assert (f"{i:09d}", f"{i + COPY_OFFSET:09d}") in found


def test_pair_evidence_is_consistent(pairs_pdf):
    assert (pairs_pdf.n_inter <= pairs_pdf.n_union).all()
    assert (pairs_pdf.n_inter * 100 >= 60 * pairs_pdf.n_union).all()
    assert (pairs_pdf.a_id < pairs_pdf.b_id).all()
    assert not pairs_pdf.duplicated(["a_id", "b_id"]).any()


def test_curve_is_monotone_and_anchored(curve_pdf, pairs_pdf):
    """n_pairs must be non-increasing in tau, and the tau=60 point must
    equal the ngram_jaccard_pairs row count (same pair frame)."""
    curve = dict(zip(curve_pdf.tau, curve_pdf.n_pairs))
    assert sorted(curve) == sorted(DEDUP_RATE_TAUS)
    vals = [curve[t] for t in sorted(curve)]
    assert vals == sorted(vals, reverse=True)
    assert curve[60] == len(pairs_pdf)


def test_duckdb_parity(pairs_pdf, curve_pdf):
    """Value-level parity with the oracle SQL at sf0.001 (the driver
    re-checks this at sf0.01)."""
    assert _key(pairs_pdf) == _key(_duck(ORACLES["ngram_jaccard_pairs"]))
    assert _key(curve_pdf) == _key(_duck(ORACLES["dedup_rate_curve"]))


def test_zipfian_stop_token_keeps_candidate_volume_linear(spark):
    """Adversarial golden (VERDICT r4 #4): every document shares one
    Zipfian stop token. A naive inverted-index join explodes that
    bucket into C(n,2) candidate pairs; the AllPairs/PPJoin prefix
    filter must exclude the max-df token from every prefix, so the
    ONLY candidates are the planted copy pairs — candidate volume is
    exactly linear in the planted dups, not quadratic in n."""
    from addresses_importer_spark.plans.driver_queries import (
        prefix_filter_candidates,
    )

    n, planted = 400, 10
    rows = []
    stop = 0  # token hash present in EVERY doc -> df = n (maximal)
    for i in range(n):
        toks = [stop] + [i * 1000 + k for k in range(1, 20)]  # 19 unique
        rows.append((f"d{i:04d}", toks))
    for p in range(planted):  # copy shares 15 of 20 tokens with its base
        base = rows[p][1]
        rows.append((f"c{p:04d}", base[:15] + [9_000_000 + p * 10 + k
                                               for k in range(5)]))
    hashed = spark.createDataFrame(rows, "clip_id string, hashes array<bigint>")
    cand = prefix_filter_candidates(hashed, tau_pct=50).collect()
    got = {(r.a_id, r.b_id) for r in cand}
    expected = {(f"c{p:04d}", f"d{p:04d}") for p in range(planted)}
    # recall: every planted copy pair is a candidate (prefix filter has
    # provable recall 1.0 at tau); volume: NOTHING else became one —
    # the stop token generated zero of the C(410,2) ~ 84k naive pairs
    assert {tuple(sorted(p)) for p in got} == {tuple(sorted(p))
                                               for p in expected}


def test_positional_filter_prunes_cannot_reach_tau(spark):
    """PPJoin positional filter (round 5): two docs can share a prefix
    token yet be provably unable to reach tau — the bound
    k + min(na-ia, nb-jb) must prune them BEFORE the verification join,
    while a borderline pair exactly AT tau must survive (the filter is
    lossless at tau by construction)."""
    from addresses_importer_spark.plans.driver_queries import (
        prefix_filter_candidates,
    )

    rows = [
        # positional-only prune: x and y share exactly ONE token (9500),
        # sorted to the LAST slot of both 4-token prefixes (n=6, prefix
        # = 6 - 3 + 1 = 4; the fillers below give every other token
        # df=2 so (df, h) ordering is decided by h and 9500 lands at
        # rn=4). k=1, ia=jb=4 -> ub = 1 + min(2, 2) = 3, and
        # 3*(100+50) = 450 < 50*(6+6) = 600: cannot reach tau, pruned.
        # The length filter alone passes it (6/6 >= 0.5), so only the
        # positional bound can remove it.
        ("x", [210, 211, 212, 9500, 9601, 9602]),
        ("y", [220, 221, 222, 9500, 9603, 9604]),
        ("f1", [210, 211, 212, 9601, 9602, 310]),
        ("f2", [220, 221, 222, 9603, 9604, 311]),
        # borderline: J = 10/(15+15-10) = 0.5 exactly — k=3 prefix
        # matches at ia=jb=8, ub = 3 + min(7, 7) = 10, and
        # 10*150 = 1500 >= 50*30 = 1500: must survive (lossless at tau)
        ("p", [10 + k for k in range(10)] + [8000 + k for k in range(5)]),
        ("q", [10 + k for k in range(10)] + [8100 + k for k in range(5)]),
    ]
    hashed = spark.createDataFrame(rows, "clip_id string, hashes array<bigint>")
    got = {tuple(sorted((r.a_id, r.b_id)))
           for r in prefix_filter_candidates(hashed, tau_pct=50).collect()}
    assert ("p", "q") in got
    assert ("x", "y") not in got
