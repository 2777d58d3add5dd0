"""Hostile / degenerate corpora through the FULL pipeline (VERDICT r3
task #7): the divide/overflow guards (similarity.py cosine zero-norm,
components.py id handling, geo.py degenerate rings) are individually
reasoned — this exercises them JOINTLY end-to-end under ANSI mode.

Cases:
- empty transcripts + single-char texts (below every shingle width);
- a 100k-char transcript (wide shingle chains, one containable giant);
- all-identical corpus → one giant component, one survivor;
- corpus where every row is filtered → zero survivors, all errors.

Assertions: no ANSI failure (the run itself), survivor/error counts
are sane, and survivors + errors partition the input ids.
"""

import pytest
from pyspark.sql import functions as F

from addresses_importer_spark import DedupConfig, run_pipeline

CFG = DedupConfig()


def _clips(spark, rows):
    return spark.createDataFrame(
        rows,
        "clip_id string, bytes binary, sr_hz int, dur_ms int, "
        "codec string, transcript string",
    )


def _run(spark, tmp_path, rows, name):
    clips = _clips(spark, rows)
    res = run_pipeline(spark, clips, CFG, str(tmp_path / name),
                       with_audio=False)
    surv = {r["clip_id"] for r in res.survivors.select("clip_id").collect()}
    errs = {r["clip_id"] for r in res.errors.select("clip_id").collect()}
    all_ids = {r[0] for r in rows}
    # errors ∪ (valid = survivors ∪ losers) must partition the input
    losers = {r["clip_id"] for r in res.losers.select("clip_id").collect()}
    assert surv | losers | errs == all_ids
    assert not (surv & errs) and not (surv & losers)
    return res, surv, errs


def test_degenerate_texts_survive_pipeline(spark, tmp_path):
    """Empty / whitespace / single-char / sub-shingle-width texts: all
    shingle sets are empty (below width 8), so no detector fires; valid
    non-empty rows all survive, empty ones land in errors."""
    rows = [
        ("empty", None, None, None, None, ""),
        ("spaces", None, None, None, None, "   "),
        ("one_char", None, None, None, None, "x"),
        ("two_char", None, None, None, None, "ab"),
        ("seven", None, None, None, None, "abcdefg"),
        ("null_t", None, None, None, None, None),
    ]
    res, surv, errs = _run(spark, tmp_path, rows, "degen")
    assert errs == {"empty", "spaces", "null_t"}
    assert surv == {"one_char", "two_char", "seven"}
    assert res.verified_edges.count() == 0


def test_100k_char_transcript(spark, tmp_path):
    """A 100k-char text plus a clip whose transcript is one of its
    substrings: the suffix detector must flag the containment without
    overflow/timeout; the giant itself survives."""
    giant = "the quick brown fox jumps over the lazy dog " * 2300  # ~101k chars
    contained = giant[1000:1200]
    rows = [
        ("giant", None, None, None, None, giant),
        ("inside", None, None, None, None, contained),
        ("other", None, None, None, None,
         "completely unrelated transcript with nothing shared here at all"),
    ]
    res, surv, errs = _run(spark, tmp_path, rows, "giant")
    assert errs == set()
    # `inside` is contained in `giant` → one of the two is deduped away
    assert "other" in surv
    assert len(surv) == 2 and res.losers.count() == 1


def test_all_identical_corpus_one_giant_component(spark, tmp_path):
    """50 byte-identical rows: a single 50-member component (a clique
    through every detector) with exactly one survivor — the hot-bucket
    path, CC, and survivor pick all on one degenerate cluster."""
    text = "identical transcript content repeated across every clip in here"
    rows = [(f"c{i:03d}", None, None, None, None, text) for i in range(50)]
    res, surv, errs = _run(spark, tmp_path, rows, "identical")
    assert errs == set()
    assert len(surv) == 1
    comps = res.components.select("component").distinct().count()
    assert comps == 1
    assert res.components.count() == 50


def test_everything_filtered(spark, tmp_path):
    """Every row invalid: zero survivors, zero edges, all errors —
    downstream stages must run over empty frames without failing."""
    rows = [
        ("a", None, None, None, None, None),
        ("b", None, None, None, None, ""),
        ("c", None, None, -5, None, "has text but negative duration"),
    ]
    res, surv, errs = _run(spark, tmp_path, rows, "allbad")
    assert surv == set()
    assert errs == {"a", "b", "c"}
    assert res.survivors.count() == 0
    assert res.components.count() == 0


def test_mixed_hostile_resume(spark, tmp_path):
    """The hostile corpus must also RESUME: run twice against the same
    checkpoint dir; second run resumes every stage with identical
    survivors."""
    giant = "z y x w v u t s r q p o n m l k " * 700
    rows = [
        ("g", None, None, None, None, giant),
        ("s", None, None, None, None, giant[100:300]),
        ("e", None, None, None, None, ""),
        ("k", None, None, None, None, "an ordinary valid transcript row"),
    ]
    clips = _clips(spark, rows)
    ck = str(tmp_path / "resume")
    r1 = run_pipeline(spark, clips, CFG, ck, with_audio=False)
    s1 = {r["clip_id"] for r in r1.survivors.select("clip_id").collect()}
    r2 = run_pipeline(spark, clips, CFG, ck, with_audio=False)
    s2 = {r["clip_id"] for r in r2.survivors.select("clip_id").collect()}
    assert s1 == s2
    assert r2.resumed_stages, "second run resumed nothing"
