"""Golden end-to-end fixtures, transposing the reference's integration
tests (deduplicator/src/lib/tests.rs):

- no_dupes  (tests.rs:69-90):  output id-set == input id-set;
- with_dupes (tests.rs:124-143): exactly 10 survivors, cluster
  assignments == planted truth, dup-pair recall >= 0.99;
- x10 idempotence (tests.rs:94-120): 10x byte-identical copies → one
  survivor per original;
- export fidelity (tests.rs:147-177): CSV round-trip set-equality;
- payload invariants: survivors' bytes + transcript pass through
  unmodified (BASELINE.json per-row invariant).
"""

import itertools

import pytest

from addresses_importer_spark.config import DedupConfig
from addresses_importer_spark.datagen import (
    fixture_no_dupes, fixture_with_dupes, fixture_x10, to_spark,
)
from addresses_importer_spark.plans.pipeline import run_pipeline
from addresses_importer_spark.sources.clips import (
    export_survivors_csv, read_survivors_csv,
)

CFG = DedupConfig()


@pytest.fixture(scope="module")
def with_dupes_result(spark, tmp_path_factory):
    pdf, truth = fixture_with_dupes()
    clips = to_spark(spark, pdf)
    ckpt = str(tmp_path_factory.mktemp("ckpt_wd"))
    res = run_pipeline(spark, clips, CFG, ckpt)
    return pdf, truth, res


def test_with_dupes_survivor_count(with_dupes_result):
    pdf, truth, res = with_dupes_result
    assert res.survivors.count() == truth["cluster_id"].nunique() == 10


def test_with_dupes_cluster_assignments(with_dupes_result):
    """Predicted components must equal planted clusters exactly
    (members partition identically)."""
    pdf, truth, res = with_dupes_result
    pred = {r["clip_id"]: r["component"] for r in res.components.collect()}
    # every clip belongs to some component (all clusters have >= 2 members)
    assert set(pred) == set(truth["clip_id"])
    # same-cluster ⇔ same-component
    t = dict(zip(truth["clip_id"], truth["cluster_id"]))
    for a, b in itertools.combinations(sorted(t), 2):
        same_truth = t[a] == t[b]
        same_pred = pred[a] == pred[b]
        assert same_truth == same_pred, (a, b, t[a], t[b], pred[a], pred[b])


def test_with_dupes_recall(with_dupes_result):
    """Dup-pair recall >= 0.99 at the pinned config (BASELINE.json)."""
    pdf, truth, res = with_dupes_result
    t = dict(zip(truth["clip_id"], truth["cluster_id"]))
    true_pairs = {
        (a, b)
        for a, b in itertools.combinations(sorted(t), 2)
        if t[a] == t[b]
    }
    pred = {r["clip_id"]: r["component"] for r in res.components.collect()}
    hit = sum(
        1 for a, b in true_pairs if pred.get(a) is not None and pred.get(a) == pred.get(b)
    )
    recall = hit / len(true_pairs)
    assert recall >= 0.99, f"recall {recall:.3f} ({hit}/{len(true_pairs)})"


def test_no_dupes_all_survive(spark, tmp_path):
    pdf = fixture_no_dupes()
    clips = to_spark(spark, pdf)
    res = run_pipeline(spark, clips, CFG, str(tmp_path / "ckpt"))
    out_ids = {r["clip_id"] for r in res.survivors.select("clip_id").collect()}
    assert out_ids == set(pdf["clip_id"]), (
        f"falsely merged: {sorted(set(pdf['clip_id']) - out_ids)[:10]}"
    )


def test_x10_idempotence(spark, tmp_path):
    pdf = fixture_x10()
    clips = to_spark(spark, pdf)
    res = run_pipeline(spark, clips, CFG, str(tmp_path / "ckpt"))
    survivors = res.survivors.select("clip_id").collect()
    # one survivor per original row
    originals = {r["clip_id"].rsplit("_r", 1)[0] for r in survivors}
    assert len(survivors) == 109
    assert len(originals) == 109


def test_export_fidelity(spark, tmp_path, with_dupes_result):
    pdf, truth, res = with_dupes_result
    path = str(tmp_path / "export_csv")
    export_survivors_csv(res.survivors, path)
    back = read_survivors_csv(spark, path)
    a = {tuple(r) for r in res.survivors.select(
        "clip_id", "sr_hz", "dur_ms", "codec", "transcript").collect()}
    b = {tuple(r) for r in back.collect()}
    assert a == b


def test_containment_pair_container_survives(spark, tmp_path):
    """Rank's transcript-length term must keep the FULL document when a
    truncated copy ties on every other rank term (round-1 wart: the
    (rank, clip_id) desc tiebreak picked the copy whenever its id
    sorted higher). clip_ids here are chosen so the OLD tiebreak would
    pick the truncated row."""
    import pandas as pd

    full = (
        "the quick brown fox jumps over the lazy dog while seventy "
        "shimmering satellites trace slow arcs across the winter sky "
        "and the observatory logs every transit with patient precision"
    )
    trunc = full[: int(len(full) * 0.8)]
    pdf = pd.DataFrame(
        {
            "clip_id": ["a_full", "z_trunc"],
            "bytes": [None, None],
            "sr_hz": [None, None],
            "dur_ms": [None, None],
            "codec": [None, None],
            "transcript": [full, trunc],
        }
    )
    clips = to_spark(spark, pdf)
    res = run_pipeline(
        spark, clips, CFG, str(tmp_path / "ckpt"), with_audio=False
    )
    survivors = {r["clip_id"] for r in res.survivors.select("clip_id").collect()}
    assert survivors == {"a_full"}, survivors


def test_payload_passthrough_invariant(with_dupes_result):
    """Survivor rows carry byte-identical payload + transcript — the
    engine never rewrites data (BASELINE.json per-row invariant)."""
    pdf, truth, res = with_dupes_result
    orig = {r.clip_id: (bytes(r.bytes), r.transcript) for r in pdf.itertuples()}
    for r in res.survivors.collect():
        ob, ot = orig[r["clip_id"]]
        assert bytes(r["bytes"]) == ob
        assert r["transcript"] == ot
