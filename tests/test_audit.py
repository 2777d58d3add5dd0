"""Per-row invariant audits: payload passthrough + acoustic SNR."""

import pytest
from pyspark.sql import functions as F

from addresses_importer_spark.config import DedupConfig
from addresses_importer_spark.datagen import fixture_with_dupes, to_spark
from addresses_importer_spark.operators.audit import (
    audit_acoustic_snr, audit_payload_passthrough,
)
from addresses_importer_spark.plans.pipeline import run_pipeline

CFG = DedupConfig()


@pytest.fixture(scope="module")
def result(spark, tmp_path_factory):
    pdf, truth = fixture_with_dupes()
    clips = to_spark(spark, pdf)
    ckpt = str(tmp_path_factory.mktemp("ckpt_audit"))
    return clips, run_pipeline(spark, clips, CFG, ckpt)


def test_payload_passthrough_holds(result):
    clips, res = result
    violations = audit_payload_passthrough(clips, res.survivors)
    assert violations.count() == 0


def test_payload_passthrough_detects_corruption(spark, result):
    clips, res = result
    victim = res.survivors.select("clip_id").orderBy("clip_id").first()["clip_id"]
    corrupted = res.survivors.withColumn(
        "transcript",
        F.when(F.col("clip_id") == victim, F.lit("MANGLED"))
        .otherwise(F.col("transcript")),
    )
    bad = audit_payload_passthrough(clips, corrupted).collect()
    assert [r["clip_id"] for r in bad] == [victim]


def test_acoustic_dups_meet_snr_floor(result):
    """Verified simhash edges in the fixture are planted at SNR >= 30 dB;
    the audit must confirm that (dedupe.rs:106-127 doctest analog)."""
    clips, res = result
    rows = audit_acoustic_snr(res.verified_edges, clips, CFG).collect()
    assert rows, "fixture has acoustic clusters; expected simhash edges"
    for r in rows:
        assert r["snr_db"] is not None and r["snr_db"] >= CFG.snr_db_min, r
