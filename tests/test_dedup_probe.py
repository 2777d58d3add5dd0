"""Streaming incremental dedup probe: new clips vs a static index.

Planted expectation: stream each fixture cluster's non-first members
against an index holding only first members — every streamed transcript
/ acoustic / exact dup must edge back to its cluster's index clip, and
an availableNow restart over the same checkpoint must be a no-op
(idempotent epoch partitions).
"""

import pytest

from addresses_importer_spark.config import DedupConfig
from addresses_importer_spark.datagen import fixture_with_dupes, to_spark
from addresses_importer_spark.operators.signatures import build_features
from addresses_importer_spark.streaming.dedup_probe import start_dedup_probe

CFG = DedupConfig()

#: suffix containment is batch-only (global-df query keys); the
#: containment clusters c7/c8 are therefore NOT probe-detectable
PROBE_CLUSTERS = {"c0", "c1", "c2", "c3", "c4", "c5", "c6", "c9"}


@pytest.fixture(scope="module")
def probe_run(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("probe")
    pdf, truth = fixture_with_dupes()
    first = truth.groupby("cluster_id")["clip_id"].min()
    index_ids = set(first)
    index_pdf = pdf[pdf.clip_id.isin(index_ids)]
    stream_pdf = pdf[~pdf.clip_id.isin(index_ids)]

    index_path = str(tmp / "index_features")
    build_features(to_spark(spark, index_pdf), CFG).write.parquet(index_path)
    src = str(tmp / "incoming")
    to_spark(spark, stream_pdf).write.parquet(src)

    out, ckpt = str(tmp / "edges"), str(tmp / "ckpt")
    q = start_dedup_probe(spark, src, index_path, out, ckpt, CFG)
    q.awaitTermination(300)
    return spark, truth, index_ids, src, index_path, out, ckpt


def test_every_probeable_dup_finds_its_index_clip(probe_run):
    spark, truth, index_ids, *_, out, _ = probe_run
    edges = {(r.src, r.dst) for r in spark.read.parquet(out).collect()}
    cluster_of = dict(zip(truth.clip_id, truth.cluster_id))
    by_cluster = truth.groupby("cluster_id")["clip_id"].min().to_dict()
    streamed = [c for c in truth.clip_id if c not in index_ids
                and cluster_of[c] in PROBE_CLUSTERS]
    assert streamed
    for clip in streamed:
        anchor = by_cluster[cluster_of[clip]]
        assert (clip, anchor) in edges, (clip, anchor)


def test_edges_point_only_at_real_cluster_mates(probe_run):
    spark, truth, index_ids, *_, out, _ = probe_run
    cluster_of = dict(zip(truth.clip_id, truth.cluster_id))
    for r in spark.read.parquet(out).collect():
        assert r.dst in index_ids
        assert cluster_of[r.src] == cluster_of[r.dst], (r.src, r.dst, r.detector)


def test_probe_restart_is_idempotent(probe_run):
    spark, _, _, src, index_path, out, ckpt = probe_run
    before = sorted(
        tuple(r) for r in spark.read.parquet(out).drop("epoch_id").collect()
    )
    q = start_dedup_probe(spark, src, index_path, out, ckpt, CFG)
    q.awaitTermination(300)
    after = sorted(
        tuple(r) for r in spark.read.parquet(out).drop("epoch_id").collect()
    )
    assert after == before
