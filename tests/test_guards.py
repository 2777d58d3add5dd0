"""Round-3 guard fixes: probe-bits-aware blocking validation, URI
scheme rejection in CheckpointStore, and the reliable-checkpoint
materialization strategy for cluster mode."""

import os

import pytest
from pyspark.sql import functions as F

from addresses_importer_spark.config import DedupConfig
from addresses_importer_spark.operators.components import connected_components
from addresses_importer_spark.operators.materialize import (
    checkpoint_is_reliable, materialize,
)
from addresses_importer_spark.sources.checkpoint import CheckpointStore


def test_probe_bits_zero_blocking_guarantee():
    """probe_bits=0 means plain banding: guaranteed Hamming is bands-1
    (=1 at defaults), so the default max_hamming=3 must be REJECTED —
    it previously validated against 2*bands-1 unconditionally and let
    blocking silently miss verified-range pairs at Hamming 2-3."""
    with pytest.raises(ValueError, match="blocking only guarantees"):
        DedupConfig(simhash_probe_bits=0)
    # a self-consistent probe-less config is fine
    DedupConfig(simhash_probe_bits=0, simhash_max_hamming=1)
    DedupConfig(simhash_probe_bits=0, simhash_bands=4, simhash_max_hamming=3)
    DedupConfig()  # default multi-probe config: guaranteed 2*bands-1 = 3


@pytest.mark.parametrize("root", [
    "hdfs://nn/tmp/ck",
    "hdfs:/tmp/ck",      # Hadoop-style single-slash URI: no '://' at all
    "s3a://bucket/ck",
    "file://otherhost/ck",
])
def test_checkpoint_store_rejects_remote_uris(root):
    with pytest.raises(ValueError, match="unsupported"):
        CheckpointStore(root, "cfg")


def test_checkpoint_store_normalizes_file_uris(tmp_path):
    """file://, single-slash file:, and bare paths all resolve to the
    same local filesystem path (no literal 'file:' directory ever
    appears on disk)."""
    for form in (f"file://{tmp_path}/a", f"file:{tmp_path}/b",
                 str(tmp_path / "c")):
        store = CheckpointStore(form, "cfg")
        assert os.path.isdir(store.root), form
        assert "file:" not in store.root, form
    assert not os.path.exists("file:")


def test_materialize_reliable_when_checkpoint_dir_set(spark, tmp_path):
    """With sc.setCheckpointDir configured (production cluster mode),
    materialize() must take the replicated-checkpoint path — files land
    under the dir — and CC must still converge through it."""
    sc = spark.sparkContext
    assert sc.getCheckpointDir() is None
    ckdir = str(tmp_path / "reliable_ck")
    sc.setCheckpointDir(ckdir)
    try:
        df = spark.range(10).withColumn("v", F.col("id") * 2)
        assert checkpoint_is_reliable(df)
        out = materialize(df, eager=True)
        assert out.count() == 10
        assert any(os.scandir(ckdir)), "no reliable checkpoint files written"

        edges = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y")],
            "src string, dst string",
        )
        comps = {
            (r["clip_id"], r["component"])
            for r in connected_components(edges).collect()
        }
        assert comps == {("a", "a"), ("b", "a"), ("c", "a"), ("d", "a"),
                         ("x", "x"), ("y", "x")}
    finally:
        # restore the session's local-mode default for the other tests
        getattr(sc._jsc.sc(), "checkpointDir_$eq")(sc._jvm.scala.Option.empty())
        assert sc.getCheckpointDir() is None


def test_suffix_postings_take_reliable_path(spark, tmp_path):
    """The suffix postings lineage cut goes through materialize(), so
    with a checkpoint dir configured the signature stage survives
    executor loss like components does (VERDICT r3 task #2): reliable
    checkpoint files must land under the dir when the stage runs."""
    from addresses_importer_spark.operators.signatures import suffix_signatures

    sc = spark.sparkContext
    assert sc.getCheckpointDir() is None
    ckdir = str(tmp_path / "suffix_ck")
    sc.setCheckpointDir(ckdir)
    try:
        feats = spark.createDataFrame(
            [("a", "the quick brown fox jumps over the lazy dog"),
             ("b", "quick brown fox jumps over the lazy dog"),
             ("c", "a completely different transcript entirely here")],
            "clip_id string, norm string",
        )
        sigs = suffix_signatures(feats, DedupConfig())
        assert sigs.count() > 0
        ck_files = [e for d in os.scandir(ckdir) for e in os.scandir(d.path)]
        assert ck_files, "suffix postings did not write a reliable checkpoint"
    finally:
        getattr(sc._jsc.sc(), "checkpointDir_$eq")(sc._jvm.scala.Option.empty())
        assert sc.getCheckpointDir() is None
