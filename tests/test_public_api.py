"""The package root IS the public API (VERDICT r3 task #4).

Two contracts:
- ``from addresses_importer_spark import run_pipeline`` (and friends)
  works — users never reach into submodules;
- the README "Run the pipeline on your own parquet" snippet is real
  code: the test extracts the fenced block from README.md verbatim,
  rewrites only its filesystem paths to tmp fixtures, and executes it.
"""

import os
import re

import addresses_importer_spark as pkg
from addresses_importer_spark.datagen import fixture_with_dupes, to_spark

README = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "README.md")


def test_root_exports():
    for name in pkg.__all__:
        assert getattr(pkg, name) is not None
    # the exact surface README promises
    assert {"run_pipeline", "DedupConfig", "read_clips",
            "export_survivors_csv", "get_spark"} <= set(pkg.__all__)


def _readme_snippet() -> str:
    with open(README) as f:
        text = f.read()
    section = text.split("## Run the pipeline on your own parquet", 1)[1]
    m = re.search(r"```python\n(.*?)```", section, re.DOTALL)
    assert m, "README pipeline snippet missing"
    return m.group(1)


def test_readme_snippet_executes(spark, tmp_path):
    snippet = _readme_snippet()
    pdf, _truth = fixture_with_dupes()
    inp = str(tmp_path / "clips.parquet")
    to_spark(spark, pdf).write.parquet(inp)
    code = (
        snippet
        .replace("/data/clips.parquet", inp)
        .replace("/ckpt/run1", str(tmp_path / "ckpt"))
        .replace("/out/survivors", str(tmp_path / "survivors"))
        .replace("/out/csv", str(tmp_path / "csv"))
        # reuse the session fixture instead of booting a second JVM
        .replace("spark = get_spark(cores=8)", "spark = spark")
    )
    ns = {"spark": spark}
    exec(compile(code, "README.md", "exec"), ns)  # noqa: S102 — the point
    assert ns["res"].survivors.count() == 10
    assert os.path.exists(str(tmp_path / "survivors"))
    assert os.path.exists(str(tmp_path / "csv"))


def test_root_exports_probe_api():
    assert {"start_dedup_probe", "prepare_probe_index",
            "probe_edges"} <= set(pkg.__all__)


def _probe_snippet() -> str:
    with open(README) as f:
        text = f.read()
    section = text.split("## Probe a stream of new clips", 1)[1]
    m = re.search(r"```python\n(.*?)```", section, re.DOTALL)
    assert m, "README probe snippet missing"
    return m.group(1)


def test_readme_probe_snippet_executes(spark, tmp_path):
    """The streaming probe README snippet is real code (VERDICT r4 #5):
    executed verbatim with only paths rewritten, it must drain the
    stream and land verified edges under epoch_id partitions."""
    from addresses_importer_spark.config import DedupConfig
    from addresses_importer_spark.operators.signatures import build_features

    pdf, truth = fixture_with_dupes()
    first = set(truth.groupby("cluster_id")["clip_id"].min())
    feats_path = str(tmp_path / "features.parquet")
    build_features(
        to_spark(spark, pdf[pdf.clip_id.isin(first)]), DedupConfig()
    ).write.parquet(feats_path)
    incoming = str(tmp_path / "incoming")
    to_spark(spark, pdf[~pdf.clip_id.isin(first)]).write.parquet(incoming)

    code = (
        _probe_snippet()
        .replace("/ckpt/run1/features/data.parquet", feats_path)
        .replace("/probe/index", str(tmp_path / "index"))
        .replace("/data/incoming", incoming)
        .replace("/probe/edges", str(tmp_path / "edges"))
        .replace("/probe/ckpt", str(tmp_path / "ckpt"))
        .replace("spark = get_spark(cores=8)", "spark = spark")
    )
    ns = {"spark": spark}
    exec(compile(code, "README.md:probe", "exec"), ns)  # noqa: S102
    assert ns["stats"]["truncated_buckets"] == 0
    edges = spark.read.parquet(str(tmp_path / "edges"))
    assert edges.count() > 0
    assert "epoch_id" in edges.columns
