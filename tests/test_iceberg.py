"""Iceberg end-to-end (SURVEY §1.3): write the clips corpus as an
Iceberg table, run the pipeline off `--format iceberg`, assert survivor
parity with the parquet path.

The sandbox container has no iceberg-spark-runtime jar and no network
to fetch one, so the test SKIPS (visibly) unless a jar is found — the
assertion body is real and runs wherever the jar exists. The Iceberg
branch itself (jobs/run_dedup.py --format iceberg) is a one-line
`spark.read.format("iceberg")`; everything downstream is the same
DataFrame contract the parquet path exercises."""

import glob
import os
import subprocess
import sys

import pytest


def _iceberg_jar() -> str | None:
    import pyspark

    hits = glob.glob(
        os.path.join(os.path.dirname(pyspark.__file__), "jars",
                     "iceberg-spark-runtime*.jar")
    ) + glob.glob("/opt/jars/iceberg-spark-runtime*.jar")
    return hits[0] if hits else None


_DRIVER = r"""
import sys
sys.path.insert(0, sys.argv[4])
from addresses_importer_spark.config import DedupConfig
from addresses_importer_spark.datagen import fixture_with_dupes, to_spark
from addresses_importer_spark.plans.pipeline import run_pipeline
from addresses_importer_spark.session import get_spark, iceberg_session_conf

jar, warehouse, ckpt_root = sys.argv[1], sys.argv[2], sys.argv[3]
conf = iceberg_session_conf(warehouse)
conf["spark.jars"] = jar
spark = get_spark(app_name="iceberg-e2e", cores=4, extra_conf=conf)
spark.sparkContext.setLogLevel("ERROR")

pdf, _ = fixture_with_dupes()
clips = to_spark(spark, pdf)
clips.writeTo("local.db.clips").using("iceberg").createOrReplace()

ice = spark.read.format("iceberg").load("local.db.clips")
res_i = run_pipeline(spark, ice, DedupConfig(), ckpt_root + "/ice")
res_p = run_pipeline(spark, clips, DedupConfig(), ckpt_root + "/pq")
ids_i = sorted(r["clip_id"] for r in res_i.survivors.select("clip_id").collect())
ids_p = sorted(r["clip_id"] for r in res_p.survivors.select("clip_id").collect())
assert ids_i == ids_p, (len(ids_i), len(ids_p))
print("ICEBERG_E2E_OK", len(ids_i))
"""


@pytest.mark.skipif(
    _iceberg_jar() is None,
    reason="no iceberg-spark-runtime jar in container and no network to "
           "fetch one — Iceberg IO documented in session.iceberg_session_conf",
)
def test_iceberg_pipeline_matches_parquet(tmp_path):
    # subprocess: Iceberg confs must be set before JVM start, and the
    # suite's shared session is already up
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "-c", _DRIVER, _iceberg_jar(),
         str(tmp_path / "wh"), str(tmp_path / "ck"), repo],
        capture_output=True, text=True, timeout=600,
    )
    assert "ICEBERG_E2E_OK" in out.stdout, out.stderr[-2000:]
