"""Production entry point — ships via spark-submit --py-files.

    python jobs/make_dist.py                     # builds dist/addresses_importer_spark.zip
    spark-submit --py-files dist/addresses_importer_spark.zip \
        jobs/run_dedup.py \
        --input  <iceberg-or-parquet clips path/table> \
        --checkpoint-dir <durable stage dir> \
        --output <survivors path> \
        [--export-csv <gzip csv dir>] [--stage all] [--detectors minhash,simhash,suffix]

On a cluster the SparkSession comes from spark-submit (master/executors
configured there); the local fallback mirrors the test harness. Stages
resume from the checkpoint dir automatically (manifest match) — a
killed run re-submitted with the same arguments continues mid-stage
(bin/main.rs `--keep` semantics, made automatic).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def build_session(cores: int | None) -> SparkSession:
    active = SparkSession.getActiveSession()
    if active is not None:
        return active
    from addresses_importer_spark.session import get_spark
    spark = get_spark(app_name="dedup-pipeline", cores=cores)
    # Python workers don't inherit the driver's sys.path — ship the
    # package exactly as spark-submit --py-files would (the pandas UDFs
    # unpickle `addresses_importer_spark.*` on workers).
    from jobs.make_dist import main as make_dist
    spark.sparkContext.addPyFile(make_dist())
    return spark


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="clips parquet path (or Iceberg table via format)")
    p.add_argument("--format", default="parquet", choices=["parquet", "iceberg"])
    p.add_argument("--checkpoint-dir", required=True)
    p.add_argument("--output", required=True, help="survivors parquet output path")
    p.add_argument("--export-csv", default=None, help="optional gzip CSV export dir")
    p.add_argument("--detectors", default="minhash,simhash,suffix")
    p.add_argument("--no-audio", action="store_true")
    p.add_argument("--cores", type=int, default=None, help="local-mode cores")
    args = p.parse_args()

    from addresses_importer_spark.config import DedupConfig
    from addresses_importer_spark.plans.pipeline import run_pipeline
    from addresses_importer_spark.sources.clips import export_survivors_csv

    spark = build_session(args.cores)
    if args.format == "iceberg":
        clips = spark.read.format("iceberg").load(args.input)
    else:
        clips = spark.read.parquet(args.input)

    cfg = DedupConfig()
    res = run_pipeline(
        spark, clips, cfg, args.checkpoint_dir,
        detectors=tuple(args.detectors.split(",")),
        with_audio=not args.no_audio,
    )
    res.survivors.write.mode("overwrite").parquet(args.output)
    if args.export_csv:
        export_survivors_csv(res.survivors, args.export_csv)

    print(json.dumps({
        "resumed_stages": res.resumed_stages,
        "metrics": res.metrics,
    }))


if __name__ == "__main__":
    main()
