"""Extra measurement harness (guide §1): per-stage pipeline walls +
noop-sink isolation of individual contract queries. NOT the driver
contract — bench.py stays frozen; numbers from here are cited in
OPTIMIZATION_r06.md only.

Usage:
  python bench_extra.py pipeline   # per-stage metrics at $SPARK_GRAFT_SF_DIR
  python bench_extra.py queries q1 q2 ...   # noop-sink timing per query
  python bench_extra.py explain q1 ...      # .explain("formatted") to stdout
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from addresses_importer_spark.config import DedupConfig
from addresses_importer_spark.plans import driver_queries as DQ
from addresses_importer_spark.plans.pipeline import run_pipeline
from addresses_importer_spark.session import get_spark

from bench import ensure_corpus


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "pipeline"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)
    spark = get_spark(app_name="bench_extra", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")
    cfg = DedupConfig()

    if mode == "pipeline":
        n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
        n_clips = int(os.environ.get("BENCH_CLIPS", "0")) or 4 * n_docs
        clips_path = ensure_corpus(spark, sf_dir, n_clips)
        clips = spark.read.parquet(clips_path)
        ckpt = "/tmp/spark_graft_bench_extra/ckpt"
        shutil.rmtree(ckpt, ignore_errors=True)
        spark.sparkContext.setJobDescription("pipeline_full (bench_extra)")
        t0 = time.time()
        res = run_pipeline(spark, clips, cfg, ckpt)
        n_survivors = res.survivors.count()
        wall = time.time() - t0
        print(json.dumps({
            "wall": round(wall, 3),
            "survivors": n_survivors,
            "metrics": res.metrics,
        }, indent=2, sort_keys=True))
    elif mode in ("queries", "explain"):
        names = sys.argv[2:] or list(DQ.QUERIES)
        timings = {}
        for name in names:
            spark.sparkContext.setJobDescription(f"query:{name}")
            t0 = time.time()
            df = DQ.QUERIES[name](spark, sf_dir)
            if mode == "explain":
                print(f"===== {name} =====")
                df.explain("formatted")
                continue
            df.write.format("noop").mode("overwrite").save()
            timings[name] = round(time.time() - t0, 3)
            print(f"{name}: {timings[name]}", file=sys.stderr)
        if mode == "queries":
            print(json.dumps(timings))
    spark.stop()


if __name__ == "__main__":
    main()
