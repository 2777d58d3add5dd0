"""N → 4N scaling protocol (BASELINE.md sandbox protocol).

No real cluster in the sandbox, so cluster size is evidenced by core
count: the identical pipeline on identical input at local[8] vs
local[32]; efficiency = (throughput@32 / throughput@8) / 4. Each
measurement is a fresh JVM (subprocess) so executor-thread pools,
shuffle partitions, and memory are configured per run exactly as
spark-submit would.

Usage:
    python bench_scaling.py                 # full protocol -> BENCH.md
    python bench_scaling.py --one N         # one measurement (internal)
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CORPUS = "/tmp/spark_graft_scaling/clips.parquet"
N_BASE = int(os.environ.get("SCALING_CLIPS", "12000"))
CORES = (8, 32)


def run_one(cores: int) -> None:
    from addresses_importer_spark.config import DedupConfig
    from addresses_importer_spark.plans.pipeline import run_pipeline
    from addresses_importer_spark.session import get_spark

    spark = get_spark(app_name=f"scaling-{cores}", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")
    clips = spark.read.parquet(CORPUS)
    n = clips.count()
    ckpt = f"/tmp/spark_graft_scaling/ckpt_{cores}"
    shutil.rmtree(ckpt, ignore_errors=True)
    t0 = time.time()
    res = run_pipeline(spark, clips, DedupConfig(), ckpt)
    n_surv = res.survivors.count()
    wall = time.time() - t0
    print(json.dumps({
        "cores": cores, "clips": n, "survivors": n_surv,
        "wall_sec": round(wall, 2),
        "clips_per_sec": round(n / wall, 2),
    }))
    spark.stop()


def ensure_corpus() -> None:
    if os.path.exists(os.path.join(CORPUS, "_SUCCESS")):
        return
    from addresses_importer_spark.datagen import synth_corpus
    from addresses_importer_spark.session import get_spark

    spark = get_spark(app_name="scaling-gen", cores=16)
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(CORPUS, ignore_errors=True)
    synth_corpus(spark, n_base=N_BASE, dup_fraction=0.3, partitions=64).write.mode(
        "overwrite"
    ).parquet(CORPUS)
    spark.stop()


def main() -> None:
    if len(sys.argv) >= 3 and sys.argv[1] == "--one":
        run_one(int(sys.argv[2]))
        return

    ensure_corpus()
    results = {}
    for cores in CORES:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", str(cores)],
            capture_output=True, text=True, timeout=3600,
        )
        line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
        results[cores] = json.loads(line)
        print(line)

    lo, hi = CORES
    eff = (results[hi]["clips_per_sec"] / results[lo]["clips_per_sec"]) / (hi / lo)
    summary = {
        "protocol": f"local[{lo}] vs local[{hi}], identical input+config, fresh JVM each",
        "clips": results[lo]["clips"],
        f"throughput_local{lo}": results[lo]["clips_per_sec"],
        f"throughput_local{hi}": results[hi]["clips_per_sec"],
        f"wall_local{lo}_sec": results[lo]["wall_sec"],
        f"wall_local{hi}_sec": results[hi]["wall_sec"],
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "meets_target": eff >= 0.8,
    }
    print(json.dumps(summary))
    with open("SCALING.json", "w") as f:
        json.dump({"runs": results, "summary": summary}, f, indent=2)


if __name__ == "__main__":
    main()
