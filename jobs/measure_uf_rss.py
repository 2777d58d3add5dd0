"""Measure driver python peak RSS of the union-find path at the
driver_max_edges bound (1M edges) — VERDICT r3 task #8. One-off; the
measured number is recorded in operators/components.py."""

import resource
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from addresses_importer_spark.session import get_spark


def mb(kb: int) -> float:
    return kb / 1024.0


def main() -> None:
    spark = get_spark(app_name="uf-rss", cores=8)
    spark.sparkContext.setLogLevel("ERROR")
    n = 1_000_000
    # 1M distinct canonical edges over ~1.3M nodes (forest of small
    # components — the dup-graph shape), ids sized like real clip ids
    edges = (
        spark.range(n)
        .select(
            F.concat(F.lit("clip_"), F.lpad((F.col("id") * 17 % 1_300_000)
                     .cast("string"), 9, "0")).alias("src"),
            F.concat(F.lit("clip_"), F.lpad((F.col("id") * 17 % 1_300_000 + 1)
                     .cast("string"), 9, "0")).alias("dst"),
        )
    )
    before = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    from addresses_importer_spark.operators.components import connected_components
    out = connected_components(edges, driver_max_edges=n)
    rows = out.count()
    after = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    print(f"edges={n} label_rows={rows}")
    print(f"python_peak_rss_before={mb(before):.0f}MB after={mb(after):.0f}MB "
          f"delta={mb(after - before):.0f}MB")
    spark.stop()


if __name__ == "__main__":
    main()
