"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship: the full MinHash-LSH dedup survivors query over
               the derived documents corpus at sf0.001.
queries()    — every implemented operator surface from SURVEY.md §2,
               each with a DuckDB oracle in oracle_sql(); the dedup
               chain (signatures → candidates → verify → CC →
               survivors) runs MY real operators, and the oracle
               replicates the exact md5-based hash math (see
               addresses_importer_spark/functions/oracle_fragments.py).
oracle_sql() — ANSI SQL oracles (DuckDB) keyed identically.

Audio-path operators (SimHash detector, PCM decode, full checkpointed
pipeline) have no SQL-expressible oracle — they are covered by
tests/ golden fixtures (pytest) and bench.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from addresses_importer_spark.plans.driver_queries import (  # noqa: E402
    ORACLES, QUERIES, q_dedup_survivors,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_dedup_survivors(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
