"""JSON-lines source: nested-directory-tree scan (S2).

Graft of the reference's OpenAddresses importer, which walks a nested
directory tree and parses one record file per leaf
(importers/openaddresses/src/lib.rs:109-146). Spark-first shape:
``spark.read.json`` with ``recursiveFileLookup`` and an EXPLICIT schema
— inference would re-scan the whole tree (a second full pass at 100 TB)
and can silently widen types between runs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

DOCS_JSONL_SCHEMA = "doc_id bigint, lang string, text string"


def read_docs_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Documents from a nested .jsonl tree. Hidden files (_SUCCESS,
    .crc) are skipped by the source's default filter even under
    recursive lookup."""
    return (
        spark.read.schema(DOCS_JSONL_SCHEMA)
        .option("recursiveFileLookup", "true")
        .json(path)
    )


def write_docs_jsonl_tree(docs: DataFrame, path: str) -> None:
    """Deterministic nested tree: one directory level per lang (the
    partition column is duplicated so the record content stays complete
    — partitionBy drops its column from the file body, and a recursive
    scan never sees hive-style dir names)."""
    (
        docs.select("doc_id", "lang", "text", F.col("lang").alias("lang_dir"))
        .write.mode("overwrite")
        .partitionBy("lang_dir")
        .json(path)
    )


def ensure_docs_jsonl_tree(spark: SparkSession, sf_dir: str,
                           root: str = "/tmp/spark_graft_jsonl") -> str:
    """Generate (once per sf) a .jsonl tree derived from the driver's
    documents.parquet — the S2 fixture both the Spark query and the
    DuckDB oracle agree on by construction."""
    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    path = os.path.join(root, tag)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        write_docs_jsonl_tree(docs.select("doc_id", "lang", "text"), path)
    return path
