"""Cluster-size histogram contract query (`cluster_size_hist`).

The size distribution of CC clusters is the diagnostic a dedup
operator reads first: a fat tail means a blocking key is too coarse
(the reference walks exactly these per-cluster groups in
deduplicator.rs:137-170). Asserts DuckDB parity plus the structural
invariants that make the histogram trustworthy:

- every cluster has size >= 2 (CC emits only clips that verified
  against something; singletons never enter the edge frame);
- mass conservation: sum(cluster_size * n_clusters) equals the row
  count of the `dedup_components` label frame it aggregates.
"""

import duckdb
import pytest

from addresses_importer_spark.plans.driver_queries import ORACLES, QUERIES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def hist_pdf(spark):
    return QUERIES["cluster_size_hist"](spark, SF_DIR).toPandas()


def _duck(sql):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    return con.execute(sql).fetchdf()


def _key(pdf):
    cols = sorted(pdf.columns)
    return sorted(tuple(str(int(v)) for v in row)
                  for row in pdf[cols].itertuples(index=False, name=None))


def test_duckdb_parity(hist_pdf):
    assert len(hist_pdf) > 0
    assert _key(hist_pdf) == _key(_duck(ORACLES["cluster_size_hist"]))


def test_min_cluster_size_is_two(hist_pdf):
    assert int(hist_pdf["cluster_size"].min()) >= 2


def test_mass_conservation(spark, hist_pdf):
    labeled = QUERIES["dedup_components"](spark, SF_DIR).count()
    mass = int((hist_pdf["cluster_size"] * hist_pdf["n_clusters"]).sum())
    assert mass == labeled
