"""Similarity search: brute-force exactness + LSH/IVF recall."""

import pytest
from pyspark.sql import functions as F

from addresses_importer_spark.operators.similarity import (
    ann_near_dup_pairs, brute_force_topk, ivf_topk, lsh_planes,
)

DIM = 16


@pytest.fixture(scope="module")
def emb(spark):
    import numpy as np
    rng = np.random.default_rng(9)
    base = rng.standard_normal((60, DIM)).astype("float32")
    rows = [(i, base[i].tolist()) for i in range(60)]
    # planted near-dups: 61..70 are tiny perturbations of 0..9
    for i in range(10):
        rows.append((61 + i, (base[i] + 0.01 * rng.standard_normal(DIM))
                     .astype("float32").tolist()))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_brute_force_topk_exact(emb):
    q = emb.filter(F.col("vec_id") == 0).select("embedding")
    top = brute_force_topk(emb.filter(F.col("vec_id") != 0), q, k=3).collect()
    # nearest to vec 0 must be its planted copy (61)
    assert top[0]["vec_id"] == 61
    assert top[0]["sim"] > 0.99


def test_ann_near_dup_recall(emb):
    planes = lsh_planes(DIM, 12)
    got = {
        (r["src_vec"], r["dst_vec"])
        for r in ann_near_dup_pairs(emb, planes, threshold=0.99).collect()
    }
    expected = {(i, 61 + i) for i in range(10)}
    recall = len(got & expected) / len(expected)
    assert recall >= 0.9, f"recall {recall}: {sorted(expected - got)}"
    # no false positives above threshold (cosine verify is exact)
    assert all(p in expected for p in got)


def test_ivf_topk_finds_planted_copy(emb):
    planes = lsh_planes(DIM, 6)
    q = emb.filter(F.col("vec_id") == 0).select("embedding")
    rows = ivf_topk(emb.filter(F.col("vec_id") != 0), q, planes, k=3).collect()
    assert rows and rows[0]["vec_id"] == 61
