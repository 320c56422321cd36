"""Product-quantization ANN (operators/pq.py): codebook determinism,
encode shape, ADC recall on planted clusters, and exact agreement of
the re-ranked head with brute force."""

from __future__ import annotations

import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from etl_python_sqlite_spark.operators.pq import (
    pq_encode,
    pq_topk,
    train_pq_codebooks,
)
from etl_python_sqlite_spark.operators.similarity import cosine_topk

DIM = 64


@pytest.fixture(scope="module")
def planted(spark):
    """300 vectors in 3 well-separated clusters + noise; query = member
    of cluster 0, so its true neighbors are the other cluster-0 rows."""
    rng = random.Random(13)
    centers = []
    for c in range(3):
        centers.append([rng.uniform(-1, 1) * 4 for _ in range(DIM)])
    rows = []
    for i in range(300):
        c = centers[i % 3]
        rows.append(
            (i, [x + rng.gauss(0, 0.3) for x in c])
        )
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_codebooks_deterministic_and_shaped(planted):
    b1 = train_pq_codebooks(planted, m=8, ksub=16, sample=128)
    b2 = train_pq_codebooks(planted, m=8, ksub=16, sample=128)
    assert b1.shape == (8, 16, DIM // 8)
    assert np.array_equal(b1, b2)


def test_train_rejects_bad_input(spark, planted):
    empty = planted.filter(F.col("vec_id") < 0)
    with pytest.raises(ValueError, match="empty"):
        train_pq_codebooks(empty)
    with pytest.raises(ValueError, match="divisible"):
        train_pq_codebooks(planted, m=7)


def test_encode_shape_and_range(planted):
    books = train_pq_codebooks(planted, m=8, ksub=16, sample=128)
    enc = pq_encode(planted, books)
    rows = enc.select("pq_code").limit(20).collect()
    for r in rows:
        code = r["pq_code"]
        assert len(code) == 8
        assert all(0 <= c < 16 for c in code)


def test_pq_topk_recall_on_planted_clusters(spark, planted):
    qrow = planted.filter(F.col("vec_id") == 0).first()
    q = list(qrow["embedding"])
    corpus = planted.filter(F.col("vec_id") != 0)
    approx = pq_topk(corpus, q, k=20, rerank=64)
    exact = cosine_topk(corpus, q, k=20)
    a = {r["vec_id"] for r in approx.collect()}
    e = {r["vec_id"] for r in exact.collect()}
    # clustered data is PQ's best case — demand strong recall here
    assert len(a & e) >= 15
    # every hit must be a true cluster-0 member (ids ≡ 0 mod 3)
    assert all(v % 3 == 0 for v in a)


def test_pq_rerank_head_matches_brute_force(spark, planted):
    """Wherever the shortlist contains the true top rows, the re-ranked
    scores/order must agree exactly with brute force (same fold, same
    rounding)."""
    qrow = planted.filter(F.col("vec_id") == 3).first()
    q = list(qrow["embedding"])
    corpus = planted.filter(F.col("vec_id") != 3)
    approx = {
        r["vec_id"]: r["cos_sim"]
        for r in pq_topk(corpus, q, k=10, rerank=64).collect()
    }
    exact = {
        r["vec_id"]: r["cos_sim"] for r in cosine_topk(corpus, q, k=10).collect()
    }
    for v in approx.keys() & exact.keys():
        assert approx[v] == exact[v]
