"""Trained IVF coarse quantizer (VERDICT r5 next-step 3).

The round-5 recall gates ran on near-orthogonal synthetic noise, which
cannot fail a random quantizer. These tests run the SAME gate on the
clustered corpus (_clustered_corpus: 8 tight angular clusters) and pin
that seeded-random centroids fail it while trained centroids pass —
i.e. the gate now certifies the training.
"""

import numpy as np

from stellar_ledger_data_indexer_spark.functions.similarity import (
    cosine_topk, cosine_topk_ivf, train_ivf_centroids)
from stellar_ledger_data_indexer_spark.plans.queries import \
    _clustered_corpus

SF = "/root/testdata/sf0.01"


def _recall_at_10(spark, corpus, qv, **ivf_kw):
    brute = {r["vec_id"] for r in
             cosine_topk(corpus, qv, k=10).select("vec_id").collect()}
    got = {r["vec_id"] for r in
           cosine_topk_ivf(corpus, qv, k=10, **ivf_kw)
           .select("vec_id").collect()}
    return len(brute & got)


def test_trained_vs_random_ivf_recall(spark):
    """The separation claim itself: at n_probe=1 of 8 cells on the
    clustered corpus, the trained quantizer recovers the full
    brute-force top-10 while the seeded-random one measurably cannot
    (the query's cluster straddles a random cell boundary, and the
    members on the far side are unreachable at n_probe=1)."""
    corpus, qv, cents = _clustered_corpus(spark, SF)
    trained = _recall_at_10(spark, corpus, qv, n_probe=1, centroids=cents)
    random_ = _recall_at_10(spark, corpus, qv, n_probe=1, n_centroids=8)
    assert trained == 10
    assert random_ < 10          # the same gate, failed
    assert random_ < trained


def test_train_ivf_centroids_deterministic_and_clustered(spark):
    """Training is deterministic (hash-ranked sample, seeded init,
    fixed iterations) and actually finds the 8 planted directions:
    every trained centroid sits within cos >= 0.9 of exactly one
    anchor-dominated cluster mean, and no two centroids collapse onto
    the same cluster."""
    corpus, qv, cents = _clustered_corpus(spark, SF)
    again = train_ivf_centroids(corpus, dim=len(qv), n_centroids=8,
                                seed=42, sample_size=4096)
    assert np.array_equal(cents, again)
    rows = corpus.collect()
    by_c: dict[int, list[np.ndarray]] = {}
    for r in rows:
        v = np.asarray(r["embedding"], dtype="float64")
        by_c.setdefault(int(r["vec_id"]) % 8, []).append(
            v / np.linalg.norm(v))
    means = np.stack([np.mean(by_c[c], axis=0) for c in range(8)])
    means /= np.linalg.norm(means, axis=1, keepdims=True)
    cn = cents.astype("float64")
    cn /= np.linalg.norm(cn, axis=1, keepdims=True)
    sims = cn @ means.T                     # centroid × cluster-mean
    best = sims.argmax(axis=1)
    assert sorted(best.tolist()) == list(range(8))   # bijective cover
    assert (sims.max(axis=1) >= 0.9).all()


def test_train_ivf_centroids_masks_bad_rows(spark):
    """Null / ragged sample rows are dropped, not crashed on, and too
    few valid rows is a loud error."""
    import pytest
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, None), (3, [1.0, 2.0, 3.0]), (4, [0.0, 1.0]),
         (5, [0.9, 0.1])],
        "vec_id long, embedding array<double>")
    c = train_ivf_centroids(df, dim=2, n_centroids=2, sample_size=16)
    assert c.shape == (2, 2)
    with pytest.raises(ValueError, match="valid sample vectors"):
        train_ivf_centroids(df, dim=2, n_centroids=4, sample_size=16)
