"""Similarity search + near-dup pipelines: ANN recall vs brute force,
minhash candidate soundness, simhash banding completeness."""

import numpy as np

from olx_ray.pipelines.dedup import (MinHasher, ngram_jaccard, shingles,
                                     simhash_signatures)
from olx_ray.pipelines.similarity import knn_bruteforce, knn_lsh

SF = "/root/testdata/sf0.001"


def test_knn_lsh_recall(ray_session):
    bf = knn_bruteforce(SF).to_pandas()
    lsh = knn_lsh(SF).to_pandas()
    bf_set = set(zip(bf.query_id, bf.neighbor_id))
    lsh_set = set(zip(lsh.query_id, lsh.neighbor_id))
    assert len(bf_set) == 100  # 10 queries × k=10
    recall = len(bf_set & lsh_set) / len(bf_set)
    assert recall >= 0.7, f"ANN recall {recall}"


def test_knn_bruteforce_deterministic(ray_session):
    a = knn_bruteforce(SF).to_pandas()
    b = knn_bruteforce(SF).to_pandas()
    assert a.equals(b)


def test_minhash_similarity_estimate():
    """MinHash signature agreement approximates exact Jaccard."""
    mh = MinHasher()
    a = "the quick brown fox jumps over the lazy dog again and again today"
    b = "the quick brown fox jumps over the lazy cat again and again today"
    sa, sb = mh.signature(shingles(a)), mh.signature(shingles(b))
    est = float((sa == sb).mean())
    true = ngram_jaccard(a, b)
    assert abs(est - true) < 0.25
    # identical docs → identical signatures
    assert (mh.signature(shingles(a)) == sa).all()


def test_simhash_close_docs_close_hashes(ray_session):
    sigs = simhash_signatures(SF).to_pandas()
    assert len(sigs) == 500
    assert sigs["simhash"].nunique() > 490  # near-unique for distinct docs


def test_shingles_edges():
    assert shingles("") == set()
    assert len(shingles("one two")) == 1       # shorter than n
    assert len(shingles("a b c d")) == 2
