"""SemDeDup: brute-force parity, indexed-path equality, invariants."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _load_normalized(sf_dir):
    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy().astype(np.int64)
    m = np.vstack(t["embedding"].to_pylist()).astype(np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    return ids, m


def _ref_semdedup(ids, vecs, cents, eps, keep="hard"):
    """In-memory reference: the paper rule, one python loop per member."""
    cos = vecs @ cents.T
    cl = cos.argmax(axis=1)
    cent_cos = cos[np.arange(len(ids)), cl]
    keep_mask = np.zeros(len(ids), dtype=bool)
    for c in np.unique(cl):
        idx = np.where(cl == c)[0]
        key = cent_cos[idx] if keep == "hard" else -cent_cos[idx]
        order = idx[np.lexsort((ids[idx], key))]
        for pos, i in enumerate(order):
            prior = order[:pos]
            mx = (vecs[prior] @ vecs[i]).max() if len(prior) else -np.inf
            keep_mask[i] = mx < eps
    return cl, cent_cos, keep_mask


def test_semdedup_matches_bruteforce(ray_session):
    from olx_ray.pipelines.semdedup import semantic_dedup
    from olx_ray.pipelines.similarity import _train_centroids

    # synthetic embeddings are near-uniform: use a low eps so the
    # within-cluster rule actually fires (pairs exist at 0.45 — see
    # embedding_neardup tests)
    eps = 0.35
    cents = _train_centroids(SF, 8, 4096)
    got = semantic_dedup(SF, eps=eps, n_clusters=8, cents=cents).to_pandas()
    ids, vecs = _load_normalized(SF)
    cl, cent_cos, keep_mask = _ref_semdedup(ids, vecs, cents, eps)
    ref = pd.DataFrame({"vec_id": ids, "cluster": cl.astype(np.int32),
                        "cent_cos": cent_cos, "keep": keep_mask}) \
        .sort_values("vec_id").reset_index(drop=True)
    assert got["keep"].sum() < len(got)          # the rule fired
    assert list(got["vec_id"]) == list(ref["vec_id"])
    assert list(got["cluster"]) == list(ref["cluster"])
    assert np.allclose(got["cent_cos"], ref["cent_cos"], atol=1e-12)
    assert list(got["keep"]) == list(ref["keep"])


def test_semdedup_indexed_equals_shuffle(ray_session, tmp_root):
    from olx_ray.pipelines.semdedup import (semantic_dedup,
                                            semantic_dedup_indexed)
    from olx_ray.pipelines.similarity import build_ivf_layout

    idx_dir = f"{tmp_root}/semdedup_ivf"
    build_ivf_layout(SF, idx_dir, n_cells=8, train_rows=4096)
    cents = np.load(f"{idx_dir}/centroids.npy")
    a = semantic_dedup(SF, eps=0.35, cents=cents).to_pandas()
    b = semantic_dedup_indexed(idx_dir, eps=0.35).to_pandas()
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  b.reset_index(drop=True))


def _planted_parquet(path):
    """Two well-separated directions; an exact duplicate pair planted
    in each, plus a lone orthogonal-ish singleton per direction."""
    rng = np.random.RandomState(3)
    d = 8
    a = np.zeros(d); a[0] = 1.0
    b = np.zeros(d); b[1] = 1.0
    rows = [a, a, a + 0.02 * rng.standard_normal(d),
            b, b, b + 0.02 * rng.standard_normal(d)]
    m = np.vstack(rows)
    pq.write_table(pa.table({
        "vec_id": pa.array(np.arange(len(m), dtype=np.int64)),
        "embedding": pa.array([r.astype(np.float32) for r in m],
                              pa.list_(pa.float32())),
    }), path)
    return m / np.linalg.norm(m, axis=1, keepdims=True)


def test_semdedup_planted_dups_and_keep_modes(ray_session, tmp_path):
    from olx_ray.pipelines.semdedup import semantic_dedup

    path = str(tmp_path / "planted")
    import os

    os.makedirs(path)
    _planted_parquet(f"{path}/embeddings.parquet")
    cents = np.stack([np.eye(8)[0], np.eye(8)[1]])
    hard = semantic_dedup(path, eps=0.95, n_clusters=2,
                          cents=cents, keep="hard").to_pandas()
    easy = semantic_dedup(path, eps=0.95, n_clusters=2,
                          cents=cents, keep="easy").to_pandas()
    # each direction: 3 members, all pairwise-similar above eps → one
    # survivor each, total 2 kept
    assert hard["keep"].sum() == 2
    assert easy["keep"].sum() == 2
    # hard keeps the LEAST centroid-similar member (the jittered one),
    # easy the MOST (an exact-duplicate, lowest vec_id wins the tie)
    hk = set(hard.loc[hard["keep"], "vec_id"])
    ek = set(easy.loc[easy["keep"], "vec_id"])
    assert hk == {2, 5}
    assert ek == {0, 3}


def test_semdedup_invariants_and_determinism(ray_session):
    from olx_ray.pipelines.semdedup import semantic_dedup

    a = semantic_dedup(SF, eps=0.35, n_clusters=8).to_pandas()
    b = semantic_dedup(SF, eps=0.35, n_clusters=8).to_pandas()
    pd.testing.assert_frame_equal(a, b)
    ids, _ = _load_normalized(SF)
    assert sorted(a["vec_id"]) == sorted(ids)           # every row once
    assert a["vec_id"].is_unique
    with pytest.raises(ValueError):
        semantic_dedup(SF, keep="random")


def test_semdedup_indexed_refuses_incomplete_layout(ray_session, tmp_path):
    """A layout directory without the completeness marker (crashed
    build) must fail loud, not silently drop uncommitted cells."""
    import os

    from olx_ray.pipelines.semdedup import semantic_dedup_indexed

    broken = str(tmp_path / "broken_ivf")
    os.makedirs(broken)
    np.save(f"{broken}/centroids.npy", np.eye(4))   # build crashed here
    with pytest.raises(ValueError, match="IVF_MANIFEST"):
        semantic_dedup_indexed(broken, eps=0.5)


def test_gopher_rules_empty_batch_kernel():
    """The GopherRules kernel itself (used directly by ingest's gate)
    returns a typed empty frame on an empty batch."""
    from olx_ray.pipelines.text import GopherRules

    empty = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                          "text": pd.Series(dtype="object")})
    out = GopherRules()(empty)
    assert len(out) == 0
    assert list(out.columns) == [
        "doc_id", "n_words", "mean_word_len", "alpha_ratio",
        "symbol_ratio", "bullet_frac", "ellipsis_frac", "stop_hits",
        "fail_mask", "keep"]


def test_semantic_dedup_corpus_filters_docs(ray_session):
    from olx_ray.pipelines.semdedup import semantic_dedup, semantic_dedup_corpus
    from olx_ray.pipelines.similarity import _train_centroids

    cents = _train_centroids(SF, 8, 4096)
    mask = semantic_dedup(SF, eps=0.35, cents=cents).to_pandas()
    kept = semantic_dedup_corpus(SF, eps=0.35, cents=cents).to_pandas()
    want = sorted(mask.loc[mask["keep"], "vec_id"])
    assert list(kept["doc_id"]) == want
    assert kept["text"].notna().all()
    assert len(kept) < len(mask)               # something was dropped


def test_prune_ordered_matches_loop_reference_randomized():
    """Property: the column-chunked triangular kernel equals the
    per-row loop reference for random matrices, any chunk size."""
    from olx_ray.pipelines.semdedup import _prune_ordered

    rng = np.random.RandomState(11)
    for s, d in ((0, 4), (1, 4), (57, 8), (300, 16)):
        v = rng.standard_normal((s, d))
        if s:
            v /= np.linalg.norm(v, axis=1, keepdims=True)
        for eps in (0.2, 0.6, 0.95):
            for chunk in (1, 7, 64, 1000):
                got = _prune_ordered(v, eps, col_chunk=chunk)
                ref = np.zeros(s, dtype=bool)
                for i in range(s):
                    mx = (v[:i] @ v[i]).max() if i else -np.inf
                    ref[i] = mx < eps
                assert (got == ref).all(), (s, eps, chunk)


def test_semantic_dedup_corpus_noop_when_nothing_dropped(ray_session):
    """eps above the max cosine → zero dropped ids; the composed filter
    must return the whole corpus (used to KeyError on the zero-row
    dropped frame)."""
    from olx_ray.pipelines.semdedup import semantic_dedup_corpus
    from olx_ray.pipelines.similarity import _train_centroids

    cents = _train_centroids(SF, 8, 4096)
    kept = semantic_dedup_corpus(SF, eps=1.01, cents=cents).to_pandas()
    import duckdb
    n = duckdb.sql(f"SELECT count(*) FROM "
                   f"read_parquet('{SF}/documents.parquet')").fetchone()[0]
    assert len(kept) == n
