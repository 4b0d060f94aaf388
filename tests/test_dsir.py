"""DSIR importance resampling: reference parity, selection semantics,
determinism and partition invariance."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

DIM = 1 << 12


def _corpus(tmp_path, n_target_like: int = 6, n_junk: int = 10):
    """Docs 0..n_target_like-1 share the target's vocabulary; the rest
    are junk from a disjoint vocabulary."""
    rng = np.random.default_rng(7)
    tvocab = ["science", "method", "observed", "result", "theory",
              "measure", "careful", "evidence"]
    jvocab = ["zzz", "buy", "now", "click", "offer", "free", "deal"]
    rows = []
    for i in range(n_target_like):
        rows.append((i, " ".join(rng.choice(tvocab, 12))))
    for i in range(n_junk):
        rows.append((n_target_like + i, " ".join(rng.choice(jvocab, 12))))
    df = pd.DataFrame(rows, columns=["doc_id", "text"])
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "documents.parquet"))
    target = [" ".join(rng.choice(tvocab, 12)) for _ in range(5)]
    return df, target


def _ref_scores(df, target, dim=DIM):
    from olx_ray.pipelines.dsir import dsir_logratio, target_ngram_counts
    from olx_ray.pipelines.scoring import _hashed_features

    q = target_ngram_counts(df["text"].tolist(), dim)
    p = target_ngram_counts(target, dim)
    lr = dsir_logratio(p, q)
    feat, offsets = _hashed_features(df["text"].tolist(), dim)
    out = []
    for i in range(len(df)):
        seg = feat[offsets[i]:offsets[i + 1]]
        out.append(lr[seg].sum() if len(seg) else 0.0)
    return np.array(out)


def test_dsir_scores_match_reference(ray_session, tmp_path):
    from olx_ray.pipelines.dsir import (dsir_logratio, dsir_scores,
                                        hashed_ngram_counts,
                                        target_ngram_counts)

    df, target = _corpus(tmp_path)
    sf = str(tmp_path)
    # distributed corpus counts == driver-side bincount over all texts
    q_dist = hashed_ngram_counts(sf, DIM)
    q_ref = target_ngram_counts(df["text"].tolist(), DIM)
    assert (q_dist == q_ref).all()

    p = target_ngram_counts(target, DIM)
    got = dsir_scores(sf, dsir_logratio(p, q_ref)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    want = _ref_scores(df, target)
    assert np.allclose(got["log_weight"].to_numpy(), want, atol=1e-9)
    assert (got["n_feats"] > 0).all()


def test_dsir_select_prefers_target_like(ray_session, tmp_path):
    from olx_ray.pipelines.dsir import dsir_select

    df, target = _corpus(tmp_path, n_target_like=6, n_junk=10)
    sf = str(tmp_path)
    # top-k variant: the 4 best must all be target-like (ids 0..5)
    top = dsir_select(sf, target, k=4, dim=DIM, gumbel=False).to_pandas()
    assert len(top) == 4
    assert set(top["doc_id"]) <= set(range(6))
    # gumbel resampling still overwhelmingly prefers target-like docs
    # (importance weights differ by many nats)
    g = dsir_select(sf, target, k=4, dim=DIM, gumbel=True).to_pandas()
    assert len(g) == 4
    assert set(g["doc_id"]) <= set(range(6))


def test_dsir_select_deterministic_and_partition_invariant(
        ray_session, tmp_path):
    import ray.data as rd

    from olx_ray.pipelines.dsir import dsir_select

    df, target = _corpus(tmp_path)
    sf = str(tmp_path)
    a = dsir_select(sf, target, k=5, dim=DIM).to_pandas()
    b = dsir_select(sf, target, k=5, dim=DIM).to_pandas()
    pd.testing.assert_frame_equal(a, b)
    # same answer when the corpus arrives in many tiny blocks
    ds = rd.read_parquet(f"{sf}/documents.parquet",
                         columns=["doc_id", "text"]).repartition(7)
    c = dsir_select(ds, target, k=5, dim=DIM).to_pandas()
    pd.testing.assert_frame_equal(a, c)
    d = dsir_select(sf, target, k=5, dim=DIM, seed=99).to_pandas()
    assert len(d) == 5


def test_dsir_gumbel_draw_matches_reference_per_seed(ray_session, tmp_path):
    """With identical texts the log-weights cancel, so selection is
    decided purely by the seeded Gumbel draw — pin it (and its seed
    sensitivity) against a driver-side recomputation."""
    from olx_ray.functions.hashing import mix64
    from olx_ray.pipelines.dsir import dsir_select

    text = "science method observed result"
    ids = np.arange(12, dtype=np.int64)
    pq.write_table(pa.table({
        "doc_id": pa.array(ids),
        "text": pa.array([text] * 12, pa.string()),
    }), str(tmp_path / "documents.parquet"))

    def want(seed):
        u = (mix64(ids, seed).astype(np.float64) + 1.0) / (2.0 ** 64 + 2)
        g = -np.log(-np.log(u))
        return set(ids[np.argsort(-g, kind="stable")][:3])

    picks = {}
    for seed in (0, 5, 9):
        sel = dsir_select(str(tmp_path), [text], k=3, dim=DIM,
                          seed=seed).to_pandas()
        assert set(sel["doc_id"]) == want(seed)
        picks[seed] = frozenset(sel["doc_id"])
    # the seed genuinely reaches the draw: not all three coincide
    assert len(set(picks.values())) > 1


def test_dsir_segment_sums_trailing_empty():
    """An empty doc at the END of a batch must not truncate the
    preceding doc's sum (reduceat clamp bug, review-found)."""
    from olx_ray.pipelines.dsir import _segment_sums

    vals = np.array([1.0, 2.0, 4.0])
    assert _segment_sums(vals, np.array([0, 3, 3])).tolist() == [7.0, 0.0]
    assert _segment_sums(vals, np.array([0, 0, 3])).tolist() == [0.0, 7.0]
    assert _segment_sums(np.zeros(0), np.array([0, 0, 0])).tolist() == [0.0, 0.0]
    assert _segment_sums(vals, np.array([0, 1, 1, 3])).tolist() == [1.0, 0.0, 6.0]


def test_dsir_logratio_validates_dim():
    from olx_ray.pipelines.dsir import dsir_logratio

    with pytest.raises(ValueError, match="dim mismatch"):
        dsir_logratio(np.zeros(4), np.zeros(8))


def test_dsir_empty_docs_any_position(ray_session, tmp_path):
    """Empty docs score 0 wherever they sit — including LAST in the
    batch, where the old reduceat clamp truncated the preceding doc."""
    from olx_ray.pipelines.dsir import dsir_scores
    from olx_ray.pipelines.scoring import _hashed_features

    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["", "science method", ""], pa.string()),
    }), str(tmp_path / "documents.parquet"))
    rng = np.random.default_rng(0)
    lr = rng.standard_normal(DIM)            # NONZERO ratios everywhere
    got = dsir_scores(str(tmp_path), lr).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    feat, _ = _hashed_features(["science method"], DIM)
    assert got.loc[0, "n_feats"] == 0 and got.loc[0, "log_weight"] == 0.0
    assert got.loc[2, "n_feats"] == 0 and got.loc[2, "log_weight"] == 0.0
    assert got.loc[1, "n_feats"] == 3        # 2 unigrams + 1 bigram
    assert np.isclose(got.loc[1, "log_weight"], lr[feat].sum(), atol=1e-12)
