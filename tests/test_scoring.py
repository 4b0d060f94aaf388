"""pipelines/scoring.py — the fastText-style hashed linear quality
classifier: deterministic training, held-out separation, and exact
parity between the distributed actor-pool scorer and a driver-side
reference over the same weights."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

DIM = 1 << 14


def _clean(i: int) -> str:
    vocab = ["the", "quick", "brown", "fox", "jumps", "over", "lazy",
             "dog", "market", "report", "shows", "steady", "growth",
             "in", "regional", "sales", "this", "quarter", "with"]
    rng = np.random.default_rng(i)
    return " ".join(rng.choice(vocab, 12))


def _junk(i: int) -> str:
    rng = np.random.default_rng(1000 + i)
    toks = ["zzqx", "jjkk", "qqq", "xxzz", "kkjj", "zzz", "qxqx"]
    return " ".join(rng.choice(toks, 12))


@pytest.fixture(scope="module")
def model():
    from olx_ray.pipelines.scoring import train_quality_model

    pos = [_clean(i) for i in range(200)]
    neg = [_junk(i) for i in range(200)]
    return train_quality_model(pos, neg, dim=DIM)


def test_training_is_deterministic(model):
    from olx_ray.pipelines.scoring import train_quality_model

    again = train_quality_model([_clean(i) for i in range(200)],
                                [_junk(i) for i in range(200)], dim=DIM)
    np.testing.assert_array_equal(model, again)


def test_heldout_separation(model):
    from olx_ray.pipelines.scoring import _hashed_features, _pool

    held_pos = [_clean(i) for i in range(500, 560)]
    held_neg = [_junk(i) for i in range(500, 560)]
    feat, off = _hashed_features(held_pos + held_neg, DIM)
    z = _pool(feat, off, model[:DIM]) + model[DIM]
    s = 1.0 / (1.0 + np.exp(-z))
    assert s[:60].mean() > 0.9 and s[60:].mean() < 0.1


def test_distributed_scoring_matches_driver_reference(ray_session, model):
    import ray.data as rd

    from olx_ray.pipelines.scoring import (_hashed_features, _pool,
                                           score_quality_model)

    texts = ([_clean(i) for i in range(40)] + [_junk(i) for i in range(40)]
             + ["", "   ", "one"])
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts})
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)) \
        .repartition(5)
    out = score_quality_model(ds, model, batch_size=16).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    feat, off = _hashed_features(texts, DIM)
    z = _pool(feat, off, model[:DIM]) + model[DIM]
    want = np.round(1.0 / (1.0 + np.exp(-np.clip(z, -35.0, 35.0))), 6)
    np.testing.assert_allclose(out["model_score"].to_numpy(), want,
                               atol=1e-12)
    assert np.isfinite(out["model_score"]).all()
