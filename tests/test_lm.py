"""pipelines/lm.py — bigram-LM perplexity filtering: exact parity
with a hand-computed reference, in-domain vs junk separation, and the
short-doc edge."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _write(tmp_path, texts, name="sf_lm"):
    import pyarrow.parquet as pq

    d = tmp_path / name
    d.mkdir()
    t = pa.table({"doc_id": pa.array(range(1, len(texts) + 1), pa.int64()),
                  "text": texts})
    pq.write_table(t, str(d / "documents.parquet"))
    return str(d)


def _reference_ppl(train_texts, score_text, vocab_size=8192, k=0.5,
                   min_count=1):
    # vocab: count desc, word asc; ids from 1; 0 = unk
    wc = {}
    for t in train_texts:
        for w in t.split():
            wc[w] = wc.get(w, 0) + 1
    ordered = sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))
    vocab = {w: i + 1 for i, (w, _) in enumerate(ordered[:vocab_size - 1])}
    V = len(vocab) + 1
    bi, uni = {}, {}
    for t in train_texts:
        ids = [vocab.get(w, 0) for w in t.split()]
        for p, w in zip(ids, ids[1:]):
            bi[(p, w)] = bi.get((p, w), 0) + 1
            uni[p] = uni.get(p, 0) + 1
    bi = {pw: c for pw, c in bi.items() if c >= min_count}
    ids = [vocab.get(w, 0) for w in score_text.split()]
    lps = [np.log((bi.get((p, w), 0) + k) / (uni.get(p, 0) + k * V))
           for p, w in zip(ids, ids[1:])]
    return float(np.exp(-np.mean(lps))) if lps else 1.0


def test_perplexity_matches_reference(ray_session, tmp_path):
    from olx_ray.pipelines.lm import perplexity_score, train_bigram_lm

    texts = ["the cat sat on the mat", "the dog sat on the rug",
             "a cat and a dog", "the mat the rug the cat", "x"]
    sf = _write(tmp_path, texts)
    model = train_bigram_lm(sf, min_count=1)
    got = perplexity_score(sf, model).to_pandas()
    for i, t in enumerate(texts, start=1):
        want = round(_reference_ppl(texts, t, min_count=1), 4)
        g = float(got.loc[got["doc_id"] == i, "perplexity"].iloc[0])
        assert abs(g - want) < 1e-3, (i, g, want)
    # the 1-token doc scores the neutral 1.0
    assert float(got.loc[got["doc_id"] == 5, "perplexity"].iloc[0]) == 1.0


def test_junk_scores_higher_than_in_domain(ray_session, tmp_path):
    from olx_ray.pipelines.lm import perplexity_score, train_bigram_lm

    # STRUCTURED in-domain text (repeated phrases → concentrated
    # bigrams) beats a uniform-random fixture, where every bigram is
    # chance-level and junk can't separate
    phrases = [f"the {a} {b} shows steady growth this quarter"
               for a in ("regional", "national", "quarterly", "annual")
               for b in ("market", "sales", "revenue", "export")]
    rng = np.random.default_rng(4)
    clean = [" ".join(rng.choice(phrases, 2)) for _ in range(60)]
    sf = _write(tmp_path, clean, "sf_train")
    model = train_bigram_lm(sf, min_count=1)

    mixed = [str(rng.choice(phrases))] * 5 + \
            ["zzqx jjkk qqq xxzz kkjj zzz qxqx zzqx jjkk qqq xxzz kkjj"]
    sf2 = _write(tmp_path, mixed, "sf_score")
    got = perplexity_score(sf2, model).to_pandas()
    clean_ppl = got.loc[got["doc_id"] <= 5, "perplexity"].mean()
    junk_ppl = float(got.loc[got["doc_id"] == 6, "perplexity"].iloc[0])
    assert junk_ppl > 3 * clean_ppl
