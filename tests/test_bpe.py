"""pipelines/bpe.py — BPE training on the word-frequency table:
merge-list parity with an independent reference implementation,
driver/distributed strategy agreement, and the encode side."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def _reference_bpe(word_counts: dict, n_merges: int):
    """Independent plain-Python BPE (Sennrich formulation), same
    tie-break: count desc, then pair lexicographic asc."""
    vocab = {tuple(w) + ("</w>",): c for w, c in word_counts.items()}
    merges = []
    for _ in range(n_merges):
        pairs = {}
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] = \
                    pairs.get((syms[i], syms[i + 1]), 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        new_vocab = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def _fixture_corpus(tmp_path):
    import pyarrow.parquet as pq

    texts = ["the cat sat on the mat", "the cat ate the rat",
             "a mat and a hat for the cat", "rats and cats and mats",
             "low lower lowest", "new newer newest wider wide"]
    t = pa.table({"doc_id": pa.array(range(1, len(texts) + 1), pa.int64()),
                  "text": texts})
    d = tmp_path / "sf_bpe"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))
    wc = {}
    for s in texts:
        for w in s.split():
            wc[w] = wc.get(w, 0) + 1
    return str(d), wc


def test_train_bpe_matches_reference(ray_session, tmp_path):
    from olx_ray.pipelines.bpe import train_bpe

    sf, wc = _fixture_corpus(tmp_path)
    want = _reference_bpe(wc, 25)
    got = train_bpe(sf, 25)
    assert got == want


def test_train_bpe_strategies_agree(ray_session, tmp_path):
    from olx_ray.pipelines.bpe import train_bpe

    sf, wc = _fixture_corpus(tmp_path)
    a = train_bpe(sf, 8, strategy="driver")
    b = train_bpe(sf, 8, strategy="distributed")
    assert a == b == _reference_bpe(wc, 8)


def test_encode_bpe_counts_shrink_with_merges(ray_session, tmp_path):
    from olx_ray.pipelines.bpe import BpeEncoder, train_bpe, encode_bpe

    sf, wc = _fixture_corpus(tmp_path)
    merges = train_bpe(sf, 40)
    none = encode_bpe(sf, []).to_pandas()
    full = encode_bpe(sf, merges).to_pandas()
    # zero merges → chars+1 per word; merges only shrink counts
    docs = pd.read_parquet(f"{sf}/documents.parquet")
    for _, row in docs.iterrows():
        ws = row["text"].split()
        want0 = sum(len(w) + 1 for w in ws)
        n0 = int(none.loc[none["doc_id"] == row["doc_id"],
                          "n_bpe_tokens"].iloc[0])
        nf = int(full.loc[full["doc_id"] == row["doc_id"],
                          "n_bpe_tokens"].iloc[0])
        assert n0 == want0 and nf < n0
    # a fully-merged frequent word costs exactly 1 token
    enc = BpeEncoder(merges)
    assert enc._encode_len("the") == 1


def test_train_bpe_on_fixture_sf(ray_session):
    """Runs on the real documents table; merges are deterministic."""
    from olx_ray.pipelines.bpe import train_bpe

    a = train_bpe(SF, 10)
    b = train_bpe(SF, 10)
    assert a == b and len(a) == 10
