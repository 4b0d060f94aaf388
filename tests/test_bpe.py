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


def test_bpe_vocab_and_tokenizer_consistency(ray_session):
    """bpe_vocab: deterministic ids, full alphabet + merge symbols;
    tokenize_bpe: len(ids) equals BOTH its own n_bpe_tokens column and
    the counting path encode_bpe (shared _merge_word kernel)."""
    from olx_ray.pipelines.bpe import (PAD_ID, UNK_ID, bpe_vocab,
                                       encode_bpe, tokenize_bpe, train_bpe)

    merges = train_bpe(SF, n_merges=30)
    v1 = bpe_vocab(SF, merges)
    v2 = bpe_vocab(SF, merges)
    assert v1 == v2
    assert v1["<pad>"] == PAD_ID and v1["<unk>"] == UNK_ID
    assert "</w>" in v1
    for a, b in merges:
        assert a + b in v1
    ids = sorted(v1.values())
    assert ids == list(range(len(v1)))        # dense, no gaps

    toks = tokenize_bpe(SF, merges, v1).to_pandas()
    counts = encode_bpe(SF, merges).to_pandas()
    assert (toks["doc_id"] == counts["doc_id"]).all()
    assert (toks["ids"].str.len() == toks["n_bpe_tokens"]).all()
    assert (toks["n_bpe_tokens"] == counts["n_bpe_tokens"]).all()
    # ids are real vocab ids; the fixture corpus has no unknown chars
    flat = np.concatenate([np.asarray(x) for x in toks["ids"] if len(x)])
    assert flat.min() >= 2 and flat.max() < len(v1)


def test_tokenizer_unknown_chars_map_to_unk(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from olx_ray.pipelines.bpe import UNK_ID, bpe_vocab, tokenize_bpe

    pq.write_table(pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "text": pa.array(["ab 🦆🦆"], pa.string())}),
        str(tmp_path / "documents.parquet"))
    # vocab WITHOUT the duck: built from a corpus that never saw it
    vocab = bpe_vocab(SF, [])
    out = tokenize_bpe(str(tmp_path), [], vocab).to_pandas()
    ids = np.asarray(out["ids"].iloc[0])
    eow = vocab["</w>"]
    # "ab" → a, b, </w>; "🦆🦆" → unk, unk, </w>
    assert ids.tolist() == [vocab["a"], vocab["b"], eow,
                            UNK_ID, UNK_ID, eow]


def test_write_training_shards_roundtrip(ray_session, tmp_path):
    """The end product: every doc's id sequence recoverable from the
    shards at its recorded (pack, start) slice, truncated at seq_len;
    every doc exactly once; rows exactly seq_len wide, tail-padded;
    rerun resumes (all shards skipped, rows identical)."""
    from olx_ray.pipelines.bpe import PAD_ID, bpe_vocab, tokenize_bpe, train_bpe
    from olx_ray.pipelines.corpus import write_training_shards
    from olx_ray.pipelines.export import read_shards

    seq_len = 64                 # small → forces real packing + trunc
    merges = train_bpe(SF, n_merges=20)
    vocab = bpe_vocab(SF, merges)
    out_dir = str(tmp_path / "shards")
    rep = write_training_shards(SF, merges, out_dir, seq_len=seq_len,
                                vocab=vocab)
    assert rep["written"] and not rep["skipped"]

    shards = read_shards(out_dir).to_pandas()
    toks = tokenize_bpe(SF, merges, vocab).to_pandas() \
        .set_index("doc_id")
    seen = []
    for r in shards.itertuples(index=False):
        row = np.asarray(r.input_ids)
        assert len(row) == seq_len
        for j, did in enumerate(r.doc_ids):
            want = np.asarray(toks.loc[did, "ids"])[:seq_len]
            got = row[r.doc_starts[j]:r.doc_starts[j] + len(want)]
            assert np.array_equal(got, want), did
            seen.append(did)
        assert r.n_real <= seq_len
        assert (row[r.n_real:] == PAD_ID).all()   # contiguous tail pad
    assert sorted(seen) == sorted(toks.index)     # every doc once

    rep2 = write_training_shards(SF, merges, out_dir, seq_len=seq_len,
                                 vocab=vocab)
    assert not rep2["written"] and len(rep2["skipped"]) == len(rep["written"])
    again = read_shards(out_dir).to_pandas()
    assert len(again) == len(shards)
