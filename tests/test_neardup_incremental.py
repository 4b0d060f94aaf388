"""dedup.neardup_incremental — the fuzzy ingestion gate: component
semantics vs an in-memory shingle+union-find reference, id-space
packing, verify-strategy agreement, empty-edge path, idempotence."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _mk(ids, texts):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "doc_id": pa.array(np.asarray(ids, np.int64), pa.int64()),
        "text": pa.array(texts, pa.string())}))


BASE = ("the quick brown fox jumps over the lazy dog while the cat "
        "watches from the warm windowsill in the afternoon sun")
NEAR = ("the quick brown fox jumps over the lazy dog while the cat "
        "watches from the warm windowsill in the evening sun")
NEAR2 = ("the quick brown fox jumps over the lazy dog while the cat "
         "watches from the cold windowsill in the afternoon sun")
OTHER = ("completely different content about distributed systems and "
         "columnar formats with arrow batches flowing through object "
         "stores under backpressure every single day")
OTHER_NEAR = ("completely different content about distributed systems "
              "and columnar formats with arrow batches flowing through "
              "object stores under backpressure every single night")


def _reference_gate(corpus_df, new_df, threshold=0.6):
    """Independent oracle: exact all-pairs Jaccard + union-find over
    corpus∪new; drop new docs whose component holds a corpus doc or a
    smaller-id new doc."""
    from olx_ray.pipelines.dedup import _unionfind_pairs, ngram_jaccard

    rows = [("c", i, t) for i, t in
            zip(corpus_df["doc_id"], corpus_df["text"])] + \
           [("n", i, t) for i, t in zip(new_df["doc_id"], new_df["text"])]
    pairs = []
    for x in range(len(rows)):
        for y in range(x + 1, len(rows)):
            (sx, ix, tx), (sy, iy, ty) = rows[x], rows[y]
            if sx == "c" and sy == "c":
                continue
            if round(ngram_jaccard(tx, ty), 6) >= threshold:
                a = ix * 2 + (sx == "n")
                b = iy * 2 + (sy == "n")
                pairs.append((min(a, b), max(a, b)))
    g_of, _ = _unionfind_pairs(pd.DataFrame(pairs, columns=["a", "b"])
                               if pairs else
                               pd.DataFrame({"a": [], "b": []}), "a", "b")
    comp: dict[int, list[int]] = {}
    for node, lab in g_of.items():
        comp.setdefault(lab, []).append(node)
    drop = set()
    for members in comp.values():
        news = sorted(m for m in members if m % 2 == 1)
        if not news:
            continue
        if any(m % 2 == 0 for m in members):
            drop.update(news)
        else:
            drop.update(news[1:])
    keep = [i for i in new_df["doc_id"] if i * 2 + 1 not in drop]
    return sorted(keep)


def test_gate_semantics_vs_reference(ray_session):
    from olx_ray.pipelines.dedup import neardup_incremental

    corpus_df = pd.DataFrame({"doc_id": [3, 7], "text": [BASE, OTHER]})
    # id 3 ALSO used on the new side: packing must keep spaces disjoint
    new_df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": [NEAR,         # near corpus BASE → drop
                 OTHER_NEAR,   # near corpus OTHER → drop
                 NEAR2,        # near BASE too → drop (component w/ corpus)
                 "entirely novel text about winnowing fingerprints and "
                 "rolling hashes across document boundaries in batches",
                 "entirely novel text about winnowing fingerprints and "
                 "rolling hashes across document boundaries in batcher"]})
    # 4 and 5 are near each other only → keep min (4)
    got = neardup_incremental(_mk(corpus_df["doc_id"], corpus_df["text"]),
                              _mk(new_df["doc_id"], new_df["text"])) \
        .to_pandas()
    want = _reference_gate(corpus_df, new_df)
    assert list(got["doc_id"]) == want
    assert 4 in want and all(x not in want for x in (1, 2, 3, 5))
    assert list(got.columns) == ["doc_id", "text"]


def test_gate_strategy_agreement_and_idempotence(ray_session):
    from olx_ray.pipelines.dedup import neardup_incremental

    rng = np.random.default_rng(11)
    vocab = np.array(["alpha", "beta", "gamma", "delta", "epsilon",
                      "zeta", "eta", "theta", "iota", "kappa"])
    base_docs = [" ".join(rng.choice(vocab, 30)) for _ in range(20)]
    corpus = _mk(np.arange(20), base_docs)
    new_texts = []
    for i in range(15):
        if i < 5:      # mutate a corpus doc lightly → near-dup
            w = base_docs[i].split()
            w[3] = "mutated"
            new_texts.append(" ".join(w))
        else:
            new_texts.append(" ".join(rng.choice(vocab, 30)))
    new = _mk(np.arange(100, 115), new_texts)

    a = neardup_incremental(corpus, new).to_pandas()
    b = neardup_incremental(corpus, new,
                            broadcast_max_candidates=0).to_pandas()
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))
    # the five mutated docs must be gone
    assert set(a["doc_id"]).isdisjoint(set(range(100, 105)))
    # idempotence: survivors re-gated against corpus∪survivors pass
    surv = _mk(a["doc_id"].to_numpy(), a["text"].tolist())
    again = neardup_incremental(corpus, surv).to_pandas()
    assert again.reset_index(drop=True).equals(
        a.reset_index(drop=True))


def test_gate_no_near_dups_passthrough(ray_session):
    from olx_ray.pipelines.dedup import neardup_incremental

    corpus = _mk([0], [BASE])
    new = _mk([10, 11], [OTHER,
                         "yet another unrelated string with plenty of "
                         "unique words nobody else uses anywhere today"])
    got = neardup_incremental(corpus, new).to_pandas()
    assert list(got["doc_id"]) == [10, 11]
