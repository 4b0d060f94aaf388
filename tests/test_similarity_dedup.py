"""Similarity search + near-dup pipelines: ANN recall vs brute force,
minhash candidate soundness, simhash banding completeness."""

import numpy as np
import pyarrow as pa
import pytest

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


def _col_sha(df, col):
    import hashlib

    return hashlib.sha256(
        ",".join(str(int(v)) for v in df[col]).encode()).hexdigest()[:16]


def test_simhash_signatures_vs_duckdb(ray_session):
    """Bit-for-bit signature parity with the independent DuckDB
    re-derivation (md5 token hashes + exact ±count bit sums — see
    SIMHASH_SIGS_SQL). Replaces the old self-pinned column hash: an
    external oracle instead of a self-derived one."""
    import duckdb

    from olx_ray.pipelines.dedup import SIMHASH_SIGS_SQL

    s = simhash_signatures(SF).to_pandas().reset_index(drop=True)
    assert len(s) == 500
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF}/documents.parquet')")
    want = con.sql(SIMHASH_SIGS_SQL).df()
    assert s["doc_id"].astype("int64").equals(want["doc_id"].astype("int64"))
    assert s["simhash"].astype("uint64").equals(
        want["simhash"].astype("uint64"))


def test_fingerprint_pinned_golden(ray_session):
    from olx_ray.pipelines.text import fingerprint

    f = fingerprint(SF).to_pandas()
    assert len(f) == 500
    assert _col_sha(f, "fingerprint") == "53bf8c3c78bd447c"


def test_embedding_lsh_recall_vs_exact(ray_session):
    """The approximate hyperplane-LSH path must recover (nearly) every
    exact cosine-≥τ pair and introduce none below τ (in-bucket verify
    is exact, so false positives are impossible by construction)."""
    from olx_ray.pipelines.dedup import (embedding_neardup_lsh,
                                         embedding_neardup_pairs)

    ex = embedding_neardup_pairs(SF).to_pandas()
    ap = embedding_neardup_lsh(SF).to_pandas()
    es = set(zip(ex.vec_a, ex.vec_b))
    aps = set(zip(ap.vec_a, ap.vec_b))
    assert len(es) > 0
    assert not (aps - es), "LSH produced a sub-threshold pair"
    assert len(es & aps) / len(es) >= 0.9


def test_embedding_neardup_pairs_quadratic_guard(ray_session):
    """The exact all-pairs entry is the ORACLE COMPANION: above
    max_rows it must fail loud toward embedding_neardup_lsh instead of
    silently starting an O(N²) scan; max_rows=None opts back in."""
    import pytest

    from olx_ray.pipelines.dedup import embedding_neardup_pairs

    with pytest.raises(ValueError, match="embedding_neardup_lsh"):
        embedding_neardup_pairs(SF, max_rows=1)
    # the guard reads footer metadata only — building the (lazy)
    # pipeline under the bound still works
    assert embedding_neardup_pairs(SF, max_rows=None).to_pandas() \
        .equals(embedding_neardup_pairs(SF).to_pandas())


def test_neardup_groups_invariants(ray_session):
    """Groups must be exactly the union-find closure of the verified
    pairs: both ends of every verified pair share a group, group_id is
    the min member, representative ⟺ doc_id == group_id, and
    group_size counts the members."""
    from olx_ray.pipelines.dedup import (dedup_keep_representatives,
                                         minhash_lsh_pairs, neardup_groups)

    pairs = minhash_lsh_pairs(SF).to_pandas()
    groups = neardup_groups(SF).to_pandas()
    gid = dict(zip(groups.doc_id, groups.group_id))
    for a, b in zip(pairs.doc_a, pairs.doc_b):
        assert gid[a] == gid[b], (a, b)
    assert (groups.group_id <= groups.doc_id).all()
    assert ((groups.doc_id == groups.group_id)
            == groups.is_representative).all()
    sizes = groups.groupby("group_id").size()
    for g, sub in groups.groupby("group_id"):
        assert (sub.group_size == sizes[g]).all()
    # corpus dedup keeps exactly the representatives
    kept = dedup_keep_representatives(SF).to_pandas()
    assert set(kept.doc_id) == set(groups[groups.is_representative].doc_id)


def test_knn_ivf_recall(ray_session):
    from olx_ray.pipelines.similarity import knn_ivf

    bf = knn_bruteforce(SF).to_pandas()
    ivf = knn_ivf(SF).to_pandas()
    bf_set = set(zip(bf.query_id, bf.neighbor_id))
    ivf_set = set(zip(ivf.query_id, ivf.neighbor_id))
    recall = len(bf_set & ivf_set) / len(bf_set)
    assert recall >= 0.6, f"IVF recall {recall}"
    # deterministic across runs (seeded k-means)
    again = knn_ivf(SF).to_pandas()
    assert ivf.equals(again)


def test_minhash_scan_kernels_handle_empty_batch():
    """Streaming can hand any kernel a zero-row block; the vectorized
    paths must return empty tables, not crash in np.stack/vstack."""
    import pyarrow as pa

    from olx_ray.pipelines.dedup import MinHasher, SimHasher

    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "text": pa.array([], pa.string())})
    assert MinHasher()(empty).num_rows == 0
    assert SimHasher()(empty).num_rows == 0


def test_minhash_verify_matches_inmemory_oracle(ray_session):
    """The distributed per-bucket verify stage must produce EXACTLY the
    pairs an in-memory exact-Jaccard pass over the candidate set does
    (pins the round-3 verify distribution against the broadcast-based
    behavior it replaced)."""
    import pyarrow.parquet as pq

    from olx_ray.pipelines.dedup import minhash_candidates, minhash_lsh_pairs

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    docs = dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    cands = minhash_candidates(SF).to_pandas()
    want = []
    for a, b in zip(cands["doc_a"], cands["doc_b"]):
        j = round(ngram_jaccard(docs[int(a)], docs[int(b)]), 6)
        if j >= 0.6:
            want.append((int(a), int(b), j))
    want.sort()
    got = minhash_lsh_pairs(SF).to_pandas()
    got_t = sorted((int(a), int(b), float(j)) for a, b, j in
                   zip(got["doc_a"], got["doc_b"], got["jaccard"]))
    assert got_t == [(a, b, float(np.float64(j))) for a, b, j in want]


def test_minhash_verify_strategies_agree(ray_session):
    """Broadcast and shuffle verify strategies must produce identical
    pairs (strategy choice is a size heuristic, never a semantic)."""
    from olx_ray.pipelines.dedup import minhash_lsh_pairs

    a = minhash_lsh_pairs(SF).to_pandas().reset_index(drop=True)
    b = minhash_lsh_pairs(SF, broadcast_max_candidates=0) \
        .to_pandas().reset_index(drop=True)
    assert len(a) > 0          # empty fixture would make this vacuous
    assert a.equals(b)


def test_ivf_layout_pruned_read_matches_knn_ivf(ray_session, tmp_path):
    """The cell-partitioned layout must answer EXACTLY like the scan
    variant (same centroids, same probes — layout changes I/O, not
    math), and the query must open only probed cell shards."""
    import os

    from olx_ray.pipelines.similarity import (build_ivf_layout, knn_ivf,
                                              knn_ivf_indexed)

    idx = str(tmp_path / "ivf")
    res = build_ivf_layout(SF, idx, n_cells=8)
    assert sorted(res["written"]) == list(range(8))
    # resume: second build skips everything
    assert build_ivf_layout(SF, idx, n_cells=8)["written"] == []
    got = knn_ivf_indexed(SF, idx, n_probe=4).to_pandas()
    want = knn_ivf(SF, n_cells=8, n_probe=4).to_pandas()
    assert got.reset_index(drop=True).equals(want.reset_index(drop=True))
    assert os.path.exists(os.path.join(idx, "centroids.npy"))
    # pre-sidecar layout (meta missing, IVF_MANIFEST present+matching):
    # backfilled, resume stays a cheap no-op
    os.remove(os.path.join(idx, "CENTROIDS_META.json"))
    assert build_ivf_layout(SF, idx, n_cells=8)["written"] == []
    assert os.path.exists(os.path.join(idx, "CENTROIDS_META.json"))
    # param drift guard: the centroid META sidecar (written before the
    # npy) pins the training params, so a resume with a different
    # train_rows is refused even if IVF_MANIFEST.json never landed
    os.remove(os.path.join(idx, "IVF_MANIFEST.json"))
    with pytest.raises(ValueError, match="trained with"):
        build_ivf_layout(SF, idx, n_cells=8, train_rows=1024)
    # ...and centroids with NO recorded params (pre-sidecar dir or a
    # half-cleaned one) are refused rather than silently adopted
    os.remove(os.path.join(idx, "CENTROIDS_META.json"))
    with pytest.raises(ValueError, match="unrecorded"):
        build_ivf_layout(SF, idx, n_cells=8)


def test_simhash_verify_frame_matches_bruteforce():
    """Property: the LUT-vectorized run verify equals a per-pair
    brute-force popcount reference on random (band, key, simhash)
    frames, including duplicate doc rows and flooded keys."""
    import pandas as pd

    from olx_ray.pipelines.dedup import _simhash_verify_frame

    rng = np.random.default_rng(11)
    for trial in range(25):
        n = int(rng.integers(0, 120))
        g = pd.DataFrame({
            "doc_id": rng.integers(0, 40, n).astype(np.int64),
            "band": rng.integers(0, 4, n).astype(np.int32),
            # few distinct keys → long runs; hashes drawn close together
            # so some pairs land under the threshold
            "key": rng.integers(0, 3, n).astype(np.uint64),
            "simhash": (rng.integers(0, 2, n).astype(np.uint64) * 0xFFFF
                        + rng.integers(0, 8, n).astype(np.uint64)),
        })
        k = int(rng.integers(0, 5))
        got = _simhash_verify_frame(g, k)
        # brute force: dedup, then all (band,key)-sharing id pairs
        ref_rows = set()
        dd = g.drop_duplicates(["band", "key", "doc_id"])
        recs = list(dd.itertuples(index=False))
        for i in range(len(recs)):
            for j in range(len(recs)):
                a, b = recs[i], recs[j]
                if (a.band == b.band and a.key == b.key
                        and a.doc_id < b.doc_id):
                    d = bin(int(a.simhash) ^ int(b.simhash)).count("1")
                    if d <= k:
                        ref_rows.add((a.doc_id, b.doc_id, d))
        got_rows = set(map(tuple, got.to_numpy()))
        assert got_rows == ref_rows, f"trial {trial}"


def test_dedup_incremental_oracle_and_strategies(ray_session):
    """Ingestion-gate dedup: DuckDB NOT-EXISTS + first-wins oracle;
    broadcast and shuffle strategies agree; partition-invariant;
    empty-corpus and empty-increment edges hold."""
    import duckdb
    import pandas as pd
    import ray.data as rd

    from olx_ray.pipelines.dedup import dedup_incremental

    corpus_df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["alpha beta", "gamma", "delta eps", "zeta"]})
    new_df = pd.DataFrame({
        "doc_id": [10, 11, 12, 13, 14, 15],
        "text": ["gamma", "new one", "new one",
                 "alpha beta", "fresh two", "new one"]})

    exp = duckdb.sql("""
        SELECT n.* FROM new_df n
        WHERE NOT EXISTS (SELECT 1 FROM corpus_df c WHERE c.text = n.text)
          AND n.doc_id = (SELECT min(doc_id) FROM new_df m
                          WHERE m.text = n.text)
        ORDER BY doc_id""").df()
    assert len(exp) == 2  # the fixture must exercise both dedup axes

    for strat in ("broadcast", "shuffle", "auto"):
        out = dedup_incremental(
            rd.from_pandas(corpus_df), rd.from_pandas(new_df),
            strategy=strat).to_pandas().reset_index(drop=True)
        assert out.equals(exp), strat

    out = dedup_incremental(
        rd.from_pandas(corpus_df).repartition(3),
        rd.from_pandas(new_df).repartition(5),
        strategy="shuffle").to_pandas().reset_index(drop=True)
    assert out.equals(exp)

    # empty corpus: only within-increment first-wins dedup remains
    got = dedup_incremental(
        rd.from_pandas(corpus_df.iloc[:0]), rd.from_pandas(new_df),
        strategy="broadcast").to_pandas()
    assert sorted(got.doc_id) == [10, 11, 13, 14]

    # empty increment: no rows out, either strategy
    empty = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                          "text": pd.Series([], dtype="object")})
    for strat in ("broadcast", "shuffle"):
        assert dedup_incremental(
            rd.from_pandas(corpus_df), rd.from_pandas(empty),
            strategy=strat).count() == 0

    # SCHEMA-LESS empty increment (from_items([]) has no schema at
    # all): graceful empty return, no .names deref crash
    assert dedup_incremental(
        rd.from_pandas(corpus_df), rd.from_items([])).count() == 0

    # ids above 2^53 survive the shuffle strategy bit-exact as int64:
    # the mixed corpus∪new group must never round-trip through a
    # pandas float widening (regression: null padding float64-ified
    # the whole group)
    big = 2 ** 53 + 1
    out = dedup_incremental(
        rd.from_pandas(corpus_df),
        rd.from_items([{"doc_id": big, "text": "huge snowflake"},
                       {"doc_id": 10, "text": "gamma"}]),
        strategy="shuffle")
    assert [t for t in out.schema().types][0] == pa.int64()
    assert out.take_all() == [{"doc_id": big, "text": "huge snowflake"}]


def test_hasher_chunking_is_invisible():
    """The bounded-scratch chunked kernels (MinHasher running min over
    shingle chunks, SimHasher per-doc bit-sum for docs over the token
    budget) are bit-identical to the one-shot formulas."""
    from olx_ray.pipelines.dedup import SimHasher

    mh = MinHasher()
    sh = np.random.RandomState(0).randint(
        0, 2 ** 63, 40_000).astype(np.uint64)
    x = (sh % np.uint64(mh._P31)).astype(np.int64)[None, :]
    one_shot = ((mh.a * x + mh.b) % mh._P31).min(axis=1).astype(np.uint64)
    assert np.array_equal(mh.signature(sh), one_shot)

    words = " ".join(f"w{i % 311}" for i in range(5_000))
    batch = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                      "text": [words, "small doc"]})
    # chunk budget far below the big doc's token count forces the
    # per-doc running-sum path; a huge budget is the one-shot kernel
    forced = SimHasher()(batch, chunk_tokens=256)["simhash"].to_pylist()
    one = SimHasher()(batch, chunk_tokens=1 << 30)["simhash"].to_pylist()
    assert forced == one


def test_dedup_guard_rails(ray_session):
    """Fail-loud guards: simhash banding radius and the
    keep-representatives strategy typo trap."""
    from olx_ray.pipelines.dedup import (dedup_keep_representatives,
                                         simhash_pairs)

    with pytest.raises(ValueError, match="pigeonhole"):
        simhash_pairs("/nonexistent", max_hamming=4)
    with pytest.raises(ValueError, match="unknown strategy"):
        dedup_keep_representatives("/nonexistent", strategy="distrbuted")


def test_ngram_jaccard_pairs_distinct_gram_semantics(ray_session, tmp_path):
    """Set (not bag) semantics: a gram repeated WITHIN one doc counts
    once in both the set size and the intersection — 'ababab' vs
    'ababab' is jaccard 1.0, and 'aaaa' (one distinct 3-gram) vs
    'aaab' shares 'aaa' with sizes 1 and 2 → 1/2."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from olx_ray.pipelines.dedup import ngram_jaccard_pairs

    t = pa.table({"doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                  "text": ["ababab", "ababab", "aaaa", "aaab"]})
    d = tmp_path / "sf_tiny"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))
    out = ngram_jaccard_pairs(str(d), threshold=0.4, n=3).to_pandas()
    got = {(r.doc_a, r.doc_b): r.jaccard for r in out.itertuples()}
    # doc1/doc2 identical: grams {aba, bab} → 1.0
    assert got[(1, 2)] == 1.0
    # doc3 {aaa} vs doc4 {aaa, aab}: 1 / 2
    assert got[(3, 4)] == 0.5
    # cross-pairs share nothing above threshold
    assert set(got) == {(1, 2), (3, 4)}


def test_ngram_jaccard_pairs_null_text(ray_session, tmp_path):
    """A NULL text row must contribute no grams, not crash the
    candidate stage (review finding: the verify twin guarded nulls,
    the batched side didn't)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from olx_ray.pipelines.dedup import ngram_jaccard_pairs

    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": pa.array(["hello world five", None,
                                    "hello world five"], pa.string())})
    d = tmp_path / "sf_null"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))
    out = ngram_jaccard_pairs(str(d), threshold=0.5, n=5).to_pandas()
    assert list(out["doc_a"]) == [1] and list(out["doc_b"]) == [3]


def test_ngram_jaccard_pairs_random_brute_force(ray_session, tmp_path):
    """Randomized property check of the prefix + positional filters:
    on small-alphabet random strings (dense shared grams — the filter
    stress case) the distributed result equals brute-force distinct
    char-gram Jaccard over all pairs, at two thresholds."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from olx_ray.pipelines.dedup import _char_gram_set, ngram_jaccard_pairs

    rng = np.random.default_rng(17)
    texts = ["".join(rng.choice(list("abc"), rng.integers(5, 40)))
             for _ in range(40)]
    # plant near-dups: copies with small edits
    texts += [t[:-1] + "a" for t in texts[:6]]
    ids = list(range(1, len(texts) + 1))
    d = tmp_path / "sf_rand"
    d.mkdir()
    pq.write_table(pa.table({"doc_id": pa.array(ids, pa.int64()),
                             "text": texts}),
                   str(d / "documents.parquet"))

    for thr in (0.5, 0.8):
        got = ngram_jaccard_pairs(str(d), threshold=thr, n=3).to_pandas()
        got_pairs = {(a, b): j for a, b, j in
                     zip(got["doc_a"], got["doc_b"], got["jaccard"])}
        want = {}
        sets = {i: _char_gram_set(t, 3) for i, t in zip(ids, texts)}
        for i in ids:
            for j in ids:
                if i < j and (sets[i] or sets[j]):
                    inter = len(sets[i] & sets[j])
                    u = len(sets[i]) + len(sets[j]) - inter
                    jac = round(inter / u, 6) if u else 1.0
                    if jac >= thr:
                        want[(i, j)] = jac
        assert got_pairs == want, thr


def test_dedup_keep_best_quality_representative(ray_session, tmp_path):
    """keep='best_quality' survives the highest-quality group member
    (computed with the same QualityScore kernel), not the min id."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import pandas as pd

    from olx_ray.pipelines.dedup import dedup_keep_representatives
    from olx_ray.pipelines.text import QualityScore

    base = ("the quick brown fox jumps over the lazy dog near the " * 6)
    richer = base + "meanwhile regional markets showed steady growth"
    texts = {1: base.strip(), 2: richer.strip(),
             10: "completely unrelated purple elephants dance tonight",
             11: "another standalone document about sailing ships"}
    t = pa.table({"doc_id": pa.array(sorted(texts), pa.int64()),
                  "text": [texts[k] for k in sorted(texts)]})
    d = tmp_path / "sf_q"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))

    q = QualityScore()(pd.DataFrame({"doc_id": [1, 2],
                                     "text": [texts[1], texts[2]]}))
    best = int(q.sort_values(["quality", "doc_id"],
                             ascending=[False, True])["doc_id"].iloc[0])
    assert best == 2, "fixture must make the larger id higher quality"

    surv = dedup_keep_representatives(str(d), keep="best_quality") \
        .to_pandas()
    assert set(surv["doc_id"]) == {best, 10, 11}
    surv_min = dedup_keep_representatives(str(d)).to_pandas()
    assert set(surv_min["doc_id"]) == {1, 10, 11}


def test_knn_bruteforce_filtered_vs_duckdb(ray_session):
    """Attribute-filtered exact kNN == the label-restricted SQL oracle;
    the filter genuinely changes the neighbor set vs unfiltered."""
    import duckdb
    import pandas as pd

    from olx_ray.pipelines.similarity import (KNN_FILTERED_SQL_TEMPLATE,
                                              knn_bruteforce,
                                              knn_bruteforce_filtered)

    label = 0
    got = knn_bruteforce_filtered(SF, label).to_pandas() \
        .reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{SF}/embeddings.parquet')")
    want = con.sql(KNN_FILTERED_SQL_TEMPLATE.format(
        n_queries=10, k=10, label=label)).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # every returned neighbor carries the requested label
    labels = con.sql("SELECT vec_id, label FROM embeddings").df() \
        .set_index("vec_id")["label"]
    assert (labels.loc[got["neighbor_id"]] == label).all()
    # the filter is not a no-op on this corpus
    unfiltered = knn_bruteforce(SF).to_pandas()
    assert not got.equals(unfiltered)


def test_neardup_ops_on_clean_corpus_zero_pairs(ray_session, tmp_path):
    """A corpus with NO near-duplicates must pass through unharmed —
    zero-row pair Datasets drop their columns in to_pandas (Ray 2.49),
    which used to KeyError three drop-id sites."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from olx_ray.pipelines.dedup import (dedup_keep_representatives,
                                         neardup_groups)

    texts = ["alpha bravo charlie delta echo foxtrot",
             "one two three four five six seven",
             "lorem ipsum dolor sit amet consectetur",
             "the quick brown fox jumps over dogs"]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(1, 5), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }), str(tmp_path / "documents.parquet"))

    for strategy in ("distributed", "driver"):
        groups = neardup_groups(str(tmp_path), strategy=strategy) \
            .to_pandas()
        assert len(groups) == 4
        assert (groups["group_size"] == 1).all()
        assert groups["is_representative"].all()

        kept = dedup_keep_representatives(
            str(tmp_path), strategy=strategy).to_pandas()
        assert list(kept["doc_id"]) == [1, 2, 3, 4]   # nothing dropped

    kept_q = dedup_keep_representatives(
        str(tmp_path), strategy="distributed",
        keep="best_quality").to_pandas()
    assert list(kept_q["doc_id"]) == [1, 2, 3, 4]


def test_hybrid_search_rrf_vs_duckdb(ray_session):
    """Engine fusion == DuckDB-computed RRF given the same legs: the
    lexical leg re-derives through bm25_topk (itself reference-tested)
    and everything downstream — PRF seed choice, cosine ranking, the
    1/(60+rank) fusion, tie-breaks — recomputes independently in SQL."""
    import duckdb
    import numpy as np

    from olx_ray.pipelines.similarity import hybrid_search_rrf
    from olx_ray.pipelines.text import bm25_topk

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF}/documents.parquet')")
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM "
            f"read_parquet('{SF}/embeddings.parquet')")
    text0 = con.sql("SELECT text FROM documents WHERE doc_id = 0") \
        .fetchone()[0]
    query = " ".join(text0.split()[:6])
    k, k_leg = 10, 20

    got = hybrid_search_rrf(SF, query, k=k, k_leg=k_leg)

    lexdf = bm25_topk(SF, query, k=k_leg).to_pandas()
    assert len(lexdf) > 1
    con.register("lexdf", lexdf)
    seed = int(lexdf.sort_values(["score", "doc_id"],
                                 ascending=[False, True])
               .iloc[0]["doc_id"])
    want = con.sql(f"""
        WITH lexr AS (
          SELECT doc_id,
                 row_number() OVER (ORDER BY score DESC, doc_id) AS r
          FROM lexdf),
        semr AS (
          SELECT doc_id, r FROM (
            SELECT c.vec_id AS doc_id,
                   row_number() OVER (
                     ORDER BY list_cosine_similarity(
                       q.embedding, c.embedding) DESC, c.vec_id) AS r
            FROM embeddings c,
                 (SELECT embedding FROM embeddings
                  WHERE vec_id = {seed}) q
            WHERE c.vec_id != {seed}) WHERE r <= {k_leg})
        SELECT coalesce(l.doc_id, s.doc_id) AS doc_id,
               coalesce(1.0/(60+l.r), 0) + coalesce(1.0/(60+s.r), 0)
                 AS rrf_score,
               coalesce(l.r, 0)::BIGINT AS lex_rank,
               coalesce(s.r, 0)::BIGINT AS sem_rank
        FROM lexr l FULL OUTER JOIN semr s ON l.doc_id = s.doc_id
        ORDER BY rrf_score DESC, doc_id LIMIT {k}""").df()

    assert list(got["doc_id"]) == list(want["doc_id"])
    assert list(got["lex_rank"]) == list(want["lex_rank"])
    assert list(got["sem_rank"]) == list(want["sem_rank"])
    assert np.allclose(got["rrf_score"], want["rrf_score"], rtol=1e-12)
    # both legs contribute: some fused row is lexical-only or
    # semantic-only, and at least one row sits in both legs
    assert ((got["lex_rank"] > 0) & (got["sem_rank"] > 0)).any()
    # deterministic end to end
    again = hybrid_search_rrf(SF, query, k=k, k_leg=k_leg)
    assert got.equals(again)


def test_ann_recall_report(ray_session):
    from olx_ray.pipelines.similarity import ann_recall

    perfect = ann_recall(SF, "bruteforce", n_queries=5, k=5)
    assert len(perfect) == 6                      # 5 queries + summary
    assert (perfect["recall_at_k"] == 1.0).all()
    assert (perfect["mrr"] == 1.0).all()

    lsh = ann_recall(SF, "lsh", n_queries=5, k=5)
    s = lsh[lsh["query_id"] == -1].iloc[0]
    assert 0.0 <= s["recall_at_k"] <= 1.0 and 0.0 <= s["mrr"] <= 1.0
    # the repo's measured LSH recall on this fixture is 1.0; keep a
    # loose floor so parameter tweaks fail loudly, not silently
    assert s["recall_at_k"] >= 0.8


def test_hybrid_search_rrf_partial_embedding_coverage(ray_session,
                                                      tmp_path):
    """Embedding coverage can be partial (sf0.1 embeds 2k of 5k docs):
    the PRF seed falls back to the best-ranked EMBEDDED lexical hit,
    and with no embedded candidate at all the op degrades to
    lexical-only fusion instead of raising."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from olx_ray.pipelines.similarity import hybrid_search_rrf

    # doc 1 wins BM25 for "zebra" (repeats it) but has NO embedding;
    # doc 2 mentions it once and IS embedded → doc 2 seeds the leg
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(["zebra zebra zebra", "zebra stripes",
                          "plain horse text", "donkey entry"],
                         pa.string()),
    }), str(tmp_path / "documents.parquet"))
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(3, 8)).astype(np.float32)
    pq.write_table(pa.table({
        "vec_id": pa.array([2, 3, 4], pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float32())),
    }), str(tmp_path / "embeddings.parquet"))

    out = hybrid_search_rrf(str(tmp_path), "zebra", k=4, k_leg=4)
    assert 1 in set(out["doc_id"])              # lexical winner survives
    assert (out["sem_rank"] > 0).any()          # semantic leg ran
    assert out[out["doc_id"] == 2]["lex_rank"].iloc[0] == 2

    # no embedded candidate at all → lexical-only, no raise
    pq.write_table(pa.table({
        "vec_id": pa.array([], pa.int64()),
        "embedding": pa.array([], pa.list_(pa.float32())),
    }), str(tmp_path / "embeddings.parquet"))
    lex_only = hybrid_search_rrf(str(tmp_path), "zebra", k=4, k_leg=4)
    assert (lex_only["sem_rank"] == 0).all()
    assert (lex_only["lex_rank"] > 0).all()


def test_hybrid_and_ann_recall_zero_row_legs(ray_session, tmp_path):
    """Zero-row legs must degrade, not KeyError (Ray 2.49 drops the
    columns of an empty Dataset in to_pandas): hybrid when the PRF
    seed is the ONLY embedded doc (the self-pair rule empties the
    semantic leg), ann_recall on a single-vector corpus (exact side
    empty)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from olx_ray.pipelines.similarity import ann_recall, hybrid_search_rrf

    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["zebra zebra", "horse entry", "donkey text"],
                         pa.string()),
    }), str(tmp_path / "documents.parquet"))
    pq.write_table(pa.table({
        "vec_id": pa.array([1], pa.int64()),
        "embedding": pa.array(
            [np.random.default_rng(3).normal(size=8)
             .astype(np.float32).tolist()], pa.list_(pa.float32())),
    }), str(tmp_path / "embeddings.parquet"))

    out = hybrid_search_rrf(str(tmp_path), "zebra", k=3, k_leg=3)
    assert (out["sem_rank"] == 0).all()       # leg empty, no crash
    assert out.iloc[0]["doc_id"] == 1         # lexical ranking intact

    rep = ann_recall(str(tmp_path), "bruteforce", n_queries=1, k=3)
    assert len(rep) == 1                      # summary row only
    assert rep.iloc[0]["query_id"] == -1
    assert rep.iloc[0]["recall_at_k"] == 0.0 and rep.iloc[0]["mrr"] == 0.0


def test_lsh_signature_parity_adversarial(ray_session, tmp_path):
    """The quantized-signature contract attacked directly: exact
    half-fractions at the floor boundary (x·2^20 = k+0.5 — where
    round() would diverge half-even vs half-away), negatives,
    huge/tiny magnitudes (incl. parallel scaled copies), and
    bit-identical duplicates. Signature parity must be EXACT for all
    of them; the full pipeline output is compared on the subset
    without parallel DISTINCT vectors (parallel vectors have
    mathematically tied cosines that each engine rounds differently —
    the same documented rerank posture as KNN_SQL_TEMPLATE; ties from
    bit-identical duplicates resolve identically on both sides)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from olx_ray.pipelines.similarity import (_lsh_planes, _lsh_signatures,
                                              knn_lsh, knn_lsh_sql,
                                              lsh_signatures_sql)

    rng = np.random.default_rng(17)
    dim, n = 64, 40
    m = rng.normal(size=(n, dim)).astype(np.float32)
    # exact (k + 0.5)/2^20 values: floor is unambiguous, round is not
    m[3] = ((np.arange(dim) + 0.5) / (1 << 20)).astype(np.float32)
    m[4] = -m[3]
    m[5] = m[3] * 1e6                 # large magnitudes (parallel copy)
    m[6] = (m[3] * 1e-6).astype(np.float32)   # tiny (quantizes to 0)
    m[7] = m[12]                      # bit-identical duplicate
    m[8] = -m[12]                     # antipodal
    pq.write_table(pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array([r.tolist() for r in m],
                              pa.list_(pa.float32())),
    }), str(tmp_path / "embeddings.parquet"))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM "
            f"read_parquet('{tmp_path}/embeddings.parquet')")

    # 1) bucket keys bit-identical for EVERY adversarial row
    planes = _lsh_planes(16, 4, dim)
    sig_eng = _lsh_signatures(m.astype(np.float64), planes)
    so = con.sql(lsh_signatures_sql()).df()
    sig_sql = so.pivot(index="vec_id", columns="t", values="key").to_numpy()
    assert (sig_eng == sig_sql).all()

    # 2) full pipeline equality on the fixture WITHOUT the parallel
    # scaled copies (rows 5/6 replaced by fresh random vectors)
    m2 = m.copy()
    m2[5] = rng.normal(size=dim).astype(np.float32)
    m2[6] = rng.normal(size=dim).astype(np.float32)
    pq.write_table(pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array([r.tolist() for r in m2],
                              pa.list_(pa.float32())),
    }), str(tmp_path / "embeddings.parquet"))
    eng = knn_lsh(str(tmp_path)).to_pandas().reset_index(drop=True)
    want = con.sql(knn_lsh_sql()).df()
    assert eng.astype("int64").equals(want.astype("int64"))


def test_md5_token_hash_matches_duckdb():
    """_md5_token_hash byte-order contract vs DuckDB md5_number_lower
    on adversarial tokens (unicode scripts, digits, punctuation runs,
    single char, 1000-char token)."""
    import duckdb

    from olx_ray.pipelines.dedup import _md5_token_hash

    toks = ["a", "Опис", "œufs-épicés", "123456789", "!!##$$",
            "寿司", "x" * 1000, "mIxEdCaSe"]
    con = duckdb.connect()
    for t in toks:
        want = con.execute(
            "SELECT md5_number_lower(?)", [t]).fetchone()[0]
        assert _md5_token_hash(t) == int(want), t


# ------------------------------------------------------- kmeans_train
def _ref_kmeans_quantized(m, init, iters):
    """Driver-side reference of kmeans_train's EXACT quantized Lloyd:
    same assignment kernel (shape-independent einsum), same integer
    partial sums, same float derivation — equality must be bitwise."""
    from olx_ray.pipelines.similarity import _KMEANS_SCALE

    cents = init.copy()
    for _ in range(iters):
        cl = np.einsum("ij,kj->ik", m, cents).argmax(axis=1)
        q = np.rint(m * _KMEANS_SCALE).astype(np.int64)
        nxt = cents.copy()
        for c in range(len(cents)):
            rows = q[cl == c]
            if len(rows):
                s = rows.sum(axis=0, dtype=np.int64)
                v = s.astype(np.float64) / (float(len(rows))
                                            * _KMEANS_SCALE)
                nxt[c] = v / (np.linalg.norm(v) or 1.0)
        cents = nxt
    return cents


def test_kmeans_train_exact_reference_parity(ray_session):
    """Distributed quantized Lloyd == in-memory reference, BITWISE:
    integer partial sums make each iteration a pure function of the
    table, so no tolerance is needed (a float-sum design could never
    pin this)."""
    import pyarrow.parquet as pq

    from olx_ray.pipelines.similarity import kmeans_train

    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["embedding"])
    m = np.vstack(t["embedding"].to_pylist()).astype(np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True)

    rng = np.random.RandomState(7)
    init = m[rng.choice(len(m), 4, replace=False)].copy()
    got = kmeans_train(SF, n_clusters=4, iters=3, init=init)
    ref = _ref_kmeans_quantized(m, init, 3)
    assert np.array_equal(got, ref)
    assert np.allclose(np.linalg.norm(got, axis=1), 1.0)


def test_kmeans_train_partition_invariant(ray_session):
    """Same centroids regardless of batch layout / merge fan-in — the
    point of the integer-units discipline."""
    from olx_ray.pipelines.similarity import kmeans_train

    a = kmeans_train(SF, n_clusters=4, iters=2, batch_size=64, fan_in=4)
    b = kmeans_train(SF, n_clusters=4, iters=2, batch_size=4096,
                     fan_in=32)
    assert np.array_equal(a, b)


def test_kmeans_train_drop_in_for_semdedup_cents(ray_session):
    """The trained centroids slot into semantic_dedup's cents override
    (the documented integration point) and the run completes with the
    usual invariants."""
    from olx_ray.pipelines.semdedup import semantic_dedup
    from olx_ray.pipelines.similarity import kmeans_train

    cents = kmeans_train(SF, n_clusters=4, iters=1)
    out = semantic_dedup(SF, eps=0.35, n_clusters=4,
                         cents=cents).to_pandas()
    assert len(out) == 500
    assert out["vec_id"].is_monotonic_increasing
    assert set(out["cluster"].unique()) <= set(range(4))


def test_ivf_layout_corpus_trainer(ray_session, tmp_path):
    """trainer='corpus' layouts: centroids == a direct kmeans_train run
    (same seeds, same rounds); exhaustive probing over the layout ==
    brute force (candidate-complete regardless of centroids); trainer
    is pinned in the manifests like every other parameter."""
    import numpy as np

    from olx_ray.pipelines.similarity import (build_ivf_layout,
                                              kmeans_train,
                                              knn_bruteforce,
                                              knn_ivf_indexed)

    idx = str(tmp_path / "ivf_corpus")
    res = build_ivf_layout(SF, idx, n_cells=4, trainer="corpus",
                           corpus_iters=2)
    assert sorted(res["written"]) == list(range(4))
    cents = np.load(f"{idx}/centroids.npy")
    want = kmeans_train(SF, n_clusters=4, iters=2)
    assert np.array_equal(cents, want)
    # exhaustive probing == brute force, up to the shared tie-break
    got = knn_ivf_indexed(SF, idx, n_probe=4).to_pandas()
    brute = knn_bruteforce(SF).to_pandas()
    assert got.reset_index(drop=True).equals(
        brute.reset_index(drop=True))
    # resume with the same trainer: cheap no-op
    assert build_ivf_layout(SF, idx, n_cells=4, trainer="corpus",
                            corpus_iters=2)["written"] == []
    # trainer drift is refused like any other param drift
    with pytest.raises(ValueError, match="rebuild parameters"):
        build_ivf_layout(SF, idx, n_cells=4, trainer="sample")
    with pytest.raises(ValueError, match="trainer must be"):
        build_ivf_layout(SF, idx, n_cells=4, trainer="bogus")


def test_embed_documents_reference_and_end_to_end(ray_session, tmp_path):
    """embed_documents == the in-memory hashed-BoW reference EXACTLY;
    planted duplicate texts embed identically; empty docs map to e0;
    and the whole semantic family runs unchanged on the ENGINE-produced
    embeddings file (knn + semantic_dedup close the documents→vectors
    loop in-engine)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from olx_ray.pipelines.scoring import _hashed_features
    from olx_ray.pipelines.semdedup import semantic_dedup
    from olx_ray.pipelines.similarity import (embed_corpus_file,
                                              embed_documents,
                                              knn_bruteforce)

    docs = pd.DataFrame({
        "doc_id": np.arange(8, dtype=np.int64),
        "text": ["the quick brown fox", "lazy dogs sleep all day",
                 "the quick brown fox",          # exact dup of 0
                 "", None,                       # featureless pair
                 "parquet files hold columns", "fox quick the brown",
                 "lazy dogs sleep all day"],     # exact dup of 1
    })
    sf = str(tmp_path)
    pq.write_table(pa.Table.from_pandas(docs), f"{sf}/documents.parquet")

    got = embed_documents(sf, dim=32).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    m = np.vstack(got["embedding"].to_numpy())
    # reference: same kernel, driver-side
    feat, off = _hashed_features(docs["text"].tolist(), 32)
    ref = np.zeros((8, 32))
    rows = np.repeat(np.arange(8), np.diff(off))
    np.add.at(ref, (rows, feat), 1.0)
    norms = np.linalg.norm(ref, axis=1)
    ref[norms == 0, 0] = 1.0
    norms[norms == 0] = 1.0
    ref /= norms[:, None]
    assert np.array_equal(m, ref)
    assert np.array_equal(m[0], m[2])            # dup texts, same vector
    assert np.array_equal(m[1], m[7])
    e0 = np.zeros(32); e0[0] = 1.0
    assert np.array_equal(m[3], e0) and np.array_equal(m[4], e0)
    assert np.allclose(np.linalg.norm(m, axis=1), 1.0)

    # end-to-end: engine-produced file feeds the semantic family
    path = embed_corpus_file(sf, sf, dim=32)
    assert path.endswith("embeddings.parquet")
    knn = knn_bruteforce(sf, n_queries=3, k=2).to_pandas()
    assert len(knn) == 6
    # each planted duplicate is its twin's rank-1 neighbor
    assert knn[(knn["query_id"] == 0) &
               (knn["rank"] == 1)].iloc[0]["neighbor_id"] == 2
    assert knn[(knn["query_id"] == 1) &
               (knn["rank"] == 1)].iloc[0]["neighbor_id"] == 7
    sd = semantic_dedup(sf, eps=0.999, n_clusters=2,
                        train_rows=8).to_pandas()
    assert len(sd) == 8
    assert not sd["keep"].all()                  # dups pruned


def test_ivf_append_round_aware_consumers(ray_session, tmp_path):
    """ivf_append: increments join the index without a rebuild; both
    indexed consumers see base+rounds. Exhaustive-probe knn over the
    appended layout == in-memory brute force over the UNION;
    semantic_dedup_indexed == the shuffle variant run on a single
    union table with the layout's centroids; append resume skips; an
    incomplete base is refused."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from olx_ray.pipelines.semdedup import (semantic_dedup,
                                            semantic_dedup_indexed)
    from olx_ray.pipelines.similarity import (build_ivf_layout,
                                              ivf_append,
                                              knn_ivf_indexed)

    base = pq.read_table(f"{SF}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    # increment: the first 100 base rows with DISTINCT shifted ids —
    # planted exact duplicates across rounds
    inc = pa.table({
        "vec_id": pa.array((base["vec_id"].to_numpy()[:100]
                            + 100000).astype("int64")),
        "embedding": base["embedding"].slice(0, 100)})
    inc_dir = tmp_path / "inc"
    inc_dir.mkdir()
    pq.write_table(inc, f"{inc_dir}/embeddings.parquet")

    idx = str(tmp_path / "ivf")
    build_ivf_layout(SF, idx, n_cells=4)
    with pytest.raises(ValueError, match="IVF_MANIFEST"):
        ivf_append(str(inc_dir), str(tmp_path / "nolayout"), 1)
    res = ivf_append(str(inc_dir), idx, 1)
    assert res["skipped"] == []
    # resume: same round re-run is a cheap no-op
    assert ivf_append(str(inc_dir), idx, 1)["written"] == []

    # knn (exhaustive probing → candidate-complete): == brute over union
    got = knn_ivf_indexed(SF, idx, n_queries=5, k=3,
                          n_probe=4).to_pandas()
    ids = base["vec_id"].to_numpy().astype(np.int64)
    vecs = np.vstack(base["embedding"].to_pylist()).astype(np.float64)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    inc_ids = inc["vec_id"].to_numpy()
    inc_vecs = vecs[:100]
    all_ids = np.concatenate([ids, inc_ids])
    all_vecs = np.vstack([vecs, inc_vecs])
    import pandas as pd
    rows = []
    for qi in range(5):
        cos = all_vecs @ vecs[qi]
        df = pd.DataFrame({"neighbor_id": all_ids, "cos": cos})
        df = df[df["neighbor_id"] != ids[qi]]
        df = df.sort_values(["cos", "neighbor_id"],
                            ascending=[False, True]).head(3)
        for r, (_, row) in enumerate(df.iterrows(), 1):
            rows.append((ids[qi], int(row["neighbor_id"]), r))
    want = pd.DataFrame(rows, columns=["query_id", "neighbor_id", "rank"])
    got = got.sort_values(["query_id", "rank"]).reset_index(drop=True)
    want = want.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert got.astype("int64").equals(want.astype("int64"))
    # the appended duplicates must actually surface as rank-1 hits
    assert (got["neighbor_id"] >= 100000).any()

    # semantic dedup over the appended layout == shuffle variant on the
    # union table with the SAME centroids
    union_dir = tmp_path / "union"
    union_dir.mkdir()
    pq.write_table(pa.table({
        "vec_id": pa.array(all_ids.astype("int64")),
        "embedding": pa.concat_arrays([
            base["embedding"].combine_chunks(),
            inc["embedding"].combine_chunks()])}),
        f"{union_dir}/embeddings.parquet")
    cents = np.load(f"{idx}/centroids.npy").astype(np.float64)
    a = semantic_dedup_indexed(idx, eps=0.35).to_pandas()
    b = semantic_dedup(str(union_dir), eps=0.35, n_clusters=4,
                       cents=cents).to_pandas()
    assert a["vec_id"].tolist() == b["vec_id"].tolist()
    assert a["cluster"].tolist() == b["cluster"].tolist()
    assert a["keep"].tolist() == b["keep"].tolist()
    assert len(a) == 600
    # the cross-round exact duplicates are pruned (cos 1.0 >= eps)
    dup_rows = a[a["vec_id"] >= 100000]
    assert not dup_rows["keep"].all()


def test_ivf_compact_retires_rounds(ray_session, tmp_path):
    """ivf_compact = fold_rounds + compact_shards on the index: query
    results are bit-identical before/after, round dirs are retired,
    and the folded round id can never be re-appended."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from olx_ray.pipelines.export import appended_round_dirs
    from olx_ray.pipelines.similarity import (build_ivf_layout,
                                              ivf_append, ivf_compact,
                                              knn_ivf_indexed)

    base = pq.read_table(f"{SF}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    inc = pa.table({
        "vec_id": pa.array((base["vec_id"].to_numpy()[:50]
                            + 100000).astype("int64")),
        "embedding": base["embedding"].slice(0, 50)})
    inc_dir = tmp_path / "inc"
    inc_dir.mkdir()
    pq.write_table(inc, f"{inc_dir}/embeddings.parquet")

    idx = str(tmp_path / "ivf")
    build_ivf_layout(SF, idx, n_cells=4)
    ivf_append(str(inc_dir), idx, 1)
    before = knn_ivf_indexed(SF, idx, n_queries=5, k=3,
                             n_probe=4).to_pandas() \
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert (before["neighbor_id"] >= 100000).any()   # round visible

    res = ivf_compact(idx)
    assert res["folded"] == [1] and res["rows_added"] == 50
    assert appended_round_dirs(idx) == []
    after = knn_ivf_indexed(SF, idx, n_queries=5, k=3,
                            n_probe=4).to_pandas() \
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert after.equals(before)

    # the folded id is permanently retired; a fresh id still appends
    with pytest.raises(ValueError, match="already folded"):
        ivf_append(str(inc_dir), idx, 1)
    inc2 = pa.table({
        "vec_id": pa.array((base["vec_id"].to_numpy()[50:60]
                            + 200000).astype("int64")),
        "embedding": base["embedding"].slice(50, 10)})
    pq.write_table(inc2, f"{inc_dir}/embeddings.parquet")
    assert sum(ivf_append(str(inc_dir), idx, 2)["rows"].values()) == 10
