"""pipelines/ingest.py — the composed ingestion round: exact gate →
near gate → quality gate → resumable export, with per-gate counts,
content verification and crash-resume idempotence."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ds(df: pd.DataFrame):
    import ray.data as rd

    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))


def _clean(i: int) -> str:
    vocab = ["market", "report", "shows", "steady", "growth", "regional",
             "sales", "quarter", "with", "the", "strong", "demand"]
    rng = np.random.default_rng(i)
    return " ".join(rng.choice(vocab, 14))


def _junk(i: int) -> str:
    rng = np.random.default_rng(900 + i)
    return " ".join(rng.choice(["zzqx", "jjkk", "qqq", "xxzz"], 14))


def test_ingest_round_gates_and_resume(ray_session, tmp_path):
    from olx_ray.pipelines.ingest import ingest_increment
    from olx_ray.pipelines.export import read_shards
    from olx_ray.pipelines.scoring import train_quality_model

    corpus_texts = {i: _clean(i) for i in range(1, 6)}
    corpus = _ds(pd.DataFrame({
        "doc_id": pd.array(sorted(corpus_texts), dtype="int64"),
        "text": [corpus_texts[i] for i in sorted(corpus_texts)]}))

    near_of_corpus = corpus_texts[2] + " extra"
    base_new = _clean(50)
    new_rows = {
        100: corpus_texts[1],            # exact dup of corpus → exact gate
        101: near_of_corpus,             # near-dup of corpus → near gate
        102: base_new,                   # novel; pairs with 103
        103: base_new + " suffix",       # near-dup of 102 → keep 102 only
        104: _junk(1),                   # low quality → quality gate
        105: _clean(60),                 # clean novel
    }
    new = _ds(pd.DataFrame({
        "doc_id": pd.array(sorted(new_rows), dtype="int64"),
        "text": [new_rows[i] for i in sorted(new_rows)]}))

    w = train_quality_model([_clean(i) for i in range(200, 320)],
                            [_junk(i) for i in range(200, 320)],
                            dim=1 << 14)
    out = str(tmp_path / "ingested")
    res = ingest_increment(corpus, new, out, round_no=0, weights=w,
                           quality_min=0.5, n_shards=4)
    c = res["counts"]
    assert c["n_new"] == 6
    assert c["after_exact"] == 5          # 100 dropped
    assert c["after_near"] == 3           # 101, 103 dropped
    assert c["after_quality"] == 2        # 104 dropped
    assert c["exported"] == 2

    got = read_shards(f"{out}/round=0").to_pandas().sort_values("doc_id")
    assert list(got["doc_id"]) == [102, 105]
    assert list(got["text"]) == [new_rows[102], new_rows[105]]

    # resume: complete shards are skipped, nothing duplicates
    res2 = ingest_increment(corpus, new, out, round_no=0, weights=w,
                            quality_min=0.5, n_shards=4)
    assert res2["manifest"]["written"] == []
    assert read_shards(f"{out}/round=0").count() == 2


def test_ingest_without_model_skips_quality_gate(ray_session, tmp_path):
    from olx_ray.pipelines.ingest import ingest_increment
    from olx_ray.pipelines.export import read_shards

    corpus = _ds(pd.DataFrame({"doc_id": pd.array([1], dtype="int64"),
                               "text": [_clean(1)]}))
    new = _ds(pd.DataFrame({"doc_id": pd.array([10, 11], dtype="int64"),
                            "text": [_junk(5), _clean(7)]}))
    out = str(tmp_path / "nomodel")
    res = ingest_increment(corpus, new, out, round_no=3, n_shards=2)
    assert "after_quality" not in res["counts"]
    assert res["counts"]["exported"] == 2          # junk passes, no model
    assert read_shards(f"{out}/round=3").count() == 2


def test_ingest_heuristic_gate(ray_session, tmp_path):
    """Gate 0: the Gopher stopword rule (bit 6 = 64) drops junk BEFORE
    the dedup gates; no model needed."""
    from olx_ray.pipelines.export import read_shards
    from olx_ray.pipelines.ingest import ingest_increment

    # _clean draws words randomly and may miss the required stopwords —
    # pin two ("with the") so only the junk doc trips the stopword rule
    corpus_texts = {i: _clean(i) + " with the" for i in range(1, 6)}
    corpus = _ds(pd.DataFrame({
        "doc_id": pd.array(sorted(corpus_texts), dtype="int64"),
        "text": [corpus_texts[i] for i in sorted(corpus_texts)]}))
    base_new = _clean(50) + " with the"
    new_rows = {
        100: corpus_texts[1],            # exact dup → exact gate
        101: corpus_texts[2] + " extra",  # near-dup → near gate
        102: base_new,                   # novel survivor
        103: base_new + " suffix",       # near-dup of 102
        104: _junk(1),                   # no stopwords → heuristic gate
        105: _clean(60) + " with the",   # clean novel survivor
    }
    new = _ds(pd.DataFrame({
        "doc_id": pd.array(sorted(new_rows), dtype="int64"),
        "text": [new_rows[i] for i in sorted(new_rows)]}))

    out = str(tmp_path / "ingested_h")
    res = ingest_increment(corpus, new, out, round_no=0, weights=None,
                           n_shards=4, heuristic_rules=64)
    c = res["counts"]
    assert c["n_new"] == 6
    assert c["after_heuristic"] == 5      # 104 dropped first
    assert c["after_exact"] == 4          # 100 dropped
    assert c["after_near"] == 2           # 101, 103 dropped
    assert "after_quality" not in c       # no model this round
    got = read_shards(f"{out}/round=0").to_pandas().sort_values("doc_id")
    assert list(got["doc_id"]) == [102, 105]


def test_ingest_zero_survivor_round_exports_empty(ray_session, tmp_path):
    """A gate dropping EVERY row must still export a typed empty round
    (and an empty typed increment must not crash)."""
    from olx_ray.pipelines.export import read_shards
    from olx_ray.pipelines.ingest import ingest_increment

    corpus = _ds(pd.DataFrame({
        "doc_id": pd.array([1], dtype="int64"), "text": [_clean(1)]}))
    junk_new = _ds(pd.DataFrame({
        "doc_id": pd.array([100, 101], dtype="int64"),
        "text": [_junk(1), _junk(2)]}))        # no stopwords anywhere

    out = str(tmp_path / "zero")
    res = ingest_increment(corpus, junk_new, out, round_no=0,
                           weights=None, n_shards=2, heuristic_rules=64)
    c = res["counts"]
    assert c == {"n_new": 2, "after_heuristic": 0, "after_exact": 0,
                 "after_near": 0, "exported": 0}
    empty_round = read_shards(f"{out}/round=0")
    assert empty_round.count() == 0
    # schema-stable at the Dataset level (Ray 2.49's to_pandas() drops
    # columns for ANY zero-row dataset, so assert on schema())
    assert set(empty_round.schema().names) == {"doc_id", "text"}

    # an EMPTY typed increment short-circuits every gate
    empty_new = _ds(pd.DataFrame({
        "doc_id": pd.array([], dtype="int64"),
        "text": pd.array([], dtype="str")}))
    res2 = ingest_increment(corpus, empty_new, str(tmp_path / "zero2"),
                            round_no=0, weights=None, n_shards=2)
    assert res2["counts"]["n_new"] == 0
    assert res2["counts"]["exported"] == 0


def test_ingest_interleaved_gates_and_resume(ray_session, tmp_path):
    """The INTERLEAVED ingestion round over planted mixed-modal
    fixtures: per-gate survivor counts (heuristic → exact → near →
    quality), spans land untouched, and a crash-resume (one shard's
    manifest deleted, then re-run) rewrites only that shard without
    duplicating rows."""
    import os

    from olx_ray.pipelines.export import read_shards
    from olx_ray.pipelines.ingest import ingest_increment_interleaved
    from olx_ray.pipelines.scoring import train_quality_model
    from tests.test_interleaved_neardup import BASE, ROWS, _docs

    corpus = _docs(ROWS)
    good_text = ("a genuinely novel listing with the usual stopwords "
                 "describing a wooden bookshelf in fine condition for sale")
    new_rows = [
        ("new/exact", ROWS[0][1]),                 # re-crawl of ad/a
        ("new/near", [("title", "flat", None),     # text-near ad/a
                      ("description", BASE, None),
                      ("image", None, "q1")]),
        ("new/mnear", [("description", "totally different words with the "
                        "bikes and gears and chains for sale cheap", None),
                       ("image", None, "m1"), ("image", None, "m2"),
                       ("image", None, "m3")]),    # media-near ad/a
        #   ("with the" keeps it past the stopword rule so the NEAR gate
        #    is what catches it — via its media evidence)
        ("new/junk", [("description", "zzqx jjkk qqq xxzz zzqx jjkk qqq "
                       "xxzz zzqx jjkk qqq xxzz zq jk", None)]),
        ("new/lowq", [("description", "with the " + " ".join(
            ["qxz"] * 20), None)]),                # stopworded junk: past
        #       the heuristic, caught by the trained quality model below
        ("new/good", [("description", good_text, None),
                      ("image", None, "bk1")]),
    ]
    w = train_quality_model([_clean(i) + " with the" for i in range(200, 320)],
                            [" ".join(["qxz"] * 14) for _ in range(120)],
                            dim=1 << 14)
    out = str(tmp_path / "inter")
    kwargs = dict(round_no=0, weights=w, quality_min=0.5,
                  heuristic_rules=64, text_threshold=0.5,
                  media_threshold=0.5, n_shards=4)
    res = ingest_increment_interleaved(corpus, _docs(new_rows), out,
                                       **kwargs)
    c = res["counts"]
    assert c["n_new"] == 6
    assert c["after_heuristic"] == 5       # new/junk (no stopwords)
    assert c["after_exact"] == 4           # new/exact
    assert c["after_near"] == 2            # new/near (text), new/mnear (media)
    assert c["after_quality"] == 1         # new/lowq
    assert c["exported"] == 1
    got = read_shards(f"{out}/round=0").to_pandas()
    assert list(got["doc_id"]) == ["new/good"]
    assert [(s["kind"], s["text"], s["media_ref"])
            for s in got["spans"].iloc[0]] == new_rows[5][1]

    # crash-resume: kill one shard's manifest; the re-run rewrites ONLY
    # pending shards and the round stays duplicate-free
    shard_dirs = [d for d in os.listdir(f"{out}/round=0")
                  if d.startswith("shard=")]
    victim = sorted(shard_dirs)[0]
    os.remove(f"{out}/round=0/{victim}/MANIFEST.json")
    res2 = ingest_increment_interleaved(corpus, _docs(new_rows), out,
                                        **kwargs)
    assert res2["manifest"]["written"] == [int(victim.split("=")[1])]
    assert res2["counts"] == c
    assert read_shards(f"{out}/round=0").count() == 1

    # a zero-survivor round still exports a typed empty increment
    dup_only = _docs([("only/exact", ROWS[0][1])])
    res3 = ingest_increment_interleaved(corpus, dup_only,
                                        str(tmp_path / "zero"), **kwargs)
    assert res3["counts"]["exported"] == 0
    empty_round = read_shards(str(tmp_path / "zero") + "/round=0")
    assert empty_round.count() == 0
    assert set(empty_round.schema().names) == {"doc_id", "spans"}


def test_ingest_interleaved_rounds_over_real_crawl_payloads(ray_session,
                                                            tmp_path):
    """The continuous multimodal crawl→corpus loop over REAL parsed
    payloads: round 0 ingests the t1 crawl's documents into an empty
    corpus; round 1 re-ingests the same docs (all drop at the exact
    gate) plus a near twin (drops at the near gate) plus a novel doc
    (survives) against `read_layout` of the accumulated corpus. Also
    pins bucket-count invariance of the interleaved near gate."""
    import pyarrow.compute as pc
    import ray.data as rd

    from olx_ray.pipelines.export import read_layout
    from olx_ray.pipelines.ingest import ingest_increment_interleaved
    from olx_ray.pipelines.spans import (interleaved_neardup_incremental,
                                         transform_text_spans)
    from olx_ray.sources.sitegen import write_site
    from olx_ray.stages.parse import ParseAds
    from tests.test_interleaved_neardup import _docs

    paths = write_site("t1", str(tmp_path / "site"))
    docs = (rd.read_parquet(paths["pages"]).filter(expr="kind == 'ad'")
            .map_batches(ParseAds(), batch_format="pyarrow")
            .select_columns(["doc_id", "spans"]).materialize())
    n = docs.count()
    out = str(tmp_path / "corpus")

    empty = _docs([])
    r0 = ingest_increment_interleaved(empty, docs, out, round_no=0,
                                      text_threshold=0.5,
                                      media_threshold=0.5, n_shards=4)
    assert r0["counts"]["exported"] == n

    # increment: full re-crawl + a one-word-edited near twin + a novel doc
    def retag(b):
        i = b.schema.get_field_index("doc_id")
        ids = pc.binary_join_element_wise(
            pa.array(["zzz"] * b.num_rows),
            b["doc_id"].cast(pa.string()), "-")
        return b.set_column(i, "doc_id", ids)

    twin = transform_text_spans(
        docs.limit(1).map_batches(retag, batch_format="pyarrow"),
        lambda t: pc.replace_substring_regex(t, pattern=r"^",
                                             replacement="edited "))
    novel = _docs([("novel/1", [("description", "with the a wholly new "
                    "listing describing a mountain bike in excellent "
                    "shape disc brakes recently serviced", None),
                   ("image", None, "nv1")])])
    increment = docs.union(twin).union(novel).materialize()

    corpus = read_layout(out).select_columns(["doc_id", "spans"])
    r1 = ingest_increment_interleaved(corpus, increment, out, round_no=1,
                                      text_threshold=0.5,
                                      media_threshold=0.5, n_shards=4)
    c = r1["counts"]
    assert c["n_new"] == n + 2
    assert c["after_exact"] == 2           # the full re-crawl drops
    assert c["after_near"] == 1            # the near twin drops
    assert c["exported"] == 1
    got = read_layout(out).to_pandas()
    assert len(got) == n + 1 and "novel/1" in set(got["doc_id"])

    # bucket-count invariance of the near gate (partition invariance)
    a = interleaved_neardup_incremental(corpus, increment, 0.5, 0.5,
                                        n_buckets=4).to_pandas()
    b = interleaved_neardup_incremental(corpus, increment, 0.5, 0.5,
                                        n_buckets=32).to_pandas()
    assert list(a["doc_id"]) == list(b["doc_id"]) == ["novel/1"]


def test_ingest_round_appends_to_serving_index(ray_session, tmp_path):
    """index_dir closes the ingest→index loop: the round's survivors
    embed and append to the IVF layout under the same round id, the
    appended vectors are exactly the exported doc_ids, the index read
    surfaces them, and a re-run is idempotent on BOTH sinks."""
    import pyarrow.parquet as pq

    from olx_ray.pipelines.export import read_shards
    from olx_ray.pipelines.ingest import ingest_increment
    from olx_ray.pipelines.similarity import (build_ivf_layout,
                                              embed_corpus_file,
                                              knn_ivf_indexed)

    corpus_texts = {i: _clean(i) for i in range(1, 6)}
    cdf = pd.DataFrame({
        "doc_id": pd.array(sorted(corpus_texts), dtype="int64"),
        "text": [corpus_texts[i] for i in sorted(corpus_texts)]})
    corpus = _ds(cdf)
    # serving index over the ENGINE-embedded corpus
    cdir = tmp_path / "corpus"
    cdir.mkdir()
    pq.write_table(pa.Table.from_pandas(cdf, preserve_index=False),
                   f"{cdir}/documents.parquet")
    embed_corpus_file(str(cdir), str(cdir), dim=32)
    idx = str(tmp_path / "ivf")
    build_ivf_layout(str(cdir), idx, n_cells=2, train_rows=5)

    new = _ds(pd.DataFrame({
        "doc_id": pd.array([200, 201], dtype="int64"),
        "text": [corpus_texts[1],        # exact dup → gated out
                 _clean(77)]}))          # novel → exported AND indexed
    out = str(tmp_path / "ingested")
    res = ingest_increment(corpus, new, out, round_no=1, n_shards=2,
                           index_dir=idx, embed_dim=32)
    c = res["counts"]
    assert c["exported"] == 1 and c["indexed"] == 1
    appended = read_shards(f"{idx}/round=1").to_pandas()
    assert appended["vec_id"].tolist() == [201]
    # the index serves the appended doc (its own nearest hit at cos 1:
    # query straight from the round shards via the indexed reader)
    got = knn_ivf_indexed(str(cdir), idx, n_queries=5, k=6,
                          n_probe=2).to_pandas()
    assert set(appended["vec_id"]) <= set(got["neighbor_id"])

    # idempotence: both sinks skip on the re-run, counts identical
    res2 = ingest_increment(corpus, new, out, round_no=1, n_shards=2,
                            index_dir=idx, embed_dim=32)
    assert res2["manifest"]["written"] == []
    assert res2["index"]["written"] == []
    assert res2["counts"] == c


def test_ingest_refuses_folded_round_and_reads_layout(ray_session, tmp_path):
    """Corpus lifecycle: rounds accumulate, read_layout serves the
    union, fold_rounds retires them into a base, and a folded round_no
    can never be re-ingested (its resume machinery is gone — a re-run
    would re-export and duplicate)."""
    from olx_ray.pipelines.export import fold_rounds, read_layout
    from olx_ray.pipelines.ingest import ingest_increment

    corpus = _ds(pd.DataFrame({
        "doc_id": pd.array([1], dtype="int64"), "text": [_clean(1)]}))
    out = str(tmp_path / "ing")
    new1 = _ds(pd.DataFrame({
        "doc_id": pd.array([100], dtype="int64"), "text": [_clean(50)]}))
    res = ingest_increment(corpus, new1, out, round_no=1, weights=None,
                           n_shards=2)
    assert res["counts"]["exported"] == 1
    # pre-fold: the resume path still skips
    assert ingest_increment(corpus, new1, out, round_no=1, weights=None,
                            n_shards=2)["manifest"]["written"] == []
    assert read_layout(out).to_pandas()["doc_id"].tolist() == [100]

    assert fold_rounds(out)["folded"] == [1]
    with pytest.raises(ValueError, match="already folded"):
        ingest_increment(corpus, new1, out, round_no=1, weights=None,
                         n_shards=2)
    # a fresh round still ingests; read_layout unions base + round
    new2 = _ds(pd.DataFrame({
        "doc_id": pd.array([101], dtype="int64"), "text": [_clean(60)]}))
    ingest_increment(corpus, new2, out, round_no=2, weights=None,
                     n_shards=2)
    assert sorted(read_layout(out).to_pandas()["doc_id"]) == [100, 101]
