"""Corpus-preparation operators: oracle-checked ones run through
test_queries_oracle; here the non-SQL ops' invariants are pinned."""

import numpy as np

from olx_ray.pipelines.corpus import (contamination_13gram, pack_sequences,
                                      train_val_split)

SF = "/root/testdata/sf0.001"


def test_contamination_flags_benchmark_itself(ray_session):
    """Every benchmark doc long enough to HAVE a 13-gram must be
    flagged (it trivially shares all its own n-grams), and its hit
    count must equal its distinct-13-gram count; short docs must not
    be flagged by their own absence of n-grams."""
    from olx_ray.pipelines.dedup import shingle_hashes
    import pyarrow.dataset as pads
    import pyarrow.compute as pc

    out = contamination_13gram(SF).to_pandas().set_index("doc_id")
    bench = pads.dataset(f"{SF}/documents.parquet").to_table(
        columns=["doc_id", "text"], filter=pc.field("doc_id") < 50)
    for did, text in zip(bench["doc_id"].to_pylist(),
                         bench["text"].to_pylist()):
        n_toks = len((text or "").split())
        if n_toks >= 13:
            assert out.loc[did, "is_contaminated"], did
            own = len(set(shingle_hashes(text, 13).tolist()))
            assert out.loc[did, "n_contaminated"] >= own, did
    assert (out["n_contaminated"] > 0).equals(out["is_contaminated"])


def test_contamination_planted_copy(ray_session, tmp_path):
    """A corpus doc that contains a benchmark doc's text verbatim must
    be flagged."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    bench_text = " ".join(f"w{i}" for i in range(20))
    clean_text = " ".join(f"x{i}" for i in range(20))
    tbl = pa.table({
        "doc_id": pa.array([1, 100, 101], pa.int64()),
        "text": pa.array([bench_text,
                          "prefix " + bench_text + " suffix",
                          clean_text], pa.string()),
    })
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    out = contamination_13gram(str(tmp_path)).to_pandas() \
        .set_index("doc_id")
    assert out.loc[100, "is_contaminated"]
    assert not out.loc[101, "is_contaminated"]


def test_pack_sequences_invariants(ray_session):
    out = pack_sequences(SF, seq_len=512).to_pandas()
    import duckdb

    con = duckdb.connect()
    docs = con.sql(
        f"SELECT count(*) FROM read_parquet('{SF}/documents.parquet')"
    ).fetchone()[0]
    # every doc packed exactly once
    assert len(out) == docs and out["doc_id"].is_unique
    # capacity respected per pack; offsets contiguous in doc order
    for pid, g in out.groupby("pack_id"):
        g = g.sort_values("start_tok")
        assert g["start_tok"].iloc[0] == 0
        assert (g["start_tok"] + g["n_tokens"]).iloc[-1] <= 512
        assert (g["start_tok"].to_numpy()[1:]
                == (g["start_tok"] + g["n_tokens"]).to_numpy()[:-1]).all()
        assert g["doc_id"].iloc[0] == pid  # pack named by first doc
    # truncation flag ⟺ doc longer than capacity
    assert ((out["n_tokens"] == 512) | ~out["truncated"]).all()


def test_train_val_split_deterministic_and_sized(ray_session):
    a = train_val_split(SF).to_pandas()
    b = train_val_split(SF).to_pandas()
    assert a.equals(b)
    frac = (a["split"] == "val").mean()
    assert 0.03 < frac < 0.25  # ~10% with hash noise at 500 docs


def test_training_corpus_invariants(ray_session):
    """The composed pipeline must agree with its component operators:
    survivors are quality-filtered, exactly deduped (min doc_id per
    text), split identically to train_val_split, and packed within
    capacity per (split, pack)."""
    import duckdb

    from olx_ray.pipelines.corpus import training_corpus

    out = training_corpus(SF).to_pandas()
    con = duckdb.connect()
    dedup = con.sql(
        f"SELECT min(doc_id) AS keep FROM "
        f"read_parquet('{SF}/documents.parquet') GROUP BY text"
    ).df()
    keepers = set(dedup["keep"])
    # survivors ⊆ exact-dedup representatives, quality ≥ threshold
    assert set(out["doc_id"]) <= keepers
    assert (out["quality"] >= 0.45).all()
    assert out["doc_id"].is_unique
    # decontamination agrees with the standalone operator: no survivor
    # shares a 13-gram with the benchmark slice (and some doc WAS
    # dropped for contamination — the benchmark docs flag themselves)
    cont = contamination_13gram(SF).to_pandas()
    contaminated = set(cont.loc[cont["is_contaminated"], "doc_id"])
    assert not (set(out["doc_id"]) & contaminated)
    assert contaminated - set(out["doc_id"])
    # split agrees with the standalone operator (align on survivors —
    # decontamination + dedup drop rows)
    split = train_val_split(SF).to_pandas().set_index("doc_id")["split"]
    got_split = out.set_index("doc_id")["split"]
    assert (got_split == split.loc[got_split.index]).all()
    # packing capacity per (split, pack)
    for (_, _), g in out.groupby(["split", "pack_id"]):
        assert (g["start_tok"] + g["n_tokens"].clip(upper=512)).max() <= 512


def test_pack_sequences_zero_token_doc(ray_session, tmp_path):
    """A zero-token doc at the head of a batch must open a real pack
    (not ride the -1 sentinel with start_tok=seq_len)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["", "a b c", "d e"], pa.string()),
    })
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    out = pack_sequences(str(tmp_path), seq_len=512).to_pandas()
    assert (out["pack_id"] >= 0).all()
    assert out.loc[out["doc_id"] == 1, "start_tok"].iloc[0] == 0
    assert (out["start_tok"] + out["n_tokens"] <= 512).all()


def test_stratified_sample_covers_every_stratum(ray_session):
    import duckdb

    from olx_ray.pipelines.corpus import stratified_sample

    out = stratified_sample(SF).to_pandas()
    con = duckdb.connect()
    pop = con.sql(f"SELECT lang, count(*) n FROM "
                  f"read_parquet('{SF}/documents.parquet') GROUP BY lang").df()
    got = out.groupby("lang").size()
    for _, row in pop.iterrows():
        assert got.get(row["lang"], 0) == int(np.ceil(row["n"] * 0.20)), row


def test_redact_pii_patterns():
    """URL/email/number scrubbing fires on synthetic PII and leaves
    clean text untouched (pattern subset chosen for exact Python-re /
    DuckDB-RE2 agreement — the oracle pins corpus-level parity)."""
    import pandas as pd

    from olx_ray.pipelines.text import RedactPII

    r = RedactPII()
    df = pd.DataFrame({
        "doc_id": [1, 2],
        "text": ["mail a@b.co see https://x.y/z?u=1 call 0501 234 567 end",
                 "plain words only"],
    })
    out = r(df)["redacted"].tolist()
    assert out[0] == "mail <EMAIL> see <URL> call <NUM> end"
    assert out[1] == "plain words only"


def test_epoch_shuffle_permutation_and_epoch_variation(ray_session):
    """epoch_shuffle: every epoch is a permutation of the corpus,
    deterministic in (ids, epoch, seed), partition-invariant, and
    different epochs produce different orders."""
    import pandas as pd
    import ray.data as rd

    from olx_ray.pipelines.corpus import epoch_shuffle

    df = pd.DataFrame({"doc_id": range(200), "text": "x"})

    def order(ds, epoch, seed=0):
        out = epoch_shuffle(ds, epoch, seed=seed).to_pandas()
        assert sorted(out.doc_id) == list(range(200))   # permutation
        return list(out.doc_id)

    e0 = order(rd.from_pandas(df), 0)
    assert e0 == order(rd.from_pandas(df), 0)                    # rerun
    assert e0 == order(rd.from_pandas(df).repartition(7), 0)     # partitioning
    assert e0 != order(rd.from_pandas(df), 1)                    # epoch varies
    assert e0 != order(rd.from_pandas(df), 0, seed=99)           # seed varies
    assert e0 != list(range(200))                                # not identity


def test_chunk_documents_oracle_and_edges(ray_session, tmp_path):
    """chunk_documents == its DuckDB oracle on sf0.001, plus hand-built
    edge docs: empty, whitespace-only, exactly max_tokens, one-past,
    and an overlap-boundary length."""
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from olx_ray.pipelines.corpus import (CHUNK_DOCUMENTS_SQL_TMPL,
                                          chunk_documents)

    def compare(sf_dir, maxt, ov):
        got = chunk_documents(sf_dir, max_tokens=maxt, overlap=ov) \
            .to_pandas()
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/documents.parquet')")
        want = con.execute(CHUNK_DOCUMENTS_SQL_TMPL.format(
            overlap=ov, stride=maxt - ov, maxt=maxt)).df()
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want.reset_index(drop=True),
            check_dtype=False)
        return got

    compare(SF, 64, 16)

    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": ["", "   \t ",
                 " ".join(f"w{i}" for i in range(8)),      # == max
                 " ".join(f"w{i}" for i in range(9)),      # one past
                 " ".join(f"w{i}" for i in range(6 + 2))]})  # n-ov on edge
    d = tmp_path / "sf_chunks"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))
    got = compare(str(d), 8, 2)
    g = got.set_index(["doc_id", "chunk_idx"])
    assert 1 not in got["doc_id"].values and 2 not in got["doc_id"].values
    assert g.loc[(3, 0), "n_tokens"] == 8 and (3, 1) not in g.index
    # doc 4 (9 tokens): windows [0:8] and [6:9] — tail covered once
    assert g.loc[(4, 0), "n_tokens"] == 8
    assert g.loc[(4, 1), "start_tok"] == 6
    assert g.loc[(4, 1), "chunk_text"] == "w6 w7 w8"
    # reconstruction: chunk 0 + later chunks minus their overlap prefix
    toks = (g.loc[(4, 0), "chunk_text"].split()
            + g.loc[(4, 1), "chunk_text"].split()[2:])
    assert toks == [f"w{i}" for i in range(9)]


def test_corpus_report_exact_below_capacity(ray_session):
    """On sf0.001 every sketch is below capacity, so the one-pass
    report must be EXACT: scalars, lang counts, distinct texts,
    dup rate, and the top-word ranking."""
    import pandas as pd

    from olx_ray.pipelines.corpus import corpus_report

    rep = corpus_report(SF, top_words=10).to_pandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text", "lang"])
    get = lambda m: rep.loc[rep["metric"] == m, "value"].iloc[0]
    toks = docs["text"].fillna("").str.split()
    assert get("n_docs") == len(docs)
    assert get("total_tokens") == int(toks.str.len().sum())
    assert get("total_chars") == int(docs["text"].fillna("").str.len().sum())
    norm = toks.str.join(" ")
    n_distinct = norm.nunique()
    assert get("distinct_text_est") == n_distinct
    assert abs(get("exact_dup_rate_est")
               - (1 - n_distinct / len(docs))) < 1e-6
    langs = rep[rep["metric"] == "lang"].set_index("key")["value"]
    for lang, c in docs["lang"].value_counts().items():
        assert langs[str(lang)] == c
    words = rep[rep["metric"] == "word"]
    vc = toks.explode().dropna().value_counts()
    want = sorted(vc.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert list(words["key"]) == [w for w, _ in want]
    assert list(words["value"]) == [float(c) for _, c in want]
    # gopher rates: exact vs the kernel run driver-side over all docs
    from olx_ray.pipelines.text import GopherRules

    gm = GopherRules()(docs)
    assert abs(get("gopher_pass_rate")
               - gm["keep"].sum() / len(docs)) < 1e-6
    gf = rep[rep["metric"] == "gopher_fail_rate"].set_index("key")["value"]
    fm = gm["fail_mask"].to_numpy()
    for bit in range(7):
        assert abs(gf[str(bit)]
                   - (fm & (1 << bit) != 0).sum() / len(docs)) < 1e-6
    # opt-out removes the per-doc kernel and its rows
    from olx_ray.pipelines.corpus import corpus_report as _cr

    lean = _cr(SF, top_words=3, gopher=False).to_pandas()
    assert not lean["metric"].str.startswith("gopher").any()


def test_corpus_drift_zero_and_detects_shift(ray_session, tmp_path):
    """Identical snapshots → ~zero drift on every axis; a junk-injected
    snapshot → clear word-JS and length-histogram movement. Symmetric."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from olx_ray.pipelines.corpus import corpus_drift

    rng = np.random.default_rng(8)
    vocab = ["market", "report", "shows", "steady", "growth", "sales"]
    base = [" ".join(rng.choice(vocab, 12)) for _ in range(80)]

    def write(texts, name):
        d = tmp_path / name
        d.mkdir()
        pq.write_table(pa.table({
            "doc_id": pa.array(range(1, len(texts) + 1), pa.int64()),
            "text": texts}), str(d / "documents.parquet"))
        return str(d)

    a = write(base, "snap_a")
    a2 = write(list(base), "snap_a2")
    drifted = base[:40] + ["zzqx jjkk " * 30 for _ in range(40)]
    b = write(drifted, "snap_b")

    same = corpus_drift(a, a2)
    assert float(same["js_divergence_words"].iloc[0]) < 1e-9
    assert float(same["len_hist_l1"].iloc[0]) == 0.0
    assert float(same["mean_tokens_delta"].iloc[0]) == 0.0

    moved = corpus_drift(a, b)
    assert float(moved["js_divergence_words"].iloc[0]) > 0.2
    assert float(moved["len_hist_l1"].iloc[0]) > 0.5
    rev = corpus_drift(b, a)
    assert float(rev["js_divergence_words"].iloc[0]) == \
        float(moved["js_divergence_words"].iloc[0])


def test_corpus_drift_detects_tail_only_shift(ray_session, tmp_path):
    """Identical heavy hitters but disjoint LONG TAILS (each tail word
    below the MG surfacing threshold) must still register word drift —
    the OTHER tail-mass cell regression from the review finding."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from olx_ray.pipelines.corpus import corpus_drift

    head = "alpha beta gamma delta " * 5          # dominant everywhere
    tail_a = [f"rare{i}" for i in range(300)]
    tail_b = [f"spam{i}" for i in range(300)]

    def write(tail, name):
        texts = [head + " ".join(tail[i:i + 3]) for i in range(0, 300, 3)]
        d = tmp_path / name
        d.mkdir()
        pq.write_table(pa.table({
            "doc_id": pa.array(range(1, len(texts) + 1), pa.int64()),
            "text": texts}), str(d / "documents.parquet"))
        return str(d)

    a, b = write(tail_a, "tail_a"), write(tail_b, "tail_b")
    # capacity 8 surfaces only the head words; the two EQUAL-MASS
    # disjoint tails are invisible to any heavy-hitter summary (JS
    # correctly stays ~0) — the KMV vocabulary-resemblance signal is
    # what must move: 4 shared head words vs 300 disjoint tail words
    moved = corpus_drift(a, b, capacity=8)
    assert float(moved["vocab_jaccard_est"].iloc[0]) < 0.3
    same = corpus_drift(a, a, capacity=8)
    assert float(same["vocab_jaccard_est"].iloc[0]) == 1.0
    assert float(same["js_divergence_words"].iloc[0]) < 1e-9


def _interleaved_docs():
    import pyarrow as pa

    def span(kind, text=None, ref=None, off=0):
        return {"kind": kind, "text": text, "media_ref": ref, "offset": off}

    rows = {
        "a": [span("title", "one two", off=0),
              span("image", ref="m/1.ppm", off=1),
              span("description", "three four five", off=2)],
        "b": [span("title", "six", off=0)],
        "c": [span("image", ref="m/2.ppm", off=0),
              span("image", ref="m/3.ppm", off=1)],
        "d": [span("description", " ".join(["w"] * 500), off=0)],
        "e": [],
    }
    from olx_ray.schema import SPAN

    return pa.table({
        "doc_id": pa.array(sorted(rows), pa.string()),
        "spans": pa.array([rows[k] for k in sorted(rows)],
                          pa.list_(SPAN)),
    })


def test_pack_interleaved_costs_and_invariants(ray_session):
    import pandas as pd
    import ray.data as rd

    from olx_ray.pipelines.corpus import pack_interleaved

    ds = rd.from_arrow(_interleaved_docs())
    out = pack_interleaved(ds, seq_len=64, media_tokens=32).to_pandas() \
        .set_index("doc_id")
    # costs: a = 2 text + 32 media + 3 text = 37 tokens, 2+3 text, 1 media
    assert out.loc["a", "n_tokens"] == 37
    assert out.loc["a", "n_text_tokens"] == 5
    assert out.loc["a", "n_media"] == 1
    assert out.loc["b", "n_tokens"] == 1 and out.loc["b", "n_media"] == 0
    assert out.loc["c", "n_tokens"] == 64 and out.loc["c", "n_media"] == 2
    # d: 500 text tokens > seq_len → own pack, truncated to 64
    assert out.loc["d", "n_tokens"] == 64 and bool(out.loc["d", "truncated"])
    assert out.loc["e", "n_tokens"] == 0 and out.loc["e", "n_media"] == 0
    # greedy doc-order packing at seq_len=64: a(37)+b(1)=38, c(64)
    # overflows -> new pack, d oversized -> own pack, e(0) joins d's pack?
    # d fills 64 exactly so e opens.. start==0 in some pack; invariants:
    g = out.reset_index().groupby("pack_id")
    for _, grp in g:
        fill = grp["n_tokens"].sum()
        assert fill <= 64 or (len(grp) == 1 and grp["truncated"].iloc[0])
        # start offsets are the running fill in doc order
        grp = grp.sort_values("doc_id")
        assert list(grp["start_tok"]) == \
            list(np.cumsum([0] + list(grp["n_tokens"][:-1])))
    assert out.index.is_unique and len(out) == 5     # every doc once
    # determinism
    again = pack_interleaved(rd.from_arrow(_interleaved_docs()),
                             seq_len=64, media_tokens=32).to_pandas()
    pd.testing.assert_frame_equal(
        out.reset_index()[list(again.columns)], again, check_dtype=False)


def test_pack_interleaved_over_crawl_output(ray_session, tmp_root):
    """The operator consumes the REAL crawl payload schema end-to-end."""
    import os

    from olx_ray.pipelines.corpus import pack_interleaved
    from olx_ray.pipelines.crawl import CrawlConfig, crawl_native, read_documents
    from olx_ray.sources.sitegen import SITE_VERSION, SiteSpec, ensure_site

    site = ensure_site("t1", os.path.join(
        tmp_root, f"pack_site_v{SITE_VERSION}"))
    out_dir = os.path.join(tmp_root, "pack_crawl")
    if not os.path.isdir(out_dir):
        crawl_native(CrawlConfig(pages_dir=site["pages"], out_dir=out_dir),
                     SiteSpec("t1").seed_rows())
    docs = read_documents(out_dir)
    packed = pack_interleaved(docs.select_columns(["doc_id", "spans"]),
                              seq_len=256).to_pandas()
    assert len(packed) == docs.count() > 0
    assert packed["doc_id"].is_unique
    assert (packed["n_tokens"] >= 0).all()
    assert (packed["n_media"] > 0).any()          # ads carry image spans


def test_leakage_safe_split_no_straddling_pairs(ray_session):
    """No verified near-dup pair may straddle train/val; singleton
    groups reproduce train_val_split's assignment exactly."""
    import pandas as pd

    from olx_ray.pipelines.corpus import leakage_safe_split
    from olx_ray.pipelines.dedup import minhash_lsh_pairs

    out = leakage_safe_split(SF).to_pandas()
    a = out.set_index("doc_id")
    pairs = minhash_lsh_pairs(SF).to_pandas()
    assert len(pairs) > 0                 # the guard has work to do
    straddle = (a.loc[pairs["doc_a"], "split"].to_numpy()
                != a.loc[pairs["doc_b"], "split"].to_numpy())
    assert not straddle.any()
    # groups are split-homogeneous wholesale, not just over pairs
    assert (out.groupby("group_id")["split"].nunique() == 1).all()
    # singletons == plain train_val_split
    singles = out[out["group_size"] == 1].set_index("doc_id")["split"]
    plain = train_val_split(SF).to_pandas().set_index("doc_id")["split"]
    assert (singles == plain.loc[singles.index]).all()
    # every doc exactly once; both sides populated
    assert out["doc_id"].is_unique and len(out) == len(plain)
    assert set(out["split"]) == {"train", "val"}
    # deterministic
    again = leakage_safe_split(SF).to_pandas()
    pd.testing.assert_frame_equal(out, again)


def test_greedy_pack_edge_cases():
    """The shared packer's pinned guarantees: start_tok < seq_len
    always; oversized docs pack alone; zero-cost docs never dangle
    past a full pack."""
    from olx_ray.pipelines.corpus import _greedy_pack

    # zero-cost doc after an exactly-full pack opens a NEW pack
    p, s, n, t = _greedy_pack([1, 2], [64, 0], 64)
    assert p == [1, 2] and s == [0, 0] and t == [False, False]
    # oversized truncated doc: own pack; nothing joins after it
    p, s, n, t = _greedy_pack([1, 2, 3], [10, 500, 0], 64)
    assert p == [1, 2, 3] and s == [0, 0, 0]
    assert n == [10, 64, 0] and t == [False, True, False]
    # oversized never joins an already-opened pack, even at zero fill
    p, s, n, t = _greedy_pack([1, 2], [0, 500], 64)
    assert p == [1, 2] and s == [0, 0]
    # normal greedy fill unchanged
    p, s, n, t = _greedy_pack([1, 2, 3], [30, 30, 30], 64)
    assert p == [1, 1, 3] and s == [0, 30, 0]


def test_temperature_mix_limits(ray_session):
    """T=1 == raw weighted_interleave; higher T up-samples the small
    source within any prefix; T<=0 refused; excluded sources stay out."""
    import pandas as pd
    import pytest
    import ray.data as rd

    from olx_ray.pipelines.corpus import temperature_mix, weighted_interleave

    def mk(n, tag):
        return rd.from_pandas(pd.DataFrame(
            {"doc_id": range(n), "src": tag}))

    def sources(wb=9.0, ws=1.0):
        return {"big": (mk(900, "b"), wb), "small": (mk(100, "s"), ws)}

    t1 = temperature_mix(sources(), temperature=1.0).to_pandas()
    raw = weighted_interleave(sources()).to_pandas()
    # T=1 ≡ raw ORDER (renormalizing scales every exp-clock uniformly,
    # so key values shift but the stream order is identical)
    assert list(t1["mix_source"]) == list(raw["mix_source"])
    assert list(t1["doc_id"]) == list(raw["doc_id"])

    hot = temperature_mix(sources(), temperature=100.0).to_pandas()
    # T→∞ flattens the per-row weights to equal, so the small source's
    # prefix share climbs from its T=1 suppression (~w_s/w_b · rows)
    # toward its plain ROW share (10 %)
    frac_small_t1 = (t1.head(200)["mix_source"] == "small").mean()
    frac_small_hot = (hot.head(200)["mix_source"] == "small").mean()
    assert frac_small_hot > frac_small_t1 + 0.04
    assert 0.05 < frac_small_hot < 0.16     # ≈ the 10 % row share
    with pytest.raises(ValueError, match="temperature"):
        temperature_mix(sources(), temperature=0.0)
    # excluded source stays excluded at any T
    out = temperature_mix({"a": (mk(50, "a"), 1.0),
                           "z": (mk(50, "z"), 0.0)},
                          temperature=5.0).to_pandas()
    assert set(out["mix_source"]) == {"a"}


def test_temperature_mix_extreme_weights(ray_session):
    """Review-found: big weights at sharp T must not overflow; tiny
    positive weights must stay IN the stream (never silently excluded
    by pow underflow)."""
    import pandas as pd
    import ray.data as rd

    from olx_ray.pipelines.corpus import temperature_mix

    def mk(n, tag, base=0):
        return rd.from_pandas(pd.DataFrame(
            {"doc_id": range(base, base + n), "src": tag}))

    # 5000**100 would overflow a raw pow
    out = temperature_mix({"web": (mk(20, "w"), 5000.0),
                           "ref": (mk(20, "r"), 100.0)},
                          temperature=0.01).to_pandas()
    assert set(out["mix_source"]) == {"web", "ref"} and len(out) == 40
    # (1e-4)**100 would underflow to 0 and silently drop the source
    out2 = temperature_mix({"a": (mk(20, "a"), 1.0),
                            "b": (mk(20, "b"), 1e-4)},
                           temperature=0.01).to_pandas()
    assert set(out2["mix_source"]) == {"a", "b"} and len(out2) == 40
    # the clamped source demotes to the tail under extreme sharpening
    assert list(out2["mix_source"].head(20)) == ["a"] * 20


def test_pack_interleaved_int64_ids_numeric_order(ray_session):
    """int64 doc_ids keep their dtype through cost() and pack in
    NUMERIC order (a string cast would pack doc 10 before doc 2)."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from olx_ray.pipelines.corpus import pack_interleaved
    from olx_ray.schema import SPAN

    def spans(words):
        return [{"kind": "text", "text": " ".join(["w"] * words),
                 "media_ref": None, "offset": 0}]

    tbl = pa.table({
        "doc_id": pa.array([10, 2, 33], pa.int64()),
        "spans": pa.array([spans(4), spans(3), spans(5)], pa.list_(SPAN)),
    })
    # n_buckets=1: all docs in one pack bucket → pure doc_id-order
    # packing, isolating the numeric-vs-lexicographic ordering claim
    out = pack_interleaved(rd.from_arrow(tbl), seq_len=8,
                           n_buckets=1).to_pandas()
    assert pd.api.types.is_integer_dtype(out["doc_id"])
    assert pd.api.types.is_integer_dtype(out["pack_id"])
    by = out.set_index("doc_id")
    # numeric doc order: 2(3) + 10(4) fit one pack (7 ≤ 8); 33 opens new
    assert by.loc[2, "pack_id"] == 2 and by.loc[2, "start_tok"] == 0
    assert by.loc[10, "pack_id"] == 2 and by.loc[10, "start_tok"] == 3
    assert by.loc[33, "pack_id"] == 33 and by.loc[33, "start_tok"] == 0


def _write_layouts(tmp_path, tbl):
    """Same table, two physical layouts: one file vs a directory of
    shuffled-order part files — packing must not see the difference."""
    import pyarrow.parquet as pq

    a = tmp_path / "a"
    b = tmp_path / "b" / "documents.parquet"
    a.mkdir(parents=True)
    b.mkdir(parents=True)
    pq.write_table(tbl, str(a / "documents.parquet"))
    n = tbl.num_rows
    order = list(range(n))
    order = order[2::3] + order[1::3] + order[0::3]   # scrambled rows
    shuffled = tbl.take(order)
    step = max(1, n // 5)
    for i in range(0, n, step):
        pq.write_table(shuffled.slice(i, step), str(b / f"part{i:04d}.parquet"))
    return str(a), str(tmp_path / "b")


def test_pack_sequences_partition_invariant(ray_session, tmp_path):
    """Pack assignment is a pure function of the table: identical
    output whatever the file/block layout (VERDICT r3 task 4)."""
    import pandas as pd
    import pyarrow as pa

    rng = np.random.default_rng(7)
    n = 300
    tbl = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array([" ".join(f"w{i}x{j}" for j in range(int(k)))
                          for i, k in enumerate(rng.integers(0, 90, n))],
                         pa.string()),
    })
    a, b = _write_layouts(tmp_path, tbl)
    pa_ = pack_sequences(a, seq_len=128).to_pandas().reset_index(drop=True)
    pb_ = pack_sequences(b, seq_len=128).to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(pa_, pb_)
    # multiple docs share packs (the bucketing didn't degenerate to
    # one-doc-per-pack)
    assert pa_.groupby("pack_id").size().max() >= 2


def test_training_corpus_partition_invariant(ray_session, tmp_path):
    import pandas as pd
    import pyarrow as pa

    from olx_ray.pipelines.corpus import training_corpus

    rng = np.random.default_rng(11)
    n = 200
    texts = []
    for i in range(n):
        k = int(rng.integers(20, 60))
        # unique per doc: shared 13-grams with the doc_id<50 benchmark
        # slice would decontaminate everything away
        texts.append(" ".join(f"d{i}w{j}" for j in range(k)) + ".")
    tbl = pa.table({"doc_id": pa.array(range(n), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    a, b = _write_layouts(tmp_path, tbl)
    ta = training_corpus(a, quality_min=0.0).to_pandas().reset_index(drop=True)
    tb = training_corpus(b, quality_min=0.0).to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(ta, tb)
    assert len(ta) > 0


def test_pack_interleaved_partition_invariant(ray_session):
    import pandas as pd
    import ray.data as rd

    from olx_ray.pipelines.corpus import pack_interleaved

    tbl = _interleaved_docs()
    one = pack_interleaved(rd.from_arrow(tbl).repartition(1),
                           seq_len=64).to_pandas()
    many = pack_interleaved(rd.from_arrow(tbl).repartition(5),
                            seq_len=64).to_pandas()
    pd.testing.assert_frame_equal(one, many)


def test_training_corpus_oracle_adversarial_packing(ray_session, tmp_path):
    """training_corpus ≡ training_corpus_sql on a crafted corpus that
    exercises the packer branches the SF fixtures never reach (max 99
    tokens there): OVERSIZED docs (>512 — own pack, nothing joins),
    exactly-512 docs (next doc must open a new pack), zero-token docs
    (quality_min=0.0 lets them through; they must open real packs),
    duplicate texts (dedup keeps min id), and a contaminated doc
    sharing a 13-gram with the benchmark slice."""
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from olx_ray.pipelines.corpus import training_corpus, training_corpus_sql

    rng = np.random.default_rng(5)
    words = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta",
             "theta", "iota", "kappa"]

    def text_of(n, salt):
        r = np.random.default_rng(salt)
        return " ".join(words[i] for i in r.integers(0, 10, n))

    rows = []
    # benchmark slice (doc_id < 50): one long doc whose grams poison
    rows.append((3, text_of(30, 3)))
    # contaminated: shares benchmark doc 3's first 13 tokens
    rows.append((60, text_of(30, 3).rsplit(" ", 10)[0]))
    rows.append((61, ""))                      # zero tokens
    rows.append((62, "   "))                   # whitespace only
    rows.append((63, text_of(600, 63)))        # oversized
    rows.append((64, text_of(512, 64)))        # exactly seq_len
    rows.append((65, text_of(5, 65)))          # after the full pack
    rows.append((66, text_of(513, 66)))        # oversized by one
    rows.append((67, text_of(5, 65)))          # duplicate text of doc 65
    for i in range(68, 120):                   # filler with varied sizes
        rows.append((i, text_of(int(rng.integers(0, 300)), i)))
    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "lang": pa.array(["en"] * len(rows), pa.string()),
        "text": pa.array([r[1] for r in rows], pa.string())})
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))

    eng = training_corpus(str(tmp_path), quality_min=0.0) \
        .to_pandas().reset_index(drop=True)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{tmp_path}/documents.parquet')")
    want = con.sql(training_corpus_sql(quality_min=0.0)).df()
    pd.testing.assert_frame_equal(eng, want, check_dtype=False)
    # branch coverage sanity: the fixture really exercised them
    assert 60 not in set(eng.doc_id)           # contaminated dropped
    assert 67 not in set(eng.doc_id)           # duplicate dropped
    big = eng[eng.doc_id.isin((63, 66))]
    assert (big.pack_id == big.doc_id).all()   # oversized → own pack
    assert (eng.start_tok < 512).all()
    assert set(eng.doc_id[eng.n_tokens == 0])  # zero-token docs packed


def test_training_corpus_all_filtered_empty(ray_session, tmp_path):
    """Every doc below the quality bar → empty output from BOTH the
    engine (typed empty frame, no zero-row KeyError) and the recursive
    CTE (empty base case terminates immediately)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from olx_ray.pipelines.corpus import training_corpus, training_corpus_sql

    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "lang": pa.array(["en", "en"], pa.string()),
        "text": pa.array(["", "   "], pa.string())}),
        str(tmp_path / "documents.parquet"))
    eng = training_corpus(str(tmp_path), quality_min=0.99).to_pandas()
    assert len(eng) == 0
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{tmp_path}/documents.parquet')")
    want = con.sql(training_corpus_sql(quality_min=0.99)).df()
    assert len(want) == 0
    assert list(want.columns) == ["doc_id", "n_tokens", "quality",
                                  "split", "pack_id", "start_tok"]


def test_contamination_semantic_vs_duckdb(ray_session):
    """Full DuckDB oracle for the embedding-space decontamination gate
    (counts + flags exact, max_cos at the house 6-decimal
    canonicalization), plus the sibling invariant: benchmark rows flag
    themselves."""
    import duckdb

    from olx_ray.pipelines.corpus import (CONTAMINATION_SEMANTIC_SQL,
                                          contamination_semantic)

    # synthetic embeddings are near-uniform: use a threshold the
    # fixture actually crosses (pairs exist at 0.45) so the gate fires
    # beyond the trivial self-match
    thr, bmax = 0.45, 50
    got = contamination_semantic(SF, threshold=thr,
                                 benchmark_max_id=bmax).to_pandas()
    got["max_cos"] = got["max_cos"].round(6)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS "
            f"SELECT * FROM '{SF}/embeddings.parquet'")
    want = con.sql(CONTAMINATION_SEMANTIC_SQL.format(
        threshold=thr, benchmark_max_id=bmax)).df()
    assert list(got.columns) == list(want.columns)
    assert got["vec_id"].tolist() == want["vec_id"].tolist()
    assert got["n_contaminated"].tolist() == want["n_contaminated"].tolist()
    assert got["is_contaminated"].tolist() == want["is_contaminated"].tolist()
    assert np.allclose(got["max_cos"], want["max_cos"], atol=2e-6)
    # benchmark self-match: every vec_id < bmax is contaminated at 1.0
    bench = got[got["vec_id"] < bmax]
    assert bench["is_contaminated"].all()
    assert np.allclose(bench["max_cos"], 1.0, atol=1e-9)
    # the gate must fire beyond self-matches on this fixture
    assert got[got["vec_id"] >= bmax]["is_contaminated"].any()
    # empty benchmark is a loud error, not a silent all-clean pass
    import pytest as _pytest
    with _pytest.raises(ValueError, match="no benchmark rows"):
        contamination_semantic(SF, benchmark_max_id=0)


def test_token_quantiles_empty_corpus(ray_session, tmp_path):
    """Zero-row corpus: typed empty result, not an IndexError."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from olx_ray.pipelines.corpus import token_quantiles

    d = tmp_path / "sf_empty"
    d.mkdir()
    pq.write_table(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string()),
        "lang": pa.array([], pa.string())}), f"{d}/documents.parquet")
    got = token_quantiles(str(d))
    assert len(got) == 0 and list(got.columns) == ["q", "n_tokens"]


def test_contamination_semantic_zero_vectors(ray_session, tmp_path):
    """An all-zero embedding must score cos 0 against everything (NOT
    NaN): an unguarded 0/0 made the row silently never-contaminated —
    the one false negative a decontamination gate cannot have."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from olx_ray.pipelines.corpus import contamination_semantic

    d = tmp_path / "sf_zero"
    d.mkdir()
    vecs = [[1.0, 0.0], [0.0, 0.0], [1.0, 0.0], [0.0, 0.0]]
    pq.write_table(pa.table({
        "vec_id": pa.array([0, 1, 100, 101], pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float64()))}),
        f"{d}/embeddings.parquet")
    got = contamination_semantic(str(d), threshold=0.95,
                                 benchmark_max_id=50).to_pandas() \
        .set_index("vec_id")
    assert np.isfinite(got["max_cos"]).all()          # no NaN anywhere
    assert bool(got.loc[100, "is_contaminated"])      # real dup caught
    assert not bool(got.loc[101, "is_contaminated"])  # zero vec: cos 0
    assert got.loc[101, "max_cos"] == 0.0


def test_pack_sequences_bucket_matches_training_corpus(ray_session,
                                                       tmp_path):
    """All three packers share ONE bucket hash (_pack_bucket): pack
    composition depends on the assignment, so pack_sequences drifting
    to a different hash would make its pack_id sets un-joinable with
    training_corpus / write_training_shards output."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from olx_ray.pipelines.corpus import (_greedy_pack, _pack_bucket,
                                          pack_sequences)

    ids = np.arange(1, 251, dtype=np.int64)
    d = tmp_path / "sf_pack"
    d.mkdir()
    pq.write_table(pa.table({
        "doc_id": pa.array(ids),
        "text": pa.array(["w " * 10] * len(ids), pa.string()),
        "lang": pa.array(["en"] * len(ids), pa.string())}),
        f"{d}/documents.parquet")
    got = pack_sequences(str(d), seq_len=64, n_buckets=8).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    # reference: same bucket hash + same greedy packer, in doc order
    rows = []
    pb = _pack_bucket(ids, 8)
    for b in sorted(set(pb)):
        bids = np.sort(ids[pb == b])
        counts = np.full(len(bids), 10, dtype=np.int64)
        pid, st, nt, tr = _greedy_pack(bids, counts, 64)
        rows += list(zip(pid, bids, st, nt, tr))
    want = pd.DataFrame(rows, columns=["pack_id", "doc_id", "start_tok",
                                       "n_tokens", "truncated"]) \
        .sort_values("doc_id").reset_index(drop=True)
    for c in ["pack_id", "doc_id", "start_tok", "n_tokens"]:
        assert got[c].astype("int64").tolist() == \
            want[c].astype("int64").tolist(), c
