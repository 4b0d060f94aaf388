"""Library-only text operators (not on the 50-entry driver surface)
against their own DuckDB oracles."""

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_repetition_stats_vs_duckdb(ray_session):
    from olx_ray.pipelines.text import REPETITION_STATS_SQL, repetition_stats

    got = repetition_stats(SF).to_pandas().reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    want = con.sql(REPETITION_STATS_SQL).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=False, rtol=1e-6)
    # the signal is non-degenerate on the fixture corpus
    assert (got["dup_token_ratio"] > 0).any()
    assert (got["top_2gram_ratio"] > 0).any()


def test_repetition_stats_edges(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from olx_ray.pipelines.text import repetition_stats

    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(["", "one", "a a a a", "x y x y x y"], pa.string()),
    })
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    out = repetition_stats(str(tmp_path)).to_pandas().set_index("doc_id")
    assert out.loc[1, "n_tokens"] == 0 and out.loc[1, "dup_token_ratio"] == 0
    assert out.loc[2, "top_2gram_ratio"] == 0          # no bigram
    assert out.loc[3, "dup_token_ratio"] == 0.75       # 1 distinct of 4
    assert out.loc[3, "top_2gram_ratio"] == 1.0        # (a,a) every time
    assert abs(out.loc[4, "top_2gram_ratio"] - 3 / 5) < 1e-9


def test_word_freq_topk_approx_exact_when_capacity_suffices(ray_session):
    """With capacity ≥ distinct words the MG sketch never decrements —
    the approx path must equal the exact shuffle path row-for-row."""
    from olx_ray.pipelines.text import word_freq_topk, word_freq_topk_approx

    exact = word_freq_topk(SF, k=25).to_pandas().reset_index(drop=True)
    approx = word_freq_topk_approx(SF, k=25).to_pandas().reset_index(drop=True)
    assert approx.equals(exact)


def test_mg_reduce_heavy_hitter_guarantee():
    """Any word with true count > N/(capacity+1) survives merged
    reduction, and surviving counts are lower bounds (PODS'12)."""
    import numpy as np
    import pandas as pd

    from olx_ray.pipelines.text import _mg_reduce

    rng = np.random.default_rng(3)
    true = {f"w{i}": int(c) for i, c in
            enumerate(rng.zipf(1.6, 400).clip(1, 10_000))}
    n_total = sum(true.values())
    cap = 16
    # simulate distributed merging: random batch partition of the corpus
    words = np.repeat(list(true), list(true.values()))
    rng.shuffle(words)
    summaries = []
    for chunk in np.array_split(words, 23):
        vc = pd.Series(chunk).value_counts()
        summaries.append(_mg_reduce(
            vc.rename_axis("word").reset_index(name="n"), cap))
    merged = pd.concat(summaries).groupby("word", as_index=False)["n"].sum()
    final = _mg_reduce(merged, cap).set_index("word")["n"]
    bound = n_total / (cap + 1)
    for w, c in true.items():
        if c > bound:
            assert w in final.index, (w, c, bound)
        if w in final.index:
            assert final[w] <= c          # counts are lower bounds
            assert c - final[w] <= bound  # undercount within guarantee


def test_tfidf_top_terms_vs_duckdb(ray_session):
    from olx_ray.pipelines.text import TFIDF_SQL_TEMPLATE, tfidf_top_terms

    got = tfidf_top_terms(SF, k=3).to_pandas() \
        .sort_values(["doc_id", "score", "word"],
                     ascending=[True, False, True]).reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    want = con.sql(TFIDF_SQL_TEMPLATE.format(k=3)).df()
    assert len(got) == len(want) > 100
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=False, rtol=1e-9)


def test_tfidf_strategy_agreement(ray_session):
    """Broadcast and shuffle idf delivery are output-identical —
    max_broadcast_vocab=0 forces the join path."""
    from olx_ray.pipelines.text import tfidf_top_terms

    def norm(ds):
        return ds.to_pandas().sort_values(
            ["doc_id", "score", "word"], ascending=[True, False, True]) \
            .reset_index(drop=True)

    a = norm(tfidf_top_terms(SF, k=2))
    b = norm(tfidf_top_terms(SF, k=2, max_broadcast_vocab=0))
    pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                  check_exact=False, rtol=1e-12)


def test_bm25_topk_matches_reference(ray_session):
    """bm25_topk == a plain-Python Okapi BM25 reference on sf0.001,
    same idf/tf formulas and (score desc, doc_id asc) tie-break."""
    import numpy as np
    import pandas as pd

    from olx_ray.pipelines.text import bm25_topk

    sf = "/root/testdata/sf0.001"
    docs = pd.read_parquet(f"{sf}/documents.parquet",
                           columns=["doc_id", "text"])
    query = docs["text"].iloc[0].split()[:3]
    query = " ".join(query + ["zz-never-seen"])
    k1, b, k = 1.2, 0.75, 15

    toks = [t.split() for t in docs["text"].fillna("")]
    n = len(docs)
    avgdl = max(sum(len(t) for t in toks) / max(n, 1), 1e-9)
    terms = sorted(set(query.split()))
    dfm = {t: sum(1 for d in toks if t in d) for t in terms}
    idf = {t: float(np.log(1 + (n - dfm[t] + 0.5) / (dfm[t] + 0.5)))
           for t in terms}
    rows = []
    for did, d in zip(docs["doc_id"], toks):
        s = 0.0
        for t in terms:
            tf = d.count(t)
            if tf:
                s += idf[t] * tf * (k1 + 1) / (
                    tf + k1 * (1 - b + b * len(d) / avgdl))
        if s > 0:
            rows.append((did, s))
    want = sorted(rows, key=lambda r: (-r[1], r[0]))[:k]

    got = bm25_topk(sf, query, k=k, k1=k1, b=b).to_pandas()
    assert list(got["doc_id"]) == [r[0] for r in want]
    np.testing.assert_allclose(got["score"].to_numpy(),
                               [r[1] for r in want], rtol=1e-12)


def test_bm25_empty_query_raises(ray_session):
    import pytest

    from olx_ray.pipelines.text import bm25_topk

    with pytest.raises(ValueError, match="empty query"):
        bm25_topk("/root/testdata/sf0.001", "   ")


def test_bm25_sentinel_token_in_query(ray_session, tmp_path):
    """A query containing the literal tokens __N__/__L__ must not
    corrupt the corpus stats (review finding: shared namespace)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from olx_ray.pipelines.text import bm25_topk

    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": ["__N__ alpha beta", "alpha beta gamma", "delta"]})
    d = tmp_path / "sf_bm"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))
    out = bm25_topk(str(d), "__N__ alpha", k=3).to_pandas()
    # doc 1 matches both terms → ranks first; doc 3 matches nothing
    assert list(out["doc_id"])[0] == 1
    assert 3 not in set(out["doc_id"])
    # idf uses the real N=3: alpha df=2 → idf = ln(1 + 1.5/2.5) > 0
    assert (out["score"] > 0).all() and np.isfinite(out["score"]).all()


def _gopher_docs(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = ("the data to be of and that have with quality text "
            "document corpus sample words tokens useful lines ") * 5
    # 90 words, mwl ~4.7, all-alpha, stopwords present → passes all rules
    docs = {
        1: base,                                        # clean pass
        2: "short doc",                                 # too few words
        3: " ".join(["a"] * 80),                        # mwl < 3, no stops
        4: base + " " + "#tag " * 20,                   # symbol ratio >= .1
        5: "\n".join(["- item the be to of"] * 20),     # all-bullet lines
        6: "\n".join([base, "wait...", "more...", "uh..."]),  # ellipsis
        7: base.replace("the ", "123 ").replace("and ", "456 ")
             .replace("to ", "789 ").replace("of ", "000 ")
             .replace("be ", "111 ").replace("that ", "222 ")
             .replace("have ", "333 ").replace("with ", "444 "),
        8: "",                                          # empty
    }
    pq.write_table(pa.table({
        "doc_id": pa.array(sorted(docs), pa.int64()),
        "text": pa.array([docs[k] for k in sorted(docs)], pa.string()),
    }), str(tmp_path / "documents.parquet"))


def test_gopher_rules_crafted(ray_session, tmp_path):
    from olx_ray.pipelines.text import gopher_rules

    _gopher_docs(tmp_path)
    out = gopher_rules(str(tmp_path)).to_pandas().set_index("doc_id")
    assert bool(out.loc[1, "keep"]) and out.loc[1, "fail_mask"] == 0
    assert out.loc[2, "fail_mask"] & 1          # word count
    assert out.loc[3, "fail_mask"] & 2          # mean word length
    assert out.loc[4, "fail_mask"] & 4          # symbols
    assert out.loc[5, "fail_mask"] & 8          # bullets
    assert out.loc[6, "fail_mask"] & 16         # ellipsis lines
    assert out.loc[6, "fail_mask"] & 16 and not out.loc[6, "fail_mask"] & 8
    # doc 7: digits replace stopwords → alpha ratio AND stopword rules
    assert out.loc[7, "fail_mask"] & 64
    assert not bool(out.loc[8, "keep"])          # empty fails word count
    assert out.loc[8, "fail_mask"] & 1
    # keep is exactly fail_mask == 0
    assert ((out["fail_mask"] == 0) == out["keep"]).all()


def test_gopher_rules_corpus_deterministic(ray_session):
    from olx_ray.pipelines.text import gopher_rules

    a = gopher_rules(SF).to_pandas()
    b = gopher_rules(SF).to_pandas()
    pd.testing.assert_frame_equal(a, b)
    assert a["doc_id"].is_unique
    # signals are populated, not degenerate
    # (the synthetic corpus is word soup — at most one required
    # stopword per doc, so assert presence rather than >= 2)
    assert (a["n_words"] > 0).any() and a["stop_hits"].max() >= 1


GOPHER_ORACLE_SQL = r"""
WITH base AS (
  SELECT doc_id,
         coalesce(text, '') AS t,
         regexp_extract_all(coalesce(text, ''), '\S+') AS toks,
         list_filter(list_transform(string_split(coalesce(text, ''), chr(10)),
                                    x -> trim(x, ' ' || chr(9) || chr(13) ||
                                              chr(12) || chr(11))),
                     x -> x <> '') AS lines
  FROM documents
)
SELECT doc_id,
       len(toks)::BIGINT AS n_words,
       CASE WHEN len(toks) = 0 THEN 0.0
            ELSE list_sum(list_transform(toks, w -> len(w)))::DOUBLE
                 / len(toks) END AS mean_word_len,
       CASE WHEN len(toks) = 0 THEN 0.0
            ELSE len(list_filter(toks,
                     w -> regexp_matches(w, '[a-zA-Z]')))::DOUBLE
                 / len(toks) END AS alpha_ratio,
       CASE WHEN len(toks) = 0 THEN 0.0
            ELSE len(regexp_extract_all(t, '#|…|\.\.\.'))::DOUBLE
                 / len(toks) END AS symbol_ratio,
       CASE WHEN len(lines) = 0 THEN 0.0
            ELSE len(list_filter(lines,
                     x -> regexp_matches(x, '^[-*•●▪]')))::DOUBLE
                 / len(lines) END AS bullet_frac,
       CASE WHEN len(lines) = 0 THEN 0.0
            ELSE len(list_filter(lines,
                     x -> regexp_matches(x, '(…|\.\.\.)$')))::DOUBLE
                 / len(lines) END AS ellipsis_frac,
       len(list_filter(['the', 'be', 'to', 'of', 'and',
                        'that', 'have', 'with'],
           s -> list_contains(list_transform(toks, w -> lower(w)), s))
           )::INTEGER AS stop_hits
FROM base ORDER BY doc_id
"""


def test_gopher_signals_vs_duckdb(ray_session):
    """Every Gopher signal column against an independent DuckDB
    recomputation over the real corpus (1e-9 tolerance sidesteps the
    Python-banker's vs SQL half-away rounding at the engine's 6dp)."""
    import duckdb
    import numpy as np

    from olx_ray.pipelines.text import gopher_rules

    got = gopher_rules(SF).to_pandas().reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    want = con.sql(GOPHER_ORACLE_SQL).df()
    assert list(got["doc_id"]) == list(want["doc_id"])
    assert list(got["n_words"]) == list(want["n_words"])
    assert list(got["stop_hits"]) == list(want["stop_hits"])
    for col in ("mean_word_len", "alpha_ratio", "symbol_ratio",
                "bullet_frac", "ellipsis_frac"):
        assert np.allclose(got[col], want[col], atol=2e-6), col
    # fail_mask/keep re-derive from the oracle's signals identically
    mask = ((~want["n_words"].between(50, 100_000)).astype(int)
            + (~want["mean_word_len"].between(3.0, 10.0)).astype(int) * 2
            + (want["symbol_ratio"] >= 0.1).astype(int) * 4
            + (want["bullet_frac"] >= 0.9).astype(int) * 8
            + (want["ellipsis_frac"] >= 0.3).astype(int) * 16
            + (want["alpha_ratio"] < 0.8).astype(int) * 32
            + (want["stop_hits"] < 2).astype(int) * 64)
    assert list(got["fail_mask"]) == list(mask)


def _boiler_corpus(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    docs = {
        1: "unique alpha content\nSUBSCRIBE NOW\nmore alpha words",
        2: "beta paragraph here\n  SUBSCRIBE NOW  \nfooter text",
        3: "gamma only\nfooter text",
        4: "SUBSCRIBE NOW\nSUBSCRIBE NOW\ndelta line",   # twice in one doc
        5: "",                                            # empty doc
        6: "epsilon solo line",
        # NBSP-trailing variant: ASCII-bound strip on BOTH sides keeps
        # it a DISTINCT line (df=1, survives) — pins the engine/oracle
        # whitespace-class agreement on web-style text
        7: "zeta words\nfooter text\xa0",
    }
    pq.write_table(pa.table({
        "doc_id": pa.array(sorted(docs), pa.int64()),
        "text": pa.array([docs[k] for k in sorted(docs)], pa.string()),
    }), str(tmp_path / "documents.parquet"))


def test_remove_boilerplate_lines_vs_duckdb(ray_session, tmp_path):
    """Engine == DuckDB oracle on a planted corpus (boilerplate shared
    across docs, within-doc repeats, empty docs), and on the real
    corpus."""
    from olx_ray.pipelines.text import (REMOVE_BOILERPLATE_SQL,
                                        remove_boilerplate_lines)

    _boiler_corpus(tmp_path)
    got = remove_boilerplate_lines(str(tmp_path)).to_pandas() \
        .reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    want = con.sql(REMOVE_BOILERPLATE_SQL).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    g = got.set_index("doc_id")
    # "SUBSCRIBE NOW" (df=3) and "footer text" (df=2) dropped everywhere
    assert "SUBSCRIBE" not in g.loc[1, "text_clean"]
    assert g.loc[2, "text_clean"] == "beta paragraph here"
    assert g.loc[3, "text_clean"] == "gamma only"
    assert g.loc[4, "text_clean"] == "delta line"
    assert g.loc[4, "n_removed"] == 2                 # both copies go
    assert g.loc[5, "n_lines"] == 0
    assert g.loc[6, "text_clean"] == "epsilon solo line"   # df=1 kept
    # NBSP variant stays distinct from the df=2 'footer text' → kept
    assert g.loc[7, "text_clean"] == "zeta words\nfooter text\xa0"

    # real corpus: oracle equality end-to-end
    got2 = remove_boilerplate_lines(SF).to_pandas().reset_index(drop=True)
    con2 = duckdb.connect()
    con2.execute(f"CREATE VIEW documents AS SELECT * FROM "
                 f"read_parquet('{SF}/documents.parquet')")
    want2 = con2.sql(REMOVE_BOILERPLATE_SQL).df()
    pd.testing.assert_frame_equal(got2, want2, check_dtype=False)


def test_normalize_text_vs_duckdb_and_edges(ray_session, tmp_path):
    """NFC + control-strip + whitespace-collapse parity with the DuckDB
    oracle — on the fixture corpus AND on crafted dirty inputs (the
    fixture is already clean, so the edges carry the real signal)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from olx_ray.pipelines.text import NORMALIZE_TEXT_SQL, normalize_text

    dirty = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": pa.array([
            "café du  monde",          # NFC: e + combining acute → é
            "tab\tand\nnewline\r\n  runs ",  # ws runs + trim
            "ctl\x01\x02chars\x7fgone",      # controls removed, words fuse
            "nbsp stays",               # non-ASCII space preserved
            "",                              # empty survives
        ], pa.string()),
    })
    pq.write_table(dirty, str(tmp_path / "documents.parquet"))

    got = normalize_text(str(tmp_path)).to_pandas().reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    want = con.sql(NORMALIZE_TEXT_SQL).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    g = got.set_index("doc_id")["norm_text"]
    assert g.loc[1] == "café du monde"
    assert g.loc[2] == "tab and newline runs"
    assert g.loc[3] == "ctlcharsgone"
    assert g.loc[4] == "nbsp stays"
    assert g.loc[5] == ""

    # idempotent: normalizing the normalized output is a fixpoint
    pq.write_table(pa.table({"doc_id": dirty["doc_id"],
                             "text": pa.array(g.tolist(), pa.string())}),
                   str(tmp_path / "documents.parquet"))
    again = normalize_text(str(tmp_path)).to_pandas().reset_index(drop=True)
    assert again["norm_text"].tolist() == got["norm_text"].tolist()

    # real corpus: oracle equality end-to-end
    got2 = normalize_text(SF).to_pandas().reset_index(drop=True)
    con2 = duckdb.connect()
    con2.execute(f"CREATE VIEW documents AS SELECT * FROM "
                 f"read_parquet('{SF}/documents.parquet')")
    want2 = con2.sql(NORMALIZE_TEXT_SQL).df()
    pd.testing.assert_frame_equal(got2, want2, check_dtype=False)


def test_dedup_lines_within_doc_vs_duckdb(ray_session):
    import duckdb

    from olx_ray.pipelines.text import DEDUP_LINES_SQL, dedup_lines_within_doc

    got = dedup_lines_within_doc(SF).to_pandas().reset_index(drop=True)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF}/documents.parquet')")
    want = con.sql(DEDUP_LINES_SQL).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_dedup_lines_within_doc_edges(ray_session, tmp_path):
    """First occurrence survives in order; exact (unstripped) match;
    empty lines dedup like any line; NULL text = empty string."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from olx_ray.pipelines.text import dedup_lines_within_doc

    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(["a\nb\na\nc",        # repeat mid-doc
                          "dup\ndup\n\ndup",   # run + empty line
                          None,                # NULL → ''
                          "x\n  x\nx"],        # '  x' is a DIFFERENT line
                         pa.string()),
    }), str(tmp_path / "documents.parquet"))

    out = dedup_lines_within_doc(str(tmp_path)).to_pandas()
    assert list(out["text_dedup"]) == ["a\nb\nc", "dup\n", "", "x\n  x"]
    assert list(out["n_removed"]) == [1, 2, 0, 1]


def test_compression_ratio_reference_and_edges(ray_session, tmp_path):
    import zlib

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from olx_ray.pipelines.text import compression_ratio

    texts = ["a" * 4000,                     # pure repetition → tiny ratio
             "The quick brown fox jumps over the lazy dog. " * 3,
             "", None,                       # empty + NULL → ratio 0
             "zq9#kX!7vM@2pL$5"]             # short high-entropy
    pq.write_table(pa.table({
        "doc_id": pa.array(range(1, 6), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }), str(tmp_path / "documents.parquet"))

    out = compression_ratio(str(tmp_path)).to_pandas()
    for _, r in out.iterrows():
        t = texts[int(r["doc_id"]) - 1] or ""
        e = t.encode("utf-8")
        assert r["n_bytes"] == len(e)
        want = len(zlib.compress(e, 6)) / len(e) if e else 0.0
        assert np.isclose(r["compress_ratio"], want)
    by = out.set_index("doc_id")["compress_ratio"]
    assert by[1] < 0.05                      # repetition compresses away
    assert by[1] < by[2] < by[5]             # monotone in entropy
    assert by[3] == 0.0 and by[4] == 0.0

    # determinism on the real fixture
    a = compression_ratio(SF).to_pandas()
    b = compression_ratio(SF).to_pandas()
    assert a.equals(b)


def test_text_profile_full_oracle_adversarial(ray_session, tmp_path):
    """Every text_profile column against TEXT_PROFILE_SQL on planted
    adversarial docs: dyadic quotients whose x1e6 lands exactly on .5
    (half-away vs half-even rounding), empty/null text, CJK script,
    stopword-profile score ties (first-profile-wins), and the shared
    'la'/'de' tokens that score in several profiles at once."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from olx_ray.pipelines.text import TEXT_PROFILE_SQL, text_profile

    docs = [
        # 128 tokens, 1 stopword 'the' → stop_ratio = 1/128 = 0.0078125:
        # x1e6 = 7812.5 exactly — the half-away/half-even divergence
        "the " + " ".join(f"w{i}" for i in range(127)),
        "",                                   # n=0 → quality 0.18 path
        None,                                 # null text
        "观 测 数 据",                          # CJK → zh
        "the der le el",                      # all profiles score 1 → en
        "der die le la",                      # de=2 beats fr=2? tie → de
        "la de du que le les",                # fr=4 vs es=2 … fr wins
        "el los y es una",                    # es only
        "zz yy xx",                           # no stopwords → unknown
        "a A a A a",                          # case-sensitive distinct
    ]
    tbl = pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs, pa.string()),
        "lang": pa.array(["xx"] * len(docs), pa.string()),
    })
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    got = text_profile(str(tmp_path)).to_pandas().reset_index(drop=True)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{tmp_path}/documents.parquet')")
    want = con.sql(TEXT_PROFILE_SQL).df()
    cols = sorted(got.columns)
    assert sorted(want.columns) == cols
    pd.testing.assert_frame_equal(got[cols], want[cols],
                                  check_dtype=False, check_exact=True)
    by = got.set_index("doc_id")
    assert by.loc[3, "lang_pred"] == "zh"
    assert by.loc[4, "lang_pred"] == "en"      # tie → first profile
    assert by.loc[8, "lang_pred"] == "unknown"
    assert by.loc[0, "stop_ratio"] == 0.007813  # half-AWAY at the tie
    assert "fingerprint" not in got.columns     # driver surface is SQL-full


def test_text_profile_fingerprint_variant_matches_standalone(ray_session):
    """TextProfile(with_fingerprint=True) keeps the golden-pinned hash
    column, identical to the standalone fingerprint operator."""
    from olx_ray.pipelines.text import TextProfile, fingerprint

    SF = "/root/testdata/sf0.001"
    want = fingerprint(SF).to_pandas().set_index("doc_id")["fingerprint"]
    df = pd.read_parquet(f"{SF}/documents.parquet",
                         columns=["doc_id", "text", "lang"]).head(64)
    out = TextProfile()(df).set_index("doc_id")
    assert (out["fingerprint"] == want.loc[out.index]).all()
