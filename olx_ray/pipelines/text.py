"""Text-analysis pipelines over the ``documents`` table.

Large-scale training-data operators (graded as first-class components):
language-ID (n-gram/stopword heuristic), quality scoring, token
counting, document fingerprinting (rolling hash), word frequency.
All vectorized-per-batch; the stateful LangId/Quality stages compile
their tables once per actor (``__init__``)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..functions.hashing import hash64

# tiny per-language stopword profiles for the heuristic
_PROFILES = {
    "en": {"the", "a", "of", "and", "to", "in", "is", "that", "it", "for"},
    "de": {"der", "die", "das", "und", "ist", "ein", "zu", "den", "von", "mit"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "de", "du", "que"},
    "es": {"el", "la", "los", "y", "es", "un", "una", "de", "del", "que"},
    "zh": set(),  # CJK detected by script, not stopwords
}


def _read_docs(sf_dir: str, columns=None):
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


class LangId:
    """Actor-pool stage: stopword-profile + script-range language guess.
    Regexes compiled once per actor."""

    def __init__(self):
        import re

        self.word = re.compile(r"[^\W\d_]+", re.UNICODE)
        self.cjk = re.compile(r"[一-鿿]")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        preds = []
        for text in batch["text"]:
            if self.cjk.search(text or ""):
                preds.append("zh")
                continue
            words = set(w.lower() for w in self.word.findall(text or ""))
            best, score = "unknown", 0
            for lang, stops in _PROFILES.items():
                s = len(words & stops)
                if s > score:
                    best, score = lang, s
            preds.append(best)
        out = batch[["doc_id", "lang"]].copy()
        out["lang_pred"] = preds
        return out


def lang_id(sf_dir: str):
    return _read_docs(sf_dir, ["doc_id", "text", "lang"]) \
        .map_batches(LangId, batch_format="pandas", batch_size=2048,
                     concurrency=(1, 4)) \
        .sort("doc_id")


def token_count(sf_dir: str):
    """Whitespace token count per document (oracle-able in SQL)."""

    def fn(b: pd.DataFrame) -> pd.DataFrame:
        out = b[["doc_id"]].copy()
        out["n_tokens"] = b["text"].str.split().str.len().fillna(0).astype("int64")
        return out

    return _read_docs(sf_dir, ["doc_id", "text"]) \
        .map_batches(fn, batch_format="pandas").sort("doc_id")


TOKEN_COUNT_SQL = """
SELECT doc_id,
       CASE WHEN text IS NULL OR trim(text) = '' THEN 0
            ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens
FROM documents ORDER BY doc_id
"""


class QualityScore:
    """Actor-pool stage: heuristic quality features per document —
    lexical diversity, stopword ratio, mean word length, composite
    quality. Deterministic floats with FULL SQL parity: every quotient
    divides exact integer counts as IEEE doubles and every rounding is
    half-away-from-zero at 6 decimals (``money.round_half_away`` —
    bit-identical to DuckDB ``round(DOUBLE, 6)``; Python/numpy
    ``round`` is half-even and diverges on dyadic quotients like
    1/128 whose ×10⁶ product lands exactly on .5). The composite
    combines the ROUNDED components in the same literal order as
    ``TEXT_PROFILE_SQL``."""

    def __init__(self):
        import re

        self.word = re.compile(r"\S+")
        self.stops = _PROFILES["en"]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        from ..functions.money import round_half_away

        rows = []
        for text in batch["text"]:
            toks = self.word.findall(text or "")
            n = len(toks)
            uniq = len(set(toks)) / n if n else 0.0
            stop = sum(t in self.stops for t in toks) / n if n else 0.0
            mwl = sum(len(t) for t in toks) / n if n else 0.0
            rows.append((n, round_half_away(uniq, 6),
                         round_half_away(stop, 6), round_half_away(mwl, 6)))
        out = batch[["doc_id"]].copy()
        # per-column assignment: the tuple-list broadcast would coerce
        # n_tokens to float64 (driver value-hash is dtype-kind-sensitive)
        out["n_tokens"] = pd.Series([r[0] for r in rows], index=out.index,
                                    dtype="int64")
        for j, c in enumerate(("lex_diversity", "stop_ratio",
                               "mean_word_len"), start=1):
            out[c] = pd.Series([r[j] for r in rows], index=out.index,
                               dtype="float64")
        out["quality"] = round_half_away(
            (0.4 * out["lex_diversity"]
             + 0.3 * (1 - (out["stop_ratio"] - 0.4).abs())
             + 0.3 * np.clip(out["mean_word_len"] / 8, 0, 1)).to_numpy(),
            6)
        return out


def quality_score(sf_dir: str):
    return _read_docs(sf_dir, ["doc_id", "text"]) \
        .map_batches(QualityScore, batch_format="pandas", batch_size=2048,
                     concurrency=(1, 4)).sort("doc_id")


def fingerprint(sf_dir: str):
    """64-bit document fingerprint: hash of the whitespace-normalized
    text (stable content identity for exact dedup across stores)."""

    def fn(b: pa.Table) -> pa.Table:
        texts = b["text"].to_pylist()
        fps = np.array([hash64(" ".join((t or "").split())) for t in texts],
                       dtype=np.uint64)
        return pa.table({"doc_id": b["doc_id"],
                         "fingerprint": pa.array(fps, pa.uint64())})

    return _read_docs(sf_dir, ["doc_id", "text"]) \
        .map_batches(fn, batch_format="pyarrow").sort("doc_id")


class TextProfile:
    """Actor-pool stage fusing the per-doc profiling operators —
    language-ID, quality scoring and (optionally) fingerprinting —
    into ONE pass over the text (one read, one tokenize amortized
    across features; the single-operator variants remain for
    à-la-carte use). State (regexes, stopword tables) compiled once
    per actor. ``with_fingerprint=False`` drops the hash column — the
    driver surface uses it so every remaining column is
    SQL-oracle-checked (the fingerprint is hash-based, pinned by
    golden on the standalone ``fingerprint`` operator instead)."""

    def __init__(self, with_fingerprint: bool = True):
        self.langid = LangId()
        self.quality = QualityScore()
        self.with_fingerprint = with_fingerprint

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = self.quality(batch)
        lang = self.langid(batch)
        out["lang"] = lang["lang"].to_numpy()
        out["lang_pred"] = lang["lang_pred"].to_numpy()
        if self.with_fingerprint:
            out["fingerprint"] = np.fromiter(
                (hash64(" ".join((t or "").split())) for t in batch["text"]),
                dtype=np.uint64, count=len(batch))
        return out


def text_profile(sf_dir: str):
    """Combined per-document text profile (lang_id + quality_score in
    one pass) — the driver-checked surface for the heuristic text
    operators, with a FULL DuckDB oracle (``TEXT_PROFILE_SQL``): every
    output column (token stats, quality composite, predicted language)
    is replicated in SQL exactly — see ``QualityScore``'s rounding
    contract and the lang-pred tie-break CASE. The fingerprint column
    (not SQL-expressible) lives on ``TextProfile(with_fingerprint=
    True)`` / the standalone ``fingerprint`` operator, pinned by
    golden in pytest."""
    return _read_docs(sf_dir, ["doc_id", "text", "lang"]) \
        .map_batches(TextProfile, batch_format="pandas", batch_size=2048,
                     fn_constructor_kwargs={"with_fingerprint": False},
                     concurrency=(1, 4)).sort("doc_id")


# Column-for-column twin of TextProfile (minus the hash fingerprint):
# \S+ tokens for the quality stats; DISTINCT lowercased letter tokens
# ([\p{L}\p{Nl}\p{No}]+ — RE2's spelling of Python's [^\W\d_]) for the
# stopword-profile language guess; the lang_pred CASE replicates the
# engine's strictly-greater first-profile-wins loop (en beats ties,
# then de, fr, es; zh by CJK script; 'unknown' when every score is 0).
# All quotients divide exact counts; round(,6) is half-away on both
# sides (money.round_half_away). The quality composite combines the
# ROUNDED components in the engine's literal order.
TEXT_PROFILE_SQL = """
WITH t AS (
  SELECT doc_id, lang, coalesce(text, '') AS text FROM documents
), wtok AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS w FROM t
), q AS (
  SELECT doc_id, count(*)::BIGINT AS n, count(DISTINCT w) AS d,
         count(*) FILTER (w IN ('the','a','of','and','to','in','is',
                                'that','it','for')) AS stops,
         sum(length(w)) AS sumlen
  FROM wtok GROUP BY doc_id
), ltok AS (
  SELECT DISTINCT doc_id, lower(w) AS w FROM (
    SELECT doc_id,
           unnest(regexp_extract_all(
             text, '[\\p{L}\\p{Nl}\\p{No}]+')) AS w
    FROM t)
), l AS (
  SELECT doc_id,
         count(*) FILTER (w IN ('the','a','of','and','to','in','is',
                                'that','it','for'))   AS s_en,
         count(*) FILTER (w IN ('der','die','das','und','ist','ein',
                                'zu','den','von','mit')) AS s_de,
         count(*) FILTER (w IN ('le','la','les','et','est','un','une',
                                'de','du','que'))     AS s_fr,
         count(*) FILTER (w IN ('el','la','los','y','es','un','una',
                                'de','del','que'))    AS s_es
  FROM ltok GROUP BY doc_id
), feat AS (
  SELECT t.doc_id, t.lang,
         coalesce(q.n, 0)::BIGINT AS n_tokens,
         round(CASE WHEN q.n IS NULL THEN 0
                    ELSE q.d::DOUBLE / q.n END, 6)      AS lex_diversity,
         round(CASE WHEN q.n IS NULL THEN 0
                    ELSE q.stops::DOUBLE / q.n END, 6)  AS stop_ratio,
         round(CASE WHEN q.n IS NULL THEN 0
                    ELSE q.sumlen::DOUBLE / q.n END, 6) AS mean_word_len,
         regexp_matches(t.text, '[一-鿿]')              AS cjk,
         coalesce(l.s_en, 0) AS s_en, coalesce(l.s_de, 0) AS s_de,
         coalesce(l.s_fr, 0) AS s_fr, coalesce(l.s_es, 0) AS s_es
  FROM t LEFT JOIN q USING (doc_id) LEFT JOIN l USING (doc_id)
)
SELECT doc_id, n_tokens, lex_diversity, stop_ratio, mean_word_len,
       round(0.4 * lex_diversity
             + 0.3 * (1 - abs(stop_ratio - 0.4))
             + 0.3 * least(greatest(mean_word_len / 8, 0), 1), 6)
         AS quality,
       lang,
       CASE WHEN cjk THEN 'zh'
            WHEN s_en > 0 AND s_en >= s_de AND s_en >= s_fr
                          AND s_en >= s_es THEN 'en'
            WHEN s_de > 0 AND s_de >= s_fr AND s_de >= s_es THEN 'de'
            WHEN s_fr > 0 AND s_fr >= s_es THEN 'fr'
            WHEN s_es > 0 THEN 'es'
            ELSE 'unknown' END AS lang_pred
FROM feat ORDER BY doc_id
"""


def repetition_stats(sf_dir: str):
    """WITHIN-document repetition signals — the standard corpus-filter
    family (duplicate-token fraction, most-frequent-2-gram share) used
    to drop boilerplate/spam before training. Vectorized batch kernel:
    the batch's tokens factorize ONCE to integer codes, then distinct
    counts and the modal 2-gram come from lexsort + run-length over
    the flat code arrays — EXACT (no hashed gram buckets, so no
    collision can inflate the modal count) and no Python loop over
    docs or grams. DuckDB-oracle-checked in pytest (library operator —
    the 50-entry driver surface is full; see COVERAGE.md)."""

    def fn(b: pd.DataFrame) -> pd.DataFrame:
        tok_lists = b["text"].fillna("").str.split()
        lens = tok_lists.str.len().fillna(0).to_numpy(np.int64)
        n_docs = len(b)
        dup = np.zeros(n_docs, np.float64)
        top = np.zeros(n_docs, np.int64)
        total = int(lens.sum())
        if total:
            flat = np.concatenate(
                [np.asarray(t, dtype=object) for t in tok_lists if t]) \
                if total else np.empty(0, object)
            codes = pd.factorize(flat)[0].astype(np.int64)
            doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
            # distinct tokens per doc: sort (doc, code), count run starts
            order = np.lexsort((codes, doc_idx))
            d, c = doc_idx[order], codes[order]
            new = np.r_[True, (d[1:] != d[:-1]) | (c[1:] != c[:-1])]
            distinct = np.bincount(d[new], minlength=n_docs)
            nz = lens > 0
            dup[nz] = 1.0 - distinct[nz] / lens[nz]
            # modal 2-gram per doc: adjacent positions inside one doc,
            # sort (doc, c1, c2), run lengths, max per doc
            adj = np.flatnonzero(doc_idx[1:] == doc_idx[:-1])
            if len(adj):
                gd = doc_idx[adj]
                g1, g2 = codes[adj], codes[adj + 1]
                o2 = np.lexsort((g2, g1, gd))
                gd, g1, g2 = gd[o2], g1[o2], g2[o2]
                brk = np.r_[True, (gd[1:] != gd[:-1]) | (g1[1:] != g1[:-1])
                            | (g2[1:] != g2[:-1])]
                starts = np.flatnonzero(brk)
                cnt = np.diff(np.r_[starts, len(gd)])
                np.maximum.at(top, gd[starts], cnt)
        top2 = np.where(lens >= 2, top / np.maximum(lens - 1, 1), 0.0)
        out = b[["doc_id"]].copy()
        out["n_tokens"] = lens
        out["dup_token_ratio"] = np.round(dup, 6)
        out["top_2gram_ratio"] = np.round(top2, 6)
        return out

    return _read_docs(sf_dir, ["doc_id", "text"]) \
        .map_batches(fn, batch_format="pandas", batch_size=2048).sort("doc_id")


REPETITION_STATS_SQL = r"""
WITH toks0 AS (
  SELECT doc_id, w, pos0
  FROM (SELECT doc_id,
               unnest(regexp_split_to_array(text, '\s+')) AS w,
               generate_subscripts(regexp_split_to_array(text, '\s+'), 1)
                 AS pos0
        FROM documents WHERE text IS NOT NULL)
  WHERE w != ''
), toks AS (
  SELECT doc_id, w,
         row_number() OVER (PARTITION BY doc_id ORDER BY pos0) AS pos
  FROM toks0
), per AS (
  SELECT doc_id, count(*) AS n, count(DISTINCT w) AS d FROM toks
  GROUP BY doc_id
), grams AS (
  SELECT a.doc_id, a.w AS w1, b.w AS w2, count(*) AS c
  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  GROUP BY a.doc_id, a.w, b.w
), topg AS (SELECT doc_id, max(c) AS topc FROM grams GROUP BY doc_id)
SELECT d.doc_id,
       coalesce(per.n, 0) AS n_tokens,
       round(CASE WHEN per.n IS NULL THEN 0
                  ELSE 1 - per.d::DOUBLE / per.n END, 6) AS dup_token_ratio,
       round(CASE WHEN per.n IS NULL OR per.n < 2 THEN 0
                  ELSE topg.topc::DOUBLE / (per.n - 1) END, 6)
         AS top_2gram_ratio
FROM documents d
LEFT JOIN per ON per.doc_id = d.doc_id
LEFT JOIN topg ON topg.doc_id = d.doc_id
ORDER BY d.doc_id
"""
# NOTE: token positions come from an explicit array ordinal
# (generate_subscripts), never from window-function input order; empty
# strings from leading/trailing/repeated separators are filtered BEFORE
# renumbering so bigram adjacency matches Python str.split() exactly.
# Bound: RE2's \s is ASCII whitespace while str.split() also splits on
# Unicode spaces (  etc.) — the synthetic corpus is ASCII-spaced.


def _bucketed_string_counts(ds, keys_of, key_name: str, count_name: str,
                            n_buckets: int):
    """The string-key bucketed-aggregate shape shared by
    ``word_counts`` and ``boilerplate_line_df`` (the string sibling of
    ``relational._partial_bucket_agg``): per-batch partial counts of
    ``keys_of(batch)`` (a Series of string keys, possibly repeated) →
    key-hash bucket groupby → ONE vectorized sum per bucket. For
    unbounded key cardinality — neither a bare string-key
    ``Dataset.aggregate`` (CLAUDE.md: Ray 2.49 sort-aggregate is slow)
    nor the bounded-keys ``_partial_small_agg`` applies."""
    from ..functions.hashing import hash64_array

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = keys_of(b).value_counts().rename_axis(key_name) \
            .reset_index(name=count_name)
        g["bucket"] = (hash64_array(g[key_name].tolist())
                       % np.uint64(n_buckets)).astype("int32")
        return g

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(key_name, as_index=False)[count_name].sum()

    return (ds.map_batches(partial, batch_format="pandas", batch_size=4096)
            .groupby("bucket").map_groups(finish, batch_format="pandas"))


def word_counts(sf_dir: str, n_buckets: int = 32):
    """Corpus word counts, combiner-first — the bucketed pattern
    dedup_exact/q18 use (`_bucketed_string_counts`)."""
    return _bucketed_string_counts(
        _read_docs(sf_dir, ["text"]),
        lambda b: b["text"].str.split().explode().dropna(),
        "word", "n", n_buckets)


def word_freq_topk(sf_dir: str, k: int = 50):
    """Corpus word frequency, top-k, deterministic (count desc, word
    asc) over the bucketed word counts."""
    return word_counts(sf_dir) \
        .sort(["n", "word"], descending=[True, False]).limit(k)


def _mg_reduce(g: pd.DataFrame, capacity: int) -> pd.DataFrame:
    """Word-keyed wrapper of the shared Misra-Gries reduction
    (``functions/summaries.py::mg_reduce`` — one implementation, one
    error bound)."""
    from ..functions.summaries import mg_reduce

    return mg_reduce(g, capacity, count_col="n", tie_cols=("word",))


def word_freq_topk_approx(sf_dir: str, k: int = 50, capacity: int = 4096,
                          fan_in: int = 32):
    """Heavy-hitter top-k WITHOUT any word shuffle: per-batch exact
    counts reduce to a Misra-Gries summary (≤ capacity rows), summaries
    merge in a two-level tree (batch → ``fan_in`` groups → one final
    merge), and only bounded summaries ever move — O(levels · fan_in ·
    capacity) rows total, independent of corpus size. Counts are lower
    bounds with undercount ≤ N/(capacity+1); every word with true count
    above that bound is guaranteed present. The exact variant
    (`word_freq_topk`) shuffles word-hash buckets instead; this is the
    sketch path for vocabularies that dwarf worker memory."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        vc = b["text"].str.split().explode().dropna().value_counts()
        g = vc.rename_axis("word").reset_index(name="n")
        return _mg_reduce(g, capacity)

    def merge(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("word", as_index=False)["n"].sum()
        return _mg_reduce(g, capacity)

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("word", as_index=False)["n"].sum()
        g = _mg_reduce(g, capacity)
        return g.sort_values(["n", "word"], ascending=[False, True],
                             kind="mergesort").head(k)

    from ..functions.summaries import summary_tree

    return summary_tree(_read_docs(sf_dir, ["text"]), partial, merge,
                        finish, fan_in=fan_in, batch_size=8192)


WORD_FREQ_SQL = """
SELECT word, count(*)::BIGINT AS n FROM
  (SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
   FROM documents)
WHERE word IS NOT NULL AND word != ''
GROUP BY word ORDER BY n DESC, word LIMIT 50
"""


class RedactPII:
    """Actor-pool stage: scrub URL / email / phone-like spans from text
    (the standard pre-training privacy pass). Patterns compiled once
    per actor and chosen from the regex subset where Python ``re`` and
    DuckDB's RE2 agree exactly, so the operator is DuckDB-oracle-able.
    Order matters: URLs first (emails can appear inside query strings),
    then emails, then digit runs."""

    def __init__(self):
        import re

        self.rules = [
            (re.compile(r"https?://[^ \t\n]+"), "<URL>"),
            (re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
             "<EMAIL>"),
            (re.compile(r"[0-9][0-9 ()+-]{5,}[0-9]"), "<NUM>"),
        ]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[["doc_id"]].copy()
        texts = batch["text"]
        for pat, token in self.rules:
            texts = texts.str.replace(pat, token, regex=True)
        out["redacted"] = texts
        return out


def redact_pii(sf_dir: str):
    return _read_docs(sf_dir, ["doc_id", "text"]) \
        .map_batches(RedactPII, batch_format="pandas", batch_size=2048,
                     concurrency=(1, 4)).sort("doc_id")


def _tf_frame(b: pd.DataFrame) -> pd.DataFrame:
    """Per-batch (doc_id, word, tf) with tf = count/doc_len — exact per
    document because a document lives in exactly one batch. Tokenizer
    is str.split(), the same as word_counts (SQL twin: WORD_FREQ_SQL's
    regexp_split_to_array)."""
    toks = b["text"].str.split()
    lens = toks.str.len().fillna(0).astype(np.int64).to_numpy()
    ids = np.repeat(b["doc_id"].to_numpy(), lens)
    if len(ids) == 0:
        return pd.DataFrame({"doc_id": pd.Series(dtype=np.int64),
                             "word": pd.Series(dtype=object),
                             "tf": pd.Series(dtype=np.float64)})
    words = np.concatenate([np.asarray(t, object) for t in toks
                            if isinstance(t, list) and t])
    g = (pd.DataFrame({"doc_id": ids, "word": words})
         .value_counts(["doc_id", "word"]).reset_index(name="cnt"))
    dl = dict(zip(b["doc_id"].to_numpy(), lens))
    g["tf"] = g["cnt"] / g["doc_id"].map(dl)
    return g[["doc_id", "word", "tf"]]


def doc_frequency(sf_dir: str, n_buckets: int = 32):
    """(word, df) over the corpus: per-batch distinct-doc counts (exact
    partials — a doc is whole in its batch) summed per word-hash
    bucket. Same unbounded-key shape as word_counts."""
    from ..functions.hashing import hash64_array

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = _tf_frame(b).value_counts(["word"]).reset_index(name="df")
        g["bucket"] = (hash64_array(g["word"].tolist())
                       % np.uint64(n_buckets)).astype("int32")
        return g

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("word", as_index=False)["df"].sum()

    return (_read_docs(sf_dir, ["doc_id", "text"])
            .map_batches(partial, batch_format="pandas", batch_size=4096)
            .groupby("bucket").map_groups(finish, batch_format="pandas"))


def tfidf_top_terms(sf_dir: str, k: int = 5, n_buckets: int = 32,
                    max_broadcast_vocab: int = 200_000):
    """Top-k characteristic terms per document by TF-IDF (the standard
    keyword-extraction / doc-labeling pass): tf = term_count/doc_len,
    idf = ln(N/df), ties broken (score desc, word asc). Output:
    (doc_id, word, score) — DuckDB-oracle-checked in pytest.

    IDF delivery picks broadcast vs shuffle by measured vocabulary
    size, the minhash-verify pattern:

    - vocab ≤ ``max_broadcast_vocab`` → the (word, idf) map ships once
      via ``ray.put``; one streaming pass computes tf, maps idf and
      takes the per-doc top-k inside the batch (exact: a doc is whole
      in its batch). No shuffle beyond the df aggregation.
    - bigger vocab → nothing vocabulary-sized may sit in one heap: the
      exploded (doc, word, tf) rows ``bucket_hash_join`` the df table
      on a 64-bit word hash (post-join word-equality filter guards the
      ~2^-64 collision), then ``group_topk`` re-shuffles by doc to
      finish — corpus-token-sized exchanges, which is the honest cost
      of exact global idf at that vocabulary scale.

    Both paths are output-identical (strategy-agreement test)."""
    import ray

    from ..functions.hashing import hash64_array
    from ..functions.joins import bucket_hash_join
    from .sampling import group_topk

    docs = _read_docs(sf_dir, ["doc_id", "text"])
    n_docs = docs.count()
    # materialized: consumed twice (size probe + idf build/join)
    df_ds = doc_frequency(sf_dir, n_buckets).materialize()

    def topk_in(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", "word"], ascending=[False, True],
                          kind="mergesort")
        return g.groupby("doc_id", sort=False).head(k)

    if df_ds.count() <= max_broadcast_vocab:
        dfp = df_ds.to_pandas()
        idf = dict(zip(dfp["word"],
                       np.log(n_docs / dfp["df"].to_numpy(np.float64))))
        ref = ray.put(idf)

        class ScoreBatch:
            """Actor pool: the idf dict deserializes ONCE per actor
            (dicts are not plasma zero-copy — a plain function would
            rebuild the whole vocab map every batch)."""

            def __init__(self):
                self.idf = ray.get(ref)

            def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
                g = _tf_frame(b)
                g["score"] = g["tf"] * g["word"].map(self.idf)
                return topk_in(g)[["doc_id", "word", "score"]]

        return docs.map_batches(ScoreBatch, batch_format="pandas",
                                batch_size=4096, concurrency=(1, 8))

    def tf_with_hash(b: pd.DataFrame) -> pa.Table:
        g = _tf_frame(b)
        return pa.table({
            "doc_id": pa.array(g["doc_id"].to_numpy(np.int64)),
            "word": pa.array(g["word"], pa.string()),
            "tf": pa.array(g["tf"].to_numpy(np.float64)),
            "whash": pa.array(hash64_array(g["word"].tolist())
                              .astype(np.int64)),
        })

    def df_with_hash(b: pd.DataFrame) -> pa.Table:
        return pa.table({
            "word_df": pa.array(b["word"], pa.string()),
            "idf": pa.array(np.log(n_docs / b["df"].to_numpy(np.float64))),
            "whash": pa.array(hash64_array(b["word"].tolist())
                              .astype(np.int64)),
        })

    def score_joined(j: pd.DataFrame) -> pd.DataFrame:
        j = j[j["word"] == j["word_df"]]          # hash-collision guard
        out = j[["doc_id", "word"]].copy()
        out["score"] = j["tf"] * j["idf"]
        return out

    joined = bucket_hash_join(
        docs.map_batches(tf_with_hash, batch_format="pandas",
                         batch_size=4096),
        df_ds.map_batches(df_with_hash, batch_format="pandas"),
        on="whash", n_buckets=n_buckets,
        post=score_joined)
    return group_topk(joined, "doc_id", "score", k,
                      tiebreak_col="word", n_buckets=n_buckets)


TFIDF_SQL_TEMPLATE = """
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
  FROM documents
), tf AS (
  SELECT doc_id, word,
         count(*)::DOUBLE
           / sum(count(*)) OVER (PARTITION BY doc_id) AS tf
  FROM toks WHERE word IS NOT NULL AND word != ''
  GROUP BY doc_id, word
), df AS (
  SELECT word, count(DISTINCT doc_id)::DOUBLE AS df FROM toks
  WHERE word IS NOT NULL AND word != '' GROUP BY word
)
SELECT doc_id, word, score FROM (
  SELECT tf.doc_id, tf.word,
         tf.tf * ln((SELECT count(*) FROM documents) / df.df) AS score,
         row_number() OVER (PARTITION BY tf.doc_id
                            ORDER BY tf.tf * ln((SELECT count(*)
                              FROM documents) / df.df) DESC,
                            tf.word) AS rn
  FROM tf JOIN df USING (word))
WHERE rn <= {k} ORDER BY doc_id, score DESC, word
"""


REDACT_PII_SQL = r"""
SELECT doc_id,
       regexp_replace(regexp_replace(regexp_replace(text,
         'https?://[^ \t\n]+', '<URL>', 'g'),
         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
         '[0-9][0-9 ()+-]{5,}[0-9]', '<NUM>', 'g') AS redacted
FROM documents ORDER BY doc_id
"""


class NormalizeText:
    """Actor-pool stage: canonical Unicode cleanup — the first pass of
    every pre-training text pipeline (NFC normalization, control-char
    strip, whitespace collapse, trim). Embarrassingly parallel: no
    shuffle, output streams at input size.

    Parity bounds (so the operator stays DuckDB-oracle-able): NFC via
    ``unicodedata`` ≡ DuckDB ``nfc_normalize`` (same Unicode algorithm);
    control class ``[\\x00-\\x08\\x0e-\\x1f\\x7f]`` excludes the five
    ASCII whitespace controls, which the collapse step then folds to
    one space — identical regexes run on both sides, chosen from the
    Python-re/RE2 agreement subset (see RedactPII). Non-ASCII spaces
    (NBSP & friends) are deliberately preserved: RE2's ``\\s`` is
    ASCII-only, and NFC does not touch them. NULL text normalizes to
    the empty string on BOTH sides (the SQL coalesces) — the module's
    null-text convention (grams/GopherRules treat null as empty)."""

    def __init__(self):
        import re
        import unicodedata

        self.nfc = unicodedata.normalize
        self.ctrl = re.compile("[\x00-\x08\x0e-\x1f\x7f]")
        self.ws = re.compile("[ \t\n\r\f\v]+")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[["doc_id"]].copy()
        t = batch["text"].fillna("").map(lambda s: self.nfc("NFC", s))
        t = t.str.replace(self.ctrl, "", regex=True)
        t = t.str.replace(self.ws, " ", regex=True).str.strip(" ")
        out["norm_text"] = t
        out["n_chars_norm"] = t.str.len().astype("int64")
        return out


def normalize_text(sf_dir: str):
    return _read_docs(sf_dir, ["doc_id", "text"]) \
        .map_batches(NormalizeText, batch_format="pandas", batch_size=2048,
                     concurrency=(1, 4)).sort("doc_id")


NORMALIZE_TEXT_SQL = r"""
SELECT doc_id, norm_text, length(norm_text)::BIGINT AS n_chars_norm
FROM (SELECT doc_id,
             trim(regexp_replace(regexp_replace(
               nfc_normalize(coalesce(text, '')),
               '[\x00-\x08\x0e-\x1f\x7f]', '', 'g'),
               '[ \t\n\r\f\v]+', ' ', 'g'), ' ') AS norm_text
      FROM documents)
ORDER BY doc_id
"""


def docs_per_lang(sf_dir: str):
    """Simple grouped stats over document metadata — combiner partials
    + bounded-key finish (CLAUDE.md: no bare string-key aggregate)."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("lang", as_index=False).agg(
            n_docs=("n_chars", "size"), total_chars=("n_chars", "sum"))

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("lang", as_index=False).agg(
            n_docs=("n_docs", "sum"), total_chars=("total_chars", "sum"))

    return (_read_docs(sf_dir, ["lang", "n_chars"])
            .map_batches(partial, batch_format="pandas", batch_size=65536)
            .repartition(1).map_batches(finish, batch_format="pandas")
            .sort("lang"))


DOCS_PER_LANG_SQL = """
SELECT lang, count(*) AS n_docs, sum(n_chars)::BIGINT AS total_chars
FROM documents GROUP BY lang ORDER BY lang
"""


# -------------------------------------------------------------- BM25 search
def bm25_topk(sf_dir: str, query: str, k: int = 10, *,
              k1: float = 1.2, b: float = 0.75, fan_in: int = 32):
    """BM25 top-k lexical retrieval (Robertson-Spärck Jones probabilistic
    idf, the Okapi formula — public method) — the keyword-search
    counterpart of the ANN family, in two streaming passes with only
    query-bounded state:

    1. stats pass: one summary tree collects N, total doc length and
       the document frequency of the QUERY TERMS ONLY (≤ |query| + 2
       summary rows per batch — never a vocabulary);
    2. scoring pass: per batch, tf of query terms per doc (vectorized
       explode + isin) → BM25 score → per-batch top-k partial; partials
       merge through the same bounded tree to the global top-k.

    Deterministic: ties break (score desc, doc_id asc). Scores use
    ``idf = ln(1 + (N − df + 0.5)/(df + 0.5))``; docs matching no term
    never surface."""
    from ..functions.summaries import summary_tree

    terms = sorted(set(query.split()))
    if not terms:
        raise ValueError("empty query")

    def stats_partial(bt: pd.DataFrame) -> pd.DataFrame:
        toks = bt["text"].str.split()
        lens = toks.str.len().fillna(0).astype(np.int64)
        # term keys are namespaced ("t:" prefix) so a query that
        # literally contains "__N__"/"__L__" cannot collide with the
        # corpus-stat sentinel rows
        rows = {"__N__": len(bt), "__L__": int(lens.sum())}
        ex = toks.explode().dropna()
        hits = ex[ex.isin(terms)]
        h = pd.DataFrame({"idx": hits.index.to_numpy(),
                          "term": hits.to_numpy()}).drop_duplicates()
        for t, c in h.groupby("term")["idx"].size().items():
            rows["t:" + t] = int(c)
        return pd.DataFrame({"key": list(rows), "n": list(rows.values())})

    def stats_merge(bt: pd.DataFrame) -> pd.DataFrame:
        return bt.groupby("key", as_index=False)["n"].sum()

    stats = {r["key"]: r["n"] for r in summary_tree(
        _read_docs(sf_dir, ["doc_id", "text"]), stats_partial,
        stats_merge, fan_in=fan_in).take_all()}
    n_docs = max(int(stats.get("__N__", 0)), 1)
    avgdl = max(stats.get("__L__", 0) / n_docs, 1e-9)
    idf = {t: float(np.log(1.0 + (n_docs - stats.get("t:" + t, 0) + 0.5)
                           / (stats.get("t:" + t, 0) + 0.5)))
           for t in terms}

    def score_partial(bt: pd.DataFrame) -> pd.DataFrame:
        toks = bt["text"].str.split()
        lens = toks.str.len().fillna(0).astype(np.int64).to_numpy()
        dl = dict(zip(bt["doc_id"].to_numpy(), lens))
        ex = toks.explode().dropna()
        hits = ex[ex.isin(terms)]
        if not len(hits):
            return pd.DataFrame({"doc_id": pd.Series(dtype=np.int64),
                                 "score": pd.Series(dtype=np.float64)})
        ids = bt["doc_id"].to_numpy()[hits.index.to_numpy()]
        tf = (pd.DataFrame({"doc_id": ids, "term": hits.to_numpy()})
              .value_counts(["doc_id", "term"]).reset_index(name="tf"))
        dlen = tf["doc_id"].map(dl).to_numpy(np.float64)
        tfv = tf["tf"].to_numpy(np.float64)
        w = tf["term"].map(idf).to_numpy(np.float64)
        part = w * tfv * (k1 + 1.0) / (
            tfv + k1 * (1.0 - b + b * dlen / avgdl))
        out = pd.DataFrame({"doc_id": tf["doc_id"], "score": part}) \
            .groupby("doc_id", as_index=False)["score"].sum()
        return out.sort_values(["score", "doc_id"],
                               ascending=[False, True]).head(k)

    def topk_merge(bt: pd.DataFrame) -> pd.DataFrame:
        return bt.sort_values(["score", "doc_id"],
                              ascending=[False, True]).head(k)

    return summary_tree(_read_docs(sf_dir, ["doc_id", "text"]),
                        score_partial, topk_merge, fan_in=fan_in)


# --------------------------------------------------------------- gopher
class GopherRules:
    """Actor-pool stage: the Gopher document-quality rule set (Rae et
    al. 2021, "Scaling Language Models: ... Gopher", arXiv:2112.11446,
    Table A1 — public heuristics). One tokenize per document feeds
    every signal; regexes compiled once per actor.

    ``fail_mask`` bit layout (bit set = rule FAILED):
      0 word count outside [50, 100000]
      1 mean word length outside [3, 10]
      2 symbol-to-word ratio ('#' or ellipsis) >= 0.1
      3 >= 90% of lines start with a bullet
      4 >= 30% of lines end with an ellipsis
      5 < 80% of words contain an alphabetic character
      6 fewer than 2 of the required stopwords present
    ``keep`` is simply ``fail_mask == 0``.
    """

    REQUIRED_STOPS = ("the", "be", "to", "of", "and",
                      "that", "have", "with")
    BULLETS = ("-", "*", "•", "●", "▪")

    def __init__(self):
        import re

        self.word = re.compile(r"\S+")
        self.alpha = re.compile(r"[a-zA-Z]")
        self.symbol = re.compile(r"#|…|\.\.\.")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            # the 8-column assignment below raises on an empty rows
            # list — return the typed empty frame instead
            out = batch[["doc_id"]].copy()
            for col in ("n_words",):
                out[col] = pd.Series(dtype=np.int64)
            for col in ("mean_word_len", "alpha_ratio", "symbol_ratio",
                        "bullet_frac", "ellipsis_frac"):
                out[col] = pd.Series(dtype=np.float64)
            for col in ("stop_hits", "fail_mask"):
                out[col] = pd.Series(dtype=np.int32)
            out["keep"] = pd.Series(dtype=bool)
            return out
        rows = []
        for text in batch["text"]:
            t = text or ""
            toks = self.word.findall(t)
            n = len(toks)
            mwl = sum(len(w) for w in toks) / n if n else 0.0
            alpha = (sum(1 for w in toks if self.alpha.search(w)) / n
                     if n else 0.0)
            sym = len(self.symbol.findall(t)) / n if n else 0.0
            lines = [ln.strip() for ln in t.split("\n")]
            lines = [ln for ln in lines if ln]
            nl = len(lines)
            bullet = (sum(ln.startswith(self.BULLETS) for ln in lines) / nl
                      if nl else 0.0)
            ell = (sum(ln.endswith(("…", "...")) for ln in lines) / nl
                   if nl else 0.0)
            low = set(w.lower() for w in toks)
            stops = sum(s in low for s in self.REQUIRED_STOPS)
            mask = ((not 50 <= n <= 100_000) << 0
                    | (not 3.0 <= mwl <= 10.0) << 1
                    | (sym >= 0.1) << 2
                    | (bullet >= 0.9) << 3
                    | (ell >= 0.3) << 4
                    | (alpha < 0.8) << 5
                    | (stops < 2) << 6)
            rows.append((n, round(mwl, 6), round(alpha, 6), round(sym, 6),
                         round(bullet, 6), round(ell, 6), stops, mask))
        out = batch[["doc_id"]].copy()
        out[["n_words", "mean_word_len", "alpha_ratio", "symbol_ratio",
             "bullet_frac", "ellipsis_frac", "stop_hits", "fail_mask"]] = rows
        out["n_words"] = out["n_words"].astype(np.int64)
        out["fail_mask"] = out["fail_mask"].astype(np.int32)
        out["stop_hits"] = out["stop_hits"].astype(np.int32)
        out["keep"] = out["fail_mask"] == 0
        return out


def gopher_rules(sf_dir: str):
    """Per-document Gopher quality-rule evaluation → Dataset
    ``(doc_id, signals..., fail_mask, keep)`` sorted by doc_id.
    Composable as a corpus gate: ``.filter(expr="keep")`` upstream of
    dedup/packing drops the failing documents while the signal columns
    make the judgement auditable."""
    return _read_docs(sf_dir, ["doc_id", "text"]) \
        .map_batches(GopherRules, batch_format="pandas", batch_size=2048,
                     concurrency=(1, 4)).sort("doc_id")


# -------------------------------------------------------- boilerplate
# ASCII whitespace stripped from line edges — the SAME set the DuckDB
# oracle trims, so engine and SQL agree on line identity. Unicode
# whitespace (NBSP etc.) deliberately stays part of the line on BOTH
# sides (the same ASCII bound word_freq's oracle documents); a pandas
# default .str.strip() would silently diverge from the oracle on
# NBSP-trailing web text.
_ASCII_WS = " \t\r\f\v\n"


def _stripped_lines(b: pd.DataFrame) -> pd.Series:
    lines = b["text"].fillna("").str.split("\n").explode() \
        .str.strip(_ASCII_WS)
    return lines[lines != ""]


def boilerplate_line_df(sf_dir: str, n_buckets: int = 32):
    """Per-line document frequency over the corpus — lines stripped
    (ASCII whitespace; see ``_ASCII_WS``), empties dropped, counted
    once per containing document (the C4 / CCNet boilerplate signal:
    nav bars, cookie banners, footers repeat across pages). Same
    bucketed unbounded-key pattern as ``word_counts``; output
    ``(line, df)``."""
    return _bucketed_string_counts(
        _read_docs(sf_dir, ["text"]),
        lambda b: _stripped_lines(b).groupby(level=0).unique()
        .explode().dropna(),
        "line", "df", n_buckets)


def remove_boilerplate_lines(sf_dir: str, min_df: int = 2,
                             n_buckets: int = 32,
                             max_broadcast_lines: int = 1_000_000):
    """Drop every line appearing in ≥ ``min_df`` documents (stripped
    match) from every document — C4/CCNet boilerplate removal. The
    boilerplate-line HASH set is duplicate-rate-bounded (only repeated
    lines enter it) and broadcasts once via ``ray.put``; if it exceeds
    ``max_broadcast_lines`` the call refuses loudly rather than ship
    an oversized broadcast (at that scale route the lines through a
    bucket join instead — the `minhash` verify's strategy split).

    Output ``(doc_id, text_clean, n_lines, n_removed)`` sorted by
    doc_id: stripped surviving lines re-joined with a newline; empty
    lines always drop (they match the stripped-empty convention on
    both engine and oracle sides)."""
    import ray

    from ..functions.hashing import hash64_array

    df = boilerplate_line_df(sf_dir, n_buckets)

    def bad_hashes(b: pd.DataFrame) -> pd.DataFrame:
        hot = b.loc[b["df"] >= min_df, "line"]
        return pd.DataFrame({"h": hash64_array(hot.tolist())})

    bad = df.map_batches(bad_hashes, batch_format="pandas").to_pandas()
    if "h" not in bad.columns:      # no boilerplate anywhere: Ray's
        bad = pd.DataFrame({"h": np.array([], dtype=np.uint64)})
        #                      (zero-row to_pandas drops columns)
    if len(bad) > max_broadcast_lines:
        raise ValueError(
            f"{len(bad)} boilerplate lines exceed max_broadcast_lines="
            f"{max_broadcast_lines}; raise the cap or switch this corpus "
            f"to a bucket-join delivery")
    ref = ray.put(np.sort(bad["h"].to_numpy().astype(np.uint64)))

    class Clean:
        def __init__(self):
            self.bad = ray.get(ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            lines = _stripped_lines(b)     # SAME strip as the df pass
            n_lines = lines.groupby(level=0).size()
            h = hash64_array(lines.tolist()).astype(np.uint64)
            idx = np.searchsorted(self.bad, h)
            idx = np.minimum(idx, max(len(self.bad) - 1, 0))
            is_bad = (self.bad[idx] == h) if len(self.bad) else \
                np.zeros(len(h), dtype=bool)
            kept = lines[~is_bad]
            gb = kept.groupby(level=0)     # one grouping pass, two aggs
            out = b[["doc_id"]].copy()
            out["text_clean"] = gb.agg("\n".join) \
                .reindex(b.index, fill_value="")
            out["n_lines"] = n_lines.reindex(b.index, fill_value=0) \
                .astype(np.int64)
            out["n_removed"] = (out["n_lines"]
                                - gb.size().reindex(b.index, fill_value=0)) \
                .astype(np.int64)
            return out

    return _read_docs(sf_dir, ["doc_id", "text"]) \
        .map_batches(Clean, batch_format="pandas", batch_size=2048,
                     concurrency=(1, 4)).sort("doc_id")


REMOVE_BOILERPLATE_SQL_TMPL = r"""
WITH expl AS (
  SELECT doc_id, trim(part.l, ' ' || chr(9) || chr(13) || chr(12) ||
                 chr(11)) AS line, part.i AS ord
  FROM (SELECT doc_id, string_split(coalesce(text, ''), chr(10)) AS ls
        FROM documents),
       LATERAL (SELECT unnest(ls) AS l,
                       unnest(range(1, len(ls) + 1)) AS i) part
), nonempty AS (
  SELECT * FROM expl WHERE line <> ''
), bad AS (
  SELECT line FROM (
    SELECT line, count(DISTINCT doc_id) AS df FROM nonempty GROUP BY line)
  WHERE df >= {min_df}
)
SELECT d.doc_id,
       coalesce(k.text_clean, '') AS text_clean,
       coalesce(t.n_lines, 0)::BIGINT AS n_lines,
       (coalesce(t.n_lines, 0) - coalesce(k.n_kept, 0))::BIGINT AS n_removed
FROM documents d
LEFT JOIN (SELECT doc_id, count(*) AS n_lines FROM nonempty
           GROUP BY doc_id) t USING (doc_id)
LEFT JOIN (SELECT doc_id,
                  string_agg(line, chr(10) ORDER BY ord) AS text_clean,
                  count(*) AS n_kept
           FROM nonempty WHERE line NOT IN (SELECT line FROM bad)
           GROUP BY doc_id) k USING (doc_id)
ORDER BY doc_id
"""
REMOVE_BOILERPLATE_SQL = REMOVE_BOILERPLATE_SQL_TMPL.format(min_df=2)


def dedup_lines_within_doc(sf_dir: str):
    """Drop repeated lines WITHIN each document, keeping the first
    occurrence in order — the within-doc sibling of
    ``remove_boilerplate_lines`` (which removes lines repeated ACROSS
    documents): RefinedWeb-style repetition cleanup for templated
    pages that restate the same line many times. EXACT line match
    (no stripping — a re-indented copy is a different line; the
    cross-doc op owns fuzzy/stripped matching), empty lines kept
    once like any other duplicate, NULL text = empty string (module
    convention). The dedup itself is batch-local and shuffle-free —
    every document rewrites inside its own batch in one streaming
    pass; the trailing ``sort("doc_id")`` is the house ORDER BY for
    oracle/driver determinism and IS a full-output shuffle — drop it
    (or write partitioned) when composing into a corpus pipeline at
    scale. Output: ``(doc_id, text_dedup, n_removed)``."""

    def fn(b: pd.DataFrame) -> pd.DataFrame:
        ex = b["text"].fillna("").str.split("\n").explode()
        first = ~pd.DataFrame({"i": ex.index, "line": ex.to_numpy()}) \
            .duplicated(["i", "line"]).to_numpy()
        kept = ex[first].groupby(level=0)
        out = b[["doc_id"]].copy()
        out["text_dedup"] = kept.agg("\n".join).reindex(b.index)
        out["n_removed"] = (ex.groupby(level=0).size()
                            - kept.size().reindex(b.index)) \
            .astype(np.int64)
        return out

    return _read_docs(sf_dir, ["doc_id", "text"]) \
        .map_batches(fn, batch_format="pandas", batch_size=2048) \
        .sort("doc_id")


DEDUP_LINES_SQL = r"""
WITH expl AS (
  SELECT doc_id, part.l AS line, part.i AS idx
  FROM (SELECT doc_id, string_split(coalesce(text, ''), chr(10)) AS ls
        FROM documents),
       LATERAL (SELECT unnest(ls) AS l,
                       unnest(range(1, len(ls) + 1)) AS i) part
), ranked AS (
  SELECT doc_id, line, idx,
         row_number() OVER (PARTITION BY doc_id, line ORDER BY idx) AS rn
  FROM expl
)
SELECT doc_id,
       string_agg(line, chr(10) ORDER BY idx)
         FILTER (WHERE rn = 1) AS text_dedup,
       (count(*) - count(*) FILTER (WHERE rn = 1))::BIGINT AS n_removed
FROM ranked
GROUP BY doc_id
ORDER BY doc_id
"""


class CompressionRatio:
    """Actor-pool stage: per-document zlib compressibility — the
    CCNet / RedPajama-v2 quality signal (public method): text that
    compresses far below ~0.3× its size is almost always repetition
    or boilerplate; text near 1.0× is high-entropy noise. The loop is
    O(docs) Python overhead only — each iteration is one C zlib call
    over the whole document, so compute stays native. Fixed level=6
    keeps the score deterministic across runs and workers."""

    def __init__(self):
        import zlib
        self.compress = zlib.compress

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        enc = [s.encode("utf-8", "surrogatepass")
               for s in b["text"].fillna("")]
        n = np.array([len(e) for e in enc], dtype=np.int64)
        comp = np.array([len(self.compress(e, 6)) if e else 0
                         for e in enc], dtype=np.int64)
        return pd.DataFrame({
            "doc_id": b["doc_id"].to_numpy(),
            "n_bytes": n,
            "compress_ratio": np.where(n > 0, comp / np.maximum(n, 1),
                                       0.0)})


def compression_ratio(sf_dir: str):
    """Per-doc zlib compression ratio, sorted by doc_id (non-SQL:
    no zlib in DuckDB — tested against a direct Python reference)."""
    return _read_docs(sf_dir, ["doc_id", "text"]) \
        .map_batches(CompressionRatio, batch_format="pandas",
                     batch_size=1024, concurrency=(1, 4)) \
        .sort("doc_id")
