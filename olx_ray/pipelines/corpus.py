"""Corpus-preparation pipelines over the ``documents`` table — the
operators a training-data pipeline runs AFTER cleaning/dedup:

- ``train_val_split``     — deterministic fingerprint-based split
  (Knuth multiplicative hash, SQL-replicable → DuckDB oracle).
- ``build_vocab``         — top-V vocabulary with dense ids
  (combiner word counts → deterministic rank; DuckDB oracle).
- ``length_histogram``    — token-length distribution in fixed
  buckets (DuckDB oracle).
- ``contamination_13gram``— benchmark decontamination: flags corpus
  docs sharing any 13-gram with a benchmark set (the standard
  eval-leak check). The benchmark n-gram hash set is the ONLY
  broadcast (benchmark-bounded, never corpus-bounded).
- ``pack_sequences``      — greedy token packing of documents into
  fixed-capacity training sequences, packed per explicit doc_id-hash
  bucket so pack assignment is a pure function of the table
  (partition-invariant); invariants pinned in tests.

All per-batch kernels are vectorized; stateful setup happens once per
actor / task closure."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd
from ray.data.aggregate import Sum

from .dedup import shingle_hashes


def _read_docs(sf_dir: str, columns=None):
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


# ------------------------------------------------------------------ split
def _split_fingerprint(ids: np.ndarray) -> np.ndarray:
    """The 0..99 split fingerprint shared by ``train_val_split``,
    ``training_corpus`` and ``leakage_safe_split`` — ONE copy, because
    the three operators' pinned agreement (singletons of the
    leakage-safe split must equal the plain split, the composed
    pipeline must match the standalone) depends on them never
    drifting. Hash = the shared ``knuth_fingerprint32`` (engine↔SQL
    bit-parity rationale lives there) reduced to 0..99."""
    from ..functions.hashing import knuth_fingerprint32

    return knuth_fingerprint32(ids) % np.uint64(100)


def train_val_split(sf_dir: str, val_pct: int = 10):
    """Deterministic doc_id-fingerprint split: stable across runs,
    machines and engines (pure integer arithmetic — the SQL oracle
    computes the identical assignment)."""

    def fn(b: pa.Table) -> pa.Table:
        f = _split_fingerprint(b["doc_id"].to_numpy(zero_copy_only=False))
        split = np.where(f < 100 - val_pct, "train", "val")
        return pa.table({"doc_id": b["doc_id"],
                         "split": pa.array(split.tolist(), pa.string())})

    return _read_docs(sf_dir, ["doc_id"]).map_batches(
        fn, batch_format="pyarrow").sort("doc_id")


TRAIN_VAL_SPLIT_SQL = """
SELECT doc_id,
       CASE WHEN (doc_id::HUGEINT * 2654435761) % 4294967296 % 100 < 90
            THEN 'train' ELSE 'val' END AS split
FROM documents ORDER BY doc_id
"""


# ------------------------------------------------------------------ vocab
def build_vocab(sf_dir: str, k: int = 1000):
    """Top-V vocabulary with dense ids: bucketed combiner word counts
    (see ``text.word_counts`` — no bare string-key Dataset.aggregate)
    → deterministic (count desc, word asc) rank."""
    from .text import word_counts

    def add_ids(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["vocab_id"] = np.arange(1, len(b) + 1, dtype=np.int64)
        return b

    return (word_counts(sf_dir)
            .sort(["n", "word"], descending=[True, False])
            .limit(k)
            .repartition(1)                      # order-preserving
            # batch_size=k: the rank column must be computed over ONE
            # batch — the default batch size would restart ids at 1
            # mid-vocabulary for k > 1024
            .map_batches(add_ids, batch_format="pandas", batch_size=k))


BUILD_VOCAB_SQL = """
SELECT word, n, row_number() OVER (ORDER BY n DESC, word) AS vocab_id FROM
  (SELECT word, count(*)::BIGINT AS n FROM
     (SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
      FROM documents)
   WHERE word IS NOT NULL AND word != ''
   GROUP BY word)
ORDER BY n DESC, word LIMIT 1000
"""


# -------------------------------------------------------------- histogram
def length_histogram(sf_dir: str, bucket: int = 10):
    """Token-length distribution: per-doc token count → fixed-width
    bucket → per-batch partial counts → tiny final groupby."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        n = b["text"].str.split().str.len().fillna(0).astype("int64")
        lo = n // bucket * bucket
        return lo.value_counts().rename_axis("bucket_lo") \
            .reset_index(name="n_docs")

    return (_read_docs(sf_dir, ["text"])
            .map_batches(partial, batch_format="pandas", batch_size=8192)
            .groupby("bucket_lo").aggregate(Sum("n_docs", alias_name="n_docs"))
            .sort("bucket_lo"))


LENGTH_HISTOGRAM_SQL = """
SELECT (CASE WHEN text IS NULL OR trim(text) = '' THEN 0
             ELSE len(regexp_split_to_array(trim(text), '\\s+')) END
        // 10 * 10)::BIGINT AS bucket_lo,
       count(*)::BIGINT AS n_docs
FROM documents GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------- sampling
def stratified_sample(sf_dir: str, pct: int = 20):
    """TRUE stratified sample: within every ``lang`` stratum, take
    exactly ⌈pct% · |stratum|⌉ docs — the ones ranked lowest by a
    deterministic id-fingerprint (no RNG state; the DuckDB oracle
    computes the identical membership via a window rank). Guarantees
    every stratum is represented, which a plain uniform hash filter
    does not. One groupby shuffle on ``lang``; strata (languages) are
    bounded, so one vectorized task per stratum is the right shape."""

    def take_stratum(g: pd.DataFrame) -> pd.DataFrame:
        from ..functions.hashing import knuth_fingerprint32

        k = int(np.ceil(len(g) * pct / 100))
        f = knuth_fingerprint32(g["doc_id"].to_numpy())
        return g.assign(_f=f).sort_values(["_f", "doc_id"]).head(k) \
            .drop(columns="_f")

    return _read_docs(sf_dir, ["doc_id", "lang"]) \
        .groupby("lang").map_groups(take_stratum, batch_format="pandas") \
        .sort("doc_id")


STRATIFIED_SAMPLE_SQL = """
SELECT doc_id, lang FROM (
  SELECT doc_id, lang,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY (doc_id::HUGEINT * 2654435761) % 4294967296, doc_id) AS rk,
         count(*) OVER (PARTITION BY lang) AS n
  FROM documents)
WHERE rk <= ceil(n * 0.20)
ORDER BY doc_id
"""


# --------------------------------------------------------------- quantiles
def token_quantiles(sf_dir: str, qs=(25, 50, 75, 95)):
    """EXACT token-count quantiles, distributed: per-batch VALUE
    histograms (distinct token counts are bounded, unlike rows) → small
    groupby → driver-side cumulative rank pick. Matches DuckDB
    ``quantile_disc`` (value at rank ⌈q·N⌉)."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        n = b["text"].str.split().str.len().fillna(0).astype("int64")
        return n.value_counts().rename_axis("n_tokens") \
            .reset_index(name="cnt")

    hist = (_read_docs(sf_dir, ["text"])
            .map_batches(partial, batch_format="pandas", batch_size=8192)
            .groupby("n_tokens").aggregate(Sum("cnt", alias_name="cnt"))
            .sort("n_tokens").to_pandas())
    total = int(hist["cnt"].sum()) if len(hist) else 0
    if total == 0:
        # zero-row corpus: no quantiles exist — typed empty result
        # (the repo's standard zero-row contract), not an IndexError
        return pd.DataFrame({"q": pd.Series(dtype="int64"),
                             "n_tokens": pd.Series(dtype="int64")})
    cum = hist["cnt"].cumsum()
    out_q, out_v = [], []
    for q in qs:
        rank = int(np.ceil(q / 100 * total))
        out_q.append(q)
        out_v.append(int(hist.loc[cum >= rank, "n_tokens"].iloc[0]))
    return pd.DataFrame({"q": pd.Series(out_q, dtype="int64"),
                         "n_tokens": pd.Series(out_v, dtype="int64")})


TOKEN_QUANTILES_SQL = """
WITH n AS (SELECT CASE WHEN text IS NULL OR trim(text) = '' THEN 0
                       ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                  END AS n
           FROM documents)
SELECT 25 AS q, quantile_disc(n, 0.25)::BIGINT AS n_tokens FROM n
UNION ALL SELECT 50, quantile_disc(n, 0.50)::BIGINT FROM n
UNION ALL SELECT 75, quantile_disc(n, 0.75)::BIGINT FROM n
UNION ALL SELECT 95, quantile_disc(n, 0.95)::BIGINT FROM n
ORDER BY q
"""


# ---------------------------------------------------------- contamination
def _benchmark_grams(sf_dir: str, n: int, benchmark_max_id: int) -> np.ndarray:
    """SORTED uint64 n-gram hash set of the benchmark slice (docs with
    doc_id < ``benchmark_max_id``), built from a filtered
    predicate-pushdown read — O(benchmark), never corpus-sized. Shared
    by ``contamination_13gram`` and ``training_corpus``."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    bench = pads.dataset(f"{sf_dir}/documents.parquet").to_table(
        columns=["text"], filter=pc.field("doc_id") < benchmark_max_id)
    grams: set[int] = set()
    for t in bench["text"].to_pylist():
        if len((t or "").split()) >= n:         # short docs have no n-gram
            grams.update(shingle_hashes(t, n).tolist())
    return np.sort(np.fromiter(grams, dtype=np.uint64, count=len(grams)))


def _gram_hits(text: str, grams_sorted: np.ndarray, n: int) -> int:
    """Number of ``text``'s word n-grams present in the sorted
    benchmark-gram array (vectorized searchsorted probe)."""
    if len(grams_sorted) == 0 or len((text or "").split()) < n:
        return 0
    h = shingle_hashes(text, n)
    idx = np.searchsorted(grams_sorted, h)
    idx[idx == len(grams_sorted)] = 0
    return int((grams_sorted[idx] == h).sum())


def contamination_13gram(sf_dir: str, n: int = 13,
                         benchmark_max_id: int = 50):
    """Eval-set decontamination: flag corpus docs that share ANY word
    n-gram (default 13, the common contamination window) with the
    benchmark set (here: docs with doc_id < ``benchmark_max_id``,
    standing in for an external eval suite).

    The benchmark's n-gram hash set is built once from a filtered
    (predicate-pushdown) read — O(benchmark), broadcast via ray.put;
    the corpus streams through a vectorized membership probe. Not
    SQL-expressible (hash-based n-grams) → invariants pinned in
    tests."""
    ref = ray.put(_benchmark_grams(sf_dir, n, benchmark_max_id))

    class Probe:
        def __init__(self):
            self.grams = ray.get(ref)           # zero-copy; pre-sorted

        def __call__(self, b: pa.Table) -> pa.Table:
            hits = np.fromiter(
                (_gram_hits(t, self.grams, n) for t in b["text"].to_pylist()),
                dtype=np.int64, count=b.num_rows)
            return pa.table({
                "doc_id": b["doc_id"],
                "n_contaminated": pa.array(hits, pa.int64()),
                "is_contaminated": pa.array(hits > 0, pa.bool_()),
            })

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        Probe, batch_format="pyarrow", batch_size=2048,
        concurrency=(1, 4), num_cpus=1).sort("doc_id")


def contamination_semantic(sf_dir: str, threshold: float = 0.95,
                           benchmark_max_id: int = 50):
    """Embedding-space eval-set decontamination — the semantic sibling
    of ``contamination_13gram`` (the DataComp-LM/Phi-style gate: exact
    n-grams miss paraphrased benchmark leakage; cosine against the
    benchmark's embeddings catches it). Rows with ``vec_id <
    benchmark_max_id`` stand in for the embedded eval suite.

    Same shape as the n-gram gate: the benchmark matrix is bounded —
    one predicate-pushdown read, L2-normalized, ``ray.put`` once,
    fetched per actor in ``__init__`` — and the corpus streams through
    one vectorized matmul per batch (O(batch · |bench| · d), no
    shuffle; the output sort is the only exchange). Returns
    ``(vec_id, n_contaminated, max_cos, is_contaminated)`` where
    ``n_contaminated`` counts benchmark vectors with cos >
    ``threshold`` (benchmark rows flag themselves at cos 1.0, like the
    n-gram gate). Fully SQL-expressible → DuckDB oracle in pytest."""
    import pyarrow.parquet as pq

    from ..functions.blocks import list_matrix

    bt = pq.read_table(f"{sf_dir}/embeddings.parquet",
                       columns=["vec_id", "embedding"],
                       filters=[("vec_id", "<", benchmark_max_id)])
    bench = list_matrix(bt["embedding"])
    if len(bench) == 0:
        raise ValueError(
            f"no benchmark rows under vec_id < {benchmark_max_id}")
    # zero vectors normalize to 0 (cos 0 against everything), not NaN —
    # an unguarded 0/0 would make the row silently NEVER contaminated
    # (NaN > threshold is False), the exact false-negative a
    # decontamination gate must not have
    nb = np.linalg.norm(bench, axis=1, keepdims=True)
    nb[nb == 0] = 1.0
    bench /= nb
    ref = ray.put(bench)

    class Probe:
        def __init__(self):
            self.bench = ray.get(ref)           # fetched once per actor

        def __call__(self, b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return pa.table({
                    "vec_id": pa.array([], pa.int64()),
                    "n_contaminated": pa.array([], pa.int64()),
                    "max_cos": pa.array([], pa.float64()),
                    "is_contaminated": pa.array([], pa.bool_())})
            m = list_matrix(b["embedding"])
            nm = np.linalg.norm(m, axis=1, keepdims=True)
            nm[nm == 0] = 1.0                   # see the bench guard
            m /= nm
            cos = m @ self.bench.T              # (batch, |bench|)
            n = (cos > threshold).sum(axis=1).astype(np.int64)
            return pa.table({
                "vec_id": b["vec_id"],
                "n_contaminated": pa.array(n, pa.int64()),
                "max_cos": pa.array(cos.max(axis=1), pa.float64()),
                "is_contaminated": pa.array(n > 0, pa.bool_())})

    return rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                           columns=["vec_id", "embedding"]) \
        .map_batches(Probe, batch_format="pyarrow", batch_size=2048,
                     concurrency=(1, 4), num_cpus=1).sort("vec_id")


# DuckDB oracle (pytest): same gate in SQL; max_cos rounds to 6dp on
# both sides (numpy float64 dot vs DuckDB double cosine agree to
# ~1e-12; counts/flags are exact away from the threshold boundary).
CONTAMINATION_SEMANTIC_SQL = """
SELECT e.vec_id,
       sum(CASE WHEN list_cosine_similarity(e.embedding::DOUBLE[],
                                            b.embedding::DOUBLE[])
                     > {threshold} THEN 1 ELSE 0 END)::BIGINT
         AS n_contaminated,
       round(max(list_cosine_similarity(e.embedding::DOUBLE[],
                                        b.embedding::DOUBLE[])), 6)
         AS max_cos,
       bool_or(list_cosine_similarity(e.embedding::DOUBLE[],
                                      b.embedding::DOUBLE[])
               > {threshold}) AS is_contaminated
FROM embeddings e, embeddings b
WHERE b.vec_id < {benchmark_max_id}
GROUP BY e.vec_id ORDER BY e.vec_id
"""


# ------------------------------------------------------------- end-to-end
def _pack_bucket(ids: np.ndarray, n_buckets: int = 64) -> np.ndarray:
    """Pack bucket from the shared ``knuth_fingerprint32`` (bit-parity
    SQL at the default 64: ``(id::HUGEINT * 2654435761) % 2^32 // 128 %
    64``). Pack composition DEPENDS on this assignment — unlike the
    pure-partitioning ``bucket_of`` buckets elsewhere — so it must be
    a hash both engines can compute; fmix64's wrap-around uint64
    multiplies aren't HUGEINT-safe in SQL."""
    from ..functions.hashing import knuth_fingerprint32

    return ((knuth_fingerprint32(ids) >> np.uint64(7))
            % np.uint64(n_buckets)).astype(np.int32)


def training_corpus(sf_dir: str, quality_min: float = 0.45,
                    seq_len: int = 512, benchmark_max_id: int = 50,
                    contamination_n: int = 13):
    """THE composed training-data pipeline — what a real corpus build
    runs end-to-end, as ONE streaming Dataset:

        quality score + 13-gram decontamination (benchmark-bounded
        broadcast probe, docs sharing any eval n-gram dropped) →
        filter → exact dedup (keep min doc_id per content hash,
        bucketed vectorized) → deterministic train/val split → greedy
        token packing

    Text is dropped after the first pass (hash + token count carry
    forward), so both shuffles — the dedup groupby and the pack-bucket
    groupby — move narrow rows only. Packing runs per explicit
    doc_id-hash bucket (sorted within the bucket, one packer per
    split), making the WHOLE output a pure function of
    ``(table, parameters)`` — partition/batch-layout invariant like
    every other operator (batch-local packing made pack composition
    depend on Ray's block cuts). Output: one row per surviving doc
    with its split and pack assignment. Invariants pinned in tests;
    components individually oracle-checked / tested via their own
    operators (``contamination_13gram``, ``pack_sequences``)."""
    from ..functions.hashing import hash64
    from .text import QualityScore

    gref = ray.put(_benchmark_grams(sf_dir, contamination_n,
                                    benchmark_max_id))
    scorer = QualityScore()

    def featurize(b: pd.DataFrame) -> pd.DataFrame:
        out = scorer(b)
        out["text_hash"] = np.fromiter(
            (hash64(t or "") for t in b["text"]), dtype=np.uint64,
            count=len(b))
        out["bucket"] = (out["text_hash"] % np.uint64(32)).astype("int32")
        g = ray.get(gref)          # zero-copy plasma, sorted on the driver
        keep = np.fromiter((_gram_hits(t, g, contamination_n) == 0
                            for t in b["text"]), dtype=bool, count=len(b))
        out = out[keep]            # decontaminate before anything shuffles
        return out[["doc_id", "n_tokens", "quality", "text_hash", "bucket"]]

    def keep_min(g: pd.DataFrame) -> pd.DataFrame:
        idx = g.groupby("text_hash")["doc_id"].idxmin()
        out = g.loc[idx.sort_values()].drop(columns=["bucket", "text_hash"])
        # pack-bucket by doc_id HASH: the pack stage groups on this, so
        # pack assignment is a pure function of the surviving rows —
        # never of the block layout this task happened to see. The
        # knuth reduction (not fmix64's wrap-around multiplies) keeps
        # the bucket SQL-derivable — see TRAINING_CORPUS_SQL.
        return out.assign(
            _pb=_pack_bucket(out["doc_id"].to_numpy().astype(np.int64)))

    def assign_and_pack(b: pd.DataFrame) -> pd.DataFrame:
        b = b.drop(columns=["_pb"]).sort_values("doc_id")
        ids = b["doc_id"].to_numpy()
        split = np.where(_split_fingerprint(ids) < 90, "train", "val")
        counts = b["n_tokens"].to_numpy()
        pack_arr = np.empty(len(b), dtype=np.int64)
        start_arr = np.empty(len(b), dtype=np.int64)
        for sp in ("train", "val"):     # one shared packer per split
            m = split == sp
            p, s, _, _ = _greedy_pack(ids[m], counts[m], seq_len)
            pack_arr[m] = p
            start_arr[m] = s
        out = b[["doc_id", "n_tokens", "quality"]].copy()
        out["split"] = split
        out["pack_id"] = pd.Series(pack_arr, index=b.index, dtype="int64")
        out["start_tok"] = pd.Series(start_arr, index=b.index, dtype="int64")
        return out

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    return (docs
            .map_batches(featurize, batch_format="pandas", batch_size=2048)
            .filter(expr=f"quality >= {quality_min}")
            .groupby("bucket").map_groups(keep_min, batch_format="pandas")
            .groupby("_pb").map_groups(assign_and_pack,
                                       batch_format="pandas")
            .sort("doc_id"))


def training_corpus_sql(quality_min: float = 0.45, seq_len: int = 512,
                        benchmark_max_id: int = 50) -> str:
    """FULL equality oracle for ``training_corpus`` — the whole
    composed pipeline re-derived in DuckDB:

    - quality + n_tokens from the proven ``TEXT_PROFILE_SQL`` composite
      (embedded as a CTE);
    - 13-gram decontamination as STRING-equality of 13-token windows
      (the engine compares 64-bit shingle hashes — equal strings ⇔
      equal hashes, modulo 2^-64 collisions, the same documented
      posture as the text-hash dedup below);
    - exact dedup = min doc_id per TEXT among filtered rows (the
      engine groups on blake2b text hashes — same equivalence);
    - the knuth split + ``_pack_bucket`` reductions in exact HUGEINT
      arithmetic;
    - the greedy packer as a recursive CTE stepping each
      (bucket, split) group in doc_id order with ``_greedy_pack``'s
      literal new-pack rule."""
    from .text import TEXT_PROFILE_SQL

    new_pack = (f"p.fill >= {seq_len} OR p.fill + r.take > {seq_len} "
                f"OR r.n_tokens > {seq_len}")
    return f"""
WITH RECURSIVE tp AS ({TEXT_PROFILE_SQL}),
txt AS (SELECT doc_id, coalesce(text, '') AS text FROM documents),
pos AS (
  SELECT doc_id,
         unnest(regexp_extract_all(text, '\\S+')) AS w,
         generate_subscripts(regexp_extract_all(text, '\\S+'), 1) AS p
  FROM txt),
wins AS (
  SELECT doc_id,
         list(w) OVER (PARTITION BY doc_id ORDER BY p
                       ROWS BETWEEN CURRENT ROW AND 12 FOLLOWING) AS win
  FROM pos),
g13 AS (SELECT doc_id, array_to_string(win, ' ') AS gram
        FROM wins WHERE len(win) = 13),
bench AS (SELECT DISTINCT gram FROM g13
          WHERE doc_id < {benchmark_max_id}),
contaminated AS (SELECT DISTINCT g13.doc_id
                 FROM g13 JOIN bench USING (gram)),
filtered AS (
  SELECT tp.doc_id, tp.n_tokens, tp.quality, txt.text
  FROM tp JOIN txt USING (doc_id)
  WHERE tp.quality >= {quality_min}
    AND NOT EXISTS (SELECT 1 FROM contaminated c
                    WHERE c.doc_id = tp.doc_id)),
assigned AS (
  SELECT doc_id, n_tokens, quality,
         CASE WHEN (doc_id::HUGEINT * 2654435761) % 4294967296 % 100 < 90
              THEN 'train' ELSE 'val' END AS split,
         ((doc_id::HUGEINT * 2654435761) % 4294967296 // 128) % 64 AS pb,
         LEAST(n_tokens, {seq_len})::BIGINT AS take
  FROM filtered
  QUALIFY doc_id = min(doc_id) OVER (PARTITION BY text)),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY pb, split
                               ORDER BY doc_id) AS rn
  FROM assigned),
rec AS (
  SELECT pb, split, rn, doc_id, n_tokens, quality,
         doc_id AS pack_id, 0::BIGINT AS start_tok, take AS fill
  FROM ranked WHERE rn = 1
  UNION ALL
  SELECT r.pb, r.split, r.rn, r.doc_id, r.n_tokens, r.quality,
         CASE WHEN {new_pack} THEN r.doc_id ELSE p.pack_id END,
         CASE WHEN {new_pack} THEN 0::BIGINT ELSE p.fill END,
         CASE WHEN {new_pack} THEN r.take ELSE p.fill + r.take END
  FROM ranked r JOIN rec p
    ON r.pb = p.pb AND r.split = p.split AND r.rn = p.rn + 1)
SELECT doc_id, n_tokens, quality, split, pack_id, start_tok
FROM rec ORDER BY doc_id
"""


# ---------------------------------------------------------------- packing
def _greedy_pack(ids, counts, seq_len: int):
    """Greedy whole-doc packer shared by ``pack_sequences``,
    ``pack_interleaved`` and ``training_corpus`` — one copy of the
    edge cases. Guarantees (pinned in tests): every row's
    ``start_tok < seq_len`` (a doc after an exactly-full pack opens a
    new one, even when it costs zero tokens); pack fill ≤ ``seq_len``;
    an OVERSIZED doc (count > seq_len, stored truncated) never shares
    a pack with an earlier member, and nothing joins after it (its
    truncated cost fills the pack). Returns
    ``(pack_ids, starts, ntoks, truncated)`` lists in input order;
    pack id = the pack's first doc id (caller preserves dtype)."""
    pack_ids, starts, ntoks, trunc = [], [], [], []
    cur, fill, members = None, 0, 0
    for did, cnt in zip(ids, counts):
        cnt = int(cnt)
        take = min(cnt, seq_len)
        oversized = cnt > seq_len
        if (cur is None or fill >= seq_len or fill + take > seq_len
                or (oversized and members)):
            cur, fill, members = did, 0, 0
        pack_ids.append(cur)
        starts.append(fill)
        ntoks.append(take)
        trunc.append(oversized)
        fill += take
        members += 1
    return pack_ids, starts, ntoks, trunc


def pack_sequences(sf_dir: str, seq_len: int = 512, n_buckets: int = 64):
    """Greedy token packing: documents are packed into fixed-capacity
    training sequences PER EXPLICIT doc_id-HASH BUCKET (sorted by
    doc_id inside each bucket), so pack assignment is a PURE FUNCTION
    of ``(table, seq_len, n_buckets)`` — independent of block layout,
    partitioning and batch boundaries, repeatable across runs and
    cluster sizes (batch-local packing made pack composition depend on
    how Ray happened to cut blocks). ``n_buckets`` is part of the
    contract like ``seq_len``: changing it changes pack composition.
    At most one underfull pack per bucket; a doc longer than
    ``seq_len`` gets its own pack, truncated (flagged). Token counts
    are computed BEFORE the bucket shuffle, so only
    ``(doc_id, n_tokens)`` rows move — never text.

    Output: one row per packed doc — (pack_id, doc_id, start_tok,
    n_tokens, truncated); pack_id = doc_id of the pack's first doc
    (globally unique, deterministic)."""
    def featurize(b: pd.DataFrame) -> pd.DataFrame:
        ids = b["doc_id"].to_numpy().astype(np.int64)
        counts = b["text"].str.split().str.len().fillna(0) \
            .astype("int64").to_numpy()
        # the SAME bucket hash as training_corpus/write_training_shards
        # (_pack_bucket): pack composition depends on the assignment,
        # so all three packers must agree or their pack_id sets can't
        # be cross-checked / joined (review finding)
        return pd.DataFrame({"doc_id": ids, "_cnt": counts,
                             "_pb": _pack_bucket(ids, n_buckets)})

    def pack(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values("doc_id")
        ids = b["doc_id"].to_numpy()
        counts = b["_cnt"].to_numpy()
        pack_ids, starts, ntoks, trunc = _greedy_pack(ids, counts, seq_len)
        return pd.DataFrame({
            "pack_id": pd.Series(pack_ids, dtype="int64"),
            "doc_id": pd.Series(ids, dtype="int64"),
            "start_tok": pd.Series(starts, dtype="int64"),
            "n_tokens": pd.Series(ntoks, dtype="int64"),
            "truncated": pd.Series(trunc, dtype="bool"),
        })

    return _read_docs(sf_dir, ["doc_id", "text"]) \
        .map_batches(featurize, batch_format="pandas", batch_size=4096) \
        .groupby("_pb").map_groups(pack, batch_format="pandas") \
        .sort("doc_id")


def weighted_interleave(sources: dict[str, tuple], id_col: str = "doc_id",
                        seed: int = 0):
    """Deterministic weighted mixing of multiple corpora into one
    training stream — the mixture step every LLM run performs (e.g.
    70 % web / 20 % code / 10 % reference).

    ``sources`` maps a source name to ``(dataset, weight)``. Each row
    gets an exponential race clock ``-ln(u_id)/weight``
    (`sampling.exp_clock`); the union sorted by that clock is a
    weighted random permutation whose every prefix is a weighted
    without-replacement sample (Efraimidis-Spirakis) — so any training
    prefix matches the target mixture in expectation, per-source order
    is a uniform shuffle, and when a small source exhausts the stream
    continues from the rest (without-replacement semantics, the
    non-degenerate choice for data-constrained mixes). Output adds
    ``mix_source`` and ``mix_key`` columns (``mix_``-prefixed so a
    corpus's own ``source`` column survives), ordered by ``mix_key``.

    Deterministic in (ids, weights, seed) and partition-invariant;
    collisions across sources are avoided by folding the source name
    into the per-source seed. A source with weight <= 0 is EXCLUDED
    from the stream entirely (not merely demoted to the tail); at
    least one source must have positive weight. The global sort is the one all-to-all
    this operator inherently needs (it defines a total training
    order); to mix WITHOUT a global order, consume the union and
    shard-locally sort each output block by ``mix_key`` instead."""
    from ..functions.hashing import hash64
    from .sampling import exp_clock

    parts = []
    for name, (ds, weight) in sorted(sources.items()):
        w = float(weight)
        if w != w:  # NaN: an upstream bug, not an exclusion request —
            # silently dropping the source would vanish a corpus from
            # the training mix with no signal
            raise ValueError(f"weighted_interleave: weight for {name!r} "
                             "is NaN")
        if not w > 0:
            # weight <= 0 means EXCLUDED, not demoted: exp_clock gives
            # such rows +inf, which would sort them (in nondeterministic
            # tied order) to the tail of the stream instead of out of it
            continue
        sseed = seed ^ hash64(name)

        def tag(b: pd.DataFrame, *, _n=name, _w=float(weight),
                _s=sseed) -> pd.DataFrame:
            b = b.copy()
            b["mix_source"] = _n
            b["mix_key"] = exp_clock(b[id_col].to_numpy(),
                                     np.full(len(b), _w), _s)
            return b
        parts.append(ds.map_batches(tag, batch_format="pandas"))

    if not parts:
        raise ValueError("weighted_interleave: no source has weight > 0")
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out.sort("mix_key")


def epoch_shuffle(ds, epoch: int, id_col: str = "doc_id", seed: int = 0):
    """Deterministic per-epoch global reshuffle of a training corpus:
    every epoch visits all rows in a fresh uniform-random order that is
    a pure function of (ids, epoch, seed) — reproducible across runs
    and partitionings, no RNG state, no driver materialization. The
    standard alternative, ``Dataset.random_shuffle``, is neither
    reproducible across cluster shapes nor addressable by epoch.

    Key = fmix64(id ^ f(epoch, seed)); the global sort on it is the one
    all-to-all the TOTAL-order contract needs (same note as
    `weighted_interleave`). For shard-local shuffling (per-worker
    reader order, no exchange) sort each output block by
    ``shuffle_key`` instead of calling this. Output keeps all columns
    plus ``shuffle_key``."""
    from ..functions.hashing import mix64

    eseed = (seed * 0x9E3779B97F4A7C15 + epoch * 0xC2B2AE3D27D4EB4F) \
        & 0xFFFFFFFFFFFFFFFF

    def key(b: pd.DataFrame) -> pd.DataFrame:
        ids = b[id_col].to_numpy()
        b = b.copy()
        b["shuffle_key"] = mix64(ids.astype(np.int64, copy=False), eseed)
        return b

    return ds.map_batches(key, batch_format="pandas").sort("shuffle_key")


# ------------------------------------------------------------- chunking
def chunk_documents(sf_dir: str, max_tokens: int = 256, overlap: int = 32):
    """Sliding token-window document chunking — the standard long-doc
    preprocessing step before embedding / context-window training:
    every doc splits into windows of ≤ ``max_tokens`` whitespace tokens
    with ``overlap`` tokens shared between consecutive windows
    (stride = max_tokens − overlap). Chunk starts are
    ``0, stride, 2·stride, … < max(n_tokens − overlap, 1)``, so the
    final window always reaches the last token and no window is wholly
    contained in its predecessor; a zero-token doc emits NO chunks.

    Output: ``(doc_id, chunk_idx, start_tok, n_tokens, chunk_text)``
    with ``chunk_text`` the single-space rejoin of the token slice
    (canonical — the tokenization already collapsed whitespace).
    Embarrassingly parallel: one ``map_batches`` pass, no shuffle; the
    oracle is ``CHUNK_DOCUMENTS_SQL`` (list_slice over the same split).
    """
    if not 0 <= overlap < max_tokens:
        raise ValueError("need 0 <= overlap < max_tokens")
    stride = max_tokens - overlap

    def chunk(b: pd.DataFrame) -> pd.DataFrame:
        words = b["text"].fillna("").str.split()
        ids = b["doc_id"].to_numpy()
        n = words.str.len().fillna(0).astype("int64").to_numpy()
        n_chunks = np.where(n == 0, 0,
                            -(-np.maximum(n - overlap, 1) // stride))
        doc_rep = np.repeat(np.arange(len(b)), n_chunks)
        cidx = np.concatenate([np.arange(c) for c in n_chunks]) \
            if len(b) else np.empty(0, np.int64)
        starts = cidx * stride
        ends = np.minimum(starts + max_tokens, n[doc_rep])
        wl = words.to_numpy()
        texts = [" ".join(wl[d][s:e])
                 for d, s, e in zip(doc_rep, starts, ends)]
        return pd.DataFrame({
            "doc_id": ids[doc_rep].astype(np.int64),
            "chunk_idx": cidx.astype(np.int64),
            "start_tok": starts.astype(np.int64),
            "n_tokens": (ends - starts).astype(np.int64),
            "chunk_text": texts})

    return _read_docs(sf_dir, ["doc_id", "text"]) \
        .map_batches(chunk, batch_format="pandas", batch_size=4096) \
        .sort(["doc_id", "chunk_idx"])


CHUNK_DOCUMENTS_SQL_TMPL = """
WITH toks AS (
  -- list_filter drops the empty fragments a leading/trailing/\t-only
  -- separator produces, mirroring Python str.split() exactly
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\\s+'),
                     x -> x != '') AS t
  FROM documents
), sized AS (
  SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) > 0
), st AS (
  SELECT doc_id, t, n,
         unnest(generate_series(0, greatest(n - {overlap} - 1, 0), {stride}))
           AS s
  FROM sized
)
SELECT doc_id,
       (s / {stride})::BIGINT AS chunk_idx,
       s::BIGINT AS start_tok,
       (least(s + {maxt}, n) - s)::BIGINT AS n_tokens,
       array_to_string(list_slice(t, s + 1, least(s + {maxt}, n)), ' ')
         AS chunk_text
FROM st
ORDER BY doc_id, chunk_idx
"""

CHUNK_DOCUMENTS_SQL = CHUNK_DOCUMENTS_SQL_TMPL.format(
    overlap=32, stride=224, maxt=256)


# ------------------------------------------------------------ health report
def corpus_report(sf_dir: str, top_words: int = 20,
                  mg_capacity: int = 4096, kmv_k: int = 4096,
                  fan_in: int = 32, gopher: bool = True):
    """ONE-PASS corpus health report — the dashboard numbers every
    ingestion round wants, composed from the bounded-summary kernels so
    a 100 TB corpus costs one streaming read and zero shuffles:

    - ``n_docs`` / ``total_tokens`` / ``total_chars`` / ``mean_tokens``
      (exact scalar folds);
    - ``lang:<l>`` doc counts (exact — langs are bounded);
    - ``distinct_text_est`` / ``exact_dup_rate_est`` — KMV bottom-k
      over whitespace-normalized text hashes (exact below ``kmv_k``
      distinct; ±1/√k above);
    - ``word:<w>`` top-``top_words`` counts — Misra-Gries heavy
      hitters (lower bounds, undercount ≤ tokens/(capacity+1));
    - ``gopher_pass_rate`` + per-rule ``gopher_fail_rate:<bit>``
      (``text.GopherRules`` bit layout) — exact, 8 bounded rows; the
      per-doc rule pass is the report's priciest kernel, disable with
      ``gopher=False`` for the vectorized-only report.

    All metrics ride ONE ``summary_tree`` as tagged rows
    ``(metric, key, val)``; per-batch summary size is bounded by
    ``langs + kmv_k + mg_capacity + 3`` rows (+8 gopher rows when
    enabled) regardless of batch size.
    Output: a tidy ``(metric, key, value)`` frame. KMV hashes travel as
    float64 (2^-53 relative rounding — irrelevant to an estimate)."""
    from ..functions.hashing import hash64_array
    from ..functions.summaries import mg_reduce, summary_tree

    _gopher_rules = None
    if gopher:
        # once per task closure (module contract), not once per batch:
        # GopherRules compiles its patterns in __init__
        from .text import GopherRules

        _gopher_rules = GopherRules()

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        toks = b["text"].fillna("").str.split()
        lens = toks.str.len().fillna(0).astype("int64")
        rows = [("n_docs", "", float(len(b))),
                ("tokens", "", float(lens.sum())),
                ("chars", "", float(b["text"].fillna("").str.len().sum()))]
        for lang, c in b["lang"].value_counts().items():
            rows.append(("lang", str(lang), float(c)))
        norm = toks.str.join(" ")     # reuse the one tokenize pass
        h = np.unique(hash64_array(norm.tolist()))[:kmv_k]
        kmv = pd.DataFrame({"metric": "kmv", "key": "",
                            "val": h.astype(np.float64)})
        ex = toks.explode().dropna()
        wc = ex.value_counts().rename_axis("key").reset_index(name="n")
        wc = mg_reduce(wc, mg_capacity, count_col="n", tie_cols=("key",))
        words = pd.DataFrame({"metric": "word", "key": wc["key"],
                              "val": wc["n"].astype(np.float64)})
        if gopher:
            gm = _gopher_rules(b)
            rows.append(("gopher_pass", "", float(gm["keep"].sum())))
            fm = gm["fail_mask"].to_numpy()
            for bit in range(7):
                rows.append(("gopher_fail", str(bit),
                             float(int((fm & (1 << bit) != 0).sum()))))
        head = pd.DataFrame(rows, columns=["metric", "key", "val"])
        return pd.concat([head, kmv, words], ignore_index=True)

    def merge(b: pd.DataFrame) -> pd.DataFrame:
        out = []
        scal = b[b["metric"].isin(["n_docs", "tokens", "chars", "lang",
                                   "gopher_pass", "gopher_fail"])]
        out.append(scal.groupby(["metric", "key"], as_index=False)
                   ["val"].sum())
        kmv = np.unique(b.loc[b["metric"] == "kmv", "val"]
                        .to_numpy())[:kmv_k]
        out.append(pd.DataFrame({"metric": "kmv", "key": "", "val": kmv}))
        wc = b[b["metric"] == "word"].groupby("key", as_index=False) \
            ["val"].sum().rename(columns={"val": "n"})
        wc = mg_reduce(wc, mg_capacity, count_col="n", tie_cols=("key",))
        out.append(pd.DataFrame({"metric": "word", "key": wc["key"],
                                 "val": wc["n"].astype(np.float64)}))
        return pd.concat(out, ignore_index=True)

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        b = merge(b)
        get = lambda m: float(b.loc[b["metric"] == m, "val"].sum())
        n_docs, tokens, chars = get("n_docs"), get("tokens"), get("chars")
        kmv = np.unique(b.loc[b["metric"] == "kmv", "val"].to_numpy())
        if len(kmv) < kmv_k:
            distinct = float(len(kmv))
        else:
            distinct = (kmv_k - 1) * (2.0 ** 64) / float(kmv[kmv_k - 1])
        rows = [("n_docs", "", n_docs), ("total_tokens", "", tokens),
                ("total_chars", "", chars),
                ("mean_tokens", "", round(tokens / max(n_docs, 1), 6)),
                ("distinct_text_est", "", round(distinct, 1)),
                ("exact_dup_rate_est", "",
                 round(max(0.0, 1.0 - distinct / max(n_docs, 1)), 6))]
        if gopher:
            rows.append(("gopher_pass_rate", "",
                         round(get("gopher_pass") / max(n_docs, 1), 6)))
            gf = b[b["metric"] == "gopher_fail"].sort_values("key")
            rows += [("gopher_fail_rate", k,
                      round(v / max(n_docs, 1), 6))
                     for k, v in zip(gf["key"], gf["val"])]
        langs = b[b["metric"] == "lang"].sort_values("key")
        rows += [("lang", k, v) for k, v in
                 zip(langs["key"], langs["val"])]
        wc = b[b["metric"] == "word"].sort_values(
            ["val", "key"], ascending=[False, True]).head(top_words)
        rows += [("word", k, v) for k, v in zip(wc["key"], wc["val"])]
        return pd.DataFrame(rows, columns=["metric", "key", "value"])

    return summary_tree(
        _read_docs(sf_dir, ["doc_id", "text", "lang"]), partial, merge,
        finish, fan_in=fan_in, batch_size=4096)


# ------------------------------------------------------------- drift
def corpus_drift(sf_dir_a: str, sf_dir_b: str, *, capacity: int = 4096,
                 bucket: int = 10, fan_in: int = 32) -> pd.DataFrame:
    """Distribution drift between two corpus snapshots — the monitoring
    pass a continuously-fed pipeline runs between crawls to catch
    source shift before it poisons training:

    - ``js_divergence_words``: Jensen-Shannon divergence between the
      two word distributions, estimated from Misra-Gries heavy-hitter
      summaries — the surfaced counts normalize against the EXACT
      per-side token totals (their own one-row scalar fold), with the
      unsurfaced remainder lumped into one OTHER cell so the
      distributions stay proper. This sees HEAD changes and tail MASS
      changes; two equal-mass but disjoint tails are invisible to any
      heavy-hitter summary, which is what the next signal is for;
    - ``vocab_jaccard_est``: KMV bottom-k resemblance estimate of the
      two DISTINCT-WORD sets (k smallest word hashes per side; J ≈
      fraction of the union-sketch's bottom-k present in both —
      Broder'97 minwise resemblance, ±1/√k) — catches membership
      turnover (spam tails, new sources) that preserves head and
      mass;
    - ``len_hist_l1``: exact L1 distance between the normalized
      token-length histograms (``length_histogram`` buckets — bucket
      resolution, the histogram's own contract);
    - ``mean_tokens_delta``: EXACT mean-length shift (from the same
      exact token totals, not the quantized histogram).

    Each side costs THREE streaming passes (the
    ``word_freq_topk_approx`` tree, the histogram small-agg, and the
    token-total/KMV tree) — bounded summaries only, zero shuffles; the
    passes stay separate because fusing them into one tagged tree
    changes the Misra-Gries merge order (different surfaced sets
    within the error bound) and drift deltas are pinned in tests.
    The comparison is driver-side over capacity-bounded frames.
    Symmetric in its arguments by construction (JS is symmetric, L1
    is, delta is absolute)."""
    from .text import word_freq_topk_approx

    from ..functions.hashing import hash64_array
    from ..functions.summaries import summary_tree

    def side(sf):
        words = word_freq_topk_approx(sf, k=capacity, capacity=capacity,
                                      fan_in=fan_in).to_pandas()
        hist = length_histogram(sf, bucket=bucket).to_pandas()
        n_docs = int(hist["n_docs"].sum())

        def tok_partial(b: pd.DataFrame) -> pd.DataFrame:
            toks = b["text"].fillna("").str.split()
            n = toks.str.len().fillna(0).astype("int64")
            # KMV partial: k smallest distinct word hashes in the batch
            ex = toks.explode().dropna()
            h = np.unique(hash64_array(ex.tolist()))[:capacity] \
                if len(ex) else np.empty(0, np.uint64)
            pad = np.full(max(capacity - len(h), 0),
                          np.iinfo(np.uint64).max, np.uint64)
            return pd.DataFrame({"t": [int(n.sum())] * 1,
                                 "kmv": [np.r_[h, pad][:capacity]
                                         .tobytes()]})

        def tok_merge(b: pd.DataFrame) -> pd.DataFrame:
            # mergeable: sum the exact token totals, re-bottom-k the
            # union of the KMV sketches (sentinel padding keeps every
            # summary exactly `capacity` hashes wide)
            if not len(b):
                return b
            allh = np.unique(np.concatenate(
                [np.frombuffer(x, np.uint64) for x in b["kmv"]]))
            pad = np.full(max(capacity - len(allh), 0),
                          np.iinfo(np.uint64).max, np.uint64)
            return pd.DataFrame({
                "t": [int(b["t"].astype("int64").sum())],
                "kmv": [np.r_[allh, pad][:capacity].tobytes()]})

        total_tokens, sketch = 0, np.empty(0, np.uint64)
        if n_docs:
            # bounded tree, NOT take_all over per-batch partials: one
            # 32 KB summary per batch is still O(batches) driver memory
            # at corpus scale — the tree folds them to ONE root row
            root = summary_tree(
                _read_docs(sf, ["text"]), tok_partial, tok_merge,
                fan_in=fan_in, batch_size=8192).take_all()
            total_tokens = int(root[0]["t"])
            allh = np.frombuffer(root[0]["kmv"], np.uint64)
            sketch = allh[allh < np.iinfo(np.uint64).max][:capacity]
        return words, hist, n_docs, total_tokens, sketch

    wa, ha, na, ta, ka = side(sf_dir_a)
    wb, hb, nb, tb, kb = side(sf_dir_b)
    # minwise resemblance: bottom-k of the union; J ≈ |in both| / k
    union = np.unique(np.concatenate([ka, kb]))[:capacity]
    if len(union):
        both = np.isin(union, ka) & np.isin(union, kb)
        vocab_j = float(both.sum()) / len(union)
    else:
        vocab_j = 1.0

    # word JS over the union of surfaced words + an OTHER bucket for
    # the unsurfaced tail, so both sides are proper distributions
    m = wa.rename(columns={"n": "ca"}).merge(
        wb.rename(columns={"n": "cb"}), on="word", how="outer") \
        .fillna(0.0)
    # normalize surfaced counts by the EXACT totals; the remainder
    # (tokens the MG summary did not surface — the tail) is a proper
    # OTHER cell, so tail-only divergence still moves the metric
    pa_ = np.r_[m["ca"].to_numpy() / max(float(ta), 1.0),
                [max(0.0, 1.0 - float(m["ca"].sum()) / max(float(ta), 1.0))]]
    pb_ = np.r_[m["cb"].to_numpy() / max(float(tb), 1.0),
                [max(0.0, 1.0 - float(m["cb"].sum()) / max(float(tb), 1.0))]]
    pa_, pb_ = pa_ / pa_.sum(), pb_ / pb_.sum()
    mid = 0.5 * (pa_ + pb_)

    def kl(p, q):
        mask = p > 0
        return float(np.sum(p[mask] * np.log2(p[mask] / q[mask])))

    js = 0.5 * kl(pa_, mid) + 0.5 * kl(pb_, mid)

    h = ha.rename(columns={"n_docs": "na"}).merge(
        hb.rename(columns={"n_docs": "nb"}), on="bucket_lo",
        how="outer").fillna(0.0)
    l1 = float(np.abs(h["na"] / max(na, 1)
                      - h["nb"] / max(nb, 1)).sum())
    return pd.DataFrame({
        "js_divergence_words": [round(js, 6)],
        "vocab_jaccard_est": [round(vocab_j, 6)],
        "len_hist_l1": [round(l1, 6)],
        "mean_tokens_delta": [round(abs(ta / max(na, 1)
                                        - tb / max(nb, 1)), 6)],
        "n_docs_a": [np.int64(na)], "n_docs_b": [np.int64(nb)]})


# ------------------------------------------------- interleaved packing
def pack_interleaved(docs, seq_len: int = 2048, media_tokens: int = 32,
                     n_buckets: int = 64):
    """Greedy packing of INTERLEAVED text+media span documents (the
    crawl's payload schema — ``(doc_id, spans:list<struct<kind, text,
    media_ref, offset>>)``) into fixed-budget training sequences: the
    MMC4/OBELICS-style assembly step for multimodal LMs (Zhu'23 /
    Laurençon'23 — public pattern). A media span costs the fixed
    ``media_tokens`` visual-token budget, a text span its whitespace
    token count; docs pack WHOLE, per explicit doc_id-HASH bucket in
    doc_id order (like ``pack_sequences`` — pack assignment is a pure
    function of ``(table, seq_len, media_tokens, n_buckets)``,
    independent of block layout; at most one underfull pack per
    bucket), so each document's span interleaving order survives
    packing intact. A doc whose total cost exceeds ``seq_len`` gets
    its own pack, flagged truncated.

    Per-doc costs are computed with one vectorized Arrow explode
    (``list_parent_indices`` + ``bincount`` — no Python loop over
    spans). Output: one row per packed doc — ``(pack_id = the pack's
    first doc_id, doc_id, start_tok, n_tokens, n_text_tokens,
    n_media, truncated)``, sorted by doc_id."""
    import pyarrow.compute as pc

    def _pb_of(ids) -> np.ndarray:
        # int ids via the mixed bucket hash; string crawl ids via the
        # stable content hash — both partition-invariant
        from ..functions.hashing import bucket_of, hash64_array

        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        if pa.types.is_integer(ids.type):
            return bucket_of(ids.to_numpy(zero_copy_only=False)
                             .astype(np.int64), n_buckets)
        return (hash64_array(ids) % np.uint64(n_buckets)).astype(np.int32)

    def cost(b: pa.Table) -> pa.Table:
        n = b.num_rows
        if n == 0:   # keep doc_id's own dtype even in the empty block
            return pa.table({
                "doc_id": pa.array([], b.schema.field("doc_id").type),
                "doc_tokens": pa.array([], pa.int64()),
                "n_text_tokens": pa.array([], pa.int64()),
                "n_media": pa.array([], pa.int64()),
                "_pb": pa.array([], pa.int32())})
        from ..functions.blocks import explode_list_column

        parent, flat = explode_list_column(b["spans"])
        is_media = pc.is_valid(pc.struct_field(flat, "media_ref")) \
            .to_numpy(zero_copy_only=False)
        # arrow-native token count (== len(re.findall(r"\S+", t)), the
        # engine's whitespace-token convention) — no per-span Python
        # string round-trip on the hot cost path
        ttoks = pc.count_substring_regex(
            pc.struct_field(flat, "text"), r"\S+") \
            .fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
        text_cost = np.where(is_media, 0, ttoks)
        per_span = np.where(is_media, media_tokens, ttoks)
        return pa.table({
            # doc_id passes through UNCAST: pack() sorts by it and
            # mints pack_id in its dtype — a string cast would turn
            # int64 ids lexicographic (doc 10 before doc 2) and break
            # pack_id == doc_id joins back to the source table
            "doc_id": b["doc_id"],
            "doc_tokens": pa.array(np.bincount(
                parent, weights=per_span, minlength=n).astype(np.int64)),
            "n_text_tokens": pa.array(np.bincount(
                parent, weights=text_cost, minlength=n).astype(np.int64)),
            "n_media": pa.array(np.bincount(
                parent, weights=is_media.astype(np.int64),
                minlength=n).astype(np.int64)),
            "_pb": pa.array(_pb_of(b["doc_id"]), pa.int32()),
        })

    def pack(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values("doc_id")
        pack_ids, starts, ntoks, trunc = _greedy_pack(
            b["doc_id"].to_numpy(), b["doc_tokens"].to_numpy(), seq_len)
        return pd.DataFrame({
            # pack_id keeps doc_id's dtype (string crawl ids OR int64
            # table ids) so pack_id == doc_id joins stay type-correct
            "pack_id": pd.Series(pack_ids, dtype=b["doc_id"].dtype),
            "doc_id": b["doc_id"].to_numpy(),
            "start_tok": pd.Series(starts, dtype="int64"),
            "n_tokens": pd.Series(ntoks, dtype="int64"),
            "n_text_tokens": b["n_text_tokens"].to_numpy(),
            "n_media": b["n_media"].to_numpy(),
            "truncated": pd.Series(trunc, dtype="bool"),
        })

    return docs.map_batches(cost, batch_format="pyarrow") \
        .groupby("_pb").map_groups(pack, batch_format="pandas") \
        .sort("doc_id")


# ----------------------------------------------- leakage-safe split
def leakage_safe_split(sf_dir: str, val_pct: int = 10,
                       threshold: float = 0.6):
    """Train/val split where NEAR-DUPLICATES never straddle the
    boundary — the eval-leakage guard (near-dup test-set contamination,
    Lee et al. 2022): the split fingerprint hashes the near-dup GROUP
    id instead of the doc id, so every member of a connected component
    lands on the same side. Composition of existing machinery:
    ``minhash_lsh_pairs`` → ``connected_components`` → ``label_table``
    → the same Knuth-hash assignment as ``train_val_split``. A doc
    with no near-dup is its own singleton group (group_id = doc_id),
    so singletons reproduce ``train_val_split``'s assignment exactly.

    Output: ``(doc_id, group_id, group_size, split)`` sorted by
    doc_id. Inherits the LSH pair source's recall characteristics
    (recall-1.0-pinned on the fixtures; see ``minhash_lsh_pairs``)."""
    from ..functions.components import connected_components, label_table
    from .dedup import minhash_lsh_pairs

    labeled = label_table(
        _read_docs(sf_dir, ["doc_id"]), "doc_id",
        connected_components(minhash_lsh_pairs(sf_dir, threshold),
                             "doc_a", "doc_b"))

    def assign(b: pa.Table) -> pa.Table:
        f = _split_fingerprint(b["group_id"].to_numpy(zero_copy_only=False))
        split = np.where(f < 100 - val_pct, "train", "val")
        return pa.table({
            "doc_id": b["doc_id"],
            "group_id": b["group_id"],
            "group_size": b["group_size"],
            "split": pa.array(split.tolist(), pa.string()),
        })

    return labeled.map_batches(assign, batch_format="pyarrow") \
        .sort("doc_id")


def temperature_mix(sources: dict[str, tuple], temperature: float = 1.0,
                    id_col: str = "doc_id", seed: int = 0):
    """``weighted_interleave`` with TEMPERATURE-scaled source weights —
    the multilingual-LLM sampling knob (Arivazhagan'19 / XLM-R,
    Conneau'20 — public pattern): effective weight ∝ w^(1/T).
    ``T = 1`` reproduces the raw proportions exactly; ``T → ∞``
    approaches uniform over sources (up-samples small ones); ``T < 1``
    sharpens toward the largest. Weights are renormalized after
    scaling, so only the RATIOS matter (as in ``weighted_interleave``).
    Zero/negative-weight sources stay excluded regardless of T (the
    base operator's contract: 0^(1/T) = 0)."""
    import math

    if not temperature > 0:
        raise ValueError(f"temperature must be > 0, got {temperature}")
    # scale in LOG space against the max weight: raw w**(1/T) overflows
    # for big weights at sharpening T (5000**100) and underflows valid
    # small weights to 0.0 — which would silently EXCLUDE a positive-
    # weight source, a state the contract reserves for caller w <= 0.
    # Max-normalizing keeps every scaled weight in (0, 1] (ratios are
    # all that matter); a ratio that still underflows clamps to the
    # smallest positive float — demoted to the stream's tail, never
    # silently dropped.
    pos = [float(w) for _, w in sources.values()
           if float(w) == float(w) and float(w) > 0]
    log_wmax = math.log(max(pos)) if pos else 0.0
    scaled = {}
    for name, (ds, w) in sources.items():
        w = float(w)
        if w > 0:
            w = math.exp((math.log(w) - log_wmax) / temperature) \
                or 5e-324
        scaled[name] = (ds, w)
    return weighted_interleave(scaled, id_col=id_col, seed=seed)


# ------------------------------------------------------ training shards
def write_training_shards(sf_dir: str, merges: list[tuple[str, str]],
                          out_dir: str, *, seq_len: int = 512,
                          vocab: dict[str, int] | None = None,
                          n_buckets: int = 64) -> dict:
    """The END PRODUCT of the training-data pipeline: BPE token-id
    sequences packed into fixed-length rows and written as resumable
    hash shards — what a trainer's data loader actually reads.

        tokenize (``bpe.tokenize_bpe`` actor pool, merges+vocab
        broadcast once) → deterministic pack assignment (the
        ``training_corpus`` packer contract: ``_pack_bucket`` of
        doc_id, ``_greedy_pack`` in doc order within the bucket —
        a pure function of the table) → assemble each pack into ONE
        ``input_ids`` row of exactly ``seq_len`` int32 ids (members
        concatenated at their ``start_tok`` offsets, oversized docs
        truncated, tail padded with ``PAD_ID``) → ``export_shards``
        (one shard per pack bucket: crash-safe manifests, reruns skip
        complete shards).

    Output rows: ``(bucket, pack_id, input_ids fixed_size_list<int32,
    seq_len>, n_real, doc_ids list<int64>, doc_starts list<int32>)`` —
    the boundary columns make every doc's slice recoverable, so tests
    pin a full roundtrip against the tokenizer.

    Scale: text is dropped at the tokenize stage (ids ride the one
    bucket shuffle); per-bucket assembly allocates (packs × seq_len)
    int32 — bounded by the bucket's token mass, and ``n_buckets``
    scales the parallelism/width down."""
    import pandas as pd

    from .bpe import PAD_ID, tokenize_bpe
    from .export import export_shards

    def add_bucket(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return b.append_column(
            "bucket", pa.array(_pack_bucket(ids, n_buckets), pa.int32()))

    def assemble(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values("doc_id")
        dids = g["doc_id"].to_numpy().astype(np.int64)
        counts = g["n_bpe_tokens"].to_numpy().astype(np.int64)
        bucket = int(g["bucket"].iloc[0])
        packs, starts, takes, _ = _greedy_pack(dids, counts, seq_len)
        packs = np.asarray(packs, dtype=np.int64)
        starts = np.asarray(starts, dtype=np.int64)
        takes = np.asarray(takes, dtype=np.int64)
        # pack boundaries: _greedy_pack emits members contiguously
        heads = np.flatnonzero(np.r_[True, packs[1:] != packs[:-1]])
        tails = np.r_[heads[1:], len(packs)]
        mat = np.full((len(heads), seq_len), PAD_ID, dtype=np.int32)
        row_of = np.repeat(np.arange(len(heads)), tails - heads)
        ids_col = g["ids"].to_numpy()
        for i in range(len(dids)):
            if takes[i]:
                mat[row_of[i], starts[i]:starts[i] + takes[i]] = \
                    ids_col[i][:takes[i]]
        n_real = np.add.reduceat(takes, heads).astype(np.int32) \
            if len(heads) else np.empty(0, np.int32)
        member_off = np.empty(len(heads) + 1, dtype=np.int32)
        member_off[0] = 0
        np.cumsum(tails - heads, out=member_off[1:])
        return pa.table({
            "bucket": pa.array(np.full(len(heads), bucket, np.int32),
                               pa.int32()),
            "pack_id": pa.array(packs[heads], pa.int64()),
            "input_ids": pa.FixedSizeListArray.from_arrays(
                pa.array(mat.ravel(), pa.int32()), seq_len),
            "n_real": pa.array(n_real, pa.int32()),
            "doc_ids": pa.ListArray.from_arrays(
                pa.array(member_off, pa.int32()),
                pa.array(dids, pa.int64())),
            "doc_starts": pa.ListArray.from_arrays(
                pa.array(member_off, pa.int32()),
                pa.array(starts.astype(np.int32), pa.int32())),
        })

    assembled = tokenize_bpe(sf_dir, merges, vocab, sort=False) \
        .map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("bucket").map_groups(assemble, batch_format="pandas")
    return export_shards(assembled, out_dir, key="bucket",
                         n_shards=n_buckets, assign="value")
