"""Deduplication pipelines over the ``documents`` table.

First-class training-data operators:

- ``dedup_exact``       — hash-partitioned exact dedup (oracle-able).
- ``minhash_lsh_pairs`` — shingle → minhash → band → bucket-groupby →
  candidate pairs → exact-Jaccard verify. The classic near-dup path:
  the only all-to-all is the groupby on (band, band_hash); signatures
  are computed vectorized per batch.
- ``simhash_pairs``     — 64-bit simhash + banded hamming candidates.
- ``ngram_jaccard``     — the exact word-3-gram Jaccard used as the
  verifier (exposed for candidate pairs).
- ``ngram_jaccard_pairs`` — EXACT char-n-gram Jaccard set-similarity
  join (per-doc distinct gram hashes → per-gram pair emission with set
  sizes riding along → pair-bucket count finish; oracle-checked).
- ``embedding_neardup_pairs`` — EXACT cosine ≥ τ pairs over the
  embeddings table (oracle via DuckDB list_cosine_similarity) as a
  chunked all-pairs scan: plasma-resident normalized chunks, one in a
  worker heap at a time, upper-triangle pruning via chunk id ranges.
- ``embedding_neardup_lsh`` — the approximate hyperplane-LSH variant
  (band buckets → in-bucket exact verify); recall-tested vs exact.

Scale notes: minhash/simhash signatures are fixed-width columns; band
explosion multiplies rows by n_bands (not data size); candidate
verification streams the corpus once through an id semi-filter and
bucket-joins the candidate texts to their pairs — driver state is the
candidate-id array only (see ``minhash_lsh_pairs``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..functions.blocks import list_matrix, matrix_list
from ..functions.hashing import hash64

N_PERM = 256
N_BANDS = 64          # 64 bands × 4 rows: an AT-threshold pair
# (J=0.6 exactly) is caught with prob 1−(1−0.6⁴)⁶⁴ ≈ 1−1.4e-4 — the
# 32-band geometry left a 1.2 % per-pair miss, the same fragility that
# measurably cost the embedding LSH 3/144 pairs at sf0.1 (candidates
# are verified exactly afterwards, so extra bands only ADD recall)
ROWS_PER_BAND = N_PERM // N_BANDS


def _read_docs(sf_dir: str, columns=None):
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


# ------------------------------------------------------------------ exact
def dedup_exact(sf_dir: str, n_buckets: int = 32):
    """Exact dedup: content hash → per-batch partial (min doc_id, count)
    per hash → one vectorized finish per HASH BUCKET (never one Python
    call per distinct hash). The groupby shuffle moves one row per
    (batch, distinct-hash) — text never leaves the first map stage."""

    def partial(b: pa.Table) -> pa.Table:
        h = np.array([hash64(t or "") for t in b["text"].to_pylist()],
                     dtype=np.uint64)
        df = pd.DataFrame({"text_hash": h,
                           "doc_id": b["doc_id"].to_numpy(zero_copy_only=False)})
        g = df.groupby("text_hash", as_index=False).agg(
            doc_id=("doc_id", "min"), n_copies=("doc_id", "size"))
        return pa.table({
            "text_hash": pa.array(g["text_hash"].to_numpy(), pa.uint64()),
            "doc_id": pa.array(g["doc_id"].to_numpy(), pa.int64()),
            "n_copies": pa.array(g["n_copies"].to_numpy(), pa.int64()),
            "bucket": pa.array((g["text_hash"].to_numpy()
                                % np.uint64(n_buckets)).astype(np.int32),
                               pa.int32()),
        })

    def finish_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("text_hash", as_index=False).agg(
            doc_id=("doc_id", "min"), n_copies=("n_copies", "sum"))
        return out[["doc_id", "n_copies"]]

    return (_read_docs(sf_dir, ["doc_id", "text"])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(finish_bucket, batch_format="pandas")
            .sort("doc_id"))


DEDUP_EXACT_SQL = """
SELECT min(doc_id) AS doc_id, count(*)::BIGINT AS n_copies
FROM documents GROUP BY text ORDER BY min(doc_id)
"""


# byte-wise popcount LUT: popcount(u64 array) = _POPCNT8[a.view(u8)]
# reshaped (..., 8) and summed over the last axis. uint8 so the gather
# scratch is 1 byte/element (the sum widens via its dtype= argument) —
# an int64 LUT would 8x the per-chunk scratch of the simhash verify.
_POPCNT8 = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None],
                         axis=1).sum(axis=1).astype(np.uint8)

# ---------------------------------------------------------------- minhash
_POLY = np.uint64(0x100000001B3)      # FNV-1a prime: odd → bijective mod 2^64
_FIN1 = np.uint64(0xFF51AFD7ED558CCD)  # murmur3 fmix64 constants
_FIN2 = np.uint64(0xC4CEB9FE1A85EC53)


def _finalize_u64(h: np.ndarray) -> np.ndarray:
    """murmur3 fmix64: full-avalanche finisher for poly-combined lanes."""
    h = h ^ (h >> np.uint64(33))
    h = h * _FIN1
    h = h ^ (h >> np.uint64(33))
    h = h * _FIN2
    return h ^ (h >> np.uint64(33))


_TOK_CACHE: dict[str, int] = {}   # per-process token-hash memo (tokens
_TOK_CACHE_CAP = 2_000_000        # repeat heavily in any real corpus)


def _token_hash(t: str) -> int:
    h = _TOK_CACHE.get(t)
    if h is None:
        if len(_TOK_CACHE) >= _TOK_CACHE_CAP:
            _TOK_CACHE.clear()
        h = _TOK_CACHE[t] = hash64(t)
    return h


_MD5_TOK_CACHE: dict[str, int] = {}


def _md5_token_hash(t: str) -> int:
    """64-bit token hash the DuckDB oracle can reproduce:
    ``md5_number_lower(t)`` = little-endian uint64 of md5 digest bytes
    8..16 (verified against DuckDB 1.0). Used by the simhash path ONLY
    — minhash/shingle hashing stays on the faster blake2b ``hash64``,
    whose pinned goldens are unaffected."""
    h = _MD5_TOK_CACHE.get(t)
    if h is None:
        from hashlib import md5

        if len(_MD5_TOK_CACHE) >= _TOK_CACHE_CAP:
            _MD5_TOK_CACHE.clear()
        h = _MD5_TOK_CACHE[t] = int.from_bytes(
            md5(t.encode("utf-8")).digest()[8:], "little")
    return h


def shingle_hashes(text: str, n: int = 3) -> np.ndarray:
    """Word n-gram shingle hashes, vectorized: one (memoized) blake2b
    per TOKEN, then an order-sensitive polynomial combine over each
    n-window in numpy (uint64 wraparound) + an avalanche finisher.
    ~3× cheaper than hashing each joined n-gram string."""
    toks = (text or "").split()
    if not toks:
        return np.empty(0, dtype=np.uint64)
    th = np.fromiter((_token_hash(t) for t in toks), dtype=np.uint64,
                     count=len(toks))
    w = min(n, len(th))
    m = len(th) - w + 1
    acc = np.zeros(m, dtype=np.uint64)
    for j in range(w):
        acc = acc * _POLY + th[j:j + m]
    return _finalize_u64(acc)


def shingles(text: str, n: int = 3) -> set[int]:
    """Word n-gram shingle hash SET (the Jaccard universe)."""
    return set(shingle_hashes(text, n).tolist())


class MinHasher:
    """Actor-pool stage: doc → (doc_id, band_id, band_hash)×n_bands.
    Permutation coefficients generated once per actor from a fixed seed
    (identical across actors → identical signatures)."""

    _P31 = (1 << 31) - 1  # Mersenne prime 2^31-1: keeps a*x in int64

    def __init__(self, n_perm: int = N_PERM, n_bands: int = N_BANDS):
        rng = np.random.RandomState(42)
        self.a = rng.randint(1, self._P31, n_perm, dtype=np.int64)[:, None]
        self.b = rng.randint(0, self._P31, n_perm, dtype=np.int64)[:, None]
        self.n_perm = n_perm
        self.n_bands = n_bands
        self.rows = n_perm // n_bands

    def signature(self, sh) -> np.ndarray:
        """``sh``: shingle-hash ndarray (or any iterable of ints —
        min-hash is identical over multiset and set)."""
        if not isinstance(sh, np.ndarray):
            sh = np.fromiter(sh, dtype=np.uint64, count=len(sh))
        if sh.size == 0:
            return np.zeros(self.n_perm, dtype=np.uint64)
        # fold 64-bit shingle hashes to 31 bits; (a*x+b) mod (2^31-1) is
        # exact in int64 and fully vectorized. Running min over SHINGLE
        # CHUNKS bounds the (n_perm × chunk) scratch at ~32 MB even for
        # one pathological multi-million-shingle crawl artifact (an
        # unchunked matrix would be ~2 KB per shingle → GBs per doc).
        xs = (sh % np.uint64(self._P31)).astype(np.int64)
        chunk = max(1, (4 << 20) // self.n_perm)
        out = np.full(self.n_perm, self._P31, dtype=np.int64)
        for s in range(0, xs.size, chunk):
            x = xs[s:s + chunk][None, :]
            np.minimum(out, ((self.a * x + self.b) % self._P31).min(axis=1),
                       out=out)
        return out.astype(np.uint64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        n_docs = len(ids)
        if n_docs == 0:     # np.stack rejects an empty list
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "band_id": pa.array([], pa.int32()),
                             "band_hash": pa.array([], pa.uint64())})
        sh = [shingle_hashes(t) for t in batch["text"].to_pylist()]
        # empty/whitespace-only docs emit NO band rows: their all-zero
        # signatures would all collide in every band and flood the
        # bucket self-join quadratically (empty docs are exact-dedup's
        # job, not minhash's)
        keep = [i for i, s in enumerate(sh) if s.size]
        if not keep:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "band_id": pa.array([], pa.int32()),
                             "band_hash": pa.array([], pa.uint64())})
        ids = ids[keep]
        n_docs = len(ids)
        sigs = np.stack([self.signature(sh[i]) for i in keep])  # (docs, perm)
        # vectorized banding: order-sensitive poly combine of each
        # band's rows across ALL docs at once, then avalanche
        bands = sigs.reshape(n_docs, self.n_bands, self.rows)
        acc = np.zeros((n_docs, self.n_bands), dtype=np.uint64)
        for j in range(self.rows):
            acc = acc * _POLY + bands[:, :, j]
        band_hash = _finalize_u64(acc)                 # (docs, n_bands)
        return pa.table({
            "doc_id": pa.array(np.repeat(ids, self.n_bands), pa.int64()),
            "band_id": pa.array(np.tile(np.arange(self.n_bands, dtype=np.int32),
                                        n_docs), pa.int32()),
            "band_hash": pa.array(band_hash.reshape(-1), pa.uint64()),
        })


def _band_key_bucket(n_buckets: int):
    """(band_id, band_hash) → LSH bucket key + shuffle bucket; shared
    by the self-join candidate path and the incremental gate."""
    def key_bucket(b: pa.Table) -> pa.Table:
        bid = b["band_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        bh = b["band_hash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        key = (bid * np.uint64(0x9E3779B97F4A7C15)) ^ bh
        return pa.table({"doc_id": b["doc_id"],
                         "key": pa.array(key, pa.uint64()),
                         "bucket": pa.array((key % np.uint64(n_buckets))
                                            .astype(np.int32), pa.int32())})
    return key_bucket


def _candidate_pairs_raw(sf_dir: str, n_buckets: int = 32,
                         with_caps: bool = False):
    """Band-bucket self-join candidate pairs over the documents table —
    see ``band_candidates`` for the machinery (and the star cap)."""
    bands = _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        MinHasher, batch_format="pyarrow", batch_size=1024,
        concurrency=(1, 4), num_cpus=1)
    return band_candidates(bands, n_buckets, with_caps=with_caps)


def band_candidates(bands, n_buckets: int = 32, with_caps: bool = False):
    """Band-bucket self-join candidate pairs from a ``(doc_id, band_id,
    band_hash)`` Dataset, possibly duplicated across bands (callers do
    the global pair-distinct — see ``minhash_candidates`` /
    ``minhash_lsh_pairs``). Dataset-shaped so non-table corpora (the
    interleaved ``spans.text_view`` adapter) reuse it.

    ``with_caps=True`` additionally emits ONE telemetry row per bucket
    group tagged ``_telem=1`` (``doc_a`` = number of band keys the
    star cap truncated there, ``doc_b`` = the bucket id — unique per
    group, so ``pair_distinct`` keeps them) and tags every pair row
    ``_telem=0``; the caller splits them off after its materialize and
    records the fold (``minhash_lsh_pairs`` → ``state.telemetry``, the
    "no silent caps" rule). Default off: the extra column would ride
    every downstream schema of callers that don't consume it.

    Implemented as a hash-bucketed SELF-JOIN: band rows get
    ``bucket = band_key % n_buckets``; each bucket-group does ONE
    vectorized pandas self-merge on the band key (all same-bucket band
    hashes are co-located) — no per-LSH-bucket Python calls, which is
    what makes this scale past ~10^5 band rows.

    CAP (flood guard): a band key shared by more than 256 docs (mass
    exact duplicates / boilerplate) is NOT fully pair-enumerated —
    those docs are connected as a star around the key's min doc_id
    (O(n) pairs instead of O(n²)). Union-find connectivity for the
    grouping consumers is preserved; direct pair ENUMERATION between
    two non-representative members of such a key is intentionally
    dropped."""
    key_bucket = _band_key_bucket(n_buckets)

    def self_join(g: pd.DataFrame, max_allpairs: int = 256) -> pd.DataFrame:
        df = g[["doc_id", "key"]].drop_duplicates()
        sizes = df.groupby("key")["doc_id"].transform("size")
        small = df[sizes <= max_allpairs]
        m = small.merge(small, on="key", suffixes=("_a", "_b"))
        m = m[m["doc_id_a"] < m["doc_id_b"]][["doc_id_a", "doc_id_b"]]
        # flood guard (documented on minhash_candidates/minhash_lsh_pairs):
        # a key shared by >max_allpairs docs (mass exact duplicates /
        # boilerplate) would emit O(n²) pairs in one heap; connect those
        # keys as a STAR instead — the key's min doc_id paired with every
        # other member, O(n) pairs. Unlike a sorted chain, one failed
        # exact-Jaccard verification detaches only THAT member, it cannot
        # split the rest of the component in two.
        big = df[sizes > max_allpairs]
        if len(big):
            rep = big.groupby("key")["doc_id"].transform("min")
            star = pd.DataFrame({"doc_id_a": rep, "doc_id_b": big["doc_id"]})
            star = star[star["doc_id_a"] < star["doc_id_b"]]
            m = pd.concat([m, star], ignore_index=True)
        out = m.drop_duplicates() \
            .rename(columns={"doc_id_a": "doc_a", "doc_id_b": "doc_b"})
        if with_caps:
            n_capped = int(big["key"].nunique()) if len(big) else 0
            out = out.assign(_telem=np.int8(0)) if len(out) else \
                pd.DataFrame({"doc_a": pd.Series(dtype=np.int64),
                              "doc_b": pd.Series(dtype=np.int64),
                              "_telem": pd.Series(dtype=np.int8)})
            out = pd.concat([out, pd.DataFrame(
                {"doc_a": [np.int64(n_capped)],
                 "doc_b": [np.int64(g["bucket"].iloc[0])],
                 "_telem": [np.int8(1)]})], ignore_index=True)
        return out

    return bands.map_batches(key_bucket, batch_format="pyarrow") \
        .groupby("bucket").map_groups(self_join, batch_format="pandas")


def minhash_candidates(sf_dir: str, n_buckets: int = 32,
                       with_caps: bool = False):
    """LSH candidate pairs: docs sharing a (band_id, band_hash) bucket.

    Hash-bucketed SELF-JOIN (one vectorized pandas self-merge per band
    bucket — see ``_candidate_pairs_raw``), then a global bucketed pair
    distinct (a pair can fire in bands landing in different buckets).
    Inherits the >256-docs-per-key star cap documented there;
    ``with_caps`` threads its telemetry rows through (see
    ``band_candidates``)."""
    return pair_distinct(_candidate_pairs_raw(sf_dir, n_buckets, with_caps),
                         "doc_a", "doc_b", n_buckets)


def _pair_bucket(a: np.ndarray, c: np.ndarray, n_buckets: int) -> np.ndarray:
    """THE pair-hash bucket id for an (a, b) pair — golden-ratio combine
    then the shared fmix64 ``bucket_of`` (a multiply alone leaves low
    bits a function of a's low bits: strided doc-id spaces would
    collapse pair buckets). Single definition on purpose: pair
    duplicates across bands must co-locate wherever pairs are
    bucket-deduped."""
    from ..functions.hashing import bucket_of

    combined = (a.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) \
        ^ c.astype(np.uint64)
    return bucket_of(combined, n_buckets)


def pair_distinct(pairs, col_a: str, col_b: str, n_buckets: int = 32):
    """Global distinct over (a, b) pair rows: ONE drop_duplicates per
    pair-hash bucket — vectorized, never one Python task per pair, and
    genuinely global (a single-block per-batch drop_duplicates would
    miss duplicates straddling batch boundaries). Shared by the
    minhash, simhash and embedding-LSH candidate pipelines."""

    def bucketize(b: pa.Table) -> pa.Table:
        pb = _pair_bucket(b[col_a].to_numpy(zero_copy_only=False),
                          b[col_b].to_numpy(zero_copy_only=False), n_buckets)
        return b.append_column("pair_bucket", pa.array(pb, pa.int32()))

    def distinct(g: pd.DataFrame) -> pa.Table:
        from ..functions.blocks import df_arrow

        keep = [c for c in g.columns if c != "pair_bucket"]
        # _telem (band_candidates with_caps): telemetry rows must not
        # be merged with a real pair that happens to share their
        # (small-int, bucket-id) coordinates — keep the tag in the key
        dd = [col_a, col_b] + (["_telem"] if "_telem" in g.columns else [])
        return df_arrow(g.drop_duplicates(dd)[keep])

    return pairs.map_batches(bucketize, batch_format="pyarrow") \
        .groupby("pair_bucket").map_groups(distinct, batch_format="pandas")


def ngram_jaccard(a: str, b: str, n: int = 3) -> float:
    sa, sb = shingles(a, n), shingles(b, n)
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter)


def _jaccard_table(b: pd.DataFrame, sset, threshold: float,
                  texts_in_batch: bool) -> pa.Table:
    """Shared verify kernel: exact Jaccard per pair row via ``sset(id,
    text_or_None)`` → shingle set; Arrow out with PINNED int64 ids
    (empty pandas blocks would otherwise float-widen doc ids through
    the final sort union). ``texts_in_batch`` is an explicit contract,
    not a column sniff: the shuffle path MUST carry text_a/text_b (a
    KeyError here means the join schema drifted — fail loud, never
    score against empty sets), the broadcast path must not."""
    js = np.empty(len(b), dtype=np.float64)
    ta = b["text_a"] if texts_in_batch else [None] * len(b)
    tb = b["text_b"] if texts_in_batch else [None] * len(b)
    for row, (a, c, xa, xb) in enumerate(zip(b["doc_a"].to_numpy(),
                                             b["doc_b"].to_numpy(), ta, tb)):
        sa, sb = sset(int(a), xa), sset(int(c), xb)
        inter = len(sa & sb)
        js[row] = 1.0 if not sa and not sb \
            else inter / (len(sa) + len(sb) - inter)
    js = np.round(js, 6)
    keep = js >= threshold
    return pa.table({
        "doc_a": pa.array(b["doc_a"].to_numpy()[keep].astype(np.int64),
                          pa.int64()),
        "doc_b": pa.array(b["doc_b"].to_numpy()[keep].astype(np.int64),
                          pa.int64()),
        "jaccard": pa.array(js[keep], pa.float64()),
    })


class _LazyJaccardVerify:
    """Actor-pool verify for the BROADCAST strategy. Each actor holds
    its own copy of the candidate id→text dict (Python strings
    deserialize fully from plasma — this is NOT zero-copy, which is why
    the strategy is gated on candidate count). Shingle sets are built
    lazily and CAPPED: docs repeat across batches, so an uncapped memo
    would converge to every candidate's shingle set (~10-20× text
    size); past the cap it resets and rebuilds on demand."""

    _MEMO_CAP = 20_000

    def __init__(self, docs_ref, threshold: float, sset_fn=None):
        self.docs: dict[int, str] = ray.get(docs_ref)
        self.memo: dict[int, set] = {}
        self.threshold = threshold
        self.sset_fn = sset_fn or shingles

    def _sset(self, i: int, _t) -> set:
        s = self.memo.get(i)
        if s is None:
            if len(self.memo) >= self._MEMO_CAP:
                self.memo.clear()
            # fail-loud lookup: a candidate id absent from the gathered
            # texts means the corpus changed between the signature scan
            # and the gather — scoring against "" would fabricate
            # jaccard 1.0 for two missing ids (and the shuffle path's
            # inner join would DROP the pair: silent divergence)
            s = self.memo[i] = self.sset_fn(self.docs[i])
        return s

    def __call__(self, batch: pd.DataFrame) -> pa.Table:
        return _jaccard_table(batch, self._sset, self.threshold,
                              texts_in_batch=False)


def _semi_filter_ids(docs, cand_ids: np.ndarray):
    """Vectorized sorted-id semi-filter over any ``(doc_id, …)``
    Dataset: ``np.searchsorted`` probe against the broadcast id array —
    the Dataset streams, the driver holds only the id array."""
    cand_ids = np.unique(cand_ids)   # searchsorted REQUIRES sorted-unique;
    ref = ray.put(cand_ids)          # idempotent for the in-repo caller

    def semi(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        probe = ray.get(ref)                      # zero-copy plasma
        idx = np.searchsorted(probe, ids)
        idx[idx == len(probe)] = 0
        keep = probe[idx] == ids if len(probe) else np.zeros(len(ids), bool)
        return b.filter(pa.array(keep))

    return docs.map_batches(semi, batch_format="pyarrow")


def _candidate_texts(sf_dir: str, cand_ids: np.ndarray):
    """Candidate ``(doc_id, text)`` rows as a streaming Dataset: the
    corpus is decoded ONCE, distributed across workers, through
    ``_semi_filter_ids`` — the driver never decodes the corpus itself,
    so gather cost scales with workers regardless of how the strategy
    choice falls. Shared by both verify strategies."""
    return _semi_filter_ids(_read_docs(sf_dir, ["doc_id", "text"]),
                            cand_ids)


def _verify_pairs_join(pairs, cand_texts, threshold: float, n_buckets: int,
                       sset_fn=None):
    """SHUFFLE strategy (the 100 TB path): the candidate texts ride two
    ``bucket_hash_join``s to their pairs; every shuffle moves only
    candidate-bounded rows, per-task memory is bucket-bounded, and
    nothing text-sized ever touches the driver. ``sset_fn`` overrides
    the shingle-set function (default: word 3-gram ``shingles``)."""
    sset_fn = sset_fn or shingles
    from ..functions.joins import bucket_hash_join

    cand_texts = cand_texts.materialize()         # consumed by two joins

    def side(col: str):
        def rename(b: pa.Table) -> pa.Table:
            return b.rename_columns([col, f"text_{col[-1]}"])
        return cand_texts.map_batches(rename, batch_format="pyarrow")

    j = bucket_hash_join(pairs, side("doc_a"), on="doc_a",
                         n_buckets=n_buckets,
                         columns_left=["doc_a", "doc_b"],
                         columns_right=["doc_a", "text_a"])

    def as_arrow(b: pd.DataFrame) -> pa.Table:
        # join output is pandas blocks; the next bucket_hash_join reads
        # Arrow types off the schema, so convert explicitly
        return pa.table({
            "doc_a": pa.array(b["doc_a"].to_numpy(), pa.int64()),
            "doc_b": pa.array(b["doc_b"].to_numpy(), pa.int64()),
            "text_a": pa.array(b["text_a"], pa.string()),
        })

    j = bucket_hash_join(j.map_batches(as_arrow, batch_format="pandas"),
                         side("doc_b"), on="doc_b",
                         n_buckets=n_buckets,
                         columns_left=["doc_a", "doc_b", "text_a"],
                         columns_right=["doc_b", "text_b"])

    def verify(b: pd.DataFrame) -> pa.Table:
        memo: dict[int, set] = {}      # a doc in k pairs of this batch
        #                                is shingled once, not k times

        def sset(i: int, t) -> set:
            s = memo.get(i)
            if s is None:
                s = memo[i] = sset_fn(t)
            return s

        return _jaccard_table(b, sset, threshold, texts_in_batch=True)

    return j.map_batches(verify, batch_format="pandas", batch_size=4096)


def minhash_lsh_pairs(sf_dir: str, threshold: float = 0.6,
                      n_buckets: int = 32,
                      broadcast_max_candidates: int = 50_000):
    """Near-duplicate pairs: LSH candidates verified by exact Jaccard.

    Verify-strategy selection by candidate-set size — the same
    broadcast-vs-shuffle decision the relational joins make. The
    candidate texts are gathered the same way for both (the corpus
    streams once through the distributed ``_candidate_texts`` filter;
    the driver never decodes it); only text DELIVERY differs:

    - ``≤ broadcast_max_candidates`` candidate docs → BROADCAST: the
      candidate rows are collected to an id→text dict (driver + each
      verify actor hold one candidate-texts-sized copy — that heap
      cost is exactly what the cap bounds), actor-pool verify with a
      lazy capped shingle memo. No per-pairs shuffle — fastest while
      the subset fits a heap.
    - above it → SHUFFLE (``_verify_pairs_join``): texts bucket-joined
      to pairs; nothing text-sized touches the driver or any single
      task — the duplicate-heavy-web-corpus path where candidates grow
      with the corpus.

    The candidate-id ARRAY (8 B/id; at ≥10^9 candidates swap it for a
    bloom from ``state/bloom.py``) is the only driver state the
    SHUFFLE strategy keeps. Both strategies produce identical output
    on consistent input (golden-pinned + in-memory oracle +
    strategy-agreement tests); on a corpus mutated mid-run the
    broadcast path fails loud (KeyError) where the shuffle path's
    inner join drops the pair. Inherits ``_candidate_pairs_raw``'s
    >256-docs-per-key star cap: pairs between two non-representative
    members of a mass-duplicate band key are not enumerated — and the
    number of band keys that cap truncated is recorded per run in
    ``state.telemetry.last("minhash_lsh")["capped_band_keys"]`` (the
    "no silent caps" rule; 0 on healthy corpora)."""
    import pyarrow.compute as pc

    from ..state import telemetry

    tagged = minhash_candidates(sf_dir, n_buckets,
                                with_caps=True).materialize()
    capped = tagged.filter(expr="_telem == 1").map_batches(
        lambda b: pa.table({"n": pa.array(
            [int(pc.sum(b["doc_a"]).as_py() or 0)], pa.int64())}),
        batch_format="pyarrow").take_all()
    telemetry.record("minhash_lsh",
                     capped_band_keys=int(sum(r["n"] for r in capped)))
    pairs = tagged.filter(expr="_telem == 0").map_batches(
        lambda b: b.select(["doc_a", "doc_b"]), batch_format="pyarrow")
    cand_ids = _pair_ids(pairs)
    verified = _verify_strategy(pairs, _candidate_texts(sf_dir, cand_ids),
                                len(cand_ids), threshold, n_buckets,
                                broadcast_max_candidates)
    return verified.sort(["doc_a", "doc_b"])


def _pair_ids(pairs) -> np.ndarray:
    """Distinct doc ids appearing in a (doc_a, doc_b) pair Dataset —
    per-batch unique, driver holds the candidate-bounded id array."""
    def ids_of(b: pa.Table) -> pa.Table:
        u = np.unique(np.concatenate([
            b["doc_a"].to_numpy(zero_copy_only=False),
            b["doc_b"].to_numpy(zero_copy_only=False)]))
        return pa.table({"doc_id": pa.array(u, pa.int64())})

    id_parts = pairs.map_batches(ids_of, batch_format="pyarrow").to_pandas()
    if "doc_id" not in id_parts.columns:   # zero candidate pairs
        return np.empty(0, np.int64)
    return np.unique(id_parts["doc_id"].to_numpy())


def _verify_strategy(pairs, cand_texts, n_candidates: int,
                     threshold: float, n_buckets: int,
                     broadcast_max_candidates: int, sset_fn=None):
    """The broadcast-vs-shuffle verify selection shared by
    ``minhash_lsh_pairs`` and ``neardup_incremental`` (semantics and
    trade-offs documented on ``minhash_lsh_pairs``)."""
    if n_candidates == 0:            # no pairs anywhere: typed empty
        return rd.from_arrow(pa.table({
            "doc_a": pa.array([], pa.int64()),
            "doc_b": pa.array([], pa.int64()),
            "jaccard": pa.array([], pa.float64())}))
    if n_candidates <= broadcast_max_candidates:
        sub = cand_texts.to_pandas()              # candidate-bounded rows
        ref = ray.put(dict(zip(sub["doc_id"].astype(int), sub["text"])))
        return pairs.map_batches(
            _LazyJaccardVerify,
            fn_constructor_kwargs={"docs_ref": ref, "threshold": threshold,
                                   "sset_fn": sset_fn},
            batch_format="pandas", concurrency=(1, 4), num_cpus=1)
    return _verify_pairs_join(pairs, cand_texts, threshold, n_buckets,
                              sset_fn=sset_fn)


# --------------------------------------- exact n-gram Jaccard (set-sim join)
def ngram_jaccard_pairs(sf_dir: str, threshold: float = 0.8, n: int = 5,
                        n_buckets: int = 32):
    """EXACT character-n-gram Jaccard near-dup pairs
    ``(doc_a, doc_b, jaccard)`` — every document pair whose DISTINCT
    char-n-gram sets have Jaccard ≥ ``threshold``. The exact
    set-similarity join of the dedup family, complementing
    ``minhash_lsh_pairs`` (word-shingle LSH: approximate candidates +
    exact verify); oracle = ``NGRAM_JACCARD_SQL``.

    Exact set-similarity joins flood on hot grams (a gram in k docs ⇒
    O(k²) pairs — natural text makes k ≈ corpus size for stop-grams),
    so this uses PREFIX FILTERING (Chaudhuri et al. ICDE'06; Bayardo et
    al. WWW'07 "Scaling Up All Pairs Similarity Search"; Xiao et al.
    PPJoin): under a global gram order by (document frequency, hash),
    two sets with Jaccard ≥ t MUST share a gram inside both sets'
    first ``|x| − ceil(t·|x|) + 1`` grams — so pairs are enumerated
    from the rarity-ordered PREFIXES only (hot grams sit at the end of
    the order and enter almost no prefixes), then verified exactly.

    Distributed shape — no driver state beyond the candidate id array:

    1. ``map_batches``: per doc, distinct n-gram 64-bit rolling hashes
       (the ``substrings._window_hashes`` kernel — one O(chars) numpy
       pass per batch, code-point positions so hashing matches SQL
       ``substr`` character semantics) plus the doc's set size;
    2. gram-bucket groupby: a bucket holds EVERY occurrence of its
       grams ⇒ document frequency is decidable locally (zero extra
       shuffle for the df pass);
    3. doc-bucket groupby: per doc, rank grams by (df, hash), keep the
       prefix;
    4. gram-bucket groupby over prefix rows: per-gram pairs + the size
       filter (``min ≥ t·max``, else J < t) + PPJoin's POSITIONAL
       filter (a pair sharing a prefix gram at ranks ``(i, j)`` in the
       global order can overlap at most ``min(|x|−i, |y|−j)``; the
       bound is tight at the pair's FIRST shared gram, so keeping a
       pair iff ANY of its emissions passes is exact), bucket-deduped,
       then globally ``pair_distinct``-ed;
    5. exact verify via the shared broadcast-vs-shuffle
       ``_verify_strategy`` with a char-n-gram set function — the same
       machinery the minhash path uses, so candidates bound every cost.

    Mass-duplicate clusters still produce quadratic OUTPUT (k identical
    docs genuinely have k²/2 qualifying pairs) — inherent to the exact
    operator; the approximate scale path is ``minhash_lsh_pairs``.
    64-bit hashes stand in for gram equality (collision odds documented
    in ``substrings``).

    Default ``threshold=0.8`` (the standard near-dup dedup operating
    point): prefix length is ``(1−t)·|x|+1``, so candidate volume — the
    whole cost of an exact set-sim join — scales with ``(1−t)²``; at
    0.5 half of every doc enters the prefix and shared-vocabulary text
    floods (measured 63M candidates at sf0.1 vs ~10³ true pairs).
    Filters use ``t − 5e-7`` (the round-to-6-decimals slack of the
    finish, mirroring the SQL's round-then-threshold) so no boundary
    pair is prefiltered away."""
    import functools

    from ..functions.hashing import bucket_of
    from .substrings import _window_hashes

    t_eff = threshold - 5e-7        # round(J, 6) >= t  ⟺  J >= t − 5e-7

    def grams(b: pa.Table) -> pa.Table:
        texts = [t or "" for t in b["text"].to_pylist()]   # null → no grams
        h, row_idx, _pos = _window_hashes(texts, n)
        if not len(h):
            return pa.table({"gram_hash": pa.array([], pa.uint64()),
                             "doc_id": pa.array([], pa.int64()),
                             "set_size": pa.array([], pa.int64()),
                             "gbucket": pa.array([], pa.int32())})
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((h, row_idx))
        row_s, h_s = row_idx[order], h[order]
        first = np.r_[True, (row_s[1:] != row_s[:-1]) | (h_s[1:] != h_s[:-1])]
        row_u, h_u = row_s[first], h_s[first]
        sizes = np.bincount(row_u, minlength=len(texts)).astype(np.int64)
        return pa.table({
            "gram_hash": pa.array(h_u, pa.uint64()),
            "doc_id": pa.array(ids[row_u], pa.int64()),
            "set_size": pa.array(sizes[row_u], pa.int64()),
            "gbucket": pa.array(bucket_of(h_u, n_buckets), pa.int32())})

    from ..functions.blocks import df_arrow

    def annotate_df(g: pd.DataFrame) -> pa.Table:
        out = g[["gram_hash", "doc_id", "set_size"]].copy()
        out["df"] = g.groupby("gram_hash")["doc_id"].transform("size") \
            .to_numpy().astype(np.int64)
        out["dbucket"] = bucket_of(out["doc_id"].to_numpy(),
                                   n_buckets).astype(np.int32)
        return df_arrow(out)

    def prefix_select(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["doc_id", "df", "gram_hash"], kind="mergesort")
        rank = g.groupby("doc_id", sort=False).cumcount().to_numpy()
        s = g["set_size"].to_numpy()
        p = s - np.ceil(t_eff * s).astype(np.int64) + 1
        out = g.loc[rank < p, ["gram_hash", "doc_id", "set_size"]]
        out = out.assign(
            pos=rank[rank < p].astype(np.int64),
            gbucket=bucket_of(out["gram_hash"].to_numpy().astype(np.uint64),
                              n_buckets))
        return df_arrow(out)

    def candidates(g: pd.DataFrame) -> pa.Table:
        df = g[["gram_hash", "doc_id", "set_size", "pos"]]
        m = df.merge(df, on="gram_hash", suffixes=("_l", "_r"))
        m = m[m["doc_id_l"].to_numpy() < m["doc_id_r"].to_numpy()]
        sl = m["set_size_l"].to_numpy(np.float64)
        sr = m["set_size_r"].to_numpy(np.float64)
        # size filter: min < t·max ⇒ J ≤ min/max < t, never a result
        keep = np.minimum(sl, sr) >= t_eff * np.maximum(sl, sr)
        # positional filter (PPJoin): overlap needed for J ≥ t is
        # c ≥ t(|x|+|y|)/(1+t); sharing THIS gram at 0-based global
        # ranks (i, j) bounds overlap by min(|x|−i, |y|−j) at the
        # pair's first shared gram (no shared gram precedes it) —
        # and any LATER shared gram has larger ranks, hence a smaller
        # bound, so per-emission filtering + OR across emissions
        # (the drop_duplicates below + bucket pair_distinct) is exact
        need = t_eff * (sl + sr) / (1.0 + t_eff)
        remain = np.minimum(sl - m["pos_l"].to_numpy(np.float64),
                            sr - m["pos_r"].to_numpy(np.float64))
        m = m[keep & (remain >= need)]
        out = m[["doc_id_l", "doc_id_r"]].drop_duplicates()
        return df_arrow(pd.DataFrame({
            "doc_a": out["doc_id_l"].to_numpy(np.int64),
            "doc_b": out["doc_id_r"].to_numpy(np.int64)}))

    pairs = (_read_docs(sf_dir, ["doc_id", "text"])
             .map_batches(grams, batch_format="pyarrow")
             .groupby("gbucket").map_groups(annotate_df,
                                            batch_format="pandas")
             .groupby("dbucket").map_groups(prefix_select,
                                            batch_format="pandas")
             .groupby("gbucket").map_groups(candidates,
                                            batch_format="pandas"))
    pairs = pair_distinct(pairs, "doc_a", "doc_b", n_buckets).materialize()
    cand_ids = _pair_ids(pairs)
    verified = _verify_strategy(
        pairs, _candidate_texts(sf_dir, cand_ids), len(cand_ids),
        threshold, n_buckets, broadcast_max_candidates=50_000,
        sset_fn=functools.partial(_char_gram_set, n=n))
    return verified.sort(["doc_a", "doc_b"])


def _char_gram_set(text: str, n: int = 5) -> set:
    """Distinct char-n-gram hash set of one text — the verify-side twin
    of the batched ``grams`` stage (same ``_window_hashes`` kernel, so
    verify and candidate generation agree bit-for-bit)."""
    from .substrings import _window_hashes

    h, _, _ = _window_hashes([text or ""], n)
    return set(h.tolist())


# Validated against the engine at sf0.001/sf0.01 (driver mirror). Char
# n-grams via substr (1-based, character semantics — the engine hashes
# UTF-32 code points so positions agree on non-ASCII too); the WHERE
# applies to the ROUNDED jaccard, mirroring the engine's finish.
NGRAM_JACCARD_SQL_TMPL = """
WITH pos AS (
  SELECT doc_id,
         unnest(generate_series(1, greatest(length(text) - {n} + 1, 0))) AS i,
         text
  FROM documents
), g AS (
  SELECT DISTINCT doc_id, substr(text, i, {n}) AS gram FROM pos
), sz AS (
  SELECT doc_id, count(*) AS n_grams FROM g GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::DOUBLE AS c
  FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(c / (sa.n_grams + sb.n_grams - c), 6) AS jaccard
FROM inter
JOIN sz sa ON sa.doc_id = inter.doc_a
JOIN sz sb ON sb.doc_id = inter.doc_b
WHERE round(c / (sa.n_grams + sb.n_grams - c), 6) >= {thr}
ORDER BY doc_a, doc_b
"""

NGRAM_JACCARD_SQL = NGRAM_JACCARD_SQL_TMPL.format(n=5, thr=0.8)


# ---------------------------------------------------------------- simhash
class SimHasher:
    """64-bit simhash over word features (frequency-weighted),
    vectorized across the WHOLE batch: all docs' token hashes go into
    one bit matrix, per-doc bit sums come out of a single
    ``np.add.reduceat`` over the doc boundaries (no per-doc numpy
    calls). Chunked by token count so the bit matrix stays ~32 MB.
    Token hash = ``_md5_token_hash`` so the DuckDB oracle
    (``SIMHASH_PAIRS_SQL``) re-derives the same signatures; every bit
    decision is an exact integer sum — no float parity surface."""

    _SHIFTS = np.arange(64, dtype=np.uint64)

    def _sigs(self, tok_lists: list[list[str]]) -> np.ndarray:
        lens = np.fromiter((len(t) for t in tok_lists), dtype=np.int64,
                           count=len(tok_lists))
        hs = np.fromiter((_md5_token_hash(t) for toks in tok_lists
                          for t in toks), dtype=np.uint64,
                         count=int(lens.sum()))
        bits = ((hs[:, None] >> self._SHIFTS[None, :])
                & np.uint64(1)).astype(np.int64)
        bounds = np.concatenate([[0], np.cumsum(lens)[:-1]])
        s = np.add.reduceat(bits, bounds, axis=0)          # (docs, 64)
        v = 2 * s - lens[:, None]
        return ((v > 0).astype(np.uint64)
                << self._SHIFTS[None, :]).sum(axis=1)

    def _sig_one(self, toks: list[str], chunk: int) -> np.uint64:
        """Running bit-sum over token chunks for ONE oversized doc —
        the batch kernel takes at least one doc per chunk, so a single
        multi-million-token doc would otherwise build the whole
        (tokens × 64) bit matrix in one piece."""
        s = np.zeros(64, dtype=np.int64)
        for i in range(0, len(toks), chunk):
            part = toks[i:i + chunk]
            hs = np.fromiter((_md5_token_hash(t) for t in part),
                             dtype=np.uint64, count=len(part))
            s += (((hs[:, None] >> self._SHIFTS[None, :]) & np.uint64(1))
                  .astype(np.int64).sum(axis=0))
        v = 2 * s - len(toks)
        return ((v > 0).astype(np.uint64) << self._SHIFTS).sum()

    def __call__(self, batch: pa.Table, chunk_tokens: int = 65536) -> pa.Table:
        toks = [(t or "").split() for t in batch["text"].to_pylist()]
        out = np.zeros(batch.num_rows, dtype=np.uint64)
        nz = [i for i, t in enumerate(toks) if t]  # reduceat needs len>0
        pos = 0
        while pos < len(nz):
            if len(toks[nz[pos]]) > chunk_tokens:  # doc alone busts the
                out[nz[pos]] = self._sig_one(      # budget: chunk inside it
                    toks[nz[pos]], chunk_tokens)
                pos += 1
                continue
            end, budget = pos, chunk_tokens
            while end < len(nz) and budget > 0:
                budget -= len(toks[nz[end]])
                end += 1
            idx = nz[pos:end]
            out[idx] = self._sigs([toks[i] for i in idx])
            pos = end
        return pa.table({"doc_id": batch["doc_id"],
                         "simhash": pa.array(out, pa.uint64())})


def _simhash_sigs(sf_dir: str):
    """Unsorted signature stream (the pair pipeline doesn't need the
    corpus-wide sort the query output does)."""
    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        SimHasher, batch_format="pyarrow", batch_size=1024,
        concurrency=(1, 4), num_cpus=1)


def simhash_signatures(sf_dir: str):
    return _simhash_sigs(sf_dir).sort("doc_id")


def _simhash_verify_frame(g: pd.DataFrame, max_hamming: int) -> pd.DataFrame:
    """Exact-hamming verify over one HASH BUCKET of (band, key) rows:
    pairwise compare only inside same-(band, key) runs. Fully
    vectorized — runs found by one lexsort, hamming distances by XOR +
    byte-LUT popcount over row chunks of the strict upper triangle (no
    per-row Python; scratch bounded ≈16 MB even on flooded keys)."""
    g = g.drop_duplicates(["band", "key", "doc_id"])
    comb = ((g["band"].to_numpy().astype(np.int64) << 16)
            | g["key"].to_numpy().astype(np.int64))
    order = np.lexsort((g["doc_id"].to_numpy(), comb))
    ids = g["doc_id"].to_numpy()[order]
    sh = g["simhash"].to_numpy().astype(np.uint64)[order]
    comb = comb[order]
    starts = np.flatnonzero(np.r_[True, comb[1:] != comb[:-1]])
    ends = np.r_[starts[1:], len(comb)]
    out_a, out_b, out_d = [], [], []
    for s, e in zip(starts, ends):
        n = int(e - s)
        if n < 2:
            continue
        rid, rsh = ids[s:e], sh[s:e]
        # ids ascending inside the run → row < col means doc_a < doc_b
        chunk = max(1, (1 << 21) // n)   # ≈ 16 MB of uint64 scratch
        for cs in range(0, n - 1, chunk):
            ce = min(cs + chunk, n - 1)
            x = rsh[cs:ce, None] ^ rsh[None, :]
            d = _POPCNT8[x.view(np.uint8)].reshape(ce - cs, n, 8) \
                .sum(axis=2, dtype=np.int64)
            ri, cj = np.nonzero(d <= max_hamming)
            keep = cj > ri + cs          # strict upper triangle
            out_a.append(rid[ri[keep] + cs])
            out_b.append(rid[cj[keep]])
            out_d.append(d[ri[keep], cj[keep]])
    cat = (lambda xs: np.concatenate(xs) if xs
           else np.empty(0, np.int64))
    return pd.DataFrame({"doc_a": pd.Series(cat(out_a), dtype="int64"),
                         "doc_b": pd.Series(cat(out_b), dtype="int64"),
                         "hamming": pd.Series(cat(out_d), dtype="int64")})


def simhash_pairs(sf_dir: str, max_hamming: int = 3):
    """Hamming-≤k candidate pairs via 4-way band buckets (any pair with
    ≤3 differing bits shares at least one of 4 16-bit bands) + exact
    hamming verify inside the bucket."""
    if not 0 <= max_hamming <= 3:
        raise ValueError(
            f"max_hamming={max_hamming}: the fixed 4×16-bit banding is "
            f"pigeonhole-complete only for hamming ≤ 3; a larger radius "
            f"needs ≥ max_hamming+1 bands or pairs are silently lost")
    sigs = _simhash_sigs(sf_dir)

    def explode(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        sh = b["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        n = len(ids)
        keys = np.concatenate([(sh >> np.uint64(band * 16)) & np.uint64(0xFFFF)
                               for band in range(4)])
        return pa.table({
            "doc_id": pa.array(np.tile(ids, 4), pa.int64()),
            "band": pa.array(np.repeat(np.arange(4, dtype=np.int32), n),
                             pa.int32()),
            "key": pa.array(keys, pa.uint64()),
            "simhash": pa.array(np.tile(sh, 4), pa.uint64())})

    def verify_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return _simhash_verify_frame(g, max_hamming)

    def bucketize(b: pa.Table) -> pa.Table:
        bucket = _band_bucket(b["key"].to_numpy(zero_copy_only=False),
                              b["band"].to_numpy(zero_copy_only=False))
        return b.append_column("bucket", pa.array(bucket, pa.int32()))

    # map_groups parallelism == input block count; at corpus scale the
    # signature stream arrives in many blocks so the 64 hash buckets
    # verify concurrently — no repartition barrier needed (and the
    # LUT-vectorized verify keeps even a few-block test run sub-second)
    pairs = sigs.map_batches(explode, batch_format="pyarrow") \
        .map_batches(bucketize, batch_format="pyarrow") \
        .groupby("bucket").map_groups(verify_bucket, batch_format="pandas")

    # same pair can fire in several bands → GLOBAL bucketed distinct
    # (a per-batch drop_duplicates would miss duplicates straddling
    # batch boundaries)
    return pair_distinct(pairs, "doc_a", "doc_b").sort(["doc_a", "doc_b"])


# Shared signature CTE: md5_number_lower token hashes (≡
# ``_md5_token_hash``; tokens = the house '\S+' convention ≡ Python
# str.split on this corpus), bit b set iff the exact integer sum of
# ±count over distinct tokens is > 0 — no float anywhere. Tokenless
# docs keep signature 0 (the engine's zeros-initialized output).
_SIMHASH_SIG_CTE = """tw AS (
  SELECT doc_id, md5_number_lower(tok) AS h, COUNT(*)::BIGINT AS w
  FROM (SELECT doc_id,
               unnest(regexp_extract_all(coalesce(text, ''), '\\S+')) AS tok
        FROM documents)
  GROUP BY doc_id, h),
bits AS (
  SELECT doc_id, r.b,
         SUM(CASE WHEN (h >> r.b) & 1 = 1 THEN w ELSE -w END) AS v
  FROM tw, range(64) r(b) GROUP BY doc_id, r.b),
sig0 AS (
  SELECT doc_id,
         SUM(CASE WHEN v > 0 THEN (1::UBIGINT << b)
                  ELSE 0::UBIGINT END)::UBIGINT AS simhash
  FROM bits GROUP BY doc_id),
sig AS (
  SELECT d.doc_id, coalesce(s.simhash, 0::UBIGINT) AS simhash
  FROM documents d LEFT JOIN sig0 s USING (doc_id))"""

# signature-level oracle (pins ``simhash_signatures`` bit-for-bit)
SIMHASH_SIGS_SQL = f"""
WITH {_SIMHASH_SIG_CTE}
SELECT doc_id, simhash FROM sig ORDER BY doc_id
"""

# FULL equality oracle for ``simhash_pairs``. The band stage needs NO
# SQL counterpart: 4 disjoint 16-bit bands can't all be hit by ≤3
# differing bits (pigeonhole), so banding+verify ≡ the plain hamming≤3
# predicate — the SQL states the SPEC, the engine's banding is pure
# optimization.
SIMHASH_PAIRS_SQL = f"""
WITH {_SIMHASH_SIG_CTE}
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
ORDER BY doc_a, doc_b
"""


# ----------------------------------------------------- embedding near-dup
def _safe_norm(m: np.ndarray) -> np.ndarray:
    """Row L2 norms with zeros mapped to 1 — an all-zero embedding stays
    the zero vector (cosine 0 with everything, correctly below any
    positive threshold) instead of becoming a NaN row that silently
    pairs with nothing for the wrong reason. Same guard as
    ``corpus.py``'s zero-vector gate."""
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return n


def _band_bucket(key: np.ndarray, band: np.ndarray,
                 n_buckets: int = 64) -> np.ndarray:
    """(band, key) → verify-bucket id: golden-ratio multiply avalanches
    the key before the band folds in. Shared by the simhash and
    embedding-LSH verify partitioners — bucket assignment is pure
    partitioning, results never depend on it."""
    return (((key.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
             ^ band.astype(np.uint64))
            % np.uint64(n_buckets)).astype(np.int32)


def _emb_chunk_specs(path: str, chunk_rows: int):
    """Chunk specs ``(file, row_group, offset, length)`` straight from
    parquet metadata — no vector data flows through the driver."""
    import pyarrow.dataset as pads

    specs = []
    for frag in pads.dataset(path).get_fragments():
        for rg in frag.row_groups:
            for off in range(0, rg.num_rows, chunk_rows):
                specs.append((frag.path, rg.id, off,
                              min(chunk_rows, rg.num_rows - off)))
    return specs


@ray.remote(num_returns=2, num_cpus=0.5)
def _load_emb_chunk(file: str, rg: int, off: int, length: int):
    """→ ((min_id, max_id), (ids, normalized matrix)); the matrix lives
    in plasma owned by the driver, fetched zero-copy by scan tasks."""
    import pyarrow.parquet as pq

    t = pq.ParquetFile(file).read_row_group(
        rg, columns=["vec_id", "embedding"]).slice(off, length)
    ids = t["vec_id"].to_numpy().astype(np.int64)
    m = list_matrix(t["embedding"])
    m /= _safe_norm(m)
    return (int(ids.min()), int(ids.max())), (ids, m)


def embedding_neardup_pairs(sf_dir: str, threshold: float = 0.45,
                            chunk_rows: int = 8192,
                            max_rows: int | None = 200_000):
    """EXACT pairs of embeddings with cosine ≥ τ, as a chunked all-pairs
    scan: the corpus is loaded once into plasma as normalized chunks
    (one task per parquet row-group slice), and every batch of the scan
    side streams the chunks sequentially — worker heap holds ONE chunk
    at a time, never the whole matrix, and chunks wholly below the
    batch's min id are skipped (upper-triangle pruning via chunk id
    ranges).

    QUADRATIC CONTRACT: similarity work is O(N²/2) BY CONSTRUCTION —
    this operator is the ORACLE COMPANION (the exact answer LSH recall
    is measured against) and the right tool only for corpora whose N²
    is affordable. It refuses inputs above ``max_rows`` (parquet-footer
    count, no scan) and points to `embedding_neardup_lsh`, the 100 TB
    path; pass ``max_rows=None`` to consciously accept the quadratic
    cost (e.g. oracle runs on a sampled slice). The default 200k rows
    ≈ 2·10¹⁰ dot-row ops — minutes on one node, the knee past which
    LSH always wins. (At τ=0.45 LSH needs ~48+ band tables for
    recall≈1, so BELOW the knee the exact scan is also the faster
    choice — see the LSH docstring.)"""
    path = f"{sf_dir}/embeddings.parquet"
    if max_rows is not None:
        import pyarrow.parquet as pq

        n = pq.ParquetFile(path).metadata.num_rows
        if n > max_rows:
            raise ValueError(
                f"embedding_neardup_pairs is O(N²) by construction and "
                f"refuses N={n} > max_rows={max_rows}. Use "
                f"embedding_neardup_lsh (the scale path), or pass "
                f"max_rows=None to accept the quadratic cost.")
    meta_refs, data_refs = [], []
    for spec in _emb_chunk_specs(path, chunk_rows):
        meta, data = _load_emb_chunk.remote(*spec)
        meta_refs.append(meta)
        data_refs.append(data)
    ranges = ray.get(meta_refs)   # tiny: (min, max) per chunk

    class Scan:
        def __init__(self, chunks, ranges, threshold):
            self.chunks = chunks
            self.ranges = ranges
            self.threshold = threshold

        def __call__(self, b: pa.Table) -> pa.Table:
            q_ids = b["vec_id"].to_numpy().astype(np.int64)
            if len(q_ids) == 0:
                return pa.table({"vec_a": pa.array([], pa.int64()),
                                 "vec_b": pa.array([], pa.int64())})
            q = list_matrix(b["embedding"])
            q /= _safe_norm(q)
            qmin = int(q_ids.min())
            out_a, out_b = [], []
            for (lo, hi), ref in zip(self.ranges, self.chunks):
                if hi <= qmin:        # no id in chunk can be a 'b' side
                    continue
                ids, m = ray.get(ref)  # zero-copy plasma, one chunk in heap
                cos = q @ m.T
                qi, ci = np.nonzero(cos >= self.threshold)
                keep = q_ids[qi] < ids[ci]     # upper triangle only
                out_a.append(q_ids[qi][keep])
                out_b.append(ids[ci][keep])
            a = np.concatenate(out_a) if out_a else np.empty(0, np.int64)
            c = np.concatenate(out_b) if out_b else np.empty(0, np.int64)
            return pa.table({"vec_a": pa.array(a, pa.int64()),
                             "vec_b": pa.array(c, pa.int64())})

    from ..functions.blocks import as_arrow

    return as_arrow(rd.read_parquet(path, columns=["vec_id", "embedding"])) \
        .map_batches(Scan, batch_format="pyarrow", batch_size=1024,
                     fn_constructor_kwargs={"chunks": data_refs,
                                            "ranges": ranges,
                                            "threshold": threshold},
                     concurrency=(1, 8), num_cpus=1) \
        .sort(["vec_a", "vec_b"])


def embedding_neardup_lsh(sf_dir: str, threshold: float = 0.45,
                          n_tables: int = 64, n_bits: int = 4):
    """APPROXIMATE embedding near-dup: random-hyperplane band buckets →
    in-bucket exact cosine verify → pair distinct. Band rows multiply
    the corpus by n_tables, the only all-to-all is the (table, key)
    groupby, and verification is a vectorized matmul per bucket. At
    τ=0.45 (θ≈63°) a 4-bit table catches an AT-THRESHOLD pair with
    p = (1−θ/π)⁴ ≈ 0.177, so 64 tables put the hardest pair's miss
    probability at (1−p)⁶⁴ ≈ 4·10⁻⁶ — 24 tables left it at ~1 % and
    measurably dropped 3 of 144 true pairs at sf0.1. This is MORE pair
    work than the exact chunked scan at this low threshold — the LSH
    path wins at higher thresholds / when candidate pruning matters;
    recall vs the exact scan is measured in tests.

    ORACLE CONTRACT: `__ray_entry__.oracle_sql` registers the exact
    all-pairs `EMBEDDING_NEARDUP_SQL` as this operator's equality
    oracle — valid because recall is MEASURED exactly 1.0 on the
    deterministic sf0.001/sf0.01/sf0.1 fixtures with THESE band
    parameters, and the at-threshold miss bound above leaves ~10⁻³
    expected misses per thousand true pairs of regenerated data.
    Changing n_tables/n_bits (or the plane seed) can drop recall below
    1.0 and fail the driver's parity gate; re-measure at all gate SFs
    before touching them."""
    planes = None  # lazily sized from the first batch's dim (fixed seed
    #                → every worker derives the identical planes)
    weights = (np.uint64(1) << np.arange(n_bits, dtype=np.uint64))

    def explode(b: pa.Table) -> pa.Table:
        nonlocal planes
        ids = b["vec_id"].to_numpy().astype(np.int64)
        if len(ids) == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "tbl": pa.array([], pa.int32()),
                             "key": pa.array([], pa.int64()),
                             "vec": pa.array([], pa.list_(pa.float64()))})
        m = list_matrix(b["embedding"])
        m /= _safe_norm(m)
        if planes is None:
            planes = np.random.RandomState(7).standard_normal(
                (n_tables, n_bits, m.shape[1]))
        out_id, out_t, out_k, out_v = [], [], [], []
        for t in range(n_tables):
            key = (((m @ planes[t].T) > 0).astype(np.uint64) @ weights)
            out_id.append(ids)
            out_t.append(np.full(len(ids), t, dtype=np.int32))
            out_k.append(key.astype(np.int64))
            out_v.append(m)
        return pa.table({
            "vec_id": pa.array(np.concatenate(out_id), pa.int64()),
            "tbl": pa.array(np.concatenate(out_t), pa.int32()),
            "key": pa.array(np.concatenate(out_k), pa.int64()),
            "vec": matrix_list(np.concatenate(out_v, axis=0)),
        })

    def verify_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for _, sub in g.groupby(["tbl", "key"], sort=False):
            sub = sub.drop_duplicates("vec_id").sort_values("vec_id")
            if len(sub) < 2:
                continue
            ids = sub["vec_id"].to_numpy()
            m = np.vstack(sub["vec"].to_numpy())
            cos = m @ m.T
            qi, ci = np.nonzero(cos >= threshold)
            keep = ids[qi] < ids[ci]
            out_a.append(ids[qi][keep])
            out_b.append(ids[ci][keep])
        a = np.concatenate(out_a) if out_a else np.empty(0, np.int64)
        c = np.concatenate(out_b) if out_b else np.empty(0, np.int64)
        return pd.DataFrame({"vec_a": pd.Series(a, dtype="int64"),
                             "vec_b": pd.Series(c, dtype="int64")})

    def bucketize(b: pa.Table) -> pa.Table:
        bucket = _band_bucket(b["key"].to_numpy(zero_copy_only=False),
                              b["tbl"].to_numpy(zero_copy_only=False))
        return b.append_column("bucket", pa.array(bucket, pa.int32()))

    pairs = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding"]) \
        .map_batches(explode, batch_format="pyarrow", batch_size=2048) \
        .map_batches(bucketize, batch_format="pyarrow") \
        .groupby("bucket").map_groups(verify_bucket, batch_format="pandas")

    return pair_distinct(pairs, "vec_a", "vec_b").sort(["vec_a", "vec_b"])


EMBEDDING_NEARDUP_SQL = """
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.45
ORDER BY vec_a, vec_b
"""

# Oracle for minhash_lsh_pairs: the EXACT all-pairs word-3-gram Jaccard
# at the same threshold. Valid as an equality oracle because the LSH
# band parameters are sized for recall 1.0 at τ=0.6 and the engine
# verifies candidates with exact Jaccard — so engine output ≡ the exact
# threshold set whenever no true pair is missed, which is pinned (and
# deterministic: fixed data, fixed hashes) on the test fixtures at
# sf0.001 AND sf0.01. The SQL shingles word trigrams as STRINGS where
# the engine shingles token-hash windows; intersections agree absent
# blake2b/poly collisions (measured jaccard delta 0.0 on both SFs).
# Window shrinks to len(words) for docs shorter than 3 tokens,
# mirroring shingle_hashes' w = min(n, len); empty docs produce no
# bands in the engine and are excluded here (len(ws) > 0).
#
# VALIDITY BOUND: parity is measured (engine == this SQL, jaccard
# delta 0.0) at sf0.001, sf0.01 AND sf0.1. On OTHER corpora two
# divergence modes exist: (a) the engine's >256-docs-per-band-key
# star cap drops pairs between non-representative members of a
# mass-duplicate key that this all-pairs SQL enumerates; (b) band
# recall < 1 for a near-threshold pair missing every band. Both are
# deterministic per corpus — re-measure before trusting this oracle
# on new fixtures or changed band parameters.
MINHASH_LSH_SQL = """
WITH d AS (
  SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS ws
  FROM documents
), p AS (
  SELECT doc_id, ws, least(3, len(ws)) AS w FROM d WHERE len(ws) > 0
), sh AS (
  SELECT doc_id,
         list_distinct([array_to_string(ws[i : i + w - 1], ' ')
                        FOR i IN range(1, len(ws) - w + 2)]) AS ss
  FROM p
)
SELECT doc_a, doc_b, jaccard FROM (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         round(len(list_intersect(a.ss, b.ss))::DOUBLE
               / (len(a.ss) + len(b.ss) - len(list_intersect(a.ss, b.ss))), 6) AS jaccard
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
WHERE jaccard >= 0.6 ORDER BY doc_a, doc_b
"""


def _unionfind_pairs(pairs: pd.DataFrame, col_a: str, col_b: str):
    """Union-find over a (small, pair-bounded) verified-pair frame.
    Returns ``(group_of, sizes)``: ``group_of`` maps only ids appearing
    in SOME pair (everything else is its own group); representative =
    min id of the component."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    if col_a not in pairs.columns:   # zero-row Dataset.to_pandas()
        return {}, {}                # drops columns (see export.py)
    for a, b in zip(pairs[col_a], pairs[col_b]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    group_of = {x: find(x) for x in list(parent)}
    sizes: dict[int, int] = {}
    for g in group_of.values():
        sizes[g] = sizes.get(g, 0) + 1
    return group_of, sizes


def _neardup_unionfind(sf_dir: str, threshold: float):
    """Union-find over minhash-verified near-dup pairs. Pairs are
    collected on the driver (ray_guide: valid because the verified-pair
    set is provably small — bounded by LSH bucket collisions, not
    corpus size)."""
    return _unionfind_pairs(minhash_lsh_pairs(sf_dir, threshold).to_pandas(),
                            "doc_a", "doc_b")


def _label_components(ds, id_col: str, uf_ref):
    """Broadcast component labeling: map only MEMBER rows through the
    (pair-bounded) group dict — int-exact (a whole-column ``map`` would
    produce float64 with NaN for non-members and corrupt ids above
    2^53); everything else is its own singleton group."""

    def label(b: pa.Table) -> pa.Table:
        g_of, sz = ray.get(uf_ref)
        ids = pd.Series(b[id_col].to_numpy(zero_copy_only=False))
        gids = ids.copy()
        m = ids.isin(g_of).to_numpy()
        if m.any():
            gids[m] = ids[m].map(g_of)
        gsz = pd.Series(np.ones(len(ids), dtype=np.int64))
        if m.any():
            gsz[m] = gids[m].map(sz)
        return pa.table({
            id_col: b[id_col],
            "group_id": pa.array(gids.to_numpy().astype(np.int64), pa.int64()),
            "group_size": pa.array(gsz.to_numpy().astype(np.int64), pa.int64()),
            "is_representative": pa.array((gids == ids).to_numpy(), pa.bool_()),
        })

    return ds.map_batches(label, batch_format="pyarrow").sort(id_col)


def _group_output(ds, id_col: str, pairs, col_a: str, col_b: str,
                  strategy: str):
    """Shared tail of the two group operators: component labels over
    the verified pairs, then full-table labeling.

    - ``distributed`` (default): ``connected_components`` min-label
      propagation — labels and edges are Datasets in the object store,
      labeling reaches the table through one bucketed union shuffle.
      Nothing pair-bounded ever sits on the driver (the 100 TB path).
    - ``driver``: the original union-find over a collected pair frame +
      broadcast labeling — fewer executor round-trips, valid while the
      verified-pair set is provably small."""
    if strategy == "distributed":
        from ..functions.components import connected_components, label_table
        comp = connected_components(pairs, col_a, col_b)
        return label_table(ds, id_col, comp)
    if strategy == "driver":
        ref = ray.put(_unionfind_pairs(pairs.to_pandas(), col_a, col_b))
        return _label_components(ds, id_col, ref)
    raise ValueError(f"unknown strategy {strategy!r}")


def neardup_groups(sf_dir: str, threshold: float = 0.6,
                   strategy: str = "distributed"):
    """Connected components over minhash-verified near-dup pairs →
    (doc_id, group_id, group_size, is_representative); representative =
    min doc_id of the group. Approximate pair source (LSH recall) → no
    SQL oracle; invariants pinned in tests. See
    ``neardup_groups_embedding`` for the oracle-checked variant."""
    return _group_output(_read_docs(sf_dir, ["doc_id"]), "doc_id",
                         minhash_lsh_pairs(sf_dir, threshold),
                         "doc_a", "doc_b", strategy)


def neardup_groups_embedding(sf_dir: str, threshold: float = 0.45,
                             strategy: str = "distributed"):
    """Connected components over EXACT embedding-cosine pairs →
    (vec_id, group_id, group_size, is_representative). The pair source
    is deterministic-exact (``embedding_neardup_pairs``), so the WHOLE
    operator is DuckDB-oracle-checkable: a recursive CTE computes the
    transitive closure over the cosine pairs and min-labels each
    component — and since the default strategy is the DISTRIBUTED
    label propagation, the driver gate checks that path end-to-end
    (strategy agreement with the union-find variant is pinned in
    tests)."""
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id"])
    return _group_output(ds, "vec_id",
                         embedding_neardup_pairs(sf_dir, threshold),
                         "vec_a", "vec_b", strategy)


NEARDUP_GROUPS_EMBEDDING_SQL = """
WITH RECURSIVE pairs AS (
  SELECT a.vec_id AS u, b.vec_id AS v
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.embedding::DOUBLE[],
                               b.embedding::DOUBLE[]) >= 0.45
), edges AS (SELECT u, v FROM pairs UNION SELECT v, u FROM pairs),
reach AS (
  SELECT vec_id AS id, vec_id AS r FROM embeddings
  UNION
  SELECT reach.id, e.v FROM reach JOIN edges e ON reach.r = e.u
),
comp AS (SELECT id, min(r) AS group_id FROM reach GROUP BY id)
SELECT id AS vec_id, group_id::BIGINT AS group_id,
       count(*) OVER (PARTITION BY group_id) AS group_size,
       (id = group_id) AS is_representative
FROM comp ORDER BY vec_id
"""


def dedup_keep_representatives(sf_dir: str, threshold: float = 0.6,
                               strategy: str = "distributed",
                               keep: str = "min_id", n_buckets: int = 32):
    """THE corpus-dedup operator: drop every non-representative member
    of each near-dup group; survivors keep their text.

    Distributed anti-join tail via the SIZE-GATED ``joins.gated_anti``:
    below the cap the NON-representative id set broadcasts once and the
    corpus streams through the filter; above it (web-crawl dup rates
    make the dropped set corpus-proportional) the ids stay a Dataset
    and ship through ``bucket_semi(anti=True)`` — nothing drop-set-
    sized ever touches the driver. With ``strategy="distributed"`` the
    components themselves come from the object-store label propagation
    (``functions.components``).

    ``keep`` picks the survivor per group: ``"min_id"`` (the label
    itself — zero extra work) or ``"best_quality"`` (what production
    dedup actually wants: the highest heuristic ``quality`` member,
    ties → min id). Quality mode stays distributed end-to-end: group
    members' texts are selected with ``bucket_semi`` (no driver id
    set), scored with the ``text.QualityScore`` kernel, joined back to
    their labels with one bucket join, and reduced to one survivor per
    label with a vectorized per-bucket pass."""
    import pyarrow.compute as pc

    if keep not in ("min_id", "best_quality"):
        raise ValueError(f"keep={keep!r}: pass 'min_id' or 'best_quality'")
    if strategy not in ("distributed", "driver"):
        # fail loud: a typo must not silently pick the driver union-find
        # path (an unbounded driver collect at corpus scale)
        raise ValueError(f"unknown strategy {strategy!r}: "
                         "pass 'distributed' or 'driver'")
    if strategy == "distributed":
        from ..functions.components import connected_components

        comp = connected_components(minhash_lsh_pairs(sf_dir, threshold),
                                    "doc_a", "doc_b").materialize()
        if comp.count() == 0:    # clean corpus: nothing to drop (an
            comp = None          # empty Dataset has no schema to join)
        if comp is None:
            drop_ds = None
        elif keep == "best_quality":
            drop_ds = _quality_drop_ids(sf_dir, comp, n_buckets)
        else:
            drop_ds = comp.map_batches(
                lambda b: pa.table({"doc_id": b.filter(
                    pc.not_equal(b["node"], b["label"]))["node"]}),
                batch_format="pyarrow")
    else:
        if keep != "min_id":
            raise ValueError("keep='best_quality' requires "
                             "strategy='distributed'")
        # the driver strategy already collected the whole pair set, so
        # its drop ids are driver-resident by construction; ship them
        # through the same gated tail for one delivery code path
        group_of, _ = _neardup_unionfind(sf_dir, threshold)
        drop = np.fromiter((x for x, g in group_of.items() if g != x),
                           np.int64)
        drop_ds = rd.from_arrow(pa.table({"doc_id": pa.array(
            drop, pa.int64())})) if len(drop) else None
    from ..functions.joins import gated_anti

    docs = _read_docs(sf_dir, ["doc_id", "text"])
    if drop_ds is None:
        return docs.sort("doc_id")
    return gated_anti(docs, drop_ds, "doc_id",
                      n_buckets=n_buckets).sort("doc_id")


def _quality_drop_ids(sf_dir: str, comp, n_buckets: int):
    """Per-group best-quality survivor selection (see
    ``dedup_keep_representatives``): → the non-representative ids as a
    ``(doc_id)`` DATASET — delivery (broadcast vs bucketed) is the
    gated tail's decision, so nothing here touches the driver."""
    from ..functions.blocks import df_arrow
    from ..functions.joins import bucket_hash_join, bucket_semi
    from .text import QualityScore

    members = bucket_semi(
        _read_docs(sf_dir, ["doc_id", "text"]),
        comp.map_batches(lambda b: pa.table({"doc_id": b["node"]}),
                         batch_format="pyarrow"),
        "doc_id", n_buckets=n_buckets)
    scored = members.map_batches(QualityScore, batch_format="pandas",
                                 batch_size=2048, concurrency=(1, 4)) \
        .map_batches(lambda b: pa.table({
            "node": b["doc_id"].cast(pa.int64()),
            "quality": b["quality"].cast(pa.float64())}),
            batch_format="pyarrow")
    labeled = bucket_hash_join(
        scored, comp, on="node", n_buckets=n_buckets,
        columns_left=["node", "quality"], columns_right=["node", "label"],
        post=lambda j: df_arrow(j[["node", "label", "quality"]]))

    def drops(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["label", "quality", "node"],
                          ascending=[True, False, True], kind="mergesort")
        lab = g["label"].to_numpy()
        first = np.r_[True, lab[1:] != lab[:-1]]      # the survivor row
        return df_arrow(g.loc[~first, ["node"]])

    from ..functions.hashing import append_bucket

    return labeled.map_batches(append_bucket("label", n_buckets, "_qb"),
                               batch_format="pyarrow") \
        .groupby("_qb").map_groups(drops, batch_format="pandas") \
        .map_batches(lambda b: pa.table({
            "doc_id": pa.array(b["node"].to_numpy().astype(np.int64),
                               pa.int64())}),
            batch_format="pandas")


# ----------------------------------------------------------- incremental
def dedup_incremental(corpus, new, text_col: str = "text",
                      id_col: str = "doc_id", n_buckets: int = 32,
                      broadcast_max_hashes: int = 2_000_000,
                      strategy: str = "auto"):
    """Ingestion-gate dedup: rows of ``new`` whose exact text is NOT
    already in ``corpus``, first-wins (min ``id_col``) within the
    increment — the "don't re-ingest what the corpus already holds"
    step every continuously-fed training pipeline runs per increment.

    Scale shape: the corpus contributes only per-batch-distinct HASH
    rows (8 B each — ~0.1 % of corpus bytes; its text never leaves the
    first map stage), the increment's text crosses the one bucket
    shuffle exactly once, and each bucket group runs one vectorized
    anti-join + min-id dedup (never per-row / per-hash Python). Two
    text delivery strategies, selected like the minhash verify:

    - BROADCAST (corpus distinct-hash upper bound ≤
      ``broadcast_max_hashes``): the corpus hash set ships to each map
      task and new rows drop BEFORE the shuffle — the increment
      shuffle then carries survivors only.
    - SHUFFLE: corpus hash rows union the increment into the bucket
      groupby (Arrow-typed null padding keeps the union columnar);
      nothing corpus-hash-set-sized touches the driver or any task.

    Both return identical rows (strategy-agreement-tested). Output
    keeps all ``new`` columns, sorted by ``id_col``."""
    from ..functions.hashing import hash64_array

    def corpus_hashes(b: pa.Table) -> pa.Table:
        h = np.unique(hash64_array(b[text_col]))
        return pa.table({"text_hash": pa.array(h, pa.uint64())})

    ch = corpus.map_batches(corpus_hashes, batch_format="pyarrow") \
        .materialize()
    if strategy == "auto":
        # per-batch-distinct row count: cheap upper bound on the true
        # distinct-hash count (metadata count on the materialized ds)
        strategy = "broadcast" if ch.count() <= broadcast_max_hashes \
            else "shuffle"

    # normalize the increment to Arrow blocks so its unified pa.Schema
    # (captured ONCE, driver-side) types the corpus side's null padding;
    # captured BEFORE any .names deref so a schema-less empty increment
    # (e.g. from_items([])) takes the graceful empty-return path
    new = new.map_batches(lambda b: b, batch_format="pyarrow")
    schema = new.schema()
    if schema is None:        # empty increment: nothing to dedup
        return new
    arrow_schema = schema.base_schema
    new_cols = list(schema.names)

    def tag_new(b: pa.Table, drop_ref=None) -> pa.Table:
        h = hash64_array(b[text_col])
        if drop_ref is not None:
            seen = ray.get(drop_ref)
            keep = ~np.isin(h, seen)
            b, h = b.filter(pa.array(keep)), h[keep]
        b = b.append_column("text_hash", pa.array(h, pa.uint64()))
        return b.append_column(
            "_db", pa.array((h % np.uint64(n_buckets)).astype(np.int32),
                            pa.int32()))

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        # broadcast path only: groups are new-side rows, no null padding
        g = g.sort_values([id_col], kind="mergesort") \
            .drop_duplicates("text_hash")
        return g[new_cols]

    def finish_shuffle(g: pa.Table) -> pa.Table:
        # stays Arrow end-to-end: a pandas conversion of the MIXED group
        # would float-widen int columns through the corpus side's null
        # padding (silently corrupting ids above 2^53 and diverging in
        # dtype from the broadcast strategy)
        side = g["_side"].to_numpy(zero_copy_only=False)
        th = g["text_hash"].to_numpy(zero_copy_only=False)
        keep = (side == 1) & ~np.isin(th, th[side == 0])
        g, th = g.filter(pa.array(keep)), th[keep]
        ids = g[id_col].to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        # first index per hash in id order == the min-id winner per hash
        _, first = np.unique(th[order], return_index=True)
        return g.take(pa.array(order[first])).select(new_cols)

    if strategy == "broadcast":
        hs = np.sort(np.unique(np.concatenate(
            [b["text_hash"].to_numpy() for b in
             ch.iter_batches(batch_format="pandas", batch_size=65536)]
            or [np.empty(0, np.uint64)])))
        ref = ray.put(hs)
        tagged = new.map_batches(tag_new, batch_format="pyarrow",
                                 fn_kwargs={"drop_ref": ref})
        return tagged.groupby("_db") \
            .map_groups(finish, batch_format="pandas").sort(id_col)

    if strategy != "shuffle":
        raise ValueError(f"unknown strategy {strategy!r}")

    def tag_corpus(b: pa.Table) -> pa.Table:
        h = b["text_hash"].to_numpy(zero_copy_only=False)
        cols = {"text_hash": b["text_hash"],
                "_db": pa.array((h % np.uint64(n_buckets)).astype(np.int32),
                                pa.int32()),
                "_side": pa.array(np.zeros(len(b), np.int8), pa.int8())}
        for name in new_cols:  # Arrow-typed null padding (columnar union)
            cols[name] = pa.nulls(len(b), arrow_schema.field(name).type)
        return pa.table(cols)

    def side_new(b: pa.Table) -> pa.Table:
        b = tag_new(b)
        b = b.append_column("_side",
                            pa.array(np.ones(len(b), np.int8), pa.int8()))
        # column order must match tag_corpus for the union
        return b.select(["text_hash", "_db", "_side"] + new_cols)

    unioned = ch.map_batches(tag_corpus, batch_format="pyarrow").union(
        new.map_batches(side_new, batch_format="pyarrow"))
    return unioned.groupby("_db") \
        .map_groups(finish_shuffle, batch_format="pyarrow").sort(id_col)


# ------------------------------------------------------ incremental (near)
def _inc_band_join(g: pd.DataFrame, max_allpairs: int = 256) -> pd.DataFrame:
    """NEW×ALL band-bucket join for the incremental near gates: side is
    bit 0 of the packed id (``2·id + side`` here; the interleaved
    gate's ``(hash64 >> 1) << 1 | side`` uids — bit 0 means the same
    thing in both packings, and numpy's Python-style ``% 2`` is 1 for
    odd NEGATIVE int64 uids too). Corpus×corpus pairs are never built —
    a corpus–corpus edge could only merge two components whose verdicts
    are already "drop" (see ``neardup_incremental``). Inherits the
    >``max_allpairs`` flood-star guard of ``_candidate_pairs_raw``,
    keeping only star edges that touch a new doc."""
    df = g[["doc_id", "key"]].drop_duplicates()
    is_new = (df["doc_id"].to_numpy() % 2) == 1
    sizes = df.groupby("key")["doc_id"].transform("size").to_numpy()
    small = df[sizes <= max_allpairs]
    ns = small[is_new[sizes <= max_allpairs]]
    m = ns.merge(small, on="key", suffixes=("_n", "_x"))
    m = m[m["doc_id_n"] != m["doc_id_x"]]
    out = pd.DataFrame({
        "doc_a": np.minimum(m["doc_id_n"], m["doc_id_x"]),
        "doc_b": np.maximum(m["doc_id_n"], m["doc_id_x"])})
    big = df[sizes > max_allpairs]
    if len(big):
        # flood star around the key's min id; keep edges touching a
        # new doc (same guard + rationale as _candidate_pairs_raw)
        rep = big.groupby("key")["doc_id"].transform("min").to_numpy()
        mem = big["doc_id"].to_numpy()
        touch_new = ((rep % 2) == 1) | ((mem % 2) == 1)
        keep = (rep != mem) & touch_new
        star = pd.DataFrame({"doc_a": np.minimum(rep[keep], mem[keep]),
                             "doc_b": np.maximum(rep[keep], mem[keep])})
        out = pd.concat([out, star], ignore_index=True)
    return out.drop_duplicates()


def neardup_incremental(corpus, new, text_col: str = "text",
                        id_col: str = "doc_id", threshold: float = 0.6,
                        n_buckets: int = 32,
                        broadcast_max_candidates: int = 50_000):
    """NEAR-dup ingestion gate: rows of ``new`` that survive near-dup
    screening against ``corpus`` AND within the increment — the fuzzy
    sibling of ``dedup_incremental`` for continuously-fed corpora.

    Semantics (component-consistent with ``neardup_groups``): build
    verified near-dup components over corpus∪increment; a new doc
    DROPS iff its component contains any corpus doc (it is transitively
    near the corpus) or a smaller-id new doc (the increment keeps one
    representative per new-only component). Singletons pass.

    Scale shape, stage by stage:
    - both sides stream through ``MinHasher`` once; ids are packed
      ``2·id + side`` so the two id spaces cannot collide (ids must be
      in [0, 2^62) — fail-loud guarded);
    - the band-bucket join enumerates NEW×ALL pairs only —
      corpus×corpus pairs are never built. That cannot change the gate:
      a corpus–corpus edge could only merge two components that each
      already contain a corpus doc, and both verdicts are already
      "drop";
    - the >256-per-key flood guard stars members around the key's min
      id, keeping only star edges that touch a new doc;
    - exact-Jaccard verify reuses ``_verify_strategy`` (broadcast vs
      shuffle by candidate count, identical output);
    - components come from the DISTRIBUTED label propagation
      (``functions.components``); the final drop-id set (bounded by
      the increment, not the corpus) delivers through the SIZE-GATED
      ``joins.gated_anti`` — broadcast below the cap, a bucketed
      Dataset above it — same tail as ``dedup_keep_representatives``.

    Returns all columns of ``new``, survivors only, sorted by
    ``id_col``."""
    from ..functions.components import connected_components
    from ..functions.joins import gated_anti

    def pack(side: int):
        def fn(b: pa.Table) -> pa.Table:
            ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            if len(ids) and (ids.min() < 0 or ids.max() >= (1 << 62)):
                raise ValueError("neardup_incremental: ids must be in "
                                 "[0, 2^62) for side packing")
            return pa.table({"doc_id": pa.array(ids * 2 + side, pa.int64()),
                             "text": b[text_col]})
        return fn

    packed = corpus.map_batches(pack(0), batch_format="pyarrow").union(
        new.map_batches(pack(1), batch_format="pyarrow")).materialize()

    bands = packed.map_batches(MinHasher, batch_format="pyarrow",
                               batch_size=1024, concurrency=(1, 4),
                               num_cpus=1)

    raw = bands.map_batches(_band_key_bucket(n_buckets),
                            batch_format="pyarrow") \
        .groupby("bucket").map_groups(_inc_band_join, batch_format="pandas")
    pairs = pair_distinct(raw, "doc_a", "doc_b", n_buckets).materialize()
    cand_ids = _pair_ids(pairs)
    verified = _verify_strategy(pairs, _semi_filter_ids(packed, cand_ids),
                                len(cand_ids), threshold, n_buckets,
                                broadcast_max_candidates)

    comp = connected_components(verified, "doc_a", "doc_b")

    def drops(g: pd.DataFrame) -> pd.DataFrame:
        node = g["node"].to_numpy()
        g = g.assign(is_new=(node % 2) == 1)
        # component has a corpus member ⇔ min(is_new) == False
        has_corpus = g.groupby("label")["is_new"].transform("min") \
            .to_numpy() == False  # noqa: E712 (numpy bool compare)
        newg = g[g["is_new"]]
        rep = newg.groupby("label")["node"].transform("min").to_numpy()
        nn = newg["node"].to_numpy()
        drop = nn[has_corpus[g["is_new"].to_numpy()] | (nn != rep)]
        return pd.DataFrame({"node": drop})

    from ..functions.hashing import append_bucket

    drop_ds = comp.map_batches(append_bucket("label", n_buckets, "_lb"),
                               batch_format="pyarrow") \
        .groupby("_lb").map_groups(drops, batch_format="pandas") \
        .map_batches(lambda b: pa.table({id_col: pa.array(
            (b["node"].to_numpy().astype(np.int64) - 1) // 2,
            pa.int64())}), batch_format="pandas")
    return gated_anti(new, drop_ds, id_col,
                      n_buckets=n_buckets).sort(id_col)
