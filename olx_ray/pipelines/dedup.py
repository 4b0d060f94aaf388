"""Deduplication pipelines over the ``documents`` table.

First-class training-data operators:

- ``dedup_exact``       — hash-partitioned exact dedup (oracle-able).
- ``minhash_lsh_pairs`` — shingle → minhash → band → bucket-groupby →
  candidate pairs → exact-Jaccard verify. The classic near-dup path:
  the only all-to-all is the groupby on (band, band_hash); signatures
  are computed vectorized per batch.
- ``simhash_pairs``     — 64-bit simhash + banded hamming candidates.
- ``ngram_jaccard_verify`` — the exact word-3-gram Jaccard used as the
  verifier (exposed for candidate pairs).
- ``embedding_neardup_pairs`` — cosine ≥ τ pairs over the embeddings
  table (oracle via DuckDB list_cosine_similarity).

Scale notes: minhash/simhash signatures are fixed-width columns; band
explosion multiplies rows by n_bands (not data size); candidate
verification re-reads only candidate docs via broadcast of the (small)
candidate id set.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..functions.hashing import hash64

N_PERM = 128
N_BANDS = 32          # 32 bands × 4 rows → catches J≳0.6 reliably
ROWS_PER_BAND = N_PERM // N_BANDS


def _read_docs(sf_dir: str, columns=None):
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


# ------------------------------------------------------------------ exact
def dedup_exact(sf_dir: str):
    """Exact dedup: content hash → groupby(hash) → keep min doc_id.
    At scale the groupby shuffle moves (hash, doc_id) pairs only — text
    never leaves the first map stage."""

    def hash_stage(b: pa.Table) -> pa.Table:
        h = np.array([hash64(t or "") for t in b["text"].to_pylist()],
                     dtype=np.uint64)
        return pa.table({"doc_id": b["doc_id"],
                         "text_hash": pa.array(h, pa.uint64())})

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": [g["doc_id"].min()],
                             "n_copies": [len(g)]})

    return (_read_docs(sf_dir, ["doc_id", "text"])
            .map_batches(hash_stage, batch_format="pyarrow")
            .groupby("text_hash")
            .map_groups(keep_first, batch_format="pandas")
            .sort("doc_id"))


DEDUP_EXACT_SQL = """
SELECT min(doc_id) AS doc_id, count(*)::BIGINT AS n_copies
FROM documents GROUP BY text ORDER BY min(doc_id)
"""


# ---------------------------------------------------------------- minhash
def shingles(text: str, n: int = 3) -> set[int]:
    """Word n-gram shingle hashes."""
    toks = (text or "").split()
    if len(toks) < n:
        return {hash64(" ".join(toks))} if toks else set()
    return {hash64(" ".join(toks[i:i + n])) for i in range(len(toks) - n + 1)}


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

    def signature(self, sh: set[int]) -> np.ndarray:
        if not sh:
            return np.zeros(self.n_perm, dtype=np.uint64)
        # fold 64-bit shingle hashes to 31 bits; (a*x+b) mod (2^31-1) is
        # exact in int64 and fully vectorized: (n_perm × n_shingles) → min
        x = (np.fromiter(sh, dtype=np.uint64, count=len(sh))
             % np.uint64(self._P31)).astype(np.int64)[None, :]
        return ((self.a * x + self.b) % self._P31).min(axis=1).astype(np.uint64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids, band_ids, band_hashes = [], [], []
        for doc_id, text in zip(batch["doc_id"].to_pylist(),
                                batch["text"].to_pylist()):
            sig = self.signature(shingles(text))
            for band in range(self.n_bands):
                chunk = sig[band * self.rows:(band + 1) * self.rows]
                doc_ids.append(doc_id)
                band_ids.append(band)
                band_hashes.append(hash64(chunk.tobytes()))
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "band_id": pa.array(band_ids, pa.int32()),
            "band_hash": pa.array(np.array(band_hashes, dtype=np.uint64),
                                  pa.uint64()),
        })


def minhash_candidates(sf_dir: str, n_buckets: int = 32):
    """LSH candidate pairs: docs sharing a (band_id, band_hash) bucket.

    Implemented as a hash-bucketed SELF-JOIN: band rows get
    ``bucket = band_key % n_buckets``; each bucket-group does ONE
    vectorized pandas self-merge on the band key (all same-bucket band
    hashes are co-located) — no per-LSH-bucket Python calls, which is
    what makes this scale past ~10^5 band rows. Pair dedup across bands
    is a drop_duplicates inside the same group task + a final tiny
    distinct."""
    bands = _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        MinHasher, batch_format="pyarrow", batch_size=1024,
        concurrency=(1, 4), num_cpus=1)

    def key_bucket(b: pa.Table) -> pa.Table:
        bid = b["band_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        bh = b["band_hash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        key = (bid * np.uint64(0x9E3779B97F4A7C15)) ^ bh
        return pa.table({"doc_id": b["doc_id"],
                         "key": pa.array(key, pa.uint64()),
                         "bucket": pa.array((key % np.uint64(n_buckets))
                                            .astype(np.int32), pa.int32())})

    def self_join(g: pd.DataFrame) -> pd.DataFrame:
        df = g[["doc_id", "key"]].drop_duplicates()
        m = df.merge(df, on="key", suffixes=("_a", "_b"))
        m = m[m["doc_id_a"] < m["doc_id_b"]]
        out = m[["doc_id_a", "doc_id_b"]].drop_duplicates()
        return out.rename(columns={"doc_id_a": "doc_a", "doc_id_b": "doc_b"})

    pairs = bands.map_batches(key_bucket, batch_format="pyarrow") \
        .groupby("bucket").map_groups(self_join, batch_format="pandas")
    # a pair can still fire in bands landing in different buckets
    return pairs.groupby(["doc_a", "doc_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas")


def ngram_jaccard(a: str, b: str, n: int = 3) -> float:
    sa, sb = shingles(a, n), shingles(b, n)
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter)


class JaccardVerify:
    """Actor-pool verify stage: exact word-3-gram Jaccard per candidate
    pair; docs fetched once per actor from a broadcast id→text dict."""

    def __init__(self, docs_ref, threshold: float):
        self.docs: dict[int, str] = ray.get(docs_ref)
        self.threshold = threshold

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        j = [ngram_jaccard(self.docs.get(a, ""), self.docs.get(b, ""))
             for a, b in zip(batch["doc_a"], batch["doc_b"])]
        batch = batch.copy()
        batch["jaccard"] = np.round(j, 6)
        return batch[batch["jaccard"] >= self.threshold]


def minhash_lsh_pairs(sf_dir: str, threshold: float = 0.6):
    """Near-duplicate pairs: LSH candidates verified by exact Jaccard.
    The doc-text broadcast is test-scale convenience; at 100 TB the
    verify stage joins candidate ids back to the corpus by hash bucket."""
    cands = minhash_candidates(sf_dir)
    docs = {r["doc_id"]: r["text"] for r in
            _read_docs(sf_dir, ["doc_id", "text"]).take_all()}
    ref = ray.put(docs)
    return cands.map_batches(
        JaccardVerify, fn_constructor_kwargs={"docs_ref": ref,
                                              "threshold": threshold},
        batch_format="pandas", concurrency=(1, 4), num_cpus=1,
    ).sort(["doc_a", "doc_b"])


# ---------------------------------------------------------------- simhash
class SimHasher:
    """64-bit simhash over word features (frequency-weighted)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = np.empty(batch.num_rows, dtype=np.uint64)
        for i, text in enumerate(batch["text"].to_pylist()):
            toks = (text or "").split()
            if not toks:
                out[i] = 0
                continue
            hs = np.array([hash64(t) for t in toks], dtype=np.uint64)
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                    & np.uint64(1)).astype(np.int64)
            v = (2 * bits - 1).sum(axis=0)
            out[i] = int(((v > 0).astype(np.uint64)
                          << np.arange(64, dtype=np.uint64)).sum())
        return pa.table({"doc_id": batch["doc_id"],
                         "simhash": pa.array(out, pa.uint64())})


def simhash_signatures(sf_dir: str):
    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        SimHasher, batch_format="pyarrow", batch_size=1024,
        concurrency=(1, 4), num_cpus=1).sort("doc_id")


def simhash_pairs(sf_dir: str, max_hamming: int = 3):
    """Hamming-≤k candidate pairs via 4-way band buckets (any pair with
    ≤3 differing bits shares at least one of 4 16-bit bands) + exact
    hamming verify inside the bucket."""
    sigs = simhash_signatures(sf_dir)

    def explode(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_pylist()
        sh = b["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        doc_ids, bands, keys, full = [], [], [], []
        for band in range(4):
            part = (sh >> np.uint64(band * 16)) & np.uint64(0xFFFF)
            doc_ids.extend(ids)
            bands.extend([band] * len(ids))
            keys.extend(part.tolist())
            full.extend(sh.tolist())
        return pa.table({"doc_id": pa.array(doc_ids, pa.int64()),
                         "band": pa.array(bands, pa.int32()),
                         "key": pa.array(np.array(keys, dtype=np.uint64), pa.uint64()),
                         "simhash": pa.array(np.array(full, dtype=np.uint64), pa.uint64())})

    def verify_bucket(g: pd.DataFrame) -> pd.DataFrame:
        """One task per HASH BUCKET of (band, key): within the bucket,
        pairwise-verify only inside same-(band, key) runs — sorted
        groupby in pandas, no per-LSH-bucket Python task."""
        out_a, out_b, out_d = [], [], []
        for (_, _), sub in g.groupby(["band", "key"], sort=False):
            if len(sub) < 2:
                continue
            rows = sub.drop_duplicates("doc_id").sort_values("doc_id")
            ids = rows["doc_id"].to_numpy()
            sh = rows["simhash"].to_numpy().astype(np.uint64)
            for i in range(len(ids)):
                x = (sh[i] ^ sh[i + 1:]).astype(np.uint64)
                d = np.zeros(len(x), dtype=np.int64)
                v = x.copy()
                while v.any():             # vectorized popcount
                    d += (v & np.uint64(1)).astype(np.int64)
                    v >>= np.uint64(1)
                for j in np.nonzero(d <= max_hamming)[0]:
                    out_a.append(int(ids[i]))
                    out_b.append(int(ids[i + 1 + j]))
                    out_d.append(int(d[j]))
        return pd.DataFrame({"doc_a": pd.Series(out_a, dtype="int64"),
                             "doc_b": pd.Series(out_b, dtype="int64"),
                             "hamming": pd.Series(out_d, dtype="int64")})

    def bucketize(b: pa.Table) -> pa.Table:
        key = b["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
        band = b["band"].to_numpy(zero_copy_only=False).astype(np.uint64)
        bucket = ((key * np.uint64(0x9E3779B97F4A7C15)) ^ band) % np.uint64(64)
        return b.append_column("bucket", pa.array(bucket.astype(np.int32),
                                                  pa.int32()))

    pairs = sigs.map_batches(explode, batch_format="pyarrow") \
        .map_batches(bucketize, batch_format="pyarrow") \
        .groupby("bucket").map_groups(verify_bucket, batch_format="pandas")

    def distinct_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["doc_a", "doc_b"])

    # same pair can fire in several bands → distinct via one small pass
    return pairs.repartition(1).map_batches(distinct_pairs,
                                            batch_format="pandas") \
        .sort(["doc_a", "doc_b"])


# ----------------------------------------------------- embedding near-dup
def embedding_neardup_pairs(sf_dir: str, threshold: float = 0.45):
    """Pairs of embeddings with cosine ≥ τ. Per batch: normalized rows ×
    broadcast normalized matrix (numpy matmul) — brute force, the
    LSH-bucketed variant is in pipelines.similarity."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    ids = tbl["vec_id"].to_numpy()
    m = np.vstack(tbl["embedding"].to_pylist()).astype(np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    ref = ray.put((ids, m))

    class Scan:
        def __init__(self):
            self.ids, self.m = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            q_ids = b["vec_id"].to_numpy()
            q = np.vstack(b["embedding"].to_pylist()).astype(np.float64)
            q /= np.linalg.norm(q, axis=1, keepdims=True)
            cos = q @ self.m.T
            qi, mi = np.nonzero(cos >= threshold)
            keep = q_ids[qi] < self.ids[mi]   # upper triangle only
            return pa.table({
                "vec_a": pa.array(q_ids[qi][keep], pa.int64()),
                "vec_b": pa.array(self.ids[mi][keep], pa.int64()),
            })

    return rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                           columns=["vec_id", "embedding"]) \
        .map_batches(Scan, batch_format="pyarrow", batch_size=256,
                     concurrency=(1, 4), num_cpus=1) \
        .sort(["vec_a", "vec_b"])


EMBEDDING_NEARDUP_SQL = """
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.45
ORDER BY vec_a, vec_b
"""


def neardup_groups(sf_dir: str, threshold: float = 0.6):
    """Connected components over verified near-dup pairs → (doc_id,
    group_id, group_size, is_representative). Pairs are collected on
    the driver for the union-find (ray_guide: valid because the
    candidate-pair set is provably small — bounded by LSH bucket
    collisions, not corpus size); label assignment back onto the corpus
    is a broadcast map. Representative = min doc_id of the group."""
    pairs = minhash_lsh_pairs(sf_dir, threshold).to_pandas()

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    group_of = {x: find(x) for x in list(parent)}
    sizes: dict[int, int] = {}
    for g in group_of.values():
        sizes[g] = sizes.get(g, 0) + 1
    ref = ray.put((group_of, sizes))

    def label(b: pa.Table) -> pa.Table:
        g_of, sz = ray.get(ref)
        ids = b["doc_id"].to_pylist()
        gids = [g_of.get(i, i) for i in ids]
        return pa.table({
            "doc_id": b["doc_id"],
            "group_id": pa.array(gids, pa.int64()),
            "group_size": pa.array([sz.get(g, 1) for g in gids], pa.int64()),
            "is_representative": pa.array([g == i for g, i in zip(gids, ids)],
                                          pa.bool_()),
        })

    return _read_docs(sf_dir, ["doc_id"]).map_batches(
        label, batch_format="pyarrow").sort("doc_id")


def dedup_keep_representatives(sf_dir: str, threshold: float = 0.6):
    """THE corpus-dedup operator: drop every non-representative member
    of each near-dup group; survivors keep their text."""
    groups = neardup_groups(sf_dir, threshold)
    keep = {r["doc_id"] for r in groups.take_all() if r["is_representative"]}
    ref = ray.put(keep)

    def filt(b: pa.Table) -> pa.Table:
        keep_set = ray.get(ref)  # zero-copy plasma fetch, once per batch
        ids = b["doc_id"].to_pylist()
        return b.filter(pa.array([i in keep_set for i in ids]))

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        filt, batch_format="pyarrow").sort("doc_id")
