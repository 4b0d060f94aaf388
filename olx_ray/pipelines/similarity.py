"""Similarity search over the ``embeddings`` table.

- ``knn_bruteforce`` — exact cosine top-k: the query matrix is
  broadcast once (``ray.put``), every batch does one numpy matmul
  against it. This is the baseline and the oracle for the ANN path.
- ``knn_lsh`` — random-hyperplane LSH-bucketed ANN (the scale path):
  signatures computed per batch, candidates searched within matching
  buckets across several hash tables; recall measured against the
  brute-force result in tests.

Scale notes: brute force is O(N·Q·d) but embarrassingly parallel —
each batch of the corpus scores against the broadcast queries and
emits its LOCAL top-k; a final tiny groupby-sort keeps the global
top-k per query (combiner pattern — the shuffle carries
Q × k × n_batches rows, never the corpus)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..functions.blocks import list_matrix, matrix_list


def _load_queries(sf_dir: str, n_queries: int, *, with_raw: bool = False):
    """First ``n_queries`` rows as the query set — streamed via
    ``iter_batches`` so the driver reads O(n_queries), never the whole
    embeddings table (row groups after the prefix are not touched).
    ``with_raw=True`` additionally returns the UN-normalized vectors
    (the LSH signature path quantizes raw stored values — see
    ``_lsh_signatures`` — so normalization must not touch them)."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(f"{sf_dir}/embeddings.parquet")
    batches, got = [], 0
    for rb in pf.iter_batches(batch_size=max(n_queries, 256),
                              columns=["vec_id", "embedding"]):
        batches.append(rb)
        got += rb.num_rows
        if got >= n_queries:
            break
    t = pa.Table.from_batches(batches).slice(0, n_queries)
    ids = t["vec_id"].to_numpy()
    raw = list_matrix(t["embedding"])
    q = raw / np.linalg.norm(raw, axis=1, keepdims=True)
    if with_raw:
        return ids, q, raw
    return ids, q


def _empty_topk_table() -> pa.Table:
    return pa.table({"query_id": pa.array([], pa.int64()),
                     "neighbor_id": pa.array([], pa.int64()),
                     "cos": pa.array([], pa.float64())})


def _truncate_local_topk(rows_q, rows_n, rows_c, k: int) -> pa.Table:
    """Keep only each query's local top-(k+1) candidate rows before the
    shuffle (the +1 absorbs the self-match dropped in the finish). The
    groupby then carries Q×k×batches rows — never the corpus."""
    df = pd.DataFrame({"query_id": pd.Series(rows_q, dtype="int64"),
                       "neighbor_id": pd.Series(rows_n, dtype="int64"),
                       "cos": pd.Series(rows_c, dtype="float64")})
    df = df.sort_values(["query_id", "cos", "neighbor_id"],
                        ascending=[True, False, True]) \
        .groupby("query_id").head(k + 1)
    return pa.table({"query_id": pa.array(df["query_id"].to_numpy(), pa.int64()),
                     "neighbor_id": pa.array(df["neighbor_id"].to_numpy(), pa.int64()),
                     "cos": pa.array(df["cos"].to_numpy(), pa.float64())})


class _LocalTopK:
    """Per-batch scorer: emits each batch's local top-k per query."""

    def __init__(self, queries_ref, k):
        self.q_ids, self.q = ray.get(queries_ref)
        self.k = k

    def __call__(self, b: pa.Table) -> pa.Table:
        ids = b["vec_id"].to_numpy()
        if len(ids) == 0:
            return _empty_topk_table()
        m = list_matrix(b["embedding"])
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        cos = self.q @ m.T                        # (Q, batch)
        k = min(self.k + 1, cos.shape[1])         # +1: self-match dropped later
        # keep EVERY row tied at the boundary cos, then cut with the
        # shared deterministic (cos desc, id asc) truncation — a bare
        # argpartition keeps an arbitrary subset of boundary ties, which
        # can drop the smallest-id neighbor the SQL oracle picks
        thresh = -np.partition(-cos, k - 1, axis=1)[:, k - 1]
        rows_q, rows_n, rows_c = [], [], []
        for qi in range(cos.shape[0]):
            sel = np.nonzero(cos[qi] >= thresh[qi])[0]
            rows_q.extend([int(self.q_ids[qi])] * len(sel))
            rows_n.extend(ids[sel].tolist())
            rows_c.extend(cos[qi, sel].tolist())
        return _truncate_local_topk(rows_q, rows_n, rows_c, self.k)


def _global_topk(local, k: int):
    """Combiner finish: per query keep global top-k (cos desc, id asc),
    excluding the self pair; emit integer ranks."""

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        g = g[g["neighbor_id"] != g["query_id"]]
        g = g.sort_values(["cos", "neighbor_id"],
                          ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "neighbor_id", "rank"]]

    return local.groupby("query_id").map_groups(
        finish, batch_format="pandas").sort(["query_id", "rank"])


def knn_bruteforce(sf_dir: str, n_queries: int = 10, k: int = 10):
    ids, q = _load_queries(sf_dir, n_queries)
    ref = ray.put((ids, q))
    local = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding"]) \
        .map_batches(_LocalTopK, fn_constructor_kwargs={"queries_ref": ref,
                                                        "k": k},
                     batch_format="pyarrow", batch_size=4096,
                     concurrency=(1, 4), num_cpus=1)
    return _global_topk(local, k)


KNN_SQL_TEMPLATE = """
SELECT query_id, neighbor_id, rank FROM (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC,
                    c.vec_id) AS rank
  FROM embeddings q, embeddings c
  WHERE q.vec_id < {n_queries} AND c.vec_id != q.vec_id)
WHERE rank <= {k} ORDER BY query_id, rank
"""


def _score_cells(q_ids, q, cell_queries, k, vids, m, cell) -> pa.Table:
    """Shared IVF scorer: each corpus row scores only the queries
    probing its cell; local top-(k+1) truncation before the shuffle.
    ONE implementation on purpose — ``knn_ivf`` (argmax-derived cells)
    and ``knn_ivf_indexed`` (stored cell column) pin answer parity, so
    tie-break/truncation logic must not fork."""
    rows_q, rows_n, rows_c = [], [], []
    for c in np.unique(cell):
        qis = cell_queries.get(int(c))
        if not qis:
            continue
        sub = np.nonzero(cell == c)[0]
        cos = q[qis] @ m[sub].T              # (probing Q, sub)
        for row, qi in enumerate(qis):
            rows_q.extend([int(q_ids[qi])] * len(sub))
            rows_n.extend(int(vids[s]) for s in sub)
            rows_c.extend(cos[row].tolist())
    return _truncate_local_topk(rows_q, rows_n, rows_c, k)


def cell_similarities(m: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """(rows, cells) cosine table for cell ASSIGNMENT — ``np.einsum``
    on its default non-BLAS path, whose per-element reduction order
    does not depend on how the batch was cut, so every assignment site
    (layout build, query-time scan, semantic dedup) derives the
    IDENTICAL cell for the same row regardless of batch shape. A gemm
    picks shape-dependent BLAS kernels that drift in the last ulp and
    can flip an argmax tie across paths, breaking the
    indexed≡unindexed equality pins. ~1.5× a gemm at (5k×32×64);
    assignment is a tiny fraction of every caller's cost."""
    return np.einsum("ij,kj->ik", m, cents)


def _kmeans(sample: np.ndarray, n_cells: int, iters: int = 10,
            seed: int = 11) -> np.ndarray:
    """Seeded Lloyd's k-means on a (normalized) sample — the IVF coarse
    quantizer. Runs on the driver over a BOUNDED sample, never the
    corpus; fully deterministic."""
    rng = np.random.RandomState(seed)
    cents = sample[rng.choice(len(sample), n_cells, replace=False)].copy()
    for _ in range(iters):
        assign = (sample @ cents.T).argmax(axis=1)
        for c in range(n_cells):
            m = sample[assign == c]
            if len(m):
                v = m.mean(axis=0)
                cents[c] = v / (np.linalg.norm(v) or 1.0)
    return cents


def knn_ivf(sf_dir: str, n_queries: int = 10, k: int = 10,
            n_cells: int = 16, n_probe: int = 8, train_rows: int = 4096):
    """ANN via an IVF (inverted-file) coarse quantizer: k-means cells
    trained on a bounded sample; each corpus vector scores only the
    queries probing its cell (queries probe their ``n_probe`` nearest
    cells). The broadcast is queries + centroids — O(Q·d + C·d), never
    corpus-sized; at scale the cell id doubles as the partition key for
    a cell-pruned layout. Recall vs brute force measured in tests
    (the SYNTHETIC embeddings are near-uniform, so cells separate
    poorly and n_probe/n_cells must be high for recall — clustered
    real-world embeddings give the usual 10-50× pruning)."""
    ids, q = _load_queries(sf_dir, n_queries)
    cents = _train_centroids(sf_dir, n_cells, train_rows)
    probe = np.argsort(-(q @ cents.T), axis=1)[:, :n_probe]   # (Q, n_probe)
    cell_queries: dict[int, list[int]] = {}
    for qi in range(len(ids)):
        for c in probe[qi]:
            cell_queries.setdefault(int(c), []).append(qi)
    ref = ray.put((ids, q, cents, cell_queries, k))

    class CellScan:
        def __init__(self):
            (self.q_ids, self.q, self.cents, self.cells,
             self.k) = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            vids = b["vec_id"].to_numpy()
            if len(vids) == 0:
                return _empty_topk_table()
            m = list_matrix(b["embedding"])
            m /= np.linalg.norm(m, axis=1, keepdims=True)
            cell = cell_similarities(m, self.cents).argmax(axis=1)
            return _score_cells(self.q_ids, self.q, self.cells, self.k,
                                vids, m, cell)

    local = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding"]) \
        .map_batches(CellScan, batch_format="pyarrow", batch_size=4096,
                     concurrency=(1, 4), num_cpus=1)
    return _global_topk(local, k)


def knn_ivf_exhaustive(sf_dir: str, n_queries: int = 10, k: int = 10,
                       n_cells: int = 16, train_rows: int = 4096):
    """``knn_ivf`` with ``n_probe = n_cells`` — EXHAUSTIVE probing:
    every query probes every cell, so the candidate set is complete
    and the answer is STRUCTURALLY exact (equal to ``knn_bruteforce``
    up to cosine-rank ties, which the shared deterministic
    (cos desc, id asc) truncation breaks identically). This is the
    driver-checked surface: it exercises the full IVF machinery —
    centroid training, cell assignment, the per-cell scan kernel —
    under an exactness guarantee that makes ``KNN_SQL_TEMPLATE`` a
    valid equality oracle (the same structural argument as the
    recall-1.0-pinned LSH oracles; see ``MINHASH_LSH_SQL``). The
    PRUNED configuration's recall/pruning trade-off stays measured by
    ``ann_recall`` and the ``knn_ivf_indexed`` parity tests."""
    return knn_ivf(sf_dir, n_queries=n_queries, k=k, n_cells=n_cells,
                   n_probe=n_cells, train_rows=train_rows)


def _train_centroids(sf_dir: str, n_cells: int, train_rows: int):
    """Seeded k-means centroids from a bounded prefix sample (driver —
    sample-sized, never corpus-sized)."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(f"{sf_dir}/embeddings.parquet")
    sample_tbl = next(pf.iter_batches(batch_size=train_rows,
                                      columns=["embedding"]))
    sample = list_matrix(sample_tbl["embedding"])
    sample /= np.linalg.norm(sample, axis=1, keepdims=True)
    return _kmeans(sample, n_cells)


def embed_documents(sf_dir: str, dim: int = 64, batch_size: int = 1024):
    """Text → embedding stage: ``documents.text`` encoded to unit
    ``list<double>`` vectors on an actor pool — the in-engine producer
    of the ``embeddings`` table every semantic operator consumes
    (knn/*dedup*/SemDeDup/cluster sampling no longer require an
    externally-supplied table).

    The encoder is a DETERMINISTIC hashed bag-of-ngrams featurizer
    (the feature-hashing trick, Weinberger'09 — same
    ``scoring._hashed_features`` word uni+bigram kernel as the quality
    classifier and DSIR): per doc, hashed-feature counts over ``dim``
    buckets, L2-normalized; featureless docs map to the reserved basis
    vector e₀ (a zero vector would NaN every downstream normalize).
    It is the honest public-knowledge stand-in for a sentence-encoder
    — the PLUMBING is exactly what real model inference needs (state
    built once per actor in ``__init__``, batches encoded with
    vectorized gathers, small batches × bounded concurrency), so a
    real model drops into ``Encoder.__init__``/``__call__`` unchanged
    (cf. the multimodal codec boundary, the same philosophy).

    Returns ``(vec_id, embedding)`` in document order — ``vec_id`` is
    ``doc_id``, matching the testdata table's join convention."""
    return embed_dataset(
        rd.read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "text"]),
        dim=dim, batch_size=batch_size)


def embed_dataset(ds, dim: int = 64, batch_size: int = 1024):
    """``embed_documents`` over an in-flight ``(doc_id, text)`` Dataset
    (the ingestion path: gate survivors embed without a parquet
    round-trip). Same encoder, same contract."""
    from .scoring import _hashed_features

    class Encoder:
        def __init__(self):
            # a real model load belongs here (ray.put ref fetched once
            # per actor — the scoring.py broadcast-inference shape)
            self.dim = dim

        def __call__(self, b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return pa.table({
                    "vec_id": pa.array([], pa.int64()),
                    "embedding": pa.array([], pa.list_(pa.float64()))})
            ids = b["doc_id"].to_numpy().astype(np.int64)
            feat, offsets = _hashed_features(b["text"].to_pylist(),
                                             self.dim)
            n = len(ids)
            m = np.zeros((n, self.dim), np.float64)
            rows = np.repeat(np.arange(n), np.diff(offsets))
            np.add.at(m, (rows, feat), 1.0)
            norms = np.linalg.norm(m, axis=1)
            empty = norms == 0.0
            m[empty, 0] = 1.0
            norms[empty] = 1.0
            m /= norms[:, None]
            return pa.table({"vec_id": pa.array(ids, pa.int64()),
                             "embedding": matrix_list(m)})

    return ds.map_batches(Encoder, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=(1, 8),
                          num_cpus=1)


def embed_corpus_file(sf_dir: str, out_dir: str, dim: int = 64) -> str:
    """Materialize ``embed_documents`` as ``{out_dir}/embeddings.parquet``
    — a single FILE in the testdata layout, so every semantic operator
    (they open ``pq.ParquetFile(f"{sf_dir}/embeddings.parquet")`` for
    their bounded prefix reads) runs unchanged on ENGINE-PRODUCED
    vectors: ``embed_corpus_file(sf, d)`` then ``knn_bruteforce(d)`` /
    ``semantic_dedup(d)`` / ``kmeans_train(d)``.

    The single-file writer streams ``iter_batches`` through one
    ParquetWriter (driver-streamed but O(batch) memory) and commits by
    atomic rename — it exists for the layout convention; the SCALE
    sink for embedding output is ``Dataset.write_parquet`` /
    ``export.export_shards`` like any other table."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    path = f"{out_dir}/embeddings.parquet"
    tmp = f"{out_dir}/.tmp-embeddings.parquet"
    schema = pa.schema([("vec_id", pa.int64()),
                        ("embedding", pa.list_(pa.float64()))])
    writer = pq.ParquetWriter(tmp, schema)
    try:
        for b in embed_documents(sf_dir, dim).iter_batches(
                batch_format="pyarrow"):
            writer.write_table(b.cast(schema))
    finally:
        writer.close()
    os.replace(tmp, path)
    return path


# Quantization scale for kmeans_train's integer partial sums: 2^-20
# (~1e-6 of a unit-norm coordinate) is clustering-negligible, and the
# int64 budget 2^63 / 2^20 = 2^43 rows (~8.8e12) comfortably covers the
# 100 TB regime before the loud overflow guard fires.
_KMEANS_SCALE = 1 << 20


def kmeans_train(sf_dir: str, n_clusters: int = 16, iters: int = 10,
                 train_rows: int = 4096, init: np.ndarray | None = None,
                 batch_size: int = 4096, fan_in: int = 32) -> np.ndarray:
    """Distributed spherical k-means (Lloyd's) over the FULL embeddings
    table — the scale-path sibling of ``_train_centroids``'s
    bounded-prefix-sample trainer. Each iteration is one streaming
    pass: per batch, rows are normalized, assigned to their argmax-
    cosine centroid via the shared shape-independent
    ``cell_similarities`` kernel, and reduced to per-cluster partial
    sums; partials merge through ``summary_tree`` (≤ ``n_clusters``
    rows per node) and the driver folds exactly ``n_clusters`` rows
    into the next round's centroids — the corpus never coalesces and
    driver state is O(n_clusters · dim).

    Deterministic AND partition-invariant by construction (the
    functions/money.py discipline, applied to vectors): coordinates
    quantize to ``_KMEANS_SCALE`` integer units per batch, so partial
    sums are exact int64 and integer addition makes every iteration's
    centroids a pure function of the table — independent of batch
    layout, block order, and merge fan-in, which float partial sums
    can never be. The finish raises loudly if the global row count
    could overflow the int64 budget (see ``_KMEANS_SCALE``).

    ``init`` overrides the starting centroids (default: the same
    seeded prefix-sample ``_kmeans`` init as ``_train_centroids``, at
    ``iters=0`` sample-Lloyd rounds — i.e. raw seeds, refined here by
    the full-corpus rounds). Empty clusters keep their previous
    centroid. Cost is ``iters`` corpus scans — at 100 TB, train on a
    large uniform sample written by ``sampling.reservoir_sample`` or
    lower ``iters``; this trainer exists so the sample is not forced
    to fit the DRIVER. Returns (n_clusters, dim) float64 unit rows,
    drop-in for every ``cents=`` override (``semantic_dedup``,
    ``knn_ivf``-family via ``build_ivf_layout`` retrain)."""
    from ..functions.summaries import summary_tree

    if init is None:
        # seeded choice from the bounded prefix sample — deterministic,
        # and distinct rows of the table itself (classic Forgy init)
        import pyarrow.parquet as pq

        pf = pq.ParquetFile(f"{sf_dir}/embeddings.parquet")
        sample_tbl = next(pf.iter_batches(batch_size=train_rows,
                                          columns=["embedding"]))
        sample = list_matrix(sample_tbl["embedding"])
        sample /= np.linalg.norm(sample, axis=1, keepdims=True)
        rng = np.random.RandomState(11)
        cents = sample[rng.choice(len(sample), n_clusters,
                                  replace=False)].copy()
    else:
        cents = np.asarray(init, dtype=np.float64).copy()
        if cents.shape[0] != n_clusters:
            raise ValueError(f"init holds {cents.shape[0]} centroids, "
                             f"n_clusters={n_clusters}")

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["embedding"])
    scol = None                                  # s0..s{dim-1}, set below

    for _ in range(iters):
        cref = ray.put(cents)

        def partial(b: pa.Table) -> pd.DataFrame:
            c = ray.get(cref)
            k, dim = c.shape
            cols = {f"s{j}": np.zeros(k, np.int64) for j in range(dim)}
            out = {"cluster": np.arange(k, dtype=np.int32),
                   "n": np.zeros(k, np.int64), **cols}
            if b.num_rows:
                m = list_matrix(b["embedding"])
                m /= np.linalg.norm(m, axis=1, keepdims=True)
                cl = cell_similarities(m, c).argmax(axis=1)
                q = np.rint(m * _KMEANS_SCALE).astype(np.int64)
                sums = np.zeros((k, dim), np.int64)
                np.add.at(sums, cl, q)
                out["n"] = np.bincount(cl, minlength=k).astype(np.int64)
                for j in range(dim):
                    out[f"s{j}"] = sums[:, j]
            df = pd.DataFrame(out)
            return df[df["n"] > 0] if b.num_rows else df.iloc[:0]

        def merge(b: pa.Table) -> pd.DataFrame:
            # summary_tree hands merge nodes the partial format
            # (pyarrow); nodes see ≤ fan_in · n_clusters rows
            return b.to_pandas().groupby("cluster", as_index=False).sum()

        folded = summary_tree(ds, partial, merge, fan_in=fan_in,
                              batch_format="pyarrow",
                              batch_size=batch_size).to_pandas()
        if len(folded) == 0:     # empty corpus: nothing to refine (and
            break                # Ray 2.49 drops zero-row columns)
        if scol is None:
            scol = [c for c in folded.columns if c.startswith("s")]
        total = int(folded["n"].sum())
        if total >= (1 << 63) // _KMEANS_SCALE:
            raise OverflowError(
                f"kmeans_train: {total} rows exceeds the int64 partial-"
                f"sum budget at scale {_KMEANS_SCALE}; shard the corpus "
                "or train on a reservoir_sample")
        nxt = cents.copy()
        for _, row in folded.iterrows():         # ≤ n_clusters rows
            n = int(row["n"])
            if n == 0:
                continue
            v = row[scol].to_numpy(np.float64) / (float(n) * _KMEANS_SCALE)
            nxt[int(row["cluster"])] = v / (np.linalg.norm(v) or 1.0)
        cents = nxt
    return cents


def _cell_assigner(cref):
    """Batch fn attaching the ``cell`` column from broadcast centroids
    — the ONE assignment used by layout builds and round appends (a
    drifting copy here would silently split a cell across shards)."""
    def assign(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:      # guard BEFORE vstack (vstack([]) raises)
            return b.append_column("cell", pa.array([], pa.int64()))
        m = list_matrix(b["embedding"])
        # zero vectors assign by cos 0 against every centroid (argmax
        # → cell 0, deterministic) — an unguarded 0/0 row is all-NaN
        # and argmax's pick on it is unspecified
        nm = np.linalg.norm(m, axis=1, keepdims=True)
        nm[nm == 0] = 1.0
        m /= nm
        cell = cell_similarities(m, ray.get(cref)).argmax(axis=1) \
            .astype(np.int64)
        return b.append_column("cell", pa.array(cell, pa.int64()))
    return assign


def ivf_append(sf_dir: str, index_dir: str, round_id: int) -> dict:
    """Append a NEW increment's vectors to an existing IVF layout
    WITHOUT rebuilding it — index maintenance for the continuous-
    ingestion flow (``ingest.ingest_increment`` gates an increment;
    this adds its embeddings to the serving index): rows assign with
    the layout's FROZEN ``centroids.npy`` (never retrained, so cells
    stay query-compatible) and export as the same cell-partitioned
    shards under ``{index_dir}/round=<round_id>/``.

    Each round is its own crash-safe ``export_shards`` run (atomic
    per-cell manifests; re-running the same round skips complete
    cells, exactly like the base build). Round-aware readers —
    ``knn_ivf_indexed`` and ``semantic_dedup_indexed`` — union the
    base layout with every committed round, still opening only the
    cells they probe. vec_id uniqueness across rounds is the
    INGEST gate's contract (dedup_incremental), not re-checked here.

    Refuses an incomplete base layout (no ``IVF_MANIFEST.json``): the
    append's cell shards would otherwise sit beside a half-built base
    whose missing cells a later rebuild would rewrite around."""
    return ivf_append_dataset(
        rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"]),
        index_dir, round_id)


def ivf_append_dataset(ds, index_dir: str, round_id: int) -> dict:
    """``ivf_append`` over an in-flight ``(vec_id, embedding)`` Dataset
    (the ingestion path: ``embed_dataset`` output appends without a
    parquet round-trip). Same frozen-centroid assignment, same
    crash-safe round export."""
    from .. import storage
    from .export import export_shards, refuse_folded_round

    lman = storage.read_manifest(f"{index_dir}/IVF_MANIFEST.json")
    if lman is None:
        raise ValueError(
            f"{index_dir} has no IVF_MANIFEST.json — complete "
            f"build_ivf_layout before appending rounds")
    if round_id < 0:
        raise ValueError(f"round_id must be >= 0, got {round_id}")
    refuse_folded_round(index_dir, round_id, "ivf_append")
    n_cells = int(lman["n_cells"])
    cents = np.load(f"{index_dir}/centroids.npy")
    cref = ray.put(cents)
    ds = ds.map_batches(_cell_assigner(cref), batch_format="pyarrow")
    return export_shards(ds, f"{index_dir}/round={round_id}",
                         key="cell", n_shards=n_cells, assign="value")


def ivf_compact(index_dir: str, target_bytes: int = 128 << 20) -> dict:
    """Index maintenance for an appended-to IVF layout: fold every
    committed ``round=`` append into the base cell shards
    (``export.fold_rounds`` — hardlinks + manifest merge, no data
    rewrite), then bin-pack each cell's fragment files to
    ``target_bytes`` (``export.compact_shards``). After this the
    round-aware readers (``knn_ivf_indexed``, ``semantic_dedup_indexed``)
    open exactly one well-packed layout again — append rounds are a
    read-amplification debt this call retires.

    Both halves are crash-safe and idempotent — re-run after a kill at
    any point — but NOT schedule-blind: an in-flight/crashed
    ``ivf_append`` (uncommitted round shards) makes the fold refuse
    (finish or remove the round first), and like ``compact_shards``,
    don't run it under long-lived open readers (a lazy Dataset whose
    file list predates the commit fails loud on the deleted originals
    — snapshot-then-delete semantics, never silent wrongness)."""
    from .. import storage
    from .export import compact_shards, fold_rounds

    if storage.read_manifest(f"{index_dir}/IVF_MANIFEST.json") is None:
        # same refusal as ivf_append: a wrong-but-existing directory
        # would otherwise report a success-shaped no-op forever while
        # the real index keeps accumulating round fan-out
        raise ValueError(
            f"{index_dir} has no IVF_MANIFEST.json — not a completed "
            f"IVF layout (generic layouts: use export.fold_rounds / "
            f"export.compact_shards directly)")
    fold = fold_rounds(index_dir)
    comp = compact_shards(index_dir, target_bytes=target_bytes)
    return {"folded": fold["folded"], "rows_added": fold["rows_added"],
            "compacted": comp["compacted"]}


def build_ivf_layout(sf_dir: str, out_dir: str, n_cells: int = 16,
                     train_rows: int = 4096, trainer: str = "sample",
                     corpus_iters: int = 10) -> dict:
    """Materialize the IVF-PARTITIONED physical layout the ``knn_ivf``
    docstring promises: embeddings written as one shard per k-means
    cell (``export_shards(assign="value")`` — resumable, atomic
    per-cell manifests) plus the centroids alongside. Queries against
    this layout (``knn_ivf_indexed``) open ONLY the cells they probe —
    partition pruning at the file level, the actual 100 TB ANN path.

    ``trainer``: ``"sample"`` (default) trains on the bounded prefix
    sample (``_train_centroids``); ``"corpus"`` refines the same seeds
    with ``corpus_iters`` full-corpus ``kmeans_train`` rounds — the
    driver-unbounded path when the prefix sample would misrepresent
    the table. Layouts pin the trainer in their manifests like every
    other parameter (pre-``trainer`` layouts read as ``"sample"``,
    which is what built them).

    Resume/drift safety: ``centroids.npy`` is written BEFORE the export
    and RELOADED (never retrained/overwritten) on a resumed build, so
    shard contents and centroids cannot drift apart; a layout manifest
    pins (n_cells, train_rows, trainer) and a re-build with different
    parameters is refused (use a fresh directory)."""
    import os

    from .. import storage
    from .export import export_shards

    if trainer not in ("sample", "corpus"):
        raise ValueError(f"trainer must be 'sample' or 'corpus', "
                         f"got {trainer!r}")
    os.makedirs(out_dir, exist_ok=True)
    lman_path = f"{out_dir}/IVF_MANIFEST.json"
    lman = storage.read_manifest(lman_path)
    if lman is not None and (lman["n_cells"], lman["train_rows"],
                             lman.get("trainer", "sample")) \
            != (n_cells, train_rows, trainer):
        raise ValueError(
            f"{out_dir} was built with n_cells={lman['n_cells']}, "
            f"train_rows={lman['train_rows']}, "
            f"trainer={lman.get('trainer', 'sample')!r}; rebuild "
            f"parameters must match — use a fresh directory")
    cpath = f"{out_dir}/centroids.npy"
    cmeta_path = f"{out_dir}/CENTROIDS_META.json"
    if os.path.exists(cpath):
        cents = np.load(cpath)
        # the meta sidecar is written (atomically) BEFORE centroids.npy,
        # so reloadable centroids always carry their training params —
        # without this, a crash before IVF_MANIFEST.json let a resume
        # with a different train_rows adopt the old centroids and then
        # pin the WRONG params in the layout manifest
        cmeta = storage.read_manifest(cmeta_path)
        if cmeta is None and lman is not None:
            # pre-sidecar layout whose IVF_MANIFEST.json already pins
            # params matching this call (checked above): backfill the
            # sidecar instead of refusing a perfectly-recorded resume
            cmeta = {"n_cells": n_cells, "train_rows": train_rows,
                     "trainer": trainer}
            storage.write_manifest(cmeta_path, cmeta)
        if cmeta is None or (cmeta["n_cells"], cmeta["train_rows"],
                             cmeta.get("trainer", "sample")) \
                != (n_cells, train_rows, trainer):
            have = ("unrecorded" if cmeta is None else
                    f"n_cells={cmeta['n_cells']}, "
                    f"train_rows={cmeta['train_rows']}, "
                    f"trainer={cmeta.get('trainer', 'sample')!r}")
        else:
            have = None
        if have is not None:
            raise ValueError(
                f"{cpath} was trained with {have}; call asked "
                f"n_cells={n_cells}, train_rows={train_rows}, "
                f"trainer={trainer!r} — use a fresh directory")
        if len(cents) != n_cells:
            raise ValueError(f"{cpath} holds {len(cents)} centroids, "
                             f"call asked n_cells={n_cells}")
    else:
        if trainer == "corpus":
            cents = kmeans_train(sf_dir, n_clusters=n_cells,
                                 iters=corpus_iters, train_rows=train_rows)
        else:
            cents = _train_centroids(sf_dir, n_cells, train_rows)
        # meta first, then the (temp+renamed) npy: a crash between the
        # two leaves meta-without-centroids, which just retrains
        storage.write_manifest(cmeta_path,
                               {"n_cells": n_cells,
                                "train_rows": train_rows,
                                "trainer": trainer})
        tmp = f"{out_dir}/.tmp-centroids.npy"
        np.save(tmp, cents)
        os.replace(tmp, cpath)
    cref = ray.put(cents)
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"]) \
        .map_batches(_cell_assigner(cref), batch_format="pyarrow")
    res = export_shards(ds, out_dir, key="cell", n_shards=n_cells,
                        assign="value")
    storage.write_manifest(lman_path, {"n_cells": n_cells,
                                       "train_rows": train_rows,
                                       "trainer": trainer})
    return res


def knn_ivf_indexed(sf_dir: str, index_dir: str, n_queries: int = 10,
                    k: int = 10, n_probe: int = 8):
    """ANN over the ``build_ivf_layout`` output: load centroids, pick
    each query's ``n_probe`` cells, and read ONLY those cell shards
    (``read_shards(shards=...)`` — file-level partition pruning; the
    unprobed fraction of the corpus is never opened). Scoring reuses
    the broadcast-queries + local-top-k combiner. With identical
    centroids/probes this returns exactly ``knn_ivf``'s answer — the
    layout changes I/O, not math (pinned by a test)."""
    from .export import read_shards

    ids, q = _load_queries(sf_dir, n_queries)
    cents = np.load(f"{index_dir}/centroids.npy")
    probe = np.argsort(-(q @ cents.T), axis=1)[:, :n_probe]   # (Q, n_probe)
    cell_queries: dict[int, list[int]] = {}
    for qi in range(len(ids)):
        for c in probe[qi]:
            cell_queries.setdefault(int(c), []).append(qi)
    ref = ray.put((ids, q, cell_queries, k))

    class ShardScan:
        def __init__(self):
            self.q_ids, self.q, self.cells, self.k = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            vids = b["vec_id"].to_numpy()
            if len(vids) == 0:
                return _empty_topk_table()
            m = list_matrix(b["embedding"])
            m /= np.linalg.norm(m, axis=1, keepdims=True)
            return _score_cells(self.q_ids, self.q, self.cells, self.k,
                                vids, m, b["cell"].to_numpy())

    from .export import appended_round_dirs, consistent_union_read

    # base layout + every committed append round (ivf_append), probed
    # cells only in each — the union is still partition-pruned I/O.
    # Discovery runs under the fold-history stability check: a fold
    # committing between the base walk and the round walk would
    # silently drop the folded rows from the answer.
    probe_cells = sorted(cell_queries)

    def discover():
        d0 = read_shards(index_dir,
                         columns=["vec_id", "embedding", "cell"],
                         shards=probe_cells)
        for d in appended_round_dirs(index_dir):
            d0 = d0.union(read_shards(
                d, columns=["vec_id", "embedding", "cell"],
                shards=probe_cells))
        return d0

    ds = consistent_union_read(index_dir, discover)
    local = ds.map_batches(ShardScan, batch_format="pyarrow",
                           batch_size=4096, concurrency=(1, 4),
                           num_cpus=1)
    return _global_topk(local, k)


_LSH_QSCALE = 1 << 20


def _lsh_planes(n_tables: int, n_bits: int, dim: int) -> np.ndarray:
    """Seeded Rademacher (±1) hyperplanes for sign-LSH. ±1 entries
    instead of Gaussians (same angular-LSH family — Achlioptas 2001
    shows sign-random-projection quality is preserved) so the
    bucket-key computation is EXACT INTEGER arithmetic, reproducible
    bit-for-bit by the DuckDB oracle (``knn_lsh_sql``). Shared by the
    engine and the oracle builder — the single source of the planes."""
    rng = np.random.RandomState(7)
    return rng.randint(0, 2, (n_tables, n_bits, dim)).astype(np.int64) * 2 - 1


def _lsh_signatures(m_raw: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """(rows, n_tables) int64 bucket keys from RAW stored vectors.

    Quantize ``floor(x · 2^20)`` then dot with ±1 planes: every step is
    exact in BOTH numpy int64 and DuckDB doubles (float32 × 2^20 is an
    exact double; |dot| ≤ dim · max|x| · 2^20 ≪ 2^53), so the sign —
    hence the bucket — can never diverge engine-vs-oracle on a
    summation-order last-ulp (the CLAUDE.md half-cent rule applied to
    hyperplane hashing). Signs are scale-invariant, so hashing raw
    instead of normalized vectors selects the same buckets."""
    e = np.floor(m_raw.astype(np.float64) * _LSH_QSCALE).astype(np.int64)
    weights = (1 << np.arange(planes.shape[1])).astype(np.int64)
    return np.stack([((e @ planes[t].T) > 0) @ weights
                     for t in range(planes.shape[0])], axis=1)


def knn_lsh(sf_dir: str, n_queries: int = 10, k: int = 10,
            n_tables: int = 16, n_bits: int = 4):
    """ANN: random-hyperplane signatures; candidates = corpus vectors
    sharing a bucket with the query in ANY of ``n_tables`` tables;
    exact rerank of candidates. Buckets shuffle via groupby — at scale
    each bucket-group task touches only its slice of the corpus.
    Signatures are integer-exact (``_lsh_signatures``), which makes
    ``knn_lsh_sql`` a full equality oracle for the candidate
    enumeration + rerank."""
    ids, q, q_raw = _load_queries(sf_dir, n_queries, with_raw=True)
    planes = _lsh_planes(n_tables, n_bits, q.shape[1])
    q_sigs = _lsh_signatures(q_raw, planes)     # (Q, T)
    bucket_of = {}                              # (table, key) → [query rows]
    for qi in range(len(ids)):
        for t in range(n_tables):
            bucket_of.setdefault((t, int(q_sigs[qi, t])), []).append(qi)
    ref = ray.put((ids, q, bucket_of, planes, k))

    class Candidates:
        def __init__(self):
            (self.q_ids, self.q, self.buckets, self.planes,
             self.k) = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            vids = b["vec_id"].to_numpy()
            if len(vids) == 0:
                return _empty_topk_table()
            m = list_matrix(b["embedding"])
            mn = m / np.linalg.norm(m, axis=1, keepdims=True)
            sigs = _lsh_signatures(m, self.planes)
            # vectorized candidate matching: per (table, key-in-batch) —
            # ≤ T × 2^bits small mask ops — mark the (query, row) hit
            # matrix, then ONE matmul per query over its candidate rows
            # (never a Python loop over corpus rows)
            n_q = len(self.q_ids)
            hits = np.zeros((n_q, len(vids)), dtype=bool)
            for t in range(sigs.shape[1]):
                col = sigs[:, t]
                for key in np.unique(col):
                    qis = self.buckets.get((t, int(key)))
                    if qis:
                        hits[np.ix_(qis, col == key)] = True
            rows_q, rows_n, rows_c = [], [], []
            for qi in range(n_q):
                sel = np.nonzero(hits[qi])[0]
                if len(sel) == 0:
                    continue
                cos = mn[sel] @ self.q[qi]
                rows_q.extend([int(self.q_ids[qi])] * len(sel))
                rows_n.extend(vids[sel].tolist())
                rows_c.extend(cos.tolist())
            # local top-k before the shuffle (see CellScan)
            return _truncate_local_topk(rows_q, rows_n, rows_c, self.k)

    local = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding"]) \
        .map_batches(Candidates, batch_format="pyarrow", batch_size=4096,
                     concurrency=(1, 4), num_cpus=1)
    return _global_topk(local, k)


def _lsh_sig_cte(n_tables: int, n_bits: int, dim: int) -> str:
    """The signature CTEs shared by ``knn_lsh_sql`` and the
    adversarial sig-parity test: planes inlined as ±1 literals,
    ``sig(vec_id, t, key)`` = the exact-integer bucket keys."""
    planes = _lsh_planes(n_tables, n_bits, dim)
    vals = ",\n".join(
        f"({t},{b},[{','.join(str(int(v)) for v in planes[t, b])}]::DOUBLE[])"
        for t in range(n_tables) for b in range(n_bits))
    return f"""planes(t, b, p) AS (VALUES {vals}),
e AS (SELECT vec_id, embedding,
             list_transform(embedding, x -> floor(x * {float(_LSH_QSCALE)}))
               AS eq
      FROM embeddings),
sig AS (SELECT e.vec_id, pl.t,
               SUM(CASE WHEN list_dot_product(e.eq, pl.p) > 0
                        THEN (1::BIGINT << pl.b) ELSE 0 END)::BIGINT AS key
        FROM e, planes pl GROUP BY e.vec_id, pl.t)"""


def lsh_signatures_sql(n_tables: int = 16, n_bits: int = 4,
                       dim: int = 64) -> str:
    """Standalone signature oracle: one row per (vec_id, table)."""
    return (f"WITH {_lsh_sig_cte(n_tables, n_bits, dim)} "
            f"SELECT vec_id, t, key FROM sig ORDER BY vec_id, t")


def knn_lsh_sql(n_queries: int = 10, k: int = 10, n_tables: int = 16,
                n_bits: int = 4, dim: int = 64) -> str:
    """FULL equality oracle for ``knn_lsh``: re-derives the candidate
    sets (not just the rerank) in DuckDB. The ±1 planes come from the
    same ``_lsh_planes`` the engine uses, inlined as literals; bucket
    keys are the same exact-integer ``floor(x · 2^20) · (±1)`` dots
    (see ``_lsh_signatures`` for the exactness argument), so candidate
    membership is bit-identical by construction. Rerank = exact cosine
    with the house (cos DESC, neighbor_id ASC) tie-break — the same
    float-parity posture as ``KNN_SQL_TEMPLATE``."""
    return f"""
WITH {_lsh_sig_cte(n_tables, n_bits, dim)},
cand AS (SELECT DISTINCT qs.vec_id AS query_id, cs.vec_id AS neighbor_id
         FROM sig qs JOIN sig cs ON cs.t = qs.t AND cs.key = qs.key
         WHERE qs.vec_id < {n_queries} AND cs.vec_id != qs.vec_id),
ranked AS (SELECT cand.query_id, cand.neighbor_id,
                  row_number() OVER (PARTITION BY cand.query_id
                    ORDER BY list_cosine_similarity(q.embedding, c.embedding)
                             DESC, cand.neighbor_id) AS rank
           FROM cand
           JOIN e q ON q.vec_id = cand.query_id
           JOIN e c ON c.vec_id = cand.neighbor_id)
SELECT query_id, neighbor_id, rank FROM ranked
WHERE rank <= {k} ORDER BY query_id, rank
"""


def knn_bruteforce_filtered(sf_dir: str, label: int, n_queries: int = 10,
                            k: int = 10):
    """ATTRIBUTE-FILTERED exact kNN — the vector-DB "filtered search"
    shape: neighbors are restricted to corpus rows with
    ``label == <label>`` (queries stay the unfiltered prefix, so
    results are comparable across filters). The filter pushes into the
    parquet read (row groups that cannot match never leave storage;
    with the label as a partition key this becomes file-level pruning,
    the `build_ivf_layout` pattern); scoring and the top-k combiner
    are the unfiltered operator's, unchanged. DuckDB-oracle-checked
    via ``KNN_FILTERED_SQL_TEMPLATE``."""
    import pyarrow.dataset as pads

    ids, q = _load_queries(sf_dir, n_queries)
    ref = ray.put((ids, q))
    # the scanner evaluates the filter without 'label' in the
    # projection — scored batches carry only what the scorer reads
    local = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding"],
                            filter=pads.field("label") == label) \
        .map_batches(_LocalTopK, fn_constructor_kwargs={"queries_ref": ref,
                                                        "k": k},
                     batch_format="pyarrow", batch_size=4096,
                     concurrency=(1, 4), num_cpus=1)
    return _global_topk(local, k)


KNN_FILTERED_SQL_TEMPLATE = """
SELECT query_id, neighbor_id, rank FROM (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC,
                    c.vec_id) AS rank
  FROM embeddings q, embeddings c
  WHERE q.vec_id < {n_queries} AND c.vec_id != q.vec_id
    AND c.label = {label})
WHERE rank <= {k} ORDER BY query_id, rank
"""


def hybrid_search_rrf(sf_dir: str, query: str, k: int = 10, *,
                      k_leg: int = 50, rrf_k: int = 60) -> pd.DataFrame:
    """Hybrid lexical+semantic retrieval fused with Reciprocal Rank
    Fusion (Cormack, Clarke & Büttcher, SIGIR'09 — public method;
    ``rrf_k=60`` is the paper's constant):

    1. lexical leg — ``bm25_topk`` over the query text (two streaming
       passes, query-bounded state);
    2. semantic leg — exact cosine top-``k_leg`` seeded by
       pseudo-relevance feedback: the query vector is the embedding of
       the BEST lexical hit that HAS one (doc_id ≡ vec_id; embedding
       coverage may be partial — e.g. sf0.1 embeds 2k of 5k docs).
       All ≤ ``k_leg`` lexical candidates' vectors are fetched with
       ONE pushed-down ``isin`` filter (only matching row groups leave
       storage) and the highest-ranked available one seeds the leg;
       if NO candidate is embedded the op degrades to lexical-only
       fusion (``sem_rank`` all 0). The seed doc itself is excluded
       from this leg (the shared self-pair rule) but still ranks
       through its lexical leg;
    3. fusion — ``rrf = Σ_legs 1/(rrf_k + rank)`` over the two rank
       lists. Both legs are ≤ ``k_leg`` rows by construction, so the
       fusion is a driver-side O(k_leg) merge — bounded regardless of
       corpus size.

    Deterministic ties: every sort breaks (score desc, doc_id asc).
    Output: top-``k`` rows ``(doc_id, rrf_score, lex_rank, sem_rank)``
    with rank 0 meaning "absent from that leg's top-``k_leg``"."""
    import pyarrow.dataset as pads

    from .text import bm25_topk

    lex = bm25_topk(sf_dir, query, k=k_leg).to_pandas()   # ≤ k_leg rows
    if not len(lex) or "doc_id" not in lex.columns:
        raise ValueError(f"query {query!r} matches no document")
    lex = lex.sort_values(["score", "doc_id"], ascending=[False, True]) \
        .reset_index(drop=True)
    lex["lex_rank"] = np.arange(1, len(lex) + 1, dtype=np.int64)

    cand_ids = lex["doc_id"].astype("int64").tolist()      # ≤ k_leg ids
    seeds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding"],
                            filter=pads.field("vec_id").isin(cand_ids)) \
        .take_all()                                        # ≤ k_leg rows
    have = {int(r["vec_id"]): r["embedding"] for r in seeds}
    seed_id = next((int(d) for d in cand_ids if int(d) in have), None)

    if seed_id is None:                        # nothing embedded:
        sem = pd.DataFrame({"doc_id": pd.Series(dtype=np.int64),
                            "sem_rank": pd.Series(dtype=np.int64)})
    else:
        v = np.asarray(have[seed_id], dtype=np.float64)[None, :]
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        ref = ray.put((np.array([seed_id], dtype=np.int64), v))
        local = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                                columns=["vec_id", "embedding"]) \
            .map_batches(_LocalTopK,
                         fn_constructor_kwargs={"queries_ref": ref,
                                                "k": k_leg},
                         batch_format="pyarrow", batch_size=4096,
                         concurrency=(1, 4), num_cpus=1)
        from ..functions.blocks import collect_pandas
        sem = collect_pandas(                              # ≤ k_leg rows;
            _global_topk(local, k_leg),                    # may be EMPTY
            {"neighbor_id": np.int64, "rank": np.int64})   # (seed = only
        sem = sem.rename(columns={"neighbor_id": "doc_id",  # embedded doc)
                                  "rank": "sem_rank"})

    fused = lex[["doc_id", "lex_rank"]].merge(sem, on="doc_id",
                                              how="outer")
    lr = fused["lex_rank"].to_numpy(np.float64)
    sr = fused["sem_rank"].to_numpy(np.float64)
    fused["rrf_score"] = (
        np.where(np.isnan(lr), 0.0, 1.0 / (rrf_k + lr))
        + np.where(np.isnan(sr), 0.0, 1.0 / (rrf_k + sr)))
    fused["lex_rank"] = fused["lex_rank"].fillna(0).astype(np.int64)
    fused["sem_rank"] = fused["sem_rank"].fillna(0).astype(np.int64)
    return fused.sort_values(["rrf_score", "doc_id"],
                             ascending=[False, True]).head(k) \
        .reset_index(drop=True)[["doc_id", "rrf_score",
                                 "lex_rank", "sem_rank"]]


def ann_recall(sf_dir: str, variant: str = "lsh", n_queries: int = 10,
               k: int = 10) -> pd.DataFrame:
    """Retrieval-quality report for an ANN variant against the exact
    brute-force ground truth — the "measure, don't guess" QA step every
    approximate index needs before it gates a production corpus:

    - ``recall_at_k`` — |ANN top-k ∩ exact top-k| / k per query;
    - ``mrr`` — 1/rank (in the ANN list) of the TRUE nearest
      neighbor, 0 when the ANN list misses it entirely.

    Both result sets are ≤ ``n_queries × k`` rows by construction
    (each op's local-topk combiner), so the comparison is a bounded
    driver-side merge — corpus size never enters. Output: one row per
    query ``(query_id, recall_at_k, mrr)`` plus a final summary row
    ``query_id = -1`` holding the macro averages."""
    from ..functions.blocks import collect_pandas

    cols = {"query_id": np.int64, "neighbor_id": np.int64,
            "rank": np.int64}
    # either side can legitimately be EMPTY (single-vector corpus →
    # the self-pair rule leaves no exact rows; ANN buckets may miss):
    # collect_pandas keeps the typed columns so the report degrades
    # to recall 0 instead of KeyError-ing
    exact = collect_pandas(knn_bruteforce(sf_dir, n_queries, k), cols)
    if variant == "bruteforce":
        approx = exact.copy()
    elif variant == "lsh":
        approx = collect_pandas(knn_lsh(sf_dir, n_queries, k), cols)
    elif variant == "ivf":
        approx = collect_pandas(knn_ivf(sf_dir, n_queries, k), cols)
    else:
        raise ValueError(f"unknown variant {variant!r}")

    hit = exact.merge(approx, on=["query_id", "neighbor_id"],
                      how="left", suffixes=("", "_ann"))
    per_q = hit.groupby("query_id").agg(
        recall_at_k=("rank_ann", lambda s: s.notna().sum() / k))
    true_nn = hit[hit["rank"] == 1]
    mrr = (1.0 / true_nn.set_index("query_id")["rank_ann"]) \
        .fillna(0.0).rename("mrr")
    out = per_q.join(mrr).reset_index().sort_values("query_id") \
        .reset_index(drop=True)
    out["mrr"] = out["mrr"].fillna(0.0)
    summary = pd.DataFrame({
        "query_id": [-1],
        "recall_at_k": [out["recall_at_k"].mean() if len(out) else 0.0],
        "mrr": [out["mrr"].mean() if len(out) else 0.0]})
    return pd.concat([out, summary], ignore_index=True)
