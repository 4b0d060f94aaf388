"""SemDeDup: semantic deduplication by embedding-cluster pruning.

Public algorithm (Abbas et al. 2023, "SemDeDup: Data-efficient
learning at web-scale through semantic deduplication",
arXiv:2303.09540): k-means cluster the embedding space, then inside
each cluster drop every member whose cosine similarity to an
already-ranked member exceeds ``eps``. Ranking follows the paper's
``keep="hard"`` default — members ordered by similarity-to-centroid
ASCENDING, so the surviving representative of each duplicate set is
its LEAST prototypical (most diverse) example; ``keep="easy"``
flips the order. Unlike the pairwise near-dup operators
(`embedding_neardup_*`), similarity is only ever computed WITHIN a
cluster — the clustering is the candidate filter, so total work is
O(Σ s_c²) instead of O(N²).

Two physical paths, one pruning kernel (``_prune_ordered``, pinned
equal to a brute-force reference in tests):

- ``semantic_dedup`` — assign stage (broadcast centroids, vectorized
  argmax per batch) then ONE all-to-all: ``groupby("cluster")`` with a
  vectorized per-cluster prune. Embedding vectors ride that shuffle.
- ``semantic_dedup_indexed`` — ZERO-shuffle path over a
  ``build_ivf_layout`` directory (`similarity.py`): cells are already
  physical partitions, so the prune fans out one task per cell, each
  reading only its own committed shard files. This is the 100 TB path:
  the corpus is re-read cell-local, nothing embedding-sized crosses
  the network, and a crashed run re-reads only unfinished cells.

Scale notes: cluster count must grow with the corpus (the paper uses
50k clusters for LAION) so per-cluster size s_c = N/C stays bounded —
a worker holds one cluster's matrix (s_c × d float64). The triangular
max-similarity pass is column-chunked (``col_chunk``), so scratch is
O(s_c · col_chunk), never O(s_c²).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..functions.blocks import list_matrix, matrix_list


def _prune_ordered(vecs: np.ndarray, eps: float,
                   col_chunk: int = 2048) -> np.ndarray:
    """Keep mask over rows ALREADY in rank order: row i survives iff
    max_{j<i} cos(i, j) < eps. ``vecs`` must be L2-normalized. This is
    the vectorized triangular rule of the reference SemDeDup
    implementation (max over all earlier members, not kept-only — a
    member can be suppressed by an earlier member that was itself
    suppressed; documented paper semantics, pinned by tests)."""
    s = len(vecs)
    if s == 0:
        return np.zeros(0, dtype=bool)
    max_prior = np.full(s, -np.inf)
    rows = np.arange(s)
    for lo in range(0, s, col_chunk):
        hi = min(lo + col_chunk, s)
        # rows >= hi are masked for every column in [lo, hi) anyway —
        # multiplying only the first hi rows halves the kernel's flops
        cos = vecs[:hi] @ vecs[lo:hi].T              # (hi, chunk)
        cos[rows[:hi, None] >= np.arange(lo, hi)[None, :]] = -np.inf
        max_prior[lo:hi] = cos.max(axis=0)
    return max_prior < eps


def _order_cluster(g: pd.DataFrame, keep: str) -> pd.DataFrame:
    asc = keep == "hard"     # hard: least-prototypical member survives
    return g.sort_values(["cent_cos", "vec_id"],
                         ascending=[asc, True], kind="mergesort")


def _prune_cluster_frame(g: pd.DataFrame, eps: float, keep: str,
                         col_chunk: int) -> pd.DataFrame:
    """(vec_id, cluster, cent_cos, vec) rows of ONE cluster → the
    output frame with the keep flag."""
    g = _order_cluster(g, keep)
    vecs = np.vstack(g["vec"].to_numpy())
    mask = _prune_ordered(vecs, eps, col_chunk)
    return pd.DataFrame({
        "vec_id": g["vec_id"].to_numpy(),
        "cluster": g["cluster"].to_numpy().astype(np.int32),
        "cent_cos": g["cent_cos"].to_numpy(),
        "keep": mask,
    })


def _normalized(b: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = b["vec_id"].to_numpy().astype(np.int64)
    m = list_matrix(b["embedding"])
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    return ids, m


_EMPTY = pa.table({"vec_id": pa.array([], pa.int64()),
                   "cluster": pa.array([], pa.int32()),
                   "cent_cos": pa.array([], pa.float64()),
                   "keep": pa.array([], pa.bool_())})


def semantic_dedup(sf_dir: str, eps: float = 0.93, n_clusters: int = 16,
                   train_rows: int = 4096, keep: str = "hard",
                   col_chunk: int = 2048, cents: np.ndarray | None = None):
    """SemDeDup over ``embeddings.parquet`` → Dataset
    ``(vec_id, cluster, cent_cos, keep)`` sorted by vec_id.

    ``cents`` overrides centroid training (used by tests and by the
    indexed-path equality pin); by default centroids come from the
    same bounded-prefix-sample k-means as ``knn_ivf``."""
    return _semantic_dedup_mask(sf_dir, eps, n_clusters, train_rows,
                                keep, col_chunk, cents).sort("vec_id")


def _semantic_dedup_mask(sf_dir, eps, n_clusters, train_rows, keep,
                         col_chunk, cents):
    """The unsorted mask plan — consumers that only aggregate the mask
    (e.g. ``semantic_dedup_corpus`` collecting drop ids) skip the
    corpus-sized final sort shuffle."""
    from .similarity import _train_centroids

    if keep not in ("hard", "easy"):
        raise ValueError(f"keep must be 'hard' or 'easy', got {keep!r}")
    if cents is None:
        cents = _train_centroids(sf_dir, n_clusters, train_rows)
    cref = ray.put(np.asarray(cents, dtype=np.float64))

    class Assign:
        def __init__(self):
            self.cents = ray.get(cref)

        def __call__(self, b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return pa.table({"vec_id": pa.array([], pa.int64()),
                                 "cluster": pa.array([], pa.int32()),
                                 "cent_cos": pa.array([], pa.float64()),
                                 "vec": pa.array([], pa.list_(pa.float64()))})
            from .similarity import cell_similarities

            ids, m = _normalized(b)
            # shared shape-independent assignment kernel: the indexed
            # path trusts build_ivf_layout's cells, so BOTH must derive
            # the same argmax for the same row (see cell_similarities)
            cl = cell_similarities(m, self.cents).argmax(axis=1)
            # per-row einsum, NOT a gemm column-select: einsum's
            # reduction is shape-independent, so the indexed path (which
            # recomputes cent_cos over cluster-sized row subsets) gets
            # bit-identical values — gemm picks different BLAS kernels
            # by matrix shape and drifts in the last ulp
            cent_cos = np.einsum("ij,ij->i", m, self.cents[cl])
            return pa.table({
                "vec_id": pa.array(ids, pa.int64()),
                "cluster": pa.array(cl.astype(np.int32), pa.int32()),
                "cent_cos": pa.array(cent_cos, pa.float64()),
                "vec": matrix_list(m),
            })

    def prune(g: pd.DataFrame) -> pd.DataFrame:
        return _prune_cluster_frame(g, eps, keep, col_chunk)

    return rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                           columns=["vec_id", "embedding"]) \
        .map_batches(Assign, batch_format="pyarrow", batch_size=2048,
                     concurrency=(1, 8), num_cpus=1) \
        .groupby("cluster") \
        .map_groups(prune, batch_format="pandas")


def semantic_dedup_indexed(index_dir: str, eps: float = 0.93,
                           keep: str = "hard", col_chunk: int = 2048):
    """SemDeDup over a ``build_ivf_layout`` directory — zero shuffle:
    one task per committed cell shard, each reading only its own files
    and pruning its cluster locally. Identical output to
    ``semantic_dedup`` run with the layout's centroids (pinned by a
    test): the layout changes I/O, not math."""
    import os

    import pyarrow.parquet as pq

    from .export import committed_shard_files

    if keep not in ("hard", "easy"):
        raise ValueError(f"keep must be 'hard' or 'easy', got {keep!r}")
    if not os.path.exists(f"{index_dir}/IVF_MANIFEST.json"):
        # the layout manifest is build_ivf_layout's completeness marker
        # (written AFTER every cell commits) — without this check a
        # crashed build would silently drop every vector of the
        # uncommitted cells from the output
        raise ValueError(
            f"{index_dir} has no IVF_MANIFEST.json — the layout build "
            f"is incomplete (or the path is wrong); re-run "
            f"build_ivf_layout before semantic_dedup_indexed")
    cents = np.load(f"{index_dir}/centroids.npy").astype(np.float64)
    cref = ray.put(cents)

    # base layout + every committed ivf_append round: appended rows
    # carry the SAME frozen-centroid cell assignment, so merging a
    # cell's files across rounds keeps the prune exactly cell-local
    from .export import appended_round_dirs, consistent_union_read

    # one fold-history-consistent discovery over base + rounds: a fold
    # committing mid-walk would double-serve the folded rows here
    # (rounds walked after the base picked up the fold manifests)
    def discover():
        cf: dict[int, list[str]] = {}
        for d in [index_dir] + appended_round_dirs(index_dir):
            for c, files in committed_shard_files(d).items():
                cf.setdefault(c, []).extend(files)
        return cf

    cell_files = consistent_union_read(index_dir, discover)
    cells = [{"cell": c, "files": files}
             for c, files in sorted(cell_files.items())]
    if not cells:
        return rd.from_arrow(_EMPTY)

    class PruneCell:
        def __init__(self):
            self.cents = ray.get(cref)

        def __call__(self, b: pa.Table) -> pa.Table:
            out = []
            for row in b.to_pylist():
                t = pa.concat_tables([pq.read_table(
                    f, columns=["vec_id", "embedding"])
                    for f in row["files"]])
                if t.num_rows == 0:
                    continue
                ids, m = _normalized(t)
                # identical per-row einsum as the Assign stage (see its
                # comment) — keeps the indexed≡shuffle pin bit-exact
                cent_cos = np.einsum(
                    "ij,ij->i", m,
                    self.cents[np.full(len(ids), row["cell"])])
                g = pd.DataFrame({
                    "vec_id": ids,
                    "cluster": np.full(len(ids), row["cell"], np.int32),
                    "cent_cos": cent_cos,
                    "vec": list(m),
                })
                out.append(pa.Table.from_pandas(
                    _prune_cluster_frame(g, eps, keep, col_chunk),
                    preserve_index=False))
            if not out:
                return _EMPTY
            return pa.concat_tables(out).cast(_EMPTY.schema)

    # one row per cell, batch_size=1 → one Ray task per cell shard
    return rd.from_items(cells) \
        .map_batches(PruneCell, batch_format="pyarrow", batch_size=1,
                     concurrency=(1, 8), num_cpus=1) \
        .sort("vec_id")


def semantic_dedup_corpus(sf_dir: str, eps: float = 0.93,
                          n_clusters: int = 16, train_rows: int = 4096,
                          keep: str = "hard",
                          cents: np.ndarray | None = None):
    """The composed corpus filter: run ``semantic_dedup`` over the
    embeddings (vec_id ≡ doc_id in this engine's data model) and
    anti-join the DROPPED ids against the documents table through the
    SIZE-GATED ``joins.gated_anti``: below the cap the id set ships
    once via ``ray.put`` (text streams, zero shuffle); above it —
    semantic dup rates make the dropped set corpus-proportional — the
    ids stay a Dataset and deliver via ``bucket_semi(anti=True)``, so
    nothing drop-set-sized ever touches the driver. Uses the UNSORTED
    mask plan — the drop-id set is order-independent, so
    ``semantic_dedup``'s final corpus-sized sort shuffle is skipped."""
    from ..functions.joins import gated_anti

    mask = _semantic_dedup_mask(sf_dir, eps, n_clusters, train_rows,
                                keep, 2048, cents)
    dropped = mask.filter(expr="keep == False") \
        .map_batches(lambda b: pa.table({"doc_id": b["vec_id"]}),
                     batch_format="pyarrow")
    return gated_anti(
        rd.read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "text"]),
        dropped, "doc_id").sort("doc_id")
