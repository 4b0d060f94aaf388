"""Distributed sampling and per-group top-k.

Training-data pipelines constantly need "give me k uniform rows of a
100 TB corpus", "the p50/p95/p99 of a column", "the top-3 docs per
language by quality", "keep each language's middle perplexity band"
— each without materializing anything corpus-sized. All built on the
bounded-summary-tree shape (`word_freq_topk_approx`) or the group-hash
bucketed finish: only fixed-size summaries (or ≤ k-per-group partials)
ever move, so driver and per-task memory are O(k), independent of
input size.

- ``reservoir_sample`` — deterministic uniform k-sample: keep the k
  smallest ``mix64(id ^ seed)`` priorities ("bottom-k sampling", the
  mergeable equivalent of a reservoir — Cohen & Kaplan, "Summarizing
  data using bottom-k sketches", PODC'07). Hash-priority selection
  makes the sample a pure function of (ids, k, seed): independent of
  partitioning, repeatable across runs, and UNIONABLE — the bottom-k
  of a union is the bottom-k of the merged summaries.
- ``approx_quantiles`` — quantiles of a bottom-k uniform sample; rank
  error is the DKW sample bound O(sqrt(ln(1/δ)/n)) (≈ ±2 % at
  n=4096), mergeable the same way.
- ``group_topk`` — EXACT top-k rows per group: per-batch vectorized
  partial top-k (sort + ``groupby().head``) shrinks each batch to
  ≤ k·groups_in_batch rows, then one shuffle on group-hash buckets
  finishes — the q18/`word_counts` unbounded-key pattern, never one
  task per group.
- on top of these: ``weighted_sample`` (exponential race clocks),
  ``group_quantiles`` (exact per-group order statistics),
  ``source_quota_sample`` (per-source cap), ``score_band_filter`` /
  ``group_score_band_filter`` (global / per-group CCNet quantile
  bands), ``cluster_balanced_sample`` (per-k-means-cluster quota via
  the shared centroid assigner + ``group_topk``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import bucket_of, hash64_array, mix64


def _with_priority(b: pd.DataFrame, id_col: str, seed: int) -> pd.DataFrame:
    ids = b[id_col].to_numpy()
    if ids.dtype.kind in "iu":
        pr = mix64(ids.astype(np.int64, copy=False), seed)
    else:  # string ids: stable content hash, then seed-mix
        pr = mix64(hash64_array(b[id_col].tolist()), seed)
    return b.assign(_pri=pr)


def _take_smallest(b: pd.DataFrame, k: int, id_col: str) -> pd.DataFrame:
    # mergesort + id tiebreak: fully deterministic even on duplicate ids
    return b.sort_values(["_pri", id_col], kind="mergesort").head(k)


def _bottomk(ds, id_col: str, k: int, seed: int, fan_in: int,
             with_priority=None):
    """Bounded summary tree (`functions.summaries.summary_tree`)
    keeping the k smallest ``_pri`` rows. ``with_priority(batch) ->
    batch-with-_pri`` defaults to the uniform hash priority;
    `weighted_sample` passes exponential race clocks — only the
    priority kernel differs."""
    from ..functions.summaries import summary_tree

    assign = with_priority or (lambda b: _with_priority(b, id_col, seed))

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return _take_smallest(assign(b), k, id_col)

    def merge(b: pd.DataFrame) -> pd.DataFrame:
        return _take_smallest(b, k, id_col)

    return summary_tree(ds, partial, merge, fan_in=fan_in,
                        batch_size=65536)


def _drop_pri(b: pd.DataFrame) -> pd.DataFrame:
    return b.drop(columns=["_pri"])


def reservoir_sample(ds, id_col: str, k: int, seed: int = 0,
                     fan_in: int = 32):
    """Uniform k-row sample of ``ds``, deterministic in (ids, k, seed)
    and independent of partitioning: rows with the k smallest
    ``mix64(id ^ seed)``. Rows keep all columns; output is sorted by
    priority (a uniform-random order — the first j rows are themselves
    a uniform j-sample). O(k) rows per summary, O(k·fan_in) at the
    worst merge node."""
    return _bottomk(ds, id_col, k, seed, fan_in) \
        .map_batches(_drop_pri, batch_format="pandas")


def approx_quantiles(ds, value_col: str, id_col: str, qs,
                     sample_size: int = 4096, seed: int = 0) -> pd.DataFrame:
    """Approximate quantiles of ``value_col`` from a bottom-k uniform
    sample: rank error ≤ ~sqrt(ln(2/δ)/(2·sample_size)) with prob 1-δ
    (DKW), e.g. ±2 % ranks at the default 4096. Nulls/NaNs are ignored
    (match SQL ``quantile_cont``). Returns a small (q, value) frame —
    driver holds sample_size values, never the column. The exact
    sibling for bounded-domain ints is `corpus.token_quantiles`'s
    value-histogram path."""
    qs = np.atleast_1d(np.asarray(qs, np.float64))

    def project(b: pd.DataFrame) -> pd.DataFrame:
        out = b[[id_col, value_col]]
        return out[out[value_col].notna()]

    from ..functions.blocks import collect_pandas

    # collect_pandas, not bare to_pandas(): a zero-row collect (empty /
    # all-null input) drops columns in Ray 2.49, so sample[value_col]
    # would KeyError before the len==0 NaN path below runs.
    sample = collect_pandas(
        _bottomk(ds.map_batches(project, batch_format="pandas"),
                 id_col, sample_size, seed, fan_in=32),
        {value_col: np.float64})
    vals = sample[value_col].to_numpy(np.float64)
    if len(vals) == 0:
        return pd.DataFrame({"q": qs, "value": np.full(len(qs), np.nan)})
    return pd.DataFrame({"q": qs, "value": np.quantile(vals, qs)})


def exp_clock(ids: np.ndarray, weights: np.ndarray,
              seed: int = 0) -> np.ndarray:
    """Exponential race clocks ``-ln(u_id)/w`` with ``u_id`` a
    deterministic uniform from ``mix64(id ^ seed)``. Sorting ANY row
    set by this key yields a weighted random permutation; its prefixes
    are weighted samples without replacement (Efraimidis & Spirakis
    2006). Shared by ``weighted_sample`` and corpus
    ``weighted_interleave``. Non-positive weights get +inf (never
    chosen)."""
    u = (mix64(ids.astype(np.int64, copy=False), seed)
         .astype(np.float64) + 1.0) / (2.0 ** 64 + 2)
    w = np.asarray(weights, np.float64)
    with np.errstate(divide="ignore"):
        key = -np.log(u) / w
    return np.where(w > 0, key, np.inf)


def weighted_sample(ds, id_col: str, weight_col: str, k: int,
                    seed: int = 0, fan_in: int = 32):
    """Weighted k-sample without replacement (inclusion odds ∝ row
    weight, e.g. quality scores): keep the k smallest exponential
    clocks. Same bounded summary tree as ``reservoir_sample`` — O(k)
    rows per summary, deterministic in (ids, weights, k, seed),
    partition-invariant, mergeable."""
    def clocked(b: pd.DataFrame) -> pd.DataFrame:
        return b.assign(_pri=exp_clock(
            b[id_col].to_numpy(),
            b[weight_col].to_numpy(np.float64), seed))

    return _bottomk(ds, id_col, k, seed, fan_in, with_priority=clocked) \
        .map_batches(_drop_pri, batch_format="pandas")


def group_topk(ds, group_col: str, order_col: str, k,
               descending: bool = True, tiebreak_col: str | None = None,
               n_buckets: int = 32):
    """EXACT top-k rows per group, deterministic: ordered by
    ``order_col`` (desc by default) then ``tiebreak_col`` asc (defaults
    to the group col — pass a unique id for full determinism on value
    ties). Group cardinality may grow with the data: the finish runs
    per group-HASH bucket (one vectorized sort + ``groupby().head`` per
    bucket), never per group.

    ``k`` may be an int (one cap for every group) or a ``{group: k}``
    dict — PER-GROUP caps in one pass (the crawl's per-search ad cap:
    one execution instead of one filter+sort+limit per group). With a
    dict, groups absent from it get k=0 (dropped)."""
    tb = tiebreak_col or group_col
    per_group = dict(k) if isinstance(k, dict) else None

    def topk(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values([order_col, tb], ascending=[not descending, True],
                          kind="mergesort")
        if per_group is not None:
            caps = b[group_col].map(per_group).fillna(0).to_numpy(np.int64)
            rank = b.groupby(group_col, sort=False).cumcount().to_numpy()
            return b[rank < caps]
        return b.groupby(group_col, sort=False).head(k)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = topk(b)
        keys = b[group_col].to_numpy()
        if keys.dtype.kind in "iu":
            bucket = bucket_of(keys.astype(np.int64, copy=False), n_buckets)
        else:
            bucket = (hash64_array(b[group_col].tolist())
                      % np.uint64(n_buckets)).astype(np.int32)
        return b.assign(_bucket=bucket)

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        return topk(g).drop(columns=["_bucket"])

    return (ds.map_batches(partial, batch_format="pandas",
                           batch_size=65536)
            .groupby("_bucket").map_groups(finish, batch_format="pandas"))


def sample_documents(sf_dir: str, k: int = 100, seed: int = 0):
    """Uniform document sample — the corpus-inspection entry point.

    Two passes so the WIDE columns never ride the sample machinery:
    priorities need only ``doc_id`` (a column-pruned scan that decodes
    no text), then the k winning ids broadcast-semi-join the full rows
    back. The text scan is the second pass's column-pruned read; only
    k full rows ever leave it."""
    import ray.data as rd

    from ..functions.joins import broadcast_semi

    ids = reservoir_sample(
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"]),
        "doc_id", k, seed).to_pandas()["doc_id"]
    return broadcast_semi(
        rd.read_parquet(f"{sf_dir}/documents.parquet"),
        set(int(i) for i in ids), "doc_id")


def event_value_quantiles(sf_dir: str, qs=(0.5, 0.9, 0.99),
                          sample_size: int = 4096) -> pd.DataFrame:
    """Approximate value quantiles over the events table."""
    import ray.data as rd

    return approx_quantiles(
        rd.read_parquet(f"{sf_dir}/events.parquet",
                        columns=["event_id", "value"]),
        "value", "event_id", qs, sample_size)


def top_events_per_user(sf_dir: str, k: int = 3):
    """Top-k highest-value events per user (unbounded group count)."""
    import ray.data as rd

    return group_topk(
        rd.read_parquet(f"{sf_dir}/events.parquet",
                        columns=["event_id", "user_id", "value"]),
        "user_id", "value", k, tiebreak_col="event_id")


def source_quota_sample(sf_dir: str, cap: int = 50):
    """At most ``cap`` documents per source — the RefinedWeb/C4-style
    per-domain cap that stops one mega-crawl domain from dominating a
    training mix. Which ``cap`` docs survive is a deterministic uniform
    choice: priority = Knuth multiplicative hash of ``doc_id``
    (mod 2^32 — the same construction as ``corpus.train_val_split``,
    with the same ``HUGEINT``-cast SQL parity), ties broken by
    ``doc_id``, so the sample is a pure function of the table —
    independent of partitioning and repeatable across runs. Source
    cardinality may grow with the data (hosts, not enum values):
    the cap runs through ``group_topk``'s bucketed finish, and only
    ``(doc_id, source)`` ever shuffles — never text."""
    import ray.data as rd

    from ..functions.hashing import knuth_fingerprint32

    def pri(b: pd.DataFrame) -> pd.DataFrame:
        return b.assign(
            _pri=knuth_fingerprint32(b["doc_id"].to_numpy())
            .astype(np.int64))

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "source"])
    capped = group_topk(
        docs.map_batches(pri, batch_format="pandas", batch_size=65536),
        "source", "_pri", cap, descending=False, tiebreak_col="doc_id")
    return capped.map_batches(lambda b: b.drop(columns=["_pri"]),
                              batch_format="pandas")


SOURCE_QUOTA_SQL = """
SELECT doc_id, source FROM (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY (doc_id::HUGEINT * 2654435761) % 4294967296,
                    doc_id) AS rn
  FROM documents) WHERE rn <= {cap}
"""


def group_quantiles(ds, group_col: str, value_col: str, qs=(25, 50, 75),
                    n_buckets: int = 32):
    """EXACT per-group discrete quantiles (``quantile_disc`` semantics:
    the smallest value whose cumulative count reaches ``ceil(q% · n)``)
    at UNBOUNDED group cardinality — the grouped sibling of
    ``corpus.token_quantiles``:

    1. per-batch combiner: ``(group, value) → count`` (compresses
       repeated values; raw rows never shuffle when values repeat);
    2. one shuffle on group-HASH buckets — a bucket holds every
       (value, count) of its groups, so quantiles are decidable
       locally;
    3. per bucket: ONE vectorized pass — sort by (group, value),
       per-group cumulative counts, searchsorted per quantile — never
       a Python loop over groups.

    Output: one row per group — ``(group_col, q<p> …)`` wide columns.
    """
    qs = tuple(qs)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby([group_col, value_col], as_index=False) \
            .size().rename(columns={"size": "cnt"})
        keys = g[group_col].to_numpy()
        if keys.dtype.kind in "iu":
            bucket = bucket_of(keys.astype(np.int64, copy=False), n_buckets)
        else:
            bucket = (hash64_array(g[group_col].tolist())
                      % np.uint64(n_buckets)).astype(np.int32)
        return g.assign(_bucket=bucket)

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby([group_col, value_col], as_index=False)["cnt"].sum()
        g = g.sort_values([group_col, value_col], kind="mergesort") \
            .reset_index(drop=True)
        cum = g.groupby(group_col, sort=False)["cnt"].cumsum().to_numpy()
        keys = g[group_col].to_numpy()
        brk = np.r_[True, keys[1:] != keys[:-1]]
        seg = np.flatnonzero(brk)                  # group start offsets
        totals = np.r_[cum[seg[1:] - 1], cum[-1]]  # per-group n
        vals = g[value_col].to_numpy()
        out = {group_col: keys[seg]}
        # ONE global searchsorted per quantile: lift the per-group
        # cumulative counts onto a strictly-increasing axis by spacing
        # groups BIG apart (cum restarts per group; rank ≤ total < BIG
        # keeps every probe inside its own group's segment)
        gi = np.cumsum(brk) - 1
        big = float(totals.max()) + 1.0
        t = gi * big + cum
        for q in qs:
            ranks = np.ceil(q / 100.0 * totals)
            idx = np.searchsorted(t, np.arange(len(seg)) * big + ranks)
            out[f"q{q}"] = vals[idx]
        return pd.DataFrame(out)

    return (ds.map_batches(partial, batch_format="pandas",
                           batch_size=65536)
            .groupby("_bucket").map_groups(finish, batch_format="pandas"))


def cluster_balanced_sample(sf_dir: str, k_per_cluster: int,
                            n_clusters: int = 16,
                            cents: "np.ndarray | None" = None,
                            train_rows: int = 4096, seed: int = 0):
    """Diversity-preserving sample over the ``embeddings`` table: at
    most ``k_per_cluster`` rows from EACH k-means cluster — even
    coverage of embedding space where a uniform sample mirrors the
    corpus's density skew (the cluster-quota selection shape from
    DataComp-style curation; SemDeDup prunes within-cluster redundancy,
    this balances ACROSS clusters).

    Composition of verified pieces, nothing new moves: centroids come
    from ``similarity.kmeans_train``/``_train_centroids`` (or are
    passed in), assignment is ``similarity._cell_assigner`` — the ONE
    centroid-assignment kernel, shared with layout builds and round
    appends so this sample's cluster of a vector can never diverge
    from the IVF layout's cell for the same vector (broadcast
    centroids, no shuffle) — and the within-cluster pick is the
    deterministic ``mix64(vec_id, seed)`` priority through
    ``group_topk``: exact per-group bottom-k with only
    ``(vec_id, cluster, priority)`` ever shuffling. Deterministic and
    partition-invariant end to end; returns ``(vec_id, cluster)``
    sorted by vec_id."""
    import ray

    from .similarity import _cell_assigner, _train_centroids

    if cents is None:
        cents = _train_centroids(sf_dir, n_clusters, train_rows)
    cref = ray.put(np.asarray(cents, dtype=np.float64))
    assign_cell = _cell_assigner(cref)

    def featurize(b: pa.Table) -> pa.Table:
        # stages fuse: the shared assigner, then the narrow
        # (vec_id, cluster, _pri) projection the shuffle carries
        b = assign_cell(b)
        ids = b["vec_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64) if b.num_rows else np.empty(0, np.int64)
        return pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "cluster": b["cell"].cast(pa.int32()),
            "_pri": pa.array(mix64(ids, seed), pa.uint64())})

    import ray.data as rd

    assigned = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"]) \
        .map_batches(featurize, batch_format="pyarrow",
                     batch_size=2048, num_cpus=1)
    picked = group_topk(assigned, "cluster", "_pri", k_per_cluster,
                        descending=False, tiebreak_col="vec_id")
    return picked.select_columns(["vec_id", "cluster"]).sort("vec_id")


def score_band_filter(ds, value_col: str, qlo: float = 0.05,
                      qhi: float = 0.95, id_col: str = "doc_id",
                      sample_size: int = 4096, seed: int = 0):
    """Keep rows whose ``value_col`` lies inside the global
    [``qlo``, ``qhi``] quantile band — the CCNet-style "middle
    perplexity band" selection (too low = boilerplate the LM has
    memorized, too high = junk), generic over any scored Dataset.
    Cuts come from ``approx_quantiles``' bottom-k sample (DKW rank
    error ≤ ~2 % at the default 4096 — the band EDGES are approximate,
    membership between the cuts is exact), then ONE expression filter:
    two streaming passes, nothing but the O(sample_size) summary ever
    leaves the workers. The kept SET is deterministic in (ids, seed);
    row ORDER follows Ray's block completion and is not guaranteed
    stable across runs — sort downstream when a canonical order
    matters (the house ``.sort(id_col)`` convention). Null scores
    drop (they match no band)."""
    cuts = approx_quantiles(ds, value_col, id_col, (qlo, qhi),
                            sample_size, seed)["value"]
    lo, hi = float(cuts.iloc[0]), float(cuts.iloc[1])
    if np.isnan(lo):                       # only-null / empty input:
        return ds.filter(expr=f"{value_col} != {value_col}")
    return ds.filter(expr=f"{value_col} >= {lo} and {value_col} <= {hi}")


def group_score_band_filter(ds, group_col: str, value_col: str,
                            qlo: float = 0.05, qhi: float = 0.95,
                            id_col: str = "doc_id",
                            sample_per_group: int = 2048, seed: int = 0):
    """Per-GROUP quantile-band keep — the full CCNet selection ("keep
    each language's middle perplexity band", the per-lang quantile
    `lm.perplexity_score` points at): every group gets its own
    [``qlo``, ``qhi``] cuts, so a high-perplexity language is not
    wiped out by a global band. Scale shape:

    1. per-group uniform sample via ``group_topk`` over the
       ``mix64(id ^ seed)`` priority (ascending — the bottom-k-per-
       group sibling of ``reservoir_sample``); ≤ ``sample_per_group``
       rows per group ever shuffle;
    2. cuts per group computed driver-side over that BOUNDED frame
       (groups × sample rows — groups must be bounded: languages,
       sources; for unbounded groups use the global
       ``score_band_filter``) and broadcast as one dict;
    3. one vectorized membership map per batch.

    Kept set deterministic in (ids, seed); row order = Ray block
    order (sort downstream). Null scores and rows of unseen groups
    drop."""
    import ray

    def pri(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b[value_col].notna()]
        ids = b[id_col].to_numpy()
        if ids.dtype.kind in "iu":
            p = mix64(ids.astype(np.int64, copy=False), seed)
        else:
            p = mix64(hash64_array(b[id_col].tolist()), seed)
        return b.assign(_pri=p)

    sample = group_topk(
        ds.map_batches(pri, batch_format="pandas", batch_size=65536),
        group_col, "_pri", sample_per_group,
        descending=False, tiebreak_col=id_col).to_pandas()
    if "_pri" in sample.columns:        # zero-row collects drop columns
        cuts = {g: (float(np.quantile(v, qlo)), float(np.quantile(v, qhi)))
                for g, v in sample.groupby(group_col)[value_col]}
    else:
        cuts = {}
    ref = ray.put(cuts)

    class Keep:
        def __init__(self):
            self.cuts = ray.get(ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            bounds = b[group_col].map(self.cuts)
            has = bounds.notna()
            lo = np.array([c[0] if isinstance(c, tuple) else np.inf
                           for c in bounds])
            hi = np.array([c[1] if isinstance(c, tuple) else -np.inf
                           for c in bounds])
            v = b[value_col].to_numpy(np.float64)
            return b[has.to_numpy() & (v >= lo) & (v <= hi)]

    return ds.map_batches(Keep, batch_format="pandas",
                          batch_size=65536, concurrency=(1, 4))
