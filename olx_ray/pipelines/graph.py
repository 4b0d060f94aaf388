"""Distributed PageRank over an edge Dataset — link-graph analytics
for the crawl store (rank pages by link structure; the classic
frontier-prioritization / quality signal. Public algorithm: Page &
Brin 1998; the MapReduce formulation follows the standard
contributions-shuffle shape, cf. Malewicz et al. Pregel, SIGMOD'10).

Everything is a Dataset (the ``functions/components.py`` discipline):
per iteration

1. each node's contribution ``rank/out_degree`` ships to its
   out-neighbors through ONE ``bucket_hash_join`` on ``src``, with the
   per-``dst`` partial sum fused into the join task (``post=``) so at
   most one row per (bucket, dst) leaves the join;
2. contributions meet the node table (rank, out-degree riding along)
   in one bucketed union-combine — new rank, |Δ| computed in place;
3. dangling mass (rank parked on zero-out-degree nodes) is an exact
   small aggregate, redistributed uniformly — column sums stay 1;
4. convergence = exact L1 delta (``sum("delta")``) against ``tol``.

Iteration count is the damping-factor mixing time (≈ log(tol)/log(d) —
~60 rounds at d=0.85, tol=1e-6), independent of graph size; per-round
cost is one edge shuffle, the scale axis."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..functions.blocks import df_arrow
from ..functions.hashing import append_bucket


def _bucketize(col: str, n_buckets: int):
    return append_bucket(col, n_buckets, name="_gb")


def pagerank(edges, src_col: str = "src", dst_col: str = "dst", *,
             damping: float = 0.85, tol: float = 1e-6,
             max_iters: int = 100, n_buckets: int = 32):
    """→ Dataset ``(node, rank)`` over every distinct endpoint of
    ``edges`` (directed; duplicate edges count once per occurrence —
    parallel edges weight the link). Ranks sum to 1. Raises if
    ``max_iters`` iterations don't reach ``tol`` (L1)."""
    from ..functions.joins import bucket_hash_join

    def as_edge(b: pa.Table) -> pa.Table:
        return pa.table({
            "src": b[src_col].cast(pa.int64()),
            "dst": b[dst_col].cast(pa.int64())})

    e = edges.map_batches(as_edge, batch_format="pyarrow").materialize()

    # node table with out-degrees: endpoints union, one bucketed pass
    def endpoints(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        d = b["dst"].to_numpy(zero_copy_only=False)
        return pa.table({
            "node": pa.array(np.concatenate([s, d]), pa.int64()),
            "outd": pa.array(np.r_[np.ones(len(s), np.int64),
                                   np.zeros(len(d), np.int64)], pa.int64())})

    def degsum(g: pd.DataFrame) -> pa.Table:
        out = g.groupby("node", as_index=False)["outd"].sum()
        return df_arrow(out)

    nodes = (e.map_batches(endpoints, batch_format="pyarrow")
             .map_batches(_bucketize("node", n_buckets),
                          batch_format="pyarrow")
             .groupby("_gb").map_groups(degsum, batch_format="pandas")
             .materialize())
    n = nodes.count()
    if n == 0:
        return rd.from_arrow(pa.table({"node": pa.array([], pa.int64()),
                                       "rank": pa.array([], pa.float64())}))

    def init_rank(b: pa.Table) -> pa.Table:
        return pa.table({
            "node": b["node"],
            "rank": pa.array(np.full(b.num_rows, 1.0 / n), pa.float64()),
            "outd": b["outd"]})

    ranks = nodes.map_batches(init_rank, batch_format="pyarrow") \
        .materialize()
    base = (1.0 - damping) / n

    for _ in range(max_iters):
        # exact dangling mass: rank parked on zero-out-degree nodes
        def dang_partial(b: pa.Table) -> pa.Table:
            r = b["rank"].to_numpy(zero_copy_only=False)
            d0 = b["outd"].to_numpy(zero_copy_only=False) == 0
            return pa.table({"m": pa.array([float(r[d0].sum())],
                                           pa.float64())})

        dangling = sum(row["m"] for row in ranks.map_batches(
            dang_partial, batch_format="pyarrow").take_all())
        spread = damping * dangling / n

        def as_src(b: pa.Table) -> pa.Table:
            r = b["rank"].to_numpy(zero_copy_only=False)
            d = np.maximum(b["outd"].to_numpy(zero_copy_only=False), 1)
            return pa.table({"src": b["node"],
                             "contrib": pa.array(r / d, pa.float64())})

        contrib = bucket_hash_join(
            e, ranks.map_batches(as_src, batch_format="pyarrow"),
            on="src", n_buckets=n_buckets,
            columns_left=["src", "dst"], columns_right=["src", "contrib"],
            post=lambda j: df_arrow(
                j.groupby("dst", as_index=False)["contrib"].sum()
                .rename(columns={"dst": "node", "contrib": "val"})
                .assign(outd=np.int64(0), is_own=np.int8(0))))

        own = ranks.map_batches(
            lambda b: pa.table({
                "node": b["node"], "val": b["rank"].cast(pa.float64()),
                "outd": b["outd"],
                "is_own": pa.array(np.ones(b.num_rows, np.int8), pa.int8())}),
            batch_format="pyarrow")

        def step(g: pd.DataFrame, base=base, spread=spread) -> pa.Table:
            is_own = g["is_own"].to_numpy().astype(bool)
            node = g["node"].to_numpy()
            order = np.argsort(node, kind="mergesort")
            node, is_own = node[order], is_own[order]
            val = g["val"].to_numpy()[order]
            outd = g["outd"].to_numpy()[order]
            brk = np.r_[True, node[1:] != node[:-1]]
            seg = np.flatnonzero(brk)
            s = np.add.reduceat(np.where(is_own, 0.0, val), seg)
            new = base + damping * s + spread
            old = val[is_own]
            # the node table covers every endpoint, so each node has
            # exactly one own row and segments align with own rows
            assert len(old) == len(seg), "ranks must cover every node"
            return df_arrow(pd.DataFrame({
                "node": node[is_own],
                "rank": new,
                "outd": outd[is_own],
                "delta": np.abs(new - old)}))

        ranks = (contrib.union(own)
                 .map_batches(_bucketize("node", n_buckets),
                              batch_format="pyarrow")
                 .groupby("_gb").map_groups(step, batch_format="pandas")
                 .materialize())
        if ranks.sum("delta") < tol:
            break
    else:
        raise RuntimeError(
            f"pagerank: no convergence to tol={tol} in {max_iters} "
            "iterations")
    return ranks.drop_columns(["outd", "delta"])
