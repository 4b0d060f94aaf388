"""Distributed connected components over an edge Dataset.

Iterated min-label propagation (the classic MapReduce CC family —
Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC'14; Rastogi et al., "Finding Connected Components in MapReduce",
ICDE'13 — public algorithms): every node repeatedly adopts the minimum
label in its closed neighborhood until a fixpoint; the fixpoint label
is the component's minimum node id.

Everything is a Dataset — labels and edges live in the object store,
never on the driver (the scale upgrade over ``_unionfind_pairs``,
whose pair-frame is driver-resident). Per round:

1. propagate: ``bucket_hash_join`` (symmetric edges ⋈ labels on src)
   ships each node's current label to its neighbors;
2. resolve: union with the nodes' own labels, one bucketed
   vectorized min per node — emitting an exact per-row ``changed``
   flag (new < old);
3. converge: ``sum(changed) == 0`` — an exact small aggregate, not a
   checksum heuristic.

Round count = graph diameter + 1 for pure min propagation. For the
near-dup graphs this engine feeds it (LSH cliques and the
>256-docs-per-key star caps), diameter is a small constant; for
pathological high-diameter graphs (chains), POINTER DOUBLING engages
adaptively: after ``shortcut_after`` unconverged rounds, every
propagation round is followed by a shortcut round ``label(v) ←
label(label(v))`` (one self-join of the label table — valid because
labels are always node ids of the same component, monotonically
non-increasing, so shortcutting preserves the invariant and halves
pointer-chain depth), giving O(log n) total rounds. Convergence is
still decided only by the propagation round's exact changed-count, so
the fixpoint test is unchanged. Small-diameter graphs converge before
the escalation triggers and never pay the extra join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .hashing import append_bucket


def _bucketize(col: str, n_buckets: int):
    return append_bucket(col, n_buckets, name="_cb")


def _shortcut_round(labels, n_buckets: int):
    """Pointer doubling: ``label(v) ← label(label(v))``. Every label
    value is itself a node of the table (labels start as node ids and
    only ever adopt other nodes' ids), so the pointer lookup is an
    inner self-join that loses no rows."""
    from .blocks import df_arrow
    from .joins import bucket_hash_join

    ptr = labels.map_batches(
        lambda b: pa.table({"_k": b["node"], "plabel": b["label"]}),
        batch_format="pyarrow")
    hang = labels.map_batches(
        lambda b: pa.table({"_k": b["label"], "node": b["node"]}),
        batch_format="pyarrow")
    return bucket_hash_join(
        hang, ptr, on="_k", n_buckets=n_buckets,
        columns_left=["_k", "node"], columns_right=["_k", "plabel"],
        post=lambda j: df_arrow(pd.DataFrame({
            "node": j["node"].to_numpy(),
            "label": j["plabel"].to_numpy()})))


def connected_components(edges, col_a: str, col_b: str, *,
                         n_buckets: int = 32, max_iters: int = 64,
                         shortcut_after: int = 4):
    """→ Dataset ``(node, label)`` for every distinct endpoint of
    ``edges``; ``label`` = min node id of the node's component.
    Deterministic; raises if ``max_iters`` rounds don't converge.
    ``shortcut_after``: propagation rounds before pointer doubling
    engages (see module docstring); ``None`` disables the escalation."""
    from .joins import bucket_hash_join

    def sym(b: pa.Table) -> pa.Table:
        a = b[col_a].to_numpy(zero_copy_only=False).astype(np.int64)
        c = b[col_b].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"src": pa.array(np.concatenate([a, c]), pa.int64()),
                         "dst": pa.array(np.concatenate([c, a]), pa.int64())})

    # materialize once: the edge set is reused every round
    sym_edges = edges.map_batches(sym, batch_format="pyarrow").materialize()
    if sym_edges.count() == 0:       # no edges → no labeled nodes
        import ray.data as rd

        return rd.from_arrow(pa.table({"node": pa.array([], pa.int64()),
                                       "label": pa.array([], pa.int64())}))

    def init_nodes(g: pd.DataFrame) -> pd.DataFrame:
        u = np.unique(g["src"].to_numpy())
        return pd.DataFrame({"node": u, "label": u,
                             "changed": np.zeros(len(u), np.int8)})

    labels = (sym_edges
              .map_batches(_bucketize("src", n_buckets),
                           batch_format="pyarrow")
              .groupby("_cb").map_groups(init_nodes, batch_format="pandas")
              .materialize())

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        # rows: own labels (is_own=1) ∪ propagated neighbor labels
        node = g["node"].to_numpy()
        lab = g["label"].to_numpy()
        own = g["is_own"].to_numpy().astype(bool)
        order = np.argsort(node, kind="mergesort")
        node, lab, own = node[order], lab[order], own[order]
        brk = np.r_[True, node[1:] != node[:-1]]
        seg = np.flatnonzero(brk)
        new = np.minimum.reduceat(lab, seg)
        # every node has exactly one own row (labels carry all nodes)
        old = lab[own]
        old_nodes = node[own]
        # own rows are already node-sorted within the bucket
        assert len(old) == len(seg), "labels must cover every node"
        from .blocks import df_arrow

        return df_arrow(pd.DataFrame({
            "node": old_nodes,
            "label": new,
            "changed": (new < old).astype(np.int8)}))

    def as_src(b: pa.Table) -> pa.Table:
        return pa.table({"src": b["node"], "label": b["label"]})

    for round_no in range(max_iters):
        prop = bucket_hash_join(
            sym_edges, labels.map_batches(as_src, batch_format="pyarrow"),
            on="src", n_buckets=n_buckets,
            columns_left=["src", "dst"], columns_right=["src", "label"],
            post=lambda j: j[["dst", "label"]].rename(
                columns={"dst": "node"}).assign(is_own=np.int8(0)))
        own = labels.map_batches(
            lambda b: pa.table({
                "node": b["node"], "label": b["label"],
                "is_own": pa.array(np.ones(b.num_rows, np.int8), pa.int8())}),
            batch_format="pyarrow")
        # prop's blocks are pandas-origin (the join's pandas post), own's
        # are Arrow: normalize before the union so the union is
        # format-uniform and the groupby sort sees hashable schemas
        from .blocks import as_arrow

        labels = (as_arrow(prop).union(own)
                  .map_batches(_bucketize("node", n_buckets),
                               batch_format="pyarrow")
                  .groupby("_cb").map_groups(resolve, batch_format="pandas")
                  .materialize())
        # sum() is None on an empty dataset (no edges → no nodes)
        if not labels.sum("changed"):
            break
        if shortcut_after is not None and round_no + 1 >= shortcut_after:
            labels = _shortcut_round(
                labels.drop_columns(["changed"]), n_buckets).materialize()
            # convergence stays decided by the NEXT propagation round
    else:
        raise RuntimeError(
            f"connected_components: no fixpoint after {max_iters} rounds "
            "(raise max_iters; with pointer doubling engaged this needs "
            "a component of diameter ≫ 2^max_iters)")
    return labels.drop_columns(["changed"])


def attach_group_sizes(comp, *, n_buckets: int = 32):
    """``(node, label)`` → ``(node, label, group_size)``: bucket by
    label — a bucket holds EVERY member of its labels, so the size is
    one vectorized transform per bucket."""
    def sizes(g: pd.DataFrame) -> pd.DataFrame:
        out = g[["node", "label"]].copy()
        out["group_size"] = g.groupby("label")["node"].transform("size") \
            .to_numpy().astype(np.int64)
        return out

    return (comp.map_batches(_bucketize("label", n_buckets),
                             batch_format="pyarrow")
            .groupby("_cb").map_groups(sizes, batch_format="pandas"))


def label_table(ds, id_col: str, comp, *, n_buckets: int = 32):
    """Label EVERY row of ``ds`` with its component: members get their
    component's ``(group_id, group_size)``, everything else is its own
    singleton. Pure int64 throughout — a pandas left join would widen
    the label column to float64 on the unmatched rows and corrupt ids
    above 2^53, so this uses a union + per-bucket first-wins instead:
    one shuffle, no NaN ever materialized."""
    sized = attach_group_sizes(comp, n_buckets=n_buckets)

    def as_member(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table({
            id_col: b["node"],
            "group_id": b["label"],
            "group_size": b["group_size"],
            "_tag": pa.array(np.ones(n, np.int8), pa.int8())})

    def as_singleton(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table({
            id_col: b[id_col],
            "group_id": b[id_col],
            "group_size": pa.array(np.ones(n, np.int64), pa.int64()),
            "_tag": pa.array(np.zeros(n, np.int8), pa.int8())})

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        # member row (tag=1) wins over the singleton row (tag=0)
        g = g.sort_values([id_col, "_tag"], ascending=[True, False],
                          kind="mergesort")
        g = g.drop_duplicates(id_col, keep="first")
        ids = g[id_col].to_numpy()
        lab = g["group_id"].to_numpy()
        return pd.DataFrame({
            id_col: ids, "group_id": lab,
            "group_size": g["group_size"].to_numpy(),
            "is_representative": lab == ids})

    members = sized.map_batches(as_member, batch_format="pyarrow")
    singles = ds.map_batches(as_singleton, batch_format="pyarrow")
    return (members.union(singles)
            .map_batches(_bucketize(id_col, n_buckets),
                         batch_format="pyarrow")
            .groupby("_cb").map_groups(pick, batch_format="pandas")
            .sort(id_col))
