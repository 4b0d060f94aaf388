"""pipelines/graph.py — distributed PageRank: convergence to the
dense-numpy power-iteration reference (same update rule), mass
conservation, dangling handling, and the guard."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _edges_ds(df: pd.DataFrame):
    import ray.data as rd

    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)) \
        .repartition(4)


def _reference(edges: pd.DataFrame, damping=0.85, iters=200):
    nodes = np.unique(np.r_[edges["src"].to_numpy(),
                            edges["dst"].to_numpy()])
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    outd = np.zeros(n)
    for s in edges["src"]:
        outd[idx[s]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        contrib = np.zeros(n)
        rr = r / np.maximum(outd, 1)
        for s, d in zip(edges["src"], edges["dst"]):
            contrib[idx[d]] += rr[idx[s]]
        dangling = r[outd == 0].sum()
        r = (1 - damping) / n + damping * (contrib + dangling / n)
    return dict(zip(nodes, r))


@pytest.fixture()
def graph():
    rng = np.random.default_rng(5)
    # a hub, a cycle, dangling sinks, and random noise edges
    src = np.r_[np.zeros(10, np.int64),             # hub 0 → 1..10
                np.arange(20, 25),                  # cycle 20..25
                rng.integers(0, 30, 40)]
    dst = np.r_[np.arange(1, 11),
                np.r_[np.arange(21, 25), 20],
                rng.integers(0, 35, 40)]            # 30..34 dangling-ish
    return pd.DataFrame({"src": src.astype(np.int64),
                         "dst": dst.astype(np.int64)})


def test_pagerank_matches_dense_reference(ray_session, graph):
    from olx_ray.pipelines.graph import pagerank

    out = pagerank(_edges_ds(graph), tol=1e-9, n_buckets=8).to_pandas()
    want = _reference(graph)
    assert len(out) == len(want)
    got = dict(zip(out["node"], out["rank"]))
    for node, r in want.items():
        assert abs(got[node] - r) < 1e-7, node
    assert abs(out["rank"].sum() - 1.0) < 1e-8      # mass conserved


def test_pagerank_pure_dangling_and_empty(ray_session):
    from olx_ray.pipelines.graph import pagerank

    # single edge → one source, one sink (dangling)
    one = pd.DataFrame({"src": [1], "dst": [2]})
    out = pagerank(_edges_ds(one), tol=1e-10, n_buckets=4).to_pandas()
    want = _reference(one, iters=500)
    for node, r in want.items():
        got = float(out.loc[out["node"] == node, "rank"].iloc[0])
        assert abs(got - r) < 1e-8
    empty = pd.DataFrame({"src": pd.array([], dtype="int64"),
                          "dst": pd.array([], dtype="int64")})
    assert pagerank(_edges_ds(empty), n_buckets=4).count() == 0


def test_pagerank_max_iters_guard(ray_session, graph):
    from olx_ray.pipelines.graph import pagerank

    with pytest.raises(RuntimeError, match="no convergence"):
        pagerank(_edges_ds(graph), tol=1e-15, max_iters=2, n_buckets=4)
