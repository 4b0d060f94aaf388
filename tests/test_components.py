"""functions/components.py — distributed connected components:
exact labels on synthetic graphs, convergence on chains, the
max_iters guard, and strategy agreement (distributed label
propagation == driver union-find) on the fixture group operators."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def _cc(edges_df: pd.DataFrame, **kw) -> dict[int, int]:
    import ray.data as rd

    from olx_ray.functions.components import connected_components

    ds = rd.from_arrow(pa.Table.from_pandas(edges_df))
    out = connected_components(ds, "a", "b", **kw).to_pandas()
    return dict(zip(out["node"], out["label"]))


def test_cc_exact_labels_on_synthetic_graphs(ray_session):
    # two components: a 6-chain (diameter 5 → several rounds) and a
    # star, plus a disconnected pair; labels = component min
    edges = pd.DataFrame({
        "a": [10, 11, 12, 13, 14,   50, 50, 50,   7],
        "b": [11, 12, 13, 14, 15,   51, 52, 53,   8]})
    lab = _cc(edges)
    assert {lab[n] for n in (10, 11, 12, 13, 14, 15)} == {10}
    assert {lab[n] for n in (50, 51, 52, 53)} == {50}
    assert lab[7] == 7 and lab[8] == 7
    assert len(lab) == 12                     # every endpoint labeled


def test_cc_partition_invariance_and_duplicate_edges(ray_session):
    import ray.data as rd

    from olx_ray.functions.components import connected_components

    rng = np.random.default_rng(7)
    # random forest of small components with duplicate + reversed edges
    a = rng.integers(0, 200, 300).astype(np.int64)
    b = a + rng.integers(1, 4, 300).astype(np.int64)
    edges = pd.DataFrame({"a": np.r_[a, b], "b": np.r_[b, a]})
    ds1 = rd.from_arrow(pa.Table.from_pandas(edges))
    ds2 = rd.from_arrow(pa.Table.from_pandas(edges)).repartition(11)
    l1 = connected_components(ds1, "a", "b").to_pandas()
    l2 = connected_components(ds2, "a", "b", n_buckets=8).to_pandas()
    assert l1.sort_values("node").reset_index(drop=True).equals(
        l2.sort_values("node").reset_index(drop=True))
    # oracle: scipy-free union-find reference
    from olx_ray.pipelines.dedup import _unionfind_pairs

    g_of, _ = _unionfind_pairs(edges, "a", "b")
    got = dict(zip(l1["node"], l1["label"]))
    for n, lab in got.items():
        assert lab == g_of.get(n, n)


def test_cc_max_iters_guard(ray_session):
    edges = pd.DataFrame({"a": [1, 2, 3, 4, 5, 6, 7, 8],
                          "b": [2, 3, 4, 5, 6, 7, 8, 9]})
    with pytest.raises(RuntimeError, match="no fixpoint"):
        _cc(edges, max_iters=2)


def test_cc_pointer_doubling_on_long_chain(ray_session):
    """A 200-node path has diameter 199: pure min propagation needs
    ~200 rounds, pointer doubling O(log n). Within a 20-round budget
    the default (adaptive doubling) must converge with exact labels
    while the propagation-only mode must hit the guard."""
    n = 200
    chain = pd.DataFrame({"a": np.arange(1, n, dtype=np.int64),
                          "b": np.arange(2, n + 1, dtype=np.int64)})
    lab = _cc(chain, max_iters=20)
    assert len(lab) == n and set(lab.values()) == {1}
    with pytest.raises(RuntimeError, match="no fixpoint"):
        _cc(chain, max_iters=20, shortcut_after=None)


def test_label_table_singletons_and_members(ray_session):
    import ray.data as rd

    from olx_ray.functions.components import (connected_components,
                                              label_table)

    edges = pd.DataFrame({"a": [100, 100], "b": [101, 102]})
    comp = connected_components(
        rd.from_arrow(pa.Table.from_pandas(edges)), "a", "b")
    ids = pd.DataFrame({"id": np.arange(98, 105, dtype=np.int64)})
    out = label_table(rd.from_arrow(pa.Table.from_pandas(ids)), "id",
                      comp).to_pandas()
    assert list(out["id"]) == list(range(98, 105))
    member = out.set_index("id")
    for i in (100, 101, 102):
        assert member.loc[i, "group_id"] == 100
        assert member.loc[i, "group_size"] == 3
    for i in (98, 99, 103, 104):
        assert member.loc[i, "group_id"] == i
        assert member.loc[i, "group_size"] == 1
    assert member["is_representative"].equals(
        member["group_id"] == member.index.to_series())


def test_group_strategies_agree_on_fixtures(ray_session):
    from olx_ray.pipelines.dedup import (dedup_keep_representatives,
                                         neardup_groups,
                                         neardup_groups_embedding)

    for fn in (neardup_groups, neardup_groups_embedding,
               dedup_keep_representatives):
        dist = fn(SF, strategy="distributed").to_pandas()
        drv = fn(SF, strategy="driver").to_pandas()
        assert dist.reset_index(drop=True).equals(
            drv.reset_index(drop=True)), fn.__name__


def test_events_unique_users_hourly_vs_duckdb(ray_session):
    import duckdb
    import pandas as pd

    from olx_ray.pipelines.events import (EVENTS_UNIQUE_USERS_SQL,
                                          events_unique_users_hourly)

    sf = "/root/testdata/sf0.001"
    got = events_unique_users_hourly(sf).to_pandas().reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf}/events.parquet')")
    want = con.sql(EVENTS_UNIQUE_USERS_SQL).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert (got["n_users"] >= 1).all() and len(got) > 10
