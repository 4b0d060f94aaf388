"""sampling.py — deterministic bottom-k reservoir, approx quantiles,
exact per-group top-k (DuckDB window oracle)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

SF = "/root/testdata/sf0.001"


def _events():
    import ray.data as rd

    return rd.read_parquet(f"{SF}/events.parquet",
                           columns=["event_id", "user_id", "value"])


def test_reservoir_sample_deterministic_and_partition_invariant(ray_session):
    import ray

    from olx_ray.pipelines.sampling import reservoir_sample

    n = 5000
    df = pd.DataFrame({"id": np.arange(n, dtype=np.int64),
                       "payload": np.arange(n) * 2.5})
    t = pa.Table.from_pandas(df)
    a = reservoir_sample(ray.data.from_arrow(t), "id", 200, seed=1) \
        .to_pandas()
    b = reservoir_sample(ray.data.from_arrow(t).repartition(13), "id", 200,
                         seed=1, fan_in=5).to_pandas()
    assert len(a) == 200 and a.equals(b)       # pure function of (ids,k,seed)
    assert a["id"].is_unique and a["payload"].equals(a["id"] * 2.5)
    c = reservoir_sample(ray.data.from_arrow(t), "id", 200, seed=2) \
        .to_pandas()
    assert set(c["id"]) != set(a["id"])        # seed actually reseeds
    # uniformity: sample mean of id within 4σ of population mean
    sigma = n / np.sqrt(12 * 200)
    assert abs(a["id"].mean() - n / 2) < 4 * sigma
    # prefix property: first 50 rows == the k=50 sample (bottom-k nesting)
    d = reservoir_sample(ray.data.from_arrow(t), "id", 50, seed=1).to_pandas()
    assert d.equals(a.head(50).reset_index(drop=True))


def test_approx_quantiles_rank_error(ray_session):
    from olx_ray.pipelines.sampling import event_value_quantiles

    qs = (0.1, 0.5, 0.9, 0.99)
    got = event_value_quantiles(SF, qs=qs, sample_size=2048)
    vals = pd.read_parquet(f"{SF}/events.parquet", columns=["value"])[
        "value"].dropna().to_numpy()
    for q, est in zip(got["q"], got["value"]):
        rank = (vals <= est).mean()
        assert abs(rank - q) < 0.06, (q, est, rank)   # DKW @ n=2048 ≈ 0.03


def test_approx_quantiles_exact_when_sample_covers(ray_session):
    """sample_size ≥ N ⇒ the 'sample' is the whole column and the
    quantiles are exact."""
    import ray

    from olx_ray.pipelines.sampling import approx_quantiles

    rng = np.random.default_rng(5)
    df = pd.DataFrame({"id": np.arange(1000, dtype=np.int64),
                       "v": rng.normal(size=1000)})
    df.loc[3, "v"] = np.nan                    # ignored like quantile_cont
    got = approx_quantiles(ray.data.from_arrow(pa.Table.from_pandas(df)),
                           "v", "id", [0.25, 0.5, 0.75], sample_size=5000)
    want = np.quantile(df["v"].dropna().to_numpy(), [0.25, 0.5, 0.75])
    assert np.allclose(got["value"].to_numpy(), want)


def test_group_topk_vs_duckdb(ray_session):
    from olx_ray.pipelines.sampling import top_events_per_user

    got = top_events_per_user(SF, k=3).to_pandas() \
        .sort_values(["user_id", "value", "event_id"],
                     ascending=[True, False, True]) \
        .reset_index(drop=True)[["event_id", "user_id", "value"]]
    con = duckdb.connect()
    want = con.sql(
        f"SELECT event_id, user_id, value FROM ("
        f"  SELECT *, row_number() OVER (PARTITION BY user_id "
        f"    ORDER BY value DESC, event_id) AS rn "
        f"  FROM read_parquet('{SF}/events.parquet')) "
        f"WHERE rn <= 3 ORDER BY user_id, value DESC, event_id").df()[
        ["event_id", "user_id", "value"]]
    assert len(got) == len(want) > 20
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_group_topk_string_groups_and_small_groups(ray_session):
    import ray

    from olx_ray.pipelines.sampling import group_topk

    df = pd.DataFrame({
        "g": ["a", "a", "a", "b", "c", "c"],
        "v": [3.0, 1.0, 2.0, 9.0, 5.0, 5.0],
        "id": np.arange(6, dtype=np.int64),
    })
    got = group_topk(ray.data.from_arrow(pa.Table.from_pandas(df))
                     .repartition(3), "g", "v", 2, tiebreak_col="id") \
        .to_pandas().sort_values(["g", "v", "id"],
                                 ascending=[True, False, True]) \
        .reset_index(drop=True)
    # a: top2 of 3; b: the single row (k > group size); c: tie broken by id
    assert list(got["id"]) == [0, 2, 3, 4, 5]


def test_weighted_sample_overrepresents_heavy_rows(ray_session):
    import ray

    from olx_ray.pipelines.sampling import weighted_sample

    n = 20000
    df = pd.DataFrame({"id": np.arange(n, dtype=np.int64),
                       "w": np.where(np.arange(n) % 10 == 0, 10.0, 1.0)})
    ds = ray.data.from_arrow(pa.Table.from_pandas(df))
    got = weighted_sample(ds, "id", "w", 2000, seed=3).to_pandas()
    assert len(got) == 2000 and got["id"].is_unique
    heavy = (got["w"] == 10.0).mean()
    # heavy rows are 10% of the population at 10× weight → ~52.6% of
    # the sample (E-S without replacement ≈ w-share for small k/N)
    assert 0.40 < heavy < 0.65, heavy
    # determinism + partition invariance
    again = weighted_sample(ds.repartition(7), "id", "w", 2000, seed=3,
                            fan_in=4).to_pandas()
    assert got.equals(again)
    # zero-weight rows are never chosen
    df2 = df.assign(w=np.where(df["id"] < 100, 0.0, df["w"]))
    ds2 = ray.data.from_arrow(pa.Table.from_pandas(df2))
    got2 = weighted_sample(ds2, "id", "w", 500, seed=3).to_pandas()
    assert (got2["id"] >= 100).all()


def test_weighted_interleave_mixture_and_determinism(ray_session):
    import ray

    from olx_ray.pipelines.corpus import weighted_interleave

    def corp(lo, n):
        return pd.DataFrame({"doc_id": np.arange(lo, lo + n,
                                                 dtype=np.int64),
                             "text": ["x"] * n})

    web, code = corp(0, 9000), corp(100_000, 9000)
    mk = lambda df, p: ray.data.from_arrow(
        pa.Table.from_pandas(df)).repartition(p)
    out = weighted_interleave(
        {"web": (mk(web, 5), 3.0), "code": (mk(code, 3), 1.0)},
        seed=11).to_pandas()
    assert len(out) == 18000
    # any prefix matches the 3:1 target mixture in expectation
    for prefix in (1000, 4000):
        share = (out.head(prefix)["mix_source"] == "web").mean()
        assert 0.68 < share < 0.82, (prefix, share)
    # partition-invariant and deterministic
    out2 = weighted_interleave(
        {"web": (mk(web, 2), 3.0), "code": (mk(code, 8), 1.0)},
        seed=11).to_pandas()
    pd.testing.assert_frame_equal(out, out2)
    # exhaustion: a tiny source is fully present, stream continues
    tiny = corp(500_000, 50)
    out3 = weighted_interleave(
        {"big": (mk(web, 4), 1.0), "tiny": (mk(tiny, 1), 100.0)},
        seed=2).to_pandas()
    assert (out3["mix_source"] == "tiny").sum() == 50
    # at 100× weight the tiny source front-loads: nearly all of it
    # lands in the first few hundred rows of the stream
    assert (out3.head(400)["mix_source"] == "tiny").sum() >= 40
    assert (out3.tail(1000)["mix_source"] == "big").all()


def test_group_quantiles_oracle_unbounded_groups(ray_session):
    """group_quantiles == order-statistic SQL per group, on an
    unbounded key (one group per orderkey) with duplicate values."""
    import duckdb
    import ray.data as rd

    sf = "/root/testdata/sf0.001"
    ds = rd.read_parquet(f"{sf}/lineitem.parquet",
                         columns=["l_orderkey", "l_quantity"])
    from olx_ray.pipelines.sampling import group_quantiles

    got = group_quantiles(ds, "l_orderkey", "l_quantity",
                          qs=(25, 50, 90)).to_pandas() \
        .sort_values("l_orderkey").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
                f"read_parquet('{sf}/lineitem.parquet')")
    want = con.execute("""
        SELECT l_orderkey,
               max(CASE WHEN rk = ceil(0.25*n) THEN v END) AS q25,
               max(CASE WHEN rk = ceil(0.50*n) THEN v END) AS q50,
               max(CASE WHEN rk = ceil(0.90*n) THEN v END) AS q90
        FROM (SELECT l_orderkey, l_quantity AS v,
                     row_number() OVER (PARTITION BY l_orderkey
                                        ORDER BY l_quantity) AS rk,
                     count(*) OVER (PARTITION BY l_orderkey) AS n
              FROM lineitem)
        GROUP BY l_orderkey ORDER BY l_orderkey""").df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_group_quantiles_string_groups_and_dup_values(ray_session):
    import ray.data as rd
    import pyarrow as pa

    from olx_ray.pipelines.sampling import group_quantiles

    df = pd.DataFrame({
        "g": ["a"] * 5 + ["b"] * 4 + ["c"],
        "v": [3, 1, 1, 2, 9,   4, 4, 4, 4,   7]})
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)) \
        .repartition(3)
    out = group_quantiles(ds, "g", "v", qs=(50, 100)).to_pandas() \
        .sort_values("g").reset_index(drop=True)
    # a: sorted [1,1,2,3,9] → p50 = rank ceil(2.5)=3 → 2; p100 → 9
    # b: all 4s; c: single 7
    assert out.to_dict("list") == {
        "g": ["a", "b", "c"], "q50": [2, 4, 7], "q100": [9, 4, 7]}


def test_source_quota_sample_vs_duckdb(ray_session):
    import duckdb

    from olx_ray.pipelines.sampling import (SOURCE_QUOTA_SQL,
                                            source_quota_sample)

    got = source_quota_sample(SF, cap=7).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    want = duckdb.sql(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{SF}/documents.parquet'); "
        + SOURCE_QUOTA_SQL.format(cap=7)).df() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["doc_id", "source"]],
                                  want[["doc_id", "source"]],
                                  check_dtype=False)
    # the cap binds: every source holds exactly min(cap, group size)
    n_src = duckdb.sql(
        f"SELECT source, count(*) AS n FROM "
        f"read_parquet('{SF}/documents.parquet') GROUP BY source").df()
    per = got.groupby("source").size()
    for _, r in n_src.iterrows():
        assert per.get(r["source"], 0) == min(7, r["n"])


def test_source_quota_sample_partitioning_invariant(ray_session):
    """The surviving set is a pure function of the table — identical
    under different caps' subset relation and repeated runs."""
    from olx_ray.pipelines.sampling import source_quota_sample

    a = set(source_quota_sample(SF, cap=3).to_pandas()["doc_id"])
    b = set(source_quota_sample(SF, cap=3).to_pandas()["doc_id"])
    wide = set(source_quota_sample(SF, cap=10).to_pandas()["doc_id"])
    assert a == b and a <= wide


def test_score_band_filter_invariants(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from olx_ray.pipelines.sampling import approx_quantiles, score_band_filter

    rng = np.random.default_rng(11)
    vals = rng.normal(size=2000)
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(2000), pa.int64()),
        "score": pa.array(vals, pa.float64())})).repartition(8)

    kept = score_band_filter(ds, "score", 0.10, 0.90).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    # every kept value inside the cuts the same sample produced
    cuts = approx_quantiles(ds, "score", "doc_id", (0.10, 0.90))["value"]
    assert kept["score"].between(cuts.iloc[0], cuts.iloc[1]).all()
    # kept fraction ≈ band width within the DKW bound (±~2% + slack)
    assert abs(len(kept) / 2000 - 0.80) < 0.06
    # deterministic
    again = score_band_filter(ds, "score", 0.10, 0.90).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert kept.equals(again)   # the kept SET is deterministic

    # null scores never pass the band
    ds_null = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(4), pa.int64()),
        "score": pa.array([0.5, None, 0.7, None], pa.float64())}))
    out = score_band_filter(ds_null, "score", 0.0, 1.0).to_pandas()
    assert sorted(out["doc_id"]) == [0, 2]


def test_score_band_filter_all_null_and_empty(ray_session):
    """The documented only-null/empty path: approx_quantiles' sample
    collect must survive Ray 2.49's zero-row column drop (collect_pandas
    route) so the NaN-cut guard runs and yields an empty result instead
    of a KeyError."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from olx_ray.pipelines.sampling import approx_quantiles, score_band_filter

    all_null = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "score": pa.array([None, None, None], pa.float64())}))
    out = score_band_filter(all_null, "score", 0.1, 0.9).to_pandas()
    assert len(out) == 0

    empty = rd.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "score": pa.array([], pa.float64())}))
    out2 = score_band_filter(empty, "score", 0.1, 0.9).to_pandas()
    assert len(out2) == 0

    q = approx_quantiles(all_null, "score", "doc_id", (0.5,))
    assert np.isnan(q["value"]).all()


def test_group_score_band_filter_per_group_cuts(ray_session):
    """Each group keeps ITS OWN middle band: a group whose scores sit
    far above another's survives at the same rate instead of being
    wiped out by a global band."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from olx_ray.pipelines.sampling import group_score_band_filter

    rng = np.random.default_rng(5)
    n = 1000
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(2 * n), pa.int64()),
        "lang": pa.array(["lo"] * n + ["hi"] * n, pa.string()),
        # 'hi' scores are two orders of magnitude above 'lo'
        "score": pa.array(np.r_[rng.normal(0, 1, n),
                                rng.normal(100, 1, n)], pa.float64()),
    })).repartition(8)

    kept = group_score_band_filter(ds, "lang", "score", 0.10, 0.90,
                                   sample_per_group=512).to_pandas()
    frac = kept.groupby("lang").size() / n
    assert abs(frac["lo"] - 0.8) < 0.08 and abs(frac["hi"] - 0.8) < 0.08
    # per-group band: the kept 'lo' rows stay near 0, 'hi' near 100
    assert kept[kept["lang"] == "lo"]["score"].abs().max() < 10
    assert (kept[kept["lang"] == "hi"]["score"] > 90).all()

    # deterministic kept set
    again = group_score_band_filter(ds, "lang", "score", 0.10, 0.90,
                                    sample_per_group=512).to_pandas()
    assert set(kept["doc_id"]) == set(again["doc_id"])

    # null scores and unseen groups drop; empty input survives
    ds2 = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "lang": pa.array(["x", "x"], pa.string()),
        "score": pa.array([None, None], pa.float64())}))
    out = group_score_band_filter(ds2, "lang", "score").to_pandas()
    assert len(out) == 0


def test_sample_documents_pruned_two_pass(ray_session):
    """sample_documents must pick ids from a doc_id-only scan and
    return the same k-set as reservoir_sample over the full table
    (order aside — the semi-join returns block order)."""
    import ray.data as rd

    from olx_ray.pipelines.sampling import reservoir_sample, sample_documents

    SF = "/root/testdata/sf0.001"
    got = sample_documents(SF, k=25, seed=3).to_pandas()
    want = reservoir_sample(
        rd.read_parquet(f"{SF}/documents.parquet"), "doc_id", 25,
        seed=3).to_pandas()
    assert set(got["doc_id"]) == set(want["doc_id"]) and len(got) == 25
    assert "text" in got.columns        # full rows come back


def test_group_topk_per_group_cap_map(ray_session):
    """k as a {group: k} dict: per-group caps in one pass, groups
    absent from the map drop, equivalence with per-group int-k runs."""
    import ray

    from olx_ray.pipelines.sampling import group_topk

    df = pd.DataFrame({
        "g": [1, 1, 1, 1, 2, 2, 2, 3, 3],
        "v": [5.0, 4.0, 3.0, 2.0, 9.0, 8.0, 7.0, 1.0, 0.5],
        "id": np.arange(9, dtype=np.int64),
    })
    ds = ray.data.from_arrow(pa.Table.from_pandas(df)).repartition(4)
    got = group_topk(ds, "g", "v", {1: 2, 2: 1}, tiebreak_col="id") \
        .to_pandas().sort_values("id").reset_index(drop=True)
    # group 1 keeps its top-2, group 2 its top-1, group 3 (absent) drops
    assert list(got["id"]) == [0, 1, 4]
    # equivalence with int-k per group
    for g, k in {1: 2, 2: 1}.items():
        sub = group_topk(ds.filter(expr=f"g == {g}"), "g", "v", k,
                         tiebreak_col="id").to_pandas()
        assert set(sub["id"]) == set(got.loc[got["g"] == g, "id"])
    # ascending order works with the map too (the crawl's shape)
    asc = group_topk(ds, "g", "v", {1: 1, 3: 1}, descending=False,
                     tiebreak_col="id").to_pandas()
    assert set(asc["id"]) == {3, 8}


def test_cluster_balanced_sample_exact_reference(ray_session):
    """cluster_balanced_sample == in-memory reference (same centroids,
    same assignment kernel, same mix64 priorities) EXACTLY; per-cluster
    quotas hold; deterministic across runs; seed changes the pick."""
    import pyarrow.parquet as pq

    from olx_ray.functions.hashing import mix64
    from olx_ray.pipelines.sampling import cluster_balanced_sample
    from olx_ray.pipelines.similarity import _train_centroids

    cents = _train_centroids(SF, 8, 4096)
    got = cluster_balanced_sample(SF, k_per_cluster=5, n_clusters=8,
                                  cents=cents).to_pandas()

    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy().astype(np.int64)
    m = np.vstack(t["embedding"].to_pylist()).astype(np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    cl = np.einsum("ij,kj->ik", m, cents).argmax(axis=1)
    pri = mix64(ids, 0)
    ref = pd.DataFrame({"vec_id": ids, "cluster": cl, "pri": pri})
    ref = ref.sort_values(["pri", "vec_id"], kind="mergesort") \
        .groupby("cluster", sort=False).head(5)
    ref = ref.sort_values("vec_id")

    assert got["vec_id"].tolist() == ref["vec_id"].tolist()
    assert got["cluster"].tolist() == ref["cluster"].tolist()
    # quotas: every cluster contributes min(k, members) rows
    sizes = pd.Series(cl).value_counts()
    picked = got["cluster"].value_counts()
    for c, n in sizes.items():
        assert picked.get(c, 0) == min(5, n)
    # determinism + seed sensitivity
    again = cluster_balanced_sample(SF, k_per_cluster=5, n_clusters=8,
                                    cents=cents).to_pandas()
    assert got.equals(again)
    other = cluster_balanced_sample(SF, k_per_cluster=5, n_clusters=8,
                                    cents=cents, seed=7).to_pandas()
    assert got["vec_id"].tolist() != other["vec_id"].tolist()
