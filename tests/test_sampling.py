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
