"""`range_join` (functions/joins.py) against a DuckDB BETWEEN-join
oracle, plus partitioning-invariance and edge handling."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def _mk_frames(seed=7, n_left=3000, n_right=120):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame({
        "pid": np.arange(n_left, dtype=np.int64),
        "v": np.round(rng.uniform(0, 1000, n_left), 3),
        "tag": rng.choice(["x", "y", "z"], n_left),
    })
    lo = np.round(rng.uniform(-50, 1050, n_right), 3)
    width = rng.choice([0.0, 0.5, 5, 40, 300], n_right)
    right = pd.DataFrame({
        "iid": np.arange(n_right, dtype=np.int64),
        "lo": lo,
        "hi": np.round(lo + width, 3),
        "label": rng.choice(["a", "b"], n_right),
    })
    # degenerate rows: reversed interval (never matches), exact-boundary
    # interval around an existing point, NaN rows on both sides
    right.loc[0, ["lo", "hi"]] = [500.0, 400.0]
    right.loc[1, ["lo", "hi"]] = [left["v"].iloc[5]] * 2
    right.loc[2, "lo"] = np.nan
    left.loc[0, "v"] = np.nan
    return left, right


def _oracle(left, right):
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    return con.sql(
        "SELECT l.pid, l.v, l.tag, r.iid, r.lo, r.hi, r.label "
        "FROM l JOIN r ON l.v BETWEEN r.lo AND r.hi "
        "ORDER BY pid, iid").df()


def _sorted(df):
    return df.sort_values(["pid", "iid"], kind="mergesort") \
        .reset_index(drop=True)[["pid", "v", "tag", "iid", "lo", "hi",
                                 "label"]]


def test_range_join_vs_duckdb(ray_session):
    import ray

    from olx_ray.functions.joins import range_join

    left, right = _mk_frames()
    got = range_join(
        ray.data.from_arrow(pa.Table.from_pandas(left)).repartition(6),
        ray.data.from_arrow(pa.Table.from_pandas(right)).repartition(3),
        "v", "lo", "hi", n_chunks=8).to_pandas()
    want = _oracle(left, right)
    assert len(got) == len(want) > 1000
    pd.testing.assert_frame_equal(_sorted(got), _sorted(want),
                                  check_dtype=False)


def test_range_join_chunk_invariance(ray_session):
    """Output is identical for any chunking — explicit cuts, one chunk,
    many chunks (cuts steer partitioning only)."""
    import ray

    from olx_ray.functions.joins import range_join

    left, right = _mk_frames(seed=11, n_left=800, n_right=40)
    l = ray.data.from_arrow(pa.Table.from_pandas(left))
    r = ray.data.from_arrow(pa.Table.from_pandas(right))
    base = _sorted(range_join(l, r, "v", "lo", "hi", n_chunks=16)
                   .to_pandas())
    for kwargs in ({"n_chunks": 1}, {"cuts": [250.0, 500.0, 750.0]},
                   {"cuts": []}):
        other = _sorted(range_join(l, r, "v", "lo", "hi", **kwargs)
                        .to_pandas())
        pd.testing.assert_frame_equal(other, base, check_dtype=False)


def test_range_join_name_collision_and_projection(ray_session):
    import ray

    from olx_ray.functions.joins import range_join

    left = pd.DataFrame({"v": [1.0, 5.0, 9.0], "label": ["p", "q", "r"]})
    right = pd.DataFrame({"lo": [0.0, 4.0], "hi": [6.0, 20.0],
                          "label": ["A", "B"], "junk": [0, 1]})
    got = range_join(
        ray.data.from_arrow(pa.Table.from_pandas(left)),
        ray.data.from_arrow(pa.Table.from_pandas(right)),
        "v", "lo", "hi", n_chunks=2,
        columns_right=["lo", "hi", "label"]).to_pandas()
    assert set(got.columns) == {"v", "label", "lo", "hi", "label_r"}
    got = got.sort_values(["v", "lo"]).reset_index(drop=True)
    # v=1 ∈ [0,6]; v=5 ∈ [0,6] and [4,20]; v=9 ∈ [4,20]
    assert list(got["v"]) == [1.0, 5.0, 5.0, 9.0]
    assert list(got["label"]) == ["p", "q", "q", "r"]
    assert list(got["label_r"]) == ["A", "A", "B", "B"]
    with pytest.raises(ValueError):
        range_join(ray.data.from_arrow(pa.Table.from_pandas(left)),
                   ray.data.from_arrow(pa.Table.from_pandas(right)),
                   "v", "lo", "hi", columns_right=["label"])


def test_range_join_price_bands_on_lineitem(ray_session):
    """Real-table use: classify lineitem rows into price bands and
    aggregate — checked against DuckDB on the same parquet."""
    import ray

    from olx_ray.functions.joins import range_join

    bands = pd.DataFrame({
        "band": ["low", "mid", "high"],
        "lo": [0.0, 10_000.0, 40_000.0],
        "hi": [9_999.99, 39_999.99, 10_000_000.0],
    })
    li = ray.data.read_parquet(f"{SF}/lineitem.parquet",
                               columns=["l_extendedprice"])
    got = (range_join(li, ray.data.from_arrow(pa.Table.from_pandas(bands)),
                      "l_extendedprice", "lo", "hi", n_chunks=8)
           .to_pandas().groupby("band", as_index=False)
           .agg(n=("band", "size"), total=("l_extendedprice", "sum")))
    got["total"] = got["total"].round(2)
    con = duckdb.connect()
    con.register("bands", bands)
    want = con.sql(
        f"SELECT band, count(*)::BIGINT AS n, "
        f"round(sum(l_extendedprice), 2) AS total "
        f"FROM read_parquet('{SF}/lineitem.parquet') l JOIN bands b "
        f"ON l.l_extendedprice BETWEEN b.lo AND b.hi "
        f"GROUP BY band ORDER BY band").df()
    got = got.sort_values("band").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
