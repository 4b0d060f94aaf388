"""Mirror of the driver's correctness gate: run every queries() entry and
compare against its oracle_sql() via DuckDB (row count + schema + sorted
values). Runs at sf0.001 for speed; the driver runs sf0.01."""

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")
    return con.sql(sql).df()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns/rows; round floats. Deliberately does NOT cast ints —
    an integer column that widened to float64 through a join (null
    padding) must FAIL here, mirroring the driver's value-hash gate."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c])
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def _queries():
    import __ray_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    return [(name, q[name], o[name]) for name in sorted(o)]


@pytest.mark.parametrize("name", [n for n, _, _ in _queries()])
def test_query_vs_oracle(name, ray_session):
    import __ray_entry__ as e

    fn = e.queries()[name]
    sql = e.oracle_sql()[name]
    got = _normalize(_to_pandas(fn(SF_DIR)))
    want = _normalize(_duck(sql))
    assert list(got.columns) == list(want.columns), \
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    assert len(got) == len(want), f"{name}: {len(got)} rows != {len(want)}"
    for c in got.columns:
        # int32 vs int64 is fine; int vs FLOAT is the q10-class dtype bug
        assert (pd.api.types.is_float_dtype(got[c])
                == pd.api.types.is_float_dtype(want[c])), \
            f"{name}.{c}: dtype kind {got[c].dtype} != {want[c].dtype}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=False, rtol=1e-6, atol=1e-6)


def test_distinct_mktsegments_library_oracle(ray_session):
    """distinct_mktsegments left the 50-entry driver surface (swapped
    for duplicate_spans — see __ray_entry__.queries) but stays a
    library operator; pin it against its SQL here."""
    from olx_ray.pipelines import relational

    got = _normalize(_to_pandas(relational.distinct_mktsegments(SF_DIR)))
    want = _normalize(_duck(relational.DISTINCT_SEGMENTS_SQL))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_rows_only_queries_run(ray_session):
    """Entries without an oracle must at least run and return rows with a
    stable schema."""
    import __ray_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    for name in sorted(set(q) - set(o)):
        res = _to_pandas(q[name](SF_DIR))
        assert len(res.columns) > 0, name
        assert len(res) >= 0, name


def test_entry_smoke(ray_session):
    import __ray_entry__ as e

    df = _to_pandas(e.entry())
    assert len(df) > 0 and "sum_qty" in df.columns


def test_union_distinct_keys_empty_inputs(ray_session, tmp_path):
    """Empty inputs must still produce the single n_distinct=0 row the
    SQL oracle returns unconditionally."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from olx_ray.pipelines.relational import union_distinct_keys

    pq.write_table(pa.table({"c_custkey": pa.array([], pa.int64())}),
                   str(tmp_path / "customer.parquet"))
    pq.write_table(pa.table({"s_suppkey": pa.array([], pa.int64())}),
                   str(tmp_path / "supplier.parquet"))
    out = union_distinct_keys(str(tmp_path)).to_pandas()
    assert len(out) == 1 and out["n_distinct"].iloc[0] == 0


def test_part_type_volume_library_oracle(ray_session):
    """part_type_volume left the 50-entry driver surface (swapped for
    ngram_jaccard_pairs — see __ray_entry__.queries) but stays a
    library operator; pin it against its SQL here."""
    from olx_ray.pipelines import relational

    got = _normalize(_to_pandas(relational.part_type_volume(SF_DIR)))
    want = _normalize(_duck(relational.PART_TYPE_SQL))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_avg_rounding_half_away_tie(ray_session, tmp_path):
    """An average landing exactly on a scaled .5 tie (total 0.01 over
    2 events → 0.005) must round like DuckDB (half-away → 0.01), not
    numpy half-even (→ 0.00). Regression for the review finding."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from olx_ray.pipelines.events import events_by_type

    t = pa.table({
        "event_type": ["x", "x", "y"],
        "value": pa.array([0.0, 0.01, 2.675], pa.float64()),
        "ts": pa.array([pd.Timestamp("2024-01-01")] * 3),
        "user_id": pa.array([1, 2, 3], pa.int64()),
        "event_id": pa.array([1, 2, 3], pa.int64())})
    d = tmp_path / "sf_tie"
    d.mkdir()
    pq.write_table(t, str(d / "events.parquet"))
    got = events_by_type(str(d)).to_pandas().set_index("event_type")
    assert got.loc["x", "avg_value"] == 0.01     # half-away, not 0.0
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{d}/events.parquet')")
    from olx_ray.pipelines.events import EVENTS_BY_TYPE_SQL

    want = con.execute(EVENTS_BY_TYPE_SQL).df().set_index("event_type")
    for et in ("x", "y"):
        assert got.loc[et, "avg_value"] == want.loc[et, "avg_value"], et
        assert got.loc[et, "total_value"] == want.loc[et, "total_value"]


def test_money_helpers_vectorized_matches_exact():
    """units_to_currency's int64 fast path == the Python-int path
    (incl. negatives); round_half_away pins the documented tie."""
    import numpy as np

    from olx_ray.functions.money import round_half_away, units_to_currency

    rng = np.random.default_rng(9)
    v = rng.integers(-10**12, 10**12, 2000)
    v = np.r_[v, [50, -50, 149, -149, 150, -150, 0]]
    fast = units_to_currency(v, 4)
    slow = units_to_currency([int(x) for x in v], 4)
    np.testing.assert_array_equal(fast, slow)
    assert round_half_away(0.005) == 0.01        # np.round gives 0.0
    assert round_half_away(-0.005) == -0.01
    assert round_half_away(2.675) == 2.68


def test_round_half_away_bit_identical_to_duckdb():
    """The money.round_half_away ≡ DuckDB round(DOUBLE, 2) claim,
    pinned over the adversarial set: every k/200 tie (scaled-.5
    doubles), negatives, large magnitudes, and random values."""
    import duckdb
    import numpy as np

    from olx_ray.functions.money import round_half_away

    rng = np.random.default_rng(3)
    vals = np.concatenate([
        np.arange(1, 2000, 2) / 200.0,
        -(np.arange(1, 500, 2) / 200.0),
        rng.random(1000) * 100,
        [30158055.965, 0.005, 2.675, -2.675, 0.0]])
    got = round_half_away(vals)
    con = duckdb.connect()
    con.execute("CREATE TABLE v AS SELECT * FROM "
                "(SELECT unnest(?::DOUBLE[]) AS x)",
                [list(map(float, vals))])
    want = con.execute("SELECT round(x, 2) FROM v").df().iloc[:, 0] \
        .to_numpy()
    np.testing.assert_array_equal(got, want)
