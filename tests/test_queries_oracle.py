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
