"""Library-only text operators (not on the 50-entry driver surface)
against their own DuckDB oracles."""

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_repetition_stats_vs_duckdb(ray_session):
    from olx_ray.pipelines.text import REPETITION_STATS_SQL, repetition_stats

    got = repetition_stats(SF).to_pandas().reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    want = con.sql(REPETITION_STATS_SQL).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=False, rtol=1e-6)
    # the signal is non-degenerate on the fixture corpus
    assert (got["dup_token_ratio"] > 0).any()
    assert (got["top_2gram_ratio"] > 0).any()


def test_repetition_stats_edges(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from olx_ray.pipelines.text import repetition_stats

    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(["", "one", "a a a a", "x y x y x y"], pa.string()),
    })
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    out = repetition_stats(str(tmp_path)).to_pandas().set_index("doc_id")
    assert out.loc[1, "n_tokens"] == 0 and out.loc[1, "dup_token_ratio"] == 0
    assert out.loc[2, "top_2gram_ratio"] == 0          # no bigram
    assert out.loc[3, "dup_token_ratio"] == 0.75       # 1 distinct of 4
    assert out.loc[3, "top_2gram_ratio"] == 1.0        # (a,a) every time
    assert abs(out.loc[4, "top_2gram_ratio"] - 3 / 5) < 1e-9
