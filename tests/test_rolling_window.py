"""Per-event trailing time-window aggregates (rolling_user_window)
against the DuckDB RANGE-window oracle and a brute-force reference."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _oracle(con_path: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{con_path}/events.parquet')")
    return con.sql(sql).df()


def test_rolling_user_window_vs_duckdb(ray_session):
    from olx_ray.pipelines.events import ROLLING_USER_SQL, rolling_user_window

    got = rolling_user_window(SF).to_pandas().reset_index(drop=True)
    want = _oracle(SF, ROLLING_USER_SQL)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert (got["n_win"] > 1).any()          # non-degenerate on the fixture


def test_rolling_window_edges_vs_duckdb(ray_session, tmp_path):
    """Equal-timestamp peers (RANGE includes ALL peers, even those
    sorted after the current row), the row exactly at ts − window
    (included), and one-event users — pinned against DuckDB."""
    from olx_ray.pipelines.events import ROLLING_USER_SQL, rolling_user_window

    t0 = pd.Timestamp("2024-03-01 12:00:00")
    rows = [
        # user 1: peers at identical ts + an exact-boundary row
        (1, t0, 10.00), (1, t0, 20.00),               # peers see each other
        (1, t0 + pd.Timedelta(minutes=60), 1.00),     # boundary: t0 included
        (1, t0 + pd.Timedelta(minutes=61), 2.00),     # t0 now outside
        # user 2: single event
        (2, t0, 99.99),
        # user 3: events straddling several windows
        (3, t0, 5.00), (3, t0 + pd.Timedelta(minutes=30), 5.00),
        (3, t0 + pd.Timedelta(minutes=90), 5.00),
    ]
    df = pd.DataFrame(rows, columns=["user_id", "ts", "value"])
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "events.parquet"))

    got = rolling_user_window(str(tmp_path)).to_pandas() \
        .reset_index(drop=True)
    want = _oracle(str(tmp_path), ROLLING_USER_SQL)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # spot-pin the semantics the test exists for:
    by = got.set_index(["user_id", "ts"])
    assert (by.loc[(1, t0), "n_win"] == 2).all()           # peers included
    assert (by.loc[(1, t0 + pd.Timedelta(minutes=60)), "n_win"] == 3).all()
    assert (by.loc[(1, t0 + pd.Timedelta(minutes=61)), "n_win"] == 2).all()
    assert (by.loc[(2, t0), "n_win"] == 1).all()


def _brute(ts: np.ndarray, seg: np.ndarray, win: int):
    left = np.array([np.min(np.flatnonzero(
        (seg == seg[i]) & (ts >= ts[i] - win))) for i in range(len(ts))])
    right = np.array([np.max(np.flatnonzero(
        (seg == seg[i]) & (ts <= ts[i]))) + 1 for i in range(len(ts))])
    return left, right


def test_rolling_bounds_banded_and_loop_paths_match_brute_force():
    """The banded single-searchsorted kernel and the per-segment
    fallback (taken when n_seg × stride would overflow int64) both
    equal the O(n²) definition on random segmented data."""
    from olx_ray.pipelines.events import _rolling_bounds

    rng = np.random.default_rng(7)
    seg = np.sort(rng.integers(0, 40, 500))
    ts = np.empty(500, np.int64)
    start = 0
    for s in np.unique(seg):
        n = int((seg == s).sum())
        ts[start:start + n] = np.sort(rng.integers(0, 10_000, n))
        start += n
    win = 500
    bl, br = _rolling_bounds(ts, seg, win)
    el, er = _brute(ts, seg, win)
    assert (bl == el).all() and (br == er).all()

    # huge window forces the overflow guard onto the loop path
    big = 2 ** 61
    ll, lr = _rolling_bounds(ts, seg, big)
    el, er = _brute(ts, seg, big)
    assert (ll == el).all() and (lr == er).all()

    # empty input is well-defined on both paths
    e = np.empty(0, np.int64)
    assert all(len(x) == 0 for x in _rolling_bounds(e, e, win))


def test_event_transitions_vs_duckdb(ray_session):
    import duckdb

    from olx_ray.pipelines.events import (EVENT_TRANSITIONS_SQL,
                                          event_transitions)

    got = event_transitions(SF).to_pandas().reset_index(drop=True)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{SF}/events.parquet')")
    want = con.sql(EVENT_TRANSITIONS_SQL).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # row-stochastic: each prev_type's probabilities sum to 1
    sums = got.groupby("prev_type")["p"].sum()
    assert ((sums - 1.0).abs() < 1e-12).all()


def test_event_transitions_edges(ray_session, tmp_path):
    """Single-event users emit nothing; equal timestamps order by
    event_id; transitions never cross users."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from olx_ray.pipelines.events import event_transitions

    t0 = pd.Timestamp("2026-01-01")
    pq.write_table(pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "ts": pa.array([t0, t0, t0 + pd.Timedelta("1h"),
                        t0, t0 + pd.Timedelta("2h")],
                       pa.timestamp("us")),
        "user_id": pa.array([7, 7, 7, 8, 9], pa.int64()),
        "event_type": pa.array(["a", "b", "c", "solo1", "solo2"],
                               pa.string()),
        "value": pa.array([0.0] * 5, pa.float64()),
        "props": pa.array(["{}"] * 5, pa.string()),
    }), str(tmp_path / "events.parquet"))

    out = event_transitions(str(tmp_path)).to_pandas()
    # user 7: ties at t0 order by event_id → a→b, then b→c; users 8/9
    # have one event each and never pair (no solo1→solo2 cross-user row)
    assert out[["prev_type", "event_type", "n"]].to_dict("list") == {
        "prev_type": ["a", "b"], "event_type": ["b", "c"], "n": [1, 1]}
    assert list(out["p"]) == [1.0, 1.0]
