"""Stream-shaped pipelines over the ``events`` table.

Ray Data is a (streaming-)batch engine with no event-time watermarks;
windows are expressed as grouped computation over an ordered,
partitioned log (ray_guide "Streaming-shaped workloads"): partition by
key, sort by ts inside the group, window with pandas. The ordering
assumption (events of one key fit one group task) is stated per
function."""

from __future__ import annotations

import pandas as pd
import ray.data as rd
from ray.data.aggregate import Count, Max, Mean, Min, Sum


def _round2(cols):
    def fn(b: pd.DataFrame) -> pd.DataFrame:
        for c in cols:
            b[c] = b[c].round(2)
        return b
    return fn


def _read(sf_dir: str, columns=None):
    return rd.read_parquet(f"{sf_dir}/events.parquet", columns=columns)


def events_by_type(sf_dir: str):
    return (_read(sf_dir, ["event_type", "value"])
            .groupby("event_type")
            .aggregate(Count(alias_name="n"),
                       Sum("value", alias_name="total_value"),
                       Mean("value", alias_name="avg_value"),
                       Min("value", alias_name="min_value"),
                       Max("value", alias_name="max_value"))
            .map_batches(_round2(["total_value", "avg_value"]),
                         batch_format="pandas")
            .sort("event_type"))


EVENTS_BY_TYPE_SQL = """
SELECT event_type, count(*) AS n, round(sum(value), 2) AS total_value,
       round(avg(value), 2) AS avg_value, min(value) AS min_value,
       max(value) AS max_value
FROM events GROUP BY event_type ORDER BY event_type
"""


def events_tumbling_hourly(sf_dir: str):
    """Tumbling 1-hour window per event_type: window start = floor(ts)
    computed vectorized per batch (a combiner-style partial groupby per
    batch, then the small final groupby)."""

    def bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["window_start"] = b["ts"].dt.floor("h")
        g = b.groupby(["event_type", "window_start"], as_index=False).agg(
            n=("value", "size"), total_value=("value", "sum"))
        return g

    return (_read(sf_dir, ["ts", "event_type", "value"])
            .map_batches(bucket, batch_format="pandas", batch_size=65536)
            .groupby(["event_type", "window_start"])
            .aggregate(Sum("n", alias_name="n"),
                       Sum("total_value", alias_name="total_value"))
            .map_batches(_round2(["total_value"]), batch_format="pandas")
            .sort(["event_type", "window_start"]))


EVENTS_TUMBLING_SQL = """
SELECT event_type, date_trunc('hour', ts) AS window_start,
       count(*) AS n, round(sum(value), 2) AS total_value
FROM events GROUP BY event_type, date_trunc('hour', ts)
ORDER BY event_type, window_start
"""


def sessionize(sf_dir: str, gap_minutes: int = 30):
    """Session windows per user (gap > 30 min starts a new session):
    groupby(user) → sorted pandas window per group. Assumption: one
    user's events fit one group task (holds by construction for
    user-keyed logs; salt by day for pathological hot users)."""
    gap = pd.Timedelta(minutes=gap_minutes)

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts")
        new_session = (g["ts"].diff() > gap) | g["ts"].diff().isna()
        n = int(new_session.sum())
        return pd.DataFrame({"user_id": [g["user_id"].iloc[0]],
                             "n_sessions": [n],
                             "n_events": [len(g)]})

    return (_read(sf_dir, ["user_id", "ts"])
            .groupby("user_id")
            .map_groups(per_user, batch_format="pandas")
            .sort("user_id"))


SESSIONIZE_SQL = """
SELECT user_id, sum(new_s)::BIGINT AS n_sessions, count(*) AS n_events
FROM (SELECT user_id,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL 30 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_s
      FROM events)
GROUP BY user_id ORDER BY user_id
"""


def user_activity_topk(sf_dir: str, k: int = 25):
    """Most active users by event count then total value."""
    return (_read(sf_dir, ["user_id", "value"])
            .groupby("user_id")
            .aggregate(Count(alias_name="n_events"),
                       Sum("value", alias_name="total_value"))
            .map_batches(_round2(["total_value"]), batch_format="pandas")
            .sort(["n_events", "total_value", "user_id"],
                  descending=[True, True, False])
            .limit(k))


USER_ACTIVITY_SQL = """
SELECT user_id, count(*) AS n_events, round(sum(value), 2) AS total_value
FROM events GROUP BY user_id
ORDER BY n_events DESC, round(sum(value), 2) DESC, user_id LIMIT 25
"""
