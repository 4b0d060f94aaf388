"""Stream-shaped pipelines over the ``events`` table.

Ray Data is a (streaming-)batch engine with no event-time watermarks;
windows are expressed as grouped computation over an ordered,
partitioned log (ray_guide "Streaming-shaped workloads"): partition by
key, sort by ts inside the group, window with pandas. The ordering
assumption (events of one key fit one group task) is stated per
function."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..functions.hashing import bucket_of


def _user_bucket(ds, n_buckets: int):
    """Append ``_kb = bucket_of(user_id)`` (Arrow, zero-copy in): the
    groupby shuffle then co-locates each user's rows in ONE bucket task
    where the window/asof/funnel kernel runs vectorized over the whole
    bucket — never one Python call per user (CLAUDE.md gotcha). The
    mixed hash (not a raw modulo) keeps strided/shard-tagged id spaces
    spread across buckets."""

    def add(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy(zero_copy_only=False)
        return b.append_column(
            "_kb", pa.array(bucket_of(u, n_buckets), pa.int32()))

    return ds.map_batches(add, batch_format="pyarrow")


# shared bounded-key combiner helpers (single definition — see
# functions/smallagg.py for the validity bound and rationale)
from ..functions.smallagg import finish_small as _finish_small  # noqa: E402
from ..functions.money import cents, round_half_away  # noqa: E402


def _cents_to_value(b: pd.DataFrame) -> pd.DataFrame:
    """Exact int cents sum → currency double (see functions/money.py)."""
    b = b.copy()
    b["total_value"] = b["total_c"].astype(np.float64) / 100.0
    return b.drop(columns=["total_c"])


def _read(sf_dir: str, columns=None):
    return rd.read_parquet(f"{sf_dir}/events.parquet", columns=columns)


def events_by_type(sf_dir: str):
    def partial(b: pd.DataFrame) -> pd.DataFrame:
        # exact integer cents (functions/money.py): float sums rounded
        # at 2dp are a coin flip when a true sum hits a half-cent
        b = b.assign(value_c=cents(b["value"]))
        return b.groupby("event_type", as_index=False).agg(
            n=("value_c", "size"), total_c=("value_c", "sum"),
            min_value=("value", "min"), max_value=("value", "max"))

    ds = _read(sf_dir, ["event_type", "value"]) \
        .map_batches(partial, batch_format="pandas", batch_size=65536)
    out = _finish_small(ds, ["event_type"], dict(
        n=("n", "sum"), total_c=("total_c", "sum"),
        min_value=("min_value", "min"), max_value=("max_value", "max")),
        object_cols=("total_c",))

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        total = b["total_c"].astype(np.float64) / 100.0   # exact 2dp
        b["total_value"] = total
        # half-away like DuckDB round(DOUBLE,2); pandas .round is
        # half-even and diverges on exact scaled-.5 quotient ties
        b["avg_value"] = round_half_away((total / b["n"]).to_numpy())
        return b[["event_type", "n", "total_value", "avg_value",
                  "min_value", "max_value"]]

    return out.map_batches(finish, batch_format="pandas").sort("event_type")


EVENTS_BY_TYPE_SQL = """
SELECT event_type, count(*) AS n,
       CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE)
         AS total_value,
       round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
             / count(*), 2) AS avg_value,
       min(value) AS min_value,
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
        b["value_c"] = cents(b["value"])
        g = b.groupby(["event_type", "window_start"], as_index=False).agg(
            n=("value_c", "size"), total_c=("value_c", "sum"))
        return g

    ds = _read(sf_dir, ["ts", "event_type", "value"]) \
        .map_batches(bucket, batch_format="pandas", batch_size=65536)
    return _finish_small(ds, ["event_type", "window_start"],
                         dict(n=("n", "sum"),
                              total_c=("total_c", "sum"))) \
        .map_batches(_cents_to_value, batch_format="pandas") \
        .sort(["event_type", "window_start"])


EVENTS_TUMBLING_SQL = """
SELECT event_type, date_trunc('hour', ts) AS window_start,
       count(*) AS n,
       CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE)
         AS total_value
FROM events GROUP BY event_type, date_trunc('hour', ts)
ORDER BY event_type, window_start
"""


def sessionize(sf_dir: str, gap_minutes: int = 30, n_buckets: int = 64):
    """Session windows per user (gap > 30 min starts a new session),
    bucketed + vectorized: user-hash bucket groupby, then ONE pandas
    pass per bucket — sort by (user, ts), a session starts where the
    user changes or the gap exceeds the threshold (sorted diff), and
    one groupby-sum emits all users of the bucket at once. Assumption:
    one BUCKET of users fits one task (tune n_buckets ∝ users)."""
    gap = pd.Timedelta(minutes=gap_minutes)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"], kind="stable")
        new_user = g["user_id"].ne(g["user_id"].shift())
        new_session = new_user | (g["ts"].diff() > gap)
        out = pd.DataFrame({"user_id": g["user_id"], "ns": new_session}) \
            .groupby("user_id", as_index=False) \
            .agg(n_sessions=("ns", "sum"), n_events=("ns", "size"))
        out["n_sessions"] = out["n_sessions"].astype("int64")
        out["n_events"] = out["n_events"].astype("int64")
        return out

    return (_user_bucket(_read(sf_dir, ["user_id", "ts"]), n_buckets)
            .groupby("_kb")
            .map_groups(per_bucket, batch_format="pandas")
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


def user_activity_topk(sf_dir: str, k: int = 25, n_buckets: int = 32):
    """Most active users by event count then total value. One group per
    USER (unbounded), so the finish is bucketed: per-batch partials →
    user-hash bucket groupby → one vectorized sum + LOCAL top-k per
    bucket (the global top-k is a subset of the union of per-bucket
    top-ks) → tiny global sort over n_buckets × k rows."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.assign(value_c=cents(b["value"]))
        g = b.groupby("user_id", as_index=False).agg(
            n_events=("value_c", "size"), total_c=("value_c", "sum"))
        g["_kb"] = bucket_of(g["user_id"].to_numpy(), n_buckets)
        return g

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("user_id", as_index=False).agg(
            n_events=("n_events", "sum"), total_c=("total_c", "sum"))
        out["total_value"] = out["total_c"].astype(np.float64) / 100.0
        out = out.drop(columns=["total_c"])
        return out.sort_values(["n_events", "total_value", "user_id"],
                               ascending=[False, False, True]).head(k)

    return (_read(sf_dir, ["user_id", "value"])
            .map_batches(partial, batch_format="pandas", batch_size=65536)
            .groupby("_kb").map_groups(finish, batch_format="pandas")
            .sort(["n_events", "total_value", "user_id"],
                  descending=[True, True, False])
            .limit(k))


USER_ACTIVITY_SQL = """
SELECT user_id, count(*) AS n_events,
       CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE)
         AS total_value
FROM events GROUP BY user_id
ORDER BY n_events DESC, sum(CAST(value AS DECIMAL(18,2))) DESC, user_id
LIMIT 25
"""


def props_key_stats(sf_dir: str):
    """JSON column extraction: parse ``props`` (a JSON object string),
    pull key "k", aggregate per event_type. Vectorized via pandas
    json-normalize-free fast path (orjson-less: stdlib json per row is
    the hot loop — amortized per batch, and props are tiny)."""
    import json

    def extract(b: pd.DataFrame) -> pd.DataFrame:
        ks = [json.loads(p).get("k") for p in b["props"]]
        out = pd.DataFrame({"event_type": b["event_type"], "k": ks})
        return out.groupby("event_type", as_index=False).agg(
            n=("k", "size"), sum_k=("k", "sum"), max_k=("k", "max"))

    ds = _read(sf_dir, ["event_type", "props"]) \
        .map_batches(extract, batch_format="pandas", batch_size=65536)
    return _finish_small(ds, ["event_type"],
                         dict(n=("n", "sum"), sum_k=("sum_k", "sum"),
                              max_k=("max_k", "max"))) \
        .sort("event_type")


PROPS_KEY_SQL = """
SELECT event_type, count(*) AS n,
       sum(json_extract(props, '$.k')::BIGINT)::BIGINT AS sum_k,
       max(json_extract(props, '$.k')::BIGINT) AS max_k
FROM events GROUP BY event_type ORDER BY event_type
"""


def purchase_attribution_asof(sf_dir: str):
    """AS-OF JOIN (custom operator — Ray Data has none): each purchase
    event is attributed to the user's most recent prior click. User-hash
    bucket groupby, then ONE ``pd.merge_asof(..., by="user_id")`` per
    bucket (ray_guide "As-of / range join") — vectorized across all the
    bucket's users, never one Python call per user. Partitioning
    assumption: one bucket of users fits one group task."""

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"user_id": pd.Series([], dtype="int64"),
                              "purchase_id": pd.Series([], dtype="int64"),
                              "click_id": pd.Series([], dtype="int64")})
        purchases = g[g["event_type"] == "purchase"][["user_id", "ts", "event_id"]] \
            .rename(columns={"event_id": "purchase_id"})
        clicks = g[g["event_type"] == "click"][["user_id", "ts", "event_id"]] \
            .rename(columns={"event_id": "click_id"})
        if purchases.empty:
            return empty
        # merge_asof(by=user) needs BOTH frames globally ts-sorted; the
        # click_id tie-break pins determinism when clicks share a ts
        purchases = purchases.sort_values(["ts", "purchase_id"], kind="stable")
        clicks = clicks.sort_values(["ts", "click_id"], kind="stable")
        m = pd.merge_asof(purchases, clicks, on="ts", by="user_id",
                          allow_exact_matches=False)
        m["click_id"] = m["click_id"].astype("Int64").fillna(-1).astype("int64")
        return m[["user_id", "purchase_id", "click_id"]]

    return (_user_bucket(_read(sf_dir, ["user_id", "ts", "event_type",
                                        "event_id"]), 64)
            .groupby("_kb")
            .map_groups(per_bucket, batch_format="pandas")
            .sort(["user_id", "purchase_id"]))


PURCHASE_ASOF_SQL = """
SELECT p.user_id, p.event_id AS purchase_id,
       coalesce((SELECT c.event_id FROM events c
                 WHERE c.user_id = p.user_id AND c.event_type = 'click'
                   AND c.ts < p.ts
                 ORDER BY c.ts DESC, c.event_id DESC LIMIT 1), -1) AS click_id
FROM events p WHERE p.event_type = 'purchase'
ORDER BY p.user_id, purchase_id
"""
# correlated subquery instead of DuckDB's ASOF JOIN: ASOF leaves the
# pick among equal-ts clicks implementation-defined, while the engine
# pins it (clicks sorted by [ts, click_id], merge_asof takes the last
# prior row → max click_id among the tied latest) — the explicit
# ORDER BY ts DESC, event_id DESC makes the oracle agree deterministically.


def events_sliding_2h(sf_dir: str):
    """SLIDING window (2h wide, 1h step) per event_type: each event maps
    to exactly two windows — assignment exploded vectorized per batch
    (combiner), then the small finish. Window = [start, start+2h)."""

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        w0 = b["ts"].dt.floor("h")
        a = pd.DataFrame({"event_type": b["event_type"],
                          "window_start": w0, "value": b["value"]})
        c = pd.DataFrame({"event_type": b["event_type"],
                          "window_start": w0 - pd.Timedelta(hours=1),
                          "value": b["value"]})
        both = pd.concat([a, c], ignore_index=True)
        both["value_c"] = cents(both["value"])
        return both.groupby(["event_type", "window_start"],
                            as_index=False).agg(
            n=("value_c", "size"), total_c=("value_c", "sum"))

    ds = _read(sf_dir, ["ts", "event_type", "value"]) \
        .map_batches(explode, batch_format="pandas", batch_size=65536)
    return _finish_small(ds, ["event_type", "window_start"],
                         dict(n=("n", "sum"),
                              total_c=("total_c", "sum"))) \
        .map_batches(_cents_to_value, batch_format="pandas") \
        .sort(["event_type", "window_start"])


EVENTS_SLIDING_SQL = """
SELECT event_type, window_start, count(*) AS n,
       CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE)
         AS total_value
FROM (SELECT event_type, date_trunc('hour', ts) AS window_start, value
      FROM events
      UNION ALL
      SELECT event_type, date_trunc('hour', ts) - INTERVAL 1 HOUR, value
      FROM events)
GROUP BY event_type, window_start ORDER BY event_type, window_start
"""


def funnel_conversion(sf_dir: str):
    """Ordered funnel view → click → purchase: a user converts a stage
    only with an event strictly AFTER their first event of the previous
    stage (the classic sequential-funnel semantics — a click before the
    first view doesn't count). User-hash bucket groupby, then one
    VECTORIZED pass per bucket: first-view per user (groupby-min), join
    to clicks and filter strictly-after, first qualifying click, same
    again for purchases — all users of a bucket evaluated in three
    pandas joins; each bucket emits one partial row."""

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        t1 = g.loc[g["event_type"] == "view"] \
            .groupby("user_id")["ts"].min().rename("t1").reset_index()
        c = g.loc[g["event_type"] == "click", ["user_id", "ts"]] \
            .merge(t1, on="user_id")
        t2 = c.loc[c["ts"] > c["t1"]] \
            .groupby("user_id")["ts"].min().rename("t2").reset_index()
        p = g.loc[g["event_type"] == "purchase", ["user_id", "ts"]] \
            .merge(t2, on="user_id")
        t3 = p.loc[p["ts"] > p["t2"]].groupby("user_id")["ts"].min()
        return pd.DataFrame({"v": [len(t1)], "c": [len(t2)],
                             "p": [len(t3)]})

    per = _user_bucket(_read(sf_dir, ["user_id", "ts", "event_type"]), 64) \
        .groupby("_kb").map_groups(per_bucket, batch_format="pandas")

    def total(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "n_view": [int(b["v"].sum())],
            "n_view_click": [int(b["c"].sum())],
            "n_full_funnel": [int(b["p"].sum())],
        })

    return per.repartition(1).map_batches(total, batch_format="pandas")


FUNNEL_SQL = """
WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
           WHERE event_type = 'view' GROUP BY user_id),
c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
      JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
      WHERE e.event_type = 'click' GROUP BY e.user_id),
p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
      JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
      WHERE e.event_type = 'purchase' GROUP BY e.user_id)
SELECT (SELECT count(*) FROM v) AS n_view,
       (SELECT count(*) FROM c) AS n_view_click,
       (SELECT count(*) FROM p) AS n_full_funnel
"""


def retention_daily(sf_dir: str, n_buckets: int = 32):
    """Day-1 cohort retention: users grouped by their FIRST active day;
    retained = any event on the following day. Per-batch (user, day)
    distinct partials (the combiner — the shuffle carries one row per
    user-day per batch, never events) bucketed by USER hash, so each
    bucket task resolves its users' first-day/retained flags fully
    vectorized; the final coalesce is per COHORT DAY — bounded key
    (calendar days), where ``_finish_small`` is sound."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        d = b["ts"].dt.floor("D")
        out = pd.DataFrame({"user_id": b["user_id"], "d": d}).drop_duplicates()
        out["_kb"] = bucket_of(out["user_id"].to_numpy(), n_buckets)
        return out

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["user_id", "d"])
        d0 = g.groupby("user_id")["d"].min().rename("d0").reset_index()
        m = d0.merge(g, on="user_id")
        m["is_d1"] = m["d"] == m["d0"] + pd.Timedelta(days=1)
        per_user = m.groupby(["user_id", "d0"], as_index=False)["is_d1"].max()
        out = per_user.groupby("d0", as_index=False).agg(
            cohort_size=("user_id", "size"),
            retained_d1=("is_d1", "sum"))
        out["retained_d1"] = out["retained_d1"].astype("int64")
        return out

    parts = (_read(sf_dir, ["user_id", "ts"])
             .map_batches(partial, batch_format="pandas", batch_size=65536)
             .groupby("_kb").map_groups(per_bucket, batch_format="pandas"))
    return _finish_small(parts, ["d0"], dict(
        cohort_size=("cohort_size", "sum"),
        retained_d1=("retained_d1", "sum"))).sort("d0")


RETENTION_SQL = """
WITH days AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS d
              FROM events),
f AS (SELECT user_id, min(d) AS d0 FROM days GROUP BY user_id)
SELECT f.d0, count(*) AS cohort_size,
       sum(CASE WHEN r.user_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
         AS retained_d1
FROM f LEFT JOIN days r
  ON r.user_id = f.user_id AND r.d = f.d0 + INTERVAL 1 DAY
GROUP BY f.d0 ORDER BY f.d0
"""


def events_unique_users_hourly(sf_dir: str, n_buckets: int = 32):
    """EXACT distinct users per tumbling hour — the windowed
    COUNT(DISTINCT) every traffic dashboard runs. Two-stage so the
    unbounded user dimension never funnels into one task:

    1. per-batch DISTINCT (window, user) pairs, bucketed by
       ``hash(user) % B`` — a user's rows always land in ONE bucket,
       so per-bucket counts are disjoint;
    2. per-bucket vectorized distinct-pair count per window, then the
       tiny per-window sum over buckets (windows are bounded —
       ``finish_small`` territory).

    Raw events shrink to distinct pairs at the first map; only pairs
    shuffle. DuckDB oracle: ``EVENTS_UNIQUE_USERS_SQL``."""
    def pairs(b: pd.DataFrame) -> pd.DataFrame:
        g = b.assign(window_start=b["ts"].dt.floor("h")) \
            [["window_start", "user_id"]].drop_duplicates()
        g["bucket"] = bucket_of(g["user_id"].to_numpy(np.int64), n_buckets)
        return g

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["window_start", "user_id"])
        return d.groupby("window_start", as_index=False) \
            .agg(n_users=("user_id", "size"))

    ds = _read(sf_dir, ["ts", "user_id"]) \
        .map_batches(pairs, batch_format="pandas", batch_size=65536) \
        .groupby("bucket").map_groups(per_bucket, batch_format="pandas")
    return _finish_small(ds, ["window_start"],
                         dict(n_users=("n_users", "sum"))) \
        .sort("window_start")


EVENTS_UNIQUE_USERS_SQL = """
SELECT date_trunc('hour', ts) AS window_start,
       count(DISTINCT user_id)::BIGINT AS n_users
FROM events GROUP BY 1 ORDER BY 1
"""


def _rolling_bounds(ts_ns: np.ndarray, seg_id: np.ndarray,
                    win_ns: int) -> tuple:
    """Per-row window bounds for a (segment, ts)-sorted array: for row
    ``i``, ``left[i]`` = first index of the SAME segment with
    ``ts >= ts[i] - win`` and ``right[i]`` = one past the last index
    with ``ts <= ts[i]`` (so equal-timestamp peers are all included —
    SQL ``RANGE ... PRECEDING AND CURRENT ROW`` semantics exactly).

    One global ``np.searchsorted`` answers every segment at once by
    shifting each segment's timestamps into a disjoint int64 band
    (stride > span + window, so a query can never cross into the
    previous segment's band). Falls back to a per-segment loop when
    ``n_segments × stride`` would overflow int64 — correctness never
    depends on the banding."""
    n = len(ts_ns)
    if not n:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    base = ts_ns - ts_ns.min()
    n_seg = int(seg_id[-1]) + 1
    stride = int(base.max()) + win_ns + 2
    if n_seg * stride < 2 ** 62:
        key = seg_id.astype(np.int64) * stride + base
        left = np.searchsorted(key, key - win_ns, side="left")
        right = np.searchsorted(key, key, side="right")
        return left, right
    left = np.empty(n, np.int64)
    right = np.empty(n, np.int64)
    starts = np.flatnonzero(np.r_[True, seg_id[1:] != seg_id[:-1]])
    ends = np.r_[starts[1:], n]
    for s, e in zip(starts, ends):
        seg = ts_ns[s:e]
        left[s:e] = s + np.searchsorted(seg, seg - win_ns, side="left")
        right[s:e] = s + np.searchsorted(seg, seg, side="right")
    return left, right


def rolling_user_window(sf_dir: str, window_minutes: int = 60,
                        n_buckets: int = 64):
    """Per-EVENT trailing time-window aggregate: for every event, the
    count and exact money sum of the same user's events with
    ``ts ∈ [ts_i − window, ts_i]`` — SQL's
    ``RANGE BETWEEN INTERVAL w PRECEDING AND CURRENT ROW`` (boundary
    row included, equal-ts peers included). The per-row window shape
    no tumbling/sliding bucket can express.

    Kernel: user-hash bucket groupby (a user's events meet in ONE
    task), then one vectorized pass per bucket — sort by (user, ts),
    int-cents prefix sums, and a single banded ``np.searchsorted``
    (``_rolling_bounds``) resolving every user's window boundaries at
    once; zero Python per user. Output is input-sized and streams.
    Assumption (stated, as for sessionize): one bucket of users fits
    one task — tune ``n_buckets`` ∝ users."""
    win_ns = int(window_minutes) * 60 * 1_000_000_000

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"], kind="stable") \
             .reset_index(drop=True)
        ts = g["ts"].to_numpy("datetime64[ns]").astype(np.int64)
        uid = g["user_id"].to_numpy()
        seg_id = np.cumsum(np.r_[False, uid[1:] != uid[:-1]]) \
            if len(g) else np.empty(0, np.int64)
        left, right = _rolling_bounds(ts, seg_id, win_ns)
        pref = np.concatenate([[0], np.cumsum(cents(g["value"]))])
        g["n_win"] = (right - left).astype("int64")
        g["total_win"] = (pref[right] - pref[left]).astype(np.float64) / 100.0
        return g[["user_id", "ts", "value", "n_win", "total_win"]]

    return (_user_bucket(_read(sf_dir, ["user_id", "ts", "value"]),
                         n_buckets)
            .groupby("_kb").map_groups(per_bucket, batch_format="pandas")
            .sort(["user_id", "ts"]))


ROLLING_USER_SQL = """
SELECT user_id, ts, value,
       count(*) OVER w AS n_win,
       CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS total_win
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 60 MINUTE PRECEDING AND CURRENT ROW)
ORDER BY user_id, ts
"""


def event_transitions(sf_dir: str, n_buckets: int = 64):
    """First-order Markov transition matrix over each user's event
    sequence: for every consecutive pair within a user (ordered by
    ``ts``, ties by ``event_id`` — deterministic on both engine and
    oracle sides), count ``prev_type → event_type`` and its row
    probability ``p = n / Σ n over prev_type``. The funnel family's
    "what happens next" diagnostic.

    Shape: user-hash bucket co-location (the ``sessionize`` kernel
    pattern — one vectorized shift per bucket, never per user), then
    the pair counts are BOUNDED (|event_type|² keys), so the finish is
    the small-agg coalesce. ``p`` divides the identical exact int64
    counts as doubles (oracle parity rule)."""

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        prev = g["event_type"].shift()
        same = g["user_id"].eq(g["user_id"].shift())
        pairs = pd.DataFrame({"prev_type": prev[same],
                              "event_type": g["event_type"][same]})
        return pairs.groupby(["prev_type", "event_type"],
                             as_index=False).size() \
            .rename(columns={"size": "n"})

    counts = _finish_small(
        _user_bucket(_read(sf_dir, ["user_id", "ts", "event_id",
                                    "event_type"]), n_buckets)
        .groupby("_kb").map_groups(per_bucket, batch_format="pandas"),
        ["prev_type", "event_type"], dict(n=("n", "sum")))

    def probs(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["n"] = b["n"].astype(np.int64)
        b["p"] = b["n"].astype(np.float64) \
            / b.groupby("prev_type")["n"].transform("sum") \
            .astype(np.float64)
        return b.sort_values(["prev_type", "event_type"],
                             kind="mergesort")

    # batch_size=None: _finish_small leaves ONE block, and probs needs
    # every row of a prev_type in the same batch — the default batch
    # size could silently split a prev_type's rows if the pair count
    # ever exceeded it, skewing the per-row probabilities.
    return counts.map_batches(probs, batch_format="pandas",
                              batch_size=None)


EVENT_TRANSITIONS_SQL = """
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events)
SELECT prev_type, event_type, count(*)::BIGINT AS n,
       count(*)::DOUBLE
         / sum(count(*)) OVER (PARTITION BY prev_type) AS p
FROM seq WHERE prev_type IS NOT NULL
GROUP BY prev_type, event_type
ORDER BY prev_type, event_type
"""
