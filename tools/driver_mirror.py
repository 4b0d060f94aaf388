"""Mirror the driver's correctness gate locally.

Runs every ``__ray_entry__.queries()`` entry at a given sf_dir, runs the
matching ``oracle_sql()`` in DuckDB over the same parquet tables, and
compares row count + schema (column-name set) + value hash the way the
driver does (columns sorted by name, rows sorted by all columns,
values stringified). Entries with no oracle get a rows-only check.

Usage:  python tools/driver_mirror.py [sf_dir] [query ...]
        (default sf_dir /root/testdata/sf0.01; default: all 50)

``run_gate`` is the embeddable core (Ray must already be initialised —
the in-suite pytest marker drives it under the session fixture so an
entry regression fails ``pytest`` before the driver ever sees it);
``main`` owns a Ray session for CLI use (CLAUDE.md: library code never
calls ray.init).
"""
from __future__ import annotations

import hashlib
import json
import sys
import time

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _canon(df):
    import pandas as pd

    df = df.copy()
    df.columns = [str(c) for c in df.columns]
    df = df[sorted(df.columns)]
    for c in df.columns:
        s = df[c]
        if s.dtype == object:
            df[c] = s.astype(str)
        elif str(s.dtype).startswith("float"):
            # round(6) like tests/test_queries_oracle.py — pipelines
            # already 2dp-round where their oracle does; a looser 2dp
            # here would hide value bugs the real gate fails on
            df[c] = s.round(6)
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def _vhash(df) -> str:
    body = df.to_csv(index=False, float_format="%.6f")
    return hashlib.sha256(body.encode()).hexdigest()[:16]


def run_gate(sf_dir: str, only: set | None = None, verbose: bool = True):
    """The gate itself (Ray already initialised): → ``(report, n_green,
    n_rowsonly, n_fail)``. ``only`` restricts to named entries and
    skips the ``entry()`` smoke check."""
    import duckdb
    import pandas as pd

    only = only or set()
    if "/root/repo" not in sys.path:
        sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    def say(msg: str) -> None:
        if verbose:
            print(msg, flush=True)

    qs, sqls = e.queries(), e.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        raise ValueError(f"unknown query name(s): {sorted(unknown)}")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    report, n_green, n_rowsonly, n_fail = {}, 0, 0, 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        rec = {"rows_match": None, "schema_match": None, "hash_match": None,
               "spark_rows": None, "oracle_rows": None, "err": None}
        t0 = time.time()
        try:
            res = fn(sf_dir)
            if hasattr(res, "to_pandas"):
                res = res.to_pandas()
            elif not isinstance(res, pd.DataFrame):
                res = pd.DataFrame(res)
            rec["spark_rows"] = len(res)
            if name in sqls:
                ora = con.execute(sqls[name]).fetchdf()
                rec["oracle_rows"] = len(ora)
                a, b = _canon(res), _canon(ora)
                rec["rows_match"] = len(a) == len(b)
                rec["schema_match"] = list(a.columns) == list(b.columns)
                rec["hash_match"] = (rec["rows_match"] and rec["schema_match"]
                                     and _vhash(a) == _vhash(b))
                if rec["hash_match"]:
                    n_green += 1
                else:
                    n_fail += 1
                    if not rec["schema_match"]:
                        rec["err"] = f"cols ray={list(a.columns)} sql={list(b.columns)}"
                    elif not rec["rows_match"]:
                        rec["err"] = f"rows {len(a)} != {len(b)}"
                    else:
                        # NaN-safe: NaN==NaN must NOT count as a diff
                        neq = (a != b) & ~(a.isna() & b.isna())
                        bad = [c for c in a.columns if neq[c].any()]
                        rec["err"] = f"value diff in {bad}"
            else:
                rec["rows_match"] = rec["spark_rows"] >= 0
                n_rowsonly += 1
        except Exception as ex:  # noqa: BLE001 — mirror records, never raises
            rec["err"] = f"{type(ex).__name__}: {ex}"[:300]
            n_fail += 1
        rec["sec"] = round(time.time() - t0, 2)
        report[name] = rec
        tag = ("GREEN" if rec["hash_match"]
               else "rows-only" if rec["err"] is None and name not in sqls
               else "FAIL")
        say(f"{name:35s} {tag:9s} {rec['sec']:6.2f}s rows={rec['spark_rows']}"
            + (f" err={rec['err']}" if rec["err"] else ""))

    # the driver also smoke-checks entry() (sf0.001, ≥0 rows, stable
    # schema) — mirror that too so an entry() regression can't hide
    if not only:
        t0 = time.time()
        try:
            res = e.entry()
            res = res.to_pandas() if hasattr(res, "to_pandas") else res
            assert len(res) > 0 and len(res.columns) > 0
            say(f"{'entry()':35s} {'GREEN':9s} {time.time()-t0:6.2f}s "
                f"rows={len(res)}")
        except Exception as ex:  # noqa: BLE001
            n_fail += 1
            say(f"{'entry()':35s} {'FAIL':9s} err={ex}")
    return report, n_green, n_rowsonly, n_fail


def main() -> int:
    import ray

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    ray.init(address="local", include_dashboard=False,
             logging_level="error")
    try:
        report, n_green, n_rowsonly, n_fail = run_gate(sf_dir, only)
    except ValueError as ex:
        print(ex, file=sys.stderr)
        return 2
    print(f"\n== {n_green} GREEN / {n_rowsonly} rows-only / {n_fail} FAIL ==")
    with open("/tmp/driver_mirror.json", "w") as f:
        json.dump(report, f, indent=1)
    ray.shutdown()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
