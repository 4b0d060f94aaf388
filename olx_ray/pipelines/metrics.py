"""Crawl metrics + export conveniences (A2/A4, K4).

The reference only logs per-page link yield and per-ad latency
(``DownloadLinks.scala:50``, ``DownloadAds.scala:32-38``) and exports
CSV by hand in the H2 console (``readme.md:17``). The engine surfaces
the same information as queryable tables:

- ``host_stats`` — per-host fetch counts by action over every
  committed round (groupby over the trace; the A4 grouped-aggregate).
- ``round_stats`` — per-round counters straight from the manifests
  (driver-side tiny), incl. phase wall-times when recorded.
- ``seen_stats`` — seen-filter fill: exact counts + bloom
  approximate-distinct estimate (the sketch-based distinct count, A4).
- ``export_documents_csv`` — K4: the flat exploded span table as CSV.
"""

from __future__ import annotations

import os

import pyarrow as pa

from .. import storage
from ..functions.urls import host_of
from ..state import checkpoint as ckpt
from ..state.bloom import Bloom


def _trace_ds(out_dir: str):
    import ray.data as rd

    last = ckpt.latest_complete_round(out_dir)
    if last is None:
        return None
    paths = []
    for r in range(last + 1):
        p = os.path.join(ckpt.round_dir(out_dir, r), "trace")
        if os.path.isdir(p):
            paths.extend(os.path.join(p, f) for f in sorted(os.listdir(p))
                         if f.endswith(".parquet"))
    return rd.read_parquet(paths) if paths else None


def host_stats(out_dir: str):
    """Per-(host, action) visit counts across the whole crawl.

    Bounded keys (hosts × actions), so the combiner-first small-agg
    pattern applies — CLAUDE.md bans bare ``groupby().aggregate`` here
    (Ray 2.49 sort-aggregate is seconds even on tiny string-key inputs).
    """
    from ..functions.smallagg import partial_small_agg

    ds = _trace_ds(out_dir)
    if ds is None:
        return None

    def add_host(b: pa.Table) -> pa.Table:
        hosts = [host_of(u) for u in b["url"].to_pylist()]
        return pa.table({"host": pa.array(hosts, pa.string()),
                         "action": b["action"]})

    counted = partial_small_agg(
        ds.map_batches(add_host, batch_format="pyarrow"),
        ["host", "action"],
        {"n": ("action", "size")}, {"n": ("n", "sum")})
    return counted.sort(["host", "action"])


def round_stats(out_dir: str) -> list[dict]:
    last = ckpt.latest_complete_round(out_dir)
    if last is None:
        return []
    out = []
    for r in range(last + 1):
        man = storage.read_manifest(ckpt.manifest_path(out_dir, r)) or {}
        man["round"] = r
        out.append(man)
    return out


def seen_stats(out_dir: str) -> list[dict]:
    """Per-shard seen-filter stats from the final checkpoint, including
    the bloom fill-ratio approximate distinct count (SURVEY.md A4)."""
    last = ckpt.latest_complete_round(out_dir)
    if last is None:
        return []
    tbl = storage.read_table(os.path.join(ckpt.round_dir(out_dir, last), "seen"))
    out = []
    for row in tbl.to_pylist():
        b = Bloom.from_bytes(row["bloom_bits"])
        out.append({"shard": row["shard"], "n_items": row["n_items"],
                    "fill": round(b.fill_ratio(), 6),
                    "approx_distinct": round(b.approx_count(), 1)})
    return out


def export_documents_csv(out_dir: str, csv_dir: str) -> None:
    """K4: flat (doc_id, fetched_seq, offset, kind, text, media_ref) CSV."""
    from .crawl import read_documents

    docs = read_documents(out_dir)
    if docs is None:
        return
    from .crawl import explode_spans

    explode_spans(docs).write_csv(csv_dir)
