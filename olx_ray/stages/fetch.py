"""Fetch stage: frontier rows → fetched pages.

SURVEY.md S1/S2/J2/T4. In production this is an async HTTP client with
N parallel connections per worker; in this sandbox the network is the
synthetic page store — a hash-partitioned parquet directory
(``shard-NNN.parquet`` keyed by ``hash64(url) % N_PAGE_SHARDS``). The
fetch is J2: a semi-join of the frontier against the store; misses →
``status="fetch_404"`` (reference E1 would die here — native mode
records and continues).

Two usable forms:

- ``fetch_batch`` — a STATELESS map_batches task function. Page-store
  shards are cached in a module-global dict, i.e. once per Ray WORKER
  PROCESS (workers persist across tasks and rounds), so tasks get
  actor-style cache amortization with zero pool spin-up cost per
  crawl round. This is the form the crawl loop uses.
- ``Fetcher`` — the callable-class/actor-pool form of the same logic
  (holds its own cache; one per actor), kept for pipelines that want
  an explicit long-lived pool.

Politeness: before issuing a batch, URLs are grouped by host, that
host's PolitenessGate actor is asked for robots verdicts and a clock
reservation (per-host serialization is global because every task
routes a host to the same gate), and the task sleeps the reserved
wait. Simulated per-page latency (``sim_latency_ms``, BASELINE.md) is
applied as ``sum(latency)/parallel_connections`` per batch — the
wall-time an async fetcher with N connections spends; the sleeping
task holds its CPU slot, which is exactly how fetch capacity scales
with cluster size."""

from __future__ import annotations

import os
import time
from urllib.parse import urlsplit

import pyarrow as pa
import pyarrow.parquet as pq
import ray

from ..functions.hashing import hash64
from ..sources.sitegen import N_PAGE_SHARDS
from ..stages.politeness import gate_for

# per-worker-process shard cache: (pages_dir, shard) → {url: (kind, html, lat)}
_STORE_CACHE: dict[tuple[str, int], dict] = {}


def _shard_store(pages_dir: str, shard: int) -> dict:
    key = (pages_dir, shard)
    store = _STORE_CACHE.get(key)
    if store is None:
        # a crawl only ever reads ONE pages_dir: drop shards cached for
        # any other (long-lived workers in a shared Ray session would
        # otherwise accumulate every past crawl's full page HTML)
        for old in [k for k in _STORE_CACHE if k[0] != pages_dir]:
            del _STORE_CACHE[old]
        path = os.path.join(pages_dir, f"shard-{shard:03d}.parquet")
        store = {}
        if os.path.exists(path):
            t = pq.read_table(path, columns=["url", "kind", "html",
                                             "sim_latency_ms"])
            store = {u: (k, h, l) for u, k, h, l in
                     zip(t["url"].to_pylist(), t["kind"].to_pylist(),
                         t["html"].to_pylist(),
                         t["sim_latency_ms"].to_pylist())}
        _STORE_CACHE[key] = store
    return store


def _lookup(pages_dir: str, url: str):
    return _shard_store(pages_dir, hash64(url) % N_PAGE_SHARDS).get(url)


def fetch_batch(batch: pa.Table, *, pages_dir: str, gates: list | None = None,
                latency_scale: float = 0.0, parallel_connections: int = 10,
                url_col: str = "url", keep_html: bool = True,
                parse_ads_inline: bool = False,
                native_parse: bool = True) -> pa.Table:
    """Stateless fetch task over one Arrow batch (see module docstring).

    ``parse_ads_inline=True`` fuses the ad→spans parse into the fetch
    task (SURVEY.md §7 "wide rows": parse in the fetch stage, drop the
    heavy html before anything is materialized or shuffled): ad rows get
    a ``spans`` column and empty html; listing html is kept for the
    listing-parse stage (and everything is kept when ``keep_html``)."""
    urls = batch[url_col].to_pylist()
    n = len(urls)
    allowed = [True] * n
    if gates:
        by_host: dict[str, list[int]] = {}
        for i, u in enumerate(urls):
            by_host.setdefault(urlsplit(u).hostname or "", []).append(i)
        # verdicts FIRST (all hosts in parallel), then reserve clock
        # slots only for the ALLOWED urls — robots-denied urls are never
        # fetched and must not advance the host's crawl-delay clock
        verdict_refs = []
        for host, idxs in by_host.items():
            paths = [urlsplit(urls[i]).path for i in idxs]
            verdict_refs.append((host, idxs,
                                 gate_for(gates, host).allowed.remote(host, paths)))
        waits = []
        # NO caller timestamp: the gate actor reads its own clock —
        # monotonic values from other processes/nodes aren't comparable
        # (see politeness.py module docstring)
        for (host, idxs, ref), oks in zip(verdict_refs,
                                          ray.get([r for _, _, r in verdict_refs])):
            n_allowed = 0
            for i, ok in zip(idxs, oks):
                allowed[i] = ok
                n_allowed += bool(ok)
            if n_allowed:
                waits.append(gate_for(gates, host).acquire.remote(
                    host, n_allowed))
        wait = max(ray.get(waits), default=0.0)
        if wait > 0:
            time.sleep(wait)
    kinds, htmls, statuses, sizes = [], [], [], []
    total_latency_ms = 0
    for i, u in enumerate(urls):
        if not allowed[i]:
            kinds.append("denied"); htmls.append(""); statuses.append("robots_denied"); sizes.append(0)
            continue
        hit = _lookup(pages_dir, u)
        if hit is None or hit[0] == "missing":
            kinds.append("missing"); htmls.append(""); statuses.append("fetch_404"); sizes.append(0)
            total_latency_ms += 1
        else:
            kind, html, lat = hit
            kinds.append(kind); htmls.append(html); statuses.append("fetched")
            sizes.append(len(html))
            total_latency_ms += lat
    if latency_scale > 0 and total_latency_ms:
        time.sleep(latency_scale * total_latency_ms / 1000.0
                   / max(1, parallel_connections))
    cols = {name: batch[name] for name in batch.column_names}
    cols["kind"] = pa.array(kinds, pa.string())
    if parse_ads_inline:
        from ..schema import SPAN
        from .parse import ad_to_spans

        spans = [ad_to_spans(h, native=native_parse)
                 if k == "ad" and st == "fetched" else None
                 for h, k, st in zip(htmls, kinds, statuses)]
        cols["spans"] = pa.array(spans, type=pa.list_(SPAN))
        if not keep_html:
            # heavy column dropped for parsed ads before materialization
            htmls = ["" if k == "ad" else h for h, k in zip(htmls, kinds)]
        cols["html"] = pa.array(htmls, pa.string())
    elif keep_html:
        cols["html"] = pa.array(htmls, pa.string())
    cols["status"] = pa.array(statuses, pa.string())
    cols["fetch_bytes"] = pa.array(sizes, pa.int64())
    return pa.table(cols)


class Fetcher:
    """Actor-pool form: same logic, cache held on the actor."""

    def __init__(self, pages_dir: str, gates: list | None = None,
                 latency_scale: float = 0.0, parallel_connections: int = 10,
                 url_col: str = "url", keep_html: bool = True):
        self.kw = dict(pages_dir=pages_dir, gates=gates,
                       latency_scale=latency_scale,
                       parallel_connections=parallel_connections,
                       url_col=url_col, keep_html=keep_html)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return fetch_batch(batch, **self.kw)
