"""Fetcher actor-pool stage: frontier rows → fetched pages.

SURVEY.md S1/S2/J2/T4. In production this class holds an HTTP session
per actor (setup once in ``__init__`` — the idiomatic fix of the
reference's client-per-request bug, ``HttpClient.scala:8``). In this
sandbox the network is the synthetic page store: a hash-partitioned
parquet directory (``shard-NNN.parquet`` keyed by
``hash64(url) % N_PAGE_SHARDS``); each actor lazily loads and caches
only the shards its batches touch — the in-sandbox stand-in for "the
page lives on the network" (J2: fetch = semi-join frontier⋈pages;
misses → ``status="fetch_404"``, reference E1 would die here — native
mode records and continues).

Politeness: before issuing a batch, the fetcher groups URLs by host,
asks that host's PolitenessGate for robots verdicts and a clock
reservation, marks disallowed rows ``robots_denied`` and sleeps the
reserved wait. Simulated per-page latency (``sim_latency_ms`` from
the store, BASELINE.md bench protocol) is applied as
``sum(latency)/parallel_connections`` per batch — the wall-time a real
async fetcher with N connections would spend.

Used as: ``ds.map_batches(Fetcher, fn_constructor_kwargs=...,
concurrency=N, batch_size=B, num_cpus=1, batch_format="pyarrow")``.
"""

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


class Fetcher:
    def __init__(self, pages_dir: str, gates: list | None = None,
                 latency_scale: float = 0.0, parallel_connections: int = 10,
                 url_col: str = "url", keep_html: bool = True):
        self.pages_dir = pages_dir
        self.gates = gates or []
        self.latency_scale = latency_scale
        self.parallel_connections = max(1, parallel_connections)
        self.url_col = url_col
        self.keep_html = keep_html
        self._shards: dict[int, dict[str, tuple[str, str, int]]] = {}

    def _lookup(self, url: str) -> tuple[str, str, int] | None:
        shard = hash64(url) % N_PAGE_SHARDS
        store = self._shards.get(shard)
        if store is None:
            path = os.path.join(self.pages_dir, f"shard-{shard:03d}.parquet")
            store = {}
            if os.path.exists(path):
                t = pq.read_table(path, columns=["url", "kind", "html", "sim_latency_ms"])
                store = {u: (k, h, l) for u, k, h, l in
                         zip(t["url"].to_pylist(), t["kind"].to_pylist(),
                             t["html"].to_pylist(), t["sim_latency_ms"].to_pylist())}
            self._shards[shard] = store
        return store.get(url)

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch[self.url_col].to_pylist()
        n = len(urls)
        allowed = [True] * n
        # ---- politeness: robots + per-host clock reservation ----------
        if self.gates:
            by_host: dict[str, list[int]] = {}
            for i, u in enumerate(urls):
                by_host.setdefault(urlsplit(u).hostname or "", []).append(i)
            waits = []
            now = time.monotonic()
            verdict_refs = []
            for host, idxs in by_host.items():
                g = gate_for(self.gates, host)
                paths = [urlsplit(urls[i]).path for i in idxs]
                verdict_refs.append((idxs, g.allowed.remote(host, paths)))
                waits.append(g.acquire.remote(host, len(idxs), now))
            for idxs, ref in verdict_refs:
                for i, ok in zip(idxs, ray.get(ref)):
                    allowed[i] = ok
            wait = max(ray.get(waits), default=0.0)
            if wait > 0:
                time.sleep(wait)
        # ---- fetch (store lookup) + simulated latency -----------------
        kinds, htmls, statuses, sizes = [], [], [], []
        total_latency_ms = 0
        for i, u in enumerate(urls):
            if not allowed[i]:
                kinds.append("denied"); htmls.append(""); statuses.append("robots_denied"); sizes.append(0)
                continue
            hit = self._lookup(u)
            if hit is None or hit[0] == "missing":
                kinds.append("missing"); htmls.append(""); statuses.append("fetch_404"); sizes.append(0)
                total_latency_ms += 1
            else:
                kind, html, lat = hit
                kinds.append(kind); htmls.append(html); statuses.append("fetched")
                sizes.append(len(html))
                total_latency_ms += lat
        if self.latency_scale > 0 and total_latency_ms:
            time.sleep(self.latency_scale * total_latency_ms / 1000.0
                       / self.parallel_connections)
        cols = {name: batch[name] for name in batch.column_names}
        cols["kind"] = pa.array(kinds, pa.string())
        if self.keep_html:
            cols["html"] = pa.array(htmls, pa.string())
        cols["status"] = pa.array(statuses, pa.string())
        cols["fetch_bytes"] = pa.array(sizes, pa.int64())
        return pa.table(cols)
