#!/usr/bin/env python
"""Benchmark harness (driver contract: prints ONE JSON line).

Headline: the native crawl over the deterministic bench site (2,000
listing pages, ~47k unique ad pages, seeded per-page latency) — the
engine's E1-equivalent pipeline: fetch (politeness gates, simulated
latency) → parse → dedup/seen-filter → frontier → checkpoint.

Also times a representative slice of the query surface over
``$GRAFT_SF_DIR`` (default /root/testdata/sf0.1).

``--scaling``: runs the crawl-only bench in two FRESH processes at
num_cpus=8 and 32 on the same input (the sandbox stand-in for N vs 4N
nodes, BASELINE.md protocol) and prints both throughputs + efficiency.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NCPU = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
def _site_root() -> str:
    from olx_ray.sources.sitegen import SITE_VERSION

    return os.path.join(tempfile.gettempdir(),
                        f"olx_ray_bench_site_v{SITE_VERSION}")


SITE_ROOT = None  # resolved lazily (imports olx_ray)

QUERY_NAMES = [
    "q1_pricing_summary", "q3_shipping_priority", "q5_supplier_volume",
    "q6_forecast_revenue", "q18_large_orders",
    "events_tumbling_hourly", "sessionize", "word_freq_topk",
    "dedup_exact", "minhash_lsh_pairs", "simhash_pairs",
    "knn_bruteforce", "embedding_neardup_pairs", "embedding_neardup_lsh",
    "token_count", "build_vocab", "training_corpus", "text_profile",
    "duplicate_spans", "neardup_groups_embedding", "knn_lsh",
]


def host_calibration() -> float:
    """Fixed single-core numpy workload (seconds) — a host-speed probe
    reported with every bench so runs on a degraded/throttled sandbox
    host are interpretable (observed >3× single-core swings between
    sessions on identical code; healthy host ≈ 1.0–1.5 s, a reading of
    ≥3 s means wall-times that session are NOT comparable)."""
    import numpy as np

    x = (np.arange(10_000_000, dtype=np.float64) % 977.0) + 1.0
    t0 = time.monotonic()
    for _ in range(2):
        y = np.sqrt(x) * 1.5 + x * x
        x = np.sort(y) / 977.0
    return round(time.monotonic() - t0, 3)


def _consume(res) -> int:
    import pandas as pd
    import pyarrow as pa

    if res is None:                 # op consumed itself (sink write)
        return 0
    if isinstance(res, (pd.DataFrame, pa.Table)):
        return len(res)
    return res.count()


def run_crawl(ncpu: int) -> dict:
    from olx_ray.pipelines.crawl import CrawlConfig, crawl_native
    from olx_ray.sources.sitegen import SiteSpec, ensure_site
    from olx_ray.state import checkpoint as ckpt
    from olx_ray import storage

    site_root = _site_root()
    ensure_site("bench", site_root)
    out = tempfile.mkdtemp(prefix="olx_ray_bench_crawl_")
    cfg = CrawlConfig(
        pages_dir=os.path.join(site_root, "pages"), out_dir=out,
        collect_trace=False, lineage_level="counts",
        n_seen_shards=16, n_gates=8,
        fetcher_concurrency=ncpu, fetch_batch_size=128,
        parse_batch_size=512, latency_scale=2.0, max_rounds=16,
    )
    res = crawl_native(cfg, SiteSpec("bench").seed_rows())
    # frontier ops = candidate rows processed (dedup+seen check+add)
    n_cand = 0
    last = ckpt.latest_complete_round(out)
    for r in range((last or 0) + 1):
        man = storage.read_manifest(ckpt.manifest_path(out, r)) or {}
        n_cand += man.get("n_candidates", 0)
    shutil.rmtree(out, ignore_errors=True)
    return {
        "crawl_sec": round(res.wall_sec, 2),
        "pages_fetched": res.n_fetched,
        "documents": res.n_documents,
        "rounds": res.rounds,
        "pages_per_sec": round(res.n_fetched / res.wall_sec, 1),
        "frontier_ops": n_cand + res.n_fetched,
        "frontier_ops_per_sec": round((n_cand + res.n_fetched) / res.wall_sec, 1),
    }


def _extra_ops() -> dict:
    """Library operators timed alongside the driver-surface slice
    (not `queries()` entries — that dict is capped at 50)."""
    def _semdedup(sf):
        from olx_ray.pipelines.semdedup import semantic_dedup

        return semantic_dedup(sf, eps=0.35, n_clusters=16)

    def _gopher(sf):
        from olx_ray.pipelines.text import gopher_rules

        return gopher_rules(sf)

    def _dsir(sf):
        import pyarrow.parquet as pq

        from olx_ray.pipelines.dsir import dsir_select

        pf = pq.ParquetFile(f"{sf}/documents.parquet")
        target = next(pf.iter_batches(batch_size=16,
                                      columns=["text"]))["text"].to_pylist()
        return dsir_select(sf, target, k=100)

    def _rolling(sf):
        from olx_ray.pipelines.events import rolling_user_window

        return rolling_user_window(sf)

    def _normalize(sf):
        from olx_ray.pipelines.text import normalize_text

        return normalize_text(sf)

    def _quota(sf):
        from olx_ray.pipelines.sampling import source_quota_sample

        return source_quota_sample(sf, cap=200)

    def _dedup_lines(sf):
        from olx_ray.pipelines.text import dedup_lines_within_doc

        return dedup_lines_within_doc(sf)

    def _hybrid(sf):
        import pyarrow.parquet as pq

        from olx_ray.pipelines.similarity import hybrid_search_rrf

        pf = pq.ParquetFile(f"{sf}/documents.parquet")
        text0 = next(pf.iter_batches(batch_size=1,
                                     columns=["text"]))["text"][0].as_py()
        return hybrid_search_rrf(sf, " ".join(text0.split()[:6]))

    def _shards(sf):
        import shutil
        import tempfile

        from olx_ray.pipelines.bpe import bpe_vocab, train_bpe
        from olx_ray.pipelines.corpus import write_training_shards

        out = tempfile.mkdtemp(prefix="bench_shards_")
        try:
            merges = train_bpe(sf, n_merges=100)
            write_training_shards(sf, merges, out,
                                  vocab=bpe_vocab(sf, merges))
        finally:
            shutil.rmtree(out, ignore_errors=True)
        return None                      # consumed by the write

    def _interleaved(sf):
        # the interleaved family over the BENCH SITE's ~47k real ad
        # payloads (not sf testdata — spans come from the crawl side):
        # parse once (materialized — the family re-consumes the docs),
        # then whole-sequence dedup -> PII pass -> flat text view
        import ray.data as rd

        from olx_ray.pipelines.spans import (dedup_interleaved,
                                             redact_pii_interleaved,
                                             text_view)
        from olx_ray.sources.sitegen import ensure_site
        from olx_ray.stages.parse import ParseAds

        site_root = _site_root()
        ensure_site("bench", site_root)
        docs = (rd.read_parquet(os.path.join(site_root, "pages"),
                                columns=["url", "html", "kind"])
                .filter(expr="kind == 'ad'")
                .map_batches(ParseAds(), batch_format="pyarrow")
                .select_columns(["doc_id", "spans"])
                .materialize())
        return text_view(redact_pii_interleaved(
            dedup_interleaved(docs)))

    def _interleaved_neardup(sf):
        # the mixed-modal near-dup family over a FIXED 8192-ad slice of
        # the bench site (fixed size so the number is comparable across
        # rounds; the 47k-ad corpus belongs to a dedicated run, not the
        # per-round query sweep). Includes the parse of the slice.
        import ray.data as rd

        from olx_ray.pipelines.spans import interleaved_neardup_pairs
        from olx_ray.sources.sitegen import ensure_site
        from olx_ray.stages.parse import ParseAds

        site_root = _site_root()
        ensure_site("bench", site_root)
        docs = (rd.read_parquet(os.path.join(site_root, "pages"),
                                columns=["url", "html", "kind"])
                .filter(expr="kind == 'ad'").limit(8192)
                .map_batches(ParseAds(), batch_format="pyarrow")
                .select_columns(["doc_id", "spans"]).materialize())
        return interleaved_neardup_pairs(docs, 0.6, 0.5)

    return {"semantic_dedup": _semdedup, "gopher_rules": _gopher,
            "dsir_select": _dsir, "rolling_user_window": _rolling,
            "normalize_text": _normalize, "source_quota_sample": _quota,
            "dedup_lines_within_doc": _dedup_lines,
            "hybrid_search_rrf": _hybrid, "training_shards": _shards,
            "interleaved_curation": _interleaved,
            "interleaved_neardup": _interleaved_neardup}


def run_queries() -> dict:
    import __ray_entry__ as entrymod

    q = entrymod.queries()
    out = {}
    for name in QUERY_NAMES:
        t0 = time.monotonic()
        _consume(q[name](SF_DIR))
        out[name] = round(time.monotonic() - t0, 2)
    for name, fn in _extra_ops().items():
        t0 = time.monotonic()
        _consume(fn(SF_DIR))
        out[name] = round(time.monotonic() - t0, 2)
    return out


def main() -> None:
    import ray

    if not ray.is_initialized():
        # install the schema-hash-warning filter in EVERY worker
        # (pure-closure stages don't import olx_ray on unpickle, so its
        # import-time filter alone misses reduce tasks)
        import olx_ray

        ray.init(address="local", num_cpus=NCPU, include_dashboard=False,
                 logging_level="ERROR",
                 runtime_env={"worker_process_setup_hook":
                              olx_ray.make_worker_log_silencer()})
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    crawl_only = "--crawl-only" in sys.argv
    queries_only = "--queries-only" in sys.argv
    frontier_only = "--frontier-only" in sys.argv
    calib_pre = host_calibration()     # bracket the run: the sandbox
    # host's speed swings 1-15x on minute timescales, so a single probe
    # can miss a mid-run degradation
    if frontier_only:
        # frontier data path alone (dedup shuffle + seen-actor RPCs),
        # decoupled from simulated fetch latency — the north metric's
        # "frontier ops/sec" measured directly (pipelines/frontier_bench)
        from olx_ray.pipelines.frontier_bench import run_frontier_rounds

        # 8M-row rounds: the per-round fixed costs (executor barriers,
        # actor RPC floor, driver scheduling) amortize past ~8M rows —
        # measured r5: 4M rounds read 0.62-0.69 efficiency, 8M read
        # 0.85 with HIGHER absolute throughput at both CPU counts;
        # 16M adds nothing (the 32-CPU end saturates at ~3.3M rows/s
        # on the single shared object store — BASELINE.md "frontier
        # scaling bound")
        crawl = run_frontier_rounds(8_000_000, n_rounds=3, n_shards=16)
        queries = {}
    else:
        crawl = ({"crawl_sec": 0.0} if queries_only else run_crawl(NCPU))
        queries = {} if crawl_only else run_queries()
    calib_post = host_calibration()
    # pre/post probes bracketing the run: when they diverge >20% (or
    # either reads ≥2.5 s — healthy host ≈ 1.0-1.5 s) the host was
    # throttled mid-run and the wall-times are NOT comparable across
    # sessions; the record says so instead of silently reading as a
    # regression (r3 post-mortem: crawl 88.9 s / minhash 7.4 s were
    # pure throttle — probes 1.22 s pre vs 2.06 s post)
    div = round(max(calib_pre, calib_post)
                / max(min(calib_pre, calib_post), 1e-9), 3)
    result = {
        "metric": ("frontier rows/sec (dedup + sharded seen check/seal, "
                   "no fetch latency)" if frontier_only else
                   "native crawl pages/sec over bench site (2k listings, "
                   "~47k ads, simulated latency)"),
        "value": crawl.get("crawl_sec", crawl.get("frontier_wall_sec")),
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
        "num_cpus": NCPU,
        "host_calib_pre_sec": calib_pre,
        "host_calib_sec": calib_post,
        "host_calib_divergence": div,
        "host_throttled": bool(div > 1.2
                               or max(calib_pre, calib_post) >= 2.5),
        **crawl,
    }
    print(json.dumps(result))
    ray.shutdown()


def run_scaling() -> None:
    """Same crawl input at num_cpus=8 and 32 in fresh processes; plus
    the frontier-only microbench at both levels (the north metric's
    frontier ops/sec, decoupled from simulated fetch latency)."""
    def run(ncpu: int, mode: str = "--crawl-only") -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), mode],
            env=env, capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__))).stdout
        return json.loads(out.strip().splitlines()[-1])

    run(32)  # warm the page cache + site store (untimed, BASELINE.md)
    lo = run(8)
    hi = run(32)
    flo = run(8, "--frontier-only")
    fhi = run(32, "--frontier-only")
    eff = (lo["pages_per_sec"] and
           (hi["pages_per_sec"] / lo["pages_per_sec"]) / (32 / 8))
    feff = (flo["frontier_rows_per_sec"] and
            (fhi["frontier_rows_per_sec"] / flo["frontier_rows_per_sec"])
            / (32 / 8))
    print(json.dumps({
        "pages_per_sec_8": lo["pages_per_sec"],
        "pages_per_sec_32": hi["pages_per_sec"],
        "crawl_sec_8": lo["crawl_sec"],
        "crawl_sec_32": hi["crawl_sec"],
        "frontier_ops_per_sec_8": lo["frontier_ops_per_sec"],
        "frontier_ops_per_sec_32": hi["frontier_ops_per_sec"],
        "frontier_rows_per_sec_8": flo["frontier_rows_per_sec"],
        "frontier_rows_per_sec_32": fhi["frontier_rows_per_sec"],
        "frontier_scaling_efficiency": round(feff, 3),
        "scaling_efficiency": round(eff, 3),
        # host parity across the two timed runs (see main()'s probes):
        # a throttle hitting ONE leg skews efficiency either way
        "host_calib_8": [lo["host_calib_pre_sec"], lo["host_calib_sec"]],
        "host_calib_32": [hi["host_calib_pre_sec"], hi["host_calib_sec"]],
        "host_throttled": bool(lo["host_throttled"] or hi["host_throttled"]),
    }))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    else:
        main()
