"""Additional crawl coverage: t2-scale conformance, politeness clock
serialization, raw_html sidecar, hot-host skew reach."""

import datetime
import os
import time

import pytest
import ray

from olx_ray.pipelines.crawl import CrawlConfig, crawl_conformance, crawl_native
from olx_ray.sources.goldens import golden_conformance_trace, golden_documents
from olx_ray.sources.sitegen import SiteSpec, write_site
from olx_ray.stages.politeness import PolitenessGate, gate_for, make_gates
from olx_ray import storage


@pytest.fixture(scope="module")
def site_t2x(ray_session, tmp_root):
    return write_site("t2", os.path.join(tmp_root, "site_t2x"))


def test_conformance_t2_trace(site_t2x, tmp_root):
    """t2 scale: 500-count over a 20-link page → 25 unfold iterations of
    the SAME listing URL (quirk Q2), 500 ad fetches."""
    site = SiteSpec("t2")
    cfg = CrawlConfig(pages_dir=site_t2x["pages"],
                      out_dir=os.path.join(tmp_root, "conf_t2"))
    res = crawl_conformance(cfg, site.listing(0).url, site.max_count)
    g = golden_conformance_trace("t2")
    assert [(u, a) for _, u, a in res.trace] == [(u, a) for _, u, a in g.visits]
    n_listing_visits = sum(1 for _, _, a in res.trace if a == "fetch_listing")
    assert n_listing_visits == 25          # ceil(500/20): Q2 refetches
    assert res.n_documents == 500


def test_politeness_gate_serializes_per_host(ray_session):
    gate = PolitenessGate.remote({"h.ua": "User-agent: *\nCrawl-delay: 2\n"})
    # the gate reads its OWN clock (caller monotonic values are not
    # cross-node comparable): back-to-back acquires see waits shrunk
    # only by the microseconds elapsed between the calls
    w1 = ray.get(gate.acquire.remote("h.ua", 3))
    w2 = ray.get(gate.acquire.remote("h.ua", 2))
    # first caller starts immediately; second waits for ~3 × 2s
    assert w1 == 0.0 and 5.5 < w2 <= 6.0
    # other hosts are independent
    assert ray.get(gate.acquire.remote("other.ua", 5)) == 0.0
    # robots disallow honored
    allowed = ray.get(gate.allowed.remote("h.ua", ["/ok", "/admin/x"]))
    gate2 = PolitenessGate.remote({"h.ua": "User-agent: *\nDisallow: /admin/\n"})
    allowed = ray.get(gate2.allowed.remote("h.ua", ["/ok", "/admin/x"]))
    assert allowed == [True, False]
    ray.kill(gate)
    ray.kill(gate2)


def test_gate_routing_stable(ray_session):
    gates = make_gates(4, {})
    assert gate_for(gates, "www.olx.ua") is gate_for(gates, "www.olx.ua")
    for g in gates:
        ray.kill(g)


def test_raw_html_sidecar(site_t2x, tmp_root):
    out = os.path.join(tmp_root, "raw_html_job")
    cfg = CrawlConfig(pages_dir=site_t2x["pages"], out_dir=out,
                      keep_raw_html=True, collect_trace=False)
    crawl_native(cfg, SiteSpec("t2").seed_rows())
    raws = []
    for d in sorted(os.listdir(out)):
        p = os.path.join(out, d, "raw_html")
        if os.path.isdir(p) and any(f.endswith(".parquet")
                                    for f in os.listdir(p)):
            raws.append(storage.read_table(p))
    import pyarrow as pa

    tbl = pa.concat_tables(raws)
    specs = SiteSpec("t2").all_ad_specs()
    assert tbl.num_rows == len(specs)
    row = tbl.slice(0, 1).to_pylist()[0]
    # sidecar holds the exact fetched body
    assert row["raw_html"] == specs[row["doc_id"]].html()


def test_native_reaches_hot_host(site_t2x, tmp_root):
    """The hub page's fully-qualified links put real load on a second
    host in native mode (the skew path, SURVEY.md §4.2)."""
    from olx_ray.pipelines.metrics import host_stats

    out = os.path.join(tmp_root, "hot_host_job")
    crawl_native(CrawlConfig(pages_dir=site_t2x["pages"], out_dir=out),
                 SiteSpec("t2").seed_rows())
    hs = host_stats(out).to_pandas()
    hub = hs[(hs.host == "hub.olx.ua") & (hs.action == "fetch_ad")]
    assert not hub.empty and int(hub.n.iloc[0]) > 0


def test_fresh_rerun_same_outdir_no_duplicates(ray_session, tmp_path):
    """A non-resume crawl into an out_dir holding a previous run's
    committed rounds must wipe them — not append fragments beside the
    old ones and double the frontier/documents."""
    from olx_ray.pipelines.crawl import (CrawlConfig, crawl_native,
                                         read_documents)
    from olx_ray.sources.sitegen import SiteSpec, write_site

    site = write_site("t1", str(tmp_path / "site"))
    out = str(tmp_path / "out")
    cfg = CrawlConfig(pages_dir=site["pages"], out_dir=out,
                      collect_trace=False)
    r1 = crawl_native(cfg, SiteSpec("t1").seed_rows())
    docs1 = sorted(r["doc_id"] for r in read_documents(out).take_all())
    r2 = crawl_native(cfg, SiteSpec("t1").seed_rows())
    docs2 = sorted(r["doc_id"] for r in read_documents(out).take_all())
    assert docs1 == docs2
    assert r1.n_documents == r2.n_documents


def test_native_t2_trace_vs_golden(site_t2x, tmp_root):
    """t2 native run vs golden: exercises what t1 cannot — the dead
    link surviving the cap (fetch_404 recorded, slot consumed), the
    hot-hub host diversity, and cross-page dup seen-filtering at
    25% dup rate over 20 pages."""
    import os

    from olx_ray.pipelines.crawl import CrawlConfig, crawl_native
    from olx_ray.sources.goldens import golden_native_trace
    from olx_ray.sources.sitegen import SiteSpec

    site = SiteSpec("t2")
    cfg = CrawlConfig(pages_dir=site_t2x["pages"],
                      out_dir=os.path.join(tmp_root, "native_t2"))
    res = crawl_native(cfg, site.seed_rows())
    g = golden_native_trace("t2")
    assert [(u, a) for _, u, a in res.trace] == [(u, a) for _, u, a in g.visits]
    # the dead link IS in the native t2 trace as fetch_404
    assert any(a == "fetch_404" for _, _, a in res.trace)
    assert res.n_documents == len(g.documents)


def test_log_silencer_filters_only_cosmetic_records():
    """The worker log silencer drops ONLY the two cosmetic Ray Data
    messages (schema-hash failure; empty-block schema divergence) —
    a real non-empty schema divergence must stay visible."""
    import logging

    from olx_ray import make_worker_log_silencer

    make_worker_log_silencer()()

    def emits(logger_name: str, msg: str) -> bool:
        rec = logging.LogRecord(logger_name, logging.WARNING, __file__,
                                0, msg, None, None)
        return all(f.filter(rec)
                   for f in logging.getLogger(logger_name).filters)

    exec_log = "ray.data._internal.execution.streaming_executor_state"
    assert not emits(exec_log,
                     "Operator produced a RefBundle with a different "
                     "schema than the previous one. Previous schema: "
                     "a: int64, new schema: . This may lead to "
                     "unexpected behavior.")
    assert not emits(exec_log,
                     "Operator produced a RefBundle with a different "
                     "schema than the previous one. Previous schema: "
                     "a: int64, new schema: None. This may lead to "
                     "unexpected behavior.")
    assert not emits(exec_log,
                     "Operator produced a RefBundle with a different "
                     "schema than the previous one. Previous schema: "
                     "PandasBlockSchema(names=['a'], types=[dtype("
                     "'int64')]), new schema: PandasBlockSchema("
                     "names=[], types=[]). This may lead to "
                     "unexpected behavior.")
    # a REAL divergence (both schemas non-empty) is NOT filtered
    assert emits(exec_log,
                 "Operator produced a RefBundle with a different "
                 "schema than the previous one. Previous schema: "
                 "a: int64, new schema: a: double. This may lead to "
                 "unexpected behavior.")
    assert emits(exec_log, "some other warning")

    hash_log = "ray.data._internal.arrow_ops.transform_pyarrow"
    assert not emits(hash_log,
                     "Failed to hash the schemas (for deduplication)")
    assert emits(hash_log, "some other warning")


def test_make_candidates_requires_search_id():
    """A batch without search_id means the carry contract broke
    upstream — fabricating an id would silently misattribute every
    candidate (wrong caps, wrong documents); the kernel fails loud."""
    import pyarrow as pa
    import pytest

    from olx_ray.pipelines.crawl import MakeCandidates

    batch = pa.table({"url": ["https://h/x"], "page_url": ["https://h/l"],
                      "position": pa.array([0], pa.int64())})
    with pytest.raises(ValueError, match="search_id"):
        MakeCandidates({"https://h/l": 0}, 1, 4, 4)(batch)
