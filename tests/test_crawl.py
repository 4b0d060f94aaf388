"""End-to-end crawl tests: conformance + native traces vs golden oracles,
determinism under parallelism, budget invariance, resume, seen-filter
equivalence. All through the real Ray Data pipelines."""

import os

import pytest

from olx_ray.functions.hashing import hash64
from olx_ray.pipelines.crawl import (CrawlConfig, crawl_conformance,
                                     crawl_native, read_documents)
from olx_ray.sources.goldens import (golden_conformance_trace,
                                     golden_documents, golden_native_trace)
from olx_ray.sources.sitegen import SiteSpec, write_site
from olx_ray.state import checkpoint as ckpt
from olx_ray import storage


@pytest.fixture(scope="module")
def site_t1(ray_session, tmp_root):
    return write_site("t1", os.path.join(tmp_root, "site_t1"))


def _docs_in_order(out_dir):
    ds = read_documents(out_dir)
    if ds is None:
        return []
    rows = ds.sort(["round", "fetched_seq"]).take_all()
    return [(r["doc_id"], [dict(s) for s in r["spans"]]) for r in rows]


def _final_seen_hashes(out_dir):
    r = ckpt.latest_complete_round(out_dir)
    tbl = storage.read_table(os.path.join(ckpt.round_dir(out_dir, r), "seen"))
    import numpy as np
    out = set()
    for raw in tbl["exact_hashes"].to_pylist():
        out.update(np.frombuffer(raw, dtype=np.uint64).tolist())
    return out


def test_conformance_trace_and_docs(site_t1, tmp_root):
    site = SiteSpec("t1")
    cfg = CrawlConfig(pages_dir=site_t1["pages"],
                      out_dir=os.path.join(tmp_root, "conf_t1"))
    res = crawl_conformance(cfg, site.listing(0).url, site.max_count)
    g = golden_conformance_trace("t1")
    assert [(u, a) for _, u, a in res.trace] == [(u, a) for _, u, a in g.visits]
    got = _docs_in_order(cfg.out_dir)
    assert [d for d, _ in got] == g.documents
    golden_spans = golden_documents("t1")
    for doc_id, spans in got:
        assert spans == golden_spans[doc_id]


def test_native_trace_docs_and_seen(site_t1, tmp_root):
    site = SiteSpec("t1")
    cfg = CrawlConfig(pages_dir=site_t1["pages"],
                      out_dir=os.path.join(tmp_root, "native_t1"))
    res = crawl_native(cfg, site.seed_rows())
    g = golden_native_trace("t1")
    assert [(u, a) for _, u, a in res.trace] == [(u, a) for _, u, a in g.visits]
    got = _docs_in_order(cfg.out_dir)
    assert [d for d, _ in got] == g.documents
    golden_spans = golden_documents("t1", native=True)
    for doc_id, spans in got:
        assert spans == golden_spans[doc_id]
    # final URL-seen set matches the golden exactly (north_rule)
    assert _final_seen_hashes(cfg.out_dir) == {hash64(u) for u in g.seen}


def test_native_parallelism_invariance(site_t1, tmp_root):
    """8-vs-32-CPU stand-in at fixture scale: different fetcher pool sizes
    and batch sizes must produce the identical trace + documents."""
    site = SiteSpec("t1")
    outs = []
    for tag, conc, bs in (("p1", 1, 4), ("p4", 4, 64)):
        cfg = CrawlConfig(pages_dir=site_t1["pages"],
                          out_dir=os.path.join(tmp_root, f"nat_{tag}"),
                          fetcher_concurrency=conc, fetch_batch_size=bs)
        res = crawl_native(cfg, site.seed_rows())
        outs.append((res.trace, _docs_in_order(cfg.out_dir),
                     _final_seen_hashes(cfg.out_dir)))
    assert outs[0] == outs[1]


def test_native_budget_invariance(site_t1, tmp_root):
    """A per-round budget changes the round structure but must not change
    the final document SET or the URL-seen set."""
    site = SiteSpec("t1")
    cfg_full = CrawlConfig(pages_dir=site_t1["pages"],
                           out_dir=os.path.join(tmp_root, "nat_full"))
    crawl_native(cfg_full, site.seed_rows())
    cfg_b = CrawlConfig(pages_dir=site_t1["pages"],
                        out_dir=os.path.join(tmp_root, "nat_budget"),
                        budget_per_round=7, max_rounds=64)
    crawl_native(cfg_b, site.seed_rows())
    docs_full = {d for d, _ in _docs_in_order(cfg_full.out_dir)}
    docs_b = {d for d, _ in _docs_in_order(cfg_b.out_dir)}
    assert docs_full == docs_b
    assert _final_seen_hashes(cfg_full.out_dir) == _final_seen_hashes(cfg_b.out_dir)


def test_native_resume_determinism(site_t1, tmp_root):
    """Kill after round 1 → resume → byte-identical final docs + seen set
    (north_rule: resumable from checkpoint)."""
    site = SiteSpec("t1")
    ref_cfg = CrawlConfig(pages_dir=site_t1["pages"],
                          out_dir=os.path.join(tmp_root, "nat_ref"))
    crawl_native(ref_cfg, site.seed_rows())
    # interrupted run: stop after 2 rounds, then resume
    out = os.path.join(tmp_root, "nat_resume")
    cfg1 = CrawlConfig(pages_dir=site_t1["pages"], out_dir=out, max_rounds=2)
    crawl_native(cfg1, site.seed_rows())
    cfg2 = CrawlConfig(pages_dir=site_t1["pages"], out_dir=out, resume=True)
    crawl_native(cfg2, site.seed_rows())
    assert _docs_in_order(out) == _docs_in_order(ref_cfg.out_dir)
    assert _final_seen_hashes(out) == _final_seen_hashes(ref_cfg.out_dir)


def test_native_bloom_mode_equivalence(site_t1, tmp_root):
    """bloom-only membership must yield the same crawl as exact membership
    at fixture scale (fpr sized so collisions are ~impossible)."""
    site = SiteSpec("t1")
    cfg = CrawlConfig(pages_dir=site_t1["pages"],
                      out_dir=os.path.join(tmp_root, "nat_bloom"),
                      seen_mode="bloom")
    res = crawl_native(cfg, site.seed_rows())
    g = golden_native_trace("t1")
    assert [(u, a) for _, u, a in res.trace] == [(u, a) for _, u, a in g.visits]
