"""Conformance-mode edge semantics on hand-built page stores:
- zero-link listing → the reference would spin forever (Q2+Q3); the
  engine detects the no-progress unfold and stops after one visit;
- dead ad link on the seed page → fetch error kills the job mid-stream
  (reference E1: OlxServer.scala:56-58), partial output persists."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from olx_ray.functions.hashing import hash64
from olx_ray.pipelines.crawl import CrawlConfig, crawl_conformance, read_documents
from olx_ray.schema import PAGES
from olx_ray.sources.sitegen import N_PAGE_SHARDS


def _write_pages(rows: list[dict], root: str) -> str:
    pages_dir = os.path.join(root, "pages")
    os.makedirs(pages_dir, exist_ok=True)
    for r in rows:
        r["fetch_shard"] = hash64(r["url"]) % N_PAGE_SHARDS
        r.setdefault("sim_latency_ms", 1)
    tbl = pa.table({f.name: pa.array([r[f.name] for r in rows], f.type)
                    for f in PAGES}, schema=PAGES)
    import pyarrow.compute as pc
    for s in range(N_PAGE_SHARDS):
        part = tbl.filter(pc.equal(tbl["fetch_shard"], s))
        pq.write_table(part, os.path.join(pages_dir, f"shard-{s:03d}.parquet"))
    return pages_dir


AD_HTML = ("<html><body><div data-cy='ad_title'>Тест</div>"
           "<div data-testid='ad-price-container'>1 грн.</div>"
           "<div id='mainContent'><ul></ul></div></body></html>")


def test_zero_link_listing_stops(ray_session, tmp_path):
    pages = _write_pages([
        {"url": "https://h.ua/list", "kind": "listing",
         "html": "<html><body><p>порожньо</p></body></html>"},
    ], str(tmp_path))
    cfg = CrawlConfig(pages_dir=pages, out_dir=str(tmp_path / "out"))
    res = crawl_conformance(cfg, "https://h.ua/list", 10)
    assert [(u, a) for _, u, a in res.trace] == [("https://h.ua/list",
                                                  "fetch_listing")]
    assert res.n_documents == 0


def test_dead_link_kills_job_partial_output(ray_session, tmp_path):
    listing = ("<html><body>"
               "<div data-testid='l-card' data-cy='l-card'><a href='/ad-1'>x</a></div>"
               "<div data-testid='l-card' data-cy='l-card'><a href='/dead'>x</a></div>"
               "<div data-testid='l-card' data-cy='l-card'><a href='/ad-2'>x</a></div>"
               "</body></html>")
    pages = _write_pages([
        {"url": "https://h.ua/list", "kind": "listing", "html": listing},
        {"url": "https://h.ua/ad-1", "kind": "ad", "html": AD_HTML},
        {"url": "https://h.ua/ad-2", "kind": "ad", "html": AD_HTML},
    ], str(tmp_path))
    cfg = CrawlConfig(pages_dir=pages, out_dir=str(tmp_path / "out"))
    res = crawl_conformance(cfg, "https://h.ua/list", 3)
    acts = [(u, a) for _, u, a in res.trace]
    assert acts == [("https://h.ua/list", "fetch_listing"),
                    ("https://h.ua/ad-1", "fetch_ad"),
                    ("https://h.ua/dead", "fetch_404")]
    # partial output persists (per-record inserts, H2.scala:58-64 analog)
    docs = read_documents(cfg.out_dir)
    assert [r["doc_id"] for r in docs.take_all()] == ["https://h.ua/ad-1"]
    assert res.n_documents == 1


def test_missing_seed_listing(ray_session, tmp_path):
    pages = _write_pages([
        {"url": "https://h.ua/other", "kind": "listing", "html": "<p></p>"},
    ], str(tmp_path))
    cfg = CrawlConfig(pages_dir=pages, out_dir=str(tmp_path / "out"))
    res = crawl_conformance(cfg, "https://h.ua/nope", 5)
    assert [(u, a) for _, u, a in res.trace] == [("https://h.ua/nope",
                                                  "fetch_404")]
    assert res.n_documents == 0


def test_conformance_rerun_no_resume(ray_session, tmp_path):
    """Pin the documented trade-off (SCALE.md "Known trade-offs"):
    conformance mode mirrors the reference's crash-loses-position
    behavior — NO checkpoint/resume machinery. A re-run over the same
    out_dir starts from scratch and REPLACES the documents table
    (never appends duplicates), and no round manifests are written, so
    a native-mode --resume over this out_dir finds nothing to resume."""
    from olx_ray.state import checkpoint as ckpt

    listing = ("<html><body>"
               "<div data-testid='l-card' data-cy='l-card'><a href='/ad-1'>x</a></div>"
               "<div data-testid='l-card' data-cy='l-card'><a href='/ad-2'>x</a></div>"
               "</body></html>")
    pages = _write_pages([
        {"url": "https://h.ua/list", "kind": "listing", "html": listing},
        {"url": "https://h.ua/ad-1", "kind": "ad", "html": AD_HTML},
        {"url": "https://h.ua/ad-2", "kind": "ad", "html": AD_HTML},
    ], str(tmp_path))
    cfg = CrawlConfig(pages_dir=pages, out_dir=str(tmp_path / "out"),
                      mode="conformance")
    r1 = crawl_conformance(cfg, "https://h.ua/list", 2)
    docs1 = sorted(r["doc_id"] for r in read_documents(cfg.out_dir).take_all())
    r2 = crawl_conformance(cfg, "https://h.ua/list", 2)
    docs2 = sorted(r["doc_id"] for r in read_documents(cfg.out_dir).take_all())
    assert docs1 == docs2 == ["https://h.ua/ad-1", "https://h.ua/ad-2"]
    assert r1.trace == r2.trace          # identical from-scratch runs
    assert ckpt.latest_complete_round(cfg.out_dir) is None  # no manifests
