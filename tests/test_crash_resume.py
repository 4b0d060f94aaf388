"""Harsher resume: a crash MID-ROUND leaves partial parquet fragments
and no manifest — resume must wipe and redo that round with no
duplicate documents (SURVEY.md §7 'deterministic resume')."""

import os
import shutil

import pytest

from olx_ray.pipelines.crawl import CrawlConfig, crawl_native, read_documents
from olx_ray.sources.sitegen import SiteSpec, write_site
from olx_ray.state import checkpoint as ckpt


@pytest.fixture(scope="module")
def site(ray_session, tmp_root):
    return write_site("t1", os.path.join(tmp_root, "site_crash"))


def _docs(out):
    ds = read_documents(out)
    return [r["doc_id"] for r in ds.sort(["round", "fetched_seq"]).take_all()]


def test_mid_round_crash_resume(site, tmp_root):
    ref = os.path.join(tmp_root, "crash_ref")
    crawl_native(CrawlConfig(pages_dir=site["pages"], out_dir=ref),
                 SiteSpec("t1").seed_rows())

    # simulate a crash inside round 2: run rounds 0-1 cleanly, then fake
    # partial round-2 leftovers (document fragments, no manifest)
    out = os.path.join(tmp_root, "crash_run")
    crawl_native(CrawlConfig(pages_dir=site["pages"], out_dir=out,
                             max_rounds=2), SiteSpec("t1").seed_rows())
    assert ckpt.latest_complete_round(out) == 1
    r2 = ckpt.round_dir(out, 2)
    os.makedirs(os.path.join(r2, "documents"), exist_ok=True)
    # plant a bogus partial fragment that would duplicate doc rows
    src_docs = os.path.join(ckpt.round_dir(out, 1), "documents")
    frag = next(f for f in os.listdir(src_docs) if f.endswith(".parquet"))
    shutil.copy(os.path.join(src_docs, frag),
                os.path.join(r2, "documents", "partial-crash.parquet"))
    assert ckpt.latest_complete_round(out) == 1  # manifest absent → incomplete

    crawl_native(CrawlConfig(pages_dir=site["pages"], out_dir=out,
                             resume=True), SiteSpec("t1").seed_rows())
    assert _docs(out) == _docs(ref)  # no duplicates, byte-equal doc order
