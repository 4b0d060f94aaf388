"""Task-retry safety: Ray re-executes failed map tasks, so every stage
that talks to shared actors must tolerate re-running the SAME batch —
seen-set adds must be state-idempotent, politeness must stay
conservative (never under-delay), and the fetch task must be a pure
function of its batch. Driver-side counters (crawl.py) are computed
from materialized datasets after the barrier, so they are out of scope
for task retries by construction (SCALE.md "task retries")."""

import numpy as np
import pyarrow as pa
import ray


def test_seen_shard_add_is_idempotent(ray_session):
    from olx_ray.stages.seen import SeenShard

    shard = SeenShard.remote(0, capacity=1000)
    try:
        hs = np.array([11, 22, 33, 44], dtype=np.uint64)
        ray.get(shard.add.remote(hs))
        seg1 = ray.get(shard.segment.remote())
        # the retried task re-adds the identical hash batch
        ray.get(shard.add.remote(hs))
        seg2 = ray.get(shard.segment.remote())
        assert seg1["bloom_bits"] == seg2["bloom_bits"]  # incl. n_items
        assert seg1["n_items"] == seg2["n_items"]
        assert (set(np.frombuffer(seg1["exact_hashes"], dtype=np.uint64))
                == set(np.frombuffer(seg2["exact_hashes"], dtype=np.uint64)))
        got = ray.get(shard.contains.remote(
            np.array([11, 22, 99], dtype=np.uint64)))
        assert got.tolist() == [True, True, False]
    finally:
        ray.kill(shard)


def test_politeness_retry_is_conservative(ray_session):
    """A retried fetch re-acquires its host slots; the clock only moves
    forward, so a retry can over-delay but can NEVER under-delay (the
    politeness invariant is one-sided)."""
    from olx_ray.stages.politeness import PolitenessGate

    import time

    gate = PolitenessGate.remote(
        {"h.example": "User-agent: *\nCrawl-delay: 2\n"})
    try:
        t0 = time.monotonic()   # same node as the actor → comparable
        w1 = ray.get(gate.acquire.remote("h.example", 3))
        w2 = ray.get(gate.acquire.remote("h.example", 3))  # retry
        assert w1 == 0.0
        # the retried slots queue AFTER the originals (minus the
        # microseconds elapsed between the two calls)
        assert w2 >= 3 * 2.0 - 0.5
        snap = ray.get(gate.snapshot.remote())
        nf = snap["next_free"]["h.example"]
        assert t0 + 2 * 3 * 2.0 - 0.5 <= nf <= time.monotonic() + 2 * 3 * 2.0
    finally:
        ray.kill(gate)


def test_fetch_batch_pure_under_reexecution(ray_session, tmp_path):
    from olx_ray.sources.sitegen import SiteSpec, write_site
    from olx_ray.stages.fetch import fetch_batch

    paths = write_site("t1", str(tmp_path / "site"))
    spec = SiteSpec("t1")
    urls = [spec.listing(0).url, spec.listing(0).url + "?missing=1"]
    batch = pa.table({"url": pa.array(urls, pa.string())})
    a = fetch_batch(batch, pages_dir=paths["pages"])
    b = fetch_batch(batch, pages_dir=paths["pages"])
    assert a.equals(b)
    assert a["status"].to_pylist() == ["fetched", "fetch_404"]


def test_ensure_site_rebuilds_torn_cache(tmp_path):
    """A killed site build leaves partial shards but no _COMPLETE
    marker; ensure_site must rebuild, and must reuse a marked site."""
    import os

    from olx_ray.sources.sitegen import ensure_site, write_site

    root = str(tmp_path / "site")
    write_site("t1", root)
    marker = os.path.join(root, "_COMPLETE")
    assert os.path.exists(marker)

    # simulate the kill: truncate one shard, drop the marker
    shard = os.path.join(root, "pages", "shard-000.parquet")
    good = open(shard, "rb").read()
    open(shard, "wb").write(good[: len(good) // 2])
    os.remove(marker)
    ensure_site("t1", root)
    assert os.path.exists(marker)
    assert open(shard, "rb").read() == good

    # marked site is reused untouched
    before = os.stat(shard).st_mtime_ns
    ensure_site("t1", root)
    assert os.stat(shard).st_mtime_ns == before


def test_ensure_site_stale_marker_and_concurrent_rebuild(tmp_path):
    """Version/tier drift rebuilds; concurrent rebuilders racing on one
    stale root each get a complete site (pid-unique build dir + atomic
    rename publish) and leave no build litter behind."""
    import glob
    import multiprocessing as mp
    import os

    from olx_ray.sources.sitegen import SITE_VERSION, ensure_site

    root = str(tmp_path / "site")

    # stale (old-format) marker: must rebuild, new marker carries version
    os.makedirs(root)
    with open(os.path.join(root, "_COMPLETE"), "w") as f:
        f.write("t1")
    ensure_site("t1", root)
    with open(os.path.join(root, "_COMPLETE")) as f:
        assert f.read() == f"t1:v{SITE_VERSION}"

    # different tier at the same root: rebuild again
    ensure_site("t2", root)
    with open(os.path.join(root, "_COMPLETE")) as f:
        assert f.read() == f"t2:v{SITE_VERSION}"

    # 4 processes race the same stale root; each must come back with a
    # fully-populated pages dir and the current marker
    with open(os.path.join(root, "_COMPLETE"), "w") as f:
        f.write("stale")
    with mp.get_context("spawn").Pool(4) as pool:
        counts = pool.map(_race_build, [(root, "t1")] * 4)
    assert all(c == counts[0] and c > 0 for c in counts), counts
    assert not glob.glob(root + ".build-*")


def _race_build(args):
    root, tier = args
    import glob
    import os

    from olx_ray.sources.sitegen import ensure_site

    paths = ensure_site(tier, root)
    from olx_ray.sources.sitegen import SITE_VERSION
    with open(os.path.join(root, "_COMPLETE")) as f:
        assert f.read() == f"{tier}:v{SITE_VERSION}"
    return len(glob.glob(os.path.join(paths["pages"], "*.parquet")))
