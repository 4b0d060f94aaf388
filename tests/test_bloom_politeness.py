"""Bloom filter + politeness gate unit tests (no Ray actors needed for
bloom; gates tested through Ray in test_crawl)."""

import numpy as np

from olx_ray.state.bloom import Bloom
from olx_ray.stages.politeness import parse_robots


def test_bloom_no_false_negatives_and_roundtrip():
    b = Bloom.for_capacity(10_000, fpr=0.01)
    keys = np.random.RandomState(42).randint(0, 2**63, 10_000, dtype=np.int64).astype(np.uint64)
    b.add(keys)
    assert b.contains(keys).all()  # no false negatives, ever
    other = np.random.RandomState(7).randint(0, 2**63, 10_000, dtype=np.int64).astype(np.uint64)
    fresh = np.setdiff1d(other, keys)
    fp = b.contains(fresh).mean()
    assert fp < 0.05  # near the 1% design point
    # serialization roundtrip
    b2 = Bloom.from_bytes(b.to_bytes())
    assert (b2.bits == b.bits).all() and b2.m == b.m and b2.k == b.k
    assert b2.contains(keys).all()
    # approximate distinct count within 10%
    assert abs(b.approx_count() - 10_000) / 10_000 < 0.1


def test_bloom_empty_contains():
    b = Bloom.for_capacity(100)
    assert b.contains(np.array([], dtype=np.uint64)).shape == (0,)
    assert not b.contains(np.array([123], dtype=np.uint64))[0]


def test_parse_robots():
    r = parse_robots("User-agent: *\nDisallow: /admin/\nCrawl-delay: 2\n\n"
                     "User-agent: evil\nDisallow: /\n")
    assert r["disallow"] == ["/admin/"]
    assert r["crawl_delay"] == 2.0
    assert parse_robots("")["disallow"] == []


def test_dedup_min_seq_modes_equivalent(ray_session):
    """Both dedup_min_seq paths (distributed bucketed default, driver
    dict for budget-bounded rounds) must keep the identical winner set:
    per key, the row with the smallest seq."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from olx_ray.stages.seen import dedup_min_seq

    rng = np.random.RandomState(3)
    n = 5000
    keys = rng.randint(0, 3000, n).astype(np.uint64)
    t = pa.table({
        "url_hash": pa.array(keys, pa.uint64()),
        "discovered_seq": pa.array(np.arange(n), pa.int64()),
        "payload": pa.array([f"u{k}" for k in keys], pa.string()),
    })
    ds = rd.from_arrow(t).repartition(8).materialize()
    a = dedup_min_seq(ds, mode="bucketed").to_pandas() \
        .sort_values("discovered_seq").reset_index(drop=True)
    b = dedup_min_seq(ds, mode="driver").to_pandas() \
        .sort_values("discovered_seq").reset_index(drop=True)
    assert a.equals(b)
    # winner = min seq per key, every key present exactly once
    assert a["url_hash"].is_unique and len(a) == len(set(keys.tolist()))
