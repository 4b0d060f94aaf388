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


def test_seen_segment_roundtrip_preserves_empty_exact(ray_session):
    """An EMPTY exact set must survive checkpoint/restore as exact mode
    (not silently degrade to bloom-only, whose false positives would
    break resume determinism), while a genuinely degraded shard must
    restore as degraded — and exact-mode queries on it must fail loudly
    rather than answer from the bloom filter."""
    import numpy as np
    import pytest as _pytest

    from olx_ray.stages.seen import SeenShard

    fresh = SeenShard.remote(0, 1000)
    seg = __import__("ray").get(fresh.segment.remote())
    assert seg["exact_alive"] and seg["exact_hashes"] == b""
    restored = SeenShard.remote(0, 1000)
    __import__("ray").get(restored.restore.remote(seg))
    # exact mode still answers (empty set => nothing seen)
    out = __import__("ray").get(restored.contains.remote(
        np.array([1, 2], dtype=np.uint64), "exact"))
    assert not out.any()

    degraded = SeenShard.remote(1, 1000, 1e-6, 0)   # exact_cap=0 → None
    seg2 = __import__("ray").get(degraded.segment.remote())
    assert not seg2["exact_alive"]
    restored2 = SeenShard.remote(1, 1000)
    __import__("ray").get(restored2.restore.remote(seg2))
    with _pytest.raises(Exception, match="exact"):
        __import__("ray").get(restored2.contains.remote(
            np.array([1], dtype=np.uint64), "exact"))


def test_seen_fmt_mismatch_rebuilds_bloom_from_exact(ray_session):
    """A checkpoint written under an older bloom probe derivation must
    NOT be probed with the current one: while the exact set survives,
    restore rebuilds the bloom from it — bloom-mode answers stay
    correct (no false negatives → no re-crawls)."""
    import ray as _ray

    from olx_ray.stages.seen import SeenShard

    keys = np.arange(1, 200, dtype=np.uint64) * np.uint64(0x9E3779B1)
    shard = SeenShard.remote(0, 1000)
    _ray.get(shard.add.remote(keys))
    seg = _ray.get(shard.segment.remote())
    for stale_fmt in (1, None):
        old = dict(seg)
        if stale_fmt is None:
            old.pop("seen_fmt")          # pre-versioning checkpoint
        else:
            old["seen_fmt"] = stale_fmt
        restored = SeenShard.remote(0, 1000)
        _ray.get(restored.restore.remote(old))
        assert _ray.get(restored.contains.remote(keys, "bloom")).all()
        assert _ray.get(restored.contains.remote(keys, "exact")).all()


def test_seen_fmt_mismatch_degraded_refuses_restore(ray_session):
    """A DEGRADED (bloom-only) shard checkpointed under an older probe
    derivation cannot be trusted — restore must fail loudly instead of
    silently re-crawling seen URLs."""
    import pytest as _pytest
    import ray as _ray

    from olx_ray.stages.seen import SeenShard

    shard = SeenShard.remote(0, 1000, 1e-6, 0)    # exact_cap=0 → degraded
    _ray.get(shard.add.remote(np.arange(5, dtype=np.uint64)))
    seg = _ray.get(shard.segment.remote())
    assert not seg["exact_alive"]
    seg["seen_fmt"] = 1
    restored = SeenShard.remote(0, 1000)
    with _pytest.raises(Exception, match="seen_fmt"):
        _ray.get(restored.restore.remote(seg))


def test_seen_exact_store_lazy_merge_and_degrade(ray_session):
    """The vectorized exact store (sorted uint64 array + lazily-merged
    pending chunks) must behave exactly like the old per-int set:
    membership across many small unmerged adds, set-equal segments, and
    a degrade to bloom-only once the UNIQUE count passes exact_cap —
    duplicates must NOT count toward the cap."""
    import ray as _ray

    from olx_ray.stages.seen import SeenShard

    shard = SeenShard.remote(0, 10_000, 1e-6, 60)
    # 12 tiny adds (far below the merge threshold → all stay pending),
    # heavily duplicated: 60 unique keys total, at the cap exactly
    for i in range(12):
        ks = (np.arange(10, dtype=np.uint64) + np.uint64(5 * i))
        _ray.get(shard.add.remote(ks))
    uniq = np.unique(np.concatenate(
        [np.arange(10, dtype=np.uint64) + np.uint64(5 * i)
         for i in range(12)]))
    assert len(uniq) == 65
    # 65 unique > cap 60 → degraded on the next probe/segment
    seg = _ray.get(shard.segment.remote())
    assert not seg["exact_alive"]
    # bloom still answers with no false negatives
    assert _ray.get(shard.contains.remote(uniq, "both")).all()

    # under the cap: unmerged membership is exact and order-insensitive
    shard2 = SeenShard.remote(1, 10_000, 1e-6, 60)
    _ray.get(shard2.add.remote(np.array([9, 3, 9, 7], np.uint64)))
    _ray.get(shard2.add.remote(np.array([3, 11], np.uint64)))
    got = _ray.get(shard2.contains.remote(
        np.array([3, 4, 7, 9, 11, 12], np.uint64), "exact"))
    assert got.tolist() == [True, False, True, True, True, False]
    seg2 = _ray.get(shard2.segment.remote())
    assert set(np.frombuffer(seg2["exact_hashes"], np.uint64)) == \
        {3, 7, 9, 11}
