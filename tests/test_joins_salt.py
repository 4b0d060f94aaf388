"""Hot-key salted bucket_hash_join: identical output, spread placement."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _datasets():
    import ray.data as rd

    rng = np.random.RandomState(3)
    # VALUE skew: key 7 carries 5000 left rows; the rest are uniform
    lk = np.concatenate([np.full(5000, 7), rng.randint(0, 100, 2000)])
    left = pa.table({"k": pa.array(lk, pa.int64()),
                     "lv": pa.array(np.arange(len(lk)), pa.int64())})
    rk = np.repeat(np.arange(100), 2)      # every key twice on the right
    right = pa.table({"k": pa.array(rk, pa.int64()),
                      "rv": pa.array(np.arange(len(rk)), pa.int64())})
    return rd.from_arrow(left), rd.from_arrow(right), \
        left.to_pandas(), right.to_pandas()


def test_salted_join_output_identical(ray_session):
    from olx_ray.functions.joins import bucket_hash_join

    lds, rds, lpd, rpd = _datasets()
    want = lpd.merge(rpd, on="k").sort_values(["k", "lv", "rv"]) \
        .reset_index(drop=True)
    plain = bucket_hash_join(lds, rds, on="k").to_pandas() \
        .sort_values(["k", "lv", "rv"]).reset_index(drop=True)
    salted = bucket_hash_join(lds, rds, on="k", hot_keys=[7], salt=8) \
        .to_pandas().sort_values(["k", "lv", "rv"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(plain[want.columns], want)
    pd.testing.assert_frame_equal(salted[want.columns], want)


def test_salted_join_single_base_bucket(ray_session):
    """n_buckets=1 forces every row through the sub-bucket arithmetic
    (combined id = base*salt + sub) — hot replication and round-robin
    spread must still reassemble the exact join output."""
    from olx_ray.functions.joins import bucket_hash_join

    lds, rds, lpd, rpd = _datasets()
    want = lpd.merge(rpd, on="k").sort_values(["k", "lv", "rv"]) \
        .reset_index(drop=True)
    out = bucket_hash_join(lds, rds, on="k", n_buckets=1,
                           hot_keys=[7], salt=8).to_pandas() \
        .sort_values(["k", "lv", "rv"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out[want.columns], want)


def test_salting_rejects_outer_join(ray_session):
    import pytest

    from olx_ray.functions.joins import bucket_hash_join

    lds, rds, _, _ = _datasets()
    with pytest.raises(ValueError, match="inner"):
        bucket_hash_join(lds, rds, on="k", how="left", hot_keys=[7])


def test_detect_hot_keys_finds_the_skewed_key(ray_session):
    from olx_ray.functions.joins import detect_hot_keys

    lds, _, lpd, _ = _datasets()
    hot = detect_hot_keys(lds, "k")
    assert 7 in hot
    # nothing cold sneaks in: every flagged key is genuinely above the
    # conservative ceiling (5000/7000 for key 7; uniform keys ~20/7000)
    counts = lpd["k"].value_counts()
    assert all(counts[k] > 50 for k in hot)


def test_auto_hot_keys_output_identical(ray_session):
    from olx_ray.functions.joins import bucket_hash_join

    lds, rds, lpd, rpd = _datasets()
    want = lpd.merge(rpd, on="k").sort_values(["k", "lv", "rv"]) \
        .reset_index(drop=True)
    out = bucket_hash_join(lds, rds, on="k", hot_keys="auto") \
        .to_pandas().sort_values(["k", "lv", "rv"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out[want.columns], want)


def test_detect_hot_keys_uniform_input_flags_nothing(ray_session):
    import ray.data as rd

    from olx_ray.functions.joins import detect_hot_keys

    k = np.arange(20000, dtype=np.int64) % 5000     # 4 rows per key
    ds = rd.from_arrow(pa.table({"k": pa.array(k, pa.int64())}))
    assert len(detect_hot_keys(ds, "k", capacity=8192)) == 0
