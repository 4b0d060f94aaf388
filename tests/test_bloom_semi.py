"""functions/joins.py::bucket_semi / bloom_semi — the no-broadcast
semi/anti joins: exact equality with the broadcast reference on int
and string keys, bloom no-false-negative property, and the documented
inexact-mode semantics."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _mk(ray_rows: pd.DataFrame):
    import ray.data as rd

    return rd.from_arrow(pa.Table.from_pandas(ray_rows, preserve_index=False))


@pytest.fixture()
def int_sides():
    rng = np.random.default_rng(11)
    left = pd.DataFrame({
        "k": rng.integers(0, 1000, 5000).astype(np.int64),
        "v": np.arange(5000, dtype=np.int64)})
    # duplicate keys on the filter side must not duplicate left rows
    keys = pd.DataFrame({"k": np.r_[np.arange(0, 500, dtype=np.int64),
                                    np.arange(0, 500, 7, dtype=np.int64)]})
    return left, keys


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_bucket_semi_matches_broadcast(ray_session, int_sides):
    from olx_ray.functions.joins import broadcast_semi, bucket_semi

    left, keys = int_sides
    for anti in (False, True):
        want = broadcast_semi(_mk(left), set(keys["k"]), "k",
                              anti=anti).to_pandas()
        got = bucket_semi(_mk(left), _mk(keys), "k", anti=anti).to_pandas()
        pd.testing.assert_frame_equal(_sorted(got), _sorted(want),
                                      check_dtype=False)


def test_bloom_semi_exact_matches_broadcast(ray_session, int_sides):
    from olx_ray.functions.joins import bloom_semi, broadcast_semi

    left, keys = int_sides
    for anti in (False, True):
        want = broadcast_semi(_mk(left), set(keys["k"]), "k",
                              anti=anti).to_pandas()
        got = bloom_semi(_mk(left), _mk(keys), "k", anti=anti).to_pandas()
        pd.testing.assert_frame_equal(_sorted(got), _sorted(want),
                                      check_dtype=False)


def test_bloom_semi_string_keys(ray_session):
    from olx_ray.functions.joins import bloom_semi, broadcast_semi

    left = pd.DataFrame({"k": [f"url-{i % 40}" for i in range(400)],
                         "v": np.arange(400, dtype=np.int64)})
    keys = pd.DataFrame({"k": [f"url-{i}" for i in range(0, 40, 3)]})
    want = broadcast_semi(_mk(left), set(keys["k"]), "k").to_pandas()
    got = bloom_semi(_mk(left), _mk(keys), "k").to_pandas()
    pd.testing.assert_frame_equal(_sorted(got), _sorted(want),
                                  check_dtype=False)


def test_bloom_semi_inexact_never_drops_true_matches(ray_session, int_sides):
    from olx_ray.functions.joins import bloom_semi

    left, keys = int_sides
    got = bloom_semi(_mk(left), _mk(keys), "k", exact=False).to_pandas()
    true_keys = set(keys["k"])
    true_matches = left[left["k"].isin(true_keys)]
    # bloom has NO false negatives: every true match survives; false
    # positives are bounded by the documented fpr (checked loosely)
    assert set(true_matches["v"]).issubset(set(got["v"]))
    extras = got[~got["k"].isin(true_keys)]
    assert len(extras) <= max(50, 0.05 * len(left))


def test_bloom_semi_empty_key_side(ray_session):
    from olx_ray.functions.joins import bloom_semi

    left = pd.DataFrame({"k": np.arange(100, dtype=np.int64),
                         "v": np.arange(100, dtype=np.int64)})
    empty = pd.DataFrame({"k": pd.array([], dtype="int64")})
    assert bloom_semi(_mk(left), _mk(empty), "k").count() == 0
    assert bloom_semi(_mk(left), _mk(empty), "k", anti=True).count() == 100


def test_bloom_semi_clamped_geometry_still_exact(ray_session, int_sides):
    """max_bits far below for_capacity's ask degrades fpr only — the
    exact answer is unchanged."""
    from olx_ray.functions.joins import bloom_semi, broadcast_semi

    left, keys = int_sides
    want = broadcast_semi(_mk(left), set(keys["k"]), "k").to_pandas()
    got = bloom_semi(_mk(left), _mk(keys), "k", max_bits=256).to_pandas()
    pd.testing.assert_frame_equal(_sorted(got), _sorted(want),
                                  check_dtype=False)


def test_ensure_arrow_schema_repairs_mixed_stream(ray_session):
    """A union of an Arrow stream and an (empty-able) pandas stream can
    report schema types like <class 'object'>; ensure_arrow_schema must
    repair it so bucket joins / export can build Arrow fields."""
    import pyarrow as pa
    import ray.data as rd

    from olx_ray.functions.blocks import ensure_arrow_schema

    arrow = rd.from_arrow(pa.table({"k": pa.array([1, 2], pa.int64()),
                                    "t": ["a", "b"]}))
    pandas_side = rd.from_arrow(pa.table({
        "k": pa.array([3], pa.int64()), "t": ["c"]})) \
        .map_batches(lambda b: b[b["k"] > 99], batch_format="pandas")
    mixed = arrow.union(pandas_side)
    fixed = ensure_arrow_schema(mixed)
    types = fixed.schema().types
    assert all(isinstance(t, pa.DataType) for t in types), types
    assert fixed.count() == 2
