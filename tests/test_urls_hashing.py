"""URL absolutization (reference M5 semantics), canonicalization, hashing."""

import numpy as np

from olx_ray.functions.hashing import digest_u64, hash64, hash64_array
from olx_ray.functions.urls import absolutize, canonicalize, host_of


def test_absolutize_replaces_path_keeps_query():
    # http4s withPath keeps scheme+authority+query (DownloadLinks.scala:47-49)
    assert (absolutize("https://www.olx.ua/list/uk?q=x", "/d/uk/ad-1")
            == "https://www.olx.ua/d/uk/ad-1?q=x")


def test_absolutize_full_url_becomes_path():
    # bug-for-bug: a full-URL href is treated as a raw path
    out = absolutize("https://www.olx.ua/list", "https://hub.olx.ua/d/ad-2")
    assert out == "https://www.olx.ua/https://hub.olx.ua/d/ad-2"


def test_absolutize_adds_leading_slash():
    assert absolutize("https://h.ua/a", "d/uk/x") == "https://h.ua/d/uk/x"


def test_canonicalize():
    assert canonicalize("HTTPS://WWW.OLX.ua:443/a/../b/./c#frag") == "https://www.olx.ua/b/c"
    assert canonicalize("http://h.ua:8080/x?q=1") == "http://h.ua:8080/x?q=1"
    assert canonicalize("https://h.ua") == "https://h.ua/"


def test_host_of():
    assert host_of("https://Hub.OLX.ua/d/x") == "hub.olx.ua"


def test_hash64_stable_and_spread():
    assert hash64("abc") == hash64("abc")
    assert hash64("abc") != hash64("abd")
    arr = hash64_array([f"url-{i}" for i in range(1000)])
    assert arr.dtype == np.uint64
    assert len(set(arr.tolist())) == 1000
    assert arr[0] == hash64("url-0")


def test_digest_order_insensitive():
    a = np.array([1, 2, 3], dtype=np.uint64)
    b = np.array([3, 1, 2], dtype=np.uint64)
    assert digest_u64(a) == digest_u64(b)


def test_absolutize_hand_computed_reference_cases():
    """Hand-derived expectations straight from the reference M5 spec
    (http4s withPath: replace path, keep scheme+authority+query, drop
    fragment) — independent of the implementation, so goldens that
    reuse absolutize() are anchored here."""
    from olx_ray.functions.urls import absolutize

    # base query string survives; href replaces ONLY the path
    assert absolutize("https://www.olx.ua/list/uk?p=2",
                      "/d/obyavlenie/x") == "https://www.olx.ua/d/obyavlenie/x?p=2"
    # relative href gets a leading slash
    assert absolutize("https://www.olx.ua/list/uk", "d/x") == \
        "https://www.olx.ua/d/x"
    # the M5 bug, verbatim: a fully-qualified href becomes a PATH
    # (leading slash added because the href does not start with '/')
    assert absolutize("https://www.olx.ua/list", "https://hub.olx.ua/a") == \
        "https://www.olx.ua/https://hub.olx.ua/a"
    # base fragment dropped
    assert absolutize("https://www.olx.ua/list#frag", "/a") == \
        "https://www.olx.ua/a"


def test_bucket_of_spreads_strided_ids():
    """Raw `id % n_buckets` collapses strided/shard-tagged id spaces
    into one bucket; bucket_of's xor-shift mix must spread them."""
    import numpy as np

    from olx_ray.functions.hashing import bucket_of

    for stride in (64, 128, 4096):
        ids = np.arange(2000, dtype=np.int64) * stride
        b = bucket_of(ids, 64)
        assert len(np.unique(b)) >= 48, f"stride {stride} collapsed"
        # deterministic
        assert (bucket_of(ids, 64) == b).all()


def test_knuth_fingerprint32_matches_hugeint_sql():
    import duckdb
    import numpy as np

    from olx_ray.functions.hashing import knuth_fingerprint32

    ids = np.array([0, 1, 2, 499, 2**31, 2**40, 2**62, 2**63 - 1],
                   dtype=np.int64)
    got = knuth_fingerprint32(ids)
    want = duckdb.sql(
        "SELECT (id::HUGEINT * 2654435761) % 4294967296 AS f FROM "
        "(SELECT unnest([0,1,2,499,2147483648,1099511627776,"
        "4611686018427387904,9223372036854775807]) AS id)").df()["f"]
    assert got.tolist() == [int(x) for x in want]


def test_collect_pandas_zero_row_and_normal(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from olx_ray.functions.blocks import collect_pandas

    ds = rd.from_pandas(pd.DataFrame({"a": [3, 1], "b": ["x", "y"]}))
    out = collect_pandas(ds, {"a": np.int64, "b": object})
    assert list(out.columns) == ["a", "b"] and len(out) == 2

    empty = ds.filter(expr="a > 100")       # zero rows drop columns
    out0 = collect_pandas(empty, {"a": np.int64, "b": object})
    assert list(out0.columns) == ["a", "b"] and len(out0) == 0
    assert out0["a"].dtype == np.int64

    # rows present but a requested column missing must RAISE, never
    # silently substitute the empty frame (a caller-side rename would
    # otherwise discard real rows, e.g. an empty dedup drop-id set)
    import pytest
    with pytest.raises(KeyError):
        collect_pandas(ds, {"a": np.int64, "zz": object})


def test_knuth_fingerprint32_rejects_negative_ids():
    import numpy as np
    import pytest

    from olx_ray.functions.hashing import knuth_fingerprint32

    with pytest.raises(ValueError):
        knuth_fingerprint32(np.array([-1, 5], dtype=np.int64))
    # empty input is fine
    assert len(knuth_fingerprint32(np.array([], dtype=np.int64))) == 0


def test_list_matrix_contract():
    """Arrow-native embedding decode: fixed-width fast path equals the
    boxing path, honors slice offsets, stays writable, and falls back
    on ragged/null columns instead of mis-reshaping."""
    import numpy as np
    import pyarrow as pa

    from olx_ray.functions.blocks import list_matrix

    m = np.arange(24, dtype=np.float32).reshape(6, 4)
    col = pa.array([r.tolist() for r in m], pa.list_(pa.float32()))
    out = list_matrix(col)
    assert out.dtype == np.float64 and np.array_equal(out, m)
    out[0, 0] = -1.0                       # must be writable

    sliced = list_matrix(col.slice(2, 3))
    assert np.array_equal(sliced, m[2:5])

    chunked = pa.chunked_array([col.slice(0, 2), col.slice(2, 4)])
    assert np.array_equal(list_matrix(chunked), m)

    # float64 source → zero-copy view would be read-only; contract
    # says writable comes back
    col64 = pa.array([r.tolist() for r in m], pa.list_(pa.float64()))
    w = list_matrix(col64)
    w[0, 0] = -1.0
    assert np.array_equal(list_matrix(col64), m)   # original unharmed

    # ragged / null rows: fail LOUD (numpy refuses the stack) — never a
    # silent wrong-shape reshape
    import pytest
    with pytest.raises(ValueError):
        list_matrix(pa.array([[1.0, 2.0], [3.0]], pa.list_(pa.float32())))
    with pytest.raises((ValueError, TypeError)):
        list_matrix(pa.array([[1.0, 2.0], None], pa.list_(pa.float32())))

    empty = pa.array([], pa.list_(pa.float32()))
    assert list_matrix(empty).shape == (0, 0)


def test_matrix_list_roundtrip():
    import numpy as np
    import pyarrow as pa

    from olx_ray.functions.blocks import list_matrix, matrix_list

    m = np.random.default_rng(2).normal(size=(5, 3))
    col = matrix_list(m)
    assert col.type == pa.list_(pa.float64())
    assert np.array_equal(list_matrix(col), m)
    assert col.to_pylist() == [r.tolist() for r in m]
