"""Hypothesis property tests for the pure kernels (SURVEY.md §5.4)."""

import numpy as np
from hypothesis import example, given, settings
from hypothesis import strategies as st

from olx_ray.functions.hashing import digest_u64, hash64, hash64_array
from olx_ray.functions.urls import absolutize, canonicalize
from olx_ray.schema import pack_seq, unpack_seq
from olx_ray.stages.parse import java_split_colon, parse_brief
from olx_ray.state.bloom import Bloom


@given(st.text())
@example(":")
@example("::")
def test_java_split_colon_matches_java_semantics(s):
    parts = java_split_colon(s)
    if s and set(s) == {":"}:
        # Java removes trailing empty strings, so an all-colon input's
        # all-empty segments collapse to the LENGTH-0 array — the very
        # case where the reference's parts(0) access throws AIOOBE
        # (parse_brief docstring). Found by hypothesis in round 4.
        assert parts == []
    else:
        # otherwise never empty; reassembling with ':' prefixes the input
        assert parts
        assert s.startswith(":".join(parts)) or s.rstrip(":") == ":".join(parts)
    # no trailing empty strings (unless the single-element empty case)
    if len(parts) > 1:
        assert parts[-1] != ""


@given(st.lists(st.text(max_size=20), max_size=10))
def test_parse_brief_invariants(lines):
    pairs = parse_brief(lines)
    keys = [k for k, _ in pairs]
    assert len(keys) == len(set(keys))          # last-wins dedup
    assert all(k and v for k, v in pairs)       # no empty keys/values


@given(st.integers(0, 2**16 - 1), st.integers(0, 2**24 - 1),
       st.integers(0, 2**24 - 1))
def test_pack_seq_roundtrip_and_order(r, p, pos):
    s = pack_seq(r, p, pos)
    assert unpack_seq(s) == (r, p, pos)
    # lexicographic order of tuples == numeric order of packed ints
    s2 = pack_seq(min(r + 1, 2**16 - 1), 0, 0)
    if r + 1 < 2**16:
        assert s < s2


@given(st.text(min_size=0, max_size=100))
def test_hash64_consistency(s):
    assert hash64(s) == hash64(s)
    assert 0 <= hash64(s) < 2**64
    assert hash64_array([s])[0] == hash64(s)


@given(st.lists(st.integers(0, 2**64 - 1), min_size=1, max_size=200))
def test_digest_order_insensitive_prop(xs):
    a = np.array(xs, dtype=np.uint64)
    rng = np.random.RandomState(0)
    b = a.copy()
    rng.shuffle(b)
    assert digest_u64(a) == digest_u64(b)


@given(st.lists(st.integers(0, 2**63), min_size=1, max_size=500, unique=True))
@settings(max_examples=25)
def test_bloom_never_false_negative(keys):
    b = Bloom.for_capacity(len(keys), fpr=0.01)
    arr = np.array(keys, dtype=np.uint64)
    b.add(arr)
    assert b.contains(arr).all()
    b2 = Bloom.from_bytes(b.to_bytes())
    assert b2.contains(arr).all()


_URL = st.builds(
    lambda h, p, q: f"https://{h}/{p}" + (f"?{q}" if q else ""),
    st.sampled_from(["www.olx.ua", "HUB.olx.ua", "a.b.ua:443"]),
    st.text(alphabet="abc/.-", max_size=20),
    st.text(alphabet="ab=&", max_size=10),
)


@given(_URL)
def test_canonicalize_idempotent(u):
    c = canonicalize(u)
    assert canonicalize(c) == c
    assert "#" not in c


@given(_URL, st.text(alphabet="abc/-", min_size=1, max_size=20))
def test_absolutize_keeps_authority_and_query(base, href):
    out = absolutize(base, href)
    from urllib.parse import urlsplit
    b, o = urlsplit(base), urlsplit(out)
    assert o.netloc == b.netloc and o.scheme == b.scheme and o.query == b.query
    assert o.path == (href if href.startswith("/") else "/" + href)


_HTMLISH = st.text(
    alphabet=st.sampled_from(list("<>/='\"ab c\n-!&;#")), max_size=200)


@settings(max_examples=300, deadline=None)
@given(_HTMLISH)
def test_htmlparse_never_crashes_on_garbage(s):
    """The from-scratch DOM engine must degrade, never raise, on
    arbitrary malformed input (a crawler sees every broken page on the
    web); select/text/attr must stay total functions."""
    from olx_ray.functions.htmlparse import attr, parse_html, select, text

    root = parse_html(s)
    for css in ("a", "div[data-cy='x'] a", "#mainContent ul>li>p"):
        nodes = select(root, css)
        assert isinstance(text(nodes), str)
        assert isinstance(attr(nodes, "href"), str)
