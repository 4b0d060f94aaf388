"""Ad/listing parse kernels vs the spec-derived goldens (no Ray needed)."""

import pyarrow as pa

from olx_ray.sources.goldens import golden_documents, page0_links
from olx_ray.sources.sitegen import AdSpec, SiteSpec
from olx_ray.stages.parse import (ParseAds, ParseListings, ad_to_spans,
                                  java_split_colon, parse_brief, parse_listing)


def test_java_split_colon():
    assert java_split_colon("a:b") == ["a", "b"]
    assert java_split_colon("a:") == ["a"]
    assert java_split_colon("a:b:c") == ["a", "b", "c"]
    assert java_split_colon(":x") == ["", "x"]
    assert java_split_colon("") == [""]
    assert java_split_colon("a::") == ["a"]


def test_parse_brief_semantics():
    pairs = parse_brief(["Стан:Вживане", "Приватна особа", "Час:12:30",
                         ":x", "Доставка:", "Стан:Нове"])
    assert pairs == [("Стан", "Нове"),           # last wins, first position
                     ("Приватна особа", "true"),  # no colon → "true"
                     ("Час", "12"),               # segment 1 only
                     ("Доставка", "true")]        # trailing empty → "true"


def test_ad_spans_match_golden_all_t1_t2():
    for tier in ("t1", "t2"):
        for url, spec in SiteSpec(tier).all_ad_specs().items():
            got = ad_to_spans(spec.html())
            want = golden_documents(tier)[url]
            assert got == want, f"{tier} {url}"


def test_ad_spans_native_mode_fixes_q1():
    spec = next(iter(SiteSpec("t1").all_ad_specs().values()))
    spans = ad_to_spans(spec.html(), native=True)
    assert spans[1]["kind"] == "description"
    assert spans[1]["text"] == spec.description_native
    # conformance mode: description == title (quirk Q1)
    conf = ad_to_spans(spec.html())
    assert conf[1]["text"] == conf[0]["text"]


def test_adversarial_variants_covered():
    specs = list(SiteSpec("t2").all_ad_specs().values())
    assert any(s.variant == "no_title" for s in specs)
    assert any(s.variant == "two_titles" for s in specs)
    no_title = next(s for s in specs if s.variant == "no_title")
    spans = ad_to_spans(no_title.html())
    assert spans[0] == {"kind": "title", "text": "", "media_ref": None, "offset": 0}
    two = next(s for s in specs if s.variant == "two_titles")
    spans2 = ad_to_spans(two.html())
    assert spans2[0]["text"] == two.title_text and " " in spans2[0]["text"]


def test_parse_listing_distinct_and_absolutize():
    site = SiteSpec("t1")
    lst = site.listing(0)
    links, nxt = parse_listing(lst.html(), lst.url)
    assert links == page0_links("t1")
    assert len(links) == len(set(links))
    assert nxt == site.listing(0).next_page_href
    # last page: empty pagination href → None
    last = site.listing(site.n_pages - 1)
    _, nxt_last = parse_listing(last.html(), last.url)
    assert nxt_last is None


def test_parse_batch_kernels():
    site = SiteSpec("t1")
    specs = list(site.all_ad_specs().items())[:5]
    batch = pa.table({
        "url": [u for u, _ in specs],
        "html": [s.html() for _, s in specs],
        "search_id": pa.array([1] * 5, pa.int64()),
    })
    out = ParseAds()(batch)
    assert out.column_names == ["doc_id", "spans", "search_id"]
    golden = golden_documents("t1")
    for i, (u, _) in enumerate(specs):
        assert out["spans"][i].as_py() == golden[u]

    lst = site.listing(0)
    lbatch = pa.table({"url": [lst.url], "html": [lst.html()],
                       "page_seq": pa.array([0], pa.int64())})
    lout = ParseListings()(lbatch)
    assert lout["url"].to_pylist() == page0_links("t1")
    assert lout["position"].to_pylist() == list(range(len(page0_links("t1"))))
    assert lout["page_seq"].to_pylist() == [0] * len(page0_links("t1"))


def test_java_split_colon_all_empty_and_brief_skip():
    """Java split(':') collapses all-empty-segment inputs to the EMPTY
    array (':'/'::' -> []); '' stays ['']; parse_brief skips the line
    the reference would die on (documented divergence)."""
    from olx_ray.stages.parse import java_split_colon, parse_brief

    assert java_split_colon(":") == []
    assert java_split_colon("::") == []
    assert java_split_colon("") == [""]
    assert java_split_colon("a:b:") == ["a", "b"]
    assert java_split_colon(":a") == ["", "a"]
    assert parse_brief([":", "k:v"]) == [("k", "v")]


def test_carried_column_collision_is_loud():
    import pyarrow as pa
    import pytest

    from olx_ray.stages.parse import ParseAds

    batch = pa.table({"url": ["u"], "html": ["<p>x</p>"],
                      "spans": ["stale"]})
    with pytest.raises(ValueError, match="collide"):
        ParseAds()(batch)
