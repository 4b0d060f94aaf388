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


def _interleaved(rows):
    """rows: [(doc_id, [(kind, text, media_ref), ...]), ...] → Dataset
    with the engine's interleaved span schema."""
    import pyarrow as pa
    import ray.data as rd

    span_t = pa.struct([("kind", pa.string()), ("text", pa.string()),
                        ("media_ref", pa.string()),
                        ("offset", pa.int32())])
    return rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.string()),
        "spans": pa.array(
            [[{"kind": k, "text": t, "media_ref": m, "offset": i}
              for i, (k, t, m) in enumerate(r[1])] for r in rows],
            pa.list_(span_t))}))


def test_span_diff_statuses(ray_session):
    """span_diff classifies every per-document relation: identical
    sequences match (including 0-span docs), a changed field or a
    REORDER of identical spans mismatches, one-sided docs report the
    side; duplicate ids within a side are refused."""
    import pytest

    from olx_ray.pipelines.crawl import span_diff

    tx = ("text", "hello world", "")
    im = ("image", "", "img#1")
    t2 = ("text", "second", "")
    a = _interleaved([
        ("same", [tx, im, t2]),
        ("edited", [tx, im]),
        ("reordered", [tx, im, t2]),
        ("gone", [tx]),
        ("empty", []),
    ])
    b = _interleaved([
        ("same", [tx, im, t2]),
        ("edited", [("text", "hello world!", ""), im]),   # one char
        ("reordered", [im, tx, t2]),    # same multiset, swapped order
        ("added", [im]),
        ("empty", []),
    ])
    got = span_diff(a, b).to_pandas()
    want = {"same": "match", "empty": "match", "edited": "mismatch",
            "reordered": "mismatch", "gone": "only_a",
            "added": "only_b"}
    assert dict(zip(got["doc_id"], got["status"])) == want
    assert got["doc_id"].tolist() == sorted(want)   # sorted output

    dup = _interleaved([("d", [tx]), ("d", [t2])])
    with pytest.raises(Exception, match="ambiguous"):
        span_diff(dup, a).to_pandas()


def test_span_diff_engine_documents_self_and_perturbed(ray_session):
    """The QA operator over real engine output: ParseAds documents
    diff clean against themselves, and a single-span perturbation in a
    single document is pinpointed."""
    import pyarrow as pa
    import ray.data as rd

    from olx_ray.pipelines.crawl import span_diff
    from olx_ray.sources.sitegen import write_site
    from olx_ray.stages.parse import ParseAds

    paths = write_site("t1", "/tmp/span_diff_site")
    docs = (rd.read_parquet(paths["pages"]).filter(expr="kind == 'ad'")
            .map_batches(ParseAds(), batch_format="pyarrow")
            .select_columns(["doc_id", "spans"]))
    clean = span_diff(docs, docs).to_pandas()
    assert (clean["status"] == "match").all() and len(clean) > 0

    tbl = docs.to_pandas()          # fixture-scale perturbation only
    victim = sorted(tbl["doc_id"])[0]
    def mutate(row):
        spans = [dict(s) for s in row["spans"]]
        if row["doc_id"] == victim and spans:
            spans[0] = {**spans[0], "text": spans[0]["text"] + "!"}
        return spans
    tbl["spans"] = tbl.apply(mutate, axis=1)
    span_t = pa.struct([("kind", pa.string()), ("text", pa.string()),
                        ("media_ref", pa.string()),
                        ("offset", pa.int32())])
    mutated = rd.from_arrow(pa.table({
        "doc_id": pa.array(tbl["doc_id"], pa.string()),
        "spans": pa.array([[{k: s[k] for k in
                             ("kind", "text", "media_ref", "offset")}
                            for s in spans]
                           for spans in tbl["spans"]], pa.list_(span_t))}))
    d = span_diff(docs, mutated).to_pandas()
    assert dict(zip(d["doc_id"], d["status"]))[victim] == "mismatch"
    assert (d[d["doc_id"] != victim]["status"] == "match").all()


def test_transform_text_spans_structure_preserved(ray_session):
    """The interleaved adapter rewrites ONLY selected-kind text —
    span order, media refs, offsets, counts and the struct schema are
    bit-identical; span_diff pinpoints exactly the rewritten docs."""
    import pyarrow.compute as pc

    from olx_ray.pipelines.crawl import span_diff
    from olx_ray.pipelines.spans import transform_text_spans

    a = _interleaved([
        ("d1", [("text", "hello", ""), ("image", "", "img#1"),
                ("text", "world", "")]),
        ("d2", [("image", "", "img#2")]),
        ("d3", []),
    ])
    up = transform_text_spans(a, lambda t: pc.utf8_upper(t))
    rows = {r["doc_id"]: r["spans"] for r in up.take_all()}
    assert [s["text"] for s in rows["d1"]] == ["HELLO", "", "WORLD"]
    assert [s["kind"] for s in rows["d1"]] == ["text", "image", "text"]
    assert [s["offset"] for s in rows["d1"]] == [0, 1, 2]
    assert rows["d2"][0]["media_ref"] == "img#1".replace("1", "2")
    assert rows["d3"] == []
    # identity transform -> span_diff all-match (schema truly identical)
    ident = transform_text_spans(a, lambda t: t)
    d = span_diff(a, ident).to_pandas()
    assert (d["status"] == "match").all() and len(d) == 3
    # non-identity -> only the docs WITH text spans mismatch
    d2 = span_diff(a, up).to_pandas()
    assert dict(zip(d2["doc_id"], d2["status"])) == {
        "d1": "mismatch", "d2": "match", "d3": "match"}


def test_redact_pii_interleaved_matches_flat_operator(ray_session):
    """Span-for-span parity with text.RedactPII on the same strings —
    the RE2 kernels and the Python-re rules agree on the shared
    pattern subset, applied in the same order."""
    import pandas as pd

    from olx_ray.pipelines.spans import redact_pii_interleaved
    from olx_ray.pipelines.text import RedactPII

    texts = ["mail me at bob@example.com or +38 067 123 4567",
             "see https://olx.ua/ad?ref=a@b.cc now",
             "plain text, no pii 12",
             "numbers 123456 7 (044) 555-1234 end"]
    docs = _interleaved([
        (f"d{i}", [("text", t, ""), ("image", "", f"img#{i}")])
        for i, t in enumerate(texts)])
    got = redact_pii_interleaved(docs).to_pandas().sort_values("doc_id")
    got_texts = [r["spans"][0]["text"] for _, r in got.iterrows()]
    want = RedactPII()(pd.DataFrame({
        "doc_id": range(len(texts)), "text": texts}))["redacted"].tolist()
    assert got_texts == want
    # media spans untouched
    assert all(r["spans"][1]["media_ref"] == f"img#{i}"
               for i, (_, r) in enumerate(got.iterrows()))


def test_span_stats(ray_session):
    from olx_ray.pipelines.spans import span_stats

    docs = _interleaved([
        ("a", [("text", "four", ""), ("image", "", "m#1"),
               ("text", "chars!", "")]),
        ("b", [("image", "", "m#2"), ("image", "", "m#3")]),
        ("c", []),
    ])
    got = span_stats(docs).to_pandas().set_index("doc_id")
    assert got.loc["a"].tolist() == [3, 2, 1, 10]
    assert got.loc["b"].tolist() == [2, 0, 2, 0]
    assert got.loc["c"].tolist() == [0, 0, 0, 0]


def test_dedup_interleaved(ray_session):
    """Whole-sequence exact dedup: identical span sequences collapse to
    the min doc_id; any difference (field, order, extra span) survives;
    deterministic under repartitioning."""
    from olx_ray.pipelines.spans import dedup_interleaved

    tx = ("text", "hello", "")
    im = ("image", "", "img#1")
    docs = _interleaved([
        ("a2", [tx, im]), ("a1", [tx, im]), ("a3", [tx, im]),  # dups
        ("b1", [im, tx]),            # same multiset, different order
        ("c1", [tx]),                # subsequence
        ("e2", []), ("e1", []),      # empty docs are dups of each other
    ])
    got = sorted(dedup_interleaved(docs).to_pandas()["doc_id"])
    assert got == ["a1", "b1", "c1", "e1"]
    got2 = sorted(dedup_interleaved(
        docs.repartition(5)).to_pandas()["doc_id"])
    assert got2 == got
    # no duplicates at all -> identity
    uniq = _interleaved([("x", [tx]), ("y", [im])])
    assert sorted(dedup_interleaved(uniq).to_pandas()["doc_id"]) \
        == ["x", "y"]


def test_text_view_feeds_flat_operators(ray_session):
    """text_view flattens interleaved docs to (doc_id, text) in span
    order, media contributing nothing — and the result plugs straight
    into a flat-text operator (GopherRules) unchanged."""
    from olx_ray.pipelines.spans import text_view

    docs = _interleaved([
        ("a", [("title", "Hello", ""), ("image", "", "m#1"),
               ("description", "wide world", "")]),
        ("b", [("image", "", "m#2")]),
        ("c", []),
    ])
    got = text_view(docs).to_pandas().set_index("doc_id")["text"]
    assert got["a"] == "Hello\nwide world"
    assert got["b"] == "" and got["c"] == ""

    # flat operator composes directly over the view
    import pandas as pd

    from olx_ray.pipelines.text import GopherRules
    out = text_view(docs).map_batches(
        GopherRules, batch_format="pandas",
        concurrency=(1, 2)).to_pandas()
    assert set(out["doc_id"]) == {"a", "b", "c"}
    assert pd.api.types.is_integer_dtype(out["fail_mask"])


def test_interleaved_curation_end_to_end(ray_session):
    """The full multimodal curation path composes over REAL crawl
    payloads: parse → composition stats → whole-sequence dedup (a
    planted re-crawl twin drops) → PII pass (structure intact, proved
    by span_diff against the dedup output) → text_view → quality rules
    → pack_interleaved. Every stage is the library operator, chained
    the way a user would."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from olx_ray.pipelines.corpus import pack_interleaved
    from olx_ray.pipelines.crawl import span_diff
    from olx_ray.pipelines.spans import (dedup_interleaved,
                                         redact_pii_interleaved,
                                         span_stats, text_view)
    from olx_ray.pipelines.text import GopherRules
    from olx_ray.sources.sitegen import write_site
    from olx_ray.stages.parse import ParseAds

    paths = write_site("t1", "/tmp/span_e2e_site")
    docs = (rd.read_parquet(paths["pages"]).filter(expr="kind == 'ad'")
            .map_batches(ParseAds(), batch_format="pyarrow")
            .select_columns(["doc_id", "spans"]))

    def retag(b: pa.Table) -> pa.Table:
        i = b.schema.get_field_index("doc_id")
        ids = pc.binary_join_element_wise(
            pa.array(["zzz"] * b.num_rows),
            b["doc_id"].cast(pa.string()), "-")
        return b.set_column(i, "doc_id", ids)

    both = docs.union(docs.limit(1).map_batches(
        retag, batch_format="pyarrow"))

    st = span_stats(both).to_pandas()
    assert len(st) == 20 and (st["n_text"] > 0).all()

    deduped = dedup_interleaved(both)
    clean = redact_pii_interleaved(deduped)
    d = span_diff(deduped, clean).to_pandas()
    assert len(d) == 19                    # twin gone before the pass
    assert set(d["status"]) <= {"match", "mismatch"}   # no doc lost

    quality = text_view(clean).map_batches(
        GopherRules, batch_format="pandas", concurrency=(1, 2)) \
        .to_pandas()
    assert len(quality) == 19 and "fail_mask" in quality

    packs = pack_interleaved(clean, seq_len=256,
                             media_tokens=8).to_pandas()
    assert set(packs["doc_id"]) == set(d["doc_id"])    # all docs packed
    assert (packs["n_tokens"] <= 256).all()


def test_span_fingerprint_equality_iff_sequence_equality(ray_session):
    """Randomized soundness sweep (fixed seed): over hundreds of docs
    including planted duplicates, field mutations, transpositions and
    truncations, span_fp+n_spans are equal exactly when the span
    sequences are equal — one Dataset pass, ground truth from the raw
    tuples."""
    import numpy as np

    from olx_ray.pipelines.crawl import span_fingerprints

    rng = np.random.default_rng(42)
    kinds = ["title", "description", "brief", "image"]
    words = ["alpha", "beta", "gamma", "", "слово", "x y"]

    def rand_seq():
        n = int(rng.integers(0, 6))
        seq = []
        for _ in range(n):
            k = kinds[rng.integers(0, len(kinds))]
            if k == "image":
                seq.append((k, "", f"img#{rng.integers(0, 5)}"))
            else:
                seq.append((k, words[rng.integers(0, len(words))], ""))
        return tuple(seq)

    seqs = [rand_seq() for _ in range(120)]
    docs, truth = [], {}
    i = 0
    for s in seqs:
        variants = [s, s]                        # planted duplicate
        if s:
            lst = list(s)
            j = int(rng.integers(0, len(lst)))
            k, t, m = lst[j]
            lst[j] = (k, t + "!", m) if m == "" else (k, t, m + "!")
            variants.append(tuple(lst))          # field mutation
            if len(lst) > 1:
                swapped = list(s)
                swapped[0], swapped[-1] = swapped[-1], swapped[0]
                variants.append(tuple(swapped))  # transposition
            variants.append(s[:-1])              # truncation
        for v in variants:
            docs.append((f"d{i:05d}", [list(x) for x in v]))
            truth[f"d{i:05d}"] = v
            i += 1

    ds = _interleaved([(d, [(k, t, m) for k, t, m in sp])
                       for d, sp in docs])
    fps = span_fingerprints(ds).to_pandas()
    key = {r["doc_id"]: (r["n_spans"], r["span_fp"])
           for _, r in fps.iterrows()}
    by_seq = {}
    for d, v in truth.items():
        by_seq.setdefault(v, set()).add(key[d])
    # same sequence -> same fingerprint
    assert all(len(v) == 1 for v in by_seq.values())
    # different sequences -> different fingerprints (no collisions in
    # this sweep; a real collision is ~2^-64)
    flat = [next(iter(v)) for v in by_seq.values()]
    assert len(flat) == len(set(flat))


def test_media_refs_worklist(ray_session):
    from olx_ray.pipelines.spans import media_refs

    docs = _interleaved([
        ("a", [("title", "t", ""), ("image", "", "m#1"),
               ("description", "d", ""), ("image", "", "m#2")]),
        ("b", [("title", "x", "")]),
        ("c", []),
    ])
    got = media_refs(docs).to_pandas() \
        .sort_values(["doc_id", "offset"]).reset_index(drop=True)
    assert got.to_dict("list") == {
        "doc_id": ["a", "a"], "media_ref": ["m#1", "m#2"],
        "offset": [1, 3]}


def test_dedup_interleaved_refuses_duplicate_ids(ray_session):
    """Same-id duplicate rows cannot be deduped by an id anti-join
    (dropping one of two identical ids is inexpressible) — silence
    would keep both copies, so the operator refuses loudly."""
    import pytest

    from olx_ray.pipelines.spans import dedup_interleaved

    tx = ("text", "hello", "")
    dup = _interleaved([("a", [tx]), ("a", [tx]), ("b", [tx])])
    with pytest.raises(Exception, match="uniquely identify"):
        dedup_interleaved(dup).to_pandas()


def test_span_fingerprints_refuse_null_lists(ray_session):
    """A null spans LIST must not fingerprint as an empty doc — the
    fingerprint side enforces the same schema contract as
    spans._flat_spans, else span_diff would call null == [] a match."""
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from olx_ray.pipelines.crawl import span_fingerprints

    span_t = pa.struct([("kind", pa.string()), ("text", pa.string()),
                        ("media_ref", pa.string()),
                        ("offset", pa.int32())])
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(["n", "e"], pa.string()),
        "spans": pa.array([None, []], pa.list_(span_t))}))
    with pytest.raises(Exception, match="null lists"):
        span_fingerprints(ds).to_pandas()
