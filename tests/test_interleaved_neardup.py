"""Mixed-modal near-dup over interleaved documents, pinned against an
independent in-memory oracle: text Jaccard brute-forced with the same
word-3-gram shingle definition, media Jaccard from Python sets with the
hot-ref exclusion applied by hand."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from olx_ray.pipelines.dedup import shingles
from olx_ray.pipelines.spans import interleaved_neardup_pairs

SPAN_T = pa.struct([("kind", pa.string()), ("text", pa.string()),
                    ("media_ref", pa.string()), ("offset", pa.int32())])


def _docs(rows):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.string()),
        "spans": pa.array(
            [[{"kind": k, "text": t, "media_ref": m, "offset": i}
              for i, (k, t, m) in enumerate(r[1])] for r in rows],
            pa.list_(SPAN_T))}))


BASE = ("sunny two bedroom flat near the park with balcony and fresh "
        "renovation quiet street close to metro schools and shops "
        "available from next month no agency fees")
ALT = BASE.replace("quiet street", "calm street")     # near-dup text
OTHER = ("selling winter tires in good condition used one season size "
         "seventeen inch fits most crossovers price negotiable pickup "
         "only from the north district call evenings")

ROWS = [
    # A and B: near-identical text, disjoint media  -> text evidence
    ("ad/a", [("title", "flat", None), ("description", BASE, None),
              ("image", None, "m1"), ("image", None, "m2"),
              ("image", None, "m3")]),
    ("ad/b", [("title", "flat", None), ("description", ALT, None),
              ("image", None, "m4"), ("image", None, "m5")]),
    # C: unrelated text, shares {m1,m2,m3} with A    -> media evidence
    ("ad/c", [("title", "tires", None), ("description", OTHER, None),
              ("image", None, "m1"), ("image", None, "m2"),
              ("image", None, "m3"), ("image", None, "m6")]),
    # D: identical text to A AND media overlap       -> both
    ("ad/d", [("title", "flat", None), ("description", BASE, None),
              ("image", None, "m1"), ("image", None, "m2")]),
    # E: unrelated on both axes
    ("ad/e", [("title", "lamp", None), ("description",
              "vintage desk lamp works fine warm light bulb included "
              "minor scratches on the base collect in person", None),
              ("image", None, "m7")]),
]


def _oracle(rows, text_t, media_t, hot_cap):
    """Brute-force both legs from the row specs alone."""
    texts = {}
    media = {}
    for d, spans in rows:
        texts[d] = "\n".join(t for _, t, m in spans
                             if (m is None or m == "") and t is not None)
        media[d] = {m for _, _, m in spans if m}
    # hot-ref exclusion
    from collections import Counter
    freq = Counter(m for s in media.values() for m in s)
    hot = {m for m, c in freq.items() if c > hot_cap}
    media = {d: s - hot for d, s in media.items()}
    out = {}
    ids = sorted(texts)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            sa, sb = shingles(texts[a]), shingles(texts[b])
            tj = (1.0 if not sa and not sb
                  else len(sa & sb) / max(len(sa | sb), 1))
            ma, mb = media[a], media[b]
            mj = len(ma & mb) / max(len(ma | mb), 1) if (ma or mb) else 0.0
            ev = None
            if tj >= text_t and mj >= media_t:
                ev = "both"
            elif tj >= text_t:
                ev = "text"
            elif mj >= media_t:
                ev = "media"
            if ev:
                out[(a, b)] = (round(tj, 6) if tj >= text_t else None,
                               round(mj, 6) if mj >= media_t else None, ev)
    return out


def test_interleaved_neardup_pairs_matches_oracle(ray_session):
    got = interleaved_neardup_pairs(
        _docs(ROWS), text_threshold=0.6, media_threshold=0.5).to_pandas()
    want = _oracle(ROWS, 0.6, 0.5, hot_cap=256)
    assert {(r.doc_a, r.doc_b) for r in got.itertuples()} == set(want)
    for r in got.itertuples():
        wt, wm, we = want[(r.doc_a, r.doc_b)]
        assert r.evidence == we, (r.doc_a, r.doc_b)
        if wt is None:
            assert np.isnan(r.text_jaccard)
        else:
            assert abs(r.text_jaccard - wt) < 1e-9
        if wm is None:
            assert np.isnan(r.media_jaccard)
        else:
            assert abs(r.media_jaccard - wm) < 1e-9
    # the expected shapes actually occur (the fixture is not degenerate)
    evs = dict(zip(zip(got["doc_a"], got["doc_b"]), got["evidence"]))
    assert evs[("ad/a", "ad/b")] == "text"
    assert evs[("ad/a", "ad/c")] == "media"
    assert evs[("ad/a", "ad/d")] == "both"
    assert not any("ad/e" in p for p in evs)


def test_hot_ref_exclusion_drops_boilerplate_media(ray_session):
    """A watermark/placeholder image shared by every doc must not
    connect them: with hot_ref_cap below the sharing count the ref is
    excluded from intersections AND set sizes (exact Jaccard over the
    surviving refs — compare the hand-computed value)."""
    rows = [
        ("w/1", [("description", "alpha beta gamma delta epsilon zeta "
                  "eta theta", None),
                 ("image", None, "hot"), ("image", None, "x1"),
                 ("image", None, "x2")]),
        ("w/2", [("description", "one two three four five six seven "
                  "eight nine", None),
                 ("image", None, "hot"), ("image", None, "x1"),
                 ("image", None, "x2")]),
        ("w/3", [("description", "red orange yellow green blue indigo "
                  "violet colors", None),
                 ("image", None, "hot"), ("image", None, "y1")]),
    ]
    got = interleaved_neardup_pairs(
        _docs(rows), text_threshold=0.9, media_threshold=0.5,
        hot_ref_cap=2).to_pandas()
    # with "hot" excluded: 1-2 share {x1,x2} fully (jac 1.0); 3 shares
    # nothing with either (its only surviving ref is y1)
    assert [(r.doc_a, r.doc_b, r.media_jaccard, r.evidence)
            for r in got.itertuples()] == [("w/1", "w/2", 1.0, "media")]
    # sanity: withOUT the cap the hot ref connects w/3 too
    # ({hot,x1,x2} vs {hot,y1}: 1/4 = 0.25)
    got2 = interleaved_neardup_pairs(
        _docs(rows), text_threshold=0.9, media_threshold=0.2,
        hot_ref_cap=256).to_pandas()
    pairs2 = {(r.doc_a, r.doc_b): r.media_jaccard
              for r in got2.itertuples()}
    assert pairs2[("w/1", "w/3")] == 0.25
    assert pairs2[("w/2", "w/3")] == 0.25


def test_no_pairs_and_mediafree_inputs_yield_typed_empty(ray_session):
    """Disjoint docs (no LSH candidates, no shared refs) and media-free
    docs must come back as a TYPED empty frame — the map_groups-over-
    nothing schema-strip guard (found live driving the t1 crawl output,
    where 15 distinct ads share nothing)."""
    rows = [
        ("z/1", [("description", "alpha beta gamma delta epsilon zeta "
                  "eta theta iota kappa", None), ("image", None, "a1")]),
        ("z/2", [("description", "one two three four five six seven "
                  "eight nine ten", None), ("image", None, "b1")]),
    ]
    got = interleaved_neardup_pairs(_docs(rows))
    # schema asserted on the DATASET: a zero-row to_pandas() drops
    # columns in Ray 2.49 (the collect_pandas bug class)
    assert got.count() == 0
    assert got.schema().names == ["doc_a", "doc_b", "text_jaccard",
                                  "media_jaccard", "evidence"]
    # media-free corpus: text leg still works, media leg short-circuits
    rows2 = [("m/1", [("description", BASE, None)]),
             ("m/2", [("description", ALT, None)])]
    got2 = interleaved_neardup_pairs(_docs(rows2)).to_pandas()
    assert list(got2["evidence"]) == ["text"]


def test_interleaved_neardup_groups(ray_session):
    """Components over the mixed-modal pairs: a-b (text), a-c (media),
    a-d (both) chain into one group represented by a REAL member's
    string id; e stays a singleton. No-pair corpora come back all
    singleton (the empty-member-leg guard)."""
    from olx_ray.pipelines.spans import interleaved_neardup_groups

    got = interleaved_neardup_groups(
        _docs(ROWS), text_threshold=0.6, media_threshold=0.5).to_pandas()
    by_id = got.set_index("doc_id")
    grp = {d: by_id.loc[d, "group_id"] for d in
           ["ad/a", "ad/b", "ad/c", "ad/d", "ad/e"]}
    assert len({grp["ad/a"], grp["ad/b"], grp["ad/c"], grp["ad/d"]}) == 1
    assert grp["ad/a"] in {"ad/a", "ad/b", "ad/c", "ad/d"}  # real member
    assert grp["ad/e"] == "ad/e"
    assert by_id.loc["ad/e", "group_size"] == 1
    assert set(by_id[by_id["group_size"] == 4].index) == \
        {"ad/a", "ad/b", "ad/c", "ad/d"}
    # exactly one representative per group, and it IS the group_id row
    reps = got[got["is_representative"]]
    assert len(reps) == 2
    assert set(reps["doc_id"]) == set(got["group_id"])

    # disjoint corpus → every doc its own group
    rows = [("s/1", [("description", BASE, None)]),
            ("s/2", [("description", OTHER, None)])]
    got2 = interleaved_neardup_groups(_docs(rows)).to_pandas()
    assert list(got2["group_id"]) == list(got2["doc_id"])
    assert got2["is_representative"].all()
    assert (got2["group_size"] == 1).all()


def test_leakage_safe_split_interleaved(ray_session):
    """Mixed-modal near-dup groups never straddle train/val: every
    member of the a-b-c-d component (text, media AND both evidence
    chains) gets ONE side; the assignment is deterministic and whole
    groups move together."""
    from olx_ray.pipelines.spans import leakage_safe_split_interleaved

    got = leakage_safe_split_interleaved(
        _docs(ROWS), val_pct=30).to_pandas().set_index("doc_id")
    comp = ["ad/a", "ad/b", "ad/c", "ad/d"]
    assert len(set(got.loc[comp, "split"])) == 1        # no straddle
    assert len(set(got.loc[comp, "group_id"])) == 1
    # deterministic across runs
    again = leakage_safe_split_interleaved(
        _docs(ROWS), val_pct=30).to_pandas().set_index("doc_id")
    assert (got["split"] == again["split"]).all()
    # both sides actually occur over many singleton docs
    many = [(f"s/{i}", [("description",
                         f"unique doc number {i} " + " ".join(
                             f"tok{i}x{j}" for j in range(12)), None)])
            for i in range(60)]
    sp = leakage_safe_split_interleaved(_docs(many), val_pct=30) \
        .to_pandas()["split"]
    assert {"train", "val"} == set(sp)
    assert 0.5 < (sp == "train").mean() < 0.9           # ≈70% train


def test_interleaved_keep_representatives(ray_session):
    """One survivor per mixed-modal group, spans byte-identical to the
    input (the anti-filter must not touch payloads)."""
    from olx_ray.pipelines.spans import (interleaved_keep_representatives,
                                         interleaved_neardup_groups)

    kept = interleaved_keep_representatives(
        _docs(ROWS), text_threshold=0.6, media_threshold=0.5).to_pandas()
    groups = interleaved_neardup_groups(
        _docs(ROWS), text_threshold=0.6, media_threshold=0.5).to_pandas()
    reps = set(groups.loc[groups["is_representative"], "doc_id"])
    assert set(kept["doc_id"]) == reps == set(groups["group_id"])
    assert len(kept) == 2                      # {a,b,c,d} rep + ad/e
    # survivor spans identical to source
    src = _docs(ROWS).to_pandas().set_index("doc_id")
    for _, r in kept.iterrows():
        assert [dict(s) for s in r["spans"]] == \
            [dict(s) for s in src.loc[r["doc_id"], "spans"]]


def test_interleaved_keep_best_quality(ray_session):
    """keep='best_quality': the survivor per mixed-modal group is the
    argmax of the QualityScore composite over the TEXT VIEW (tie → min
    doc_id), pinned against the kernel run directly on the flattened
    fixture texts; group structure identical to keep='min_id'; spans
    byte-identical to the input."""
    import pandas as pd

    from olx_ray.pipelines.spans import (interleaved_keep_representatives,
                                         interleaved_neardup_groups,
                                         text_view)
    from olx_ray.pipelines.text import QualityScore

    kept = interleaved_keep_representatives(
        _docs(ROWS), text_threshold=0.6, media_threshold=0.5,
        keep="best_quality").to_pandas()
    groups = interleaved_neardup_groups(
        _docs(ROWS), text_threshold=0.6, media_threshold=0.5).to_pandas()

    # oracle: score the text views directly with the kernel
    tv = text_view(_docs(ROWS)).to_pandas()
    q = QualityScore()(tv).set_index("doc_id")["quality"]
    want = set()
    for _, members in groups.groupby("group_id")["doc_id"]:
        ms = sorted(members)
        best = max(ms, key=lambda d: (q[d], ), default=None)
        # argmax with tie -> min id: sort by (-quality, id)
        best = sorted(ms, key=lambda d: (-q[d], d))[0]
        want.add(best)
    assert set(kept["doc_id"]) == want
    assert len(kept) == groups["group_id"].nunique()
    # singleton ad/e always survives; the quality winner of the big
    # group is a real member of it
    assert "ad/e" in want
    big = set(groups.loc[groups["group_size"] == 4, "doc_id"])
    assert len(want & big) == 1
    # spans byte-identical to source
    src = _docs(ROWS).to_pandas().set_index("doc_id")
    for _, r in kept.iterrows():
        assert [dict(s) for s in r["spans"]] == \
            [dict(s) for s in src.loc[r["doc_id"], "spans"]]
    # same group structure as min_id (only the survivor choice differs)
    kept_min = interleaved_keep_representatives(
        _docs(ROWS), text_threshold=0.6, media_threshold=0.5,
        keep="min_id").to_pandas()
    assert len(kept_min) == len(kept)
    # a clean (pair-free) corpus passes through untouched
    solo = [("s/1", [("description", BASE, None)]),
            ("s/2", [("description", OTHER, None)])]
    assert interleaved_keep_representatives(
        _docs(solo), keep="best_quality").count() == 2
    with pytest.raises(ValueError, match="min_id.*best_quality"):
        interleaved_keep_representatives(_docs(solo), keep="typo")


def test_curation_with_neardup_over_real_payloads(ray_session):
    """Curation v2 over REAL parsed crawl payloads: plant a NEAR twin
    (one word edited, same images — exact whole-sequence dedup misses
    it) → interleaved_keep_representatives drops it via the mixed-modal
    evidence → leakage split over survivors stays straddle-free."""
    import pyarrow.compute as pc
    import ray.data as rd

    from olx_ray.pipelines.spans import (dedup_interleaved,
                                         interleaved_keep_representatives,
                                         leakage_safe_split_interleaved)
    from olx_ray.sources.sitegen import write_site
    from olx_ray.stages.parse import ParseAds

    paths = write_site("t1", "/tmp/neardup_e2e_site")
    docs = (rd.read_parquet(paths["pages"]).filter(expr="kind == 'ad'")
            .map_batches(ParseAds(), batch_format="pyarrow")
            .select_columns(["doc_id", "spans"]).materialize())
    n = docs.count()

    def near_twin(b: pa.Table) -> pa.Table:
        i = b.schema.get_field_index("doc_id")
        ids = pc.binary_join_element_wise(
            pa.array(["zzz"] * b.num_rows),
            b["doc_id"].cast(pa.string()), "-")
        return b.set_column(i, "doc_id", ids)

    twin = docs.limit(1).map_batches(near_twin, batch_format="pyarrow")
    # edit ONE text span so the exact span fingerprint changes
    from olx_ray.pipelines.spans import transform_text_spans
    twin = transform_text_spans(
        twin, lambda t: pc.replace_substring_regex(
            t, pattern=r"^", replacement="edited "))
    both = docs.union(twin).materialize()

    # exact dedup does NOT catch the near twin
    assert dedup_interleaved(both).count() == n + 1
    # mixed-modal keep-representatives DOES
    kept = interleaved_keep_representatives(
        both, text_threshold=0.5, media_threshold=0.5)
    assert kept.count() == n

    split = leakage_safe_split_interleaved(
        both, val_pct=30, text_threshold=0.5,
        media_threshold=0.5).to_pandas().set_index("doc_id")
    twin_id = [d for d in split.index if d.startswith("zzz-")][0]
    orig_id = twin_id[len("zzz-"):]
    assert split.loc[twin_id, "split"] == split.loc[orig_id, "split"]
    assert split.loc[twin_id, "group_id"] == split.loc[orig_id, "group_id"]


def test_dedup_interleaved_incremental(ray_session):
    """Ingestion gate: an increment row whose whole span sequence is
    already in the corpus drops; within-increment twins keep the min
    doc_id; novel docs pass with spans untouched."""
    from olx_ray.pipelines.spans import dedup_interleaved_incremental

    corpus = _docs(ROWS)
    novel = [("description", "completely new listing about a bicycle "
              "in great shape with new tires and lights", None),
             ("image", None, "n1")]
    new_rows = [
        ("new/a2", ROWS[0][1]),        # exact re-crawl of ad/a -> drop
        ("new/x", novel),              # novel -> keep
        ("new/y2", [("description", "twin text body here with enough "
                     "words to be a doc", None)]),
        ("new/y1", [("description", "twin text body here with enough "
                     "words to be a doc", None)]),   # min id wins
        ("new/z", ROWS[4][1]),         # re-crawl of ad/e -> drop
    ]
    got = dedup_interleaved_incremental(corpus, _docs(new_rows)) \
        .to_pandas().sort_values("doc_id")
    assert list(got["doc_id"]) == ["new/x", "new/y1"]
    src = {d: s for d, s in new_rows}
    for _, r in got.iterrows():
        assert [(s["kind"], s["text"], s["media_ref"])
                for s in r["spans"]] == src[r["doc_id"]]

    # empty corpus: everything except within-increment twins passes
    empty = _docs([])
    got2 = dedup_interleaved_incremental(empty, _docs(new_rows)) \
        .to_pandas()
    assert sorted(got2["doc_id"]) == ["new/a2", "new/x", "new/y1",
                                      "new/z"]


def test_interleaved_neardup_incremental_matches_oracle(ray_session):
    """NEW×ALL mixed-modal near gate vs an independent union-find oracle
    built from the brute-force pair oracle over corpus∪increment: a new
    doc survives iff its component holds no corpus doc and no
    smaller-id new doc. Both evidence channels exercised (text twin,
    media twin), plus a new-only twin pair and a clean novel doc."""
    from olx_ray.pipelines.spans import interleaved_neardup_incremental

    new_rows = [
        # text-near twin of ad/a (disjoint media) -> drop (text leg)
        ("new/t", [("title", "flat", None), ("description", BASE, None),
                   ("image", None, "q1")]),
        # media twin of ad/a (unrelated text) -> drop (media leg)
        ("new/m", [("description", "totally different words about bikes "
                    "and gears and chains for sale cheap", None),
                   ("image", None, "m1"), ("image", None, "m2"),
                   ("image", None, "m3")]),
        # new-only near pair -> min STRING id survives
        ("new/p2", [("description", "a very novel corpus text about "
                     "garden furniture teak table six chairs weathered",
                     None)]),
        ("new/p1", [("description", "a very novel corpus text about "
                     "garden furniture teak table six chairs weather",
                     None)]),
        # clean novel
        ("new/z", [("description", "yet another unrelated novel document "
                    "mentioning pianos violins and sheet music", None),
                   ("image", None, "zz1")]),
    ]
    got = interleaved_neardup_incremental(
        _docs(ROWS), _docs(new_rows), text_threshold=0.5,
        media_threshold=0.5).to_pandas()

    # oracle: union-find over the brute-force pair oracle of the union
    pairs = _oracle(ROWS + new_rows, 0.5, 0.5, hot_cap=256)
    parent = {d: d for d, _ in ROWS + new_rows}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent[find(a)] = find(b)
    comp = {}
    for d, _ in ROWS + new_rows:
        comp.setdefault(find(d), []).append(d)
    want = []
    for members in comp.values():
        news = sorted(m for m in members if m.startswith("new/"))
        if news and len(news) == len(members):    # new-only component
            want.append(news[0])                  # min string id survives
    assert sorted(got["doc_id"]) == sorted(want)
    assert sorted(want) == ["new/p1", "new/z"]    # fixture not degenerate
    # survivors' spans untouched
    src = {d: s for d, s in new_rows}
    for _, r in got.iterrows():
        assert [(s["kind"], s["text"], s["media_ref"])
                for s in r["spans"]] == src[r["doc_id"]]

    # empty corpus: within-increment screening still applies
    got2 = interleaved_neardup_incremental(
        _docs([]), _docs(new_rows), text_threshold=0.5,
        media_threshold=0.5).to_pandas()
    assert sorted(got2["doc_id"]) == ["new/m", "new/p1", "new/t", "new/z"]

    # disjoint increment, no pairs anywhere: everything passes
    got3 = interleaved_neardup_incremental(
        _docs([]), _docs(new_rows[4:]), text_threshold=0.5).to_pandas()
    assert sorted(got3["doc_id"]) == ["new/z"]


def test_attach_media_features_both_paths(ray_session):
    """The media_refs round trip: decoded features join back onto the
    media spans at their interleaving offsets — broadcast and bucketed
    deliveries identical; refs without features drop (inner join)."""
    import pandas as pd

    from olx_ray.pipelines.spans import attach_media_features

    rows = [
        ("d/1", [("title", "one", None), ("image", None, "m1"),
                 ("image", None, "m2")]),
        ("d/2", [("description", "two", None), ("image", None, "m2"),
                 ("image", None, "zz")]),       # zz: no feature row
    ]
    feats = rd.from_pandas(pd.DataFrame({
        "media_ref": ["m1", "m2"],
        "width": np.array([16, 32], np.int64),
        "feat": [0.5, 0.25]}))
    want = {("d/1", 1, "m1", 16, 0.5), ("d/1", 2, "m2", 32, 0.25),
            ("d/2", 1, "m2", 32, 0.25)}
    for cap in (10**9, 0):                      # broadcast, then bucketed
        got = attach_media_features(_docs(rows), feats,
                                    max_broadcast_rows=cap).to_pandas()
        assert {(r.doc_id, r.offset, r.media_ref, int(r.width),
                 float(r.feat)) for r in got.itertuples()} == want, cap
    with pytest.raises(ValueError, match="at least one column"):
        attach_media_features(
            _docs(rows),
            rd.from_pandas(pd.DataFrame({"media_ref": ["m1"]})))


def test_exact_gate_fingerprint_sidecar_equivalence(ray_session, tmp_path):
    """The SCALE.md sidecar recipe end-to-end: persist the corpus'
    span_fingerprints once (export_shards), read them back, feed the
    exact gate via corpus_fingerprints — survivors identical to the
    payload-scan path, corpus payloads never read."""
    from olx_ray.pipelines.crawl import span_fingerprints
    from olx_ray.pipelines.export import export_shards, read_shards
    from olx_ray.pipelines.spans import dedup_interleaved_incremental

    corpus = _docs(ROWS)
    side = str(tmp_path / "fp_sidecar")
    export_shards(span_fingerprints(corpus), side, key="doc_id",
                  n_shards=4)

    new_rows = [("new/a2", ROWS[0][1]),        # exact re-crawl -> drop
                ("new/x", [("description", "a new doc about kayaks and "
                            "paddles in mint condition", None)])]
    direct = dedup_interleaved_incremental(
        corpus, _docs(new_rows)).to_pandas().sort_values("doc_id")
    via_sidecar = dedup_interleaved_incremental(
        None, _docs(new_rows),
        corpus_fingerprints=read_shards(side)).to_pandas() \
        .sort_values("doc_id")
    assert list(direct["doc_id"]) == list(via_sidecar["doc_id"]) == ["new/x"]
    for a, b in zip(direct["spans"], via_sidecar["spans"]):
        assert [dict(s) for s in a] == [dict(s) for s in b]


def test_incremental_refuses_duplicate_increment_ids(ray_session):
    """Same doc_id twice in the increment: the id anti-filter would
    silently delete BOTH copies — must refuse loudly instead (the
    dedup_interleaved guard, extended to the gate by review)."""
    import pytest

    bad = [("dup/x", ROWS[0][1]), ("dup/x", ROWS[0][1])]
    from olx_ray.pipelines.spans import dedup_interleaved_incremental
    with pytest.raises(Exception, match="multiple increment rows"):
        dedup_interleaved_incremental(_docs([]), _docs(bad)).to_pandas()
