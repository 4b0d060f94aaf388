"""pipelines/substrings.py — exact substring dedup: DuckDB oracle
parity for duplicate_spans, rolling-hash correctness (offset and
cross-doc invariance, non-ASCII code points), stride detection
guarantee, and dedup_substrings surgery invariants."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

SF = "/root/testdata/sf0.001"


def test_duplicate_spans_matches_duckdb_oracle(ray_session):
    from olx_ray.pipelines.substrings import (DUPLICATE_SPANS_SQL,
                                              duplicate_spans)

    eng = duplicate_spans(SF).to_pandas()
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    ora = con.execute(DUPLICATE_SPANS_SQL).df()
    assert eng.reset_index(drop=True).equals(ora.reset_index(drop=True))
    assert len(eng) > 0                       # fixture has near-dups


def test_rolling_hash_offset_and_doc_invariance():
    from olx_ray.pipelines.substrings import _window_hashes

    texts = ["xx SHARED-RUN-OF-TEXT yy", "zzzzz SHARED-RUN-OF-TEXT",
             "SHARED-RUN-OF-TEXT"]
    L = len("SHARED-RUN-OF-TEXT")
    h, rows, pos = _window_hashes(texts, L)
    # the shared gram hashes identically at offsets 3, 6 and 0
    want = {(0, 3), (1, 6), (2, 0)}
    hits = {}
    for hh, r, p in zip(h, rows, pos):
        hits.setdefault(hh, set()).add((int(r), int(p)))
    assert any(want <= s for s in hits.values())
    # distinct grams hash distinctly (no spurious collisions here)
    t2 = ["abcdefgh", "abcdefgi"]
    h2, _, p2 = _window_hashes(t2, 8)
    assert len(h2) == 2 and h2[0] != h2[1]


def test_rolling_hash_non_ascii_codepoints():
    from olx_ray.pipelines.substrings import _window_hashes

    # multi-byte chars count as ONE position (SQL substr semantics)
    texts = ["ααββγγδδεε", "xxββγγδδεεyy"]
    h1, _, p1 = _window_hashes([texts[0]], 8)
    h2, _, p2 = _window_hashes([texts[1]], 8)
    # "ββγγδδεε" starts at pos 2 in both
    assert h1[2] == h2[2]
    assert len(h1) == 3 and len(h2) == 5      # len-8+1 windows each


def test_winnow_detection_guarantee(ray_session, tmp_path):
    """Winnowing (w=8) still detects every duplicated run of length ≥
    L + w − 1: selection is content-defined, so both copies of the run
    select identical fingerprints regardless of their offsets."""
    from olx_ray.pipelines import substrings as S

    rng = np.random.default_rng(3)
    alphabet = np.array(list("abcdefghijklmnopqrstuvwxyz "))
    base = "".join(rng.choice(alphabet, 400))
    dup = base[100:160]                       # 60-char duplicated run
    docs = pd.DataFrame({
        "doc_id": np.arange(3, dtype=np.int64),
        "text": [base,
                 "".join(rng.choice(alphabet, 50)) + dup +
                 "".join(rng.choice(alphabet, 50)),
                 "".join(rng.choice(alphabet, 200))]})
    p = tmp_path / "documents.parquet"
    pa.parquet.write_table(pa.Table.from_pandas(docs), p)
    spans = S.duplicate_spans(str(tmp_path), L=40, winnow=8).to_pandas()
    got = set(spans["doc_id"])
    # doc 1's duplicated run (60 ≥ L+w−1 = 47) must be hit, and the
    # winnowed span stays inside the true duplicated region [50, 110)
    assert got == {0, 1}                      # doc 2 random noise: none
    s1 = spans[spans["doc_id"] == 1]
    assert ((s1["span_start"] >= 50) & (s1["span_end"] <= 110)).all()
    s0 = spans[spans["doc_id"] == 0]
    assert ((s0["span_start"] >= 100) & (s0["span_end"] <= 160)).all()
    # exact mode on the same fixture recovers the full runs
    exact = S.duplicate_spans(str(tmp_path), L=40).to_pandas()
    e1 = exact[exact["doc_id"] == 1]
    assert list(e1["span_start"]) == [50] and list(e1["span_end"]) == [110]


def test_dedup_substrings_surgery(ray_session):
    from olx_ray.pipelines.substrings import (dedup_substrings,
                                              duplicate_spans)

    spans = duplicate_spans(SF).to_pandas()
    out = dedup_substrings(SF).to_pandas().set_index("doc_id")
    orig = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"]).set_index("doc_id")
    assert set(out.index) == set(orig.index)
    per_doc = spans.assign(n=spans["span_end"] - spans["span_start"]) \
        .groupby("doc_id")["n"].sum()
    for doc_id, row in out.iterrows():
        want_removed = int(per_doc.get(doc_id, 0))
        assert row["n_removed_chars"] == want_removed
        assert len(row["text"]) == len(orig.loc[doc_id, "text"]) - \
            want_removed
        if want_removed == 0:
            assert row["text"] == orig.loc[doc_id, "text"]
        else:
            # surgery = manual cut of the same spans
            t = orig.loc[doc_id, "text"]
            kept, prev = [], 0
            for _, s in spans[spans["doc_id"] == doc_id].iterrows():
                kept.append(t[prev:int(s["span_start"])])
                prev = int(s["span_end"])
            kept.append(t[prev:])
            assert row["text"] == "".join(kept)
