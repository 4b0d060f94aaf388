"""Size-gated drop-id delivery (joins.gated_anti) — the shared dedup
"apply" tail: strategy agreement between the broadcast (< cap) and
bucketed (> cap) paths, forced both ways by monkeypatching the module
cap, on every operator that routes through it. Plus the planted
duplicate-id loud-refusal pins (the interleaved uid-space acceptance).
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from olx_ray.functions import joins
from tests.test_interleaved_neardup import ROWS, _docs


def _force(monkeypatch, cap):
    monkeypatch.setattr(joins, "ANTI_BROADCAST_ROW_CAP", cap)


def _sorted_pdf(ds, by):
    df = ds.to_pandas()
    return df.sort_values(by, kind="mergesort").reset_index(drop=True)


# ------------------------------------------------------------- unit level
@pytest.mark.parametrize("keytype", ["int", "str"])
def test_gated_anti_paths_agree(ray_session, monkeypatch, keytype):
    if keytype == "int":
        keys = list(range(50))
        drops = [3, 7, 7, 21, 49, 999]       # dup + miss on the drop side
    else:
        keys = [f"k{i:03d}" for i in range(50)]
        drops = ["k003", "k007", "k007", "k021", "k049", "nope"]
    left = rd.from_pandas(pd.DataFrame({"k": keys, "v": range(50)}))
    dk = rd.from_pandas(pd.DataFrame({"k": drops}))
    want = sorted(set(range(50)) - ({3, 7, 21, 49} if keytype == "int"
                                    else {3, 7, 21, 49}))
    for cap in (0, 10**9):                   # bucketed, then broadcast
        _force(monkeypatch, cap)
        got = _sorted_pdf(joins.gated_anti(left, dk, "k"), ["v"])
        assert list(got["v"]) == want, cap


def test_gated_anti_int_width_mismatch(ray_session, monkeypatch):
    """int32 corpus key vs int64 drop ids: both paths must still match
    (keys normalize to 64-bit — widen, never narrow)."""
    left = rd.from_arrow(pa.table({
        "k": pa.array(range(20), pa.int32()),
        "v": pa.array(range(20), pa.int64())}))
    dk = rd.from_arrow(pa.table({"k": pa.array([2, 5, 19], pa.int64())}))
    for cap in (0, 10**9):
        _force(monkeypatch, cap)
        got = _sorted_pdf(joins.gated_anti(left, dk, "k"), ["v"])
        assert list(got["v"]) == [i for i in range(20)
                                  if i not in (2, 5, 19)], cap


def test_gated_anti_narrow_drop_side_wide_corpus(ray_session, monkeypatch):
    """The REVERSE width mix — int32 DROP ids against an int64 corpus
    holding out-of-int32-range values: the old broadcast path cast the
    corpus batch DOWN and crashed on the legal non-member 5e9; both
    strategies must keep it (review finding)."""
    big = 5_000_000_000
    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, big], pa.int64()),
        "v": pa.array([10, 20, 30, 40], pa.int64())}))
    dk = rd.from_arrow(pa.table({"k": pa.array([2], pa.int32())}))
    for cap in (0, 10**9):
        _force(monkeypatch, cap)
        got = _sorted_pdf(joins.gated_anti(left, dk, "k"), ["v"])
        assert list(got["v"]) == [10, 30, 40], cap


def test_gated_anti_empty_drop_side_is_noop(ray_session, monkeypatch):
    left = rd.from_pandas(pd.DataFrame({"k": [1, 2], "v": [10, 20]}))
    dk = rd.from_pandas(pd.DataFrame({"k": [5]})).filter(expr="k > 99")
    for cap in (0, 10**9):
        _force(monkeypatch, cap)
        assert joins.gated_anti(left, dk, "k").count() == 2


# ----------------------------------------------- operator-level agreement
def test_dedup_interleaved_gate_agreement(ray_session, monkeypatch):
    """dedup_interleaved through both delivery paths: identical survivor
    set AND byte-identical nested schema (the bucketed path ships whole
    interleaved payloads through bucket_semi — its Arrow-native filter
    must not widen the int32 span offsets)."""
    from olx_ray.pipelines.spans import dedup_interleaved

    rows = ROWS + [("ad/a-copy", ROWS[0][1]), ("ad/e-copy", ROWS[4][1])]
    outs, schemas = [], []
    for cap in (0, 10**9):
        _force(monkeypatch, cap)
        ds = dedup_interleaved(_docs(rows)).materialize()
        schemas.append(ds.schema())
        df = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
        outs.append([(r["doc_id"], [dict(s) for s in r["spans"]])
                     for _, r in df.iterrows()])
    assert outs[0] == outs[1]
    assert [str(t) for t in schemas[0].types] == \
        [str(t) for t in schemas[1].types]
    assert "int32" in str(schemas[0].types[1])     # offsets NOT widened
    kept = {d for d, _ in outs[0]}
    assert "ad/a-copy" not in kept and "ad/e-copy" not in kept
    assert {"ad/a", "ad/e"} <= kept


def test_keep_representatives_gate_agreement(ray_session, monkeypatch,
                                             tmp_path):
    """dedup_keep_representatives (min_id AND best_quality) through both
    delivery paths on a real parquet corpus."""
    from olx_ray.pipelines.dedup import dedup_keep_representatives

    base = ("the quick brown fox jumps over the lazy dog near the "
            "river bank every single morning without fail")
    rows = pd.DataFrame({
        "doc_id": np.arange(8, dtype=np.int64),
        "text": [base, base.replace("lazy", "sleepy"), "tiny",
                 base.replace("morning", "evening"), "unrelated words "
                 "entirely about machine tools and lathe spindles",
                 base, "short", base + " extra tail words here"]})
    sf = tmp_path / "sf"
    sf.mkdir()
    rows.to_parquet(sf / "documents.parquet", index=False)
    for keep in ("min_id", "best_quality"):
        got = []
        for cap in (0, 10**9):
            _force(monkeypatch, cap)
            got.append(dedup_keep_representatives(
                str(sf), threshold=0.5, keep=keep).to_pandas()
                .reset_index(drop=True))
        pd.testing.assert_frame_equal(got[0], got[1])
        assert 0 < len(got[0]) < len(rows)


def test_neardup_incremental_gate_agreement(ray_session, monkeypatch):
    from olx_ray.pipelines.dedup import neardup_incremental

    base = ("advertisement for a two bedroom flat near the central "
            "park with fresh renovation and a balcony facing south")
    corpus = rd.from_pandas(pd.DataFrame({
        "doc_id": np.array([0, 1], dtype=np.int64),
        "text": [base, "completely different corpus text about used "
                 "winter tires in good condition"]}))
    new = rd.from_pandas(pd.DataFrame({
        "doc_id": np.array([10, 11, 12], dtype=np.int64),
        "text": [base.replace("south", "north"),      # near corpus -> drop
                 "novel text about a vintage desk lamp with warm "
                 "light and minor scratches on the base",
                 "novel text about a vintage desk lamp with warm "
                 "light and minor scratches on the base"]}))  # twin: min id
    got = []
    for cap in (0, 10**9):
        _force(monkeypatch, cap)
        got.append(neardup_incremental(corpus, new, threshold=0.5)
                   .to_pandas().reset_index(drop=True))
    pd.testing.assert_frame_equal(got[0], got[1])
    assert list(got[0]["doc_id"]) == [11]


def test_semantic_dedup_corpus_gate_agreement(ray_session, monkeypatch):
    from olx_ray.pipelines.semdedup import semantic_dedup_corpus

    sf = "/root/testdata/sf0.001"
    got = []
    for cap in (0, 10**9):
        _force(monkeypatch, cap)
        got.append(semantic_dedup_corpus(sf, eps=0.93).to_pandas()
                   .reset_index(drop=True))
    pd.testing.assert_frame_equal(got[0], got[1])
    assert len(got[0]) > 0


def test_gated_anti_probe_cache_no_crosstalk(ray_session, monkeypatch):
    """Two broadcast-path calls with DIFFERENT drop sets in one session:
    the per-worker probe-index cache is keyed by object ref, so the
    second call must not reuse the first call's index (a stale-cache
    bug here would silently mis-dedup every later call in the
    session). Also: duplicate ids on the drop side are deduped before
    the unique-index build."""
    _force(monkeypatch, 10**9)
    left = rd.from_pandas(pd.DataFrame({"k": list(range(10)),
                                        "v": list(range(10))}))
    d1 = rd.from_pandas(pd.DataFrame({"k": [1, 1, 2, 2]}))   # dup ids
    d2 = rd.from_pandas(pd.DataFrame({"k": [7, 8]}))
    got1 = sorted(joins.gated_anti(left, d1, "k").to_pandas()["v"])
    got2 = sorted(joins.gated_anti(left, d2, "k").to_pandas()["v"])
    assert got1 == [0, 3, 4, 5, 6, 7, 8, 9]
    assert got2 == [0, 1, 2, 3, 4, 5, 6, 9]


# ------------------------------------------------- duplicate-id refusals
def test_dedup_interleaved_refuses_duplicate_ids(ray_session):
    """Two rows with the SAME doc_id and identical content: an id-based
    anti-filter cannot express "drop one of two identical ids" — it
    would silently drop both. The guard must refuse loudly (the planted
    collision the 2^-64 uid acceptance is documented against)."""
    from olx_ray.pipelines.spans import dedup_interleaved

    bad = [("dup/x", ROWS[0][1]), ("dup/x", ROWS[0][1])]
    with pytest.raises(Exception, match="multiple"):
        dedup_interleaved(_docs(bad)).to_pandas()
