"""The "no silent caps" rule: operators whose caps SHAPE answers on
pathological inputs (LSH band star cap, interleaved hot-ref exclusion)
must report how much got capped — pinned here on planted pathological
fixtures, and pinned to ZERO on healthy ones."""

import numpy as np
import pandas as pd
import pyarrow as pa

from olx_ray.state import telemetry
from tests.test_interleaved_neardup import _docs


def test_hot_ref_cap_telemetry(ray_session):
    from olx_ray.pipelines.spans import interleaved_neardup_pairs

    rows = [
        (f"w/{i}", [("description", f"doc number {i} " + " ".join(
            f"tok{i}x{j}" for j in range(10)), None),
            ("image", None, "hot"), ("image", None, f"x{i}")])
        for i in range(5)
    ]
    # "hot" shared by 5 docs: capped at hot_ref_cap=2 -> reported
    interleaved_neardup_pairs(_docs(rows), text_threshold=0.9,
                              media_threshold=0.5, hot_ref_cap=2)
    assert telemetry.last("interleaved_neardup") == {"capped_refs": 1}
    # healthy run (cap above the sharing count) -> zero
    interleaved_neardup_pairs(_docs(rows), text_threshold=0.9,
                              media_threshold=0.5, hot_ref_cap=256)
    assert telemetry.last("interleaved_neardup") == {"capped_refs": 0}


def test_hot_ref_cap_telemetry_incremental(ray_session):
    from olx_ray.pipelines.spans import interleaved_neardup_incremental

    corpus = _docs([(f"c/{i}", [("description", f"corpus doc {i} " +
                                 " ".join(f"ct{i}q{j}" for j in range(10)),
                                 None), ("image", None, "stock")])
                    for i in range(4)])
    new = _docs([("n/1", [("description", "a new doc with fresh words "
                           "entirely its own and nothing shared", None),
                          ("image", None, "stock"),
                          ("image", None, "n1pic")])])
    interleaved_neardup_incremental(corpus, new, text_threshold=0.9,
                                    media_threshold=0.5, hot_ref_cap=3)
    assert telemetry.last(
        "interleaved_neardup_incremental") == {"capped_refs": 1}


def test_lsh_star_cap_telemetry(ray_session, tmp_path):
    """>256 docs sharing every band key (mass exact duplicates): the
    star cap truncates the enumeration and MUST say so; connectivity
    survives (every member still joins the star's component)."""
    from olx_ray.pipelines.dedup import minhash_lsh_pairs

    boiler = ("identical boilerplate listing text repeated across the "
              "whole mirror farm with enough words to shingle properly "
              "and form stable minhash bands for every copy")
    n_dup = 300
    df = pd.DataFrame({
        "doc_id": np.arange(n_dup + 2, dtype=np.int64),
        "text": [boiler] * n_dup + [
            "one genuinely distinct document about garden furniture",
            "another distinct document about winter tires and rims"]})
    sf = tmp_path / "sf"
    sf.mkdir()
    pa.Table.from_pandas(df, preserve_index=False)
    df.to_parquet(sf / "documents.parquet", index=False)

    pairs = minhash_lsh_pairs(str(sf), threshold=0.9).to_pandas()
    t = telemetry.last("minhash_lsh")
    assert t is not None and t["capped_band_keys"] > 0
    # star connectivity: all 300 duplicates still form one component
    parent = {i: i for i in range(n_dup)}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in pairs.itertuples():
        if r.doc_a < n_dup and r.doc_b < n_dup:
            parent[find(int(r.doc_a))] = find(int(r.doc_b))
    assert len({find(i) for i in range(n_dup)}) == 1

    # healthy corpus -> zero capped keys and unchanged telemetry shape
    df2 = pd.DataFrame({
        "doc_id": np.arange(8, dtype=np.int64),
        "text": [f"unique document number {i} " + " ".join(
            f"w{i}x{j}" for j in range(12)) for i in range(8)]})
    sf2 = tmp_path / "sf2"
    sf2.mkdir()
    df2.to_parquet(sf2 / "documents.parquet", index=False)
    minhash_lsh_pairs(str(sf2), threshold=0.6)
    assert telemetry.last("minhash_lsh") == {"capped_band_keys": 0}
