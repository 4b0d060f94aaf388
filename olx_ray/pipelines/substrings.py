"""Exact substring deduplication over the documents table.

The training-data operator from the public literature (Lee et al. 2022,
"Deduplicating Training Data Makes Language Models Better"): find every
maximal text span covered by length-``L`` character grams that occur
more than once in the corpus (within OR across documents), and
optionally cut those spans out. The reference implementation there is a
single-machine suffix array; this engine re-expresses the semantics
Ray-Data-first as three bucketed stages over position-level gram
hashes — no global suffix structure, no driver-side state:

1. ``map_batches``: one vectorized rolling-hash pass per batch emits
   ``(gram_hash, doc_id, pos)`` for every L-char window. The hash is a
   position-normalized polynomial over **code points** (one uint64 per
   char via UTF-32), computed for a whole batch in O(total chars) numpy:
   prefix sums ``S[i] = Σ_{k<i} c_k·B^k`` (uint64 wraps ≡ mod 2^64) give
   ``H[i] = (S[i+L] − S[i])·B^{-i}`` — ``B`` is odd, hence invertible
   mod 2^64, so equal substrings hash equal at ANY offset in ANY doc.
2. ``groupby`` gram-hash bucket: a window survives iff its hash occurs
   ≥ 2 times corpus-wide (one vectorized duplicated-mask per bucket).
   Survivor volume is bounded by the duplicated text, not the corpus.
3. ``groupby`` doc bucket: merge surviving windows into maximal spans
   (sorted positions; a window extends the current span iff
   ``pos ≤ prev_pos + L`` — overlap or contiguity), vectorized
   gaps-and-islands across every doc in the bucket.

Scale notes (SCALE.md): stage 1 emits one 24-byte row per text
position — ~24× the corpus bytes through ONE shuffle. That is the
honest cost of exact position-level dedup (the suffix-array reference
pays the same blowup in RAM); for 100 TB runs the documented knob is
``winnow`` > 1: per-doc WINNOWING fingerprint selection (Schleimer,
Wilkerson & Aiken, SIGMOD'03 — keep each w-window's min hash), which
cuts emission ~w× while keeping the guarantee that every duplicated
run of length ≥ L + w − 1 shares ≥ 1 selected fingerprint in BOTH
copies (selection is content-defined, so identical text selects
identical windows at any offset — a fixed position grid would not).
Winnowed span boundaries carry < w chars of slack at each end;
``winnow=1`` is exact. Hashing stays full O(n) either way — only the
shuffled volume shrinks. 64-bit hashes stand in for gram equality; at
10^12 positions the birthday expectation is ~27 colliding pairs —
each would add a false duplicate span (conservative for dedup).

Reference parity: the reference engine (stanikol/olx) has no substring
dedup; this module is part of the beyond-reference LLM-data surface
(COVERAGE.md "Beyond-reference training-data operators").
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..functions.hashing import mix64

# odd ⇒ invertible mod 2^64 (FNV-1a 64-bit prime)
_B = np.uint64(0x100000001B3)
_BINV = np.uint64(pow(0x100000001B3, -1, 1 << 64))
_U64 = np.uint64(0)  # dtype anchor


def _codes(texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Concatenated UTF-32 code points + row offsets for a batch.
    One code point per CHARACTER (not byte) so positions line up with
    SQL ``substr``/``length`` semantics on non-ASCII text too."""
    lens = np.fromiter((len(t) for t in texts), np.int64, len(texts))
    offs = np.zeros(len(texts) + 1, np.int64)
    np.cumsum(lens, out=offs[1:])
    buf = np.empty(int(offs[-1]), np.uint32)
    for i, t in enumerate(texts):
        if t:
            buf[offs[i]:offs[i + 1]] = np.frombuffer(
                t.encode("utf-32-le"), np.uint32)
    return buf.astype(np.uint64), offs


def _window_hashes(texts: list[str], L: int, winnow: int = 1):
    """(gram_hash, row_idx, pos) for the L-char windows of every text,
    one numpy pass over the batch's concatenated code points.

    ``winnow=1`` emits every window. ``winnow=w>1`` emits the WINNOWED
    subset: per doc, the minimum-hash window of each run of ``w``
    consecutive windows (leftmost tie) — content-defined, so identical
    substrings select identical windows at any offset in any doc."""
    codes, offs = _codes(texts)
    n = len(codes)
    if n < L:
        e = np.empty(0, np.int64)
        return e.view(np.uint64), e, e
    # prefix sums of c_k·B^k and the inverse powers, both mod 2^64
    pw = np.full(n, _B, np.uint64)
    pw[0] = np.uint64(1)
    np.cumprod(pw, out=pw)                       # pw[k] = B^k
    ipw = np.full(n, _BINV, np.uint64)
    ipw[0] = np.uint64(1)
    np.cumprod(ipw, out=ipw)                     # ipw[k] = B^-k
    s = np.zeros(n + 1, np.uint64)
    np.cumsum(codes * pw, out=s[1:])             # wraps ≡ mod 2^64
    h = (s[L:] - s[:-L]) * ipw[: n - L + 1]      # H[i] = Σ c_{i+j}·B^j

    # valid window starts: wholly inside one doc
    lens = np.diff(offs)
    rows = np.flatnonzero(lens >= L)
    counts = lens[rows] - L + 1
    row_idx = np.repeat(rows, counts)
    grid = np.arange(int(counts.max()), dtype=np.int64) if len(rows) else \
        np.empty(0, np.int64)
    pos = np.concatenate([grid[:c] for c in counts]) \
        if len(rows) else np.empty(0, np.int64)
    gh = h[offs[row_idx] + pos] if len(rows) else \
        np.empty(0, np.int64).view(np.uint64)
    if winnow <= 1 or not len(gh):
        return gh, row_idx, pos

    keep = np.zeros(len(gh), bool)
    doc_start = 0
    for c in counts:                 # per-doc sliding-min selection
        hh = gh[doc_start:doc_start + c]
        if c <= winnow:
            keep[doc_start + int(np.argmin(hh))] = True
        else:
            win = np.lib.stride_tricks.sliding_window_view(hh, winnow)
            sel = np.unique(np.argmin(win, axis=1) +
                            np.arange(c - winnow + 1))
            keep[doc_start + sel] = True
        doc_start += c
    return gh[keep], row_idx[keep], pos[keep]


def duplicate_spans(sf_dir: str, L: int = 40, winnow: int = 1,
                    n_buckets: int = 32):
    """Maximal duplicated spans per document:
    ``(doc_id, span_start, span_end)`` (0-based, end-exclusive), every
    position covered by an L-gram occurring ≥ 2 times corpus-wide,
    overlapping/contiguous windows merged. Sorted for the driver gate;
    DuckDB oracle = ``DUPLICATE_SPANS_SQL`` (exact only at
    ``winnow=1``, the default — winnowed runs are the documented
    reduced-emission scale mode)."""
    if winnow >= L:
        raise ValueError("winnow must be < L (selected fingerprints "
                         "within a duplicated run are ≤ winnow apart; "
                         "the span merge rule relies on winnow ≤ L)")
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def windows(b: pa.Table) -> pa.Table:
        texts = b["text"].to_pylist()
        h, row_idx, pos = _window_hashes(texts, L, winnow)
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "gram_hash": pa.array(h, pa.uint64()),
            "doc_id": pa.array(ids[row_idx], pa.int64()),
            "pos": pa.array(pos, pa.int64()),
            "bucket": pa.array(
                (mix64(h.view(np.int64)) % np.uint64(n_buckets))
                .astype(np.int32), pa.int32()),
        })

    def survivors(g: pd.DataFrame) -> pd.DataFrame:
        # a hash bucket holds EVERY occurrence of its gram hashes →
        # corpus-wide multiplicity is decidable locally
        keep = g["gram_hash"].duplicated(keep=False)
        out = g.loc[keep, ["doc_id", "pos"]]
        return out.assign(
            dbucket=(mix64(out["doc_id"].to_numpy()) %
                     np.uint64(n_buckets)).astype(np.int32))

    def merge_spans(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc_id", "pos"], kind="mergesort")
        doc = g["doc_id"].to_numpy()
        pos = g["pos"].to_numpy()
        # new span when the doc changes or the window starts past the
        # previous span's reach (same-length windows ⇒ running span end
        # is prev_pos + L)
        brk = np.r_[True, (doc[1:] != doc[:-1]) | (pos[1:] > pos[:-1] + L)]
        grp = np.cumsum(brk) - 1
        starts = pos[brk]
        ends = np.maximum.reduceat(pos, np.flatnonzero(brk)) + L
        return pd.DataFrame({"doc_id": doc[brk],
                             "span_start": starts,
                             "span_end": ends})

    spans = (docs
             .map_batches(windows, batch_format="pyarrow")
             .groupby("bucket").map_groups(survivors, batch_format="pandas")
             .groupby("dbucket").map_groups(merge_spans,
                                            batch_format="pandas"))
    return spans.sort(["doc_id", "span_start"])


def dedup_substrings(sf_dir: str, L: int = 40, winnow: int = 1,
                     n_buckets: int = 32):
    """Documents with every duplicated span cut out:
    ``(doc_id, text, n_removed_chars)``. Docs without spans pass
    through untouched; span surgery happens inside the doc-bucket task
    (affected docs only cross the one extra shuffle)."""
    spans = duplicate_spans(sf_dir, L, winnow, n_buckets)

    def pack(g: pd.DataFrame) -> pa.Table:
        # one row per affected doc: the span list, ready to broadcastless
        # bucket-join against the text. Arrow-typed list columns — an
        # object-dtype pandas list column would leave the Dataset schema
        # untyped and break the join's null padding.
        agg = (g.sort_values("span_start")
                .groupby("doc_id", sort=True)
                .agg(starts=("span_start", list), ends=("span_end", list))
                .reset_index())
        return pa.table({
            "doc_id": pa.array(agg["doc_id"].to_numpy(np.int64),
                               pa.int64()),
            "starts": pa.array(agg["starts"].tolist(),
                               pa.list_(pa.int64())),
            "ends": pa.array(agg["ends"].tolist(), pa.list_(pa.int64()))})

    from ..functions.hashing import append_bucket
    from ..functions.joins import bucket_hash_join

    packed = spans.map_batches(
        append_bucket("doc_id", n_buckets, "_sb"), batch_format="pyarrow") \
        .groupby("_sb").map_groups(pack, batch_format="pandas")

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def cut(j: pd.DataFrame) -> pd.DataFrame:
        texts = j["text"].tolist()
        out_t, out_n = [], []
        for t, ss, es in zip(texts, j["starts"], j["ends"]):
            if not isinstance(ss, (list, np.ndarray)) or ss is None or \
                    (isinstance(ss, float) and np.isnan(ss)):
                out_t.append(t)
                out_n.append(0)
                continue
            kept, prev, removed = [], 0, 0
            for s, e in zip(ss, es):
                kept.append(t[prev:int(s)])
                removed += int(e) - int(s)
                prev = int(e)
            kept.append(t[prev:])
            out_t.append("".join(kept))
            out_n.append(removed)
        return pd.DataFrame({"doc_id": j["doc_id"].astype(np.int64),
                             "text": out_t,
                             "n_removed_chars": np.asarray(out_n, np.int64)})

    joined = bucket_hash_join(docs, packed, on="doc_id", how="left",
                              columns_left=["doc_id", "text"],
                              columns_right=["doc_id", "starts", "ends"],
                              post=cut)
    return joined.sort("doc_id")


# Validated against the engine at sf0.001/sf0.01/sf0.1 (driver mirror).
# Exact-substring multiplicity; the engine's 64-bit rolling hash stands
# in for gram equality (collision odds documented in the module header).
DUPLICATE_SPANS_SQL_TMPL = """
WITH pos AS (
  SELECT doc_id,
         unnest(generate_series(1, greatest(length(text) - {L} + 1, 0))) AS i,
         text
  FROM documents
), g AS (
  SELECT doc_id, i, substr(text, i, {L}) AS gram FROM pos
), dup AS (
  SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2
), hits AS (
  SELECT doc_id, i FROM g WHERE gram IN (SELECT gram FROM dup)
), flags AS (
  SELECT doc_id, i,
         CASE WHEN COALESCE(i - lag(i) OVER (PARTITION BY doc_id ORDER BY i),
                            {L} + 1) <= {L}
              THEN 0 ELSE 1 END AS brk
  FROM hits
), isl AS (
  SELECT doc_id, i,
         sum(brk) OVER (PARTITION BY doc_id ORDER BY i) AS grp
  FROM flags
)
SELECT doc_id, (min(i) - 1)::BIGINT AS span_start,
       (max(i) - 1 + {L})::BIGINT AS span_end
FROM isl GROUP BY doc_id, grp ORDER BY doc_id, span_start
"""

DUPLICATE_SPANS_SQL = DUPLICATE_SPANS_SQL_TMPL.format(L=40)
