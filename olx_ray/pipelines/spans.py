"""Operators over the INTERLEAVED span payload — documents whose rows
are ordered sequences of text and media spans (``doc_id,
spans: list<struct<kind, text, media_ref, offset>>``), the engine's
native multimodal document shape (produced by ``stages/parse.py``,
packed by ``corpus.pack_interleaved``, QA-diffed by
``crawl.span_diff``).

Everything here is BATCH-LOCAL (a document's spans live inside its
row, so no operator needs a shuffle): flatten the list column once,
transform the flat child arrays vectorized, rebuild the list structure
around them. The adapters let every flat-text operator in the engine
run over interleaved documents without unpacking them into a separate
table and re-joining.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _flat_spans(col):
    """(list_array, flat_struct, counts int64) for a spans column —
    combine-chunks guard shared with ``blocks.explode_list_column``;
    null span LISTS are refused loudly (the engine schema never emits
    them, and silently treating null as empty would make a rebuilt
    column disagree with ``span_fingerprints`` on the source)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count:
        raise ValueError("spans column contains null lists — the "
                         "interleaved schema uses empty lists, not null")
    counts = pc.list_value_length(col).to_numpy(
        zero_copy_only=False).astype(np.int64)
    return col, pc.list_flatten(col), counts


def _text_bearing(flat):
    """Boolean mask of the TEXT-BEARING spans of a flat struct array:
    a span is media iff its ``media_ref`` is non-null and non-empty
    (the parser emits ``media_ref=None`` for title/description/price/
    brief and a ref only for images) — schema-driven, so operators
    don't hardcode the kind vocabulary."""
    mref = pc.struct_field(flat, "media_ref")
    return pc.or_kleene(pc.is_null(mref), pc.equal(mref, pa.scalar("")))


def transform_text_spans(ds, fn, kinds: tuple | None = None):
    """Apply a VECTORIZED text transform to the ``text`` field of the
    selected spans, in place in the interleaved structure — span
    order, media refs, offsets and every other field are preserved
    bit-for-bit, so any flat-text operator (PII redaction,
    normalization, casing) runs over interleaved documents with ZERO
    shuffle and no unpack/re-join.

    ``kinds=None`` (default) selects every TEXT-BEARING span
    (``media_ref`` null/empty — kind-vocabulary-independent); pass a
    tuple of kind names to restrict further. ``fn``:
    ``pa.StringArray → array-like of equal length`` (called once per
    batch on the flattened text child — one kernel invocation per
    batch, never per span; media spans' null text passes through, and
    Arrow kernels propagate nulls). Non-selected spans keep their text
    untouched; the struct's field ORDER is taken from the input so the
    rebuilt schema is identical."""

    def tx(b: pa.Table) -> pa.Table:
        idx = b.schema.get_field_index("spans")
        col, flat, counts = _flat_spans(b["spans"])
        if len(flat) == 0:
            return b
        kind = pc.struct_field(flat, "kind")
        text = pc.struct_field(flat, "text")
        new_text = fn(text)
        if isinstance(new_text, pa.ChunkedArray):
            new_text = new_text.combine_chunks()
        if not isinstance(new_text, pa.Array):
            new_text = pa.array(new_text, pa.string())
        if len(new_text) != len(text):
            raise ValueError(
                f"transform_text_spans: fn returned {len(new_text)} "
                f"values for {len(text)} spans — must be 1:1")
        mask = _text_bearing(flat)
        if kinds is not None:
            mask = pc.and_(mask, pc.is_in(
                kind, value_set=pa.array(list(kinds), pa.string())))
        merged = pc.if_else(mask, new_text.cast(pa.string()), text)
        st = flat.type
        children = [merged if st.field(i).name == "text"
                    else pc.struct_field(flat, st.field(i).name)
                    for i in range(st.num_fields)]
        new_flat = pa.StructArray.from_arrays(
            children, names=[st.field(i).name
                             for i in range(st.num_fields)])
        offsets = pa.array(
            np.concatenate(([0], np.cumsum(counts))).astype(np.int32),
            pa.int32())
        return b.set_column(idx, "spans",
                            pa.ListArray.from_arrays(offsets, new_flat))

    return ds.map_batches(tx, batch_format="pyarrow")


def _redact_arrow(text):
    """The ``text.RedactPII`` rules as Arrow RE2 kernels — the same
    regex subset where Python ``re``, DuckDB and RE2 agree (see
    ``text.py::RedactPII``), applied in the same URL → email → digit
    order, one ``replace_substring_regex`` per rule per batch."""
    for pat, token in [
            (r"https?://[^ \t\n]+", "<URL>"),
            (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
             "<EMAIL>"),
            (r"[0-9][0-9 ()+-]{5,}[0-9]", "<NUM>")]:
        text = pc.replace_substring_regex(text, pattern=pat,
                                          replacement=token)
    return text


def redact_pii_interleaved(ds):
    """PII-scrub the text spans of interleaved documents — the
    pre-training privacy pass (``text.redact_pii``) running NATIVELY
    over the multimodal payload: media spans and span order untouched,
    text spans rewritten by the identical rule set (RE2 kernels,
    span-for-span equal to the flat operator's output on the same
    strings — pinned in pytest)."""
    return transform_text_spans(ds, _redact_arrow)


def span_stats(ds):
    """Per-document composition stats of the interleaved payload:
    ``(doc_id, n_spans, n_text, n_media, text_chars)`` where text vs
    media follows ``_text_bearing`` (media = non-empty ``media_ref``,
    kind-vocabulary-independent) and ``text_chars`` sums the text
    field's lengths over text spans — the feature row that
    interleaved-document quality filters cut on (e.g. drop image-only
    pages or text-starved docs before ``pack_interleaved``).
    Batch-local and fully vectorized (one flatten + masked
    ``np.add.at`` folds); no shuffle."""

    def stats(b: pa.Table) -> pa.Table:
        n = b.num_rows
        if n == 0:
            return pa.table({
                "doc_id": pa.array([], pa.string()),
                "n_spans": pa.array([], pa.int64()),
                "n_text": pa.array([], pa.int64()),
                "n_media": pa.array([], pa.int64()),
                "text_chars": pa.array([], pa.int64())})
        col, flat, counts = _flat_spans(b["spans"])
        parent = np.repeat(np.arange(n, dtype=np.int64), counts)
        is_text = _text_bearing(flat).to_numpy(
            zero_copy_only=False).astype(bool)
        chars = pc.utf8_length(pc.fill_null(
            pc.struct_field(flat, "text"), "")) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        n_text = np.zeros(n, np.int64)
        np.add.at(n_text, parent[is_text], 1)
        tchars = np.zeros(n, np.int64)
        np.add.at(tchars, parent[is_text], chars[is_text])
        return pa.table({
            "doc_id": b["doc_id"].cast(pa.string()),
            "n_spans": pa.array(counts, pa.int64()),
            "n_text": pa.array(n_text, pa.int64()),
            "n_media": pa.array(counts - n_text, pa.int64()),
            "text_chars": pa.array(tchars, pa.int64())})

    return ds.map_batches(stats, batch_format="pyarrow")


def dedup_interleaved(ds, n_buckets: int = 64):
    """Exact dedup of INTERLEAVED documents: two docs are duplicates
    iff their whole span sequences match (kind, text, media_ref,
    order) — the multimodal analogue of text `dedup_exact`, catching
    e.g. re-crawled ads whose title+description+images are identical
    under a different doc_id. Keep = min doc_id per sequence
    (deterministic, partition-invariant).

    Shuffle discipline: each side reduces batch-locally to
    `crawl.span_fingerprints` rows, so the ONLY exchange is a
    fingerprint-hash bucket shuffle of (doc_id, n_spans, span_fp) —
    document payloads never move. Dropped ids collect to the driver
    (duplicate-rate-bounded, the `semantic_dedup_corpus` contract) and
    broadcast once; survivors stream through one vectorized `is_in`
    anti-filter. Equality is the 64-bit digest + span count — a false
    merge is a ~2⁻⁶⁴ collision (acceptable for dedup; `span_diff` is
    the exact comparator when it matters).

    Precondition: doc_id uniquely identifies a row (the crawl's
    seen-filter contract). Same-id duplicate rows are REFUSED loudly —
    an id anti-join cannot drop one of two identical ids, so silence
    would keep both copies."""
    import pandas as pd
    import ray

    from ..functions.blocks import collect_pandas
    from .crawl import span_fingerprints

    fps = span_fingerprints(ds)

    def bucketize(b: pa.Table) -> pa.Table:
        from ..functions.hashing import bucket_of

        fp = b["span_fp"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return b.append_column(
            "_bucket", pa.array(bucket_of(fp, n_buckets), pa.int32()))

    def drops(g: pd.DataFrame) -> pd.DataFrame:
        dup = g.duplicated("doc_id")
        if dup.any():
            # an id appearing twice (identical content lands in the
            # same fp bucket) cannot be deduped by an id anti-join —
            # dropping "one of two identical ids" is inexpressible, so
            # silence here would KEEP both copies (review finding).
            # doc_id is the canonical URL and unique by the crawl's
            # seen-filter contract; refuse violations loudly.
            raise ValueError(
                f"dedup_interleaved: doc_id "
                f"{g.loc[dup, 'doc_id'].iloc[0]!r} appears in multiple "
                f"rows — doc_id must uniquely identify a document; "
                f"collapse same-id rows upstream")
        keep = g.groupby(["n_spans", "span_fp"])["doc_id"] \
            .transform("min")
        return g.loc[g["doc_id"] != keep, ["doc_id"]]

    dropped = fps.map_batches(bucketize, batch_format="pyarrow") \
        .groupby("_bucket").map_groups(drops, batch_format="pandas")
    drop_ids = collect_pandas(dropped, {"doc_id": str})["doc_id"]
    ref = ray.put(pa.array(sorted(drop_ids), pa.string()))

    def anti(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].cast(pa.string())
        return b.filter(pc.invert(pc.is_in(ids, value_set=ray.get(ref))))

    return ds.map_batches(anti, batch_format="pyarrow")


def text_view(ds, sep: str = "\n"):
    """Flatten interleaved documents to the flat ``(doc_id, text)``
    shape — text-bearing spans joined in order by ``sep``, media spans
    contributing nothing — so EVERY flat-text operator in the engine
    (MinHash/SimHash dedup, Gopher rules, perplexity, DSIR, BPE, …)
    runs over crawled multimodal documents unchanged. Batch-local and
    fully vectorized: one flatten, one mask, one ``binary_join`` per
    batch; no shuffle, no per-row Python."""

    def view(b: pa.Table) -> pa.Table:
        n = b.num_rows
        if n == 0:
            return pa.table({"doc_id": pa.array([], pa.string()),
                             "text": pa.array([], pa.string())})
        col, flat, counts = _flat_spans(b["spans"])
        parent = np.repeat(np.arange(n, dtype=np.int64), counts)
        keep = _text_bearing(flat).to_numpy(
            zero_copy_only=False).astype(bool)
        texts = pc.fill_null(pc.struct_field(flat, "text"), "")
        # rebuild a list<string> of ONLY the text spans per doc, then
        # one binary_join kernel call joins every doc at once
        kept_parent = parent[keep]
        kept_counts = np.bincount(kept_parent, minlength=n) \
            .astype(np.int64)
        offsets = pa.array(
            np.concatenate(([0], np.cumsum(kept_counts)))
            .astype(np.int32), pa.int32())
        kept_texts = texts.filter(pa.array(keep))
        joined = pc.binary_join(
            pa.ListArray.from_arrays(offsets, kept_texts), sep)
        return pa.table({"doc_id": b["doc_id"].cast(pa.string()),
                         "text": joined})

    return ds.map_batches(view, batch_format="pyarrow")


def media_refs(ds):
    """Flatten interleaved documents to the MEDIA worklist — one row
    per media span, ``(doc_id, media_ref, offset)`` — the handoff from
    crawl payloads to the media pipeline (fetch the refs, decode with
    ``multimodal``'s actor-pool stages, join features back on
    ``(doc_id, offset)``). Batch-local explode + mask; no shuffle; a
    doc's media rows keep its span offsets so the interleaving
    position survives the round-trip."""

    def refs(b: pa.Table) -> pa.Table:
        n = b.num_rows
        if n == 0:
            return pa.table({"doc_id": pa.array([], pa.string()),
                             "media_ref": pa.array([], pa.string()),
                             "offset": pa.array([], pa.int32())})
        col, flat, counts = _flat_spans(b["spans"])
        parent = np.repeat(np.arange(n, dtype=np.int64), counts)
        keep = pc.invert(_text_bearing(flat))
        ids = b["doc_id"].cast(pa.string()).take(
            pa.array(parent, pa.int64()))
        t = pa.table({"doc_id": ids,
                      "media_ref": pc.struct_field(flat, "media_ref")
                      .cast(pa.string()),
                      "offset": pc.struct_field(flat, "offset")
                      .cast(pa.int32())})
        return t.filter(keep)

    return ds.map_batches(refs, batch_format="pyarrow")
