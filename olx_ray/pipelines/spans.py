"""Operators over the INTERLEAVED span payload — documents whose rows
are ordered sequences of text and media spans (``doc_id,
spans: list<struct<kind, text, media_ref, offset>>``), the engine's
native multimodal document shape (produced by ``stages/parse.py``,
packed by ``corpus.pack_interleaved``, QA-diffed by
``crawl.span_diff``).

The per-document operators are BATCH-LOCAL (a document's spans live
inside its row, so no shuffle): flatten the list column once,
transform the flat child arrays vectorized, rebuild the list structure
around them. The adapters let every flat-text operator in the engine
run over interleaved documents without unpacking them into a separate
table and re-joining.

The CROSS-document family (``dedup_interleaved``,
``interleaved_neardup_pairs``/``_groups``/``_keep_representatives``,
``leakage_safe_split_interleaved``) exchanges only narrow derived rows
— fingerprints, band keys, ref hashes, pair rows — between workers;
document payloads never enter a shuffle.
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


def _doc_uid(col) -> np.ndarray:
    """int64 VIEW of ``hash64(doc_id)`` — the uid space every
    cross-document interleaved operator keys on (string doc ids are
    canonical URLs; the pair/group/components machinery is int64). A
    uid collision is ~2⁻⁶⁴ — the ``dedup_interleaved`` fingerprint
    acceptance. One definition: pairs, groups and the id maps must
    hash identically or joins silently go empty."""
    from ..functions.hashing import hash64_array

    return hash64_array(col).astype(np.int64)


def _anti_drop_ids(ds, dropped, n_buckets: int = 32):
    """Shared tail of every interleaved dedup operator: drop the
    ``(doc_id)`` rows of ``dropped`` from ``ds`` via the SIZE-GATED
    ``joins.gated_anti`` — below ``ANTI_BROADCAST_ROW_CAP`` the id set
    broadcasts once (zero shuffle), above it it ships as a bucketed
    Dataset (``bucket_semi(anti=True)``; one bucketed pass of ``ds``,
    nothing drop-set-sized on the driver). At web-crawl dup rates the
    dropped set is CORPUS-proportional, so the gate — not a
    "duplicate-rate-bounded" hope — is what holds at 10^10 docs.
    One call site on purpose: a guard added here holds for every
    caller."""
    from ..functions.joins import gated_anti

    return gated_anti(ds, dropped, "doc_id", n_buckets=n_buckets)


def _per_ref_group_fn(hot_ref_cap: int, new_only: bool = False):
    """THE per-ref-bucket media kernel, shared by the corpus pair
    engine (`_neardup_pairs_uids`) and the incremental gate
    (`interleaved_neardup_incremental`) — one definition so the cap
    accounting, telemetry row and size contributions can never
    desynchronize between them (review finding). One pass per ref
    bucket: doc-size contributions AND pair co-occurrence counts ride
    out in one tagged frame (kind=1: a=doc_uid, n=surviving refs here;
    kind=0: (a, b) pair, n=shared refs here; kind=2: ONE cap-telemetry
    row, n=refs this bucket EXCLUDED by hot_ref_cap — the "no silent
    caps" rule). ``new_only=True`` restricts the pair merge to
    NEW×ALL (side = uid bit 0); the symmetric-duplicate rows that
    merge shape produces are collapsed per (pair, ref) BEFORE
    counting, so the intersection counts match the corpus kernel's."""
    import pandas as pd

    def per_ref_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["doc_uid", "ref_hash"])
        sizes = g.groupby("ref_hash")["doc_uid"].transform("size")
        ok = g[sizes <= hot_ref_cap]
        n_capped = int(g.loc[sizes > hot_ref_cap, "ref_hash"].nunique())
        contrib = ok.groupby("doc_uid", as_index=False).size()
        out = [pd.DataFrame({"kind": np.int8(1), "a": contrib["doc_uid"],
                             "b": np.int64(0), "n": contrib["size"]}),
               pd.DataFrame({"kind": [np.int8(2)], "a": [np.int64(0)],
                             "b": [np.int64(0)], "n": [np.int64(n_capped)]})]
        if new_only:
            ns = ok[(ok["doc_uid"].to_numpy() % 2) == 1]
            m = ns.merge(ok, on="ref_hash", suffixes=("_n", "_x"))
            m = m[m["doc_uid_n"] != m["doc_uid_x"]]
            if len(m):
                # a new×new co-occurrence fires from BOTH merge rows;
                # dedupe per (pair, ref) — the ref stays in the key or
                # distinct refs of a pair would collapse and
                # undercount the intersection — then count per pair
                pf = pd.DataFrame({
                    "a": np.minimum(m["doc_uid_n"], m["doc_uid_x"]),
                    "b": np.maximum(m["doc_uid_n"], m["doc_uid_x"]),
                    "r": m["ref_hash"].to_numpy()}).drop_duplicates()
                pc_ = pf.groupby(["a", "b"], as_index=False).size()
                out.append(pd.DataFrame(
                    {"kind": np.int8(0), "a": pc_["a"], "b": pc_["b"],
                     "n": pc_["size"]}))
        else:
            m = ok.merge(ok, on="ref_hash", suffixes=("_a", "_b"))
            m = m[m["doc_uid_a"] < m["doc_uid_b"]]
            if len(m):
                pc_ = m.groupby(["doc_uid_a", "doc_uid_b"],
                                as_index=False).size()
                out.append(pd.DataFrame(
                    {"kind": np.int8(0), "a": pc_["doc_uid_a"],
                     "b": pc_["doc_uid_b"], "n": pc_["size"]}))
        return pd.concat(out, ignore_index=True)

    return per_ref_group


def _media_pairs_from_tagged(tagged, media_threshold: float,
                             n_buckets: int):
    """EXACT media-set Jaccard from a MATERIALIZED ``_per_ref_group_fn``
    tagged frame → scored ``(doc_a, doc_b, media_jaccard)`` Dataset of
    the pairs ≥ ``media_threshold`` (typed empty when no ref
    co-occurs). ONE definition shared by the corpus pair engine and
    the incremental gate — the Jaccard rounding, the union clamp and
    the threshold comparison must be bit-identical between them or the
    gates' media verdicts drift from the corpus operator's (the
    ``_per_ref_group_fn`` argument, review finding). Per-doc size and
    per-pair intersection folds are doc-/pair-bounded; two bucket
    joins attach the sizes."""
    import pandas as pd
    import ray.data as rd

    from ..functions.hashing import bucket_of
    from ..functions.joins import bucket_hash_join
    from .dedup import _pair_bucket

    # zero co-occurring refs → the joins below would see a schema-less
    # empty Dataset (map_groups over nothing emits no blocks); short-
    # circuit to the typed empty leg instead
    n_pair_rows = tagged.filter(expr="kind == 0").count()
    if not n_pair_rows:
        return rd.from_arrow(pa.table({
            "doc_a": pa.array([], pa.int64()),
            "doc_b": pa.array([], pa.int64()),
            "media_jaccard": pa.array([], pa.float64())}))

    def doc_sizes_fold(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("a", as_index=False)["n"].sum()

    sizes_ds = tagged.filter(expr="kind == 1") \
        .map_batches(lambda b: b.assign(
            _db=bucket_of(b["a"].to_numpy().astype(np.uint64), n_buckets)),
            batch_format="pandas") \
        .groupby("_db").map_groups(doc_sizes_fold, batch_format="pandas")

    def inter_fold(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["a", "b"], as_index=False)["n"].sum() \
            .rename(columns={"a": "doc_a", "b": "doc_b", "n": "inter"})

    inter_ds = tagged.filter(expr="kind == 0") \
        .map_batches(lambda b: b.assign(
            _pb=_pair_bucket(b["a"].to_numpy(), b["b"].to_numpy(),
                             n_buckets)), batch_format="pandas") \
        .groupby("_pb").map_groups(inter_fold, batch_format="pandas")

    def size_side(key: str):
        def rn(b: pd.DataFrame) -> pa.Table:
            return pa.table({key: pa.array(b["a"].to_numpy(), pa.int64()),
                             f"n_{key[-1]}": pa.array(
                                 b["n"].to_numpy(), pa.int64())})
        return sizes_ds.map_batches(rn, batch_format="pandas")

    def media_jac(b: pd.DataFrame) -> pa.Table:
        inter = b["inter"].to_numpy(np.float64)
        union = (b["n_a"].to_numpy(np.int64)
                 + b["n_b"].to_numpy(np.int64)) - b["inter"].to_numpy()
        mj = np.round(inter / np.maximum(union, 1), 6)
        keep = mj >= media_threshold
        return pa.table({
            "doc_a": pa.array(b["doc_a"].to_numpy()[keep], pa.int64()),
            "doc_b": pa.array(b["doc_b"].to_numpy()[keep], pa.int64()),
            "media_jaccard": pa.array(mj[keep], pa.float64())})

    def as_arrow(b: pd.DataFrame) -> pa.Table:
        return pa.table({c: pa.array(b[c].to_numpy(), pa.int64())
                         for c in b.columns})

    j = bucket_hash_join(inter_ds, size_side("doc_a"), on="doc_a",
                         n_buckets=n_buckets,
                         columns_left=["doc_a", "doc_b", "inter"],
                         columns_right=["doc_a", "n_a"])
    j = bucket_hash_join(j.map_batches(as_arrow, batch_format="pandas"),
                         size_side("doc_b"), on="doc_b",
                         n_buckets=n_buckets,
                         columns_left=["doc_a", "doc_b", "inter", "n_a"],
                         columns_right=["doc_b", "n_b"])
    return j.map_batches(media_jac, batch_format="pandas")


def _record_capped_refs(op: str, tagged) -> None:
    """Fold the media leg's kind=2 cap-telemetry rows (one per ref
    bucket, already materialized) into the driver-side registry —
    ``state.telemetry.last(op)["capped_refs"]`` says how many distinct
    media refs the hot-ref cap EXCLUDED from this run's answer (the
    "no silent caps" rule). Bucket-bounded rows; driver cost ~n_buckets
    ints."""
    from ..state import telemetry

    parts = tagged.filter(expr="kind == 2").map_batches(
        lambda b: pa.table({"n": pa.array(
            [int(pc.sum(b["n"]).as_py() or 0)], pa.int64())}),
        batch_format="pyarrow").take_all()
    telemetry.record(op, capped_refs=int(sum(r["n"] for r in parts)))


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
    document payloads never move. Dropped ids deliver through the
    SIZE-GATED `_anti_drop_ids` tail (broadcast below the cap,
    bucketed anti-join above it — web-crawl dup rates make the set
    corpus-proportional). Equality is the 64-bit digest + span count — a false
    merge is a ~2⁻⁶⁴ collision (acceptable for dedup; `span_diff` is
    the exact comparator when it matters).

    Precondition: doc_id uniquely identifies a row (the crawl's
    seen-filter contract). Same-id duplicate rows are REFUSED loudly —
    an id anti-join cannot drop one of two identical ids, so silence
    would keep both copies."""
    import pandas as pd

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
    return _anti_drop_ids(ds, dropped, n_buckets=n_buckets)


def text_view_batch(b: pa.Table, sep: str = "\n") -> pa.Table:
    """One BATCH of ``text_view`` — module-level so batch-local
    consumers (the interleaved ingest heuristic gate) can flatten a
    block's text in place and filter the SAME block positionally,
    instead of a doc_id anti-join round trip."""
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


def text_view(ds, sep: str = "\n"):
    """Flatten interleaved documents to the flat ``(doc_id, text)``
    shape — text-bearing spans joined in order by ``sep``, media spans
    contributing nothing — so EVERY flat-text operator in the engine
    (MinHash/SimHash dedup, Gopher rules, perplexity, DSIR, BPE, …)
    runs over crawled multimodal documents unchanged. Batch-local and
    fully vectorized: one flatten, one mask, one ``binary_join`` per
    batch (``text_view_batch``); no shuffle, no per-row Python."""

    def view(b: pa.Table) -> pa.Table:
        return text_view_batch(b, sep)

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


def attach_media_features(ds, features, n_buckets: int = 32,
                          max_broadcast_rows: int = 1_000_000):
    """Close the ``media_refs`` round trip: join a decoded-feature
    table (``media_ref`` + any feature columns — e.g.
    ``multimodal.media_features`` output keyed by ref) back onto the
    interleaved documents' media spans → one row per media span,
    ``(doc_id, offset, media_ref, <features...>)``, the span's
    interleaving position preserved so callers can rebuild or filter
    spans by media quality.

    Delivery is size-gated like every small-side join: a feature table
    ≤ ``max_broadcast_rows`` ships once via ``broadcast_join`` (no
    shuffle — the common per-round decode output); a bigger one rides
    a ``bucket_hash_join`` on the ref HASH with an exact string-equality
    verify inside each bucket task (hash collisions cannot fabricate a
    join). Spans whose ref has no feature row are DROPPED from the
    result (inner join — undecoded media is the caller's worklist,
    ``media_refs`` minus this output)."""
    import pandas as pd

    from ..functions.blocks import collect_pandas, df_arrow
    from ..functions.hashing import hash64_array
    from ..functions.joins import broadcast_join, bucket_hash_join

    features = features.materialize()     # counted + joined
    feat_cols = [c for c in features.schema().names if c != "media_ref"]
    if not feat_cols:
        raise ValueError("attach_media_features: the feature table "
                         "needs at least one column besides media_ref")
    work = media_refs(ds)
    if features.count() <= max_broadcast_rows:
        small = collect_pandas(features,
                               {"media_ref": str,
                                **{c: object for c in feat_cols}})
        return broadcast_join(work, small, on="media_ref")

    def add_uid(name: str):
        def fn(b: pa.Table) -> pa.Table:
            return b.append_column(name, pa.array(
                hash64_array(b["media_ref"]).astype(np.int64), pa.int64()))
        return fn

    def verify(j: pd.DataFrame) -> pa.Table:
        # exact string equality: an equal-hash different-ref pair must
        # not fabricate a feature attachment (~2⁻⁶⁴, but free to check)
        ok = j[j["media_ref"].to_numpy() == j["_ref_r"].to_numpy()]
        return df_arrow(ok[["doc_id", "offset", "media_ref"] + feat_cols])

    right = features.map_batches(
        lambda b: b.rename_columns(
            ["_ref_r" if c == "media_ref" else c
             for c in b.schema.names]), batch_format="pyarrow") \
        .map_batches(lambda b: b.append_column("_ruid", pa.array(
            hash64_array(b["_ref_r"]).astype(np.int64), pa.int64())),
            batch_format="pyarrow")
    return bucket_hash_join(
        work.map_batches(add_uid("_ruid"), batch_format="pyarrow"),
        right, on="_ruid", n_buckets=n_buckets,
        columns_left=["_ruid", "doc_id", "media_ref", "offset"],
        columns_right=["_ruid", "_ref_r"] + feat_cols,
        post=verify)


def _neardup_pairs_uids(ds, text_threshold: float, media_threshold: float,
                        n_buckets: int, hot_ref_cap: int,
                        broadcast_max_candidates: int):
    """Uid-space engine of ``interleaved_neardup_pairs`` (semantics
    documented there): → ``(fused, id_map)`` where ``fused`` is the
    evidence-tagged ``(doc_a, doc_b int64, text_jaccard,
    media_jaccard, evidence)`` Dataset — or ``None`` when neither leg
    produced a pair — and ``id_map`` streams ``(doc_uid, doc_id)``.
    Kept uid-level so ``interleaved_neardup_groups`` runs components
    directly, without paying the public operator's string restore and
    then re-hashing the strings straight back (review finding).

    Mixed-modal near-duplicate pairs over INTERLEAVED documents —
    the curation shape flat-text dedup misses: a re-posted ad keeps its
    photos but rewrites the description (media evidence), or keeps the
    text but re-uploads photos under new refs (text evidence).

    Two independent legs, each fully distributed, unioned per pair:

    - TEXT: ``text_view`` flattens the text spans, then the engine's
      MinHash machinery runs unchanged (``dedup.band_candidates`` band
      self-join → global pair distinct → exact-Jaccard verify with the
      broadcast-vs-shuffle strategy gate). Reports pairs with word
      3-gram Jaccard ≥ ``text_threshold``.
    - MEDIA: ``media_refs`` explodes the media worklist; ONE ref-hash
      bucket groupby both counts each doc's refs and self-joins each
      ref's docs into co-occurrence pairs; per-pair intersection sums +
      two bucket joins of the doc sizes give EXACT media-set Jaccard ≥
      ``media_threshold``. A ref shared by more than ``hot_ref_cap``
      docs (stock/placeholder imagery) is EXCLUDED from both the
      intersection and the set sizes — partial enumeration would
      corrupt exact Jaccard, and boilerplate media carries no
      duplication signal (the media analogue of AllPairs' hot-gram
      prefix exclusion, ``dedup.ngram_jaccard_pairs``).

    Output: ``(doc_a, doc_b, text_jaccard, media_jaccard, evidence)``
    with string doc ids (``doc_a < doc_b``), ``evidence`` ∈
    {"text", "media", "both"}; a leg that did not flag the pair leaves
    its score null (it is UNMEASURED there, not zero). Internally docs
    are keyed by the int64 view of ``hash64(doc_id)`` — a ~2⁻⁶⁴
    collision risk, same acceptance as ``dedup_interleaved``'s span
    fingerprint — and mapped back via two pair-bounded bucket joins.

    The input Dataset is traversed by both legs plus the id mapping;
    pass a re-executable (source-backed) Dataset, as with
    ``dedup_interleaved``.
    """
    import pandas as pd

    from ..functions.hashing import bucket_of, hash64_array
    from ..functions.joins import bucket_hash_join
    from .dedup import (MinHasher, _pair_bucket, _pair_ids,
                        _semi_filter_ids, _verify_strategy,
                        band_candidates, pair_distinct)

    _uid = _doc_uid

    # ---- id mapping (doc_uid -> doc_id), corpus-sized, streams -------
    def to_map(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].cast(pa.string())
        return pa.table({"doc_uid": pa.array(_uid(ids), pa.int64()),
                         "doc_id": ids})

    id_map = ds.map_batches(to_map, batch_format="pyarrow")

    # ---- TEXT leg -----------------------------------------------------
    tv = text_view(ds)

    def uid_text(b: pa.Table) -> pa.Table:
        return pa.table({"doc_id": pa.array(_uid(b["doc_id"]), pa.int64()),
                         "text": b["text"]})

    tvu = tv.map_batches(uid_text, batch_format="pyarrow")
    bands = tvu.map_batches(MinHasher, batch_format="pyarrow",
                            batch_size=1024, concurrency=(1, 4), num_cpus=1)
    cand = pair_distinct(band_candidates(bands, n_buckets),
                         "doc_a", "doc_b", n_buckets).materialize()
    cand_ids = _pair_ids(cand)
    text_pairs = _verify_strategy(
        cand, _semi_filter_ids(tvu, cand_ids), len(cand_ids),
        text_threshold, n_buckets, broadcast_max_candidates)

    # ---- MEDIA leg ----------------------------------------------------
    def ref_rows(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"doc_uid": pa.array([], pa.int64()),
                             "ref_hash": pa.array([], pa.int64()),
                             "_rb": pa.array([], pa.int32())})
        df = pd.DataFrame({
            "doc_uid": _uid(b["doc_id"]),
            "ref_hash": hash64_array(b["media_ref"]).astype(np.int64),
        }).drop_duplicates()            # same ref repeated inside a doc
        rb = bucket_of(df["ref_hash"].to_numpy().astype(np.uint64),
                       n_buckets)
        return pa.table({"doc_uid": pa.array(df["doc_uid"].to_numpy(),
                                             pa.int64()),
                         "ref_hash": pa.array(df["ref_hash"].to_numpy(),
                                              pa.int64()),
                         "_rb": pa.array(rb, pa.int32())})

    tagged = media_refs(ds).map_batches(ref_rows, batch_format="pyarrow") \
        .groupby("_rb").map_groups(_per_ref_group_fn(hot_ref_cap),
                                   batch_format="pandas") \
        .materialize()                 # pair+doc bounded; read twice below
    _record_capped_refs("interleaved_neardup", tagged)
    media_pairs = _media_pairs_from_tagged(tagged, media_threshold,
                                           n_buckets)

    # ---- union the legs per pair, map uids back to string ids --------
    def tag_text(b: pa.Table) -> pa.Table:
        return pa.table({"doc_a": b["doc_a"], "doc_b": b["doc_b"],
                         "text_jaccard": b["jaccard"],
                         "media_jaccard": pa.array(
                             [None] * b.num_rows, pa.float64())})

    def tag_media(b: pa.Table) -> pa.Table:
        return pa.table({"doc_a": b["doc_a"], "doc_b": b["doc_b"],
                         "text_jaccard": pa.array(
                             [None] * b.num_rows, pa.float64()),
                         "media_jaccard": b["media_jaccard"]})

    both = text_pairs.map_batches(tag_text, batch_format="pyarrow") \
        .union(media_pairs.map_batches(tag_media, batch_format="pyarrow")) \
        .materialize()                     # pair-bounded; counted + fused
    if both.count() == 0:
        # fuse/join over zero rows would strip the schema (same
        # map_groups-over-nothing hazard as the media leg)
        return None, id_map

    def fuse(g: pd.DataFrame) -> pd.DataFrame:
        f = g.groupby(["doc_a", "doc_b"], as_index=False) \
            .agg(text_jaccard=("text_jaccard", "max"),
                 media_jaccard=("media_jaccard", "max"))
        t = f["text_jaccard"].notna()
        m = f["media_jaccard"].notna()
        f["evidence"] = np.where(t & m, "both",
                                 np.where(t, "text", "media"))
        return f

    fused = both.map_batches(
        lambda b: b.assign(_pb=_pair_bucket(
            b["doc_a"].to_numpy(), b["doc_b"].to_numpy(), n_buckets)),
        batch_format="pandas") \
        .groupby("_pb").map_groups(fuse, batch_format="pandas")
    return fused, id_map


def interleaved_neardup_pairs(ds, text_threshold: float = 0.6,
                              media_threshold: float = 0.5,
                              n_buckets: int = 32, hot_ref_cap: int = 256,
                              broadcast_max_candidates: int = 50_000):
    """Mixed-modal near-duplicate pairs over INTERLEAVED documents with
    STRING doc ids — semantics, legs and scale shape documented on the
    uid-space engine ``_neardup_pairs_uids``; this wrapper restores the
    string ids via two candidate-bounded bucket joins against the
    semi-filtered id map and sorts the output."""
    import pandas as pd
    import ray.data as rd

    from ..functions.joins import bucket_hash_join
    from .dedup import _semi_filter_ids as _semi_uids

    fused, id_map = _neardup_pairs_uids(
        ds, text_threshold, media_threshold, n_buckets, hot_ref_cap,
        broadcast_max_candidates)
    if fused is None:
        return rd.from_arrow(pa.table({
            "doc_a": pa.array([], pa.string()),
            "doc_b": pa.array([], pa.string()),
            "text_jaccard": pa.array([], pa.float64()),
            "media_jaccard": pa.array([], pa.float64()),
            "evidence": pa.array([], pa.string())}))
    fused = fused.materialize()    # read twice: involved ids + join

    # the id-restore joins need only the PAIR-INVOLVED docs' map rows —
    # semi-filter the corpus-sized map down to them first (pair-bounded
    # id array on the driver, the _pair_ids acceptance), so the join
    # shuffles candidate-bounded rows instead of every doc's key
    def uids_of(b: pa.Table) -> pa.Table:
        u = np.concatenate([b["doc_a"].to_numpy(zero_copy_only=False),
                            b["doc_b"].to_numpy(zero_copy_only=False)])
        return pa.table({"doc_id": pa.array(np.unique(u), pa.int64())})

    involved = fused.map_batches(uids_of, batch_format="pyarrow") \
        .to_pandas()["doc_id"].to_numpy()
    cand_map = _semi_uids(
        id_map.map_batches(
            lambda b: pa.table({"doc_id": b["doc_uid"],
                                "doc_str": b["doc_id"]}),
            batch_format="pyarrow"),
        involved).materialize()        # consumed by both restore joins

    def map_side(key: str):
        def rn(b: pa.Table) -> pa.Table:
            return pa.table({key: b["doc_id"],
                             f"id_{key[-1]}": b["doc_str"]})
        return cand_map.map_batches(rn, batch_format="pyarrow")

    out = bucket_hash_join(fused, map_side("doc_a"), on="doc_a",
                           n_buckets=n_buckets,
                           columns_left=["doc_a", "doc_b", "text_jaccard",
                                         "media_jaccard", "evidence"],
                           columns_right=["doc_a", "id_a"])

    def mid_arrow(b: pd.DataFrame) -> pa.Table:
        return pa.table({
            "doc_b": pa.array(b["doc_b"].to_numpy(), pa.int64()),
            "text_jaccard": pa.array(b["text_jaccard"], pa.float64()),
            "media_jaccard": pa.array(b["media_jaccard"], pa.float64()),
            "evidence": pa.array(b["evidence"], pa.string()),
            "id_a": pa.array(b["id_a"], pa.string())})

    out = bucket_hash_join(out.map_batches(mid_arrow, batch_format="pandas"),
                           map_side("doc_b"), on="doc_b",
                           n_buckets=n_buckets,
                           columns_left=["doc_b", "text_jaccard",
                                         "media_jaccard", "evidence",
                                         "id_a"],
                           columns_right=["doc_b", "id_b"])

    def final(b: pd.DataFrame) -> pa.Table:
        a = b["id_a"].astype(str).to_numpy()
        c = b["id_b"].astype(str).to_numpy()
        lo, hi = np.minimum(a, c), np.maximum(a, c)   # string order out
        return pa.table({
            "doc_a": pa.array(lo, pa.string()),
            "doc_b": pa.array(hi, pa.string()),
            "text_jaccard": pa.array(b["text_jaccard"], pa.float64()),
            "media_jaccard": pa.array(b["media_jaccard"], pa.float64()),
            "evidence": pa.array(b["evidence"], pa.string())})

    return out.map_batches(final, batch_format="pandas") \
        .sort(["doc_a", "doc_b"])


def interleaved_neardup_groups(ds, text_threshold: float = 0.6,
                               media_threshold: float = 0.5,
                               n_buckets: int = 32, **pair_kwargs):
    """Connected components over ``interleaved_neardup_pairs`` →
    per-document ``(doc_id, group_id, group_size, is_representative)``
    with STRING ids — the multimodal analogue of ``dedup.neardup_groups``
    and the input ``corpus.leakage_safe_split`` needs so a re-posted ad
    and its original never straddle train/val.

    Grouping runs in the same int64 uid space as the pair operator
    (``hash64(doc_id)``; distributed min-label propagation, nothing
    pair-bounded on the driver), then two pair-bounded bucket joins
    restore strings: a group's id is the DOC_ID of its min-uid member —
    a real member, deterministic, resolvable. Docs in no pair are their
    own singleton groups (``label_table`` contract)."""
    import pandas as pd

    from ..functions.components import connected_components, label_table
    from ..functions.joins import bucket_hash_join

    _uid = _doc_uid

    def to_uid(b: pa.Table) -> pa.Table:
        return pa.table({"doc_uid": pa.array(_uid(b["doc_id"]), pa.int64())})

    def to_map(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].cast(pa.string())
        return pa.table({"doc_uid": pa.array(_uid(ids), pa.int64()),
                         "doc_id": ids})

    # components run DIRECTLY on the uid-space pair engine — the public
    # operator's string restore (two joins) would only be re-hashed
    # straight back here (review finding)
    fused, _ = _neardup_pairs_uids(
        ds, text_threshold, media_threshold, n_buckets,
        pair_kwargs.get("hot_ref_cap", 256),
        pair_kwargs.get("broadcast_max_candidates", 50_000))

    if fused is not None:
        comp = connected_components(fused, "doc_a", "doc_b",
                                    n_buckets=n_buckets)
        labeled = label_table(ds.map_batches(to_uid, batch_format="pyarrow"),
                              "doc_uid", comp, n_buckets=n_buckets)
    else:
        # no pairs → all singletons; label_table's member leg would be
        # a schema-less empty Dataset (map_groups over nothing)
        def singleton(b: pa.Table) -> pa.Table:
            u = pa.array(_uid(b["doc_id"]), pa.int64())
            n = b.num_rows
            return pa.table({
                "doc_uid": u, "group_id": u,
                "group_size": pa.array(np.ones(n, np.int64), pa.int64()),
                "is_representative": pa.array([True] * n, pa.bool_())})

        labeled = ds.map_batches(singleton, batch_format="pyarrow")

    id_map = ds.map_batches(to_map, batch_format="pyarrow")

    j = bucket_hash_join(
        labeled, id_map, on="doc_uid", n_buckets=n_buckets,
        columns_left=["doc_uid", "group_id", "group_size",
                      "is_representative"],
        columns_right=["doc_uid", "doc_id"])

    def mid(b: pd.DataFrame) -> pa.Table:
        return pa.table({
            "doc_id": pa.array(b["doc_id"], pa.string()),
            "group_id": pa.array(b["group_id"].to_numpy(), pa.int64()),
            "group_size": pa.array(b["group_size"].to_numpy(), pa.int64()),
            "is_representative": pa.array(
                b["is_representative"].to_numpy(), pa.bool_())})

    def rep_side(b: pa.Table) -> pa.Table:
        return pa.table({"group_id": b["doc_uid"],
                         "group_rep": b["doc_id"]})

    j = bucket_hash_join(
        j.map_batches(mid, batch_format="pandas"),
        id_map.map_batches(rep_side, batch_format="pyarrow"),
        on="group_id", n_buckets=n_buckets,
        columns_left=["doc_id", "group_id", "group_size",
                      "is_representative"],
        columns_right=["group_id", "group_rep"])

    def final(b: pd.DataFrame) -> pa.Table:
        return pa.table({
            "doc_id": pa.array(b["doc_id"], pa.string()),
            "group_id": pa.array(b["group_rep"], pa.string()),
            "group_size": pa.array(b["group_size"].to_numpy(), pa.int64()),
            "is_representative": pa.array(
                b["is_representative"].to_numpy(), pa.bool_())})

    return j.map_batches(final, batch_format="pandas").sort("doc_id")


def leakage_safe_split_interleaved(ds, val_pct: int = 10,
                                   text_threshold: float = 0.6,
                                   media_threshold: float = 0.5,
                                   n_buckets: int = 32, **pair_kwargs):
    """Train/val split of INTERLEAVED documents where mixed-modal
    near-duplicates never straddle the boundary — the multimodal
    analogue of ``corpus.leakage_safe_split``: a re-posted ad that kept
    its photos (or its text) must land on the same side as the
    original, or the val set leaks into train through either modality.

    Composition: ``interleaved_neardup_groups`` (text MinHash ∪ media
    Jaccard evidence) → the group id's 0..99 fingerprint picks the
    side. String group ids are fingerprinted as
    ``knuth_fingerprint32(hash64(group_id)) % 100`` — hash64 first
    because the corpus key here is the canonical-URL doc_id, not an
    integer (``corpus._split_fingerprint`` rationale otherwise
    unchanged; deterministic, partition-invariant, whole groups move
    together by construction).

    Output: ``(doc_id, group_id, group_size, split)`` sorted by
    doc_id."""
    from ..functions.hashing import hash64_array, knuth_fingerprint32

    groups = interleaved_neardup_groups(
        ds, text_threshold, media_threshold, n_buckets, **pair_kwargs)

    def assign(b: pa.Table) -> pa.Table:
        gids = hash64_array(b["group_id"])
        f = knuth_fingerprint32(gids) % np.uint64(100)
        split = np.where(f < 100 - val_pct, "train", "val")
        return pa.table({
            "doc_id": b["doc_id"],
            "group_id": b["group_id"],
            "group_size": b["group_size"],
            "split": pa.array(split.tolist(), pa.string())})

    return groups.map_batches(assign, batch_format="pyarrow") \
        .sort("doc_id")


def interleaved_keep_representatives(ds, text_threshold: float = 0.6,
                                     media_threshold: float = 0.5,
                                     n_buckets: int = 32,
                                     keep: str = "min_id", **pair_kwargs):
    """THE corpus-dedup action for interleaved documents: drop every
    non-representative member of each mixed-modal near-dup group
    (``interleaved_neardup_groups``); survivors keep their spans
    untouched. The multimodal sibling of
    ``dedup.dedup_keep_representatives``, including its survivor
    policies:

    - ``keep="min_id"`` (default): the group's REPRESENTATIVE member —
      the min-uid (``hash64(doc_id)``) node the components labeled,
      i.e. a deterministic but hash-arbitrary member, NOT the
      lexicographically smallest URL (``is_representative`` row, zero
      extra work);
    - ``keep="best_quality"``: the member whose TEXT VIEW scores
      highest on the ``text.QualityScore`` composite, ties → min
      doc_id — what production dedup of re-posted ads actually wants
      (keep the fullest description, not an arbitrary copy).

    Both policies run DIRECTLY on the uid-space pair engine
    (``_neardup_pairs_uids`` → components) instead of the public
    ``interleaved_neardup_groups`` — the groups operator pays a
    corpus-sized ``label_table``, two string-restore joins and a
    corpus sort that this operator would immediately re-hash straight
    back to uids (review finding). Here everything past the pair
    engine is PAIR-BOUNDED: components label only pair-involved
    nodes, the string id map is semi-filtered to them, member texts
    are selected by one broadcast uid probe over the streaming
    ``text_view`` (the involved set is pair-bounded, so broadcast is
    the right delivery), and the drop fold runs per label-hash
    bucket. Drop-id delivery is the size-gated ``_anti_drop_ids``
    tail; spans pass through byte-identical on both policies."""
    import pandas as pd
    import ray

    from ..functions.blocks import df_arrow
    from ..functions.components import connected_components
    from ..functions.hashing import append_bucket
    from ..functions.joins import bucket_hash_join
    from .dedup import _pair_ids, _semi_filter_ids

    if keep not in ("min_id", "best_quality"):
        raise ValueError(f"keep={keep!r}: pass 'min_id' or 'best_quality'")
    fused, id_map = _neardup_pairs_uids(
        ds, text_threshold, media_threshold, n_buckets,
        pair_kwargs.get("hot_ref_cap", 256),
        pair_kwargs.get("broadcast_max_candidates", 50_000))
    if fused is None:                 # clean corpus: nothing to drop
        return ds
    fused = fused.materialize()
    comp = connected_components(fused, "doc_a", "doc_b",
                                n_buckets=n_buckets)
    involved = _pair_ids(fused)       # pair-bounded distinct uids
    cand_map = _semi_filter_ids(
        id_map.map_batches(
            lambda b: pa.table({"doc_id": b["doc_uid"],
                                "doc_str": b["doc_id"]}),
            batch_format="pyarrow"), involved).materialize()

    if keep == "min_id":
        non_rep = comp.map_batches(
            lambda b: pa.table({"node": b.filter(
                pc.not_equal(b["node"], b["label"]))["node"]}),
            batch_format="pyarrow")
        dropped = bucket_hash_join(
            non_rep, cand_map.map_batches(
                lambda b: pa.table({"node": b["doc_id"],
                                    "doc_id": b["doc_str"]}),
                batch_format="pyarrow"),
            on="node", n_buckets=n_buckets,
            columns_left=["node"], columns_right=["node", "doc_id"]) \
            .map_batches(lambda b: df_arrow(b[["doc_id"]]),
                         batch_format="pandas")
        return _anti_drop_ids(ds, dropped, n_buckets=n_buckets)

    from .text import QualityScore

    probe_ref = ray.put(np.unique(involved))   # sorted by construction

    def member_texts(b: pa.Table) -> pa.Table:
        probe = ray.get(probe_ref)             # zero-copy plasma read
        uid = _doc_uid(b["doc_id"])
        idx = np.searchsorted(probe, uid)
        idx[idx == len(probe)] = 0
        keepm = probe[idx] == uid if len(probe) \
            else np.zeros(len(uid), bool)
        return b.filter(pa.array(keepm))

    def scored_uid(b: pd.DataFrame) -> pa.Table:
        return pa.table({
            "node": pa.array(_doc_uid(pa.array(
                b["doc_id"].astype(str))), pa.int64()),
            "doc_id": pa.array(b["doc_id"].astype(str), pa.string()),
            "quality": pa.array(b["quality"].to_numpy(np.float64),
                                pa.float64())})

    scored = text_view(ds) \
        .map_batches(member_texts, batch_format="pyarrow") \
        .map_batches(QualityScore, batch_format="pandas",
                     batch_size=2048, concurrency=(1, 4)) \
        .map_batches(scored_uid, batch_format="pandas")

    labeled = bucket_hash_join(
        scored, comp, on="node", n_buckets=n_buckets,
        columns_left=["node", "doc_id", "quality"],
        columns_right=["node", "label"])

    def drops(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["label", "quality", "doc_id"],
                          ascending=[True, False, True], kind="mergesort")
        lab = g["label"].to_numpy()
        first = np.r_[True, lab[1:] != lab[:-1]]   # the survivor row
        return g.loc[~first, ["doc_id"]]

    dropped = labeled.map_batches(
        lambda b: df_arrow(b[["node", "label", "doc_id", "quality"]]),
        batch_format="pandas") \
        .map_batches(append_bucket("label", n_buckets, "_gb"),
                     batch_format="pyarrow") \
        .groupby("_gb").map_groups(drops, batch_format="pandas")
    return _anti_drop_ids(ds, dropped, n_buckets=n_buckets)


def dedup_interleaved_incremental(corpus, new, n_buckets: int = 64,
                                  corpus_fingerprints=None):
    """Ingestion-gate dedup for INTERLEAVED documents: rows of ``new``
    whose WHOLE span sequence (kind, text, media_ref, order) is not
    already in ``corpus``, first-wins (min doc_id) within the
    increment — the "don't re-ingest a re-crawled ad" step a
    continuously-fed multimodal pipeline runs per crawl round. The
    interleaved sibling of ``dedup.dedup_incremental`` (which gates on
    flat text).

    Scale shape — PAYLOADS NEVER SHUFFLE: both sides reduce to the
    16-byte ``crawl.span_fingerprints`` key rows; one key-hash bucket
    groupby computes the dropped ids (corpus hits ∪ within-increment
    non-min duplicates); the dropped-id set delivers through the
    SIZE-GATED ``_anti_drop_ids`` tail (the ``dedup_interleaved``
    contract — broadcast below the cap, bucketed above). Equality is the
    64-bit sequence digest + span count folded into one key — a false
    drop is a ~2⁻⁶⁴ collision, same acceptance as
    ``dedup_interleaved``.

    ``corpus_fingerprints``: a precomputed ``crawl.span_fingerprints``
    Dataset for the corpus side — the FINGERPRINT SIDECAR recipe
    (SCALE.md): at 10^10 docs the per-round corpus-side cost is the
    100 TB payload scan that recomputes deterministic digests; persist
    the fingerprints once (`export_shards`, ~160 GB) and pass them
    here to skip it. Digests are pure functions of the payload, so a
    sidecar written by the same engine version never drifts; when
    given, ``corpus`` is ignored (pass None)."""
    import pandas as pd

    from ..functions.hashing import bucket_of
    from .crawl import span_fingerprints

    GOLD = np.uint64(0x9E3779B97F4A7C15)

    def keyed(side: int):
        def k(b: pa.Table) -> pa.Table:
            fp = b["span_fp"].to_numpy(zero_copy_only=False) \
                .astype(np.uint64)
            ns = b["n_spans"].to_numpy(zero_copy_only=False) \
                .astype(np.uint64)
            key = (fp * GOLD) ^ ns       # one key for the (fp, n) tuple
            if side == 0:                # corpus: distinct keys only
                key = np.unique(key)
                ids = pa.array([""] * len(key), pa.string())
            else:
                ids = b["doc_id"].cast(pa.string())
            return pa.table({
                "doc_id": ids,
                "key": pa.array(key, pa.uint64()),
                "_side": pa.array(np.full(len(key), side, np.int8),
                                  pa.int8()),
                "_kb": pa.array(bucket_of(key, n_buckets), pa.int32())})
        return k

    cf = corpus_fingerprints if corpus_fingerprints is not None \
        else span_fingerprints(corpus)
    ck = cf.map_batches(keyed(0), batch_format="pyarrow")
    nk = span_fingerprints(new).map_batches(keyed(1),
                                            batch_format="pyarrow")

    def drops(g: pd.DataFrame) -> pd.DataFrame:
        corp = g.loc[g["_side"] == 0, "key"].unique()
        ng = g[g["_side"] == 1].sort_values("doc_id", kind="mergesort")
        dup_id = ng.duplicated(["key", "doc_id"])
        if dup_id.any():
            # same doc_id twice with the same content: the id-based
            # anti-filter below cannot drop "one of two identical ids"
            # — it would silently delete BOTH copies (data loss, review
            # finding). Refuse loudly, like dedup_interleaved's guard;
            # doc_id is the canonical URL and unique by the crawl's
            # seen-filter contract.
            raise ValueError(
                f"dedup_interleaved_incremental: doc_id "
                f"{ng.loc[dup_id, 'doc_id'].iloc[0]!r} appears in "
                f"multiple increment rows — doc_id must uniquely "
                f"identify a document; collapse same-id rows upstream")
        in_corp = np.isin(ng["key"].to_numpy(), corp)
        dup_within = ng.duplicated("key").to_numpy()
        return ng.loc[in_corp | dup_within, ["doc_id"]]

    dropped = ck.union(nk).groupby("_kb") \
        .map_groups(drops, batch_format="pandas")
    # forward the caller's bucket count: above the broadcast cap the
    # bucketed anti-join's per-task share must honor the same memory
    # bound the caller sized everything else with (review finding)
    return _anti_drop_ids(new, dropped, n_buckets=n_buckets)


def _side_uid(col, side: int) -> np.ndarray:
    """int64 side-packed uid for the incremental interleaved gates:
    bit 0 carries the side (0 = corpus, 1 = new), bits 63..1 carry
    ``hash64(doc_id) >> 1``. One hash bit is spent on the side, so a
    uid collision is ~2⁻⁶³ — the same acceptance class as
    ``_doc_uid``. Bit-0 parity is what ``dedup._inc_band_join`` and
    the drop fold read the side from (numpy ``% 2`` is 1 for odd
    NEGATIVE int64 too)."""
    from ..functions.hashing import hash64_array

    u = hash64_array(col)
    return (((u >> np.uint64(1)) << np.uint64(1))
            | np.uint64(side)).view(np.int64)


def interleaved_neardup_incremental(corpus, new,
                                    text_threshold: float = 0.6,
                                    media_threshold: float = 0.5,
                                    n_buckets: int = 32,
                                    hot_ref_cap: int = 256,
                                    broadcast_max_candidates: int = 50_000):
    """Mixed-modal NEAR-dup ingestion gate for INTERLEAVED documents:
    rows of ``new`` that survive near-dup screening against ``corpus``
    AND within the increment, on EITHER modality — the fuzzy sibling of
    ``dedup_interleaved_incremental`` and the interleaved sibling of
    ``dedup.neardup_incremental``: a re-crawled ad that kept its photos
    but rewrote the text (or vice versa) must not re-ingest.

    Semantics (component-consistent with
    ``interleaved_neardup_groups``): build verified mixed-modal
    components over corpus∪increment with NEW×ALL pair enumeration
    only; a new doc DROPS iff its component contains any corpus doc or
    a smaller-``doc_id`` new doc (the increment keeps one
    representative per new-only component — min STRING id, matching
    ``dedup_interleaved``'s first-wins). Corpus×corpus pairs are never
    built: such an edge could only merge two components whose member
    verdicts are already "drop" (``neardup_incremental``'s argument).

    Scale shape, leg by leg — PAYLOADS NEVER SHUFFLE:

    - ids are the side-packed ``_side_uid`` (bit 0 = side), so the
      two id spaces cannot collide and every bucket task reads the
      side from parity — no side table ships anywhere;
    - TEXT: both sides flatten through ``text_view`` once; the band
      self-join is ``dedup._inc_band_join`` (NEW×ALL only, flood-star
      capped); exact-Jaccard verify reuses ``_verify_strategy``
      (broadcast vs shuffle by candidate count);
    - MEDIA: one ref-hash bucket groupby counts per-doc surviving refs
      AND enumerates NEW×ALL co-occurrence pairs (hot refs excluded
      from intersections and sizes — the ``_neardup_pairs_uids``
      exclusion); two pair-bounded bucket joins give exact media
      Jaccard;
    - components come from the DISTRIBUTED label propagation; the
      per-label drop fold joins the pair-involved id map (semi-filtered,
      pair-bounded) to pick min-string representatives; the final
      drop-id set (increment-bounded) delivers through the size-gated
      ``_anti_drop_ids`` tail.

    Returns all columns of ``new``, survivors only, sorted by
    ``doc_id``."""
    import pandas as pd

    from ..functions.blocks import df_arrow
    from ..functions.components import connected_components
    from ..functions.hashing import append_bucket, bucket_of, hash64_array
    from ..functions.joins import bucket_hash_join
    from .dedup import (MinHasher, _band_key_bucket, _inc_band_join,
                        _pair_ids, _semi_filter_ids, _verify_strategy,
                        pair_distinct)

    # ---- TEXT leg (NEW×ALL band join) ---------------------------------
    def uid_text(side: int):
        def fn(b: pa.Table) -> pa.Table:
            return pa.table({
                "doc_id": pa.array(_side_uid(b["doc_id"], side), pa.int64()),
                "text": b["text"]})
        return fn

    tvu = text_view(corpus).map_batches(uid_text(0), batch_format="pyarrow") \
        .union(text_view(new).map_batches(uid_text(1),
                                          batch_format="pyarrow")) \
        .materialize()
    bands = tvu.map_batches(MinHasher, batch_format="pyarrow",
                            batch_size=1024, concurrency=(1, 4), num_cpus=1)
    raw = bands.map_batches(_band_key_bucket(n_buckets),
                            batch_format="pyarrow") \
        .groupby("bucket").map_groups(_inc_band_join, batch_format="pandas")
    cand = pair_distinct(raw, "doc_a", "doc_b", n_buckets).materialize()
    cand_ids = _pair_ids(cand)
    text_pairs = _verify_strategy(
        cand, _semi_filter_ids(tvu, cand_ids), len(cand_ids),
        text_threshold, n_buckets, broadcast_max_candidates)

    # ---- MEDIA leg (NEW×ALL per-ref join) ------------------------------
    def ref_rows(side: int):
        def fn(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return pa.table({"doc_uid": pa.array([], pa.int64()),
                                 "ref_hash": pa.array([], pa.int64()),
                                 "_rb": pa.array([], pa.int32())})
            df = pd.DataFrame({
                "doc_uid": _side_uid(b["doc_id"], side),
                "ref_hash": hash64_array(b["media_ref"]).astype(np.int64),
            }).drop_duplicates()
            rb = bucket_of(df["ref_hash"].to_numpy().astype(np.uint64),
                           n_buckets)
            return pa.table({
                "doc_uid": pa.array(df["doc_uid"].to_numpy(), pa.int64()),
                "ref_hash": pa.array(df["ref_hash"].to_numpy(), pa.int64()),
                "_rb": pa.array(rb, pa.int32())})
        return fn

    tagged = media_refs(corpus).map_batches(ref_rows(0),
                                            batch_format="pyarrow") \
        .union(media_refs(new).map_batches(ref_rows(1),
                                           batch_format="pyarrow")) \
        .groupby("_rb").map_groups(
            _per_ref_group_fn(hot_ref_cap, new_only=True),
            batch_format="pandas") \
        .materialize()
    _record_capped_refs("interleaved_neardup_incremental", tagged)
    media_pairs = _media_pairs_from_tagged(tagged, media_threshold,
                                           n_buckets)

    # ---- union legs -> components -> per-label drop fold ---------------
    def score_free(b: pa.Table) -> pa.Table:
        return pa.table({"doc_a": b["doc_a"], "doc_b": b["doc_b"]})

    edges = text_pairs.map_batches(score_free, batch_format="pyarrow") \
        .union(media_pairs.map_batches(score_free,
                                       batch_format="pyarrow")) \
        .materialize()
    if edges.count() == 0:
        return new.sort("doc_id")

    comp = connected_components(edges, "doc_a", "doc_b",
                                n_buckets=n_buckets)

    # pair-involved id map (semi-filtered: pair-bounded rows only) so
    # the drop fold can pick min-STRING representatives and emit the
    # drop ids as strings directly
    involved = _pair_ids(edges)

    def to_map(side: int):
        def fn(b: pa.Table) -> pa.Table:
            ids = b["doc_id"].cast(pa.string())
            return pa.table({
                "doc_id": pa.array(_side_uid(ids, side), pa.int64()),
                "doc_str": ids})
        return fn

    cand_map = _semi_filter_ids(
        corpus.map_batches(to_map(0), batch_format="pyarrow").union(
            new.map_batches(to_map(1), batch_format="pyarrow")), involved)

    labeled = bucket_hash_join(
        comp, cand_map.map_batches(
            lambda b: pa.table({"node": b["doc_id"],
                                "doc_str": b["doc_str"]}),
            batch_format="pyarrow"),
        on="node", n_buckets=n_buckets,
        columns_left=["node", "label"], columns_right=["node", "doc_str"])

    def drops(g: pd.DataFrame) -> pd.DataFrame:
        node = g["node"].to_numpy()
        g = g.assign(is_new=(node % 2) == 1)
        has_corpus = g.groupby("label")["is_new"].transform("min") \
            .to_numpy() == False  # noqa: E712 (numpy bool compare)
        newg = g[g["is_new"]]
        rep = newg.groupby("label")["doc_str"].transform("min")
        drop = newg.loc[has_corpus[g["is_new"].to_numpy()]
                        | (newg["doc_str"] != rep).to_numpy(), "doc_str"]
        return pd.DataFrame({"doc_id": drop})

    dropped = labeled.map_batches(
        lambda b: df_arrow(b[["node", "label", "doc_str"]]),
        batch_format="pandas") \
        .map_batches(append_bucket("label", n_buckets, "_lb"),
                     batch_format="pyarrow") \
        .groupby("_lb").map_groups(drops, batch_format="pandas")
    return _anti_drop_ids(new, dropped,
                          n_buckets=n_buckets).sort("doc_id")
