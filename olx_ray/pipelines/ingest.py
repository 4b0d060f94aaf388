"""The continuous-ingestion round — the capstone composition every
continuously-fed training corpus runs per increment, assembled from
this engine's gates (each individually oracle-/invariant-tested):

0. HEURISTIC gate (optional) — ``text.GopherRules``: per-row rule
   filter (``heuristic_rules`` bitmask selects which rules enforce);
   shuffle-free and the cheapest test, so it runs FIRST;
1. EXACT gate   — ``dedup_incremental``: drop increment rows whose
   text the corpus already holds (corpus ships hashes only);
2. NEAR gate    — ``neardup_incremental``: drop rows transitively
   near-dup with the corpus or with a kept increment row (LSH
   candidates + exact verify + distributed components);
3. QUALITY gate — ``scoring.score_quality_model``: the trained
   hashed-ngram classifier, broadcast once, actor-pool scored; rows
   below ``quality_min`` drop (a bucket join attaches scores — the
   increment is never collected);
4. SINK         — ``export_shards``: survivors land as a hash-sharded
   parquet increment under ``out_dir/round=N`` with atomic manifests
   (resumable; a crashed round re-runs without duplicating shards).

Everything streams; driver state is bounded by the gates' drop-id
lists (increment-bounded) and the weight vector. Order matters:
heuristic → exact → near → quality, cheapest first — the expensive
near-dup machinery sees only rule-passing novel text and the model
scores only near-unique survivors.

``ingest_increment_interleaved`` is the same round for the crawl's
NATIVE payload ``(doc_id, spans)``: heuristic/quality gates run over
``spans.text_view`` (media spans ride along untouched), the dedup
gates are the interleaved siblings (whole-span-sequence exact gate;
mixed-modal NEW×ALL near gate), and the export keys on the string
doc_id (canonical URL).

Lifecycle: rounds accumulate as ``round=N`` directories; read the
whole corpus with ``export.read_layout(out_dir)`` (correct at every
lifecycle state), and periodically retire accumulated rounds with
``export.fold_rounds(out_dir)`` (the first fold promotes the lowest
round to the base layout, later folds hardlink into it) followed by
``export.compact_shards``. A folded round_no is permanently refused
here — its resume machinery is gone, so re-running it would duplicate
rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.blocks import df_arrow
from ..functions.joins import bucket_hash_join


def ingest_increment(corpus, new, out_dir: str, *, round_no: int,
                     weights: np.ndarray | None = None,
                     quality_min: float = 0.5, threshold: float = 0.6,
                     n_shards: int = 16, n_buckets: int = 32,
                     heuristic_rules: int | None = None,
                     index_dir: str | None = None,
                     embed_dim: int = 64) -> dict:
    """Run one ingestion round of ``new`` against ``corpus`` → write
    surviving ``(doc_id, text)`` rows to ``out_dir/round=<round_no>``;
    returns the export manifest summary plus per-gate survivor counts.
    ``weights``: a ``scoring.train_quality_model`` vector; ``None``
    skips the quality gate (no model yet). ``heuristic_rules``: a
    ``GopherRules.fail_mask`` bitmask — rows failing ANY selected rule
    drop before the dedup gates (``None`` skips; ``-1`` enforces the
    full rule set).

    ``index_dir``: an existing ``build_ivf_layout`` directory — when
    given, the round ALSO makes its survivors searchable: they embed
    (``similarity.embed_dataset``, dim=``embed_dim`` — must match the
    index's vectors) and append to the index under the same round id
    (``ivf_append_dataset``: frozen-centroid cells, own crash-safe
    manifests), so gate output and serving index advance together —
    the closed ingest→index loop. The result gains an ``"index"``
    manifest summary."""
    import ray.data as rd

    from ..functions.blocks import ensure_arrow_schema
    from .dedup import dedup_incremental, neardup_incremental
    from .export import export_shards, refuse_folded_round

    refuse_folded_round(out_dir, round_no, "ingest_increment")
    if new.schema() is None:
        raise ValueError(
            "ingest_increment: the increment dataset carries no schema "
            "— pass a TYPED (possibly empty) Dataset so a zero-survivor "
            "round can still export a schema-stable empty increment")
    # pin the increment's Arrow schema up front: a gate that drops
    # EVERY row leaves a schema-less Dataset, and the round must still
    # export an empty (but typed) increment instead of crashing
    new = ensure_arrow_schema(new)
    sch = new.schema()
    empty_tbl = pa.Table.from_arrays(
        [pa.array([], t) for t in sch.types], names=list(sch.names))

    counts = {"n_new": new.count()}
    alive = counts["n_new"] > 0
    if heuristic_rules is not None:
        if alive:
            from .text import GopherRules

            class _Gate:
                def __init__(self, rules_mask: int):
                    self.rules = GopherRules()
                    self.mask = rules_mask

                def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
                    fail = self.rules(b)["fail_mask"].to_numpy()
                    return b.loc[(fail & self.mask) == 0]

            new = new.map_batches(
                _Gate, batch_format="pandas", concurrency=(1, 4),
                fn_constructor_kwargs={"rules_mask": heuristic_rules}) \
                .materialize()
        counts["after_heuristic"] = new.count() if alive else 0
        alive = counts["after_heuristic"] > 0
    if alive:
        survivors = dedup_incremental(corpus, new,
                                      n_buckets=n_buckets).materialize()
    counts["after_exact"] = survivors.count() if alive else 0
    alive = counts["after_exact"] > 0
    if alive:
        survivors = neardup_incremental(corpus, survivors,
                                        threshold=threshold,
                                        n_buckets=n_buckets).materialize()
    counts["after_near"] = survivors.count() if alive else 0
    alive = counts["after_near"] > 0

    if weights is not None:
        if alive:
            from .scoring import score_quality_model

            scored = score_quality_model(survivors, weights)
            keep = scored.map_batches(
                lambda b: b.filter(pa.compute.greater_equal(
                    b["model_score"],
                    pa.scalar(quality_min))).select(["doc_id"]),
                batch_format="pyarrow")
            # keep EVERY survivor column (not just doc_id/text): rounds
            # exported before a model exists (weights=None bootstrap)
            # must share one schema with later rounds
            survivors = ensure_arrow_schema(survivors)
            cols = list(survivors.schema().names)
            survivors = bucket_hash_join(
                survivors, keep, on="doc_id", n_buckets=n_buckets,
                columns_left=cols, columns_right=["doc_id"],
                post=lambda j: df_arrow(j[cols]))
            survivors = survivors.materialize()
        counts["after_quality"] = survivors.count() if alive else 0
        alive = counts["after_quality"] > 0
    if not alive:
        survivors = rd.from_arrow(empty_tbl)

    manifest = export_shards(survivors,
                             f"{out_dir}/round={round_no}",
                             key="doc_id", n_shards=n_shards)
    counts["exported"] = int(sum(manifest["rows"].values()))
    out = {"counts": counts, "manifest": manifest}
    if index_dir is not None:
        from .similarity import embed_dataset, ivf_append_dataset

        # read the round BACK from its committed shards rather than
        # re-running the gate plan: the export above already paid the
        # gates, and a crash between export and append re-runs only
        # this step (survivors' lineage would re-execute every gate)
        from .export import read_shards

        committed = read_shards(f"{out_dir}/round={round_no}",
                                columns=["doc_id", "text"])
        out["index"] = ivf_append_dataset(
            embed_dataset(committed, dim=embed_dim), index_dir,
            round_id=round_no)
        counts["indexed"] = int(sum(out["index"]["rows"].values()))
    return out


def ingest_increment_interleaved(corpus, new, out_dir: str, *,
                                 round_no: int,
                                 weights: np.ndarray | None = None,
                                 quality_min: float = 0.5,
                                 text_threshold: float = 0.6,
                                 media_threshold: float = 0.5,
                                 n_shards: int = 16, n_buckets: int = 32,
                                 heuristic_rules: int | None = None,
                                 corpus_fingerprints=None) -> dict:
    """The INTERLEAVED ingestion round — ``ingest_increment`` for the
    crawl's native multimodal payload ``(doc_id, spans)``: run ``new``
    against ``corpus`` through the interleaved gate chain and write the
    surviving documents (spans untouched) to ``out_dir/round=<n>``.

    Gates, cheapest first (each individually tested; the text-only
    gates run over ``spans.text_view`` — the media spans ride along
    untouched and re-join nothing):

    0. HEURISTIC (optional) — ``text.GopherRules`` over the text view;
       failing doc_ids drop via the size-gated anti tail;
    1. EXACT — ``dedup_interleaved_incremental``: whole-span-sequence
       (kind, text, media_ref, order) identity vs corpus + first-wins
       within the increment; only 16-byte fingerprints shuffle;
    2. NEAR — ``interleaved_neardup_incremental``: mixed-modal
       (MinHash text ∪ exact media Jaccard) screening with NEW×ALL
       pair enumeration; a re-crawled ad that kept its photos OR its
       text drops here;
    3. QUALITY (optional ``weights``) — ``scoring.score_quality_model``
       over the text view; rows below ``quality_min`` drop;
    4. SINK — ``export_shards`` keyed on the string doc_id (canonical
       URL), hash-sharded, atomic manifests, resumable.

    Returns the manifest summary plus per-gate survivor counts, the
    flat gate's contract. Driver state stays bounded: drop-id delivery
    is the gated tail everywhere, and only counts ride back.

    ``corpus_fingerprints``: a persisted ``crawl.span_fingerprints``
    sidecar for the EXACT gate (the SCALE.md recipe — turns that
    gate's per-round corpus payload scan into a narrow key read; the
    near gate still reads the corpus payloads for its own legs)."""
    import ray.data as rd

    from ..functions.blocks import ensure_arrow_schema
    from ..functions.joins import gated_anti
    from .export import export_shards, refuse_folded_round
    from .spans import (dedup_interleaved_incremental,
                        interleaved_neardup_incremental, text_view)

    refuse_folded_round(out_dir, round_no, "ingest_increment_interleaved")
    if new.schema() is None:
        raise ValueError(
            "ingest_increment_interleaved: the increment dataset carries "
            "no schema — pass a TYPED (possibly empty) Dataset so a "
            "zero-survivor round still exports a schema-stable empty "
            "increment")
    new = ensure_arrow_schema(new)
    sch = new.schema()
    empty_tbl = pa.Table.from_arrays(
        [pa.array([], t) for t in sch.types], names=list(sch.names))

    counts = {"n_new": new.count()}
    alive = counts["n_new"] > 0
    survivors = new
    if heuristic_rules is not None:
        if alive:
            from .spans import text_view_batch
            from .text import GopherRules

            class _GateInterleaved:
                """Per-ROW filter, like the flat gate's ``_Gate``:
                the text view flattens batch-locally and the SAME
                block filters positionally — no doc_id anti-join, so
                a duplicate increment id with one passing copy keeps
                that copy (identical semantics to the flat gate; an
                id-based drop would silently delete both, review
                finding) and the loud duplicate-id refusal stays the
                exact gate's job."""

                def __init__(self, rules_mask: int):
                    self.rules = GopherRules()   # regexes compile once
                    self.mask = rules_mask       # per actor, not per batch

                def __call__(self, b: pa.Table) -> pa.Table:
                    tv = text_view_batch(b).to_pandas()
                    fail = self.rules(tv)["fail_mask"].to_numpy()
                    return b.filter(pa.array((fail & self.mask) == 0))

            survivors = survivors.map_batches(
                _GateInterleaved, batch_format="pyarrow",
                concurrency=(1, 4),
                fn_constructor_kwargs={"rules_mask": heuristic_rules}) \
                .materialize()
        counts["after_heuristic"] = survivors.count() if alive else 0
        alive = counts["after_heuristic"] > 0
    if alive:
        survivors = dedup_interleaved_incremental(
            corpus, survivors, n_buckets=n_buckets,
            corpus_fingerprints=corpus_fingerprints).materialize()
    counts["after_exact"] = survivors.count() if alive else 0
    alive = counts["after_exact"] > 0
    if alive:
        survivors = interleaved_neardup_incremental(
            corpus, survivors, text_threshold=text_threshold,
            media_threshold=media_threshold,
            n_buckets=n_buckets).materialize()
    counts["after_near"] = survivors.count() if alive else 0
    alive = counts["after_near"] > 0

    if weights is not None:
        if alive:
            from .scoring import score_quality_model

            scored = score_quality_model(text_view(survivors), weights)
            dropped = scored.map_batches(
                lambda b: b.filter(pa.compute.less(
                    b["model_score"],
                    pa.scalar(quality_min))).select(["doc_id"]),
                batch_format="pyarrow")
            survivors = gated_anti(survivors, dropped, "doc_id",
                                   n_buckets=n_buckets).materialize()
        counts["after_quality"] = survivors.count() if alive else 0
        alive = counts["after_quality"] > 0
    if not alive:
        survivors = rd.from_arrow(empty_tbl)

    manifest = export_shards(survivors, f"{out_dir}/round={round_no}",
                             key="doc_id", n_shards=n_shards)
    counts["exported"] = int(sum(manifest["rows"].values()))
    return {"counts": counts, "manifest": manifest}
