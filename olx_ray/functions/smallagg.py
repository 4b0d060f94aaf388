"""Bounded-key combiner aggregation, defined once.

CLAUDE.md bans bare ``Dataset.aggregate`` (Ray 2.49's sort-based
Aggregate costs seconds even on tiny inputs with string/timestamp
keys); the sanctioned shape for BOUNDED key cardinality is: vectorized
pandas partials per batch (the data-sized work) → coalesce the small
partials to one block → one pandas finish. relational / events /
metrics all use these helpers — previously three drifting copies.

Validity bound: the finish sees one row per (batch, distinct key); it
holds while DISTINCT KEYS fit one worker (~10M). Beyond that, use the
bucketed finish (`relational._partial_bucket_agg` / the q18 pattern).
"""

from __future__ import annotations

import pandas as pd


def round2_fn(cols, nd: int = 2):
    """Per-batch rounder for float aggregate columns (cross-engine
    summation-order noise; oracle parity rounds BOTH sides)."""
    def fn(b: pd.DataFrame) -> pd.DataFrame:
        for c in cols:
            b[c] = b[c].round(nd)
        return b
    return fn


def round_cols(ds, cols, nd: int = 2):
    return ds.map_batches(round2_fn(cols, nd), batch_format="pandas")


def finish_small(ds, keys, agg_spec, object_cols=()):
    """Coalesce (small) per-batch partials to one block and aggregate in
    pandas — the finish half only; the caller's map_batches partial
    stage already did the scalable work.

    ``object_cols``: integer partial columns whose GLOBAL total could
    overflow int64 at extreme scale (10⁻⁴-unit money sums near the
    100 TB regime) are promoted to Python ints before the final sum —
    a silent int64 wrap would emit garbage with no error."""
    def agg(b: pd.DataFrame) -> pd.DataFrame:
        for c in object_cols:
            b[c] = b[c].astype(object)
        return b.groupby(keys, as_index=False).agg(**agg_spec)

    return ds.repartition(1).map_batches(agg, batch_format="pandas")


def partial_small_agg(ds, keys, partial_spec, finish_spec,
                      batch_size=65536, object_cols=()):
    """Both halves: vectorized pandas partial per batch, then the
    `finish_small` coalesce."""
    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby(keys, as_index=False).agg(**partial_spec)

    return finish_small(
        ds.map_batches(partial, batch_format="pandas",
                       batch_size=batch_size),
        keys, finish_spec, object_cols=object_cols)
