"""Bounded-summary-tree: the one shuffle shape behind every sketch.

Several operators reduce a corpus to a FIXED-SIZE summary (bottom-k
sample, Misra-Gries heavy hitters, KMV distinct sketch, quantile cut
samples). They all move data the same way: per-batch partials shrink
each batch to a bounded summary, summaries merge through ``fan_in``
groups, and one root task finishes — so O(levels · fan_in · capacity)
rows ever cross the wire, independent of input size, and the driver
holds at most one summary. This module is that tree, extracted once;
callers supply only the three kernels (and the kernels carry the
math — the tree carries the plumbing).

Used by `pipelines.sampling._bottomk` (priority bottom-k),
`pipelines.text.word_freq_topk_approx` (Misra-Gries),
`pipelines.relational.union_distinct_keys_approx` (KMV), and
`functions.joins._sample_cuts` (range-join chunk cuts).
"""

from __future__ import annotations

_UNSET = object()


def summary_tree(ds, partial, merge, finish=None, *, fan_in: int = 32,
                 batch_format: str = "pandas", batch_size=_UNSET,
                 finish_format: str | None = None):
    """``partial`` per input batch → ``merge`` per ``fan_in`` group →
    one root ``finish`` (defaults to ``merge``). Each kernel must map a
    batch to a BOUNDED summary batch; merge/finish must be closed over
    concatenated summaries (mergeability is the caller's contract —
    the tree only guarantees what reaches each node).

    ``batch_size`` is forwarded to the partial stage only when given
    (some callers rely on Ray's default batching there); merge stages
    always run ``batch_size=None`` so each tree node sees its whole
    fan-in group at once. ``finish_format`` lets the root emit a
    different block format than the summaries (e.g. Arrow summaries,
    one-row pandas result)."""
    kw = {} if batch_size is _UNSET else {"batch_size": batch_size}
    return (ds.map_batches(partial, batch_format=batch_format, **kw)
            .repartition(fan_in)
            .map_batches(merge, batch_format=batch_format, batch_size=None)
            .repartition(1)
            .map_batches(finish or merge,
                         batch_format=finish_format or batch_format,
                         batch_size=None))


def mg_reduce(g, capacity: int, count_col: str = "n", tie_cols=()):
    """Misra-Gries reduction of an exact/merged count frame to at most
    ``capacity`` rows: subtract the (capacity+1)-th largest count from
    every count, keep the positive ones. Summaries reduced this way
    are MERGEABLE (sum by key, re-reduce) with total undercount
    ≤ N/(capacity+1) — Agarwal et al., "Mergeable Summaries" (PODS'12).
    The single implementation behind ``text.word_freq_topk_approx`` and
    ``joins.detect_hot_keys`` (their error bounds depend on this exact
    reduction rule)."""
    if len(g) <= capacity:
        return g
    cols = [count_col, *tie_cols]
    g = g.sort_values(cols, ascending=[False] + [True] * len(tie_cols),
                      kind="mergesort").reset_index(drop=True)
    g[count_col] = g[count_col] - int(g[count_col].iloc[capacity])
    return g[g[count_col] > 0]
