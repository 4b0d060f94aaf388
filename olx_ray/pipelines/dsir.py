"""DSIR — Data Selection via Importance Resampling.

Public algorithm (Xie et al. 2023, "Data Selection for Language Models
via Importance Resampling", arXiv:2302.03169): pick raw-corpus
documents that look like a small TARGET corpus. Fit two bag-of-
hashed-ngrams feature distributions — target ``p`` and raw ``q`` —
score every raw document with its importance log-weight
``Σ_f c_f · (log p_f − log q_f)``, and resample ``k`` documents by
Gumbel-top-k over the log-weights (deterministic here: the Gumbel
noise derives from ``mix64(doc_id ^ seed)``), or plain top-k with
``gumbel=False``.

Everything is combiner-first and bounded:

- the raw-corpus feature distribution reduces through the bounded
  summary tree as sparse ``(feature, count)`` frames — ≤ ``dim`` rows
  per summary (dim=65536 ≈ 1.5 MB), never a word shuffle;
- the target is by definition SMALL (a benchmark/domain sample), so
  its distribution is computed driver-side from a text list;
- scoring is one vectorized gather + segmented sum per batch
  (features come from ``scoring._hashed_features`` — the same hashed
  word uni+bigram space the quality classifier uses);
- selection reuses the bottom-k summary machinery (`sampling.py`) —
  O(k) rows per summary, partition-invariant, deterministic.

Driver state: two ``dim``-length vectors and the k selected rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd

from ..functions.hashing import mix64
from ..functions.summaries import summary_tree
from .sampling import _bottomk, _drop_pri
from .scoring import _hashed_features


def _as_ds(ds_or_sf, columns):
    if isinstance(ds_or_sf, str):
        return rd.read_parquet(f"{ds_or_sf}/documents.parquet",
                               columns=columns)
    return ds_or_sf


def hashed_ngram_counts(ds_or_sf, dim: int = 1 << 16,
                        fan_in: int = 32) -> np.ndarray:
    """Corpus-wide hashed word uni+bigram feature counts as ONE
    ``dim``-length int64 vector (the DSIR "raw" distribution). Sparse
    ``(f, n)`` summaries through the tree; the dense vector exists only
    on the driver."""
    def partial(b: pd.DataFrame) -> pd.DataFrame:
        feat, _ = _hashed_features(b["text"].tolist(), dim)
        c = np.bincount(feat, minlength=dim).astype(np.int64)
        nz = np.nonzero(c)[0]
        return pd.DataFrame({"f": nz.astype(np.int64), "n": c[nz]})

    def merge(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("f", as_index=False)["n"].sum()

    out = summary_tree(_as_ds(ds_or_sf, ["text"]), partial, merge,
                       fan_in=fan_in).to_pandas()
    vec = np.zeros(dim, np.int64)
    if len(out):
        vec[out["f"].to_numpy()] = out["n"].to_numpy()
    return vec


def target_ngram_counts(texts, dim: int = 1 << 16) -> np.ndarray:
    """Driver-side feature counts of a SMALL target sample (list of
    texts) — DSIR's target is a bounded domain/benchmark sample, so no
    distributed pass is warranted."""
    feat, _ = _hashed_features(list(texts), dim)
    return np.bincount(feat, minlength=dim).astype(np.int64)


def dsir_logratio(p_counts: np.ndarray, q_counts: np.ndarray) -> np.ndarray:
    """Add-one-smoothed per-feature importance log-ratio
    ``log p − log q``."""
    if len(p_counts) != len(q_counts):
        raise ValueError(f"dim mismatch: {len(p_counts)} vs "
                         f"{len(q_counts)}")
    p = p_counts + 1.0
    q = q_counts + 1.0
    return (np.log(p) - np.log(p.sum())) - (np.log(q) - np.log(q.sum()))


def _segment_sums(vals: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Per-doc sums of ``vals[offsets[i]:offsets[i+1]]``; empty
    segments → 0. reduceat runs over the NONEMPTY segment starts only
    and the results scatter back (the ``scoring._pool`` pattern) —
    clamping a trailing empty segment's start index instead would
    split the final nonempty doc's sum and silently truncate it."""
    n = len(offsets) - 1
    out = np.zeros(n)
    nonempty = np.nonzero(np.diff(offsets) > 0)[0]
    if len(nonempty) == 0:
        return out
    out[nonempty] = np.add.reduceat(vals, offsets[:-1][nonempty])
    return out


def dsir_scores(ds_or_sf, logratio: np.ndarray, *, batch_size: int = 1024,
                concurrency=(1, 4)):
    """Importance log-weight per document → Dataset
    ``(doc_id, log_weight, n_feats)`` (unsorted — feeds the selection
    stage; sort if consumed directly). The log-ratio vector broadcasts
    once via ``ray.put`` and is fetched once per actor."""
    ref = ray.put(np.asarray(logratio, np.float64))

    class Score:
        def __init__(self):
            self.lr = ray.get(ref)
            self.dim = len(self.lr)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            feat, offsets = _hashed_features(b["text"].tolist(), self.dim)
            return pd.DataFrame({
                "doc_id": b["doc_id"].to_numpy(),
                "log_weight": _segment_sums(self.lr[feat], offsets),
                "n_feats": np.diff(offsets).astype(np.int64),
            })

    return _as_ds(ds_or_sf, ["doc_id", "text"]) \
        .map_batches(Score, batch_format="pandas", batch_size=batch_size,
                     concurrency=concurrency)


def dsir_select(ds_or_sf, target_texts, k: int = 100, *,
                dim: int = 1 << 16, seed: int = 0, gumbel: bool = True,
                fan_in: int = 32):
    """The composed DSIR pipeline: fit raw ``q`` (distributed) and
    target ``p`` (driver-side), score every raw doc, select ``k``.

    ``gumbel=True`` (paper default): importance RESAMPLING — priority
    ``log_weight + Gumbel(doc_id, seed)``, i.e. sampling without
    replacement ∝ exp(log_weight). ``gumbel=False``: deterministic
    top-k by log_weight (the paper's heuristic variant). Returns the
    selected ``(doc_id, log_weight, n_feats)`` rows sorted by doc_id."""
    ds = _as_ds(ds_or_sf, ["doc_id", "text"])
    q = hashed_ngram_counts(ds, dim, fan_in=fan_in)
    p = target_ngram_counts(target_texts, dim)
    scored = dsir_scores(ds, dsir_logratio(p, q))

    def priority(b: pd.DataFrame) -> pd.DataFrame:
        lw = b["log_weight"].to_numpy(np.float64)
        if gumbel:
            ids = b["doc_id"].to_numpy()
            u = (mix64(ids.astype(np.int64, copy=False), seed)
                 .astype(np.float64) + 1.0) / (2.0 ** 64 + 2)
            lw = lw - np.log(-np.log(u))     # + standard Gumbel noise
        # bottom-k keeps the SMALLEST priorities → negate for top-k
        return b.assign(_pri=-lw)

    return _bottomk(scored, "doc_id", k, seed, fan_in,
                    with_priority=priority) \
        .map_batches(_drop_pri, batch_format="pandas") \
        .sort("doc_id")
