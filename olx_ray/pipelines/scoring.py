"""Model-based document quality scoring — the fastText-style hashed
linear classifier used as a pre-training quality filter (the CCNet /
GPT-3 "quality classifier" pattern, public method: Joulin et al. 2016
"Bag of Tricks for Efficient Text Classification"; Wenzek et al. 2019
CCNet), built Ray-Data-first:

- features: hashed word unigrams + bigrams (feature hashing into a
  fixed ``dim``), average-pooled per document — one vectorized
  pandas/numpy pass per batch, shared bit-for-bit between training and
  scoring (``_hashed_features``);
- training runs ON THE DRIVER over a bounded labeled sample (a few
  thousand rows; numpy full-batch logistic regression, deterministic)
  — training data is sample-sized by design, the CORPUS never leaves
  the cluster;
- scoring is an actor-pool ``map_batches`` stage: the weight vector is
  ``ray.put`` once and each actor fetches it once in ``__init__``
  (zero-copy plasma read), then scores every batch with two
  ``bincount``-style gathers — the canonical broadcast-model-inference
  shape that a real trained .bin would use unchanged.

Complements the HEURISTIC ``text.quality_score`` (length/punct/
stopword ratios): heuristics need no labels, the model generalizes
from examples.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..functions.hashing import hash64_array, mix64


def _hashed_features(texts, dim: int):
    """→ ``(feat, offsets)``: feature ids (hashed word unigrams +
    bigrams, uint64 → ``% dim``) concatenated over docs, with
    ``offsets[i]:offsets[i+1]`` delimiting doc i's features. Empty /
    null docs get zero features. Vectorized: one explode + one shifted
    compare; the only per-item work is the C blake2b word hash."""
    s = pd.Series(texts, dtype="object").fillna("")
    words = s.str.split()
    ex = words.explode().dropna()
    doc = ex.index.to_numpy().astype(np.int64)
    wh = hash64_array(ex.tolist())
    uni = wh % np.uint64(dim)
    # bigrams: consecutive words of the SAME doc; combine the two word
    # hashes through one more mix round so (a,b) != (b,a)
    same = doc[1:] == doc[:-1] if len(doc) else np.zeros(0, bool)
    bh = mix64(wh[:-1][same] ^ (wh[1:][same] >> np.uint64(1)))
    big = bh % np.uint64(dim)
    bdoc = doc[:-1][same]
    feat = np.concatenate([uni, big]).astype(np.int64)
    fdoc = np.concatenate([doc, bdoc])
    order = np.argsort(fdoc, kind="mergesort")
    feat, fdoc = feat[order], fdoc[order]
    counts = np.bincount(fdoc, minlength=len(s)).astype(np.int64)
    offsets = np.concatenate([[0], np.cumsum(counts)])
    return feat, offsets


def _pool(feat, offsets, w: np.ndarray) -> np.ndarray:
    """Average-pooled linear response per doc: mean of ``w[feat]``
    within each doc span (0.0 for featureless docs)."""
    n = len(offsets) - 1
    if len(feat) == 0:
        return np.zeros(n)
    # reduceat over NON-EMPTY spans only: empty spans would repeat (or,
    # if trailing, clip) their neighbors' indices, silently truncating
    # the preceding doc's segment — strictly-increasing start indices
    # sidestep every reduceat edge case
    lens = np.diff(offsets)
    nonempty = lens > 0
    sums = np.zeros(n)
    sums[nonempty] = np.add.reduceat(w[feat], offsets[:-1][nonempty])
    return sums / np.maximum(lens, 1)


def train_quality_model(pos_texts, neg_texts, *, dim: int = 1 << 18,
                        epochs: int = 60, lr: float = 2.0) -> np.ndarray:
    """Full-batch logistic regression over hashed average-pooled
    features; returns ``(dim + 1,)`` weights (bias last). Deterministic
    (zero init, fixed order). Runs on the driver over a BOUNDED labeled
    sample — never over the corpus."""
    pos, neg = list(pos_texts), list(neg_texts)
    texts = pos + neg
    y = np.concatenate([np.ones(len(pos)), np.zeros(len(neg))])
    feat, offsets = _hashed_features(texts, dim)
    w = np.zeros(dim + 1)
    lens = np.maximum(np.diff(offsets), 1)
    for _ in range(epochs):
        z = _pool(feat, offsets, w[:dim]) + w[dim]
        p = 1.0 / (1.0 + np.exp(-np.clip(z, -35.0, 35.0)))
        g = p - y                        # dL/dz per doc
        # scatter each doc's gradient onto its features (1/len each)
        np.subtract.at(w, feat, lr * np.repeat(g / lens, np.diff(offsets)))
        w[dim] -= lr * g.mean()
    return w


class QualityModelScorer:
    """Actor-pool stage: weights fetched ONCE per actor (``__init__``),
    every batch scored with one vectorized gather."""

    def __init__(self, weights_ref, dim: int):
        self.w = ray.get(weights_ref)      # zero-copy plasma read
        self.dim = dim

    def __call__(self, b: pa.Table) -> pa.Table:
        texts = b["text"].to_pylist()
        feat, offsets = _hashed_features(texts, self.dim)
        z = _pool(feat, offsets, self.w[:self.dim]) + self.w[self.dim]
        score = 1.0 / (1.0 + np.exp(-np.clip(z, -35.0, 35.0)))
        return pa.table({
            "doc_id": b["doc_id"],
            "model_score": pa.array(np.round(score, 6), pa.float64())})


def score_quality_model(ds_or_sf, weights: np.ndarray, *,
                        dim: int | None = None, batch_size: int = 2048,
                        concurrency=(1, 8)):
    """→ ``(doc_id, model_score)`` for every document: the distributed
    half — broadcast the trained weights once, score with an actor
    pool. Accepts a Dataset with (doc_id, text) or an sf_dir."""
    if isinstance(ds_or_sf, str):
        ds = rd.read_parquet(f"{ds_or_sf}/documents.parquet",
                             columns=["doc_id", "text"])
    else:
        ds = ds_or_sf
    dim = dim if dim is not None else len(weights) - 1
    ref = ray.put(np.ascontiguousarray(weights))
    return ds.map_batches(
        QualityModelScorer, batch_format="pyarrow", batch_size=batch_size,
        fn_constructor_kwargs={"weights_ref": ref, "dim": dim},
        concurrency=concurrency, num_cpus=1)
