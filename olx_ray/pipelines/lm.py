"""Perplexity-based quality filtering — the CCNet pattern (Wenzek et
al. 2019: score documents with a language model trained on in-domain
text; high perplexity ⇒ out-of-domain/junk), built with a Kneser-Ney-
free add-k bigram LM so everything stays exact, deterministic and
dependency-free.

Training (two combiner-first passes, nothing corpus-sized on the
driver):

1. top-``vocab_size`` unigram vocabulary from the bucketed
   ``text.word_counts`` (count desc, word asc — deterministic ids;
   everything else maps to ``<unk>`` = id 0);
2. bigram counts over VOCAB IDS — per-batch pair counts → pair-hash
   bucket sum (the unbounded-key pattern), pruned to
   ``min_count`` (the standard LM cutoff; bounds the model by
   observed-bigrams-above-cutoff, not vocab²).

The model (vocab map + pruned bigram/unigram count frames) broadcasts
once; scoring is an actor-pool stage whose per-batch kernel is ONE
pandas merge of the batch's (prev, next) id pairs against the bigram
frame — no per-token Python. Add-k smoothing:

    P(w | p) = (c(p, w) + k) / (c(p) + k·V)

``doc_perplexity = exp(−mean log P)`` over the doc's transitions
(docs with < 2 tokens score the unigram-less neutral value NaN→drop
guard: they emit perplexity of the empty product, 1.0, documented).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..functions.hashing import hash64_array


def train_bigram_lm(sf_dir: str, vocab_size: int = 8192, *,
                    min_count: int = 2, n_buckets: int = 32) -> dict:
    """→ ``{"vocab": {word: id}, "uni": ndarray[V], "bi": DataFrame
    (p, w, c), "add_k": float, "V": int}`` — the broadcastable model."""
    from .text import word_counts

    wc = word_counts(sf_dir) \
        .sort(["n", "word"], descending=[True, False]) \
        .limit(vocab_size - 1).to_pandas()
    vocab = {w: i + 1 for i, w in enumerate(wc["word"])}   # 0 = <unk>
    vocab_ref = ray.put(vocab)

    def pair_partial(b: pd.DataFrame) -> pd.DataFrame:
        v = ray.get(vocab_ref)
        toks = b["text"].fillna("").str.split()
        ex = toks.explode().dropna()
        if not len(ex):
            return pd.DataFrame({"p": pd.Series(dtype=np.int64),
                                 "w": pd.Series(dtype=np.int64),
                                 "c": pd.Series(dtype=np.int64),
                                 "_pb": pd.Series(dtype=np.int32)})
        doc = ex.index.to_numpy()
        ids = ex.map(v).fillna(0).to_numpy().astype(np.int64)
        same = doc[1:] == doc[:-1]
        g = pd.DataFrame({"p": ids[:-1][same], "w": ids[1:][same]}) \
            .value_counts(["p", "w"]).reset_index(name="c")
        key = (g["p"].to_numpy() << np.int64(20)) ^ g["w"].to_numpy()
        from ..functions.hashing import bucket_of

        g["_pb"] = bucket_of(key, n_buckets)
        return g

    def pair_finish(g: pd.DataFrame) -> pd.DataFrame:
        full = g.groupby(["p", "w"], as_index=False)["c"].sum()
        # context totals c(p) must be UNPRUNED (pruning the denominator
        # would bias every probability): emit per-bucket partial p-sums
        # as sentinel rows (w = -1) so one corpus pass feeds both —
        # pairs spread across buckets by pair hash, so the driver sums
        # the sentinels per p afterwards
        ctx = full.groupby("p", as_index=False)["c"].sum()
        ctx["w"] = np.int64(-1)
        pruned = full[full["c"] >= min_count]
        return pd.concat([pruned, ctx[["p", "w", "c"]]],
                         ignore_index=True)

    rows = (rd.read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["text"])
            .map_batches(pair_partial, batch_format="pandas",
                         batch_size=4096)
            .groupby("_pb").map_groups(pair_finish, batch_format="pandas")
            .to_pandas())
    bi = rows[rows["w"] >= 0]
    ctx = rows[rows["w"] < 0].groupby("p", as_index=False)["c"].sum()
    uni = np.zeros(len(vocab) + 1, dtype=np.int64)
    uni[ctx["p"].to_numpy()] = ctx["c"].to_numpy()
    return {"vocab": vocab, "uni": uni,
            "bi": bi[["p", "w", "c"]].reset_index(drop=True),
            "add_k": 0.5, "V": len(vocab) + 1}


class PerplexityScorer:
    """Actor-pool stage: model fetched once per actor; per batch the
    (prev, next) id pairs merge against the bigram frame — vectorized,
    no per-token Python."""

    def __init__(self, model_ref):
        m = ray.get(model_ref) if not isinstance(model_ref, dict) \
            else model_ref
        self.vocab = m["vocab"]
        self.uni = m["uni"].astype(np.float64)
        self.bi = m["bi"].set_index(["p", "w"])["c"]
        self.k = float(m["add_k"])
        self.V = int(m["V"])

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        toks = b["text"].fillna("").str.split()
        ex = toks.explode().dropna()
        n_docs = len(b)
        out = np.full(n_docs, 1.0)            # <2-token docs: exp(0)
        if len(ex):
            doc = ex.index.to_numpy()
            ids = ex.map(self.vocab).fillna(0).to_numpy().astype(np.int64)
            same = doc[1:] == doc[:-1]
            p, w, d = ids[:-1][same], ids[1:][same], doc[:-1][same]
            pairs = pd.DataFrame({"p": p, "w": w})
            c_bi = pairs.join(self.bi.rename("c_bi"),
                              on=["p", "w"])["c_bi"] \
                .fillna(0.0).to_numpy(np.float64)
            logp = np.log((c_bi + self.k)
                          / (self.uni[p] + self.k * self.V))
            if len(d):
                sums = np.bincount(d, weights=logp, minlength=n_docs)
                cnts = np.bincount(d, minlength=n_docs)
                has = cnts > 0
                out[has] = np.exp(-sums[has] / cnts[has])
        return pd.DataFrame({
            "doc_id": b["doc_id"].to_numpy(),
            "perplexity": np.round(out, 4)})


def perplexity_score(sf_dir: str, model: dict, *, batch_size: int = 1024,
                     concurrency=(1, 8)):
    """→ ``(doc_id, perplexity)`` per document under the trained bigram
    LM — low = in-domain, high = junk (filter with a threshold or a
    per-lang quantile, CCNet-style)."""
    ref = ray.put(model)
    return rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"]) \
        .map_batches(PerplexityScorer, batch_format="pandas",
                     batch_size=batch_size,
                     fn_constructor_kwargs={"model_ref": ref},
                     concurrency=concurrency, num_cpus=1) \
        .sort("doc_id")
