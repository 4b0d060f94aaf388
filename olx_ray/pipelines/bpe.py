"""BPE tokenizer training over the corpus — the step past token
COUNTING that a real training-data pipeline runs (public algorithm:
Sennrich et al. 2016, "Neural Machine Translation of Rare Words with
Subword Units"; the classic word-frequency formulation).

Scale shape: BPE never needs the corpus after one pass — it runs on
the WORD-FREQUENCY TABLE, which is the corpus compressed by the mean
word repetition (10³–10⁴× on natural text). That table comes from the
bucketed ``text.word_counts`` (combiner-first, no raw-token shuffle).
The merge loop then has two strategies:

- ``strategy="driver"`` (default): the word table collects to the
  driver (guarded by ``max_words``) and the loop runs vectorized
  there — the shape of every practical BPE trainer, valid while
  DISTINCT words fit one machine (~10⁸ rows ≈ GBs at 100 TB corpus;
  the guard makes exceeding it loud, not silent);
- ``strategy="distributed"``: each merge round is one ``map_batches``
  pair-count pass over the word-table Dataset + a small aggregate +
  a broadcast of the chosen merge — nothing word-table-sized on the
  driver; round count = number of merges (the documented trade:
  executor rounds against driver memory).

Both strategies produce IDENTICAL merges (deterministic tie-break:
count desc, then pair lexicographic asc) — pinned by tests against an
independent reference implementation.

``encode_bpe`` is the counting application side: an actor-pool
stage that builds the merge-rank table once per actor and encodes each
distinct word once per batch (memoized), emitting per-doc BPE token
counts. ``bpe_vocab`` + ``tokenize_bpe`` are the ID side (same
``_merge_word`` kernel, so counts and ids can never drift); the end
product is ``corpus.write_training_shards`` — packed fixed-length
token-id rows in resumable hash shards.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

_EOW = "</w>"          # end-of-word marker (standard BPE)


def _word_symbols(word: str) -> tuple:
    return tuple(word) + (_EOW,)


def _pair_counts_frame(words: pd.Series, counts: np.ndarray) -> pd.DataFrame:
    """Adjacent-symbol pair counts over a word batch, weighted by word
    frequency — vectorized via one explode."""
    sym = words.apply(list)                      # list of symbols per word
    lens = sym.str.len().to_numpy()
    keep = lens >= 2
    if not keep.any():
        return pd.DataFrame({"a": pd.Series(dtype=object),
                             "b": pd.Series(dtype=object),
                             "n": pd.Series(dtype=np.int64)})
    sym = sym[keep]
    wc = counts[keep]
    flat = sym.explode()
    widx = flat.index.to_numpy()
    vals = flat.to_numpy()
    same = widx[1:] == widx[:-1]
    return pd.DataFrame({
        "a": vals[:-1][same], "b": vals[1:][same],
        "n": np.repeat(wc, (lens[keep] - 1))}) \
        .groupby(["a", "b"], as_index=False)["n"].sum()


def _apply_merge(symbols: tuple, a: str, b: str, ab: str) -> tuple:
    out, i, n = [], 0, len(symbols)
    while i < n:
        if i + 1 < n and symbols[i] == a and symbols[i + 1] == b:
            out.append(ab)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return tuple(out)


def train_bpe(sf_dir: str, n_merges: int = 200, *,
              strategy: str = "driver", max_words: int = 2_000_000,
              n_buckets: int = 32) -> list[tuple[str, str]]:
    """→ ordered merge list ``[(a, b), …]`` learned from the corpus's
    word-frequency table. Deterministic (count desc, pair asc)."""
    from .text import word_counts

    wc_ds = word_counts(sf_dir)
    if strategy == "driver":
        wc = wc_ds.to_pandas()
        if len(wc) > max_words:
            raise ValueError(
                f"word table has {len(wc)} rows > max_words={max_words}; "
                "use strategy='distributed' or raise the guard")
        syms = wc["word"].apply(_word_symbols)
        counts = wc["n"].to_numpy().astype(np.int64)
        merges: list[tuple[str, str]] = []
        for _ in range(n_merges):
            pc = _pair_counts_frame(syms, counts)
            if not len(pc):
                break
            pc = pc.sort_values(["n", "a", "b"],
                                ascending=[False, True, True],
                                kind="mergesort")
            a, b = str(pc["a"].iloc[0]), str(pc["b"].iloc[0])
            merges.append((a, b))
            ab = a + b
            # _apply_merge is a no-op on words without the pair; a
            # pre-scan "hit" mask would cost a second full pass for
            # nothing (Series.where evaluates `other` eagerly anyway)
            syms = syms.apply(lambda s: _apply_merge(s, a, b, ab))
        return merges
    if strategy != "distributed":
        raise ValueError(f"strategy={strategy!r}")

    # distributed rounds: the word table stays a Dataset; per round one
    # pair-count pass + small aggregate + broadcast merge application
    import ray.data as rd

    from ..functions.smallagg import finish_small

    def to_syms(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"syms": b["word"].apply(_word_symbols),
                             "n": b["n"].astype(np.int64)})

    tbl = wc_ds.map_batches(to_syms, batch_format="pandas").materialize()
    merges = []
    for _ in range(n_merges):
        def partial(b: pd.DataFrame) -> pd.DataFrame:
            return _pair_counts_frame(b["syms"],
                                      b["n"].to_numpy(np.int64))

        pc = finish_small(
            tbl.map_batches(partial, batch_format="pandas"),
            ["a", "b"], dict(n=("n", "sum"))).to_pandas()
        if not len(pc):
            break
        pc = pc.sort_values(["n", "a", "b"], ascending=[False, True, True],
                            kind="mergesort")
        a, b = str(pc["a"].iloc[0]), str(pc["b"].iloc[0])
        merges.append((a, b))
        ab = a + b

        def apply(bt: pd.DataFrame, a=a, b=b, ab=ab) -> pd.DataFrame:
            bt = bt.copy()
            bt["syms"] = bt["syms"].apply(
                lambda s: _apply_merge(s, a, b, ab))
            return bt

        tbl = tbl.map_batches(apply, batch_format="pandas").materialize()
    return merges


def _merge_word(word: str, rank: dict) -> list:
    """The BPE encode loop — ONE copy shared by the counting stage
    (``BpeEncoder``), the id stage (``BpeTokenizer``) and any future
    consumer, so their outputs can never drift: repeatedly apply the
    lowest-rank adjacent merge until none applies."""
    syms = list(_word_symbols(word))
    while len(syms) >= 2:
        best, best_i = None, -1
        for i in range(len(syms) - 1):
            r = rank.get((syms[i], syms[i + 1]))
            if r is not None and (best is None or r < best):
                best, best_i = r, i
        if best is None:
            break
        syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


class BpeEncoder:
    """Actor-pool stage: per-doc BPE token counts. The merge-rank table
    builds once per actor; each DISTINCT word in a batch encodes once
    (memoized — natural text repeats words heavily)."""

    def __init__(self, merges_ref):
        merges = ray.get(merges_ref) if not isinstance(merges_ref, list) \
            else merges_ref
        self.rank = {pair: i for i, pair in enumerate(merges)}
        self.memo: dict[str, int] = {}

    def _encode_len(self, word: str) -> int:
        got = self.memo.get(word)
        if got is not None:
            return got
        n = len(_merge_word(word, self.rank))
        if len(self.memo) < 200_000:
            self.memo[word] = n
        return n

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        toks = b["text"].fillna("").str.split()
        out_n = np.fromiter(
            (sum(self._encode_len(w) for w in ws) for ws in toks),
            dtype=np.int64, count=len(b))
        return pd.DataFrame({"doc_id": b["doc_id"].to_numpy(),
                             "n_bpe_tokens": out_n})


def encode_bpe(sf_dir: str, merges: list[tuple[str, str]], *,
               batch_size: int = 1024, concurrency=(1, 8)):
    """→ ``(doc_id, n_bpe_tokens)`` per document: merges broadcast
    once, encoded by the actor pool."""
    import ray.data as rd

    ref = ray.put(list(merges))
    return rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"]) \
        .map_batches(BpeEncoder, batch_format="pandas",
                     batch_size=batch_size,
                     fn_constructor_kwargs={"merges_ref": ref},
                     concurrency=concurrency, num_cpus=1) \
        .sort("doc_id")


# ------------------------------------------------------------- token ids
PAD_ID, UNK_ID = 0, 1


def bpe_vocab(sf_dir: str, merges: list[tuple[str, str]]) -> dict[str, int]:
    """Deterministic symbol→id table: 0=``<pad>``, 1=``<unk>``, then
    the corpus ALPHABET (distinct characters of the word table, plus
    the ``</w>`` end-of-word marker) in sorted order, then the merge
    OUTPUT symbols in rank order. The alphabet pass runs over
    ``word_counts`` (the corpus compressed by word repetition) with a
    per-batch distinct-chars partial — the driver only ever sees
    alphabet-sized frames."""
    import pandas as pd

    from .text import word_counts

    def chars_partial(b: pd.DataFrame) -> pd.DataFrame:
        cs: set[str] = set()
        for w in b["word"]:
            cs.update(w)
        return pd.DataFrame({"ch": sorted(cs)})

    alpha = sorted(set(word_counts(sf_dir).map_batches(
        chars_partial, batch_format="pandas").to_pandas()["ch"]))
    vocab = {"<pad>": PAD_ID, "<unk>": UNK_ID}
    for s in alpha + [_EOW]:
        vocab.setdefault(s, len(vocab))
    for a, b in merges:
        vocab.setdefault(a + b, len(vocab))
    return vocab


class BpeTokenizer:
    """Actor-pool stage: text → per-doc BPE token IDS (the step past
    counting — what a training pipeline actually materializes). Merge
    ranks + vocab broadcast once per actor (``ray.put``); each DISTINCT
    word encodes once per actor (memoized id arrays). Symbols outside
    the vocab (characters unseen at vocab-build time) map to
    ``UNK_ID``. Output: ``(doc_id, ids list<int32>, n_bpe_tokens)``;
    the ids column is built from one flat buffer + offsets — no per-id
    Python boxing."""

    def __init__(self, table_ref):
        self.rank, self.vocab = ray.get(table_ref) \
            if not isinstance(table_ref, tuple) else table_ref
        self.memo: dict[str, np.ndarray] = {}

    def _encode(self, word: str) -> np.ndarray:
        got = self.memo.get(word)
        if got is None:
            got = np.fromiter(
                (self.vocab.get(s, UNK_ID)
                 for s in _merge_word(word, self.rank)),
                dtype=np.int32)
            if len(self.memo) < 200_000:
                self.memo[word] = got
        return got

    def __call__(self, b: pa.Table) -> pa.Table:
        flat, offsets = [], [0]
        for t in b["text"].to_pylist():
            n = offsets[-1]
            for w in (t or "").split():
                ids = self._encode(w)
                flat.append(ids)
                n += len(ids)
            offsets.append(n)
        values = (np.concatenate(flat) if flat
                  else np.empty(0, np.int32))
        off = np.asarray(offsets, dtype=np.int32)
        return pa.table({
            "doc_id": b["doc_id"],
            "ids": pa.ListArray.from_arrays(pa.array(off, pa.int32()),
                                            pa.array(values, pa.int32())),
            "n_bpe_tokens": pa.array(np.diff(off).astype(np.int64),
                                     pa.int64()),
        })


def tokenize_bpe(sf_dir: str, merges: list[tuple[str, str]],
                 vocab: dict[str, int] | None = None, *,
                 batch_size: int = 1024, concurrency=(1, 8),
                 sort: bool = True):
    """→ ``(doc_id, ids, n_bpe_tokens)`` per document, sorted. The id
    companion of ``encode_bpe`` (same ``_merge_word`` kernel, so
    ``len(ids) == n_bpe_tokens`` of the counting path by construction —
    pinned in tests)."""
    import ray.data as rd

    vocab = vocab if vocab is not None else bpe_vocab(sf_dir, merges)
    rank = {pair: i for i, pair in enumerate(merges)}
    ref = ray.put((rank, vocab))
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"]) \
        .map_batches(BpeTokenizer, batch_format="pyarrow",
                     batch_size=batch_size,
                     fn_constructor_kwargs={"table_ref": ref},
                     concurrency=concurrency, num_cpus=1)
    # sort=False for consumers that re-shuffle anyway (the shard
    # writer buckets by doc_id hash — a global sort here is a wasted
    # all-to-all)
    return ds.sort("doc_id") if sort else ds
