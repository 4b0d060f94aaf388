"""Join strategies for Ray Data (SURVEY.md §2.5 + ray_guide patterns).

Two strategies, chosen by the caller per join:

- ``broadcast_join`` — small side (dimension table / filtered keys) is
  ``ray.put`` ONCE; every map task/actor `ray.get`s the shared object
  (zero-copy within a node) and merges per batch. No shuffle. Correct
  choice whenever the small side fits in a worker heap (dimensions,
  filtered orders, vocabularies).

- ``bucket_hash_join`` — both sides large: add ``_bucket = key_hash % B``
  to both, group each side by bucket, join matching buckets pairwise
  inside ``map_groups``. One shuffle per side, no driver
  materialization. B and skew salting are the caller's contract.

Also ``broadcast_semi`` / ``broadcast_anti`` (key-set membership
filters) — the semi/anti-join pattern.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray


class _BroadcastMerge:
    """map_batches actor: fetch the broadcast side once per actor."""

    def __init__(self, ref, on, how, suffix):
        self.small: pd.DataFrame = ray.get(ref)
        self.on = on
        self.how = how
        self.suffix = suffix

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return batch.merge(self.small, on=self.on, how=self.how,
                           suffixes=("", self.suffix))


def broadcast_join(ds, small: pd.DataFrame, on: list[str] | str,
                   how: str = "inner", *, concurrency: int = 4,
                   batch_size: int = 65536, suffix: str = "_r"):
    """ds ⋈ small on ``on``; small ships once via the object store."""
    ref = ray.put(small)
    return ds.map_batches(_BroadcastMerge, batch_format="pandas",
                          fn_constructor_kwargs={"ref": ref, "on": on,
                                                 "how": how, "suffix": suffix},
                          batch_size=batch_size,
                          concurrency=(1, concurrency), num_cpus=1)


class _SemiFilter:
    def __init__(self, ref, key, anti):
        self.keys = ray.get(ref)
        self.key = key
        self.anti = anti

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        mask = batch[self.key].isin(self.keys)
        return batch[~mask] if self.anti else batch[mask]


def broadcast_semi(ds, keys, key: str, *, anti: bool = False,
                   concurrency: int = 4):
    """Semi (or anti) join: keep rows whose ``key`` is (not) in ``keys``."""
    ref = ray.put(set(keys) if not isinstance(keys, (set, frozenset)) else keys)
    return ds.map_batches(_SemiFilter, batch_format="pandas",
                          fn_constructor_kwargs={"ref": ref, "key": key,
                                                 "anti": anti},
                          concurrency=(1, concurrency), num_cpus=1)


def bucket_hash_join(left, right, on: str, n_buckets: int = 32,
                     how: str = "inner", columns_left: list[str] | None = None,
                     columns_right: list[str] | None = None):
    """Partitioned hash join of two Datasets on an integer key column.

    Both sides get ``_bucket = key % n_buckets`` (int keys assumed well
    distributed — TPC-H surrogate keys are; salt externally for skewed
    keys), are tagged with a side marker, unioned, and each bucket is
    joined inside one ``map_groups`` task. One all-to-all shuffle total.
    """

    def tag(side: int, cols):
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            if cols:
                b = b[cols]
            b = b.copy()
            b["_bucket"] = (b[on].to_numpy(np.int64) % n_buckets).astype(np.int32)
            b["_side"] = np.int8(side)
            return b
        return fn

    lt = left.map_batches(tag(0, columns_left), batch_format="pandas")
    rt = right.map_batches(tag(1, columns_right), batch_format="pandas")

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["_side"] == 0].drop(columns=["_side", "_bucket"])
        r = g[g["_side"] == 1].drop(columns=["_side", "_bucket"])
        l = l.dropna(axis=1, how="all")
        r = r.dropna(axis=1, how="all")
        out = l.merge(r, on=on, how=how, suffixes=("", "_r"))
        return out

    # union of differently-schema'd sides: align columns first
    lcols = columns_left or [c for c in left.schema().names]
    rcols = columns_right or [c for c in right.schema().names]
    all_cols = list(dict.fromkeys(lcols + rcols))

    def widen(b: pd.DataFrame) -> pd.DataFrame:
        for c in all_cols:
            if c not in b.columns:
                b[c] = pd.NA
        return b[all_cols + ["_bucket", "_side"]]

    lt = lt.map_batches(widen, batch_format="pandas")
    rt = rt.map_batches(widen, batch_format="pandas")
    return lt.union(rt).groupby("_bucket").map_groups(
        join_bucket, batch_format="pandas")
