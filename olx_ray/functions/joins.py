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

from .hashing import bucket_of


def _merge_task(batch: pd.DataFrame, *, ref, on, how, suffix) -> pd.DataFrame:
    # ray.get of an in-plasma object is zero-copy after the worker's
    # first touch — stateless tasks get actor-style amortization with
    # none of the per-query actor-pool spin-up cost
    small: pd.DataFrame = ray.get(ref)
    return batch.merge(small, on=on, how=how, suffixes=("", suffix))


def broadcast_join(ds, small: pd.DataFrame, on: list[str] | str,
                   how: str = "inner", *, concurrency: int | None = None,
                   batch_size: int = 65536, suffix: str = "_r"):
    """ds ⋈ small on ``on``; small ships once via the object store."""
    ref = ray.put(small)
    return ds.map_batches(_merge_task, batch_format="pandas",
                          fn_kwargs={"ref": ref, "on": on, "how": how,
                                     "suffix": suffix},
                          batch_size=batch_size, concurrency=concurrency)


def _semi_task(batch: pd.DataFrame, *, ref, key, anti) -> pd.DataFrame:
    keys = ray.get(ref)
    mask = batch[key].isin(keys)
    return batch[~mask] if anti else batch[mask]


def broadcast_semi(ds, keys, key: str, *, anti: bool = False,
                   concurrency: int | None = None):
    """Semi (or anti) join: keep rows whose ``key`` is (not) in ``keys``."""
    ref = ray.put(set(keys) if not isinstance(keys, (set, frozenset)) else keys)
    return ds.map_batches(_semi_task, batch_format="pandas",
                          fn_kwargs={"ref": ref, "key": key, "anti": anti},
                          concurrency=concurrency)


def bucket_hash_join(left, right, on: str, n_buckets: int = 32,
                     how: str = "inner", columns_left: list[str] | None = None,
                     columns_right: list[str] | None = None,
                     hot_keys=None, salt: int = 8, post=None):
    """Partitioned hash join of two Datasets on an integer key column.

    ``post(joined_frame) -> frame`` runs INSIDE each bucket task on its
    joined rows. Because a bucket holds every row of its keys from both
    sides, any per-join-key aggregate is complete there — passing it as
    ``post`` fuses the aggregation into the join and saves the separate
    groupby shuffle (valid only for group keys equal to — or
    functionally dependent on — the join key, and without hot-key
    salting, which splits a key across sub-buckets).

    Both sides get ``_bucket = bucket_of(key)`` (mixed key hash, so
    strided/shard-tagged id spaces still spread), are tagged with a
    side marker, unioned, and each bucket is joined inside one
    ``map_groups`` task. One all-to-all shuffle total.

    VALUE skew (one key carrying a disproportionate share of the LEFT
    side) is handled by SALTING: pass the hot keys in ``hot_keys`` —
    each hot key's left rows spread round-robin over ``salt``
    sub-buckets while its right rows are REPLICATED into all of them,
    so no single task holds a hot key's full left side. Join output is
    identical (each left row still meets each matching right row
    exactly once); inner joins only (replicated right rows would
    duplicate outer-null emission).

    Schema alignment for the union uses Arrow TYPED null columns — a
    pandas ``pd.NA`` widen turns columns to object dtype and makes the
    shuffle sort ~10× slower.

    ``hot_keys="auto"`` runs ``detect_hot_keys`` over the left key
    column first (a bounded Misra-Gries summary tree — no key shuffle)
    and salts whatever it flags; the left side is then consumed twice
    (detection + join), so pass a re-executable pipeline."""
    import pyarrow as pa

    if isinstance(hot_keys, str):
        if hot_keys != "auto":
            raise ValueError(f"hot_keys={hot_keys!r}: pass keys, None, "
                             "or 'auto'")
        # validate the combination BEFORE detection: otherwise
        # auto+post / auto+outer works on unskewed data and dies the
        # day a key crosses the hotness threshold (latent
        # data-dependent crash)
        if how != "inner":
            raise ValueError("hot_keys='auto' requires an inner join "
                             "(salting cannot do outer joins)")
        if post is not None:
            raise ValueError("hot_keys='auto' is incompatible with "
                             "post= (salting splits keys across "
                             "sub-buckets)")
        hot_keys = detect_hot_keys(left, on, n_buckets=n_buckets)

    has_hot = hot_keys is not None and len(hot_keys) > 0   # len(): works
    #           for list/set/ndarray alike (bool(ndarray) would raise)
    if has_hot and how != "inner":
        raise ValueError("hot-key salting requires an inner join")
    if has_hot and post is not None:
        raise ValueError("post-aggregation requires each key whole in one "
                         "bucket; salting splits hot keys across "
                         "sub-buckets")
    if has_hot and salt < 1:
        raise ValueError("salt must be >= 1 (salt=0 would collapse the "
                         "whole join into one bucket)")
    hot = np.unique(np.asarray(list(map(int, hot_keys)), np.int64)) \
        if has_hot else np.empty(0, np.int64)
    mult = salt if len(hot) else 1

    from .blocks import ensure_arrow_schema

    left = ensure_arrow_schema(left)
    right = ensure_arrow_schema(right)
    lschema = left.schema()
    rschema = right.schema()
    ltypes = {n: t for n, t in zip(lschema.names, lschema.types)}
    rtypes = {n: t for n, t in zip(rschema.names, rschema.types)}
    lcols = columns_left or list(lschema.names)
    rcols = columns_right or list(rschema.names)
    all_cols = list(dict.fromkeys(lcols + rcols))
    types = {**{c: rtypes[c] for c in rcols}, **{c: ltypes[c] for c in lcols}}

    def tag(side: int, cols):
        def fn(b: pa.Table) -> pa.Table:
            n = b.num_rows
            key = b[on].to_numpy(zero_copy_only=False).astype(np.int64)
            out = {}
            for c in all_cols:
                out[c] = b[c] if c in cols else pa.nulls(n, types[c])
            t = pa.table(out)
            sub = np.zeros(n, np.int64)
            if len(hot) and n:
                pos = np.searchsorted(hot, key)
                pos[pos == len(hot)] = 0
                is_hot = hot[pos] == key
                if side == 0:
                    nh = int(is_hot.sum())
                    if nh:
                        # spread hot left rows over sub-buckets with a
                        # per-batch offset (a plain arange%salt
                        # restarting at 0 each batch would starve the
                        # upper sub-buckets whenever per-batch hot
                        # counts are below `salt`). The offset is a
                        # DETERMINISTIC mix of the batch content — not
                        # os.urandom — so a lineage-reconstructed block
                        # routes identically to the original and reduce
                        # tasks never see inconsistent placements
                        first = np.nonzero(is_hot)[0]
                        from .hashing import mix64
                        off = int(mix64(np.asarray(
                            [key[first[0]] ^ (nh << 20) ^ n],
                            np.int64))[0] % np.uint64(salt))
                        sub[first] = (np.arange(nh) + off) % salt
                elif is_hot.any() and salt > 1:
                    # replicate hot right rows into every sub-bucket
                    hr = np.nonzero(is_hot)[0]
                    order = np.concatenate([np.arange(n)] + [hr] * (salt - 1))
                    sub = np.concatenate(
                        [sub] + [np.full(len(hr), j, np.int64)
                                 for j in range(1, salt)])
                    t = t.take(pa.array(order))
                    key = key[order]
            bucket = bucket_of(key, n_buckets).astype(np.int64) * mult + sub
            t = t.append_column("_bucket",
                                pa.array(bucket.astype(np.int32), pa.int32()))
            t = t.append_column("_side",
                                pa.array(np.full(len(key), side, np.int8),
                                         pa.int8()))
            return t
        return fn

    # bounded batches: right-side hot replication amplifies a batch up
    # to salt× inside one tag task — whole-block batches could blow a
    # worker heap on exactly the skewed inputs salting targets
    tag_bs = 65536
    lt = left.map_batches(tag(0, set(lcols)), batch_format="pyarrow",
                          batch_size=tag_bs)
    rt = right.map_batches(tag(1, set(rcols)), batch_format="pyarrow",
                           batch_size=tag_bs)

    def join_bucket(g: pa.Table) -> pd.DataFrame:
        # Split sides in ARROW, then convert each side to pandas
        # separately: the null padding added for the union lives only in
        # the OTHER side's rows, so each side's own columns convert with
        # their native dtypes (an int64 column null-padded on one side
        # would widen to float64 if the union were converted whole —
        # 834.0 vs 834 breaks value-hash parity downstream).
        import pyarrow.compute as pc

        side = g["_side"]
        l = g.filter(pc.equal(side, 0)).select(lcols).to_pandas()
        r = g.filter(pc.equal(side, 1)).select(rcols).to_pandas()
        out = l.merge(r, on=on, how=how, suffixes=("", "_r"))
        return post(out) if post is not None else out

    return lt.union(rt).groupby("_bucket").map_groups(
        join_bucket, batch_format="pyarrow")


def _sample_cuts(left, value_col: str, n_chunks: int, fan_in: int = 32):
    """Chunk cut points for ``range_join`` from a bounded sample tree:
    each batch contributes ≤ 4·n_chunks evenly-spaced sorted values,
    summaries merge through ``fan_in`` groups (same tree shape as the
    Misra-Gries top-k), and the final ≤ 4·n_chunks values yield
    quantile cuts. Only bounded summaries ever move; the driver holds
    one. Cuts steer PARTITIONING only — join output never depends on
    them — so sample noise costs balance, not correctness."""
    per = 4 * n_chunks

    def spaced(v: np.ndarray) -> np.ndarray:
        v = np.sort(v[~np.isnan(v)])
        if len(v) <= per:
            return v
        return v[np.linspace(0, len(v) - 1, per).astype(np.int64)]

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        v = b[value_col].to_numpy(np.float64, copy=False)
        return pd.DataFrame({"v": spaced(v)})

    def merge(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"v": spaced(b["v"].to_numpy(np.float64))})

    from .summaries import summary_tree

    sample = summary_tree(left, partial, merge, fan_in=fan_in,
                          batch_size=65536).to_pandas()["v"].to_numpy()
    if len(sample) == 0:
        return np.empty(0, np.float64)
    qs = np.linspace(0, 1, n_chunks + 1)[1:-1]
    return np.unique(np.quantile(sample, qs))


def range_join(left, right, value_col: str, lo_col: str, hi_col: str,
               n_chunks: int = 32, cuts=None,
               columns_left: list[str] | None = None,
               columns_right: list[str] | None = None):
    """Distributed interval join: each ``left`` row (point ``value_col``)
    meets every ``right`` row (interval ``[lo_col, hi_col]``, inclusive
    both ends) that contains it — ``l.v BETWEEN r.lo AND r.hi``. The
    operator Ray Data lacks natively (as-of's big sibling; DuckDB plans
    this as IEJoin).

    Plan: the value domain splits at ``cuts`` (given, or sampled left
    quantiles via a bounded summary tree) into chunks; left rows route
    to the single chunk holding their value, right intervals REPLICATE
    into every chunk they overlap (vectorized ``np.repeat``), and each
    chunk joins in one ``map_groups`` task with a sort + double
    ``searchsorted`` sweep — O((L+R)·log L + output) per chunk, no
    nested loop. One shuffle per side; chunk count is a config bound,
    so the bounded-key ``map_groups`` rule holds.

    Scale contract: replication factor is the mean number of chunks an
    interval overlaps — wide intervals are this join's hot-key analog
    (an interval spanning the whole domain replicates ``n_chunks``×).
    NaN/null points and intervals never match and are dropped in the
    tag stage, as is any ``lo > hi`` interval. Name collisions between
    the two sides take an ``_r`` suffix on the right. Comparisons run
    in float64: integer keys beyond 2^53 would lose precision — use
    ``bucket_hash_join`` on exact keys there."""
    import pyarrow as pa

    if cuts is None:
        cuts = _sample_cuts(left, value_col, n_chunks)
    cuts = np.asarray(cuts, np.float64)

    if columns_left and value_col not in columns_left:
        raise ValueError(f"columns_left must include {value_col!r}")
    if columns_right and not {lo_col, hi_col} <= set(columns_right):
        raise ValueError(f"columns_right must include {lo_col!r}/{hi_col!r}")

    lschema, rschema = left.schema(), right.schema()
    ltypes = {n: t for n, t in zip(lschema.names, lschema.types)}
    rtypes = {n: t for n, t in zip(rschema.names, rschema.types)}
    lcols = columns_left or list(lschema.names)
    rcols = columns_right or list(rschema.names)
    rename_r = {c: f"{c}_r" for c in rcols if c in set(lcols)}
    out_lcols = list(lcols)
    out_rcols = [rename_r.get(c, c) for c in rcols]
    all_out = out_lcols + out_rcols
    types = {**{rename_r.get(c, c): rtypes[c] for c in rcols},
             **{c: ltypes[c] for c in lcols}}
    lo_out, hi_out = rename_r.get(lo_col, lo_col), rename_r.get(hi_col, hi_col)

    def emit(t: pa.Table, own: list[str], chunk: np.ndarray,
             side: int) -> pa.Table:
        # typed Arrow nulls for the other side's columns — a pandas
        # pd.NA widen would degrade dtypes through the shuffle sort
        own_set = set(own)
        out = {c: (t[c] if c in own_set else pa.nulls(t.num_rows, types[c]))
               for c in all_out}
        out["_chunk"] = pa.array(chunk.astype(np.int32), pa.int32())
        out["_side"] = pa.array(np.full(len(chunk), side, np.int8), pa.int8())
        return pa.table(out)

    def tag_left(b: pa.Table) -> pa.Table:
        b = b.select(lcols)
        v = b[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        keep = ~np.isnan(v)
        b = b.filter(pa.array(keep))
        chunk = np.searchsorted(cuts, v[keep], side="right")
        return emit(b, out_lcols, chunk, 0)

    def tag_right(b: pa.Table) -> pa.Table:
        b = b.select(rcols).rename_columns(out_rcols)
        lo = b[lo_out].to_numpy(zero_copy_only=False).astype(np.float64)
        hi = b[hi_out].to_numpy(zero_copy_only=False).astype(np.float64)
        keep = ~(np.isnan(lo) | np.isnan(hi)) & (lo <= hi)
        b, lo, hi = b.filter(pa.array(keep)), lo[keep], hi[keep]
        c_lo = np.searchsorted(cuts, lo, side="right").astype(np.int64)
        c_hi = np.searchsorted(cuts, hi, side="right").astype(np.int64)
        counts = c_hi - c_lo + 1
        idx = np.repeat(np.arange(b.num_rows), counts)
        # per-interval arange: global arange minus each row's start
        starts = np.zeros(len(counts), np.int64)
        if len(counts):
            starts[1:] = np.cumsum(counts)[:-1]
        chunk = (np.arange(int(counts.sum())) - np.repeat(starts, counts)
                 + np.repeat(c_lo, counts))
        return emit(b.take(pa.array(idx)), out_rcols, chunk, 1)

    # replication amplifies a right batch up to n_chunks× inside one
    # tag task — bound the input batch so the output stays heap-sized
    lt = left.map_batches(tag_left, batch_format="pyarrow",
                          batch_size=65536)
    rt = right.map_batches(tag_right, batch_format="pyarrow",
                           batch_size=max(1024, 65536 // max(1, n_chunks)))

    def join_chunk(g: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc

        side = g["_side"]
        l = g.filter(pc.equal(side, 0)).select(out_lcols).to_pandas()
        r = g.filter(pc.equal(side, 1)).select(out_rcols).to_pandas()
        if not len(l) or not len(r):
            return pd.concat([l.iloc[:0], r.iloc[:0]], axis=1)
        v = l[value_col].to_numpy(np.float64)
        order = np.argsort(v, kind="stable")
        v = v[order]
        lo = r[lo_out].to_numpy(np.float64)
        hi = r[hi_out].to_numpy(np.float64)
        lo_i = np.searchsorted(v, lo, side="left")
        hi_i = np.searchsorted(v, hi, side="right")
        counts = np.maximum(hi_i - lo_i, 0)
        starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
        li = (np.arange(int(counts.sum())) - np.repeat(starts, counts)
              + np.repeat(lo_i, counts))
        ri = np.repeat(np.arange(len(r)), counts)
        out = l.iloc[order[li]].reset_index(drop=True)
        rout = r.iloc[ri].reset_index(drop=True)
        return pd.concat([out, rout], axis=1)

    return lt.union(rt).groupby("_chunk").map_groups(
        join_chunk, batch_format="pyarrow")


# --------------------------------------------------- semi joins at scale
def _key_hashes(arr) -> np.ndarray:
    """uint64 hashes of a key column (Arrow array / numpy): integer
    keys go through ``mix64`` (avalanche, so sequential ids spread),
    strings/binary through ``hash64_array``. Build and probe sides of
    ``bloom_semi`` MUST share this function."""
    import pyarrow as pa

    from .hashing import hash64_array, mix64

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if isinstance(arr, pa.Array):
        if arr.null_count:
            # a null int key would silently widen to float64/NaN and
            # take the string-hash path — fail loudly instead
            raise ValueError("bucket_semi/bloom_semi: key column "
                             "contains nulls; filter or fill them first")
        if (pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type)
                or pa.types.is_binary(arr.type)
                or pa.types.is_large_binary(arr.type)):
            return hash64_array(arr)
    np_arr = arr.to_numpy(zero_copy_only=False) if isinstance(arr, pa.Array) \
        else np.asarray(arr)
    if np_arr.dtype.kind in "iu":
        return mix64(np_arr.astype(np.int64, copy=False))
    if np_arr.dtype.kind == "f":
        raise TypeError("bucket_semi/bloom_semi: float key columns are "
                        "not supported (equality on floats is not a "
                        "join contract); cast to int or string")
    return hash64_array(np_arr.tolist())


def bucket_semi(left, keys_ds, key: str, *, anti: bool = False,
                n_buckets: int = 32):
    """EXACT distributed semi (or anti) join — keep ``left`` rows whose
    ``key`` is (not) present in ``keys_ds[key]`` — when the key side is
    too big to broadcast: both sides bucket by key HASH (so integer and
    string keys both work; the right side ships its key column ONLY,
    per-batch deduplicated), and each bucket task runs one vectorized
    ``isin`` on the VALUES. One shuffle, no driver state; right-side
    duplicate keys cannot duplicate left rows (membership, not a
    join)."""
    import pyarrow as pa

    from .blocks import ensure_arrow_schema

    left = ensure_arrow_schema(left)
    lschema = left.schema()
    lcols = list(lschema.names)
    types = dict(zip(lschema.names, lschema.types))

    def tag_left(b: pa.Table) -> pa.Table:
        bk = (_key_hashes(b[key]) % np.uint64(n_buckets)).astype(np.int32)
        t = b.select(lcols)
        t = t.append_column("_bucket", pa.array(bk, pa.int32()))
        return t.append_column("_side", pa.array(
            np.zeros(b.num_rows, np.int8), pa.int8()))

    def tag_right(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ks = pc.unique(b[key].combine_chunks()
                       if isinstance(b[key], pa.ChunkedArray) else b[key])
        n = len(ks)
        out = {c: (ks.cast(types[key]) if c == key else pa.nulls(n, types[c]))
               for c in lcols}
        t = pa.table(out)
        bk = (_key_hashes(ks) % np.uint64(n_buckets)).astype(np.int32)
        t = t.append_column("_bucket", pa.array(bk, pa.int32()))
        return t.append_column("_side", pa.array(np.ones(n, np.int8),
                                                 pa.int8()))

    def filter_bucket(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        side = g["_side"]
        # Arrow-native membership (NOT a pandas round-trip): the left
        # rows pass through untouched, so nested payload columns
        # (interleaved list<struct> spans) keep their exact schema —
        # a pandas conversion would widen int32 offsets and objectify
        # the structs (gated_anti ships whole documents through here)
        l = g.filter(pc.equal(side, 0)).select(lcols)
        rk = g.filter(pc.equal(side, 1))[key].combine_chunks()
        mask = pc.is_in(l[key].combine_chunks(), value_set=rk)
        return l.filter(pc.invert(mask) if anti else mask)

    lt = left.map_batches(tag_left, batch_format="pyarrow")
    rt = keys_ds.map_batches(tag_right, batch_format="pyarrow")
    return lt.union(rt).groupby("_bucket").map_groups(
        filter_bucket, batch_format="pyarrow")


# Broadcast cap for the dedup "apply" tails (gated_anti): below it the
# drop-id set collects to the driver and ships once via ray.put (no
# shuffle); above it the ids stay a Dataset and the corpus makes one
# bucketed pass. 4M ids ≈ 32 MB of int64 / ~250 MB of URL strings per
# worker — the same order as relational.BROADCAST_ROW_CAP. At
# web-crawl dup rates (30-50 %) the dropped set is CORPUS-proportional,
# so the gate is what keeps these tails off the driver at 10^10 docs.
ANTI_BROADCAST_ROW_CAP = 4_000_000


def gated_anti(ds, drop_keys, key: str, *, broadcast_row_cap: int | None = None,
               n_buckets: int = 32):
    """Size-gated drop-id anti-join — THE shared tail of every dedup
    "apply" operator (``dedup_keep_representatives``,
    ``semantic_dedup_corpus``, the interleaved ``_anti_drop_ids``
    family, ``neardup_incremental``): keep the rows of ``ds`` whose
    ``key`` is NOT in ``drop_keys[key]``.

    ``drop_keys`` is counted once (materialized first — narrow id rows,
    object-store-resident, never driver-collected for the count) and
    delivery is picked by size, the exact gate pattern the relational
    dimension joins use (``relational.BROADCAST_ROW_CAP``):

    - ``<= cap``: driver collect (Arrow blocks — no Python boxing) +
      one ``ray.put``; ``ds`` streams through a vectorized membership
      probe against a PER-WORKER-cached ``pd.Index`` (its hash engine
      builds once per worker process, not once per batch — at the 4M
      cap a per-batch ``pc.is_in`` would rebuild a multi-million-entry
      table ~once per 64Ki rows). Zero shuffle, pyarrow batches, so
      nested payload columns pass untouched (NOT ``broadcast_semi``:
      its pandas batches would mangle interleaved ``list<struct>``
      spans).
    - ``> cap``: ``bucket_semi(anti=True)`` — the id set ships as a
      bucketed Dataset; nothing drop-set-sized touches the driver or
      any single task, at the price of one bucketed pass of ``ds``.

    Integer keys NORMALIZE to 64-bit on both sides (widen, never
    narrow — casting the corpus batch DOWN to a narrower drop-id type
    would crash on legal non-member values; signed/unsigned mixes are
    refused loudly), so the two strategies agree on every legal input.

    Both paths return the identical row set (strategy-agreement
    pytest); row ORDER differs — callers that promise order sort after.
    ``broadcast_row_cap=None`` reads ``ANTI_BROADCAST_ROW_CAP`` at call
    time (tests monkeypatch the module constant to force either path).
    """
    import pyarrow as pa

    cap = ANTI_BROADCAST_ROW_CAP if broadcast_row_cap is None \
        else broadcast_row_cap
    drop_keys = drop_keys.materialize()
    n = drop_keys.count()
    if n == 0:
        return ds
    if n > cap:
        return bucket_semi(ds, drop_keys, key, anti=True,
                           n_buckets=n_buckets)
    # gather the id column as ARROW blocks — no Python boxing;
    # zero-row pandas-origin blocks arrive COLUMN-LESS (the Ray 2.49
    # empty-block column drop) — skip them; n > 0 guarantees at least
    # one real block, and a NON-empty block missing the key still
    # raises (caller-side rename bug, must stay loud)
    blocks = [t for t in ray.get(drop_keys.to_arrow_refs()) if t.num_rows]
    arr = pa.concat_tables([t.select([key]) for t in blocks])[key] \
        .combine_chunks()
    arr = _widen_key(arr)
    ref = ray.put(arr)
    arr_is_int = pa.types.is_integer(arr.type)
    unsigned = pa.types.is_unsigned_integer(arr.type)

    def anti(b: pa.Table) -> pa.Table:
        col = _widen_key(b[key].combine_chunks())
        # a type-class mismatch would silently match NOTHING (the
        # probe returns -1 everywhere → the anti-join keeps every
        # row, i.e. the dedup becomes a no-op) — fail loud instead
        if pa.types.is_integer(col.type) != arr_is_int or (
                arr_is_int and
                pa.types.is_unsigned_integer(col.type) != unsigned):
            raise TypeError(
                f"gated_anti: key type mismatch — corpus {col.type} "
                f"vs drop side; normalize the id space upstream")
        mask = _anti_probe(ref).get_indexer(col.to_pandas()) >= 0
        return b.filter(pa.array(~mask))

    return ds.map_batches(anti, batch_format="pyarrow")


def _widen_key(arr):
    """Normalize an id column for the gated_anti broadcast probe:
    integers widen to 64-bit (int64/uint64 by signedness — NEVER
    narrow: casting a corpus batch down to a narrower drop-id type
    crashes on legal non-member values, review finding); other types
    pass through."""
    import pyarrow as pa

    if pa.types.is_integer(arr.type):
        t = pa.uint64() if pa.types.is_unsigned_integer(arr.type) \
            else pa.int64()
        return arr.cast(t) if not arr.type.equals(t) else arr
    return arr


# per-WORKER probe-index cache for gated_anti's broadcast path: the
# pd.Index hash engine builds lazily on first get_indexer and lives as
# long as the worker process, so a 4M-id set costs one build per
# worker instead of one per batch. Keyed by the object ref (stable
# across the tasks of one gated_anti call); tiny bound, cleared on
# overflow.
_ANTI_PROBE_CACHE: dict = {}


def _anti_probe(ref):
    import pandas as pd

    k = ref.binary()
    idx = _ANTI_PROBE_CACHE.get(k)
    if idx is None:
        if len(_ANTI_PROBE_CACHE) >= 4:
            _ANTI_PROBE_CACHE.clear()
        vals = ray.get(ref)                   # zero-copy plasma read
        # get_indexer REQUIRES a unique index — drop sets may carry
        # per-bucket duplicates
        idx = pd.Index(vals.to_pandas()).unique()
        idx = pd.Index(idx)
        _ANTI_PROBE_CACHE[k] = idx
    return idx


def bloom_semi(ds, keys_ds, key: str, *, anti: bool = False,
               exact: bool = True, fpr: float = 0.01,
               capacity: int | None = None, n_buckets: int = 32,
               fan_in: int = 32, max_bits: int = 1 << 30):
    """Bloom-accelerated semi/anti join — the classic runtime-filter
    pushdown for a key side too big to broadcast exactly: a bloom over
    the key side's hashes is built DISTRIBUTED (per-block blooms of one
    shared geometry, OR-merged through the bounded ``summary_tree``),
    broadcast once (``ray.put``; workers read the bit array zero-copy),
    and probed vectorized per batch. Rows the bloom rejects are
    DEFINITELY absent from the key side — for a semi join they drop
    before any shuffle, so the exact verify (``bucket_semi``) moves
    only ``matches + fpr · non-matches`` rows instead of the whole
    input.

    ``exact=True`` (default) returns exactly ``bucket_semi``'s answer.
    ``exact=False`` skips the verify: a SEMI keeps ~``fpr`` of
    non-matching rows; an ANTI wrongly drops ~``fpr`` of its rows —
    acceptable only for best-effort prefilters, never for dedup gates.

    Both ``ds`` (anti) and ``keys_ds`` (exact) are consumed twice —
    pass re-executable pipelines (reads), not one-shot streams.
    ``capacity`` sizes the bloom; the default (``keys_ds.count()``
    rows, an upper bound on distinct keys) costs a THIRD execution of
    ``keys_ds`` unless the count resolves from read metadata — pass
    ``capacity`` explicitly when the key side is an expensive
    pipeline.

    MEMORY CONTRACT: the bit array moves whole through the build tree
    and the broadcast, so ``max_bits`` (default 2^30 ≈ 128 MiB, good
    for ~10^8 keys at 1 % fpr) clamps it. Past the clamp the bloom
    still never drops a true match — only the false-positive rate
    degrades (more rows reach the exact verify; ``exact=True`` output
    is unchanged). A key side so large that even a degraded bloom
    prunes nothing is ``bucket_semi`` territory."""
    import pyarrow as pa

    from .summaries import summary_tree
    from ..state.bloom import Bloom

    if capacity is None:
        capacity = max(int(keys_ds.count()), 1)
    proto = Bloom.for_capacity(capacity, fpr)
    m_bits, k_hashes = proto.m, proto.k
    if m_bits > max_bits:
        m_bits = int(max_bits)
        # re-derive k for the clamped geometry (k = m/n·ln2)
        k_hashes = min(16, max(1, round(m_bits / capacity * np.log(2))))

    def partial(b: pa.Table) -> pa.Table:
        bl = Bloom(m_bits, k_hashes)
        bl.add(_key_hashes(b[key]))
        return pa.table({"bits": pa.array([bl.bits.tobytes()],
                                          pa.large_binary())})

    def merge(b: pa.Table) -> pa.Table:
        acc = np.zeros((m_bits + 63) // 64, dtype=np.uint64)
        for raw in b["bits"].to_pylist():
            acc |= np.frombuffer(raw, dtype=np.uint64)
        return pa.table({"bits": pa.array([acc.tobytes()],
                                          pa.large_binary())})

    bits_row = summary_tree(keys_ds, partial, merge, fan_in=fan_in,
                            batch_format="pyarrow").take_all()
    # an empty key side yields no summary rows → empty bloom
    ref = ray.put(bits_row[0]["bits"] if bits_row
                  else np.zeros((m_bits + 63) // 64, np.uint64).tobytes())

    def probe(b: pa.Table, *, keep_hits: bool) -> pa.Table:
        bl = Bloom(m_bits, k_hashes)
        # zero-copy view of the shared plasma buffer (read-only is fine
        # for contains); no per-batch copy of the bit array
        bl.bits = np.frombuffer(ray.get(ref), dtype=np.uint64)
        hits = bl.contains(_key_hashes(b[key]))
        return b.filter(pa.array(hits if keep_hits else ~hits))

    if not exact:
        return ds.map_batches(probe, batch_format="pyarrow",
                              fn_kwargs={"keep_hits": not anti})
    possible = ds.map_batches(probe, batch_format="pyarrow",
                              fn_kwargs={"keep_hits": True})
    verified = bucket_semi(possible, keys_ds, key, anti=anti,
                           n_buckets=n_buckets)
    if not anti:
        return verified
    definite = ds.map_batches(probe, batch_format="pyarrow",
                              fn_kwargs={"keep_hits": False})
    return definite.union(verified)


# ------------------------------------------------- skew auto-detection
def detect_hot_keys(ds, on: str, *, threshold_frac: float | None = None,
                    n_buckets: int = 32, capacity: int | None = None,
                    fan_in: int = 32) -> np.ndarray:
    """Heavy-hitter values of integer column ``on`` — the keys worth
    salting in ``bucket_hash_join`` — found WITHOUT shuffling the keys:
    per-batch exact counts reduce to Misra-Gries summaries (mergeable,
    undercount ≤ N/(capacity+1) — Agarwal et al. PODS'12) that move
    through the bounded ``summary_tree``; the total row count N rides
    the same tree as a meta row, so hotness needs no second pass.

    Returns every key whose TRUE count can reach ``threshold_frac``·N
    (default ``1/(2·n_buckets)`` — half a bucket's fair share): the MG
    lower bound plus the undercount ceiling is compared against the
    threshold, so a genuinely hot key is never missed; a borderline
    cold key may be flagged, which only costs a little extra right-side
    replication (join output is identical either way)."""
    import pyarrow as pa

    from .summaries import summary_tree

    capacity = capacity or max(256, 16 * n_buckets)
    thr = threshold_frac if threshold_frac is not None \
        else 1.0 / (2 * n_buckets)

    from .summaries import mg_reduce

    def _reduce(df: pd.DataFrame) -> pd.DataFrame:
        return mg_reduce(df, capacity, count_col="n", tie_cols=("k",))

    from .blocks import df_arrow

    def partial(b: pa.Table) -> pa.Table:
        k = b[on].to_numpy(zero_copy_only=False).astype(np.int64)
        u, c = np.unique(k, return_counts=True)
        data = _reduce(pd.DataFrame({"k": u, "n": c.astype(np.int64)}))
        meta = pd.DataFrame({"k": [np.int64(0)], "n": [np.int64(len(k))]})
        return df_arrow(pd.concat([data.assign(is_meta=np.int8(0)),
                                   meta.assign(is_meta=np.int8(1))],
                                  ignore_index=True))

    def merge(t: pa.Table) -> pa.Table:
        b = t.to_pandas()
        meta_n = int(b.loc[b["is_meta"] == 1, "n"].sum())
        data = b[b["is_meta"] == 0].groupby("k", as_index=False)["n"].sum()
        out = _reduce(data).assign(is_meta=np.int8(0))
        meta = pd.DataFrame({"k": [np.int64(0)], "n": [np.int64(meta_n)],
                             "is_meta": [np.int8(1)]})
        return df_arrow(pd.concat([out, meta], ignore_index=True))

    summ = summary_tree(ds, partial, merge, fan_in=fan_in,
                        batch_format="pyarrow").take_all()
    frame = pd.DataFrame(summ)
    n_total = int(frame.loc[frame["is_meta"] == 1, "n"].sum())
    if n_total == 0:
        return np.empty(0, np.int64)
    data = frame[frame["is_meta"] == 0]
    ceiling = data["n"].to_numpy() + n_total / (capacity + 1)
    return np.sort(data.loc[ceiling >= thr * n_total, "k"]
                   .to_numpy().astype(np.int64))
