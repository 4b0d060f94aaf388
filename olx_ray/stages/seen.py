"""Sharded URL-seen filter: stateful Ray actors + a map_batches client.

SURVEY.md T6 / D3 / J3. The seen set is split over ``n_shards`` actors
by ``url_hash % n_shards`` (stable routing regardless of cluster
size). Each shard holds a Bloom filter and — below an exact-set cap —
the exact uint64 hash set, so the same actors serve three modes:

- ``exact``: membership answered from the exact set (the oracle path);
- ``bloom``: membership from the Bloom filter only (the 10^10 scale
  path; false positives drop novel URLs at the configured fpr);
- ``both`` (default): exact while it fits, bloom always maintained —
  the property test asserts exact≡bloom on fixture data.

Determinism contract (SURVEY.md §7 "exact ordering under parallelism"):
actors only answer "seen in a PREVIOUS round?" during a round;
additions are sealed at the round barrier (``add`` called on the
already-deduped survivor set). Within-round duplicate resolution is a
deterministic shuffle (``dedup_min_seq``), not arrival order — so the
trace is identical at any parallelism.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..state.bloom import SEEN_FMT, Bloom


@ray.remote(num_cpus=0.1)
class SeenShard:
    """One shard of the URL-seen state. num_cpus=0.1: the work per call
    is a vectorized membership probe, far below a full core — and the
    shards must never starve the map stages' CPU budget (a fixed-size
    actor pool that can't get its CPUs deadlocks the whole pipeline)."""

    def __init__(self, shard_id: int, capacity: int = 1_000_000,
                 fpr: float = 1e-6, exact_cap: int = 5_000_000):
        self.shard_id = shard_id
        self.bloom = Bloom.for_capacity(capacity, fpr)
        # Exact store = sorted unique uint64 array + pending unmerged
        # chunks (folded in lazily before the next probe). Vectorized
        # searchsorted membership instead of a per-int Python set probe,
        # and 8 B/hash instead of ~60 B — at the 5M-hash exact_cap that
        # is 40 MB vs ~300 MB per shard, which is what makes 16+ shards
        # per node viable at 10^10-URL scale (SCALE.md "Seen filter").
        self._exact: np.ndarray | None = \
            np.empty(0, np.uint64) if exact_cap > 0 else None
        self._pending: list[np.ndarray] = []
        self._pending_n = 0
        self.exact_cap = exact_cap

    def _exact_merged(self) -> np.ndarray | None:
        """Fold pending adds into the sorted array; degrade to bloom-only
        once the UNIQUE count passes exact_cap (same contract as the old
        set store, just amortized: crawl rounds are check-heavy between
        sealed add barriers, so merges are rare)."""
        if self._exact is not None and self._pending:
            self._exact = np.unique(
                np.concatenate([self._exact, *self._pending]))
            self._pending.clear()
            self._pending_n = 0
            if len(self._exact) > self.exact_cap:
                self._exact = None  # graceful degrade to bloom-only
        return self._exact

    def contains(self, hashes: np.ndarray, mode: str = "both") -> np.ndarray:
        ex = self._exact_merged() if mode != "bloom" else None
        if mode == "exact" and ex is None:
            # the oracle path must FAIL loudly, not silently answer from
            # the bloom filter (false positives would drop novel URLs
            # while the caller believes membership is exact)
            raise RuntimeError(
                f"seen shard {self.shard_id}: exact mode requested but the "
                f"exact set degraded past exact_cap; use mode='both'/'bloom'")
        if ex is not None:
            h = np.asarray(hashes, np.uint64)
            found = np.zeros(len(h), dtype=bool)
            if len(ex):
                idx = np.searchsorted(ex, h)
                m = idx < len(ex)
                found[m] = ex[idx[m]] == h[m]
            return found
        return self.bloom.contains(hashes)

    def add(self, hashes: np.ndarray) -> int:
        self.bloom.add(hashes)
        if self._exact is not None:
            h = np.asarray(hashes, np.uint64)
            self._pending.append(h)
            self._pending_n += len(h)
            # cap the unmerged scratch (and keep the degrade decision
            # timely) without paying an O(n log n) merge on every add
            if self._pending_n > max(65_536, len(self._exact) // 4):
                self._exact_merged()
        return len(hashes)

    def segment(self) -> dict:
        """Checkpointable state (SEEN_SEGMENTS row). ``exact_alive``
        distinguishes an EMPTY exact set from the degraded bloom-only
        state — both serialize the hash payload as b""."""
        ex = self._exact_merged()
        exact_bytes = ex.tobytes() if ex is not None else b""
        return {"shard": self.shard_id, "bloom_bits": self.bloom.to_bytes(),
                "exact_hashes": exact_bytes,
                "exact_alive": ex is not None,
                "n_items": self.bloom.n_items,
                "seen_fmt": SEEN_FMT}

    def restore(self, segment: dict) -> None:
        raw = segment["exact_hashes"]
        alive = segment.get("exact_alive", bool(raw))
        # np.unique: older segments serialized the set in arbitrary order
        self._exact = np.unique(np.frombuffer(raw, dtype=np.uint64)) \
            if alive else None
        self._pending, self._pending_n = [], 0
        fmt = segment.get("seen_fmt")
        if fmt == SEEN_FMT:
            self.bloom = Bloom.from_bytes(segment["bloom_bits"])
            return
        # probe derivation changed since this segment was written: its
        # bloom_bits were SET under the old indices, so probing them with
        # the current derivation yields false negatives (re-crawls).
        # While the exact set survives, the bloom is REBUILT from it
        # (same m/k, current probes); a degraded bloom-only shard cannot
        # be trusted and the resume must fail loudly.
        if self._exact is None:
            raise RuntimeError(
                f"seen shard {self.shard_id}: checkpoint seen_fmt={fmt} != "
                f"current {SEEN_FMT} and the exact set already degraded — "
                f"bloom bits are not portable across probe derivations; "
                f"restart the crawl (or restore with the original engine "
                f"version)")
        old = Bloom.from_bytes(segment["bloom_bits"])
        self.bloom = Bloom(old.m, old.k)
        if len(self._exact):
            self.bloom.add(self._exact)

    def stats(self) -> dict:
        ex = self._exact_merged()
        return {"shard": self.shard_id, "n_items": self.bloom.n_items,
                "fill": self.bloom.fill_ratio(),
                "approx_count": self.bloom.approx_count(),
                "exact_n": len(ex) if ex is not None else -1}


def make_seen_actors(n_shards: int, capacity_per_shard: int = 1_000_000,
                     fpr: float = 1e-6) -> list:
    return [SeenShard.remote(i, capacity_per_shard, fpr)
            for i in range(n_shards)]


class SeenFilterClient:
    """map_batches stage: drops rows whose url_hash is already seen.

    Stateless-task-safe (actor handles serialize); routes each batch's
    hashes to shard actors, one RPC per touched shard, issued in
    parallel. ``op="check"`` filters; ``op="add"`` registers hashes and
    passes rows through (used at the round barrier on survivors)."""

    def __init__(self, actors: list, op: str = "check", mode: str = "both",
                 hash_col: str = "url_hash"):
        self.actors = actors
        self.n = len(actors)
        self.op = op
        self.mode = mode
        self.hash_col = hash_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        hashes = batch[self.hash_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        shards = (hashes % np.uint64(self.n)).astype(np.int64)
        if self.op == "add":
            refs = [self.actors[s].add.remote(hashes[shards == s])
                    for s in np.unique(shards)]
            ray.get(refs)
            return batch
        keep = np.ones(len(hashes), dtype=bool)
        uniq = np.unique(shards)
        refs = [self.actors[s].contains.remote(hashes[shards == s], self.mode)
                for s in uniq]
        for s, seen in zip(uniq, ray.get(refs)):
            idx = np.nonzero(shards == s)[0]
            keep[idx[seen]] = False
        return batch.filter(pa.array(keep))


def dedup_min_seq(ds, key: str = "url_hash", seq: str = "discovered_seq",
                  mode: str = "bucketed", n_buckets: int = 64):
    """Deterministic within-round exact dedup: keep, per key, the row with
    the smallest ``seq`` (first discovery in the LOGICAL order — not
    arrival order, so any parallelism yields the same survivors).

    ``mode="bucketed"`` (default): one key-hash bucket column + groupby
    shuffle; each bucket task keeps its keys' min-seq rows with a
    vectorized pandas idxmin — fully distributed, nothing driver-sized,
    the 100 TB path.

    ``mode="driver"``: vectorized per-batch partial mins merged into one
    driver dict, then a broadcast keep-min filter. Saves the shuffle but
    the dict is O(distinct keys this round) — only sound for
    budget-bounded rounds. The input is materialized first so the
    upstream lineage executes once, not once per traversal."""
    import pandas as pd

    if mode == "bucketed":
        from ..functions.hashing import bucket_of

        def add_bucket(b: pa.Table) -> pa.Table:
            # the shared fmix64 partitioner, like every other bucketed
            # op (the key is already a blake2b url hash, but raw modulo
            # partitioning is the one pattern the codebase bans)
            k = b[key].to_numpy(zero_copy_only=False).astype(np.int64)
            return b.append_column(
                "_kb", pa.array(bucket_of(k, n_buckets), pa.int32()))

        def keep_min(g: pd.DataFrame) -> pd.DataFrame:
            idx = g.groupby(key)[seq].idxmin()
            return g.loc[idx.sort_values()].drop(columns=["_kb"])

        return ds.map_batches(add_bucket, batch_format="pyarrow") \
            .groupby("_kb").map_groups(keep_min, batch_format="pandas")

    def partial_min(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({key: b[key].to_numpy(zero_copy_only=False),
                           seq: b[seq].to_numpy(zero_copy_only=False)})
        g = df.groupby(key, as_index=False)[seq].min()
        return pa.table({key: pa.array(g[key].to_numpy().astype(np.uint64),
                                       pa.uint64()),
                         seq: pa.array(g[seq].to_numpy(), pa.int64())})

    ds = ds.materialize()   # two traversals below — execute lineage once
    table: dict[int, int] = {}
    for r in ds.map_batches(partial_min, batch_format="pyarrow").take_all():
        k, s = int(r[key]), int(r[seq])
        if k not in table or s < table[k]:
            table[k] = s
    ref = ray.put(table)

    class KeepMin:
        def __init__(self):
            self.mins = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ks = batch[key].to_numpy(zero_copy_only=False)
            ss = batch[seq].to_numpy(zero_copy_only=False)
            m = self.mins
            keep = np.fromiter((int(s) == m[int(k)] for k, s in zip(ks, ss)),
                               dtype=bool, count=len(ks))
            return batch.filter(pa.array(keep))

    return ds.map_batches(KeepMin, batch_format="pyarrow",
                          concurrency=(1, 4), num_cpus=0.5)
