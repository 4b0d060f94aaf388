"""Standalone frontier-throughput microbenchmark.

The north metric names "frontier ops/sec on a 10^10-URL frontier" as a
first-class number, but the crawl bench's ``frontier_ops_per_sec`` is
BOUND by simulated fetch latency — it measures the whole crawl, not the
frontier data path. This module drives ONLY the per-round frontier
pipeline the crawl runs between fetches (``pipelines/crawl.py``
"dedup + cross-round seen check" → "seal"):

    candidates → ``dedup_min_seq`` (within-round exact keep-min-seq,
    bucketed shuffle) → ``SeenFilterClient(op="check")`` (cross-round
    anti-join against the sharded bloom+exact actors) →
    ``SeenFilterClient(op="add")`` (seal survivors)

over DETERMINISTIC synthetic candidate rows (realistic URL strings,
configurable within-round duplicate rate and cross-round revisit rate),
generated distributed via ``ray.data.range`` — the driver never holds a
row. Reported rows/sec is the per-node frontier throughput; the same
job at 8 vs 32 CPUs evidences the frontier's shuffle + actor-RPC path
scales independently of fetch concurrency (BASELINE.md records both).

Survivor counts are exactly predictable from the generator spec, so the
pytest pins correctness of the whole loop, not just its speed.
"""
from __future__ import annotations

import time

import numpy as np
import pyarrow as pa

from ..functions.hashing import hash64_array
from ..schema import pack_seq
from ..stages.seen import SeenFilterClient, dedup_min_seq, make_seen_actors

# each 1/DUP_EVERY-th row re-emits its predecessor's URL (within-round
# duplicate — dedup_min_seq must keep the smaller discovered_seq)
DUP_EVERY = 5


def _round_keys(n_rows: int, round_idx: int, revisit_frac: float) -> int:
    """First fresh key of a round: rounds advance by the non-revisited
    fraction, so ``revisit_frac`` of each round's keys were already
    sealed by the previous round (cross-round seen hits)."""
    return int(round_idx * n_rows * (1.0 - revisit_frac))


def synth_candidates(n_rows: int, round_idx: int,
                     revisit_frac: float = 0.3, n_blocks: int = 64,
                     key_offset: int = 0):
    """Deterministic candidate Dataset for one frontier round.

    Row ``i`` of the round maps to key ``base + i - (i % DUP_EVERY == 0
    and i > 0)`` — every DUP_EVERY-th row duplicates its neighbour's URL
    with a LARGER discovered_seq, so the dedup survivor set is exactly
    the distinct keys with their minimal seq. URL strings are realistic
    OLX ad paths (~70 bytes) so the shuffle moves honest payloads.
    ``key_offset`` shifts the whole key range (the warmup round uses it
    to stay disjoint from every timed round's keys).
    """
    import ray.data as rd

    base = key_offset + _round_keys(n_rows, round_idx, revisit_frac)
    # vectorized pack_seq(round_idx, 0, i): the per-row Python call
    # would sit inside the TIMED window and charge ~12M interpreter
    # frames per bench run to "frontier rows/sec" (review finding) —
    # bounds asserted once per round instead of per row
    assert 0 <= round_idx < (1 << 16) and n_rows < (1 << 24)
    seq_base = np.int64(round_idx) << np.int64(48)

    def gen(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        i = batch["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        key = base + i - ((i % DUP_EVERY == 0) & (i > 0)).astype(np.int64)
        # Arrow-kernel URL construction (lpad + one element-wise join):
        # 4M Python f-strings per round used to sit INSIDE the timed
        # window and charge interpreter time to "frontier rows/sec"
        n = len(i)
        urls = pc.binary_join_element_wise(
            pa.array(["https://www.olx.ua/d/obyavlenie/bench-item-"] * n),
            pc.utf8_lpad(pc.cast(pa.array(key, pa.int64()), pa.string()),
                         12, padding="0"),
            pa.array([".html"] * n), "")
        return pa.table({
            "url": urls,
            "url_hash": pa.array(hash64_array(urls), pa.uint64()),
            "depth": pa.array(np.ones(n, np.int32)),
            "priority": pa.array(np.ones(n, np.int32)),
            "discovered_seq": pa.array(seq_base | i, pa.int64()),
        })

    # explicit block count: rd.range's default packs 500k int64 rows
    # into one or two blocks, which would serialize the generator AND
    # every downstream map stage (task parallelism == block count)
    return rd.range(n_rows, override_num_blocks=n_blocks) \
        .map_batches(gen, batch_format="pyarrow")


def expected_survivors(n_rows: int, round_idx: int,
                       revisit_frac: float = 0.3) -> int:
    """Exact survivor count for round ``round_idx`` from the generator
    spec alone (the pytest oracle): distinct keys this round minus the
    keys already sealed by earlier rounds."""
    i = np.arange(n_rows, dtype=np.int64)
    adj = ((i % DUP_EVERY == 0) & (i > 0)).astype(np.int64)
    cur = np.unique(_round_keys(n_rows, round_idx, revisit_frac) + i - adj)
    if round_idx == 0:
        return len(cur)
    prev = np.unique(np.concatenate(
        [_round_keys(n_rows, r, revisit_frac) + i - adj
         for r in range(round_idx)]))
    return int(len(np.setdiff1d(cur, prev)))


def run_frontier_rounds(n_rows_per_round: int, n_rounds: int = 4,
                        n_shards: int = 16, revisit_frac: float = 0.3,
                        seen_mode: str = "both", warmup: bool = True,
                        n_blocks: int | None = None,
                        dedup_buckets: int | None = None) -> dict:
    """Drive ``n_rounds`` frontier rounds; returns throughput metrics
    plus per-round survivor counts (deterministic — pinned in pytest).

    EXCHANGE GRANULARITY TRACKS CORES (``n_blocks``/``dedup_buckets``
    default to the session's CPU count / half of it): the dedup
    shuffle's wall is dominated by per-block scheduling + object
    overhead once blocks shrink below ~10⁵ rows, so a fixed bucket
    count (the old 64) over-fragments small sessions and caps scaling
    — measured on this path, 64→CPU-proportional buckets cut the
    32-CPU round wall ~2× and lifted 8→32 efficiency from ~0.68 to
    ≥0.9 (BASELINE.md). At cluster scale the same rule reads "buckets
    ≈ total cores" (SCALE.md).

    ``warmup`` runs one small UNTIMED round first so Ray's worker-pool
    spin-up — a per-process cost a steady-state crawl pays once, not
    per round — doesn't land inside the timed window. Isolation from
    the timed rounds is double: throwaway actors AND a key_offset that
    puts the warmup keys past any timed round's range.

    Owns its seen actors and ALWAYS kills them (CLAUDE.md: never leave
    CPU-reserving actors alive in a shared session)."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 32))
    if n_blocks is None:
        n_blocks = max(8, cpus)          # one map wave per round
    if dedup_buckets is None:
        dedup_buckets = max(8, cpus // 2)   # reduce waves stay coarse
    total = n_rows_per_round * n_rounds
    seen = make_seen_actors(
        n_shards, capacity_per_shard=max(1024, 2 * total // n_shards))
    survivors: list[int] = []
    warm_actors = make_seen_actors(2, 65_536) if warmup else []
    try:
        if warmup:
            w = synth_candidates(20_000, 0, revisit_frac, n_blocks=64,
                                 key_offset=1 << 40)
            w = dedup_min_seq(w)
            w.map_batches(SeenFilterClient(warm_actors, op="check"),
                          batch_format="pyarrow", batch_size=None) \
             .map_batches(SeenFilterClient(warm_actors, op="add"),
                          batch_format="pyarrow", batch_size=None).count()
        t0 = time.monotonic()
        for r in range(n_rounds):
            cand = synth_candidates(n_rows_per_round, r, revisit_frac,
                                    n_blocks=n_blocks)
            cand = dedup_min_seq(cand, n_buckets=dedup_buckets)
            # batch_size=None → whole blocks: the client issues one RPC
            # per touched shard per BATCH, so block-sized batches cut
            # the actor round-trips 4-8× vs the default batch size
            fresh = cand.map_batches(
                SeenFilterClient(seen, op="check", mode=seen_mode),
                batch_format="pyarrow", batch_size=None)
            sealed = fresh.map_batches(SeenFilterClient(seen, op="add"),
                                       batch_format="pyarrow",
                                       batch_size=None)
            survivors.append(sealed.count())
        wall = time.monotonic() - t0
    finally:
        for a in seen + warm_actors:
            try:
                ray.kill(a)
            except Exception:
                pass
    return {
        "frontier_rows": total,
        "frontier_rounds": n_rounds,
        "frontier_survivors": survivors,
        "frontier_wall_sec": round(wall, 2),
        "frontier_rows_per_sec": round(total / wall, 1),
    }
