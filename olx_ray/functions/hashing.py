"""64-bit content hashing for URL identity, dedup and shard routing.

SURVEY.md specs ``xxhash64``; the ``xxhash`` wheel is not installed in
this sandbox, so the engine standardizes on BLAKE2b-64 (``hashlib``, C
speed, stable across processes/versions — which pure-Python xxhash
would match only at ~20× the cost). The property the engine relies on
is only: a stable, well-mixed 64-bit hash with negligible collision
probability at 10^10 keys (birthday expectation ≈ n²/2^65 ≈ 2.7
colliding pairs at n=10^10 — acceptable for crawl dedup, the same
trade-off xxhash64 makes).

Shard routing is ``hash64 % n_shards`` — stable across cluster sizes as
long as n_shards is fixed at init (SURVEY.md §4.2 "dedup state").
"""

from __future__ import annotations

from hashlib import blake2b

import numpy as np
import pyarrow as pa

_MASK = (1 << 64) - 1


def hash64(s: str | bytes) -> int:
    """Stable 64-bit hash of a string (BLAKE2b-8, little-endian)."""
    if isinstance(s, str):
        s = s.encode("utf-8", "surrogatepass")
    return int.from_bytes(blake2b(s, digest_size=8).digest(), "little")


def hash64_array(values) -> np.ndarray:
    """Vectorized-ish batch hash: accepts a pyarrow StringArray /
    ChunkedArray, numpy array or list of str; returns uint64 ndarray.
    The per-item cost is one C blake2b call (~0.3 µs) — the loop is over
    a batch, never over the whole dataset."""
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if isinstance(values, pa.Array):
        values = values.to_pylist()
    out = np.empty(len(values), dtype=np.uint64)
    _h = blake2b
    for i, s in enumerate(values):
        if s is None:
            out[i] = 0
        else:
            out[i] = int.from_bytes(
                _h(s.encode("utf-8", "surrogatepass") if isinstance(s, str) else s,
                   digest_size=8).digest(),
                "little",
            )
    return out


def mix64(keys: np.ndarray, seed: int = 0) -> np.ndarray:
    """Full murmur3-fmix64 of an integer array (optionally seeded):
    uniform uint64 priorities for deterministic sampling and shard
    routing. ``bucket_of`` is exactly ``mix64 % n_buckets``."""
    h = keys.astype(np.uint64, copy=False) ^ np.uint64(seed & _MASK)
    h = h ^ (h >> np.uint64(33))
    h = h * np.uint64(0xFF51AFD7ED558CCD)
    h = h ^ (h >> np.uint64(33))
    h = h * np.uint64(0xC4CEB9FE1A85EC53)
    h = h ^ (h >> np.uint64(33))
    return h


def bucket_of(keys: np.ndarray, n_buckets: int) -> np.ndarray:
    """KEY-HASH bucket ids for integer keys: xor-shift + multiply +
    xor-shift (murmur3-fmix style) BEFORE the modulo. A raw
    ``key % n_buckets`` — or even an odd-constant multiply alone —
    leaves the low bits a function of the key's low bits, so strided /
    shard-tagged id spaces (snowflake ids, ids stepped by a multiple of
    n_buckets) collapse into one bucket task. Shared by every bucketed
    aggregate/join partitioner; bucket assignment is pure partitioning,
    results never depend on it."""
    # full fmix64: one mixing round is not avalanche for big strides
    return (mix64(keys) % np.uint64(n_buckets)).astype(np.int32)


def digest_u64(arr: np.ndarray) -> int:
    """Order-insensitive 64-bit digest of a uint64 array (sum mod 2^64) —
    used for per-partition lineage digests (LINEAGE schema): cheap,
    mergeable across partitions, order-independent so retries/shuffles
    don't change it."""
    return int(np.sum(arr.astype(np.uint64), dtype=np.uint64)) & _MASK


def append_bucket(col: str, n_buckets: int, name: str = "_bucket"):
    """Batch fn appending an int32 key-hash bucket column — the shared
    bucketizer of the iterative dataflow engines (connected components,
    pagerank) and any groupby-by-bucket pipeline."""
    def fn(b: pa.Table) -> pa.Table:
        import numpy as np

        k = b[col].to_numpy(zero_copy_only=False).astype(np.int64)
        return b.append_column(
            name, pa.array(bucket_of(k, n_buckets), pa.int32()))
    return fn


def knuth_fingerprint32(ids: np.ndarray) -> np.ndarray:
    """Knuth multiplicative fingerprint mod 2^32 — THE engine↔SQL
    deterministic id hash (``(id::HUGEINT * 2654435761) % 4294967296``
    on the oracle side): the uint64 product wraps mod 2^64, and
    wrap-then-mod-2^32 equals the exact product mod 2^32 for any id,
    so both sides agree bit-for-bit. One copy shared by the corpus
    splits (`corpus._split_fingerprint`, % 100 on top) and
    `sampling.source_quota_sample` (raw priority) — their docstrings
    pin "same construction"; importing it makes that true by code.

    Precondition: ids must be NON-NEGATIVE. numpy ``astype(uint64)``
    wraps a negative id mod 2^64 while DuckDB's HUGEINT ``%`` returns a
    NEGATIVE remainder, so a negative id would silently diverge engine
    vs oracle — asserted here rather than documented-only because the
    helper is shared by three operators."""
    if len(ids) and int(ids.min()) < 0:
        raise ValueError(
            "knuth_fingerprint32 requires non-negative ids (engine/SQL "
            f"parity breaks on negatives); got min={int(ids.min())}")
    return (ids.astype(np.uint64) * np.uint64(2654435761)) \
        % np.uint64(4294967296)
