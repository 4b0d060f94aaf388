"""Vectorized numpy Bloom filter over 64-bit key hashes.

The crawl's URL-seen filter state (SURVEY.md T6). One filter instance
is one SHARD: keys are routed to shards by ``hash % n_shards`` before
they get here, so sizing is per-shard. At the north-star scale
(10^10 URLs, 1% fpr → ~12 GiB of bits total) the filter is split
across ≥16 shards held by stateful actors and checkpointed as
``seen_segments`` rows; at test scale the same code runs with small
``m``.

Index derivation uses standard double hashing (Kirsch–Mitzenmacher):
``idx_i = (h1 + i*h2) mod m`` with h1 the FULL 64-bit key hash and h2
an odd 64-bit mix of it — both must span 64 bits because a per-shard
filter at the north-star scale exceeds 2^32 bits (6e9 bits/shard at
10^10 keys over 16 shards), and 32-bit probe components would confine
probe i to the first (i+1)·2^32 bits, skewing placement and inflating
the realized fpr. No per-probe rehash, fully vectorized per batch.
"""

from __future__ import annotations

import numpy as np

# Probe-derivation format version, persisted with every seen-segment
# checkpoint (SEEN_SEGMENTS.seen_fmt). Bump whenever ``_indices`` changes
# — serialized bloom_bits set under an older derivation would silently
# answer false negatives if probed with a newer one. v2 = full-64-bit
# h1/h2 double hashing (v1 was 32-bit components).
SEEN_FMT = 2


class Bloom:
    def __init__(self, m_bits: int, k: int = 7):
        assert m_bits > 64
        self.m = int(m_bits)
        self.k = int(k)
        self.bits = np.zeros((self.m + 63) // 64, dtype=np.uint64)
        self.n_items = 0

    @staticmethod
    def for_capacity(n: int, fpr: float = 0.01) -> "Bloom":
        """Size for ``n`` expected keys at target false-positive rate."""
        m = max(128, int(-n * np.log(fpr) / (np.log(2) ** 2)))
        k = max(1, round((m / max(n, 1)) * np.log(2)))
        return Bloom(m, min(k, 16))

    def _indices(self, hashes: np.ndarray) -> np.ndarray:
        h = hashes.astype(np.uint64)
        h1 = h
        h2 = (h * np.uint64(0x9E3779B97F4A7C15)) | np.uint64(1)  # odd 64-bit
        i = np.arange(self.k, dtype=np.uint64)[:, None]
        # uint64 wraparound before mod m: standard double-hash practice
        return (h1[None, :] + i * h2[None, :]) % np.uint64(self.m)  # (k, n)

    def add(self, hashes: np.ndarray) -> int:
        """Set the probe bits; returns (and counts) only PROBABLY-NEW
        keys. Counting pre-probe misses instead of len(hashes) keeps
        ``n_items`` a distinct-keys estimate AND makes a retried task's
        re-add of the same batch a state no-op (task-retry idempotence;
        see tests/test_retry_idempotence.py)."""
        # unique first: a batch repeating one hash (same link on many
        # pages) must count it once — contains() is evaluated before
        # any bit is set, so raw duplicates would each score as "new"
        hashes = np.unique(hashes)
        n_new = int((~self.contains(hashes)).sum())
        idx = self._indices(hashes).ravel()
        np.bitwise_or.at(self.bits, (idx >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (idx & np.uint64(63)))
        self.n_items += n_new
        return n_new

    def contains(self, hashes: np.ndarray) -> np.ndarray:
        """Boolean mask: possibly-seen (true) / definitely-new (false)."""
        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        idx = self._indices(hashes)  # (k, n)
        words = self.bits[(idx >> np.uint64(6)).astype(np.int64)]
        hit = (words >> (idx & np.uint64(63))) & np.uint64(1)
        return hit.all(axis=0)

    # ------------------------------------------------------ serialization
    def to_bytes(self) -> bytes:
        header = np.array([self.m, self.k, self.n_items], dtype=np.uint64)
        return header.tobytes() + self.bits.tobytes()

    @staticmethod
    def from_bytes(raw: bytes) -> "Bloom":
        header = np.frombuffer(raw[:24], dtype=np.uint64)
        b = Bloom(int(header[0]), int(header[1]))
        b.n_items = int(header[2])
        b.bits = np.frombuffer(raw[24:], dtype=np.uint64).copy()
        return b

    def fill_ratio(self) -> float:
        """Fraction of set bits — doubles as a cheap approximate distinct
        counter (SURVEY.md A4): n ≈ -m/k * ln(1 - fill)."""
        set_bits = int(np.unpackbits(self.bits.view(np.uint8)).sum())
        return set_bits / self.m

    def approx_count(self) -> float:
        f = min(self.fill_ratio(), 0.999999)
        return -self.m / self.k * float(np.log(1.0 - f))
