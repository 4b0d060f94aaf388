"""Arrow schemas for every engine table (SURVEY.md §1.2, FIXTURES.md).

The payload schema (``DOCUMENTS``) is the `input_hint` from
BASELINE.json, verbatim: interleaved text+media documents where each
scraped ad becomes an ordered span sequence.

Span emission order per ad page reproduces the reference extraction
order (reference ``DownloadAds.scala:46-55``):
``title, description, price, brief×k, image×m``.
"""

from __future__ import annotations

import pyarrow as pa

# ---------------------------------------------------------------- payload
SPAN = pa.struct(
    [
        ("kind", pa.string()),       # "title" | "description" | "price" | "brief" | "image"
        ("text", pa.string()),       # null for kind="image"
        ("media_ref", pa.string()),  # null for text kinds
        ("offset", pa.int32()),      # 0..n-1, document order, no gaps
    ]
)

DOCUMENTS = pa.schema(
    [
        ("doc_id", pa.string()),     # canonicalized ad URL
        ("spans", pa.list_(SPAN)),
    ]
)

# documents + engine bookkeeping kept OUT of the conformance surface
DOCUMENTS_FULL = pa.schema(
    list(DOCUMENTS)
    + [
        ("search_id", pa.int64()),       # FK to searches (reference H2.scala:53 LASTVAL())
        ("fetched_seq", pa.int64()),     # global total order the doc was fetched in
        ("round", pa.int32()),
    ]
)

# ------------------------------------------------------- synthetic network
PAGES = pa.schema(
    [
        ("url", pa.string()),            # canonical fetch URL
        ("kind", pa.string()),           # "listing" | "ad" | "robots" | "missing"
        ("html", pa.string()),           # "" for kind="missing"
        ("sim_latency_ms", pa.int32()),  # seeded per-page latency for the bench harness
        ("fetch_shard", pa.int32()),     # url_hash64 % N_PAGE_SHARDS (partitioned store)
    ]
)

# ------------------------------------------------------------------- jobs
SEEDS = pa.schema(
    [
        ("search_id", pa.int64()),       # deterministic ordinal (mimics H2 LASTVAL())
        ("name", pa.string()),
        ("url", pa.string()),            # seed listing URL
        ("max_count", pa.int32()),       # reference downloadAdsCount / take(n)
        ("started_at", pa.timestamp("us")),
    ]
)

# ---------------------------------------------------------------- frontier
FRONTIER = pa.schema(
    [
        ("url", pa.string()),
        ("url_hash", pa.uint64()),       # 64-bit hash of canonical URL (functions.hashing)
        ("host", pa.string()),
        ("host_shard", pa.int32()),      # salted: (hash(host)*S + url_hash%S) % n_gates
        ("depth", pa.int32()),           # 0 = seed listing, 1 = ad page, ...
        ("priority", pa.int64()),        # smaller = sooner
        ("discovered_seq", pa.int64()),  # (round, page_seq, position) packed total order
        ("status", pa.string()),         # pending|fetched|fetch_404|dropped_seen
        ("round", pa.int32()),
        ("search_id", pa.int64()),
    ]
)

# ------------------------------------------------------------------ state
SEEN_SEGMENTS = pa.schema(
    [
        ("shard", pa.int32()),
        ("bloom_bits", pa.large_binary()),
        ("exact_hashes", pa.large_binary()),  # uint64 LE array
        ("exact_alive", pa.bool_()),          # False = degraded bloom-only
        ("n_items", pa.int64()),
        ("seen_fmt", pa.int32()),             # bloom probe-derivation version
    ]
)

LINEAGE = pa.schema(
    [
        ("round", pa.int32()),
        ("partition_id", pa.int32()),
        ("stage", pa.string()),
        ("input_digest", pa.uint64()),
        ("output_digest", pa.uint64()),
        ("rows_in", pa.int64()),
        ("rows_out", pa.int64()),
        ("wall_ms", pa.int64()),
    ]
)


def pack_seq(round_: int, page_seq: int, position: int) -> int:
    """Pack (round, listing_page_seq, position_on_page) into one int64 total
    order: the engine's stand-in for the reference's sequential arrival
    order (reference DownloadAds.scala:26-28 processes links strictly in
    page order)."""
    assert 0 <= round_ < (1 << 16) and 0 <= page_seq < (1 << 24) and 0 <= position < (1 << 24)
    return (round_ << 48) | (page_seq << 24) | position


def unpack_seq(seq: int) -> tuple[int, int, int]:
    return (seq >> 48) & 0xFFFF, (seq >> 24) & 0xFFFFFF, seq & 0xFFFFFF
