"""Cap telemetry — the "no silent caps" rule.

Several operators bound pathological inputs with caps that SHAPE the
answer rather than fail it: the LSH band self-join stars (instead of
fully enumerating) any band key shared by >256 docs
(``dedup.band_candidates``), and the interleaved media leg excludes
refs shared by >``hot_ref_cap`` docs (``spans._neardup_pairs_uids``).
Correct by design — but a run whose answer was shaped by a cap must
SAY so, or mass-duplicate/boilerplate corpora silently look clean.

The wired operators thread per-bucket capped-key counts through their
existing shuffles (tagged rows — no extra stage) and, on the driver,
fold the bucket-bounded totals into this registry after their
materialize step. Read with ``last(op)`` right after the operator
call; counts are per-call (the most recent run wins), driver-local,
and never ship to workers.

Wired: ``minhash_lsh_pairs`` (``capped_band_keys``),
``interleaved_neardup_pairs``/``_groups`` and
``interleaved_neardup_incremental`` (``capped_refs``).
"""

from __future__ import annotations

_CAPS: dict[str, dict] = {}


def record(op: str, **counts) -> None:
    """Overwrite ``op``'s latest cap counts (driver-side only)."""
    _CAPS[op] = dict(counts)


def last(op: str) -> dict | None:
    """The most recent run's cap counts for ``op`` (None: never ran)."""
    return _CAPS.get(op)
