"""Crawl-job ingestion: the reference's HTML-form job source (S5/M6).

``search_from_form`` replicates ``Search.fromUrlForm``
(reference ``package.scala:21-31``) over a parsed form dict:

- ``read(field)`` = FIRST value of the first matching key (M6,
  ``package.scala:22-23``);
- ``url`` optional, whitespace-stripped (``:24``);
- ``count`` parsed with Java ``toInt``-inside-``Try`` semantics: any
  parse failure → the whole job is rejected (``:25``);
- missing ``name`` or ``count`` → ``None`` (``:26-29``);
- ``started_at`` stamped by the caller (the reference stamps
  ``LocalDateTime.now()`` ``:28`` — kept injectable for determinism).

``seeds_from_forms`` assigns monotone ``search_id``s (mimicking H2
``LASTVAL()``, reference ``H2.scala:53``) and yields the SEEDS table the
crawl consumes.
"""

from __future__ import annotations

import datetime
from dataclasses import dataclass

import pyarrow as pa

from ..schema import SEEDS


@dataclass
class Search:
    name: str
    url: str | None
    download_ads_count: int
    time: datetime.datetime


def _read_field(form: dict[str, list[str] | str], field: str) -> str | None:
    """M6: first value of the first matching key."""
    if field not in form:
        return None
    v = form[field]
    if isinstance(v, str):
        return v
    return v[0] if v else None


def _java_to_int(s: str) -> int | None:
    """Java ``Integer.parseInt`` semantics: optional sign, decimal
    digits — no whitespace, no underscores, no floats — and the 32-bit
    Integer range (parseInt throws on overflow → job rejected, not a
    crash in the Arrow int32 cast downstream). ``isdecimal`` (Unicode
    Nd), not ``isascii``+``isdigit``: Java's Character.digit accepts
    non-ASCII decimal digits (e.g. Arabic-Indic) and rejects the
    superscripts that Python's ``isdigit`` lets through — both of
    which ``int()`` also honors."""
    s2 = s[1:] if s[:1] in "+-" else s
    if not s2 or not s2.isdecimal():
        return None
    try:
        v = int(s)
    except ValueError:
        return None
    return v if -(1 << 31) <= v < (1 << 31) else None


def search_from_form(form: dict, *, now: datetime.datetime | None = None) -> Search | None:
    url = _read_field(form, "url")
    url = url.strip() if url is not None else None
    count_raw = _read_field(form, "count")
    count = _java_to_int(count_raw) if count_raw is not None else None
    name = _read_field(form, "name")
    if name is None or count is None:
        return None
    return Search(name, url, count,
                  now or datetime.datetime(2024, 12, 20))


def seeds_from_forms(forms: list[dict], *,
                     now: datetime.datetime | None = None) -> pa.Table:
    """Validated forms → SEEDS table; jobs without a url are rejected
    here (the reference substituted the live-browser URL — S4/M9,
    dropped: seeds must be explicit, SURVEY.md §2.1)."""
    searches = [s for s in (search_from_form(f, now=now) for f in forms)
                if s is not None and s.url]
    return pa.table({
        "search_id": pa.array(range(1, len(searches) + 1), pa.int64()),
        "name": pa.array([s.name for s in searches]),
        "url": pa.array([s.url for s in searches]),
        "max_count": pa.array([s.download_ads_count for s in searches],
                              pa.int32()),
        "started_at": pa.array([s.time for s in searches], pa.timestamp("us")),
    }, schema=SEEDS)
