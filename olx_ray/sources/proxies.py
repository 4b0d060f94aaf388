"""Free-proxy sources (S6/S7) + proxy transforms (M7/M8).

The reference scrapes sslproxies.org's ``.fpl-list`` table with
Selenium (``GetFreeProxies.scala:11-19``) and alternatively parses a
CSV (``FreeProxy.scala:26-49``). Here:

- ``parse_proxy_table(html)`` — the table scrape re-expressed over the
  engine's own HTML parser: each ``table tr`` with 8 ``td`` cells →
  one record (``FreeProxy.scala:51-60``).
- ``decode_last_checked`` — M7: ``lastChecked`` parsed from
  ``"N units ago"`` via regex ``(\\d+ \\S+)`` and a duration parse,
  then **ADDED** to now — the reference's sign bug
  (``FreeProxy.scala:62-67``: ages land in the future), replicated
  bug-for-bug; pass ``fixed=True`` for the subtraction.
- ``read_proxies_csv`` — S7: ``ray.data.read_csv`` with the explicit
  8-column schema (commons-csv positional semantics).
- ``elite_https`` — M8: ``https == "yes" AND anonymity ==
  "elite proxy"`` (``GetFreeProxies.scala:17-18``), a vectorized batch
  filter.
"""

from __future__ import annotations

import datetime
import re

import pyarrow as pa

from ..functions import htmlparse as hp

PROXY_SCHEMA = pa.schema([
    ("ip_address", pa.string()),
    ("port", pa.int32()),
    ("code", pa.string()),
    ("country", pa.string()),
    ("anonymity", pa.string()),
    ("google", pa.string()),
    ("https", pa.string()),
    ("last_checked", pa.string()),   # raw "N units ago" text
])

_REL_RE = re.compile(r"(\d+ \S+)")

_UNIT_SECONDS = {
    # full Scala-Duration alias set (the reference parses these chunks
    # with Duration(_)): s/sec/secs, m/min/mins, h/hr/hrs, d — a site
    # emitting "1 hr ago" must decode as 3600 s, not silently 0
    "s": 1, "sec": 1, "secs": 1, "second": 1, "seconds": 1,
    "m": 60, "min": 60, "mins": 60, "minute": 60, "minutes": 60,
    "h": 3600, "hr": 3600, "hrs": 3600, "hour": 3600, "hours": 3600,
    "d": 86400, "day": 86400, "days": 86400,
}


def decode_last_checked(text: str, now: datetime.datetime,
                        *, fixed: bool = False) -> datetime.datetime:
    """M7: regex-extract every "N unit" chunk, sum as a duration, then
    ADD to now (reference sign bug) unless ``fixed``.

    A chunk with an unrecognized unit contributes 0 (the robust choice
    for scraped text; the reference's Duration parse would THROW there
    and kill the scrape — divergence documented, same policy as the
    proxy-row skip in ``parse_proxy_table``)."""
    total = 0.0
    for chunk in _REL_RE.findall(text or ""):
        n, unit = chunk.split(" ", 1)
        total += int(n) * _UNIT_SECONDS.get(unit.rstrip(".,").lower(), 0)
    delta = datetime.timedelta(seconds=total)
    return now - delta if fixed else now + delta


def parse_proxy_table(html: str) -> pa.Table:
    """S6: ``.fpl-list`` table rows → PROXY_SCHEMA records. Rows without
    exactly 8 cells, a non-integer port, or a port outside 0..65535 are
    skipped (the reference would raise mid-stream — toInt / the Arrow
    int32 cast; the engine records clean rows only)."""
    doc = hp.parse_html(html)
    # the reference selects by CLASS regardless of element
    # (GetFreeProxies.scala): accept the class on the table itself or on
    # any container; fall back to the first document table only if the
    # class is absent entirely
    containers = hp.select(doc, ".fpl-list")
    tables = []
    for c in containers:
        tables.extend([c] if c.tag == "table" else hp.select(c, "table"))
    if not tables:
        tables = hp.select(doc, "table")
    rows: dict[str, list] = {f.name: [] for f in PROXY_SCHEMA}
    for table in tables[:1]:
        for tr in hp.select(table, "tr"):
            cells = [td.text() for td in hp.select(tr, "td")]
            if len(cells) != 8:
                continue
            try:
                port = int(cells[1])
            except ValueError:
                continue
            if not 0 <= port <= 65535:
                continue
            vals = [cells[0], port, cells[2], cells[3], cells[4],
                    cells[5], cells[6], cells[7]]
            for f, v in zip(PROXY_SCHEMA, vals):
                rows[f.name].append(v)
    return pa.table({f.name: pa.array(rows[f.name], f.type)
                     for f in PROXY_SCHEMA}, schema=PROXY_SCHEMA)


def read_proxies_csv(path: str):
    """S7: CSV → Dataset with the explicit positional schema."""
    import ray.data as rd
    from pyarrow import csv as pacsv

    return rd.read_csv(
        path,
        read_options=pacsv.ReadOptions(
            column_names=[f.name for f in PROXY_SCHEMA]),
        convert_options=pacsv.ConvertOptions(
            column_types={f.name: f.type for f in PROXY_SCHEMA}),
    )


def elite_https(ds):
    """M8: keep rows with https == "yes" AND anonymity == "elite proxy"."""
    import pyarrow.compute as pc

    def fn(b: pa.Table) -> pa.Table:
        return b.filter(pc.and_(pc.equal(b["https"], "yes"),
                                pc.equal(b["anonymity"], "elite proxy")))

    return ds.map_batches(fn, batch_format="pyarrow")
