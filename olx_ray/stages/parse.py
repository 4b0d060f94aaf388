"""Stateless parse stages: ad page → span document, listing page → links.

These are the engine's core ``map_batches`` kernels
(``batch_format="pyarrow"``, zero-copy in): one call handles a whole
Arrow batch of HTML pages; the per-document work is inherently
per-document (same as the reference's Jsoup pass,
``DownloadAds.scala:43-58``).

Conformance semantics implemented bug-for-bug (SURVEY.md §7):

- Q1: ``description`` uses the SAME selector as ``title``
  (``div[data-cy='ad_title']``, reference ``DownloadAds.scala:46-47``), so
  description == title. ``native=True`` fixes it (selects
  ``div[data-cy='ad_description']``, falling back to the title).
- brief lines: Java ``String.split(":")`` semantics — trailing empty
  segments dropped, only segment index 1 kept as value, missing value →
  literal ``"true"``; entries with empty key or value dropped; duplicate
  keys collapse last-value-wins at first-occurrence position
  (Scala small-Map insertion order, reference ``DownloadAds.scala:49-54``).
- brief span text renders as ``"k -> v"`` (reference ``H2.scala:60``
  ``mkString("; ")`` element form).
- listing links: raw-href ``distinct`` (order-preserving, first-wins)
  BEFORE absolutization (reference ``DownloadLinks.scala:49``);
  absolutization replaces only the path of the page URL (``:47-49``).
- next-page: ``attr("href")`` of the pagination selector; empty → null
  (reference ``DownloadLinks.scala:43-45``).
"""

from __future__ import annotations

import pyarrow as pa

from ..functions import htmlparse as hp
from ..functions.urls import absolutize
from ..schema import SPAN

_SEL_TITLE = "div[data-cy='ad_title']"
_SEL_DESC_NATIVE = "div[data-cy='ad_description']"
_SEL_PRICE = "div[data-testid='ad-price-container']"
_SEL_BRIEF = "div#mainContent ul>li>p"
_SEL_CARD_LINKS = "div[data-testid='l-card'][data-cy='l-card'] a"
_SEL_NEXT = "a[data-cy='pagination-forward'][data-testid='pagination-forward']"


def java_split_colon(s: str) -> list[str]:
    """Java ``String.split(":")``: trailing empty strings removed — an
    ALL-empty-segment input collapses to the EMPTY array (``":"`` and
    ``"::"`` → ``[]``), while the empty input is Java's special case
    yielding ``[""]``."""
    if s == "":
        return [""]
    parts = s.split(":")
    while parts and parts[-1] == "":
        parts.pop()
    return parts


def _no_carry_collision(carried, computed) -> None:
    """Carried-column pass-through must never clobber a computed output
    column (silently emitting stale data); fail loud instead."""
    clash = sorted(set(carried) & set(computed))
    if clash:
        raise ValueError(
            f"carried column(s) {clash} collide with computed parse "
            "output columns — rename them upstream")


def parse_brief(texts: list[str]) -> list[tuple[str, str]]:
    """Reference DownloadAds.scala:49-54 over the ``<p>`` texts: returns
    ordered (key, value) pairs after filtering + last-wins dedup.

    Divergence (documented fix, like proxies' ``fixed=``): on an
    all-colon ``<p>`` (text ``":"``), Java ``split(":")`` returns a
    length-0 array and the reference's ``(0)`` access throws
    ArrayIndexOutOfBounds, killing the job; the engine skips the line
    and continues."""
    pos: dict[str, int] = {}
    out: list[list[str]] = []
    for t in texts:
        parts = java_split_colon(t)
        if not parts:        # reference dies here (AIOOBE); see above
            continue
        k = parts[0]
        v = parts[1] if len(parts) > 1 else "true"
        if not k or not v:
            continue
        if k in pos:
            out[pos[k]][1] = v  # last value wins, keeps first position
        else:
            pos[k] = len(out)
            out.append([k, v])
    return [(k, v) for k, v in out]


def ad_to_spans(html: str, *, native: bool = False) -> list[dict]:
    """One ad page → ordered span dicts (title, description, price,
    brief×k, image×m — reference extraction order DownloadAds.scala:46-55)."""
    doc = hp.parse_html(html)
    title = hp.text(hp.select(doc, _SEL_TITLE))
    if native:
        d = hp.text(hp.select(doc, _SEL_DESC_NATIVE))
        description = d if d else title
    else:
        description = title  # Q1, bug-for-bug
    price = hp.text(hp.select(doc, _SEL_PRICE))
    briefs = parse_brief([e.text() for e in hp.select(doc, _SEL_BRIEF)])
    images = [e.attrs["src"] for e in hp.select(doc, "img") if e.attrs.get("src")]

    spans: list[dict] = []

    def emit(kind: str, text_: str | None, ref: str | None) -> None:
        spans.append({"kind": kind, "text": text_, "media_ref": ref,
                      "offset": len(spans)})

    emit("title", title, None)
    emit("description", description, None)
    emit("price", price, None)
    for k, v in briefs:
        emit("brief", f"{k} -> {v}", None)
    for src in images:
        emit("image", None, src)
    return spans


class ParseAds:
    """map_batches kernel: (url, html, …) → (doc_id, spans, …carried cols).

    Used as a stateless function-like callable; instantiating with
    ``native=True`` flips Q1 off. Carried columns (anything besides
    url/html) pass through untouched so the crawl loop can keep
    ``search_id`` / ``discovered_seq`` without a join.
    """

    def __init__(self, native: bool = False, url_col: str = "url",
                 html_col: str = "html"):
        self.native = native
        self.url_col = url_col
        self.html_col = html_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        htmls = batch[self.html_col].to_pylist()
        spans = pa.array(
            [ad_to_spans(h or "", native=self.native) for h in htmls],
            type=pa.list_(SPAN),
        )
        cols = {"doc_id": batch[self.url_col], "spans": spans}
        carried = [n for n in batch.column_names
                   if n not in (self.url_col, self.html_col)]
        _no_carry_collision(carried, cols)
        for name in carried:
            cols[name] = batch[name]
        return pa.table(cols)


class ParseListingsFull:
    """map_batches kernel: one pass per listing page emitting BOTH link
    rows and page metadata (next_page, n_links repeated per row; a page
    with zero cards emits one sentinel row with position = -1) so the
    crawl loop parses each page exactly once. Carried columns pass
    through per row."""

    def __init__(self, url_col: str = "url", html_col: str = "html"):
        self.url_col = url_col
        self.html_col = html_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        carried = [n for n in batch.column_names
                   if n not in (self.url_col, self.html_col)]
        cols: dict[str, list] = {k: [] for k in
                                 ("url", "href_raw", "position", "page_url",
                                  "next_page", "n_links")}
        _no_carry_collision(carried, cols)
        src_idx: list[int] = []   # source row per emitted row — carried
        #                           cols come via ONE Arrow take, never
        #                           per-cell .as_py() in the hot kernel

        def emit(i, url, raw, pos, purl, nxt, n_links):
            cols["url"].append(url)
            cols["href_raw"].append(raw)
            cols["position"].append(pos)
            cols["page_url"].append(purl)
            cols["next_page"].append(nxt)
            cols["n_links"].append(n_links)
            src_idx.append(i)

        for i, (purl, html) in enumerate(zip(batch[self.url_col].to_pylist(),
                                             batch[self.html_col].to_pylist())):
            links, raws, nxt = parse_listing_raw(html or "", purl)
            if not links:
                emit(i, "", "", -1, purl, nxt, 0)
            for pos, (link, raw) in enumerate(zip(links, raws)):
                emit(i, link, raw, pos, purl, nxt, len(links))
        out = {
            "url": pa.array(cols["url"], pa.string()),
            "href_raw": pa.array(cols["href_raw"], pa.string()),
            "position": pa.array(cols["position"], pa.int32()),
            "page_url": pa.array(cols["page_url"], pa.string()),
            "next_page": pa.array(cols["next_page"], pa.string()),
            "n_links": pa.array(cols["n_links"], pa.int32()),
        }
        if carried:
            taken = batch.select(carried).take(pa.array(src_idx, pa.int64()))
            for n in carried:
                out[n] = taken[n]
        return pa.table(out)


def parse_listing_raw(html: str, page_url: str) -> tuple[list[str], list[str], str | None]:
    """One listing page → (absolutized hrefs, raw distinct hrefs,
    next_page). Raw hrefs kept so native mode can re-resolve them with
    proper RFC-3986 semantics instead of the reference's path-replace."""
    doc = hp.parse_html(html)
    next_page = hp.attr(hp.select(doc, _SEL_NEXT), "href") or None
    raw = [e.attrs.get("href", "") for e in hp.select(doc, _SEL_CARD_LINKS)]
    seen: set[str] = set()
    distinct: list[str] = []
    for h in raw:  # D1: first-wins distinct on RAW hrefs, before absolutize
        if h not in seen:
            seen.add(h)
            distinct.append(h)
    return [absolutize(page_url, h) for h in distinct], distinct, next_page


def parse_listing(html: str, page_url: str) -> tuple[list[str], str | None]:
    """Reference-semantics listing parse (M3/M4/M5/D1)."""
    links, _, next_page = parse_listing_raw(html, page_url)
    return links, next_page


class ParseListings:
    """map_batches kernel: listing (url, html, …) → exploded link rows.

    Output: one row per extracted href with columns
    (url, position, page_url, next_page, …carried cols). ``next_page``
    repeats on every row of its page (consumers take the first).
    """

    def __init__(self, url_col: str = "url", html_col: str = "html"):
        self.url_col = url_col
        self.html_col = html_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        carried = [n for n in batch.column_names
                   if n not in (self.url_col, self.html_col)]
        urls, raws, positions, page_urls, next_pages = [], [], [], [], []
        src_idx: list[int] = []
        page_url_arr = batch[self.url_col].to_pylist()
        html_arr = batch[self.html_col].to_pylist()
        for i, (purl, html) in enumerate(zip(page_url_arr, html_arr)):
            links, raw_links, nxt = parse_listing_raw(html or "", purl)
            for pos, (link, raw) in enumerate(zip(links, raw_links)):
                urls.append(link)
                raws.append(raw)
                positions.append(pos)
                page_urls.append(purl)
                next_pages.append(nxt)
                src_idx.append(i)
        cols = {
            "url": pa.array(urls, type=pa.string()),
            "href_raw": pa.array(raws, type=pa.string()),
            "position": pa.array(positions, type=pa.int32()),
            "page_url": pa.array(page_urls, type=pa.string()),
            "next_page": pa.array(next_pages, type=pa.string()),
        }
        _no_carry_collision(carried, cols)
        if carried:
            taken = batch.select(carried).take(pa.array(src_idx, pa.int64()))
            for n in carried:
                cols[n] = taken[n]
        return pa.table(cols)
