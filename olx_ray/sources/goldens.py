"""Golden oracles: hand-executed reference semantics over the site SPECS.

Everything here is computed WITHOUT the engine's HTML parser or Ray —
straight from :mod:`sitegen`'s field specs — so it is an independent
oracle the engine's pipelines are tested against (SURVEY.md §5):

- ``golden_documents``  — expected span sequence per ad URL.
- ``golden_conformance_trace`` — the visit order the reference produces
  for a seed, reproducing quirks Q2/Q3 (the unfold refetches the SAME
  listing URL each iteration and never follows next_page; an empty
  next-page does not stop it; termination comes only from the count,
  reference ``DownloadLinks.scala:17-34`` + ``take`` at
  ``DownloadAds.scala:27``).
- ``golden_native_trace`` — the engine's documented native semantics
  (BFS rounds, proper URL resolution, global first-discovery-wins seen
  filter, max_count cap on ad fetches in discovered order).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from urllib.parse import urljoin

from ..functions.urls import absolutize, canonicalize
from .sitegen import SiteSpec


@dataclass
class Trace:
    # (seq, url, action) — action: fetch_listing | fetch_ad | fetch_404
    visits: list[tuple[int, str, str]]
    documents: list[str]          # doc_ids in output order
    seen: set[str]                # final canonical URL-seen set


def _distinct_first_wins(items: list[str]) -> list[str]:
    seen: set[str] = set()
    out = []
    for x in items:
        if x not in seen:
            seen.add(x)
            out.append(x)
    return out


def golden_documents(tier: str, *, native: bool = False) -> dict[str, list[dict]]:
    """fetch-URL → expected spans, for every ad page existing on the site."""
    site = SiteSpec(tier)
    return {url: spec.expected_spans(native=native)
            for url, spec in site.all_ad_specs().items()}


def page0_links(tier: str) -> list[str]:
    """The seed listing page's extracted links under reference semantics:
    raw hrefs → first-wins distinct → path-replacing absolutize."""
    site = SiteSpec(tier)
    lst = site.listing(0)
    return [absolutize(lst.url, h) for h in _distinct_first_wins(lst.hrefs())]


def golden_listing_links(tier: str) -> list[dict]:
    """Expected ``listing_extract`` rows — (url, href_raw, position,
    page_url) per listing page — computed straight from the SPECS
    (raw hrefs → D1 first-wins distinct → M5 path-replace absolutize),
    never from the engine's HTML parser. Feeds the driver's
    ``listing_extract`` DuckDB oracle as an inline VALUES table."""
    site = SiteSpec(tier)
    rows: list[dict] = []
    for lst in site.listings():
        raws = _distinct_first_wins(lst.hrefs())
        for pos, raw in enumerate(raws):
            rows.append({"url": absolutize(lst.url, raw), "href_raw": raw,
                         "position": pos, "page_url": lst.url})
    rows.sort(key=lambda r: (r["page_url"], r["position"]))
    return rows


def golden_conformance_trace(tier: str, max_count: int | None = None) -> Trace:
    """Reference E1 semantics from the tier's seed (quirks Q2/Q3)."""
    site = SiteSpec(tier)
    count = max_count if max_count is not None else site.max_count
    seed_url = site.listing(0).url
    links = page0_links(tier)
    n_links = len(links)
    existing = set(site.all_ad_specs())

    visits: list[tuple[int, str, str]] = []
    documents: list[str] = []
    seq = 0
    if n_links == 0:
        # left never decreases → the reference spins forever; the golden
        # encodes one listing fetch and no output (engine must detect+stop).
        return Trace([(0, seed_url, "fetch_listing")], [], {canonicalize(seed_url)})
    iterations = max(1, math.ceil(count / n_links))
    emitted = 0
    for _ in range(iterations):
        visits.append((seq, seed_url, "fetch_listing"))
        seq += 1
        for url in links:
            if emitted >= count:
                break
            if url in existing:
                visits.append((seq, url, "fetch_ad"))
                documents.append(url)
            else:
                # reference: fetch error kills the job — conformance-mode
                # engine records fetch_404 and stops, matching E1 error path
                visits.append((seq, url, "fetch_404"))
                seq += 1
                return Trace(visits, documents,
                             {canonicalize(v[1]) for v in visits})
            seq += 1
            emitted += 1
    return Trace(visits, documents, {canonicalize(v[1]) for v in visits})


def golden_exploded_spans(tier: str, mode: str) -> list[dict]:
    """Expected FLAT span rows of a whole crawl — ``(doc_id, doc_rank,
    offset, kind, text, media_ref)`` — straight from the traces +
    per-ad SPEC spans above, never from the engine. ``doc_rank`` is
    the document's position in the trace's output order (conformance:
    emit order incl. re-fetches of the same ad; native: (round,
    discovered_seq) order) — the spec-derivable stand-in for the
    engine's internal sequence numbering. Feeds the driver's
    ``crawl_native`` / ``crawl_conformance`` DuckDB oracles as inline
    VALUES tables (the ``golden_listing_links`` discipline)."""
    if mode not in ("native", "conformance"):
        raise ValueError(f"mode={mode!r}: pass 'native' or 'conformance'")
    native = mode == "native"
    tr = golden_native_trace(tier) if native \
        else golden_conformance_trace(tier)
    spans = golden_documents(tier, native=native)
    rows: list[dict] = []
    for rank, d in enumerate(tr.documents):
        for s in spans[d]:
            rows.append({"doc_id": canonicalize(d), "doc_rank": rank,
                         "offset": s["offset"], "kind": s["kind"],
                         "text": s["text"], "media_ref": s["media_ref"]})
    return rows


def golden_media_features(n: int = 256, tag: str = "media",
                          stride: int = 8) -> list[dict]:
    """Expected ``multimodal.media_features`` rows recomputed straight
    from the generator seeds — SAME RNG streams as ``synthesize_media``
    but NO PPM/WAV/Y4M bytes are built or parsed, so the byte encoders,
    the three real decoders, the kind filters, the strided frame
    sampler and the union/aggregate plumbing all stay under oracle.
    Rounding uses the engine's operations (np.round / frame-order sum)
    — builtin round() can land on the other side of a 5e-5
    representation boundary."""
    import numpy as np

    from ..functions.hashing import hash64

    rows: list[dict] = []
    for i in range(n):
        kind = ("image", "audio", "video")[hash64(f"{tag}:k:{i}") % 3]
        if kind == "image":
            w = 16 + hash64(f"{tag}:w:{i}") % 48
            h = 16 + hash64(f"{tag}:h:{i}") % 48
            rng = np.random.RandomState(hash64(f"{tag}:px:{i}") % (1 << 32))
            px = rng.randint(0, 256, w * h * 3, dtype=np.int64) \
                .astype(np.uint8)
            rows.append({"media_id": i, "kind": "image", "width": w,
                         "height": h, "n_units": 3,
                         "feat": round(float(px.mean()), 4)})
        elif kind == "audio":
            sr = 8000 * (1 + hash64(f"{tag}:sr:{i}") % 3)
            ns = 1000 + hash64(f"{tag}:ns:{i}") % 9000
            seed = hash64(f"{tag}:au:{i}")
            rng = np.random.RandomState(seed % (1 << 32))
            t = np.arange(ns, dtype=np.float64) / sr
            sig = (0.5 * np.sin(2 * np.pi * (200 + seed % 800) * t)
                   + 0.1 * rng.standard_normal(ns))
            x = np.clip(sig * 32767, -32768, 32767).astype("<i2") \
                .astype(np.float64) / 32768.0
            rows.append({"media_id": i, "kind": "audio", "width": -1,
                         "height": -1, "n_units": ns,
                         "feat": round(float(np.sqrt((x ** 2).mean())), 4)})
        else:
            w = 16 + 2 * (hash64(f"{tag}:vw:{i}") % 9)
            h = 16 + 2 * (hash64(f"{tag}:vh:{i}") % 9)
            nf = 8 + hash64(f"{tag}:nf:{i}") % 56
            rng = np.random.RandomState(hash64(f"{tag}:vf:{i}") % (1 << 32))
            fsz = w * h + 2 * ((w // 2) * (h // 2))
            means = []
            for f in range(nf):
                frame = rng.randint(0, 256, fsz, dtype=np.int64) \
                    .astype(np.uint8)
                if f % stride == 0:
                    means.append(round(float(frame[:w * h].mean()), 4))
            rows.append({"media_id": i, "kind": "video", "width": w,
                         "height": h, "n_units": len(means),
                         "feat": float(np.round(
                             np.sum(np.array(means)) / len(means), 4))})
    return rows


def golden_native_trace(tier: str, max_count: int | None = None) -> Trace:
    """Engine-native semantics (the documented fix of Q2/Q3):

    - BFS rounds; round r fetches every pending URL discovered in r-1;
    - listing links resolved with proper RFC 3986 ``urljoin``;
    - ``next_page`` followed (depth stays 0 for listings; ads depth 1);
    - global seen-filter on canonical URLs, first-discovery-wins;
    - at most ``max_count`` ad fetches scheduled, in discovered_seq order;
    - missing pages → fetch_404 (does NOT kill the crawl, unlike E1).

    Visit order within a round = discovered_seq (listings before ads via
    priority=depth)."""
    assert tier in ("t1", "t2"), (
        "golden_native_trace assumes the NARROW single-seed frontier "
        "(listing 0); seed_rows() is wide for the bench tier and would "
        "silently diverge from this golden")
    site = SiteSpec(tier)
    count = max_count if max_count is not None else site.max_count
    seed_url = site.listing(0).url
    specs_by_url = site.all_ad_specs()
    listing_by_url = {l.url: l for l in site.listings()}

    seen: set[str] = {canonicalize(seed_url)}
    visits: list[tuple[int, str, str]] = []
    documents: list[str] = []
    seq = 0
    ads_scheduled = 0
    frontier: list[tuple[int, str]] = [(0, seed_url)]  # (depth, url)
    while frontier:
        # priority: listings (depth 0) first, then ads, in discovery order
        frontier.sort(key=lambda t: t[0])  # stable → keeps discovery order
        next_frontier: list[tuple[int, str]] = []
        for depth, url in frontier:
            if url in listing_by_url:
                visits.append((seq, url, "fetch_listing"))
                seq += 1
                lst = listing_by_url[url]
                cand = [urljoin(lst.url, h) for h in _distinct_first_wins(lst.hrefs())]
                nxt = lst.next_page_href
                if nxt:
                    cand.append(urljoin(lst.url, nxt))
                for c in cand:
                    cc = canonicalize(c)
                    if cc in seen:
                        continue
                    is_listing = c in listing_by_url
                    if not is_listing:
                        if ads_scheduled >= count:
                            continue
                        ads_scheduled += 1
                    seen.add(cc)
                    next_frontier.append((0 if is_listing else 1, c))
            elif url in specs_by_url:
                visits.append((seq, url, "fetch_ad"))
                documents.append(url)
                seq += 1
            else:
                visits.append((seq, url, "fetch_404"))
                seq += 1
        frontier = next_frontier
    return Trace(visits, documents, seen)
