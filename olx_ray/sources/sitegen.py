"""Deterministic synthetic site generator (FIXTURES.md §2, seed=42).

Replaces the network in this sandbox: produces the ``pages`` store
(url → html), the ``seeds`` table, and — crucially — *golden* expected
outputs derived from the ads' SPECS (the field values the generator
chose), NOT by running the engine's HTML parser. The engine must
recover the goldens by actually parsing the HTML, so the goldens are an
independent oracle for reference semantics (selectors + string
transforms, SURVEY.md §5).

All randomness is counter-based: every choice is
``hash64(f"{seed}:{tag}:{counter}")`` so any subset regenerates
identically (FIXTURES.md §6) and generation parallelizes embarrassingly
(used by ``pages_dataset`` to build the bench store with Ray).

Adversarial cases baked in (FIXTURES.md §2):
- duplicate hrefs within a listing page (first-wins distinct, D1);
- global duplicates across pages (reference does NOT dedup globally);
- a hot-host hub page linking many ads on one host (skew path);
- ad with no title block (→ empty-string title/description spans);
- ad with TWO title divs (→ Jsoup space-joined multi-match text);
- brief lines: "Ключ:Значення", valueless → "true", multi-colon
  "Час:12:30" (segment 1 only), empty-key ":x" (dropped);
- price display strings ("15 000 грн."), Cyrillic text throughout.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow as pa

from ..functions.hashing import hash64
from ..schema import PAGES, SEEDS

SEED = 42
N_PAGE_SHARDS = 16
HOST = "www.olx.ua"
HOT_HOST = "hub.olx.ua"

_WORDS = (
    "Продам Куплю Новий Вживаний Терміново Якісний Дешево Оригінал "
    "диван телефон ноутбук велосипед куртка стіл шафа холодильник "
    "гарнітур квартира авто колеса монітор принтер гітара"
).split()

# Bump when generated page CONTENT changes: cached site dirs embed this
# version so stale /tmp caches can't desync from spec-derived goldens.
SITE_VERSION = 2

_BRIEF_TEMPLATES = [
    # (p-element text, expected (key, value) or None if dropped)
    ("Стан:Вживане", ("Стан", "Вживане")),
    ("Ключ:Значення", ("Ключ", "Значення")),
    ("Приватна особа", ("Приватна особа", "true")),          # no colon → "true"
    ("Час:12:30", ("Час", "12")),                            # multi-colon: segment 1 only
    (":x", None),                                            # empty key → dropped
    ("Доставка:", ("Доставка", "true")),                     # trailing-empty dropped → "true"
    ("Гарантія:6 місяців", ("Гарантія", "6 місяців")),
    ("Бренд:OLX", ("Бренд", "OLX")),
    ("Стан:Нове", ("Стан", "Нове")),   # second value for "Стан": ads
    #   drawing both Стан templates now EXERCISE the last-wins quirk in
    #   crawl-level goldens, not just the parse unit test
]

_BRIEF_MAP = dict(_BRIEF_TEMPLATES)

TIERS = {
    # tier: (n_listing_pages, ads_per_page, dup_rate_pct, max_count, hot_hub)
    "t1": (2, 10, 10, 15, False),
    "t2": (20, 30, 25, 500, True),
    "bench": (2000, 30, 25, 50_000, False),
}


def _rint(tag: str, n: int) -> int:
    """Counter-based uniform int in [0, n)."""
    return hash64(f"{SEED}:{tag}") % n


@dataclass
class AdSpec:
    ad_id: int
    host: str = HOST

    @property
    def path(self) -> str:
        return f"/d/uk/obyavlenie/ad-{self.ad_id}"

    @property
    def url(self) -> str:
        return f"https://{self.host}{self.path}"

    # -- deterministic field values ------------------------------------
    @property
    def variant(self) -> str:
        # adversarial variants on a deterministic schedule
        if self.ad_id % 37 == 0:
            return "no_title"
        if self.ad_id % 41 == 0:
            return "two_titles"
        return "normal"

    @property
    def title_words(self) -> list[str]:
        k = 2 + _rint(f"title_n:{self.ad_id}", 3)
        return [_WORDS[_rint(f"title:{self.ad_id}:{j}", len(_WORDS))]
                for j in range(k)]

    @property
    def title_text(self) -> str:
        """Expected Jsoup-extracted title."""
        if self.variant == "no_title":
            return ""
        t = " ".join(self.title_words)
        if self.variant == "two_titles":
            return f"{t} {t}-2"
        return t

    @property
    def price_text(self) -> str:
        thousands = 1 + _rint(f"price:{self.ad_id}", 99)
        hundreds = _rint(f"price2:{self.ad_id}", 1000)
        return f"{thousands} {hundreds:03d} грн."

    @property
    def brief_lines(self) -> list[str]:
        k = _rint(f"brief_n:{self.ad_id}", 5)  # 0..4 lines
        return [_BRIEF_TEMPLATES[_rint(f"brief:{self.ad_id}:{j}", len(_BRIEF_TEMPLATES))][0]
                for j in range(k)]

    @property
    def images(self) -> list[str]:
        k = _rint(f"img_n:{self.ad_id}", 4)  # 0..3 images
        return [f"img://ad-{self.ad_id}/{j}" for j in range(k)]

    @property
    def description_native(self) -> str:
        return f"Опис оголошення {self.ad_id}"

    @property
    def latency_ms(self) -> int:
        # realistic web fetch latency: 50..350 ms, seeded per page
        return 50 + _rint(f"lat:{self.ad_id}", 300)

    # -- rendering ------------------------------------------------------
    def html(self) -> str:
        if self.variant == "no_title":
            title_html = ""
        elif self.variant == "two_titles":
            t = " ".join(self.title_words)
            title_html = (f"<div data-cy='ad_title'><h4>{t}</h4></div>"
                          f"<div data-cy='ad_title'>{t}-2</div>")
        else:
            title_html = f"<div data-cy='ad_title'><h4>{' '.join(self.title_words)}</h4></div>"
        briefs = "".join(f"<li><p>{line}</p></li>" for line in self.brief_lines)
        imgs = "".join(f"<img src=\"{src}\">" for src in self.images)
        return (
            "<html><head><meta charset='utf-8'></head><body>"
            f"{title_html}"
            f"<div data-cy='ad_description'><p>{self.description_native}</p></div>"
            f"<div data-testid='ad-price-container'><h3>{self.price_text}</h3></div>"
            f"<div id='mainContent'><ul>{briefs}</ul><ol><li>не brief</li></ol></div>"
            f"<div class='gallery'>{imgs}</div>"
            "</body></html>"
        )

    def expected_spans(self, *, native: bool = False) -> list[dict]:
        """Golden span sequence from the SPEC (no HTML parsing involved)."""
        spans: list[dict] = []

        def emit(kind, text_, ref):
            spans.append({"kind": kind, "text": text_, "media_ref": ref,
                          "offset": len(spans)})

        title = self.title_text
        desc = self.description_native if native else title
        emit("title", title, None)
        emit("description", desc, None)
        emit("price", self.price_text, None)
        # brief: java-split → filter → last-wins at first position
        pos: dict[str, int] = {}
        pairs: list[list[str]] = []
        for line in self.brief_lines:
            exp = _BRIEF_MAP[line]
            if exp is None:
                continue
            k, v = exp
            if k in pos:
                pairs[pos[k]][1] = v
            else:
                pos[k] = len(pairs)
                pairs.append([k, v])
        for k, v in pairs:
            emit("brief", f"{k} -> {v}", None)
        for src in self.images:
            emit("image", None, src)
        return spans


@dataclass
class ListingSpec:
    tier: str
    page_idx: int
    n_pages: int
    ads_per_page: int
    dup_pct: int
    hot_hub: bool
    host: str = HOST

    @property
    def url(self) -> str:
        suffix = "" if self.page_idx == 0 else f"/page-{self.page_idx}"
        return f"https://{self.host}/list/uk{suffix}"

    @property
    def is_hub(self) -> bool:
        return self.hot_hub and self.page_idx == self.n_pages // 2

    def ad_ids(self) -> list[int]:
        """Ad ids on this page; dup_pct% of slots repeat an earlier ad
        (within-page or cross-page duplicates)."""
        ids: list[int] = []
        base = self.page_idx * self.ads_per_page
        for j in range(self.ads_per_page):
            tag = f"{self.tier}:dup:{self.page_idx}:{j}"
            if ids and _rint(tag, 100) < self.dup_pct:
                if _rint(tag + ":w", 2) == 0:  # within-page duplicate (exercises D1)
                    ids.append(ids[_rint(tag + ":i", len(ids))])
                else:  # cross-page duplicate: an ad from an earlier page
                    ids.append(_rint(tag + ":g", max(1, base)))
            else:
                ids.append(base + j)
        return ids

    def hrefs(self) -> list[str]:
        """Raw hrefs as they appear in the cards. Normal pages emit
        path-only hrefs. The hot-host hub page emits FULLY-QUALIFIED
        hot-host URLs for half its slots: under the reference's
        path-replacing absolutization (M5 bug) those become
        ``https://www.olx.ua/https://hub.olx.ua/...`` → fetch_404 in
        conformance mode; native mode resolves them properly and gets
        real host diversity (the skew path, SURVEY.md §4.2)."""
        out = []
        for j, ad_id in enumerate(self.ad_ids()):
            if self.page_idx == 1 and j == 5:
                # dead link: no page exists → fetch_404 path exercised
                out.append("/d/uk/obyavlenie/missing-777")
            elif self.is_hub and ad_id % 2 == 0:
                out.append(AdSpec(ad_id, HOT_HOST).url)
            else:
                out.append(AdSpec(ad_id, self.host).path)
        return out

    @property
    def next_page_href(self) -> str | None:
        if self.page_idx + 1 >= self.n_pages:
            return None
        nxt = ListingSpec(self.tier, self.page_idx + 1, self.n_pages,
                          self.ads_per_page, self.dup_pct, self.hot_hub)
        from urllib.parse import urlsplit
        return urlsplit(nxt.url).path

    @property
    def latency_ms(self) -> int:
        return 80 + _rint(f"lat:listing:{self.tier}:{self.page_idx}", 300)

    def html(self) -> str:
        cards = "".join(
            f"<div data-testid='l-card' data-cy='l-card'>"
            f"<a href=\"{href}\"><b>ad</b></a></div>"
            for href in self.hrefs()
        )
        nxt = self.next_page_href
        pag = (f"<a data-cy='pagination-forward' data-testid='pagination-forward' "
               f"href=\"{nxt}\">далі</a>" if nxt else
               # present-but-empty attr on last page (empty attr → None, M4)
               "<a data-cy='pagination-forward' data-testid='pagination-forward' href=\"\">далі</a>")
        return ("<html><body><div id='listings'>"
                f"{cards}</div>{pag}</body></html>")


@dataclass
class SiteSpec:
    tier: str
    n_pages: int = field(init=False)
    ads_per_page: int = field(init=False)
    dup_pct: int = field(init=False)
    max_count: int = field(init=False)
    hot_hub: bool = field(init=False)

    def __post_init__(self):
        (self.n_pages, self.ads_per_page, self.dup_pct,
         self.max_count, self.hot_hub) = TIERS[self.tier]

    def listing(self, page_idx: int) -> ListingSpec:
        return ListingSpec(self.tier, page_idx, self.n_pages,
                           self.ads_per_page, self.dup_pct, self.hot_hub)

    def listings(self) -> list[ListingSpec]:
        return [self.listing(i) for i in range(self.n_pages)]

    def all_ad_specs(self) -> dict[str, AdSpec]:
        """url → AdSpec for every ad page that EXISTS on the synthetic
        site: main-host ads for path-only hrefs, hot-host ads for the
        hub's fully-qualified hrefs. (The conformance-mode mangled hub
        URLs deliberately have no page → fetch_404.)"""
        out: dict[str, AdSpec] = {}
        for lst in self.listings():
            for ad_id, href in zip(lst.ad_ids(), lst.hrefs()):
                host = HOT_HOST if href.startswith("https://") else lst.host
                spec = AdSpec(ad_id, host)
                out.setdefault(spec.url, spec)
        return out

    def seed_rows(self, wide: bool | None = None) -> pa.Table:
        """Seed table: one crawl job (search_id=1). ``wide=True`` (default
        for the bench tier) seeds EVERY listing page — a wide frontier,
        the realistic shape for throughput runs (a pagination-only chain
        is inherently sequential: BFS depth == page count)."""
        import datetime
        if wide is None:
            wide = self.tier == "bench"
        urls = ([l.url for l in self.listings()] if wide
                else [self.listing(0).url])
        n = len(urls)
        return pa.table({
            "search_id": pa.array([1] * n, pa.int64()),
            "name": pa.array([f"синтетичний-{self.tier}"] * n),
            "url": pa.array(urls),
            "max_count": pa.array([self.max_count] * n, pa.int32()),
            "started_at": pa.array([datetime.datetime(2024, 12, 20)] * n,
                                   pa.timestamp("us")),
        }, schema=SEEDS)


def pages_table(tier: str) -> pa.Table:
    """Whole pages store as one Arrow table (t1/t2 scale; the bench tier
    is built distributed via ``pages_dataset``)."""
    site = SiteSpec(tier)
    urls, kinds, htmls, lats = [], [], [], []
    for lst in site.listings():
        urls.append(lst.url)
        kinds.append("listing")
        htmls.append(lst.html())
        lats.append(lst.latency_ms)
    for url, spec in site.all_ad_specs().items():
        urls.append(url)
        kinds.append("ad")
        htmls.append(spec.html())
        lats.append(spec.latency_ms)
    for host in (HOST, HOT_HOST):
        urls.append(f"https://{host}/robots.txt")
        kinds.append("robots")
        htmls.append("User-agent: *\nDisallow: /admin/\nCrawl-delay: 0\n")
        lats.append(1)
    shard = [hash64(u) % N_PAGE_SHARDS for u in urls]
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "kind": pa.array(kinds, pa.string()),
        "html": pa.array(htmls, pa.string()),
        "sim_latency_ms": pa.array(lats, pa.int32()),
        "fetch_shard": pa.array(shard, pa.int32()),
    }, schema=PAGES)


def write_site(tier: str, root: str) -> dict[str, str]:
    """Materialize pages (hash-partitioned by fetch_shard) + seeds under
    ``root``; returns {"pages": dir, "seeds": dir}. Partitioned layout =
    the resumable / shardable page store the Fetcher actors read."""
    import os
    import pyarrow.parquet as pq

    pages_dir = os.path.join(root, "pages")
    seeds_dir = os.path.join(root, "seeds")
    os.makedirs(pages_dir, exist_ok=True)
    os.makedirs(seeds_dir, exist_ok=True)
    tbl = pages_table(tier)
    for s in range(N_PAGE_SHARDS):
        import pyarrow.compute as pc
        part = tbl.filter(pc.equal(tbl["fetch_shard"], s))
        pq.write_table(part, os.path.join(pages_dir, f"shard-{s:03d}.parquet"))
    pq.write_table(SiteSpec(tier).seed_rows(),
                   os.path.join(seeds_dir, "seeds.parquet"))
    # completeness marker, written strictly AFTER every data file: a
    # killed build can leave partial shards but never a marker, so
    # marker-guarded caches (ensure_site) cannot reuse a torn site
    with open(os.path.join(root, "_COMPLETE"), "w") as f:
        f.write(f"{tier}:v{SITE_VERSION}")
    return {"pages": pages_dir, "seeds": seeds_dir}


def _site_paths(root: str) -> dict[str, str]:
    import os

    return {"pages": os.path.join(root, "pages"),
            "seeds": os.path.join(root, "seeds")}


def _marker_current(root: str, tier: str) -> bool:
    import os

    marker = os.path.join(root, "_COMPLETE")
    try:
        with open(marker) as f:
            return f.read().strip() == f"{tier}:v{SITE_VERSION}"
    except OSError:
        return False


def ensure_site(tier: str, root: str) -> dict[str, str]:
    """Cached-site guard for /tmp reuse across processes: rebuild unless
    the completeness marker exists AND matches this (tier, generator
    version) — ``isdir(pages)`` alone would trust a torn site from a
    killed run, and an unchecked marker would silently reuse a site
    built for a DIFFERENT tier (or by an older sitegen) at the same
    root.

    Concurrent-process safe: a rebuild happens in a pid-unique sibling
    dir and is published with one atomic ``os.rename`` — racing
    processes never build in (or delete) a directory another process
    is mid-write in, and whichever rename wins provides a COMPLETE
    site (marker is written before rename); the loser discards its
    build and reuses the winner's."""
    import os
    import shutil

    if _marker_current(root, tier):
        return _site_paths(root)
    # stale tier/version: clear the old root (ignore_errors — a racing
    # process may be clearing it too) and build aside, publish by rename
    shutil.rmtree(root, ignore_errors=True)
    build = f"{root}.build-{os.getpid()}"
    shutil.rmtree(build, ignore_errors=True)
    write_site(tier, build)
    try:
        os.rename(build, root)
    except OSError:
        # a concurrent builder renamed first; its site is complete
        shutil.rmtree(build, ignore_errors=True)
        if not _marker_current(root, tier):
            raise
    return _site_paths(root)
