"""The crawl engine: E1 re-expressed as a Ray-Data crawl-round loop.

Two modes (SURVEY.md §7 "hard parts"):

- ``conformance`` — reproduces the reference's observable trace
  bug-for-bug: the pagination unfold refetches the SAME listing URL
  and never follows next_page (Q2), an empty next-page does not stop
  it (Q3), termination comes only from ``take(count)``
  (reference ``DownloadLinks.scala:17-34``, ``DownloadAds.scala:25-28``);
  description==title (Q1); a fetch error kills the job (E1 step 2).
  Execution is still parallel Ray Data — ordering is carried in a
  sequence column and restored by sort, not by serializing execution.

- ``native`` — the engine's documented semantics: BFS rounds, proper
  RFC-3986 link resolution, next_page followed, sharded global seen
  filter (first discovery in *logical* order wins — deterministic at
  any parallelism), politeness gates, max_count capping ad fetches in
  discovered order, per-round checkpoint + lineage, resume.

Per native round r::

    frontier_r ──sort(priority, discovered_seq)──limit(budget)──▶
    map_batches(Fetcher actors)  [politeness gates consulted inside]
      ├─ filter(ad)      ─ ParseAds ──▶ documents/round-r (parquet)
      ├─ filter(listing) ─ ParseListings ─ canonicalize+hash ─┐
      └─ (next_page travels on ParseListingsFull's rows) ─────┤
    union ── dedup_min_seq (groupby shuffle, round-bounded) ──┤
    SeenFilterClient(check: rounds < r) ── ad-cap sort+limit ─┤
    SeenFilterClient(add: seal at barrier) ──▶ frontier_{r+1} + checkpoint

Scale notes: the only driver-side materializations are (a) the round's
LISTING urls (for dense page-rank assignment; bounded by
budget/ads_per_page) and (b) per-listing next_page metadata — both
O(listings-per-round), never O(frontier). Everything else streams.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from .. import storage
from ..functions.hashing import hash64
from ..functions.urls import canonicalize, host_of
from ..schema import FRONTIER, pack_seq
from ..stages.fetch import fetch_batch
from ..stages.parse import ParseAds, ParseListings, ParseListingsFull
from ..stages.politeness import make_gates
from ..stages.seen import SeenFilterClient, dedup_min_seq, make_seen_actors
from ..state import checkpoint as ckpt

_ACTION = {"listing": "fetch_listing", "ad": "fetch_ad",
           "missing": "fetch_404", "denied": "robots_denied"}


@dataclass
class CrawlConfig:
    pages_dir: str
    out_dir: str
    mode: str = "native"                 # "native" | "conformance"
    budget_per_round: int | None = None  # None = fetch all pending
    collect_trace: bool = True           # per-visit trace rows (tests); off for bench
    lineage_level: str = "full"          # "full" = digests+counts, "counts" = counts only
    n_seen_shards: int = 8
    n_gates: int = 4
    fetcher_concurrency: int = 4
    fetch_batch_size: int = 128
    parse_batch_size: int = 256
    latency_scale: float = 0.0
    seen_mode: str = "both"              # "exact" | "bloom" | "both"
    seen_capacity_per_shard: int = 1_000_000
    max_rounds: int = 64
    salt: int = 4                        # host_shard salt factor (skew)
    resume: bool = False
    verbose: bool = False
    keep_raw_html: bool = False          # sidecar table documents' page bodies
    should_stop: object = None           # callable () -> bool, checked at round start


@dataclass
class CrawlResult:
    out_dir: str
    rounds: int
    n_documents: int
    n_fetched: int
    trace: list[tuple[int, str, str]] = field(default_factory=list)
    wall_sec: float = 0.0


# --------------------------------------------------------------- helpers
def _host_shard(host: str, url_hash: int, salt: int, n_gates: int) -> int:
    """THE salted host-shard formula — one definition for both frontier
    assembly sites (they hand-duplicated it once and diverged on numpy
    uint64 wrap vs Python ints; Python ints are the spec). Spreads a
    hot host over `salt` sub-shards while keeping same-host locality
    within each."""
    return int((hash64(host) * salt + int(url_hash) % salt)
               % max(1, n_gates))


def _frontier_row(url: str, depth: int, seq: int, round_: int,
                  search_id: int, salt: int, n_gates: int) -> dict:
    cu = canonicalize(url)
    h = host_of(url)
    uh = hash64(cu)
    return {
        "url": url, "url_hash": uh, "host": h,
        "host_shard": _host_shard(h, uh, salt, n_gates),
        "depth": depth, "priority": depth, "discovered_seq": seq,
        "status": "pending", "round": round_, "search_id": search_id,
    }


def _frontier_table(rows: list[dict]) -> pa.Table:
    return pa.table({f.name: pa.array([r[f.name] for r in rows], f.type)
                     for f in FRONTIER})


class MakeCandidates:
    """map_batches kernel: exploded link rows → FRONTIER candidate rows.
    Child discovered_seq = pack(round, page_rank[parent], position); the
    page-rank dict is tiny (listings this round) and ships with the task
    closure (broadcast once per task via Ray's closure store)."""

    def __init__(self, page_rank: dict[str, int], round_: int, salt: int,
                 n_gates: int, depth: int = 1):
        self.page_rank = page_rank
        self.round = round_
        self.salt = salt
        self.n_gates = n_gates
        self.depth = depth

    def __call__(self, batch: pa.Table) -> pa.Table:
        # columnar assembly: canonicalize/hash are per-URL string ops,
        # but everything else (shard math, seq packing, table build) is
        # vectorized — no per-row dict construction in the hot path
        urls = batch["url"].to_pylist()
        pages = batch["page_url"].to_pylist()
        poss = batch["position"].to_pylist()
        if "search_id" not in batch.column_names:
            # the frontier/parse carry contract guarantees search_id;
            # fabricating one here would silently attribute every
            # candidate to one search (wrong caps, wrong documents) —
            # fail loud like the other carry-contract guards
            raise ValueError(
                "MakeCandidates: batch has no search_id column — the "
                "carry contract was broken upstream")
        sids = batch["search_id"].to_pylist()
        n = len(urls)
        if n == 0:
            return _frontier_table([])
        uh = np.array([hash64(canonicalize(u)) for u in urls], dtype=np.uint64)
        hosts = [host_of(u) for u in urls]
        shard = np.fromiter(
            (_host_shard(h, u, self.salt, self.n_gates)
             for h, u in zip(hosts, uh)), dtype=np.int64, count=n)
        rank = np.array([self.page_rank[p] for p in pages], dtype=np.int64)
        seqs = np.array([pack_seq(self.round, r, p)
                         for r, p in zip(rank, poss)], dtype=np.int64)
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "url_hash": pa.array(uh, pa.uint64()),
            "host": pa.array(hosts, pa.string()),
            "host_shard": pa.array(shard.astype(np.int32), pa.int32()),
            "depth": pa.array(np.full(n, self.depth, dtype=np.int32), pa.int32()),
            "priority": pa.array(np.full(n, self.depth, dtype=np.int64), pa.int64()),
            "discovered_seq": pa.array(seqs, pa.int64()),
            "status": pa.array(["pending"] * n, pa.string()),
            "round": pa.array(np.full(n, self.round, dtype=np.int32), pa.int32()),
            "search_id": pa.array(sids, pa.int64()),
        })


# ================================================================ native
def crawl_native(cfg: CrawlConfig, seeds: pa.Table) -> CrawlResult:
    """Run the native crawl loop. ``seeds``: SEEDS-schema table.

    The gate/seen actors live exactly as long as the crawl: they are
    ray.kill'ed in the ``finally`` (their durable state is checkpointed
    every round), so repeated crawls in one Ray session don't accumulate
    CPU-reserving actors."""
    gates: list = []
    seen: list = []
    try:
        return _crawl_native(cfg, seeds, gates, seen)
    finally:
        for a in gates + seen:
            try:
                ray.kill(a)
            except Exception:
                pass


def _crawl_native(cfg: CrawlConfig, seeds: pa.Table, gates: list,
                  seen: list) -> CrawlResult:
    t0 = time.monotonic()
    os.makedirs(cfg.out_dir, exist_ok=True)
    if not cfg.resume:
        # fresh run into a reused out_dir: wipe prior rounds, or their
        # committed fragments would sit beside this run's appends and
        # double the frontier/documents on read (dir naming owned by
        # checkpoint.list_round_dirs — never re-matched inline)
        import shutil as _shutil
        for name in ckpt.list_round_dirs(cfg.out_dir):
            _shutil.rmtree(os.path.join(cfg.out_dir, name),
                           ignore_errors=True)

    robots = _load_robots(cfg.pages_dir)
    gates.extend(make_gates(cfg.n_gates, robots))
    seen.extend(make_seen_actors(cfg.n_seen_shards, cfg.seen_capacity_per_shard))

    max_counts = {int(s): int(c) for s, c in
                  zip(seeds["search_id"].to_pylist(), seeds["max_count"].to_pylist())}
    ads_admitted = {sid: 0 for sid in max_counts}

    start_round = 0
    frontier_path = None
    resumed_fetch_total = 0
    done = ckpt.latest_complete_round(cfg.out_dir) if cfg.resume else None
    if done is not None:
        man = storage.read_manifest(ckpt.manifest_path(cfg.out_dir, done))
        ads_admitted = {int(k): v for k, v in man["ads_admitted"].items()}
        ckpt.restore_seen(cfg.out_dir, done, seen)
        start_round = done + 1
        resumed_fetch_total = int(man.get("n_fetched_total", 0))
        frontier_path = os.path.join(ckpt.round_dir(cfg.out_dir, done), "frontier")
        if man.get("frontier_empty"):
            return _result(cfg, start_round, t0, resumed_fetch_total)
    else:
        # round 0 frontier = the seeds; seed their hashes into the seen
        # set. Seeds deduplicate on CANONICAL url, first row wins: two
        # seeds sharing a URL would fetch the same page twice, collapse
        # to one page_rank entry, and hand their children byte-identical
        # (url_hash, discovered_seq) differing only in search_id —
        # dedup_min_seq's tie-break would then be arrival-order-
        # dependent (nondeterministic search attribution, review
        # finding). First-in-seed-order is the deterministic owner.
        rows, seed_canon = [], set()
        for i in range(seeds.num_rows):
            sid = int(seeds["search_id"][i].as_py())
            url = seeds["url"][i].as_py()
            cu = canonicalize(url)
            if cu in seed_canon:
                continue
            seed_canon.add(cu)
            rows.append(_frontier_row(url, 0, pack_seq(0, i, 0), 0, sid,
                                      cfg.salt, cfg.n_gates))
        tbl = _frontier_table(rows)
        SeenFilterClient(seen, op="add")(tbl)
        frontier_path = os.path.join(cfg.out_dir, "round-init", "frontier")
        storage.write_table(tbl, frontier_path)

    n_fetched_total = resumed_fetch_total   # cumulative across resumes
    pending_count = None   # carried across rounds (next round's frontier size)
    for r in range(start_round, cfg.max_rounds):
        phases: dict[str, float] = {}
        _t = time.monotonic()

        def _mark(name: str) -> None:
            nonlocal _t
            now = time.monotonic()
            phases[name] = round(phases.get(name, 0) + now - _t, 2)
            _t = now

        if cfg.should_stop is not None and cfg.should_stop():
            # cooperative cancel (E3): previous round is fully
            # checkpointed → a later --resume continues deterministically
            return _result(cfg, r, t0, n_fetched_total)
        frontier = storage.read_dataset(frontier_path)
        lineage: list[dict] = []
        rdir = ckpt.round_dir(cfg.out_dir, r)
        if os.path.isdir(rdir) and not os.path.exists(
                ckpt.manifest_path(cfg.out_dir, r)):
            # partial leftovers from a crashed attempt at this round —
            # wipe so retried writes can't append duplicate fragments
            import shutil
            shutil.rmtree(rdir)
        os.makedirs(rdir, exist_ok=True)

        # ---- budget: priority-sorted prefix fetches now, rest carries --
        if pending_count is None:
            pending_count = frontier.count()
        if pending_count == 0:
            ckpt.commit_round(cfg.out_dir, r, counters={
                "ads_admitted": ads_admitted, "frontier_empty": True,
                "n_fetched": 0, "n_fetched_total": n_fetched_total},
                lineage_rows=[], seen_actors=seen)
            storage.write_table(_frontier_table([]),
                                os.path.join(rdir, "frontier"))
            return _result(cfg, r + 1, t0, n_fetched_total)
        carry_count = 0
        if cfg.budget_per_round and pending_count > cfg.budget_per_round:
            # streaming split: fetch the budget-smallest (priority, seq)
            # prefix; carry = rows past the boundary (never materialized
            # on the driver — an expr filter over the stored frontier).
            fetch_list = frontier.sort(["priority", "discovered_seq"]) \
                .limit(cfg.budget_per_round).materialize()
            bound = fetch_list.map_batches(_partial_max, batch_format="pyarrow") \
                .take_all()
            bp, bs = max((r_["priority"], r_["discovered_seq"]) for r_ in bound)
            carry_ds = storage.read_dataset(frontier_path).filter(
                expr=f"priority > {bp} or (priority == {bp} "
                     f"and discovered_seq > {bs})")
            carry_count = pending_count - cfg.budget_per_round
            n_fetch = cfg.budget_per_round
        else:
            # no budget → fetch order is immaterial (output order is
            # restored by seq sort at read time), so skip the sort shuffle
            fetch_list = frontier
            carry_ds = None
            n_fetch = pending_count
        # fan the fetch out: task parallelism == block count, and the
        # frontier arrives in a handful of blocks
        n_parts = max(cfg.fetcher_concurrency * 4,
                      n_fetch // max(1, cfg.fetch_batch_size))
        fetch_list = fetch_list.repartition(min(n_parts, 512))

        # ---- fetch (politeness gates consulted inside the tasks) ------
        fetched = fetch_list.map_batches(
            fetch_batch, fn_kwargs={
                "pages_dir": cfg.pages_dir, "gates": gates,
                "latency_scale": cfg.latency_scale,
                "parse_ads_inline": True, "native_parse": True,
                "keep_html": cfg.keep_raw_html},
            batch_format="pyarrow", batch_size=cfg.fetch_batch_size,
            # stateless tasks + per-worker-process shard cache: zero pool
            # spin-up per round, elastic to whatever CPUs are free; each
            # task models one async fetcher slot (N connections)
            num_cpus=1,
        ).materialize()   # round-bounded by budget; reused below
        fetch_digest = ckpt.dataset_digest(fetched)[1] \
            if cfg.lineage_level == "full" else 0
        n_fetched_total += n_fetch
        _mark("fetch")
        lineage.append({"round": r, "partition_id": -1, "stage": "fetch",
                        "input_digest": 0, "output_digest": fetch_digest,
                        "rows_in": pending_count, "rows_out": n_fetch,
                        "wall_ms": int(phases.get("fetch", 0) * 1000)})

        # ---- trace ----------------------------------------------------
        if cfg.collect_trace:
            trace_ds = fetched.map_batches(_trace_batch, batch_format="pyarrow")
            storage.write_dataset(trace_ds, os.path.join(rdir, "trace"))
        _mark("trace")

        # ---- documents (spans parsed INSIDE the fetch tasks) -----------
        ads_fetched = fetched.filter(expr="kind == 'ad' and status == 'fetched'")
        docs = ads_fetched.map_batches(_doc_finalize(r), batch_format="pyarrow")
        storage.write_dataset(docs, os.path.join(rdir, "documents"))
        if cfg.keep_raw_html:
            # sidecar of the fetched page body per doc (the reference
            # stores full HTML per ad, H2.scala:61 — there it is the
            # Jsoup-re-serialized DOM; here the fetched bytes). Kept in
            # its OWN table so the wide column never enters the
            # frontier shuffle (SURVEY.md §7 "wide rows").
            raw = ads_fetched.map_batches(
                lambda b: pa.table({  # same canonical doc_id as the
                    # documents table, so the sidecar joins back on it
                    "doc_id": pa.array([canonicalize(u) for u in
                                        b["url"].to_pylist()], pa.string()),
                    "raw_html": b["html"],
                    "round": pa.array([r] * b.num_rows, pa.int32())}),
                batch_format="pyarrow")
            storage.write_dataset(raw, os.path.join(rdir, "raw_html"))
        _mark("parse_docs")

        # ---- listing parse (ONE pass) + next-round candidates ----------
        # cheap in-memory count guard first: ad-only rounds (every other
        # BFS round) skip the listing-parse execution entirely
        n_listings_fetched = fetched.filter(
            expr="kind == 'listing' and status == 'fetched'").count()
        if n_listings_fetched:
            links_full = (fetched
                          .filter(expr="kind == 'listing' and status == 'fetched'")
                          .map_batches(ParseListingsFull(),
                                       batch_format="pyarrow",
                                       batch_size=cfg.parse_batch_size)
                          .materialize())
            # per-page meta = position<=0 rows (first link or zero-card
            # sentinel); driver-side size = listings this round, never
            # frontier
            meta = links_full.filter(expr="position <= 0").take_all()
        else:
            links_full, meta = None, []
        meta.sort(key=lambda m: m["discovered_seq"])
        page_rank = {m["page_url"]: i for i, m in enumerate(meta)}
        np_rows = []
        for m in meta:
            if m["next_page"]:
                from urllib.parse import urljoin
                nxt = urljoin(m["page_url"], m["next_page"])
                np_rows.append(_frontier_row(
                    nxt, 0,
                    pack_seq(r + 1, page_rank[m["page_url"]], int(m["n_links"])),
                    r + 1, int(m["search_id"]), cfg.salt, cfg.n_gates))
        _mark("listing_parse")

        # ---- dedup (deterministic) + cross-round seen check ------------
        if meta or np_rows:
            cand = (links_full.filter(expr="position >= 0")
                    .map_batches(_resolve_links, batch_format="pyarrow")
                    .map_batches(MakeCandidates(page_rank, r + 1, cfg.salt,
                                                cfg.n_gates, depth=1),
                                 batch_format="pyarrow"))
            if np_rows:
                cand = cand.union(rd.from_arrow(_frontier_table(np_rows)))
            cand = dedup_min_seq(cand)
            cand = cand.map_batches(SeenFilterClient(seen, op="check",
                                                     mode=cfg.seen_mode),
                                    batch_format="pyarrow").materialize()
            n_cand = cand.count()
            cand_digest = ckpt.dataset_digest(cand)[1] \
                if cfg.lineage_level == "full" else 0
        else:
            cand, n_cand, cand_digest = None, 0, 0
        _mark("dedup_seen")
        lineage.append({"round": r, "partition_id": -1, "stage": "candidates",
                        "input_digest": fetch_digest, "output_digest": cand_digest,
                        "rows_in": n_fetch, "rows_out": n_cand,
                        "wall_ms": int(phases.get("dedup_seen", 0) * 1000)})

        # ---- per-search ad cap in discovered order ---------------------
        n_survivors = 0
        if cand is not None and n_cand:
            n_listing_cand = cand.filter(expr="depth == 0").count() \
                if np_rows else 0
            n_ads_cand = n_cand - n_listing_cand
            total_remaining = sum(max(0, max_counts[sid] - ads_admitted[sid])
                                  for sid in max_counts)
            if total_remaining == 0:
                # every search's cap is exhausted and ads_admitted only
                # grows: new listings could only discover ads that can
                # never be admitted — stop admitting NEW rows entirely
                # (carried rows below were admitted in earlier rounds
                # and still fetch). Without this, pagination chains keep
                # being fetched/parsed round after round for zero
                # possible output (review finding).
                nxt_frontier = None
            elif n_ads_cand <= total_remaining and len(max_counts) == 1:
                # fast path: every candidate ad fits under the cap
                sid = next(iter(max_counts))
                ads_admitted[sid] += n_ads_cand
                nxt_frontier = cand
                n_survivors = n_cand
            else:
                # ONE per-group-capped selection for ALL searches (a
                # filter+sort+limit+count execution per search_id was
                # one Dataset run per search per round): group_topk
                # with a {search_id: remaining} cap map — smallest
                # discovered_seq first, url tiebreak (seqs are unique
                # by construction; the tiebreak pins determinism
                # anyway)
                from .sampling import group_topk

                listings_next = cand.filter(expr="depth == 0")
                n_survivors += n_listing_cand
                remaining = {sid: cap - ads_admitted[sid]
                             for sid, cap in max_counts.items()
                             if cap - ads_admitted[sid] > 0}
                if remaining:
                    picked = group_topk(
                        cand.filter(expr="depth == 1"), "search_id",
                        "discovered_seq", remaining, descending=False,
                        tiebreak_col="url").materialize()
                    from ..functions.blocks import collect_pandas

                    per_sid = collect_pandas(
                        picked.map_batches(
                            lambda b: b.groupby("search_id", as_index=False)
                            .size().rename(columns={"size": "n"}),
                            batch_format="pandas"),
                        {"search_id": np.int64, "n": np.int64})
                    for sid, n_picked in per_sid.groupby("search_id")["n"] \
                            .sum().items():
                        ads_admitted[int(sid)] += int(n_picked)
                        n_survivors += int(n_picked)
                    nxt_frontier = listings_next.union(picked)
                else:       # unreachable: remaining empty ⟺ the
                    nxt_frontier = listings_next   # exhausted branch
        else:
            nxt_frontier = None
        _mark("cap")

        # ---- seal: register survivors in the seen set + write frontier -
        n_next = n_survivors + carry_count
        frontier_path = os.path.join(rdir, "frontier")
        if nxt_frontier is not None:
            if carry_ds is not None:
                # carried rows are ALREADY-admitted frontier (seen,
                # capped) — they bypass dedup/seen-check/cap entirely
                nxt_frontier = nxt_frontier.union(carry_ds)
            # single execution: seen-add fused with the frontier write
            storage.write_dataset(
                nxt_frontier.map_batches(SeenFilterClient(seen, op="add"),
                                         batch_format="pyarrow"),
                frontier_path)
        elif carry_ds is not None:
            storage.write_dataset(carry_ds, frontier_path)
        else:
            storage.write_table(_frontier_table([]), frontier_path)
        next_digest = 0
        if cfg.lineage_level == "full" and n_next > 0:
            n_next, next_digest = ckpt.dataset_digest(
                storage.read_dataset(frontier_path))
        pending_count = n_next
        _mark("seal")
        lineage.append({"round": r, "partition_id": -1, "stage": "frontier_out",
                        "input_digest": cand_digest, "output_digest": next_digest,
                        "rows_in": n_cand, "rows_out": n_next, "wall_ms": 0})
        ckpt.commit_round(cfg.out_dir, r, counters={
            "ads_admitted": ads_admitted, "frontier_empty": n_next == 0,
            "n_fetched": n_fetch, "n_candidates": n_cand,
            "n_fetched_total": n_fetched_total, "phase_sec": phases},
            lineage_rows=lineage, seen_actors=seen)
        if cfg.verbose:
            print(f"round {r}: fetched={n_fetch} cand={n_cand} "
                  f"next={n_next} phases={phases}")
        if n_next == 0:
            return _result(cfg, r + 1, t0, n_fetched_total)
    return _result(cfg, cfg.max_rounds, t0, n_fetched_total)


def _partial_max(batch: pa.Table) -> pa.Table:
    """Per-batch lexicographic max of (priority, discovered_seq)."""
    if batch.num_rows == 0:   # sort+limit can hand truncated empty blocks
        return pa.table({"priority": pa.array([], pa.int64()),
                         "discovered_seq": pa.array([], pa.int64())})
    pr = batch["priority"].to_pylist()
    sq = batch["discovered_seq"].to_pylist()
    p, s = max(zip(pr, sq))
    return pa.table({"priority": pa.array([p], pa.int64()),
                     "discovered_seq": pa.array([s], pa.int64())})


def _trace_batch(batch: pa.Table) -> pa.Table:
    kinds = batch["kind"].to_pylist()
    actions = [_ACTION.get(k, "fetch_404") for k in kinds]
    return pa.table({
        "round": batch["round"], "priority": batch["priority"],
        "discovered_seq": batch["discovered_seq"], "url": batch["url"],
        "action": pa.array(actions, pa.string()),
    })


def _resolve_links(batch: pa.Table) -> pa.Table:
    """Native mode: proper RFC 3986 resolution of the RAW hrefs against
    the page URL — the documented fix of the reference's path-replacing
    M5 (full-URL hrefs stay on their own host instead of being mangled)."""
    from urllib.parse import urljoin

    pages = batch["page_url"].to_pylist()
    raws = batch["href_raw"].to_pylist()
    fixed = [urljoin(p, h) for p, h in zip(pages, raws)]
    return batch.set_column(batch.schema.get_field_index("url"), "url",
                            pa.array(fixed, pa.string()))


def _doc_finalize(round_: int):
    def fin(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        # doc_id is the CANONICAL url (schema.py contract — and the
        # identity the seen filter deduped on): textual variants that
        # canonicalize identically ("HTTP://Host/x", explicit default
        # port) fetch once and must also key their document identically
        cols = {"doc_id": pa.array([canonicalize(u) for u in
                                    batch["url"].to_pylist()], pa.string()),
                "spans": batch["spans"],
                "search_id": batch["search_id"],
                "fetched_seq": batch["discovered_seq"],
                "round": pa.array([round_] * n, pa.int32())}
        return pa.table(cols)
    return fin


def _load_robots(pages_dir: str) -> dict[str, str]:
    """Robots rows only, via parquet predicate pushdown — never loads the
    page store's HTML column wholesale onto the driver."""
    import pyarrow.dataset as pads

    dset = pads.dataset(pages_dir, format="parquet")
    rb = dset.to_table(columns=["url", "html"],
                       filter=pads.field("kind") == "robots")
    return {host_of(u): h for u, h in
            zip(rb["url"].to_pylist(), rb["html"].to_pylist())}


def _result(cfg: CrawlConfig, rounds: int, t0: float,
            n_fetched: int | None = None) -> CrawlResult:
    docs = read_documents(cfg.out_dir)
    n_docs = docs.count() if docs is not None else 0
    trace = read_trace(cfg.out_dir) if cfg.collect_trace else []
    return CrawlResult(cfg.out_dir, rounds, n_docs,
                       n_fetched if n_fetched is not None else len(trace),
                       trace, time.monotonic() - t0)


def read_documents(out_dir: str):
    """Dataset over every committed round's documents, ordered by
    (round, fetched_seq) when consumed with sort."""
    flat = os.path.join(out_dir, "documents")   # conformance-mode layout
    if os.path.isdir(flat):
        return storage.read_dataset(flat)
    paths = []
    r = ckpt.latest_complete_round(out_dir)
    if r is None:
        return None
    for i in range(r + 1):
        p = os.path.join(ckpt.round_dir(out_dir, i), "documents")
        if os.path.isdir(p):
            paths.extend(os.path.join(p, f) for f in sorted(os.listdir(p))
                         if f.endswith(".parquet"))
    if not paths:
        return None
    return storage.read_dataset(paths)


def explode_spans(ds):
    """documents (doc_id, spans, fetched_seq) → flat span rows, ordered —
    the conformance payload as a hashable flat table."""
    import pyarrow as pa

    def explode(b: pa.Table) -> pa.Table:
        # fully vectorized Arrow explode: list_parent_indices gives each
        # flattened span's source row (no Python loop over spans);
        # chunk-combine guard shared with corpus.pack_interleaved
        import pyarrow.compute as pc

        from ..functions.blocks import explode_list_column

        parent, flat = explode_list_column(b["spans"])
        return pa.table({
            "doc_id": pc.take(b["doc_id"], parent).cast(pa.string()),
            "fetched_seq": pc.take(b["fetched_seq"], parent).cast(pa.int64()),
            "offset": pc.struct_field(flat, "offset").cast(pa.int32()),
            "kind": pc.struct_field(flat, "kind").cast(pa.string()),
            "text": pc.struct_field(flat, "text").cast(pa.string()),
            "media_ref": pc.struct_field(flat, "media_ref").cast(pa.string()),
        })

    return ds.map_batches(explode, batch_format="pyarrow") \
        .sort(["fetched_seq", "offset"])


def span_fingerprints(ds):
    """documents (doc_id, spans) → (doc_id, n_spans, span_fp): an
    ORDER-SENSITIVE uint64 fingerprint of each document's span sequence
    over exactly the conformance tuple (kind, text, media_ref, order).
    Batch-local and vectorized — one blake2b per span field plus fmix
    folds, position baked into every term so any reorder changes the
    digest; only the narrow fingerprint rows ever leave the worker
    (``span_diff`` shuffles these, never document payloads)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..functions.blocks import explode_list_column
    from ..functions.hashing import hash64_array, mix64

    def fp(b: pa.Table) -> pa.Table:
        n = b.num_rows
        if n == 0:
            return pa.table({"doc_id": pa.array([], pa.string()),
                             "n_spans": pa.array([], pa.int64()),
                             "span_fp": pa.array([], pa.uint64())})
        if b["spans"].null_count:
            # same loud refusal as spans._flat_spans: a null list would
            # silently fingerprint as an EMPTY doc (explode skips it),
            # making span_diff call null == [] a "match" and
            # dedup_interleaved drop one as the other's duplicate
            raise ValueError("spans column contains null lists — the "
                             "interleaved schema uses empty lists, "
                             "not null")
        parent, flat = explode_list_column(b["spans"])
        parent = np.asarray(parent, dtype=np.int64)
        counts = np.bincount(parent, minlength=n).astype(np.int64)
        kind = hash64_array(pc.struct_field(flat, "kind"))
        text = hash64_array(pc.struct_field(flat, "text"))
        media = hash64_array(pc.struct_field(flat, "media_ref"))
        # position within each doc: parent is non-decreasing, so the
        # doc's first flat index is the exclusive cumsum of counts
        first = np.concatenate(([0], np.cumsum(counts)))[parent] \
            .astype(np.uint64)
        pos = np.arange(len(parent), dtype=np.uint64) - first
        # distinct seeds per field so a kind↔text swap can't cancel;
        # pos inside every term makes the sum-fold order-sensitive
        term = mix64(kind ^ mix64(text, 1) ^ mix64(media, 2)
                     ^ mix64(pos, 3))
        sums = np.zeros(n, np.uint64)
        np.add.at(sums, parent, term)        # 0-span docs keep fp 0
        return pa.table({
            "doc_id": b["doc_id"].cast(pa.string()),
            "n_spans": pa.array(counts, pa.int64()),
            "span_fp": pa.array(sums, pa.uint64())})

    return ds.map_batches(fp, batch_format="pyarrow")


def span_diff(ds_a, ds_b, n_buckets: int = 64):
    """Per-document span-sequence equality between two interleaved
    tables — the engine's correctness bar (per-row span-sequence
    equality on kind, text, media_ref, order) as a distributed QA
    operator, for checking an engine run against a reference dump or
    two runs against each other. Returns ``(doc_id, status)`` sorted by
    doc_id, status ∈ {match, mismatch, only_a, only_b}.

    Both sides reduce to ``span_fingerprints`` rows first, so the only
    exchange is a doc_id-hash bucket shuffle of (doc_id, n_spans,
    span_fp, side) — document payloads never move, and equality is one
    vectorized (n_spans, span_fp) comparison per bucket (64-bit digest:
    a false match is a ~2⁻⁶⁴ collision). doc_id must be unique within
    each side (duplicate ids raise — the diff would be ambiguous)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from ..functions.hashing import hash64_array

    def tag(side):
        def fn(b: pa.Table) -> pa.Table:
            # bucket via the shared bucket_of (fmix on the content
            # hash) — raw `% n_buckets` is the one partitioning
            # pattern the codebase bans (see dedup_min_seq)
            from ..functions.hashing import bucket_of

            h = hash64_array(b["doc_id"]).astype(np.int64)
            return b.append_column(
                "side", pa.array([side] * b.num_rows, pa.string())) \
                .append_column("_bucket",
                               pa.array(bucket_of(h, n_buckets),
                                        pa.int32()))
        return fn

    both = span_fingerprints(ds_a) \
        .map_batches(tag("a"), batch_format="pyarrow") \
        .union(span_fingerprints(ds_b)
               .map_batches(tag("b"), batch_format="pyarrow"))

    def diff(g: pd.DataFrame) -> pd.DataFrame:
        dup = g.duplicated(["doc_id", "side"])
        if dup.any():
            raise ValueError(
                f"span_diff: duplicate doc_id within one side, e.g. "
                f"{g.loc[dup, 'doc_id'].iloc[0]!r} — diff is ambiguous")
        g = g.copy()
        # compare digests as STRINGS: a pivot inserting NaN would cast
        # uint64 to float64 and silently round the top 11 bits away
        g["key"] = (g["n_spans"].astype("int64").astype(str) + ":"
                    + g["span_fp"].astype("uint64").astype(str))
        p = g.pivot(index="doc_id", columns="side", values="key")

        def col(side):
            return p[side] if side in p.columns \
                else pd.Series(pd.NA, index=p.index)

        ka, kb = col("a"), col("b")
        has_a, has_b = ka.notna(), kb.notna()
        status = np.where(
            has_a & has_b,
            np.where((ka == kb).fillna(False), "match", "mismatch"),
            np.where(has_a, "only_a", "only_b"))
        return pd.DataFrame({"doc_id": p.index.astype(str),
                             "status": status})

    return both.groupby("_bucket") \
        .map_groups(diff, batch_format="pandas").sort("doc_id")



def read_trace(out_dir: str) -> list[tuple[int, str, str]]:
    """Visit order across rounds: (seq, url, action), seq densified in
    (round, priority, discovered_seq) order. Driver-side — used for
    conformance assertions on fixture-scale traces only."""
    r = ckpt.latest_complete_round(out_dir)
    if r is None:
        return []
    rows = []
    for i in range(r + 1):
        p = os.path.join(ckpt.round_dir(out_dir, i), "trace")
        if os.path.isdir(p) and any(f.endswith(".parquet") for f in os.listdir(p)):
            t = storage.read_table(p)
            rows.extend(zip(t["round"].to_pylist(), t["priority"].to_pylist(),
                            t["discovered_seq"].to_pylist(),
                            t["url"].to_pylist(), t["action"].to_pylist()))
    rows.sort(key=lambda x: (x[0], x[1], x[2]))
    return [(i, url, action) for i, (_, _, _, url, action) in enumerate(rows)]


# =========================================================== conformance
def crawl_conformance(cfg: CrawlConfig, seed_url: str, count: int) -> CrawlResult:
    """Reference E1 bug-for-bug (quirks Q1/Q2/Q3) as a Ray Data pipeline.

    The unfold's iterations are data-dependent only through
    len(page0_links): one listing fetch tells us L, after which the whole
    remaining stream (the same L links repeated ceil(count/L)−1 more
    times, truncated to ``count``) is ONE Dataset pass — parallel
    execution, sequential semantics restored by the seq column sort.
    A fetch_404 kills the job at its position in the stream (reference
    OlxServer.scala:56-58: error → job dies, partial output persists)."""
    import math

    t0 = time.monotonic()
    import shutil
    if os.path.isdir(os.path.join(cfg.out_dir, "documents")):
        shutil.rmtree(os.path.join(cfg.out_dir, "documents"))
    os.makedirs(cfg.out_dir, exist_ok=True)
    fetch_kwargs = {"pages_dir": cfg.pages_dir, "gates": None,
                    "latency_scale": cfg.latency_scale}

    # --- iteration 0: fetch + parse the seed listing page --------------
    seed_tbl = pa.table({"url": [seed_url], "search_id": pa.array([1], pa.int64())})
    listing = rd.from_arrow(seed_tbl).map_batches(
        fetch_batch, fn_kwargs=fetch_kwargs, batch_format="pyarrow",
        batch_size=4).materialize()
    lrow = listing.take(1)[0]
    if lrow["status"] != "fetched":
        return CrawlResult(cfg.out_dir, 0, 0, 1,
                           [(0, seed_url, "fetch_404")], time.monotonic() - t0)
    links_tbl = listing.map_batches(ParseListings(), batch_format="pyarrow") \
        .to_arrow_refs()
    links = pa.concat_tables(ray.get(links_tbl))["url"].to_pylist()
    n_links = len(links)

    trace: list[tuple[int, str, str]] = []
    seq = 0
    if n_links == 0:
        # Q2+Q3: left never decreases → reference spins forever. The
        # engine detects the no-progress unfold and stops after one
        # iteration, recording the visit.
        trace.append((0, seed_url, "fetch_listing"))
        return CrawlResult(cfg.out_dir, 1, 0, 1, trace, time.monotonic() - t0)

    iterations = max(1, math.ceil(count / n_links))
    # --- the ad stream: links × iterations, take(count) -----------------
    stream: list[str] = []
    while len(stream) < count and len(stream) < iterations * n_links:
        stream.extend(links[: count - len(stream)])
    ads_tbl = pa.table({
        "url": pa.array(stream, pa.string()),
        "emit_idx": pa.array(range(len(stream)), pa.int64()),
        "search_id": pa.array([1] * len(stream), pa.int64()),
    })
    # from_arrow yields ONE block and task parallelism == block count:
    # repartition before the sleep-holding fetch (same rule as the
    # native loop above) or the whole ad stream fetches serially
    n_parts = max(cfg.fetcher_concurrency * 4,
                  len(stream) // max(1, cfg.fetch_batch_size))
    fetched = rd.from_arrow(ads_tbl) \
        .repartition(min(n_parts, 512)) \
        .map_batches(fetch_batch, fn_kwargs=fetch_kwargs,
                     batch_format="pyarrow",
                     batch_size=cfg.fetch_batch_size, num_cpus=1) \
        .materialize()
    # job-death semantics: truncate at the first non-fetched status.
    # Driver-side take_all is COUNT-BOUNDED here: the stream is capped at
    # `count` (the user-requested conformance budget, reference takes the
    # same) and carries only (emit_idx, status) — never documents/HTML.
    status_rows = fetched.select_columns(["emit_idx", "status"]) \
        .sort("emit_idx").take_all()
    death_at = next((row["emit_idx"] for row in status_rows
                     if row["status"] != "fetched"), None)
    limit = len(stream) if death_at is None else death_at

    docs = (fetched
            .filter(expr=f"emit_idx < {limit} and status == 'fetched'")
            .map_batches(ParseAds(native=False), batch_format="pyarrow",
                         batch_size=cfg.parse_batch_size))
    storage.write_dataset(
        docs.map_batches(_conf_doc_finalize, batch_format="pyarrow"),
        os.path.join(cfg.out_dir, "documents"))

    # --- reconstruct the sequential trace (golden algorithm shape) ------
    emitted = 0
    dead = False
    rounds_traced = 0          # actual listing fetches, not the planned
    for _ in range(iterations):  # unfold count (death truncates early)
        trace.append((seq, seed_url, "fetch_listing"))
        seq += 1
        rounds_traced += 1
        for url in links:
            if emitted >= count:
                break
            if death_at is not None and emitted == death_at:
                trace.append((seq, url, "fetch_404"))
                seq += 1
                dead = True
                break
            trace.append((seq, url, "fetch_ad"))
            seq += 1
            emitted += 1
        if dead:
            break
    n_docs = limit if death_at is not None else min(count, len(stream))
    return CrawlResult(cfg.out_dir, rounds_traced, n_docs, seq, trace,
                       time.monotonic() - t0)


def _conf_doc_finalize(batch: pa.Table) -> pa.Table:
    return pa.table({"doc_id": batch["doc_id"], "spans": batch["spans"],
                     "search_id": batch["search_id"],
                     "fetched_seq": batch["emit_idx"],
                     "round": pa.array([0] * batch.num_rows, pa.int32())})


def main(argv: list[str] | None = None) -> None:
    """CLI: ``python -m olx_ray.pipelines.crawl --tier t1 --mode native
    --out /tmp/crawl [--resume] [--budget N]`` — the ``ray job submit``
    entry point (replaces the reference's HTTP control plane,
    SURVEY.md §2.11)."""
    import argparse

    import ray as _ray

    ap = argparse.ArgumentParser()
    ap.add_argument("--tier", default="t1")
    ap.add_argument("--mode", default="native",
                    choices=["native", "conformance"])
    ap.add_argument("--out", required=True)
    ap.add_argument("--site", default=None,
                    help="existing site dir (default: generate under out/site)")
    ap.add_argument("--budget", type=int, default=None)
    ap.add_argument("--latency-scale", type=float, default=0.0)
    ap.add_argument("--concurrency", type=int, default=4)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--trace", action="store_true",
                    help="write per-visit trace tables and load the "
                         "full visit history into the result (test/"
                         "debug aid — O(total fetches) driver memory; "
                         "off by default for production crawls)")
    args = ap.parse_args(argv)

    owns_session = not _ray.is_initialized()
    if owns_session:
        _ray.init(address="local", include_dashboard=False,
                  logging_level="ERROR")
    from ..sources.sitegen import SiteSpec, ensure_site

    site_root = args.site or os.path.join(args.out, "site")
    ensure_site(args.tier, site_root)
    cfg = CrawlConfig(pages_dir=os.path.join(site_root, "pages"),
                      out_dir=os.path.join(args.out, args.mode),
                      mode=args.mode, budget_per_round=args.budget,
                      latency_scale=args.latency_scale,
                      fetcher_concurrency=args.concurrency,
                      resume=args.resume, collect_trace=args.trace)
    site = SiteSpec(args.tier)
    if args.mode == "native":
        res = crawl_native(cfg, site.seed_rows())
    else:
        res = crawl_conformance(cfg, site.listing(0).url, site.max_count)
    print({"rounds": res.rounds, "documents": res.n_documents,
           "fetched": res.n_fetched, "wall_sec": round(res.wall_sec, 2)})
    if owns_session:   # never tear down a session the caller owns
        _ray.shutdown()


if __name__ == "__main__":
    main()
