"""Resumable partitioned output (the "Resumable output" design rule).

``export_shards`` writes any keyed Dataset as one directory per
key-hash shard (``shard=K/`` hive layout, single streaming
``write_parquet`` pass) and commits each shard with an atomic manifest
AFTER the write completes. A re-run skips every shard whose manifest
exists and wipes-then-rewrites the ones that died mid-write — a failed
100 TB export resumes where it stopped instead of rewriting
everything. The same pattern the crawl uses per round
(``state/checkpoint.py``), exposed for the corpus/export side.

Shard assignment is ``bucket_of(key)`` (fmix64 — structured id spaces
spread), so re-runs and readers agree on placement deterministically.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .. import storage


def _shard_dir(out_dir: str, s: int) -> str:
    return os.path.join(out_dir, f"shard={s}")


def _manifest_path(out_dir: str, s: int) -> str:
    return os.path.join(_shard_dir(out_dir, s), "MANIFEST.json")


_FOLD_HISTORY = "FOLD_HISTORY.json"


def _fold_manifest_path(out_dir: str, s: int) -> str:
    return os.path.join(_shard_dir(out_dir, s), "MANIFEST_FOLD.json")


def _fold_history(out_dir: str) -> dict:
    """The layout's fold record: ``pending`` (round names staged+
    committed but not yet physically finalized) and ``folded_ids``
    (every round id EVER folded — permanent, so a round id can never
    be re-appended and silently duplicate its rows)."""
    man = storage.read_manifest(os.path.join(out_dir, _FOLD_HISTORY))
    return man if man is not None else {"pending": [], "folded_ids": []}


def folded_round_ids(out_dir: str) -> set[int]:
    """Round ids retired — or MID-RETIREMENT — into the base layout:
    the APPENDER-facing view. A round whose ``promoting`` marker is
    committed counts as folded here even before ``folded_ids`` records
    it: its shards are partly renamed into the base already, so a
    re-append would both duplicate those rows and wedge the promotion
    resume on the rename-collision check (review finding). Readers use
    the raw ``folded_ids`` (via ``appended_round_dirs``), which keeps
    serving a mid-promotion round's unmoved shards."""
    hist = _fold_history(out_dir)
    ids = set(hist["folded_ids"])
    prom = hist.get("promoting")
    if prom:
        try:
            ids.add(int(str(prom).split("=", 1)[1]))
        except ValueError:
            pass
    return ids


def refuse_folded_round(out_dir: str, round_id: int,
                        appender: str) -> None:
    """THE folded-round guard — every appender that exports under
    ``round=<id>`` calls this first (one definition at the layer that
    owns FOLD_HISTORY, instead of per-appender copies that drift)."""
    if round_id in folded_round_ids(out_dir):
        raise ValueError(
            f"{appender}: round {round_id} was already folded into "
            f"{out_dir}'s base shards (fold_rounds) — re-appending it "
            f"would duplicate every one of its rows; use a fresh "
            f"round id")


def consistent_union_read(out_dir: str, read_fn):
    """Run ``read_fn()`` (a base + append-rounds discovery) under a
    fold-history stability check: the history is read before and after
    and the discovery retried until both reads agree. A fold COMMIT
    landing between a reader's base walk and its round walk would
    otherwise silently drop (walked base first) or double-serve
    (walked rounds first) every folded round's rows. After a
    consistent discovery, a fold that finalizes before execution can
    only fail LOUD (FileNotFoundError on the deleted round files —
    the documented snapshot-then-delete contract), never silently."""
    for _ in range(10):
        h0 = _fold_history(out_dir)
        res = read_fn()
        if _fold_history(out_dir) == h0:
            return res
    raise RuntimeError(
        f"{out_dir}: fold history kept changing during discovery — "
        f"maintenance is running continuously; retry when it settles")


def export_shards(ds, out_dir: str, key: str = "doc_id",
                  n_shards: int = 16, assign: str = "hash") -> dict:
    """Write ``ds`` into ``n_shards`` shards under ``out_dir``.

    ``assign="hash"`` (default): shard = ``bucket_of(key)`` — uniform
    placement for resumable bulk export. ``assign="value"``: shard =
    the key column's own value (must already be ``0..n_shards-1``, e.g.
    an IVF cell id) — the PARTITION-PRUNED layout where readers open
    only the shards they probe.

    Returns ``{"written": [...], "skipped": [...], "rows": {shard: n}}``.
    Complete shards (manifest present) are skipped untouched; pending
    shard directories are wiped first so fragments from a crashed
    attempt can't sit beside this run's files. Data files land BEFORE
    the manifest, and the manifest rename is atomic — a kill at any
    point leaves each shard either complete or cleanly restartable."""
    from ..functions.blocks import ensure_arrow_schema

    # pandas-origin (or mixed) blocks report numpy dtypes in schema()
    # — the Arrow field construction below needs a real Arrow schema
    ds = ensure_arrow_schema(ds)
    os.makedirs(out_dir, exist_ok=True)
    done = set()
    rows: dict[int, int] = {}
    for s in range(n_shards):
        man = storage.read_manifest(_manifest_path(out_dir, s))
        if man is None:
            continue
        # resume is only sound under IDENTICAL placement parameters: a
        # different n_shards/key/assign would leave the same row both in
        # a skipped old shard and a newly written one (silent duplicates)
        got = (man.get("n_shards"), man.get("key"),
               man.get("assign", "hash"))
        if got != (n_shards, key, assign):
            raise ValueError(
                f"{out_dir} shard {s} was exported with "
                f"(n_shards, key, assign)={got}, current call uses "
                f"{(n_shards, key, assign)}; resume requires identical "
                f"placement parameters — export to a fresh directory")
        done.add(s)
        rows[s] = man["rows"]
    pending = [s for s in range(n_shards) if s not in done]
    # shards beyond n_shards from an earlier wider export would also
    # duplicate rows — refuse those too
    stray = [name for name in os.listdir(out_dir) if name.startswith("shard=")
             and int(name.split("=", 1)[1]) >= n_shards
             and storage.read_manifest(_manifest_path(
                 out_dir, int(name.split("=", 1)[1]))) is not None]
    if stray:
        raise ValueError(f"{out_dir} holds committed shards outside "
                         f"[0, {n_shards}): {stray}; export to a fresh "
                         f"directory")
    if pending:
        for s in pending:
            shutil.rmtree(_shard_dir(out_dir, s), ignore_errors=True)
        pend = np.array(sorted(pending), dtype=np.int64)

        def add_shard(b: pa.Table) -> pa.Table:
            if assign == "value":
                sh = b[key].to_numpy(zero_copy_only=False).astype(np.int64)
                if len(sh) and (sh.min() < 0 or sh.max() >= n_shards):
                    raise ValueError(
                        f"assign='value' requires {key} in [0, {n_shards})")
                sh = sh.astype(np.int32)
            else:
                # joins._key_hashes ≡ mix64 for integer keys (placement
                # identical to the historical bucket_of, so resumes of
                # old int-keyed exports stay sound) and adds STRING key
                # support (interleaved doc_ids are canonical URLs)
                from ..functions.joins import _key_hashes

                sh = (_key_hashes(b[key]) % np.uint64(n_shards)) \
                    .astype(np.int32)
            t = b.append_column("shard", pa.array(sh, pa.int32()))
            # resume: only PENDING shards are (re)written
            return t.filter(pa.array(np.isin(sh, pend))) \
                if len(pend) < n_shards else t

        sharded = ds.map_batches(add_shard, batch_format="pyarrow")
        # schema sidecar: a zero-row parquet carrying the FILE schema,
        # so read_shards of only-empty shards still yields the right
        # columns instead of a schemaless table. Derived from the INPUT
        # dataset's schema (metadata-only for parquet reads) — the only
        # column add_shard adds is `shard`, which the hive write moves
        # into the path anyway, so asking `sharded` would force the
        # add_shard stage to execute once just for the sidecar.
        sch = ds.schema()
        file_schema = pa.schema(
            [pa.field(n, t) for n, t in zip(sch.names, sch.types)
             if n != "shard"])
        # temp+rename like every other marker here: a kill mid-write
        # must never leave a truncated sidecar a later read trusts
        sidecar = os.path.join(out_dir, "_schema.parquet")
        tmp = os.path.join(out_dir, ".tmp-_schema.parquet")
        pq.write_table(file_schema.empty_table(), tmp)
        os.replace(tmp, sidecar)
        sharded.write_parquet(out_dir, partition_cols=["shard"])
        for s in pending:
            sdir = _shard_dir(out_dir, s)
            os.makedirs(sdir, exist_ok=True)   # empty shard still commits
            files = [os.path.join(sdir, f) for f in os.listdir(sdir)
                     if f.endswith(".parquet")]
            # ONE footer parse per file: row count and stats come off
            # the same metadata objects
            metas = [pq.ParquetFile(f).metadata for f in files]
            n = sum(md.num_rows for md in metas)
            man = {"shard": s, "rows": n, "key": key,
                   "n_shards": n_shards, "assign": assign}
            stats = _footer_stats(metas)
            if stats:
                man["stats"] = stats
            storage.write_manifest(_manifest_path(out_dir, s), man)
            rows[s] = n
    return {"written": sorted(pending), "skipped": sorted(done),
            "rows": rows}


_STATS_MAX_STR = 256      # longest string bound a manifest records


def _footer_stats(metas) -> dict:
    """Per-shard ``{col: [min, max]}`` from parsed parquet footers'
    row-group statistics — the data-skipping index ``read_shards``'
    ``prune=`` uses. Metadata-only (no data pages read). A column is
    recorded only when EVERY row group carries SOUND min/max for it
    (a missing or doubtful stat anywhere excludes the column — pruning
    must never drop a matching row); nested leaves (dotted paths) and
    non-JSON-serializable types are skipped.

    String bounds are treated with suspicion: parquet-cpp BLANKS (not
    prefix-truncates) a stat whose value exceeds its 4096-byte
    ``max_statistics_size`` while still reporting ``has_min_max`` — an
    anti-conservative bound that would silently skip matching shards
    (observed live on pyarrow 16). Any empty or ≥``_STATS_MAX_STR``
    string bound therefore drops the column; the length cap also keeps
    free-text document content out of the JSON commit markers."""
    mins: dict[str, object] = {}
    maxs: dict[str, object] = {}
    bad: set[str] = set()
    for md in metas:
        for rg in range(md.num_row_groups):
            row = md.row_group(rg)
            for ci in range(row.num_columns):
                col = row.column(ci)
                name = col.path_in_schema
                if "." in name or name in bad:
                    continue
                st = col.statistics
                if st is None or not st.has_min_max:
                    bad.add(name)
                    continue
                mn, mx = st.min, st.max
                if isinstance(mn, bytes):
                    try:
                        mn, mx = mn.decode(), mx.decode()
                    except UnicodeDecodeError:
                        bad.add(name)
                        continue
                if not isinstance(mn, (int, float, str, bool)):
                    bad.add(name)
                    continue
                if isinstance(mn, str) and not (
                        0 < len(mn) <= _STATS_MAX_STR
                        and 0 < len(mx) <= _STATS_MAX_STR):
                    bad.add(name)      # blanked/truncated/oversized bound
                    continue
                mins[name] = mn if name not in mins else min(mins[name], mn)
                maxs[name] = mx if name not in maxs else max(maxs[name], mx)
    return {n: [mins[n], maxs[n]] for n in mins if n not in bad}


def _stats_can_match(man: dict, col: str, lo, hi) -> bool:
    """False only when the manifest's recorded bounds PROVE ``col``
    cannot fall in ``[lo, hi]``; shards without recorded stats always
    match (skipping is only ever an optimization, never a filter)."""
    st = (man.get("stats") or {}).get(col)
    return st is None or not (st[1] < lo or st[0] > hi)


def shards_for_predicate(out_dir: str, col: str, lo, hi) -> list[int]:
    """Committed shards whose recorded ``col`` [min, max] can intersect
    ``[lo, hi]`` — the file-skipping decision, exposed for testing and
    for callers driving their own reads."""
    return [s for s, man, _ in _committed(out_dir)
            if _stats_can_match(man, col, lo, hi)]


def _live_files(sdir: str, man: dict) -> list[str]:
    """The files a reader may open in a committed shard. When the
    manifest carries an explicit ``files`` list (written by
    ``compact_shards``), that list IS the live set — anything else in
    the directory is an uncommitted compaction attempt or a replaced
    original awaiting cleanup. Without the list (plain export), every
    non-dot parquet in the directory is live (the write_parquet glob
    contract)."""
    if "files" in man:
        return [os.path.join(sdir, f) for f in man["files"]]
    return [os.path.join(sdir, f) for f in sorted(os.listdir(sdir))
            if f.endswith(".parquet") and not f.startswith(".")]


def _committed(out_dir: str):
    """Yield ``(shard_id, manifest, live_files)`` for every COMMITTED
    shard in NUMERIC shard order — the single discovery walk behind
    every reader here.

    While a fold is PENDING (``fold_rounds`` committed its history
    marker but finalize hasn't renamed every staged manifest yet), a
    shard's ``MANIFEST_FOLD.json`` takes precedence — the single
    atomic history write flips ALL readers from the base+rounds view
    to the folded view at once, shard renames just catch the disk up."""
    fold_pending = bool(_fold_history(out_dir)["pending"])
    names = [n for n in os.listdir(out_dir) if n.startswith("shard=")]
    for name in sorted(names, key=lambda n: int(n.split("=", 1)[1])):
        s = int(name.split("=", 1)[1])
        man = None
        if fold_pending:
            man = storage.read_manifest(_fold_manifest_path(out_dir, s))
        if man is None:
            man = storage.read_manifest(_manifest_path(out_dir, s))
        if man is None:
            continue
        yield s, man, _live_files(os.path.join(out_dir, name), man)


def committed_shard_files(out_dir: str) -> dict[int, list[str]]:
    """``{shard_id: [file, ...]}`` for the COMMITTED shards only — the
    per-shard view of ``read_shards``'s file discovery, for callers
    that fan out one task per shard (e.g. ``semantic_dedup_indexed``)."""
    return {s: files for s, _, files in _committed(out_dir) if files}


def appended_round_dirs(out_dir: str) -> list[str]:
    """Sorted ``round=<n>`` subdirectories of a shard layout — the
    crash-safe increment appends written by ``similarity.ivf_append``
    (each round is its own ``export_shards`` run with its own
    manifests). Round-aware readers union these with the base
    directory; non-integer ``round=`` names are ignored, as are rounds
    already folded into the base by ``fold_rounds`` (their rows live
    in the base shards now; the directories are deletion-pending).
    Uses the raw ``folded_ids`` — NOT ``folded_round_ids`` — so a
    mid-promotion round's unmoved shards keep serving (the base∪rounds
    union stays exact at every promotion crash instant)."""
    folded = set(_fold_history(out_dir)["folded_ids"])
    out = []
    for name in os.listdir(out_dir) if os.path.isdir(out_dir) else []:
        if not name.startswith("round="):
            continue
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        try:
            rid = int(name.split("=", 1)[1])
        except ValueError:
            continue
        if rid not in folded:
            out.append((rid, d))
    return [d for _, d in sorted(out)]


def _merge_stats(parts: list[tuple[int, dict]]) -> dict:
    """Fold per-source ``(rows, stats)`` into one sound bounds map: a
    column survives only when EVERY source that contributes rows
    recorded bounds for it (a missing bound anywhere means that
    source's rows are unbounded for the column, so pruning on it could
    drop matches). Empty sources contribute no rows and no
    constraints."""
    live = [st for rows, st in parts if rows > 0]
    if not live:
        return {}
    common = set(live[0])
    for st in live[1:]:
        common &= set(st)
    return {c: [min(st[c][0] for st in live),
                max(st[c][1] for st in live)] for c in sorted(common)}


def _finalize_fold(out_dir: str, hist: dict) -> None:
    """Catch the disk up to a COMMITTED fold (history's ``pending`` is
    non-empty): promote each staged ``MANIFEST_FOLD.json`` to the
    shard's ``MANIFEST.json`` (atomic per shard — during the sweep
    ``_committed`` reads the identical content from whichever name
    survives), delete the folded ``round=`` directories, then clear
    ``pending``. Every step is idempotent; a kill anywhere re-runs
    cleanly from ``fold_rounds``."""
    for name in os.listdir(out_dir):
        if not name.startswith("shard="):
            continue
        s = int(name.split("=", 1)[1])
        fp = _fold_manifest_path(out_dir, s)
        if os.path.exists(fp):
            os.replace(fp, _manifest_path(out_dir, s))
    for rname in hist["pending"]:
        shutil.rmtree(os.path.join(out_dir, rname), ignore_errors=True)
    storage.write_manifest(os.path.join(out_dir, _FOLD_HISTORY),
                           {"pending": [], "folded_ids": hist["folded_ids"]})


def _finish_promotion(out_dir: str, hist: dict) -> None:
    """Complete a COMMITTED base-bootstrap promotion (history's
    ``promoting`` names the round): rename each of the round's shard
    directories (and its schema sidecar) up into ``out_dir``, delete
    the emptied round dir, then record the round id as folded. Every
    rename is atomic and the base∪rounds union stays exact at each
    instant (a moved shard serves from the base, an unmoved one from
    the round — never both); re-runs resume from wherever the renames
    stopped."""
    rname = hist["promoting"]
    rdir = os.path.join(out_dir, rname)
    rid = int(rname.split("=", 1)[1])
    if os.path.isdir(rdir):
        for name in sorted(os.listdir(rdir)):
            src = os.path.join(rdir, name)
            if name.startswith("shard=") and os.path.isdir(src):
                dst = os.path.join(out_dir, name)
                if os.path.isdir(dst):
                    raise ValueError(
                        f"promotion of {rdir}: {dst} already exists — "
                        f"the base gained shards mid-promotion; refusing "
                        f"to overwrite data")
                os.rename(src, dst)
            elif name == "_schema.parquet" and not os.path.exists(
                    os.path.join(out_dir, name)):
                os.rename(src, os.path.join(out_dir, name))
        shutil.rmtree(rdir, ignore_errors=True)
    storage.write_manifest(
        os.path.join(out_dir, _FOLD_HISTORY),
        {"pending": hist["pending"],
         "folded_ids": sorted(set(hist["folded_ids"]) | {rid})})


def fold_rounds(out_dir: str) -> dict:
    """Fold every committed ``round=<n>`` append (``ivf_append``) into
    the base shard layout — the compaction half of the append lifecycle
    (append rounds accumulate read fan-out: every query unions base +
    all rounds; folding restores the one-layout read path, after which
    ``compact_shards`` can bin-pack the shard files).

    Metadata-only and cheap: round shard files HARDLINK into the base
    shard directories (no data rewrite — rounds were exported with the
    identical placement function, so ``round=*/shard=s`` rows belong in
    base ``shard=s`` verbatim) and the per-shard manifests take the
    merged rows / files / stats.

    Crash-safe commit protocol, with the single ``FOLD_HISTORY.json``
    write as the commit point:

    1. finalize any previously committed fold (resume)
    2. validate: base complete, every round's shards committed with
       identical ``(n_shards, key, assign)``
    3. stage per shard: pin the base manifest's ``files`` list (new
       links must be invisible to pre-commit readers), hardlink round
       files in as ``fold-r<round>-<name>``, write ``MANIFEST_FOLD``
       with summed rows and soundly merged stats — all idempotent,
       invisible before the commit
    4. COMMIT: one atomic history write (``pending`` = the round
       names, ``folded_ids`` += the round ids) flips every reader —
       ``_committed`` prefers staged fold manifests while pending;
       ``appended_round_dirs`` drops folded ids forever
    5. finalize: promote fold manifests, delete round dirs, clear
       ``pending``

    A layout with NO base yet (the ingest-corpus case:
    ``ingest_increment`` writes only ``round=N`` increments) first
    BOOTSTRAPS one — the lowest round's shard directories rename up
    into ``out_dir`` (pure metadata; committed under a ``promoting``
    history marker so a crash resumes, and the base∪rounds union stays
    exact mid-rename) — and the remaining rounds then fold into it.

    ``folded_ids`` is permanent: a folded round id can never be
    re-appended (``ivf_append`` / ``ingest_increment`` refuse it),
    because its rows already live in the base shards."""
    promoted: list[int] = []
    promoted_rows = 0
    hist = _fold_history(out_dir)
    if hist.get("promoting"):
        # resume a crashed promotion; it counts as folded BY THIS call
        # (the base was empty before it, so the base total afterwards
        # is exactly the promoted round's row count)
        promoted = [int(hist["promoting"].split("=", 1)[1])]
        _finish_promotion(out_dir, hist)
        hist = _fold_history(out_dir)
        promoted_rows = sum(man["rows"]
                            for _, man, _ in _committed(out_dir))
    if hist["pending"]:
        _finalize_fold(out_dir, hist)
        hist = _fold_history(out_dir)
    rounds = appended_round_dirs(out_dir)
    if not rounds:
        return {"folded": promoted, "rows_added": promoted_rows}

    base_mans = {s: man for s, man, _ in _committed(out_dir)}
    if not base_mans:
        # bootstrap: the lowest round BECOMES the base
        r0 = rounds[0]
        rid0 = int(os.path.basename(r0).split("=", 1)[1])
        m0 = storage.read_manifest(_manifest_path(r0, 0))
        if m0 is None:
            raise ValueError(f"{r0} shard 0 uncommitted — finish the "
                             f"round export before folding")
        incomplete = [s for s in range(m0["n_shards"])
                      if storage.read_manifest(_manifest_path(r0, s))
                      is None]
        if incomplete:
            raise ValueError(f"{r0} export incomplete (shards "
                             f"{incomplete} uncommitted) — finish it "
                             f"before folding")
        # validate the rename TARGETS before committing the promoting
        # marker: a stray uncommitted shard= dir in out_dir (e.g. a
        # crashed direct export) would otherwise wedge the layout —
        # the marker is permanent, and _finish_promotion refuses to
        # overwrite data, so every later fold call would re-raise
        stray = [n for n in os.listdir(out_dir) if n.startswith("shard=")
                 and os.path.isdir(os.path.join(out_dir, n))]
        if stray:
            raise ValueError(
                f"{out_dir} holds shard directories with no committed "
                f"manifests ({sorted(stray)}) — a crashed direct export? "
                f"Remove or finish them before bootstrapping a base "
                f"from {r0}")
        promoted_rows = sum(
            storage.read_manifest(_manifest_path(r0, s))["rows"]
            for s in range(m0["n_shards"]))
        storage.write_manifest(os.path.join(out_dir, _FOLD_HISTORY),
                               {**hist, "promoting": os.path.basename(r0)})
        _finish_promotion(out_dir, {**hist,
                                    "promoting": os.path.basename(r0)})
        hist = _fold_history(out_dir)
        promoted = [rid0]
        rounds = appended_round_dirs(out_dir)
        base_mans = {s: man for s, man, _ in _committed(out_dir)}
        if not rounds:
            return {"folded": promoted, "rows_added": promoted_rows}
    any_man = next(iter(base_mans.values()))
    n_shards = any_man["n_shards"]
    key, assign = any_man["key"], any_man.get("assign", "hash")
    missing = [s for s in range(n_shards) if s not in base_mans]
    if missing:
        raise ValueError(f"{out_dir} base export incomplete (shards "
                         f"{missing} uncommitted) — finish it before "
                         f"folding")
    round_ids: list[int] = []
    rmans: dict[tuple[str, int], dict] = {}   # one read, reused below
    for d in rounds:
        rid = int(os.path.basename(d).split("=", 1)[1])
        round_ids.append(rid)
        for s in range(n_shards):
            rman = storage.read_manifest(_manifest_path(d, s))
            if rman is None:
                raise ValueError(
                    f"{d} shard {s} uncommitted — finish the round "
                    f"export before folding")
            got = (rman["n_shards"], rman["key"], rman.get("assign", "hash"))
            if got != (n_shards, key, assign):
                raise ValueError(
                    f"{d} was exported with (n_shards, key, assign)="
                    f"{got}, base uses {(n_shards, key, assign)} — "
                    f"rows would land in the wrong shards; cannot fold")
            rmans[(d, s)] = rman

    rows_added = 0
    for s in range(n_shards):
        sdir = _shard_dir(out_dir, s)
        base_man = base_mans[s]
        if "files" not in base_man:
            base_man = {**base_man,
                        "files": [os.path.basename(f) for f in
                                  _live_files(sdir, base_man)]}
            storage.write_manifest(_manifest_path(out_dir, s), base_man)
        files = list(base_man["files"])
        rows = base_man["rows"]
        parts = [(base_man["rows"], base_man.get("stats") or {})]
        for d, rid in zip(rounds, round_ids):
            rman = rmans[(d, s)]
            for src in _live_files(_shard_dir(d, s), rman):
                name = f"fold-r{rid}-{os.path.basename(src)}"
                dst = os.path.join(sdir, name)
                if not os.path.exists(dst):
                    try:
                        os.link(src, dst)
                    except OSError:   # cross-device / no-hardlink fs
                        tmp = os.path.join(sdir, f".tmp-{name}")
                        shutil.copyfile(src, tmp)
                        os.replace(tmp, dst)
                files.append(name)
            rows += rman["rows"]
            parts.append((rman["rows"], rman.get("stats") or {}))
        fold_man = {**base_man, "rows": rows, "files": files}
        merged = _merge_stats(parts)
        if merged:
            fold_man["stats"] = merged
        else:
            fold_man.pop("stats", None)
        storage.write_manifest(_fold_manifest_path(out_dir, s), fold_man)
        rows_added += rows - base_man["rows"]

    hist = {"pending": [os.path.basename(d) for d in rounds],
            "folded_ids": sorted(set(hist["folded_ids"]) | set(round_ids))}
    storage.write_manifest(os.path.join(out_dir, _FOLD_HISTORY), hist)
    _finalize_fold(out_dir, hist)
    return {"folded": sorted(promoted + round_ids),
            "rows_added": promoted_rows + rows_added}


def read_shards(out_dir: str, columns: list[str] | None = None,
                shards: list[int] | None = None,
                prune: tuple | None = None):
    """Dataset over the COMMITTED shards only (manifest present) —
    uncommitted partials from a crashed export are invisible to
    readers, mirroring the crawl's round-manifest contract. ``shards``
    restricts the read to a subset (the partition-pruning path: an IVF
    query opens only the cells it probes). ``prune=(col, lo, hi)``
    skips shards whose recorded footer stats prove ``col`` cannot fall
    in ``[lo, hi]`` (see ``shards_for_predicate``) — shard skipping
    only; callers still filter rows within the surviving shards."""
    import ray.data as rd

    wanted = None if shards is None else set(shards)
    # ONE discovery walk drives both the prune decision and the paths
    paths = [f for s, man, files in _committed(out_dir)
             if (wanted is None or s in wanted)
             and (prune is None or _stats_can_match(man, *prune))
             for f in files]
    if not paths:
        # only-empty (or no committed) shards: serve the schema sidecar
        # so the result still carries the export's columns
        sidecar = os.path.join(out_dir, "_schema.parquet")
        if os.path.exists(sidecar):
            # serve the sidecar as a zero-row Arrow block (no lazy
            # read task for a 0-row file). NOTE the schema contract is
            # Dataset-level (schema().names): Ray 2.49's to_pandas()
            # drops columns for ANY zero-row dataset
            tbl = pq.read_table(sidecar)
            if columns is not None:
                tbl = tbl.select(columns)
            return rd.from_arrow(tbl)
        return rd.from_arrow(pa.table({}))
    return rd.read_parquet(paths, columns=columns)


def read_layout(out_dir: str, columns: list[str] | None = None):
    """Dataset over the WHOLE layout: the committed base shards
    unioned with every live ``round=`` append — the one-call reader
    for an accumulating corpus (``ingest_increment`` output) that is
    correct at every lifecycle state: rounds-only (no base yet),
    base+rounds, mid-``fold_rounds`` at either crash point, and fully
    folded. Folded rounds never double-serve (``appended_round_dirs``
    excludes their ids), and the base/round discovery runs under
    ``consistent_union_read`` so a concurrent fold commit can't split
    the view."""
    def discover():
        return [read_shards(d, columns=columns)
                for d in [out_dir] + appended_round_dirs(out_dir)]

    parts = consistent_union_read(out_dir, discover)
    # drop schema-less placeholders (a part with neither committed
    # shards nor a sidecar) — metadata-only, no execution triggered
    live = [p for p in parts
            if p.schema() is not None and p.schema().names]
    if not live:
        return parts[0]
    return live[0].union(*live[1:]) if len(live) > 1 else live[0]


def _compact_one(sdir: str, man_path: str, target_bytes: int) -> dict:
    """Compact one committed shard (runs as a Ray task — shards are
    independent, so compaction parallelism == shard count).

    Crash-safe commit protocol, with the manifest's ``files`` list as
    the single commit point:

    1. delete anything in the directory that is neither live nor the
       manifest (garbage from a crashed attempt / replaced originals)
    2. if the manifest has no ``files`` list yet, backfill one
       atomically — pins the live set before new files appear
    3. stream the live files' row groups into ``cmp-<gen>-<i>.parquet``
       writers, rolling at ~``target_bytes`` (one row group in memory
       at a time — never the whole shard)
    4. atomically swap the manifest's ``files`` to the new list (THE
       commit — readers flip from all-old to all-new, never a mix)
    5. delete the old files (now unlisted; a kill before this leaves
       garbage that step 1 of the next run removes)
    """
    import uuid

    man = storage.read_manifest(man_path)
    live = ([f for f in man["files"]] if "files" in man else
            sorted(f for f in os.listdir(sdir)
                   if f.endswith(".parquet") and not f.startswith(".")))
    for f in os.listdir(sdir):
        # MANIFEST_FOLD.json is never garbage: compact_shards finalizes
        # COMMITTED folds before dispatching (see its preamble), so one
        # here is either staging for an uncommitted fold (whose
        # fold-r* links are disposable — fold_rounds re-stages
        # idempotently from the round dirs — but whose manifest must
        # not vanish mid-write of a concurrent fold) or a leftover the
        # next fold run overwrites anyway.
        if f in ("MANIFEST.json", "MANIFEST_FOLD.json") or f in live:
            continue
        os.remove(os.path.join(sdir, f))
    # gain check: a shard already at target density (e.g. eight 128 MB
    # files of a 1 GB shard) would re-emit the same file count — skip,
    # so periodic re-runs don't rewrite the whole export each time
    total = sum(os.path.getsize(os.path.join(sdir, f)) for f in live)
    n_out_est = max(1, -(-total // target_bytes))
    if len(live) <= max(1, n_out_est):
        return {"shard": man["shard"], "before": len(live),
                "after": len(live), "compacted": False}
    if "files" not in man:
        storage.write_manifest(man_path, {**man, "files": live})
    gen = uuid.uuid4().hex[:12]
    schema = pq.ParquetFile(os.path.join(sdir, live[0])).schema_arrow
    new_files: list[str] = []
    writer, written, rows = None, 0, 0
    try:
        for f in live:
            pf = pq.ParquetFile(os.path.join(sdir, f))
            for g in range(pf.metadata.num_row_groups):
                if writer is None:
                    name = f"cmp-{gen}-{len(new_files)}.parquet"
                    new_files.append(name)
                    writer = pq.ParquetWriter(
                        os.path.join(sdir, name), schema)
                    written = 0
                rg = pf.read_row_group(g).cast(schema)
                writer.write_table(rg)
                rows += rg.num_rows
                # roll on COMPRESSED bytes — the on-disk size is what
                # the file-count target is about; uncompressed
                # total_byte_size would land files a compression-ratio
                # factor below target (row-group meta only exposes the
                # compressed size per column chunk)
                rgm = pf.metadata.row_group(g)
                written += sum(rgm.column(c).total_compressed_size
                               for c in range(rgm.num_columns))
                if written >= target_bytes:
                    writer.close()
                    writer = None
    finally:
        if writer is not None:
            writer.close()
    if rows != man["rows"]:   # paranoia: never commit a lossy rewrite
        for name in new_files:
            os.remove(os.path.join(sdir, name))
        raise RuntimeError(
            f"compaction of {sdir} produced {rows} rows, manifest says "
            f"{man['rows']} — aborted, shard left untouched")
    storage.write_manifest(man_path, {**man, "files": new_files})
    for f in live:
        os.remove(os.path.join(sdir, f))
    return {"shard": man["shard"], "before": len(live),
            "after": len(new_files), "compacted": True}


def compact_shards(out_dir: str, target_bytes: int = 128 << 20) -> dict:
    """Bin-pack each committed shard's fragment files into ~128 MB
    parquet files — the small-file compaction a 100 TB export needs.

    ``write_parquet(partition_cols=...)`` emits one file per producing
    task per shard, so a B-block export over S shards can leave O(B·S)
    tiny files whose per-file open/footer overhead then dominates every
    downstream read. Compaction runs one Ray task per shard (raw task,
    not a Dataset op: the unit of work is a directory rewrite with a
    filesystem commit, which ``map_batches`` can't express), each
    streaming row groups — memory stays bounded by one row group
    regardless of shard size. Idempotent; safe to re-run after a crash
    at ANY point (see ``_compact_one``). Reader contract: a
    ``read_shards`` call snapshots the manifest's ``files`` list, which
    flips atomically old→new — any call that starts before OR after the
    commit sees a complete, duplicate-free view; but a LAZY Dataset
    whose file list was resolved before the commit and executed after
    the old files are deleted will fail (FileNotFoundError), same as
    every snapshot-then-delete store. Don't compact under long-lived
    open readers."""
    import ray

    # catch the disk up to any COMMITTED fold first: compacting from
    # the pre-fold base manifests while MANIFEST_FOLD is the readers'
    # truth would treat the staged fold manifests and hardlinks as
    # unlisted garbage — the folded rows (whose round ids are already
    # retired in folded_ids) would be unrecoverably lost (review
    # finding, reproduced live before this guard)
    hist = _fold_history(out_dir)
    if hist.get("promoting"):
        _finish_promotion(out_dir, hist)
        hist = _fold_history(out_dir)
    if hist["pending"]:
        _finalize_fold(out_dir, hist)

    task = ray.remote(num_cpus=1)(_compact_one)
    refs = []
    for name in sorted(os.listdir(out_dir)):
        if not name.startswith("shard="):
            continue
        s = int(name.split("=", 1)[1])
        if storage.read_manifest(_manifest_path(out_dir, s)) is None:
            continue   # uncommitted shards belong to export, not us
        refs.append(task.remote(os.path.join(out_dir, name),
                                _manifest_path(out_dir, s), target_bytes))
    results = ray.get(refs)
    return {"compacted": sorted(r["shard"] for r in results if r["compacted"]),
            "skipped": sorted(r["shard"] for r in results
                              if not r["compacted"]),
            "files": {r["shard"]: (r["before"], r["after"])
                      for r in results}}


if __name__ == "__main__":     # pragma: no cover - thin CLI shim
    # layout maintenance from the command line:
    #   python -m olx_ray.pipelines.export <layout_dir> [--fold]
    #       [--compact] [--target-mb 128]
    # (CLAUDE.md: only CLI __main__ blocks own a Ray session)
    import argparse
    import json

    import ray as _ray

    ap = argparse.ArgumentParser(
        description="Shard-layout maintenance: fold append rounds "
                    "into the base and/or bin-pack shard files.")
    ap.add_argument("layout_dir")
    ap.add_argument("--fold", action="store_true",
                    help="fold committed round= appends into the base")
    ap.add_argument("--compact", action="store_true",
                    help="bin-pack each shard's files to --target-mb")
    ap.add_argument("--target-mb", type=int, default=128)
    args = ap.parse_args()
    if not (args.fold or args.compact):
        ap.error("nothing to do: pass --fold and/or --compact")
    out: dict = {}
    if args.fold:
        out["fold"] = fold_rounds(args.layout_dir)
    if args.compact:
        if not _ray.is_initialized():
            _ray.init(address="local", include_dashboard=False,
                      logging_level="ERROR")
        out["compact"] = compact_shards(
            args.layout_dir, target_bytes=args.target_mb << 20)
        _ray.shutdown()
    print(json.dumps(out, sort_keys=True))
