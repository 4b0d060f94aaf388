"""Per-round checkpointing + lineage (SURVEY.md §4.2, north_rule).

Round directory layout under the crawl's ``out_dir``::

    round-0000/
      frontier/    parquet — the NEXT round's pending frontier rows
      documents/   parquet — documents parsed THIS round (DOCUMENTS_FULL)
      trace/       parquet — visit rows (round, priority, discovered_seq, url, action)
      seen/        parquet — SEEN_SEGMENTS snapshot after this round sealed
      lineage/     parquet — per-stage row counts + order-insensitive digests
      MANIFEST.json  — atomic commit marker; a round exists iff this does

Resume = highest round with a manifest: reload its frontier + seen
segments + counters. Data files are written BEFORE the manifest, and the
manifest rename is atomic, so a kill at any point leaves either a
complete round or an ignorable partial one — deterministic resume
despite retries."""

from __future__ import annotations

import os
import re

import pyarrow as pa
import ray

from .. import storage
from ..schema import SEEN_SEGMENTS


def round_dir(out_dir: str, r: int) -> str:
    return os.path.join(out_dir, f"round-{r:04d}")


def list_round_dirs(out_dir: str) -> list[str]:
    """Names of every round directory (data rounds + the ``round-init``
    seed round) under ``out_dir``. THE single owner of the round-dir
    naming scheme — fresh-run wipes iterate this instead of re-matching
    the pattern, so a format change here can't strand stale fragments
    beside a new run's appends."""
    if not os.path.isdir(out_dir):
        return []
    return [name for name in os.listdir(out_dir)
            if name == "round-init" or re.fullmatch(r"round-\d{4,}", name)]


def manifest_path(out_dir: str, r: int) -> str:
    return os.path.join(round_dir(out_dir, r), "MANIFEST.json")


def latest_complete_round(out_dir: str) -> int | None:
    if not os.path.isdir(out_dir):
        return None
    best = None
    for name in os.listdir(out_dir):
        m = re.fullmatch(r"round-(\d{4,})", name)  # {r:04d} grows past 4 digits
        if m and os.path.exists(manifest_path(out_dir, int(m.group(1)))):
            best = max(best or -1, int(m.group(1)))
    return best


def commit_round(out_dir: str, r: int, *, counters: dict,
                 lineage_rows: list[dict], seen_actors: list) -> None:
    rd_ = round_dir(out_dir, r)
    os.makedirs(rd_, exist_ok=True)
    # seen segments snapshot (sealed at the round barrier)
    segs = ray.get([a.segment.remote() for a in seen_actors])
    seg_tbl = pa.table({
        "shard": pa.array([s["shard"] for s in segs], pa.int32()),
        "bloom_bits": pa.array([s["bloom_bits"] for s in segs], pa.large_binary()),
        "exact_hashes": pa.array([s["exact_hashes"] for s in segs], pa.large_binary()),
        "exact_alive": pa.array([s["exact_alive"] for s in segs], pa.bool_()),
        "n_items": pa.array([s["n_items"] for s in segs], pa.int64()),
        "seen_fmt": pa.array([s["seen_fmt"] for s in segs], pa.int32()),
    }, schema=SEEN_SEGMENTS)
    storage.write_table(seg_tbl, os.path.join(rd_, "seen"))
    if lineage_rows:
        from ..schema import LINEAGE

        lin = pa.table({f.name: pa.array([row.get(f.name) for row in lineage_rows],
                                         f.type) for f in LINEAGE},
                       schema=LINEAGE)
        storage.write_table(lin, os.path.join(rd_, "lineage"))
    storage.write_manifest(manifest_path(out_dir, r), {"round": r, **counters})


def restore_seen(out_dir: str, r: int, seen_actors: list) -> None:
    tbl = storage.read_table(os.path.join(round_dir(out_dir, r), "seen"))
    rows = tbl.to_pylist()
    if len(rows) != len(seen_actors):
        # hash routing is url_hash % n_shards — a different shard count
        # on resume would silently mis-route membership checks
        raise ValueError(
            f"seen checkpoint has {len(rows)} shards but the resumed crawl "
            f"configured n_seen_shards={len(seen_actors)}; resume must use "
            f"the original shard count")
    by_shard = {row["shard"]: row for row in rows}
    ray.get([a.restore.remote(by_shard[i]) for i, a in enumerate(seen_actors)])


def dataset_digest(ds, col: str = "url_hash") -> tuple[int, int]:
    """(row_count, order-insensitive uint64 digest) of a Dataset column —
    computed distributed (per-batch partial sums), merged on the driver."""
    import numpy as np
    import pyarrow as pa_

    def partial(batch: pa_.Table) -> pa_.Table:
        arr = batch[col].to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa_.table({"d": pa_.array([int(np.sum(arr, dtype=np.uint64))], pa_.uint64()),
                          "n": pa_.array([len(arr)], pa_.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    digest = 0
    n = 0
    for p in parts:
        digest = (digest + int(p["d"])) & ((1 << 64) - 1)
        n += int(p["n"])
    return n, digest
