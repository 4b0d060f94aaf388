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
from ..functions.hashing import bucket_of


def _shard_dir(out_dir: str, s: int) -> str:
    return os.path.join(out_dir, f"shard={s}")


def _manifest_path(out_dir: str, s: int) -> str:
    return os.path.join(_shard_dir(out_dir, s), "MANIFEST.json")


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
            kv = b[key].to_numpy(zero_copy_only=False)
            if assign == "value":
                sh = kv.astype(np.int64)
                if len(sh) and (sh.min() < 0 or sh.max() >= n_shards):
                    raise ValueError(
                        f"assign='value' requires {key} in [0, {n_shards})")
                sh = sh.astype(np.int32)
            else:
                sh = bucket_of(kv, n_shards)
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
            n = sum(pq.ParquetFile(os.path.join(sdir, f)).metadata.num_rows
                    for f in os.listdir(sdir) if f.endswith(".parquet"))
            storage.write_manifest(_manifest_path(out_dir, s),
                                   {"shard": s, "rows": n, "key": key,
                                    "n_shards": n_shards, "assign": assign})
            rows[s] = n
    return {"written": sorted(pending), "skipped": sorted(done),
            "rows": rows}


def read_shards(out_dir: str, columns: list[str] | None = None,
                shards: list[int] | None = None):
    """Dataset over the COMMITTED shards only (manifest present) —
    uncommitted partials from a crashed export are invisible to
    readers, mirroring the crawl's round-manifest contract. ``shards``
    restricts the read to a subset (the partition-pruning path: an IVF
    query opens only the cells it probes)."""
    import ray.data as rd

    wanted = None if shards is None else set(shards)
    paths = []
    for name in sorted(os.listdir(out_dir)):
        if not name.startswith("shard="):
            continue
        s = int(name.split("=", 1)[1])
        if wanted is not None and s not in wanted:
            continue
        if storage.read_manifest(_manifest_path(out_dir, s)) is None:
            continue
        d = os.path.join(out_dir, name)
        paths.extend(os.path.join(d, f) for f in sorted(os.listdir(d))
                     if f.endswith(".parquet"))
    if not paths:
        # only-empty (or no committed) shards: serve the schema sidecar
        # so the result still carries the export's columns
        sidecar = os.path.join(out_dir, "_schema.parquet")
        if os.path.exists(sidecar):
            return rd.read_parquet(sidecar, columns=columns)
        return rd.from_arrow(pa.table({}))
    return rd.read_parquet(paths, columns=columns)
