"""Table storage layer: Lance when available, Parquet otherwise.

BASELINE.json names Lance as the native table format. The ``lance``
package is not installed in this sandbox, so every read/write goes
through this thin facade: it uses ``lance`` when importable and falls
back to a directory of Parquet files with identical layout semantics
(append = new fragment file; atomic commit = write-temp + rename +
manifest marker). The rest of the engine only ever calls
``write_table`` / ``read_table`` / ``read_dataset`` so swapping the
format is a one-file change.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

import pyarrow as pa
import pyarrow.parquet as pq

try:  # pragma: no cover - lance not present in this sandbox
    import lance  # type: ignore

    HAVE_LANCE = True
except ImportError:
    HAVE_LANCE = False


def _is_lance(path: str) -> bool:
    return HAVE_LANCE and (path.endswith(".lance") or os.path.isdir(os.path.join(path, "_versions")))


def write_table(table: pa.Table, path: str, *, mode: str = "overwrite") -> None:
    """Write an Arrow table as a Lance dataset (if available) or a Parquet
    fragment directory. ``mode`` is "overwrite" or "append". Writes are
    atomic: data lands under a temp name and is renamed into place."""
    if HAVE_LANCE:  # pragma: no cover
        lance.write_dataset(table, path, mode=mode)
        return
    if mode == "overwrite" and os.path.isdir(path):
        shutil.rmtree(path)
    os.makedirs(path, exist_ok=True)
    frag = f"frag-{uuid.uuid4().hex}.parquet"
    tmp = os.path.join(path, f".tmp-{frag}")
    pq.write_table(table, tmp)
    os.rename(tmp, os.path.join(path, frag))


def read_table(path: str, columns: list[str] | None = None) -> pa.Table:
    """Read a whole table (driver-side, small tables only)."""
    if _is_lance(path):  # pragma: no cover
        return lance.dataset(path).to_table(columns=columns)
    if os.path.isfile(path):
        return pq.read_table(path, columns=columns)
    parts = sorted(
        os.path.join(path, f) for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith(".")
    )
    if not parts:       # write_dataset of an empty Dataset → files-less dir
        return pa.table({})
    return pa.concat_tables(pq.read_table(p, columns=columns) for p in parts)


def read_dataset(path: str, columns: list[str] | None = None):
    """Read a table as a ``ray.data.Dataset`` (the streaming path).
    A file-less directory (empty-dataset write) reads as an empty
    Dataset, honoring write_dataset's never-FileNotFound contract."""
    import ray.data as rd

    if isinstance(path, str):
        if _is_lance(path):  # pragma: no cover
            return rd.read_lance(path, columns=columns)
        if os.path.isdir(path) and not any(
                f.endswith(".parquet") and not f.startswith(".")
                for f in os.listdir(path)):
            # dot-prefixed .tmp-* leftovers from a crashed write are NOT
            # data (Arrow discovery skips them too) — counting them here
            # would make read_parquet raise on a dir with no real files,
            # breaking the never-FileNotFound contract above
            return rd.from_arrow(pa.table({}))
    return rd.read_parquet(path, columns=columns)


def write_dataset(ds, path: str) -> None:
    """Streaming sink for a ``ray.data.Dataset``. The directory is
    created even when the dataset is empty (writes zero files), so a
    later read of the table location never hits FileNotFound."""
    os.makedirs(path, exist_ok=True)
    if HAVE_LANCE:  # pragma: no cover
        ds.write_lance(path)
        return
    ds.write_parquet(path)


# ------------------------------------------------------------- manifests
def write_manifest(path: str, payload: dict) -> None:
    """Atomic JSON commit marker (temp + rename): a round / partition is
    complete iff its manifest exists — required for deterministic resume
    despite task retries (SURVEY.md §7 'hard parts')."""
    tmp = path + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(payload, f, sort_keys=True)
    os.rename(tmp, path)


def read_manifest(path: str) -> dict | None:
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)
