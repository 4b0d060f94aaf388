"""Block-format normalization helpers.

Two Ray 2.49 internals make MIXED block formats noisy and slightly
slow on shuffle paths:

- ``PandasBlockAccessor.to_arrow`` (ray/data/_internal/pandas_block.py)
  converts via ``pa.Table.from_pandas``, which attaches ``b'pandas'``
  schema METADATA — and ``pa.Schema.__hash__`` raises on schemas with
  metadata, so every sort-reduce merge logs "Failed to hash the
  schemas (for deduplication)" AND loses ``unify_schemas``'s
  early-exit (the schema-set dedup) on every merge.
- A ``union`` of pandas-origin and Arrow-origin streams emits the
  "Operator produced a RefBundle with a different schema" warning
  even when names/types agree exactly.

The fix is to hand shuffles metadata-free ARROW blocks: ``df_arrow``
converts one pandas kernel result, ``as_arrow`` normalizes a whole
stream (fuses with the upstream map operator — no extra task wave).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


def nometa(t: pa.Table) -> pa.Table:
    return t.replace_schema_metadata(None)


def df_arrow(df: pd.DataFrame) -> pa.Table:
    """One pandas kernel result → metadata-free Arrow table (use as the
    return conversion of a ``batch_format="pandas"`` fn whose output
    feeds a sort/groupby/union)."""
    return nometa(pa.Table.from_pandas(df, preserve_index=False))


def ensure_arrow_schema(ds):
    """Return ``ds`` with a REAL Arrow schema: pandas-origin blocks
    report numpy dtypes — and a mixed stream (e.g. one EMPTY pandas
    block beside Arrow blocks) reports a schema like
    ``[DataType(int64), <class 'object'>]`` — which breaks any
    consumer building Arrow fields/null columns from ``ds.schema()``
    (bucket joins, the export sink). Ray propagates the broken input
    schema through a lazy normalization map without re-deriving it, so
    the repair MATERIALIZES the normalized stream (rare path — only
    when the schema is actually broken; Arrow datasets no-op)."""
    sch = ds.schema()
    if sch.types and all(isinstance(t, pa.DataType) for t in sch.types):
        return ds
    fixed = as_arrow(ds).materialize()
    bad = [t for t in fixed.schema().types
           if not isinstance(t, pa.DataType)]
    assert not bad, f"schema still non-Arrow after normalization: {bad}"
    return fixed


def as_arrow(ds):
    """Normalize a Dataset's blocks to metadata-free Arrow.

    ``batch_size=None`` maps WHOLE blocks — no cross-block concat, so
    this stage itself never calls ``unify_schemas`` on the (possibly
    metadata-carrying) inputs it is cleaning."""
    return ds.map_batches(nometa, batch_format="pyarrow", batch_size=None)


def explode_list_column(col):
    """``(parent_indices int64 ndarray, flat values)`` for a list
    column — the shared explode preamble for every span consumer
    (`crawl.explode_spans`, `corpus.pack_interleaved`).
    ``combine_chunks`` FIRST is load-bearing: per-chunk parent indices
    restart at 0 and would silently misattribute rows to the wrong
    document across chunk boundaries."""
    import numpy as np
    import pyarrow.compute as pc

    if getattr(col, "num_chunks", 1) > 1:
        col = col.combine_chunks()
    parent = pc.list_parent_indices(col).to_numpy(
        zero_copy_only=False).astype(np.int64)
    return parent, pc.list_flatten(col)


def list_matrix(col, dtype=None):
    """(rows, dim) ndarray from a fixed-width ``list<float>`` column —
    the shared decode of every embedding stage. Arrow-native:
    ``flatten()`` + ``reshape`` (~300× faster than
    ``np.vstack(col.to_pylist())``, which boxes every float through a
    Python object). ``flatten()`` honors slice offsets, so batch
    slices decode correctly. Ragged/null columns fall back to the
    vstack path (never happens for the embeddings schema, but a shared
    helper must not silently mis-reshape)."""
    import numpy as np
    import pyarrow.compute as pc

    dtype = dtype or np.float64
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0), dtype=dtype)
    if col.null_count == 0:
        lens = pc.list_value_length(col).to_numpy(zero_copy_only=False)
        dim = int(lens[0])
        if (lens == dim).all():
            vals = col.flatten().to_numpy(zero_copy_only=False)
            out = vals.astype(dtype, copy=False).reshape(n, dim)
            # same-dtype sources stay zero-copy Arrow views (read-only);
            # callers normalize in place, so hand out a writable array
            return out if out.flags.writeable else out.copy()
    return np.vstack(col.to_pylist()).astype(dtype)


def matrix_list(m) -> pa.Array:
    """Inverse of ``list_matrix``: (rows, dim) float ndarray → Arrow
    ``list<double>`` column from one flat buffer + arithmetic offsets —
    no per-row Python boxing (``pa.array(list(m))`` boxes every float).
    Plain list type (not fixed-size) on purpose: empty-batch tables
    declare ``list_(float64())`` and a union must stay block-type
    homogeneous."""
    import numpy as np

    m = np.ascontiguousarray(m, dtype=np.float64)
    n, d = m.shape
    offsets = pa.array(np.arange(0, (n + 1) * d, d, dtype=np.int32),
                       pa.int32())
    return pa.ListArray.from_arrays(offsets, pa.array(m.ravel()))


def collect_pandas(ds, columns: dict) -> pd.DataFrame:
    """Driver-side collect that survives the zero-row column drop:
    Ray 2.49's ``Dataset.to_pandas()`` returns a COLUMN-LESS frame for
    an empty Dataset, so every downstream ``df[col]`` raises KeyError
    on the empty-result path — a bug class that has now bitten five
    separate call sites. ``columns`` maps name → numpy/pandas dtype;
    when the collect comes back EMPTY the result is an empty frame
    with exactly those typed columns; a non-empty frame missing a
    requested column raises KeyError instead. Only for
    BOUNDED results (the caller must already have a driver-side-size
    argument — pair lists, top-k legs, drop-id sets)."""
    df = ds.to_pandas()
    if len(df) == 0 and not all(c in df.columns for c in columns):
        # Only the zero-row collect may substitute the typed empty
        # frame; a NON-empty frame missing a requested column raises
        # (df[...] KeyError below) — substituting there would silently
        # discard real rows on a caller-side column rename (e.g. an
        # empty drop-id set turning a dedup into a no-op).
        return pd.DataFrame({c: pd.Series(dtype=t)
                             for c, t in columns.items()})
    return df[list(columns)]
