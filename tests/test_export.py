"""Resumable shard export: complete shards skipped, crashed shards
rewritten, committed-only reads."""

import os

import pyarrow.parquet as pq

from olx_ray.pipelines.export import (_manifest_path, _shard_dir,
                                      export_shards, read_shards)

SF = "/root/testdata/sf0.001"
N = 8


def _docs():
    import ray.data as rd

    return rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])


def test_export_writes_all_shards_once(ray_session, tmp_path):
    out = str(tmp_path / "shards")
    res = export_shards(_docs(), out, n_shards=N)
    assert res["written"] == list(range(N)) and res["skipped"] == []
    total = pq.read_table(f"{SF}/documents.parquet").num_rows
    assert sum(res["rows"].values()) == total
    # every shard has an atomic manifest
    assert all(os.path.exists(_manifest_path(out, s)) for s in range(N))
    # read-back is lossless
    back = read_shards(out).to_pandas()
    assert len(back) == total
    assert set(back["doc_id"]) == set(
        pq.read_table(f"{SF}/documents.parquet")["doc_id"].to_pylist())


def test_export_resume_skips_complete_shards(ray_session, tmp_path):
    import shutil

    out = str(tmp_path / "shards")
    export_shards(_docs(), out, n_shards=N)
    # simulate a crash on shard 3: data written, manifest missing
    os.remove(_manifest_path(out, 3))
    mtimes = {s: os.path.getmtime(_shard_dir(out, s))
              for s in range(N) if s != 3}
    res = export_shards(_docs(), out, n_shards=N)
    assert res["written"] == [3]
    assert res["skipped"] == [s for s in range(N) if s != 3]
    # complete shards untouched
    for s, m in mtimes.items():
        assert os.path.getmtime(_shard_dir(out, s)) == m
    total = pq.read_table(f"{SF}/documents.parquet").num_rows
    assert sum(res["rows"].values()) == total
    assert len(read_shards(out).to_pandas()) == total


def test_read_shards_ignores_uncommitted(ray_session, tmp_path):
    out = str(tmp_path / "shards")
    export_shards(_docs(), out, n_shards=N)
    os.remove(_manifest_path(out, 0))       # shard 0 now "mid-write"
    back = read_shards(out).to_pandas()
    total = pq.read_table(f"{SF}/documents.parquet").num_rows
    assert 0 < len(back) < total            # shard 0 invisible


def test_read_dataset_ignores_tmp_leftovers(ray_session, tmp_path):
    """A crashed write_table leaves only a dot-prefixed .tmp-*.parquet;
    read_dataset must treat the dir as empty (never raise) — Arrow
    discovery skips dot-files, so counting them as data would make
    read_parquet fail on a dir with zero real files."""
    import pyarrow as pa

    from olx_ray import storage

    d = tmp_path / "tbl"
    d.mkdir()
    pq.write_table(pa.table({"x": [1]}), d / ".tmp-frag-dead.parquet")
    ds = storage.read_dataset(str(d))
    assert ds.count() == 0
