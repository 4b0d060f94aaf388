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


def _frag_count(out, s):
    import olx_ray.pipelines.export as ex
    d = ex._shard_dir(out, s)
    return len([f for f in os.listdir(d)
                if f.endswith(".parquet") and not f.startswith(".")])


def test_compact_shards_roundtrip_and_idempotence(ray_session, tmp_path):
    """Compaction must preserve content exactly (rows, values), collapse
    multi-fragment shards to one file at a large target, and no-op on a
    second run."""
    from olx_ray.pipelines.export import (compact_shards, export_shards,
                                          read_shards)

    out = str(tmp_path / "shards")
    # many producing blocks -> several fragment files per shard
    export_shards(_docs().repartition(8), out, n_shards=4)
    before = read_shards(out).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    assert any(_frag_count(out, s) > 1 for s in range(4))
    res = compact_shards(out)
    assert sorted(res["compacted"] + res["skipped"]) == [0, 1, 2, 3]
    for s in res["compacted"]:
        assert _frag_count(out, s) == 1
    after = read_shards(out).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    assert after.equals(before)
    # idempotent: every shard now single-file -> nothing to do
    res2 = compact_shards(out)
    assert res2["compacted"] == []
    # export resume still sees the shards as complete (manifest intact)
    assert export_shards(_docs().repartition(8), out,
                         n_shards=4)["written"] == []


def test_compact_shards_crash_states(ray_session, tmp_path):
    """Readers and re-runs must be correct at every crash point: an
    uncommitted cmp- attempt is invisible and cleaned; after the
    manifest commit, stale originals are invisible and cleaned."""
    import json

    import pyarrow as pa

    import olx_ray.pipelines.export as ex
    from olx_ray import storage
    from olx_ray.pipelines.export import (compact_shards, export_shards,
                                          read_shards)

    out = str(tmp_path / "shards")
    export_shards(_docs().repartition(8), out, n_shards=2)
    want = read_shards(out).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    sdir = ex._shard_dir(out, 0)
    man_path = ex._manifest_path(out, 0)

    # crash point A: backfilled files-list + an unlisted cmp- attempt
    man = storage.read_manifest(man_path)
    live = sorted(f for f in os.listdir(sdir)
                  if f.endswith(".parquet") and not f.startswith("."))
    storage.write_manifest(man_path, {**man, "files": live})
    junk = os.path.join(sdir, "cmp-deadbeef-0.parquet")
    pq.write_table(pa.table({"doc_id": [999999]}), junk)
    got = read_shards(out).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    assert got.equals(want)                     # attempt invisible
    compact_shards(out)                         # re-run cleans + compacts
    assert not os.path.exists(junk)             # step-1 cleanup removed it
    assert json.load(open(man_path))["files"] != live

    # crash point B: committed new list, stale original still on disk
    man = storage.read_manifest(man_path)
    stale = os.path.join(sdir, "stale-original.parquet")
    pq.write_table(pa.table({"doc_id": [888888]}), stale)
    got = read_shards(out).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    assert got.equals(want)                     # stale file invisible
    compact_shards(out)
    assert not os.path.exists(stale)            # cleaned by next run
    got = read_shards(out).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    assert got.equals(want)


def test_footer_stats_and_predicate_pruning(ray_session, tmp_path):
    """export_shards records per-shard footer min/max; read_shards
    prune= skips provably-disjoint shards and returns the same rows a
    full read + filter would."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from olx_ray import storage
    from olx_ray.pipelines.export import (_manifest_path, compact_shards,
                                          export_shards, read_shards,
                                          shards_for_predicate)

    # assign="value": cell c holds vals in [c*100, c*100+24] — disjoint
    cells = np.repeat(np.arange(4), 25)
    vals = cells * 100 + np.tile(np.arange(25), 4)
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(100), pa.int64()),
        "cell": pa.array(cells.astype(np.int64)),
        "val": pa.array(vals.astype(np.int64)),
        "name": pa.array([f"n{v:04d}" for v in vals], pa.string()),
    }))
    out = str(tmp_path / "stats_exp")
    export_shards(ds, out, key="cell", n_shards=4, assign="value")

    man = storage.read_manifest(_manifest_path(out, 1))
    assert man["stats"]["val"] == [100, 124]
    assert man["stats"]["doc_id"] == [25, 49]
    assert man["stats"]["name"] == ["n0100", "n0124"]

    # pruning decision: only shard 1 can hold val in [150, 199]... none;
    # [100, 124] hits exactly shard 1; [90, 210] hits shards 1+2
    assert shards_for_predicate(out, "val", 110, 120) == [1]
    assert shards_for_predicate(out, "val", 90, 210) == [1, 2]
    assert shards_for_predicate(out, "val", 9999, 10000) == []
    # string stats prune too
    assert shards_for_predicate(out, "name", "n0300", "n0310") == [3]
    # unknown column → no stats → every shard read (never a filter)
    assert shards_for_predicate(out, "nope", 0, 1) == [0, 1, 2, 3]

    full = read_shards(out).to_pandas()
    want = full[full["val"].between(100, 124)].sort_values("doc_id")
    got = read_shards(out, prune=("val", 100, 124)).to_pandas() \
        .sort_values("doc_id")
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  want.reset_index(drop=True))

    # compaction preserves the stats (same rows → same bounds)
    compact_shards(out, target_bytes=1 << 20)
    man2 = storage.read_manifest(_manifest_path(out, 1))
    assert man2["stats"]["val"] == [100, 124]
    assert shards_for_predicate(out, "val", 110, 120) == [1]


def test_footer_stats_refuse_unsound_string_bounds(ray_session, tmp_path):
    """parquet-cpp BLANKS (not truncates) string stats over its 4096 B
    cap while keeping has_min_max — such columns must carry NO bounds,
    and prune= must therefore read the shard (review-found soundness
    bug: a blanked max '' pruned shards that contained matches)."""
    import pyarrow as pa
    import ray.data as rd

    from olx_ray import storage
    from olx_ray.pipelines.export import (_manifest_path, export_shards,
                                          read_shards, shards_for_predicate)

    out = str(tmp_path / "blanked")
    export_shards(rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "s": pa.array(["m", "z" * 5000], pa.string()),
    })), out, key="doc_id", n_shards=1)
    man = storage.read_manifest(_manifest_path(out, 0))
    assert "s" not in (man.get("stats") or {})       # bound dropped
    assert (man.get("stats") or {}).get("doc_id") == [1, 2]
    # without a bound the shard is always read — the long row survives
    assert shards_for_predicate(out, "s", "x", "~") == [0]
    got = read_shards(out, prune=("s", "x", "~")).to_pandas()
    assert 2 in set(got["doc_id"])

    # length cap: free text never lands in the JSON commit marker
    out2 = str(tmp_path / "longish")
    export_shards(rd.from_arrow(pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "text": pa.array(["word " * 100], pa.string()),   # 500 chars
    })), out2, key="doc_id", n_shards=1)
    man2 = storage.read_manifest(_manifest_path(out2, 0))
    assert "text" not in (man2.get("stats") or {})


def _mk(tmp_path, name, ids, vals):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "doc_id": pa.array(np.asarray(ids, dtype="int64")),
        "val": pa.array(np.asarray(vals, dtype="int64"))}))


def test_fold_rounds_merges_appends(ray_session, tmp_path):
    """fold_rounds: committed round= appends hardlink into the base
    shards, one layout serves the union, round dirs are retired and
    their ids permanently refused; idempotent; compaction-compatible."""
    from olx_ray.pipelines.export import (appended_round_dirs,
                                          compact_shards, export_shards,
                                          fold_rounds, folded_round_ids,
                                          read_shards)

    out = str(tmp_path / "lay")
    export_shards(_mk(tmp_path, "b", range(50), range(50)),
                  out, key="doc_id", n_shards=4)
    export_shards(_mk(tmp_path, "r1", range(100, 120), range(20)),
                  f"{out}/round=1", key="doc_id", n_shards=4)
    export_shards(_mk(tmp_path, "r2", range(200, 210), range(10)),
                  f"{out}/round=2", key="doc_id", n_shards=4)
    # pre-fold: the base read serves base rows only
    assert len(read_shards(out).to_pandas()) == 50
    assert len(appended_round_dirs(out)) == 2

    res = fold_rounds(out)
    assert res == {"folded": [1, 2], "rows_added": 30}
    back = read_shards(out).to_pandas()
    assert len(back) == 80 and back["doc_id"].is_unique
    assert set(back["doc_id"]) == set(range(50)) | set(range(100, 120)) \
        | set(range(200, 210))
    # rounds are gone from disk AND from the reader walk, forever
    assert appended_round_dirs(out) == []
    assert not os.path.exists(f"{out}/round=1")
    assert folded_round_ids(out) == {1, 2}
    # idempotent
    assert fold_rounds(out) == {"folded": [], "rows_added": 0}
    # export resume still sees every shard as complete
    assert export_shards(_mk(tmp_path, "b", range(50), range(50)),
                         out, key="doc_id", n_shards=4)["written"] == []
    # compaction bin-packs the folded fragments losslessly
    compact_shards(out, target_bytes=1 << 20)
    after = read_shards(out).to_pandas()
    assert sorted(after["doc_id"]) == sorted(back["doc_id"])


def test_fold_rounds_crash_states(ray_session, tmp_path, monkeypatch):
    """Readers are correct at both crash points: before the history
    commit the OLD view (base + live rounds) serves, staged links
    invisible; after it the FOLDED view serves exactly once even with
    round dirs still on disk; a re-run completes either way."""
    import pytest

    import olx_ray.pipelines.export as ex
    from olx_ray.pipelines.export import (appended_round_dirs,
                                          export_shards, fold_rounds,
                                          read_shards)

    out = str(tmp_path / "lay")
    export_shards(_mk(tmp_path, "b", range(50), range(50)),
                  out, key="doc_id", n_shards=4)
    export_shards(_mk(tmp_path, "r1", range(100, 120), range(20)),
                  f"{out}/round=1", key="doc_id", n_shards=4)

    # crash point A: staged but not committed (history write dies)
    real = ex.storage.write_manifest

    def boom(path, payload):
        if path.endswith(ex._FOLD_HISTORY):
            raise RuntimeError("crash before commit")
        real(path, payload)

    monkeypatch.setattr(ex.storage, "write_manifest", boom)
    with pytest.raises(RuntimeError, match="crash before commit"):
        fold_rounds(out)
    monkeypatch.setattr(ex.storage, "write_manifest", real)
    # old view intact: base-only read, round still listed, no dup
    assert len(read_shards(out).to_pandas()) == 50
    assert len(appended_round_dirs(out)) == 1

    # crash point B: committed, finalize dies mid-flight
    monkeypatch.setattr(ex, "_finalize_fold",
                        lambda *a: (_ for _ in ()).throw(
                            RuntimeError("crash after commit")))
    with pytest.raises(RuntimeError, match="crash after commit"):
        fold_rounds(out)
    monkeypatch.undo()
    # folded view serves EXACTLY once though round=1 is still on disk
    assert os.path.exists(f"{out}/round=1")
    back = read_shards(out).to_pandas()
    assert len(back) == 70 and back["doc_id"].is_unique
    assert appended_round_dirs(out) == []     # id already folded
    # resume completes the finalize
    assert fold_rounds(out) == {"folded": [], "rows_added": 0}
    assert not os.path.exists(f"{out}/round=1")
    assert len(read_shards(out).to_pandas()) == 70


def test_fold_rounds_stats_merge_and_refusals(ray_session, tmp_path):
    """Folded manifests carry soundly merged bounds (union when both
    sides recorded; dropped when any contributing side lacks them);
    placement-mismatched rounds are refused."""
    import numpy as np
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from olx_ray import storage
    from olx_ray.pipelines.export import (_manifest_path, export_shards,
                                          fold_rounds,
                                          shards_for_predicate)

    def cells(ids, vals, names):
        return rd.from_arrow(pa.table({
            "cell": pa.array(np.asarray(ids, dtype="int64")),
            "val": pa.array(np.asarray(vals, dtype="int64")),
            "name": pa.array(names, pa.string())}))

    out = str(tmp_path / "ivfish")
    # base: cell c holds val in [c*100, c*100+9]
    export_shards(cells(np.repeat(np.arange(2), 10),
                        np.repeat(np.arange(2), 10) * 100
                        + np.tile(np.arange(10), 2),
                        [f"a{i}" for i in range(20)]),
                  out, key="cell", n_shards=2, assign="value")
    # round widens cell 0's val range and BLANKS its name stats
    export_shards(cells([0, 1], [55, 155], ["b", "z" * 5000]),
                  f"{out}/round=3", key="cell", n_shards=2,
                  assign="value")
    assert fold_rounds(out)["folded"] == [3]
    man0 = storage.read_manifest(_manifest_path(out, 0))
    assert man0["stats"]["val"] == [0, 55]          # merged bounds
    assert "name" in man0["stats"]                  # round 0 kept names
    man1 = storage.read_manifest(_manifest_path(out, 1))
    assert man1["stats"]["val"] == [100, 155]
    assert "name" not in man1["stats"]              # blanked → dropped
    assert shards_for_predicate(out, "val", 50, 60) == [0]
    assert shards_for_predicate(out, "val", 150, 160) == [1]

    # a round exported under different placement cannot fold
    export_shards(cells([0, 1], [1, 2], ["x", "y"]),
                  f"{out}/round=4", key="cell", n_shards=4,
                  assign="value")
    with pytest.raises(ValueError, match="wrong shards"):
        fold_rounds(out)


def test_fold_rounds_bootstraps_base_from_rounds(ray_session, tmp_path):
    """A rounds-only layout (the ingest-corpus shape) folds by
    promoting the lowest round to the base and folding the rest;
    read_layout serves the exact union at every lifecycle state,
    including resuming a mid-promotion crash."""
    from olx_ray import storage
    from olx_ray.pipelines.export import (export_shards, fold_rounds,
                                          folded_round_ids, read_layout,
                                          read_shards)

    out = str(tmp_path / "corpus")
    os.makedirs(out)
    export_shards(_mk(tmp_path, "r1", range(20), range(20)),
                  f"{out}/round=1", key="doc_id", n_shards=4)
    export_shards(_mk(tmp_path, "r2", range(100, 110), range(10)),
                  f"{out}/round=2", key="doc_id", n_shards=4)
    # rounds-only read
    pre = read_layout(out).to_pandas()
    assert len(pre) == 30 and pre["doc_id"].is_unique

    # simulate a mid-promotion crash: marker committed, one shard moved
    storage.write_manifest(f"{out}/FOLD_HISTORY.json",
                           {"pending": [], "folded_ids": [],
                            "promoting": "round=1"})
    os.rename(f"{out}/round=1/shard=0", f"{out}/shard=0")
    mid = read_layout(out).to_pandas()      # union exact mid-crash
    assert len(mid) == 30 and mid["doc_id"].is_unique

    res = fold_rounds(out)                  # resumes + folds the rest
    assert res == {"folded": [1, 2], "rows_added": 30}
    base = read_shards(out).to_pandas()     # base alone serves all rows
    assert len(base) == 30 and base["doc_id"].is_unique
    assert folded_round_ids(out) == {1, 2}
    assert not os.path.exists(f"{out}/round=1")
    assert not os.path.exists(f"{out}/round=2")
    post = read_layout(out).to_pandas()
    assert sorted(post["doc_id"]) == sorted(pre["doc_id"])
    # a later append folds the normal (non-promote) way
    export_shards(_mk(tmp_path, "r3", range(200, 205), range(5)),
                  f"{out}/round=3", key="doc_id", n_shards=4)
    assert len(read_layout(out).to_pandas()) == 35
    assert fold_rounds(out) == {"folded": [3], "rows_added": 5}
    assert len(read_shards(out).to_pandas()) == 35


def test_fold_lifecycle_exhaustive_crash_points(ray_session, tmp_path):
    """Kill fold_rounds at EVERY metadata mutation in turn (manifest
    writes, renames, links, deletes — covering bootstrap promotion,
    staging, commit and finalize): after each crash the union view
    must be exact and duplicate-free, and one unpatched re-run must
    converge to the fully folded layout. Exhaustive, not sampled."""
    import shutil as _sh

    import olx_ray.pipelines.export as ex
    from olx_ray.pipelines.export import (appended_round_dirs,
                                          export_shards, fold_rounds,
                                          read_layout, read_shards)

    # pristine rounds-only layout built ONCE, copied per crash point
    pristine = str(tmp_path / "pristine")
    os.makedirs(pristine)
    export_shards(_mk(tmp_path, "r1", range(20), range(20)),
                  f"{pristine}/round=1", key="doc_id", n_shards=2)
    export_shards(_mk(tmp_path, "r2", range(100, 110), range(10)),
                  f"{pristine}/round=2", key="doc_id", n_shards=2)
    want = sorted(set(range(20)) | set(range(100, 110)))

    real = {"link": os.link, "rename": os.rename, "replace": os.replace,
            "rmtree": _sh.rmtree, "wm": ex.storage.write_manifest}
    budget = {"left": 0, "fired": False}

    def guard(fn):
        def wrapped(*a, **kw):
            if budget["left"] == 0:
                budget["fired"] = True
                raise RuntimeError("injected crash")
            budget["left"] -= 1
            return fn(*a, **kw)
        return wrapped

    def patch():
        os.link = guard(real["link"])
        os.rename = guard(real["rename"])
        os.replace = guard(real["replace"])
        _sh.rmtree = ex.shutil.rmtree = guard(real["rmtree"])
        ex.storage.write_manifest = guard(real["wm"])

    def unpatch():
        os.link, os.rename = real["link"], real["rename"]
        os.replace = real["replace"]
        _sh.rmtree = ex.shutil.rmtree = real["rmtree"]
        ex.storage.write_manifest = real["wm"]

    k = 0
    while True:
        out = str(tmp_path / f"lay{k}")
        _sh.copytree(pristine, out)
        budget.update(left=k, fired=False)
        patch()
        try:
            fold_rounds(out)
            completed = not budget["fired"]
        except RuntimeError as e:
            assert "injected crash" in str(e)
            completed = False
        finally:
            unpatch()
        # invariant at EVERY crash state: union view exact, no dups
        mid = read_layout(out).to_pandas()
        assert sorted(mid["doc_id"]) == want, f"crash point {k}"
        # one re-run converges to the fully folded layout
        fold_rounds(out)
        final = read_shards(out).to_pandas()
        assert sorted(final["doc_id"]) == want, f"crash point {k}"
        assert final["doc_id"].is_unique and \
            appended_round_dirs(out) == []
        if completed:
            break
        k += 1
    assert k >= 15          # the sweep actually exercised many points


def test_compact_during_committed_fold_preserves_rows(ray_session,
                                                      tmp_path,
                                                      monkeypatch):
    """compact_shards on a layout whose fold is committed but not yet
    finalized must catch the disk up first — compacting from the
    pre-fold manifests would delete the staged fold (manifests +
    hardlinks) and silently lose every folded row, with the round ids
    already retired (review finding, reproduced before the guard)."""
    import olx_ray.pipelines.export as ex
    from olx_ray.pipelines.export import (appended_round_dirs,
                                          compact_shards, export_shards,
                                          fold_rounds, read_shards)

    out = str(tmp_path / "lay")
    export_shards(_mk(tmp_path, "b", range(50), range(50)),
                  out, key="doc_id", n_shards=4)
    export_shards(_mk(tmp_path, "r1", range(100, 120), range(20)),
                  f"{out}/round=1", key="doc_id", n_shards=4)
    # crash exactly at the committed-but-unfinalized point
    monkeypatch.setattr(ex, "_finalize_fold",
                        lambda *a: (_ for _ in ()).throw(
                            RuntimeError("crash after commit")))
    import pytest
    with pytest.raises(RuntimeError, match="crash after commit"):
        fold_rounds(out)
    monkeypatch.undo()

    res = compact_shards(out, target_bytes=1 << 20)   # would destroy
    back = read_shards(out).to_pandas()
    assert len(back) == 70 and back["doc_id"].is_unique
    assert appended_round_dirs(out) == []
    assert not os.path.exists(f"{out}/round=1")       # finalized by it
    assert res["compacted"] or res["skipped"]         # and it still ran


def test_fold_bootstrap_refuses_stray_shard_dirs(ray_session, tmp_path):
    """A stray uncommitted shard= dir in a rounds-only layout must be
    refused BEFORE the promoting marker is committed — after it, every
    fold call would wedge on the rename-collision check forever."""
    import pytest

    from olx_ray import storage
    from olx_ray.pipelines.export import (export_shards, fold_rounds,
                                          read_shards)

    out = str(tmp_path / "lay")
    os.makedirs(f"{out}/shard=2")          # crashed direct export relic
    export_shards(_mk(tmp_path, "r1", range(20), range(20)),
                  f"{out}/round=1", key="doc_id", n_shards=4)
    with pytest.raises(ValueError, match="no committed manifests"):
        fold_rounds(out)
    # the marker was NOT committed — the layout is not wedged
    hist = storage.read_manifest(f"{out}/FOLD_HISTORY.json")
    assert not (hist or {}).get("promoting")
    os.rmdir(f"{out}/shard=2")
    assert fold_rounds(out)["folded"] == [1]
    assert len(read_shards(out).to_pandas()) == 20


def test_promoting_round_refused_to_appenders_but_served_to_readers(
        ray_session, tmp_path):
    """Mid-promotion (marker committed, renames incomplete) the round
    id must already count as folded for APPENDERS — its rows are
    partly in the base, so a re-append would duplicate them and wedge
    the promotion resume — while READERS keep serving the unmoved
    shards (the union stays exact)."""
    import pytest

    from olx_ray import storage
    from olx_ray.pipelines.export import (appended_round_dirs,
                                          export_shards,
                                          folded_round_ids, read_layout,
                                          refuse_folded_round)

    out = str(tmp_path / "lay")
    os.makedirs(out)
    export_shards(_mk(tmp_path, "r1", range(20), range(20)),
                  f"{out}/round=1", key="doc_id", n_shards=4)
    storage.write_manifest(f"{out}/FOLD_HISTORY.json",
                           {"pending": [], "folded_ids": [],
                            "promoting": "round=1"})
    os.rename(f"{out}/round=1/shard=0", f"{out}/shard=0")
    assert folded_round_ids(out) == {1}          # appender view
    with pytest.raises(ValueError, match="already folded"):
        refuse_folded_round(out, 1, "test_appender")
    assert len(appended_round_dirs(out)) == 1    # reader view
    mid = read_layout(out).to_pandas()
    assert len(mid) == 20 and mid["doc_id"].is_unique


def test_consistent_union_read_retries_on_history_change(
        ray_session, tmp_path, monkeypatch):
    """A fold commit landing mid-discovery forces a re-walk; a history
    that never settles raises instead of returning a split view."""
    import pytest

    import olx_ray.pipelines.export as ex

    out = str(tmp_path / "lay")
    os.makedirs(out)
    states = [{"pending": [], "folded_ids": []},        # pre-walk
              {"pending": [], "folded_ids": [1]},       # post-walk: changed!
              {"pending": [], "folded_ids": [1]},       # retry pre
              {"pending": [], "folded_ids": [1]}]       # retry post: stable
    calls = {"n": 0, "walks": 0}

    def fake_hist(d):
        s = states[min(calls["n"], len(states) - 1)]
        calls["n"] += 1
        return s

    monkeypatch.setattr(ex, "_fold_history", fake_hist)
    got = ex.consistent_union_read(out, lambda: (calls.__setitem__(
        "walks", calls["walks"] + 1) or "view"))
    assert got == "view" and calls["walks"] == 2     # one retry

    calls["n"] = 0
    monkeypatch.setattr(
        ex, "_fold_history",
        lambda d: {"pending": [], "folded_ids": [calls.__setitem__(
            "n", calls["n"] + 1) or calls["n"]]})
    with pytest.raises(RuntimeError, match="kept changing"):
        ex.consistent_union_read(out, lambda: "view")
