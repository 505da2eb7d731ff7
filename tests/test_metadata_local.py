"""Round-16 optimization invariants: the driver-side metadata planners
(Iceberg manifests, Delta log replay, Hudi timeline) must return the
SAME rows as the distributed decode paths they short-circuit — the
local path is an execution-strategy switch, never a semantics change.

Each test stages a small table, resolves the active-file metadata both
ways (local via the default threshold; distributed by forcing the
module threshold to 0), and compares the row sets exactly.
"""

from __future__ import annotations

import glob
import os


def _rowset(rows, keys):
    return sorted(tuple(r[k] for k in keys) for r in rows)


def test_iceberg_local_manifest_rows_match_distributed(spark, tmp_path):
    from apache_nifi_spark.sources import iceberg as ice

    root = str(tmp_path / "tbl")
    info = {}
    for name, lo in (("a", 0), ("b", 100)):
        spark.range(lo, lo + 10).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{root}/{name}")
        p = glob.glob(f"{root}/{name}/part-*.parquet")[0]
        info[name] = {"file_path": p, "record_count": 10,
                      "file_size_in_bytes": os.path.getsize(p)}
    ice.iceberg_commit(root, 101, added=[info["a"], info["b"]])
    ice.iceberg_commit(root, 102, added=[], deleted=[info["a"]["file_path"]])

    keys = ("file_path", "partition", "record_count",
            "file_size_in_bytes", "sequence_number")
    local = ice._active_file_rows(spark, root)
    old = ice._LOCAL_MANIFEST_BYTES
    ice._LOCAL_MANIFEST_BYTES = 0  # force the distributed decode
    try:
        dist = ice._active_file_rows(spark, root)
    finally:
        ice._LOCAL_MANIFEST_BYTES = old
    assert _rowset(local, keys) == _rowset(dist, keys)
    assert len(local) == 1  # file a deleted, b active


def test_delta_local_log_replay_matches_distributed(spark, tmp_path):
    from apache_nifi_spark.sources import deltalog as dl

    root = str(tmp_path / "dtbl")
    for v, (name, lo) in enumerate((("a", 0), ("b", 100), ("c", 200))):
        spark.range(lo, lo + 10).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{root}/{name}")
        rel = os.path.relpath(
            glob.glob(f"{root}/{name}/part-*.parquet")[0], root
        )
        dl.write_commit(
            root, v, [{"add": {"path": rel, "size": 1, "dataChange": True}}]
        )
    # checkpoint at v1, one tail commit after, plus a remove
    dl.write_checkpoint(spark, root, 1)
    rel_a = os.path.relpath(glob.glob(f"{root}/a/part-*.parquet")[0], root)
    dl.write_commit(root, 3, [{"remove": {"path": rel_a}}])

    keys = ("path", "size", "dv", "added_version")
    local = dl._delta_active_rows(spark, root)
    old = dl._LOCAL_LOG_BYTES
    dl._LOCAL_LOG_BYTES = 0  # force the distributed replay
    try:
        dist = dl._delta_active_rows(spark, root)
    finally:
        dl._LOCAL_LOG_BYTES = old
    assert _rowset(local, keys) == _rowset(dist, keys)
    assert len(local) == 2  # a removed at v3


def test_delta_local_dv_serialization_matches_distributed(spark, tmp_path):
    """r17 (r16 advice): a deletion-vector-bearing add must serialize
    IDENTICALLY on the local and distributed paths — compact JSON,
    schema field order, extra action keys dropped — whatever key order
    or extra fields the writer used."""
    from apache_nifi_spark.sources import deltalog as dl

    root = str(tmp_path / "dvtbl")
    spark.range(0, 10).coalesce(1).write.parquet(f"{root}/a")
    rel = os.path.relpath(glob.glob(f"{root}/a/part-*.parquet")[0], root)
    # scrambled key order + extra spec-legal keys (offset, maxRowIndex)
    dv = {
        "cardinality": 3,
        "offset": 1,
        "pathOrInlineDv": "vBASE85DATA",
        "maxRowIndex": 9,
        "sizeInBytes": 40,
        "storageType": "i",
    }
    dl.write_commit(
        root, 0,
        [{"add": {"path": rel, "size": 1, "dataChange": True,
                  "deletionVector": dv}}],
    )
    keys = ("path", "size", "dv", "added_version")
    local = dl._delta_active_rows(spark, root)
    old = dl._LOCAL_LOG_BYTES
    dl._LOCAL_LOG_BYTES = 0
    try:
        dist = dl._delta_active_rows(spark, root)
    finally:
        dl._LOCAL_LOG_BYTES = old
    assert _rowset(local, keys) == _rowset(dist, keys)
    assert local[0]["dv"] == (
        '{"storageType":"i","pathOrInlineDv":"vBASE85DATA",'
        '"sizeInBytes":40,"cardinality":3}'
    )


def test_delta_log_listing_ignores_non_commit_json(spark, tmp_path):
    """r17 (r16 advice): real Delta writers leave non-commit JSON in
    _delta_log (log compaction *.compacted.json, CRC sidecars); the
    commit listing must skip them instead of crashing on int()."""
    from apache_nifi_spark.sources import deltalog as dl

    root = str(tmp_path / "straytbl")
    spark.range(0, 10).coalesce(1).write.parquet(f"{root}/a")
    rel = os.path.relpath(glob.glob(f"{root}/a/part-*.parquet")[0], root)
    dl.write_commit(
        root, 0, [{"add": {"path": rel, "size": 1, "dataChange": True}}]
    )
    log_dir = os.path.join(root, "_delta_log")
    for stray in ("00000000000000000000.00000000000000000009.compacted.json",
                  "extra_metadata.json"):
        with open(os.path.join(log_dir, stray), "w") as f:
            f.write("{}\n")
    for forced_dist in (False, True):
        old = dl._LOCAL_LOG_BYTES
        dl._LOCAL_LOG_BYTES = 0 if forced_dist else old
        try:
            rows = dl._delta_active_rows(spark, root)
        finally:
            dl._LOCAL_LOG_BYTES = old
        assert [r["path"] for r in rows] == [rel]


def test_iceberg_active_files_stays_distributed_above_gate(spark, tmp_path):
    """r17 (r16 advice): above the local-manifest gate the PUBLIC
    iceberg_active_files must return the lazy distributed frame, never
    collect + re-wrap O(active files) rows through the driver."""
    from apache_nifi_spark.sources import iceberg as ice

    root = str(tmp_path / "lazytbl")
    spark.range(0, 10).coalesce(1).write.parquet(f"{root}/a")
    p = glob.glob(f"{root}/a/part-*.parquet")[0]
    ice.iceberg_commit(root, 101, added=[{
        "file_path": p, "record_count": 10,
        "file_size_in_bytes": os.path.getsize(p),
    }])
    old = ice._LOCAL_MANIFEST_BYTES
    ice._LOCAL_MANIFEST_BYTES = 0  # force the distributed venue
    try:
        df = ice.iceberg_active_files(spark, root)
        plan = df._jdf.queryExecution().analyzed().toString()
        assert "LocalRelation" not in plan  # lazy scan, not a collect
        assert df.count() == 1
    finally:
        ice._LOCAL_MANIFEST_BYTES = old
    # below the gate: local decode, same rows
    rows = ice.iceberg_active_files(spark, root).collect()
    assert len(rows) == 1 and rows[0]["file_path"] == p


def test_hudi_local_timeline_matches_distributed(spark, tmp_path):
    from apache_nifi_spark.sources import hudi as hu

    root = str(tmp_path / "htbl")
    hu.hudi_init(root, "t")
    s1 = hu.hudi_write_base_file(
        spark.range(0, 10), root, "p0", "g0", "20240101000000000", "id"
    )
    hu.hudi_commit(root, "20240101000000000", {"p0": [s1]})
    s2 = hu.hudi_write_base_file(
        spark.range(0, 20), root, "p0", "g0", "20240102000000000", "id"
    )
    hu.hudi_commit(root, "20240102000000000", {"p0": [s2]})

    keys = ("partition", "file_id", "path", "instant")
    local = hu._hudi_active_rows(spark, root)
    old = hu._LOCAL_TIMELINE_BYTES
    hu._LOCAL_TIMELINE_BYTES = 0  # force the distributed parse
    try:
        dist = hu._hudi_active_rows(spark, root)
    finally:
        hu._LOCAL_TIMELINE_BYTES = old
    assert _rowset(local, keys) == _rowset(dist, keys)
    assert len(local) == 1  # one file group, latest slice wins
    assert local[0]["instant"] == "20240102000000000"
