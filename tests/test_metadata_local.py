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
