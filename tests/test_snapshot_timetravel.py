"""Snapshot-store time-travel + incremental reads (Iceberg
snapshot-as-of / incremental-scan / expire-snapshots analogs)."""

import pytest

from olx_spark.plans.snapshot import SnapshotStore


def _rows(df):
    return sorted(r["v"] for r in df.collect()) if df is not None else []


def _mk(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], ["v"])


@pytest.fixture()
def store(spark, tmp_path):
    s = SnapshotStore(str(tmp_path / "store"), spark)
    for rnd, vals in enumerate([[1], [2, 3], [4], [5]], start=0):
        s.commit_round(rnd, {"t": _mk(spark, vals)}, state={})
    return s


def test_as_of_round(store):
    assert _rows(store.read_table("t", as_of_round=0)) == [1]
    assert _rows(store.read_table("t", as_of_round=1)) == [1, 2, 3]
    assert _rows(store.read_table("t", as_of_round=3)) == [1, 2, 3, 4, 5]
    assert _rows(store.read_table("t")) == [1, 2, 3, 4, 5]


def test_since_round_incremental(store):
    assert _rows(store.read_table("t", since_round=1)) == [4, 5]
    assert _rows(store.read_table("t", since_round=3)) == []
    assert _rows(store.read_table("t", since_round=0, as_of_round=2)) == [2, 3, 4]


def test_window_validation(store):
    with pytest.raises(ValueError, match="empty window"):
        store.read_table("t", since_round=3, as_of_round=1)


def test_compaction_expires_history_but_keeps_later_deltas(store, spark):
    store.compact_table("t")
    # post-compaction commits stay individually addressable
    store.commit_round(4, {"t": _mk(spark, [6])}, state={})
    assert _rows(store.read_table("t")) == [1, 2, 3, 4, 5, 6]
    # horizon == the newest round folded (3): as-of at/above it works
    assert _rows(store.read_table("t", as_of_round=3)) == [1, 2, 3, 4, 5]
    assert _rows(store.read_table("t", as_of_round=4)) == [1, 2, 3, 4, 5, 6]
    assert _rows(store.read_table("t", since_round=3)) == [6]
    # below it raises (expired), never silently partial
    with pytest.raises(ValueError, match="history expired"):
        store.read_table("t", as_of_round=2)
    with pytest.raises(ValueError, match="history expired"):
        store.read_table("t", since_round=1)


def test_replace_sets_horizon(spark, tmp_path):
    s = SnapshotStore(str(tmp_path / "store"), spark)
    s.commit_round(0, {"r": _mk(spark, [1])}, state={}, replace={"r"})
    s.commit_round(1, {"r": _mk(spark, [1, 2])}, state={}, replace={"r"})
    assert _rows(s.read_table("r")) == [1, 2]
    assert _rows(s.read_table("r", as_of_round=1)) == [1, 2]
    with pytest.raises(ValueError, match="history expired"):
        s.read_table("r", as_of_round=0)


def test_resume_reads_are_unaffected(store):
    # the default (no-window) path is byte-for-byte the old behavior
    assert store.committed_rounds() == [0, 1, 2, 3]
    assert _rows(store.read_table("missing")) == []
