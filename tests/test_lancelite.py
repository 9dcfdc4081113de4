"""lancelite table: versioned manifests, delta reads, 2PC, idempotent epochs."""

import json
import os

import pyarrow as pa
import pytest

from hydra_ray.table import Table


def _tbl(n, start=0):
    return pa.table({"k": list(range(start, start + n)), "v": ["x"] * n})


def test_create_append_read(tmp_path):
    t = Table.create(str(tmp_path / "t"), schema=_tbl(1).schema)
    assert t.latest_version() == 0
    assert t.count_rows() == 0
    t.append(_tbl(5))
    t.append(_tbl(3, start=5))
    assert t.latest_version() == 2
    assert t.count_rows() == 8
    arrow = t.to_arrow()
    assert sorted(arrow["k"].to_pylist()) == list(range(8))
    assert t.schema().names == ["k", "v"]


def test_delta_reads(tmp_path):
    t = Table.create(str(tmp_path / "t"))
    t.append(_tbl(5))          # v1
    t.append(_tbl(4, 5))       # v2
    t.append(_tbl(3, 9))       # v3
    delta = t.to_arrow(after_version=1)
    assert sorted(delta["k"].to_pylist()) == list(range(5, 12))
    delta2 = t.to_arrow(version=2, after_version=1)
    assert sorted(delta2["k"].to_pylist()) == list(range(5, 9))


def test_2pc_commit_and_idempotence(tmp_path):
    t = Table.create(str(tmp_path / "t"))
    s0 = t.stage_fragment(_tbl(4), epoch=0, partition=0)
    s1 = t.stage_fragment(_tbl(2, 4), epoch=0, partition=1)
    assert t.commit_epoch("pipe", 0, [s0, s1]) is True
    assert t.committed_epoch("pipe") == 0
    assert t.count_rows() == 6

    # replaying the same epoch no-ops and cleans up its staged files
    s0b = t.stage_fragment(_tbl(4), epoch=0, partition=0)
    assert t.commit_epoch("pipe", 0, [s0b]) is False
    assert t.count_rows() == 6
    assert not os.path.exists(os.path.join(t.root, s0b.path))

    # epoch gaps rejected
    s2 = t.stage_fragment(_tbl(1), epoch=5, partition=0)
    with pytest.raises(ValueError, match="epoch gap"):
        t.commit_epoch("pipe", 5, [s2])


def test_crash_between_prepare_and_commit(tmp_path):
    """FIXTURES.md F4 exactly-once oracle, table-level part."""
    t = Table.create(str(tmp_path / "t"))
    # epoch 0 commits cleanly
    s = t.stage_fragment(_tbl(4), 0, 0)
    t.commit_epoch("pipe", 0, [s])
    # epoch 1: staged but "crash" before commit (fragment orphaned)
    t.stage_fragment(_tbl(5, 4), 1, 0)
    # restart: last committed epoch is 0 → re-run epoch 1 from scratch
    t2 = Table(t.root)
    assert t2.committed_epoch("pipe") == 0
    assert t2.gc_staged() == 1
    s_retry = t2.stage_fragment(_tbl(5, 4), 1, 0)
    assert t2.commit_epoch("pipe", 1, [s_retry]) is True
    assert t2.count_rows() == 9  # no dupes, no losses


def test_atomic_version_create(tmp_path):
    t = Table.create(str(tmp_path / "t"))
    t.append(_tbl(1))
    # simulate a concurrent writer having taken version 2
    m1 = json.load(open(t._manifest_path(1)))
    m1["version"] = 2
    json.dump(m1, open(t._manifest_path(2), "w"))
    # append still succeeds by retrying to version 3
    t.append(_tbl(1, 1))
    assert t.latest_version() == 3


def test_to_dataset_roundtrip(tmp_path, ray_session):
    t = Table.create(str(tmp_path / "t"))
    t.append(_tbl(100))
    ds = t.to_dataset(columns=["k"])
    assert ds.count() == 100
    assert ds.schema().names == ["k"]
    empty = Table.create(str(tmp_path / "e"), schema=_tbl(1).schema)
    assert empty.to_dataset().count() == 0


def test_epoch_lineage_properties(tmp_path):
    t = Table.create(str(tmp_path / "t"))
    s = t.stage_fragment(_tbl(2), 0, 0)
    t.commit_epoch("pipe", 0, [s], extra_state={"lineage": {"clips": [0, 17]}})
    st = t.pipeline_state("pipe")
    assert st["last_epoch"] == 0
    assert st["lineage"] == {"clips": [0, 17]}
