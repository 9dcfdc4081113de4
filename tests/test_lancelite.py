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
    t2 = Table(t.uri)
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


# ---------------------------------------------- schema evolution (K6 rules)
def _schema(**fields):
    return pa.schema([pa.field(n, t, nullable=n not in ("k",)) for n, t in fields.items()])


def test_evolution_add_nullable_ok(tmp_path):
    s = _schema(k=pa.int64(), v=pa.string())
    t = Table.create(str(tmp_path / "t"), schema=s, key=["k"])
    t.append(pa.table({"k": pa.array([1]), "v": pa.array(["a"])}, schema=s))
    s2 = pa.schema(list(s) + [pa.field("extra", pa.float64())])
    t.append(
        pa.table(
            {"k": pa.array([2]), "v": pa.array(["b"]), "extra": pa.array([1.5])},
            schema=s2,
        )
    )
    assert t.schema().get_field_index("extra") >= 0  # schema evolved
    assert t.to_arrow().num_rows == 2


def test_evolution_type_change_rejected(tmp_path):
    s = _schema(k=pa.int64(), v=pa.string())
    t = Table.create(str(tmp_path / "t"), schema=s, key=["k"])
    bad = pa.table({"k": pa.array([1]), "v": pa.array([2.0])})
    with pytest.raises(ValueError, match="incompatible evolution"):
        t.append(bad)


def test_evolution_key_change_rejected(tmp_path):
    s = _schema(k=pa.int64(), v=pa.string())
    t = Table.create(str(tmp_path / "t"), schema=s, key=["k"])
    with pytest.raises(ValueError, match="key column"):
        t.append(pa.table({"v": pa.array(["a"])}))
    with pytest.raises(ValueError, match="incompatible evolution"):
        t.append(pa.table({"k": pa.array(["s"]), "v": pa.array(["a"])}))


def test_evolution_non_nullable_add_rejected(tmp_path):
    s = _schema(k=pa.int64(), v=pa.string())
    t = Table.create(str(tmp_path / "t"), schema=s, key=["k"])
    s2 = pa.schema(list(s) + [pa.field("req", pa.int64(), nullable=False)])
    with pytest.raises(ValueError, match="must be nullable"):
        t.append(pa.table(
            {"k": pa.array([1]), "v": pa.array(["a"]), "req": pa.array([1])},
            schema=s2,
        ))


def test_nullable_key_rejected_at_create(tmp_path):
    s = pa.schema([pa.field("k", pa.int64()), pa.field("v", pa.string())])
    with pytest.raises(ValueError, match="non-nullable"):
        Table.create(str(tmp_path / "t"), schema=s, key=["k"])


# ------------------------------------------------- SaveMode / upsert / delete
def test_savemode_semantics(tmp_path):
    s = _schema(k=pa.int64(), v=pa.string())
    t = Table.create(str(tmp_path / "t"), schema=s, key=["k"])
    d1 = pa.table({"k": pa.array([1]), "v": pa.array(["a"])}, schema=s)
    d2 = pa.table({"k": pa.array([2]), "v": pa.array(["b"])}, schema=s)
    t.write(d1, mode="append")
    with pytest.raises(FileExistsError):
        t.write(d2, mode="error_if_exists")
    t.write(d2, mode="ignore")          # no-op
    assert t.count_rows() == 1
    t.write(d2, mode="overwrite")       # replaces all live fragments
    assert t.to_arrow()["k"].to_pylist() == [2]
    t.write(d1, mode="append")
    assert t.count_rows() == 2


def test_upsert_and_delete_by_key(tmp_path):
    s = _schema(k=pa.int64(), v=pa.string())
    t = Table.create(str(tmp_path / "t"), schema=s, key=["k"])
    t.upsert(pa.table({"k": pa.array([1, 2]), "v": pa.array(["a", "b"])}, schema=s))
    t.upsert(pa.table({"k": pa.array([2, 3]), "v": pa.array(["B", "c"])}, schema=s))
    got = t.read_compacted().to_pandas().sort_values("k")
    assert got["k"].tolist() == [1, 2, 3]
    assert got["v"].tolist() == ["a", "B", "c"]  # last write wins per key
    t.delete_by_key(pa.table({"k": pa.array([1])}))
    got = t.read_compacted().to_pandas().sort_values("k")
    assert got["k"].tolist() == [2, 3]
    # re-upsert after delete resurrects the key
    t.upsert(pa.table({"k": pa.array([1]), "v": pa.array(["z"])}, schema=s))
    got = t.read_compacted().to_pandas().sort_values("k")
    assert got["v"].tolist() == ["z", "B", "c"]


def test_upsert_requires_key(tmp_path):
    s = _schema(k=pa.int64(), v=pa.string())
    t = Table.create(str(tmp_path / "t"), schema=s)
    with pytest.raises(ValueError, match="key"):
        t.upsert(pa.table({"k": pa.array([1]), "v": pa.array(["a"])}, schema=s))


def test_create_or_open_key_adoption_and_mismatch(tmp_path):
    """Re-opening with a key adopts it on a key-less table and verifies it
    on a keyed one (code-review regression: it was silently ignored)."""
    s = _schema(k=pa.int64(), v=pa.string())
    Table.create(str(tmp_path / "t"), schema=s)
    t = Table.create(str(tmp_path / "t"), schema=s, key=["k"])
    assert t.key_columns() == ["k"]
    t.upsert(pa.table({"k": pa.array([1]), "v": pa.array(["a"])}, schema=s))
    s_nn = pa.schema(
        [pa.field("k", pa.int64(), nullable=False),
         pa.field("v", pa.string(), nullable=False)]
    )
    with pytest.raises(ValueError, match="already keyed"):
        Table.create(str(tmp_path / "t"), schema=s_nn, key=["v"])


def test_upsert_evolves_schema_like_append(tmp_path):
    s = _schema(k=pa.int64(), v=pa.string())
    t = Table.create(str(tmp_path / "t"), schema=s, key=["k"])
    s2 = pa.schema(list(s) + [pa.field("extra", pa.float64())])
    t.upsert(pa.table(
        {"k": pa.array([1]), "v": pa.array(["a"]), "extra": pa.array([2.5])},
        schema=s2,
    ))
    assert t.schema().get_field_index("extra") >= 0
    got = t.read_compacted()
    assert got["extra"].to_pylist() == [2.5]


def test_compact_merges_preserving_versions(tmp_path):
    import pyarrow as pa

    from hydra_ray.table import Table

    root = str(tmp_path / "t")
    t = Table.create(root, pa.schema([("k", pa.int64()), ("v", pa.string())]))
    for i in range(10):
        t.append(
            pa.table({"k": [i * 2, i * 2 + 1], "v": [f"a{i}", f"b{i}"]}),
            partition=i % 2,
        )
    v_before = t.latest_version()
    n_frags_before = len(t.fragments())
    rows_before = t.to_arrow().to_pandas().sort_values("k").reset_index(drop=True)

    v_new = t.compact(target_rows=1000)
    assert v_new == v_before + 1
    frags = t.fragments()
    assert len(frags) == 2  # one merged fragment per partition
    assert {f.partition for f in frags} == {0, 1}
    rows_after = t.to_arrow().to_pandas().sort_values("k").reset_index(drop=True)
    assert rows_after.equals(rows_before)
    # time travel: the pre-compaction version still reads the old layout
    assert len(t.fragments(v_before)) == n_frags_before
    assert t.count_rows(v_before) == len(rows_before)
    # delta contract: a reader at the horizon sees NOTHING new
    assert t.read_fragments(after_version=v_before) == []
    # merged fragments carry the max input added_version, not the commit's
    assert all(f.added_version <= v_before for f in frags)
    # big fragments and fresh appends stay untouched by a second compact
    t.append(pa.table({"k": [100], "v": ["z"]}), partition=0)
    assert t.compact(target_rows=1, reader_horizon=v_before) is None


def test_compact_keyed_preserves_mvcc_and_tombstones(tmp_path):
    import pyarrow as pa

    from hydra_ray.table import Table

    root = str(tmp_path / "kt")
    t = Table.create(
        root,
        pa.schema([pa.field("k", pa.string(), nullable=False),
                   ("v", pa.int64())]),
        key=["k"]
    )
    t.upsert(pa.table({"k": ["x", "y"], "v": [1, 10]}))       # v1 small
    t.delete_by_key(pa.table({"k": ["y"]}))                    # v2 tombstone
    t.upsert(pa.table({"k": ["x", "z"], "v": [2, 30]}))        # v3 small
    big = pa.table({"k": [f"pad{i}" for i in range(50)] + ["x"],
                    "v": list(range(50)) + [99]})
    t.upsert(big)                                              # v4 big (kept)
    t.upsert(pa.table({"k": ["w"], "v": [7]}))                 # v5 small
    before = t.read_compacted().to_pandas().sort_values("k").reset_index(drop=True)
    assert before.set_index("k")["v"]["x"] == 99               # v4 wins
    assert "y" not in set(before["k"])                         # tombstoned

    v = t.compact(target_rows=20)  # merges the v1-v3 run; v4 kept; v5 single
    assert v is not None
    after = t.read_compacted().to_pandas().sort_values("k").reset_index(drop=True)
    assert after.equals(before)
    # the merged fragment pre-compacted per key and kept the tombstone row
    frags = t.fragments()
    assert len(frags) < 5
    merged = [f for f in frags if f.added_version == 3 and f.rows <= 4]
    assert merged, [f.__dict__ for f in frags]
    # a later upsert still supersedes the merged history
    t.upsert(pa.table({"k": ["z"], "v": [31]}))
    assert (
        t.read_compacted().to_pandas().set_index("k")["v"]["z"] == 31
    )


def test_truncate_history_bounds_manifest_log(tmp_path):
    """Endless-stream maintenance: truncate_history keeps only the newest
    K manifest versions and deletes fragments only THEY referenced;
    current reads, later commits, delta reads and gc stay intact."""
    t = Table.create(str(tmp_path / "t"))
    for e in range(10):
        s = t.stage_fragment(_tbl(3, e * 3), epoch=e, partition=0)
        t.commit_epoch("pipe", e, [s])
    # overwrite makes the early fragments referenced ONLY by old versions
    t.write(_tbl(5), mode="overwrite")
    latest = t.latest_version()
    info = t.truncate_history(keep_versions=3)
    assert info["versions_deleted"] == latest - 3 + 1
    # manifests are copy-forward: pre-overwrite fragments stay referenced
    # by the kept append-era versions, so nothing is deleted yet...
    assert info["fragments_deleted"] == 0
    # ...until the replace version is the only one kept
    info2 = t.truncate_history(keep_versions=1)
    assert info2["fragments_deleted"] >= 10  # the pre-overwrite frags
    # live content intact, epoch state intact, log bounded
    assert t.count_rows() == 5
    assert t.committed_epoch("pipe") == 9
    versions = [int(n.split(".")[0]) for n in
                t.fs.list_dir(os.path.join(t.root, "_versions"))]
    assert len(versions) == 1 and max(versions) == latest
    # idempotent + future commits keep working
    assert t.truncate_history(1)["versions_deleted"] == 0
    t.append(_tbl(2, 100))
    assert t.count_rows() == 7
    assert t.gc_staged() == 0   # nothing dangling after truncation
    # delta read against the kept window still works
    assert sum(f.rows for f in t.read_fragments(latest)) == 2


def test_truncate_history_on_strict_backend(tmp_path):
    t = Table.create(f"strict://{tmp_path}/t")
    for e in range(6):
        s = t.stage_fragment(_tbl(2, e * 2), epoch=e, partition=0)
        t.commit_epoch("pipe", e, [s])
    t.truncate_history(keep_versions=2)
    assert t.count_rows() == 12          # append-only: all still live
    assert t.committed_epoch("pipe") == 5


def test_time_travel_and_tags(tmp_path):
    """AS-OF reads via manifest commit stamps; named tags pin snapshots
    (survive history truncation, movable, readable by version)."""
    import time as _time

    t = Table.create(str(tmp_path / "t"))
    t.append(_tbl(3))
    v1 = t.latest_version()
    stamp = int(_time.time() * 1000)
    _time.sleep(0.01)
    t.append(_tbl(2, 3))
    # AS-OF the stamp sees only the first append
    av = t.version_at(stamp)
    assert av == v1
    assert sum(f.rows for f in t.fragments(av)) == 3
    assert t.version_at(int(_time.time() * 1000)) == t.latest_version()
    assert t.version_at(-1) is None

    # tags: pin, read, survive truncation, move
    t.tag("release-1", v1)
    assert t.tagged_version("release-1") == v1
    for e in range(6):
        t.append(_tbl(1, 10 + e))
    t.truncate_history(keep_versions=2)
    # the tagged manifest (and its readable content) survived
    assert sum(f.rows for f in t.fragments(t.tagged_version("release-1"))) == 3
    before = t.latest_version()
    t.tag("release-1")              # move to the current latest (the
    assert t.tagged_version("release-1") == before  # tag commit appends)
    with pytest.raises(KeyError):
        t.tagged_version("nope")
    with pytest.raises(ValueError):
        t.tag("bad", version=999)
