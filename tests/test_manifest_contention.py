"""Concurrent-writer manifest contention (VERDICT r4 #4).

The manifest log is this engine's single serialization point — the
analogue of the reference broker's per-partition log
(`ingestors/kafka/src/main/scala/hydra/ingestors/.../algebras/
KafkaClientAlgebra.scala:217-262`).  A multi-node deployment runs epoch
commits, upserts, compaction and history maintenance CONCURRENTLY from
different drivers, so every read-modify-write on manifest state must be
re-validated INSIDE the conditional-PUT retry loop — a pre-loop snapshot
is a TOCTOU hole (double-committed epochs, clobbered sibling-pipeline
state).

Two layers here:

1. deterministic interleavings — a patched ``_write_manifest`` injects a
   competing writer's full commit between a writer's snapshot read and
   its conditional PUT (the exact race a zombie driver produces);
2. a multi-process stress run on ``StrictObjectFS`` — epoch-committing
   drivers × an upsert writer × a compaction loop with an injected
   mid-2PC crash — asserting a linearizable history (dense versions,
   exactly-once epochs, no lost pipeline state, per-key LWW intact) and
   complete orphan GC afterwards.
"""

import json
import multiprocessing as mp
import os

import pyarrow as pa
import pytest

from hydra_ray.table import Table
from hydra_ray.table.lancelite import _Manifest


def _tbl(n, start=0):
    return pa.table({
        "k": pa.array(range(start, start + n), pa.int64()),
        "v": pa.array([f"v{start + i}" for i in range(n)], pa.string()),
    })


def _inject_before_first_put(table: Table, competing):
    """Patch ``table._write_manifest`` so ``competing()`` runs right
    before the FIRST conditional PUT — after the writer snapshotted the
    manifest, before it publishes (the zombie-driver interleave)."""
    orig = Table._write_manifest
    state = {"fired": False}

    def patched(self, m):
        if not state["fired"]:
            state["fired"] = True
            competing()
        return orig(self, m)

    table._write_manifest = patched.__get__(table, Table)


# ------------------------------------------------- deterministic interleaves
def test_same_pipeline_epoch_commits_exactly_once(tmp_path):
    """Two drivers race to commit THE SAME epoch: the loser must detect
    the already-advanced last_epoch inside its retry loop, abort, and
    discard its staged fragments — not append a second copy."""
    root = f"strict://{tmp_path}/t"
    Table.create(root)
    a, b = Table(root), Table(root)
    fa = [a.stage_fragment(_tbl(3), epoch=0, partition=0)]
    fb = [b.stage_fragment(_tbl(3), epoch=0, partition=0)]

    _inject_before_first_put(
        a, lambda: b.commit_epoch("p", 0, fb))
    assert a.commit_epoch("p", 0, fa) is False  # loser must no-op
    t = Table(root)
    assert t.committed_epoch("p") == 0
    assert t.count_rows() == 3          # exactly one copy of epoch 0
    # the loser's staged fragment is deleted outright (no orphan)
    assert t.gc_staged() == 0


def test_sibling_pipeline_state_not_clobbered(tmp_path):
    """Pipeline A's commit retry must merge the pipelines dict from the
    FRESH manifest — a snapshot merge erases pipeline B's concurrent
    commit (B would then replay its epoch: duplicated output)."""
    root = f"strict://{tmp_path}/t"
    Table.create(root)
    a, b = Table(root), Table(root)
    fa = [a.stage_fragment(_tbl(2), epoch=0, partition=0)]
    fb = [b.stage_fragment(_tbl(2, 10), epoch=0, partition=0)]

    _inject_before_first_put(
        a, lambda: b.commit_epoch("pb", 0, fb))
    assert a.commit_epoch("pa", 0, fa) is True
    t = Table(root)
    assert t.committed_epoch("pa") == 0
    assert t.committed_epoch("pb") == 0   # lost under snapshot-merge
    assert t.count_rows() == 4


def test_update_pipeline_state_merges_fresh(tmp_path):
    root = f"strict://{tmp_path}/t"
    Table.create(root)
    a, b = Table(root), Table(root)
    fb = [b.stage_fragment(_tbl(2), epoch=0, partition=0)]
    _inject_before_first_put(
        a, lambda: b.commit_epoch("pb", 0, fb))
    a.update_pipeline_state("pa", {"num_partitions": 4})
    t = Table(root)
    assert t.pipeline_state("pa") == {"num_partitions": 4}
    assert t.committed_epoch("pb") == 0


def test_tags_merge_fresh(tmp_path):
    root = f"strict://{tmp_path}/t"
    Table.create(root)
    a, b = Table(root), Table(root)
    a.append(_tbl(1))
    _inject_before_first_put(a, lambda: b.tag("from-b"))
    a.tag("from-a")
    tags = Table(root).tags()
    assert set(tags) == {"from-a", "from-b"}


# ----------------------------------------------------- multi-process stress
def _epoch_driver(root, pipeline, n_epochs, crash_epoch, q):
    """Commit a chain of epochs; optionally 'crash' once between stage
    and commit (leaving an orphan object), then resume like a restarted
    driver would: re-stage and commit the same epoch."""
    try:
        t = Table(root)
        committed = t.committed_epoch(pipeline)
        for e in range(committed + 1, n_epochs):
            frag = t.stage_fragment(
                _tbl(5, e * 1000), epoch=e, partition=0)
            if e == crash_epoch:
                # crashed mid-2PC: orphan stays; a restarted driver
                # re-stages deterministically and commits
                frag = t.stage_fragment(
                    _tbl(5, e * 1000), epoch=e, partition=0)
            ok = t.commit_epoch(pipeline, e, [frag])
            assert ok, (pipeline, e)
        q.put(("ok", pipeline))
    except Exception as exc:  # surface in the parent
        q.put(("err", f"{pipeline}: {exc!r}"))


def _upsert_writer(root, lo, hi, rounds, q):
    try:
        t = Table(root)
        for r in range(rounds):
            t.upsert(pa.table({
                "k": pa.array(range(lo, hi), pa.int64()),
                "v": pa.array([f"r{r}-{k}" for k in range(lo, hi)],
                              pa.string()),
            }))
        q.put(("ok", f"upsert-{lo}"))
    except Exception as exc:
        q.put(("err", f"upsert-{lo}: {exc!r}"))


def _compactor(root, rounds, q):
    try:
        t = Table(root)
        for _ in range(rounds):
            try:
                t.compact(target_rows=100)
            except RuntimeError:
                pass  # contention abort is allowed; corruption is not
        q.put(("ok", "compact"))
    except Exception as exc:
        q.put(("err", f"compact: {exc!r}"))


def _history(root):
    t = Table(root)
    versions = sorted(
        int(n.split(".")[0])
        for n in t.fs.list_dir(os.path.join(t.root, "_versions"))
        if n.endswith(".json") and not n.startswith("."))
    manifests = [
        _Manifest.from_json(json.loads(t.fs.get(t._manifest_path(v))))
        for v in versions
    ]
    return t, versions, manifests


@pytest.mark.parametrize("backend", ["strict", "local"])
def test_concurrent_writers_linearizable(tmp_path, backend):
    scheme = "strict://" if backend == "strict" else ""
    root = f"{scheme}{tmp_path}/t"
    schema = pa.schema([
        pa.field("k", pa.int64(), nullable=False),
        pa.field("v", pa.string()),
    ])
    Table.create(root, key=["k"], schema=schema)

    n_epochs = 6
    q = mp.Queue()
    procs = [
        mp.Process(target=_epoch_driver, args=(root, "pa", n_epochs, 2, q)),
        mp.Process(target=_epoch_driver, args=(root, "pb", n_epochs, -1, q)),
        mp.Process(target=_upsert_writer, args=(root, 10_000, 10_040, 4, q)),
        mp.Process(target=_upsert_writer, args=(root, 20_000, 20_040, 4, q)),
        mp.Process(target=_compactor, args=(root, 3, q)),
    ]
    for p in procs:
        p.start()
    results = [q.get(timeout=120) for _ in procs]
    for p in procs:
        p.join(timeout=30)
    errs = [msg for kind, msg in results if kind == "err"]
    assert not errs, errs

    t, versions, manifests = _history(root)

    # 1. dense version history (every conditional PUT that won is v+1;
    #    create() writes version 0)
    assert versions == list(range(len(versions)))

    # 2. exactly-once epochs: per pipeline, one committed fragment chain
    #    0..n-1 with no duplicates anywhere in the final manifest
    final = manifests[-1]
    for pipeline in ("pa", "pb"):
        assert int(final.properties["pipelines"][pipeline]["last_epoch"]) \
            == n_epochs - 1
    by_epoch = {}
    for f in final.fragments:
        if f.epoch is not None:
            by_epoch.setdefault(f.epoch, []).append(f)
    # epoch fragments may have been compacted away (keyed compaction
    # pre-merges runs) — but any surviving (partition, epoch) pair must
    # appear at most twice (once per pipeline; partitions are both 0)
    for e, frs in by_epoch.items():
        assert len(frs) <= 2, (e, frs)

    # 3. monotone state: pipelines' last_epoch never decreases along the
    #    history (a clobbered merge would show a regression)
    seen = {}
    for m in manifests:
        for pl, st in m.properties.get("pipelines", {}).items():
            le = int(st.get("last_epoch", -1))
            assert le >= seen.get(pl, -1), (pl, le, seen)
            seen[pl] = le

    # 4. keyed LWW intact: each upsert writer's keys hold its LAST round
    comp = t.read_compacted()
    kv = dict(zip(comp["k"].to_pylist(), comp["v"].to_pylist()))
    for lo in (10_000, 20_000):
        for k in range(lo, lo + 40):
            assert kv[k] == f"r3-{k}", (k, kv[k])
    # epoch rows all present exactly once per pipeline
    n_epoch_rows = sum(1 for k in kv if k < 10_000)
    assert n_epoch_rows == n_epochs * 5  # both pipelines wrote same keys
    # (same key range from pa and pb: LWW keeps one copy per key)

    # 5. complete orphan GC at quiesce: data dir == referenced set after
    #    gc (the crashed driver's orphan from epoch 2 is collected)
    removed = t.gc_staged()
    assert removed >= 1  # the injected mid-2PC orphan
    referenced = set()
    for m in manifests:
        referenced.update(f.path for f in m.fragments)
    on_disk = {os.path.join("data", n)
               for n in t.fs.list_dir(os.path.join(t.root, "data"))}
    assert on_disk == {p for p in referenced if t.fs.exists(
        os.path.join(t.root, p))}
    # current version still reads clean after GC
    assert t.read_compacted().num_rows == len(kv)
