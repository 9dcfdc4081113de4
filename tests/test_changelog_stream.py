"""Streaming CDC changelog sink: epoch-replay oracle, view reconstruction,
partition/salting invariance, crash/resume exactly-once."""

import numpy as np
import pandas as pd
import pytest

from hydra_ray.pipelines.replicate import (
    CrashPoint,
    ReplicateConfig,
    ReplicatePipeline,
    read_lineage,
)
from hydra_ray.synth import synth_clips_table, synth_updates_table
from hydra_ray.table import Table

N_CLIPS = 500
VERSIONS = 4


def _build(root):
    clips = synth_clips_table(N_CLIPS)
    ct = Table.create(f"{root}/clips", schema=clips.schema)
    step = N_CLIPS // VERSIONS
    for v in range(VERSIONS):
        ct.append(clips.slice(v * step, step))
    upd = synth_updates_table(N_CLIPS)
    ut = Table.create(f"{root}/updates", schema=upd.schema)
    ustep = -(-upd.num_rows // VERSIONS)
    for v in range(VERSIONS):
        ut.append(upd.slice(v * ustep, min(ustep, upd.num_rows - v * ustep)))
    return clips, upd


def _cfg(**kw):
    base = dict(
        num_partitions=4,
        join_window_ms=60_000,
        allowed_lateness_ms=30_000,
        window_size_ms=10_000,
        actor_num_cpus=0.25,
        changelog=True,
    )
    base.update(kw)
    return ReplicateConfig(**base)


def _epoch_of(lineage, source, version):
    for ent in lineage:
        lo, hi = ent[source]
        if lo < version <= hi:
            return ent["epoch"]
    return None


def _rec_eq(a, b):
    if a is None or b is None:
        return a is b
    return a[0] == b[0] and a[1] == b[1] and (
        (pd.isna(a[2]) and pd.isna(b[2])) or a[2] == b[2]
    )


def _changelog_ref(upd, lineage):
    """Replay the committed epoch slices through a pandas LWW view and
    derive the expected (epoch, key, op, ts, rev, transcript) rows."""
    wm_prev = {e["epoch"]: e["wm_prev"] for e in lineage}
    udf = upd.to_pandas()
    udf["ms"] = udf["event_ts"].astype("int64")
    ustep = -(-len(udf) // VERSIONS)
    udf["version"] = udf.index // ustep + 1
    udf["epoch"] = udf["version"].map(lambda v: _epoch_of(lineage, "updates", v))
    udf = udf[udf["ms"] >= udf["epoch"].map(wm_prev)]  # late rows → DLQ

    state: dict = {}
    rows = []
    for e in sorted(udf["epoch"].unique()):
        sub = udf[udf["epoch"] == e].sort_values(
            ["clip_id", "ms", "revision"], kind="mergesort"
        ).groupby("clip_id").tail(1)
        for _, r in sub.iterrows():
            k = r["clip_id"]
            rec = (int(r["ms"]), int(r["revision"]), r["transcript"])
            cur = state.get(k)
            if cur is not None and (rec[0], rec[1]) < (cur[0], cur[1]):
                continue  # stale: LWW keeps the current winner
            state[k] = rec
            if _rec_eq(rec, cur):
                continue  # re-won with an identical record: no change
            new_tomb = pd.isna(rec[2])
            prev_dead = cur is None or pd.isna(cur[2])
            if new_tomb and prev_dead:
                continue  # delete of nothing
            op = ("delete" if new_tomb
                  else "insert" if prev_dead else "update")
            rows.append((int(e), k, op, rec[0], rec[1],
                         None if new_tomb else rec[2]))
    out = pd.DataFrame(
        rows, columns=["epoch", "clip_id", "op", "ts_ms", "revision",
                       "transcript"],
    )
    return out.sort_values(["epoch", "clip_id"]).reset_index(drop=True)


def _read_changelog(root):
    got = Table(f"{root}/out/changelog").to_arrow().to_pandas()
    got = got[["epoch", "clip_id", "op", "ts_ms", "revision", "transcript"]]
    got["epoch"] = got["epoch"].astype(int)
    got["revision"] = got["revision"].astype(int)
    return got.sort_values(["epoch", "clip_id"]).reset_index(drop=True)


def test_changelog_matches_epoch_replay_oracle(tmp_path, ray_session):
    root = str(tmp_path)
    clips, upd = _build(root)
    pipe = ReplicatePipeline(f"{root}/clips", f"{root}/out", _cfg(),
                             f"{root}/updates")
    metrics = pipe.run()
    lineage = read_lineage(f"{root}/out")
    ref = _changelog_ref(upd, lineage)
    got = _read_changelog(root)
    assert len(got) > 0 and set(got["op"]) >= {"insert"}
    assert "delete" in set(ref["op"]), "fixture must exercise tombstones"
    pd.testing.assert_frame_equal(got, ref)
    assert metrics["changelog_out"] == len(ref)
    # ≤ 1 row per (key, epoch); ops form a legal lifecycle per key
    assert not got.duplicated(["epoch", "clip_id"]).any()
    for _, g in got.groupby("clip_id"):
        ops = g.sort_values("epoch")["op"].tolist()
        alive = False
        for op in ops:
            if op == "insert":
                assert not alive
                alive = True
            elif op == "update":
                assert alive
            else:
                assert alive
                alive = False


def test_changelog_replays_to_view(tmp_path, ray_session):
    """Applying the changelog in epoch order reconstructs exactly the
    live entries of the end-of-stream compacted view snapshot."""
    root = str(tmp_path)
    _build(root)
    ReplicatePipeline(f"{root}/clips", f"{root}/out", _cfg(),
                      f"{root}/updates").run()
    got = _read_changelog(root)
    live = {}
    for _, r in got.iterrows():
        if r["op"] == "delete":
            live.pop(r["clip_id"], None)
        else:
            live[r["clip_id"]] = (r["ts_ms"], r["revision"], r["transcript"])
    views = Table(f"{root}/out/views").to_arrow().to_pandas()
    vlive = views[views["transcript"].notna()]
    assert set(vlive["clip_id"]) == set(live)
    for _, r in vlive.iterrows():
        ts, rev, txt = live[r["clip_id"]]
        assert (ts, rev, txt) == (r["ts_ms"], r["revision"], r["transcript"])


def test_changelog_partition_and_salting_invariance(tmp_path, ray_session):
    outs = {}
    for name, kw in (("p4", dict(num_partitions=4, hot_key_threshold=0.0)),
                     ("p2", dict(num_partitions=2, hot_key_threshold=0.0)),
                     ("salted", dict(num_partitions=4,
                                     hot_key_threshold=0.005, n_salts=3))):
        root = str(tmp_path / name)
        _build(root)
        ReplicatePipeline(f"{root}/clips", f"{root}/out", _cfg(**kw),
                          f"{root}/updates").run()
        outs[name] = _read_changelog(root)
    assert len(outs["p4"]) > 0
    pd.testing.assert_frame_equal(outs["p4"], outs["p2"])
    pd.testing.assert_frame_equal(outs["p4"], outs["salted"])


def test_changelog_crash_resume_exactly_once(tmp_path, ray_session):
    clean_root = str(tmp_path / "clean")
    _build(clean_root)
    ReplicatePipeline(f"{clean_root}/clips", f"{clean_root}/out", _cfg(),
                      f"{clean_root}/updates").run()
    clean = _read_changelog(clean_root)

    crash_root = str(tmp_path / "crash")
    _build(crash_root)
    with pytest.raises(CrashPoint):
        ReplicatePipeline(
            f"{crash_root}/clips", f"{crash_root}/out",
            _cfg(crash_at=(2, "after_prepare")), f"{crash_root}/updates",
        ).run()
    ReplicatePipeline(f"{crash_root}/clips", f"{crash_root}/out", _cfg(),
                      f"{crash_root}/updates").run()
    resumed = _read_changelog(crash_root)
    assert len(clean) > 0
    pd.testing.assert_frame_equal(resumed, clean)
