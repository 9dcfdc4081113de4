"""window_top_k: streaming per-window EXACT top-k records by duration.

The cell sample is (k largest dur_ms, hash64(seq)) with smallest-hash
tie-break; union dedups by hash and keeps the k largest — an exact
order-independent monoid (a record in the union's top-k has < k larger
records in every partial's subset view, so each partial kept it).
Routing-(salting-)independent, delta-checkpoint/crash-safe, composable
with the sample/distinct/mode sketches."""

import numpy as np
import pandas as pd
import pytest

from hydra_ray.hashing import hash64
from hydra_ray.pipelines.replicate import ReplicateConfig, ReplicatePipeline
from hydra_ray.synth import synth_clips_table, synth_updates_table
from hydra_ray.table import Table

N_CLIPS = 300
VERSIONS = 2
WIN = 10_000


def _build(root):
    clips = synth_clips_table(N_CLIPS, hot_fraction=0.9)
    ct = Table.create(f"{root}/clips", schema=clips.schema)
    step = N_CLIPS // VERSIONS
    for v in range(VERSIONS):
        ct.append(clips.slice(v * step, step))
    upd = synth_updates_table(N_CLIPS)
    ut = Table.create(f"{root}/updates", schema=upd.schema)
    ustep = -(-upd.num_rows // VERSIONS)
    for v in range(VERSIONS):
        ut.append(upd.slice(v * ustep, min(ustep, upd.num_rows - v * ustep)))
    return clips


def _cfg(tk, salted, **kw):
    return ReplicateConfig(
        num_partitions=4,
        join_window_ms=60_000,
        allowed_lateness_ms=30_000,
        window_size_ms=WIN,
        session_gap_ms=0,
        sliding_size_ms=20_000,
        sliding_slide_ms=10_000,
        actor_num_cpus=0.25,
        window_top_k=tk,
        hot_key_threshold=0.01 if salted else 0.0,
        n_salts=4,
        **kw,
    )


def _run(root, tk, salted, **kw):
    clips = _build(root)
    ReplicatePipeline(f"{root}/clips", f"{root}/out", _cfg(tk, salted, **kw),
                      f"{root}/updates").run()
    got = (
        Table(f"{root}/out/windows").to_arrow().to_pandas()
        .sort_values(["clip_id", "window_start"]).reset_index(drop=True)
    )
    return clips, got


def _ref_topk(clips, root, tk):
    """Pandas reference: per (clip_id, window) cell the tk largest
    durations, descending, ties by smallest hash64(seq)."""
    df = clips.to_pandas()
    df["ms"] = df["event_ts"].astype("int64")
    df["h"] = hash64(df["seq"].to_numpy())
    dlq = Table(f"{root}/out/dlq").to_arrow().to_pandas()
    late = (
        set(dlq[(dlq["source"] == "clips") & (dlq["reason"] == "late")]["seq"])
        if "source" in dlq.columns else set()
    )
    ok = df[~df["seq"].isin(late)].copy()
    ok["window_start"] = (ok["ms"] // WIN) * WIN
    rows = []
    for (cid, ws), g in ok.groupby(["clip_id", "window_start"]):
        v = g["dur_ms"].to_numpy(np.int64)
        h = g["h"].to_numpy(np.uint64)
        order = np.lexsort((h, -v))[:tk]
        rows.append((cid, int(ws), v[order].tolist()))
    return (
        pd.DataFrame(rows, columns=["clip_id", "window_start", "top_durs"])
        .sort_values(["clip_id", "window_start"]).reset_index(drop=True)
    )


def test_topk_exact_and_composes(tmp_path, ray_session):
    tk = 3
    clips, got = _run(str(tmp_path / "a"), tk=tk, salted=False,
                      window_sample_k=64, window_distinct_k=64,
                      window_mode_k=64)
    assert {"top_durs", "top1_dur_ms", "p50_dur_ms", "distinct_content",
            "mode_h"} <= set(got.columns)
    ref = _ref_topk(clips, str(tmp_path / "a"), tk)
    assert len(got) == len(ref)
    assert [list(x) for x in got["top_durs"]] == ref["top_durs"].tolist()
    # top1 equals the cell max; list is descending and bounded by k
    assert (got["top1_dur_ms"]
            == [x[0] for x in got["top_durs"]]).all()
    for x in got["top_durs"]:
        assert len(x) <= tk and list(x) == sorted(x, reverse=True)


def test_topk_salting_invariant_and_schema_off(tmp_path, ray_session):
    tk = 2
    clips, plain = _run(str(tmp_path / "p"), tk=tk, salted=False)
    _, salted = _run(str(tmp_path / "s"), tk=tk, salted=True)
    assert [list(x) for x in plain["top_durs"]] == \
        [list(x) for x in salted["top_durs"]]
    pd.testing.assert_frame_equal(
        plain[["clip_id", "window_start", "n_clips", "sum_dur_ms",
               "top1_dur_ms"]],
        salted[["clip_id", "window_start", "n_clips", "sum_dur_ms",
                "top1_dur_ms"]],
    )
    ref = _ref_topk(clips, str(tmp_path / "p"), tk)
    assert [list(x) for x in plain["top_durs"]] == ref["top_durs"].tolist()
    # flag off: schema unchanged, counts identical
    _, off = _run(str(tmp_path / "o"), tk=0, salted=False)
    assert "top_durs" not in off.columns
    pd.testing.assert_frame_equal(
        plain[["clip_id", "window_start", "n_clips", "sum_dur_ms"]],
        off[["clip_id", "window_start", "n_clips", "sum_dur_ms"]],
    )
    # sliding windows carry the columns too
    sl = Table(f"{tmp_path}/p/out/sliding").to_arrow().to_pandas()
    assert "top_durs" in sl.columns


def test_topk_survives_crash_resume(tmp_path, ray_session):
    from hydra_ray.pipelines.replicate import CrashPoint

    _, clean = _run(str(tmp_path / "c"), tk=2, salted=True,
                    full_checkpoint_every=2)
    root = str(tmp_path / "x")
    _build(root)
    crash_cfg = _cfg(2, salted=True, full_checkpoint_every=2,
                     crash_at=(1, "after_prepare"))
    pipe = ReplicatePipeline(f"{root}/clips", f"{root}/out", crash_cfg,
                             f"{root}/updates")
    with pytest.raises(CrashPoint):
        pipe.run()
    ReplicatePipeline(f"{root}/clips", f"{root}/out",
                      _cfg(2, salted=True, full_checkpoint_every=2),
                      f"{root}/updates").run()
    got = (
        Table(f"{root}/out/windows").to_arrow().to_pandas()
        .sort_values(["clip_id", "window_start"]).reset_index(drop=True)
    )
    assert [list(x) for x in got["top_durs"]] == \
        [list(x) for x in clean["top_durs"]]
    pd.testing.assert_frame_equal(
        got[["clip_id", "window_start", "n_clips", "top1_dur_ms"]],
        clean[["clip_id", "window_start", "n_clips", "top1_dur_ms"]],
    )
