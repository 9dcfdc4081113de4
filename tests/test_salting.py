"""Hot-key salting wired into the streaming pipeline (north-rule skew).

A strongly-skewed fixture (90% of rows on 10 clip_ids) must spread across
state actors once the sticky hot set kicks in, while every semantic oracle
(join enrichment, windows, sessions, compacted view, exactly-once resume)
stays byte-identical to the unsalted semantics.
"""

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

N_CLIPS = 800
VERSIONS = 4
HOT_FRACTION = 0.9


def build_sources(root):
    clips = synth_clips_table(N_CLIPS, hot_fraction=HOT_FRACTION)
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


def cfg(**kw):
    return ReplicateConfig(
        num_partitions=4,
        join_window_ms=60_000,
        allowed_lateness_ms=30_000,
        window_size_ms=10_000,
        session_gap_ms=5_000,
        sliding_size_ms=20_000,
        sliding_slide_ms=10_000,
        actor_num_cpus=0.25,
        hot_key_threshold=0.01,
        n_salts=4,
        **kw,
    )


@pytest.fixture(scope="module")
def hot_run(tmp_path_factory, ray_session):
    root = str(tmp_path_factory.mktemp("salt"))
    clips, upd = build_sources(root)
    pipe = ReplicatePipeline(f"{root}/clips", f"{root}/out", cfg(), f"{root}/updates")
    metrics = pipe.run()
    return root, clips, upd, pipe, metrics


def test_hot_keys_detected_and_persisted(hot_run):
    root, *_ = hot_run
    state = Table(f"{root}/out/replicated").pipeline_state("replicate")
    hot = state.get("hot_keys", [])
    # the 10 reused ids carry ~90% of rows — all should be sticky-hot
    assert len(hot) >= 8, hot
    assert all(h.startswith("clip-0000000") for h in hot)


def test_clip_spread_bounded(hot_run):
    """Per-partition replicated-row spread ≤ 2× the median (VERDICT.md
    acceptance): without salting one home partition would hold ~90%."""
    root, *_ = hot_run
    repl = Table(f"{root}/out/replicated").to_arrow().to_pandas()
    per_part = repl.groupby("partition").size()
    med = per_part.median()
    assert per_part.max() <= 2 * med, per_part.to_dict()


def test_counts_and_uniqueness(hot_run):
    root, clips, upd, pipe, metrics = hot_run
    repl = Table(f"{root}/out/replicated").to_arrow()
    assert repl.num_rows + metrics.get("clips_late", 0) == N_CLIPS
    assert repl.column("seq").to_pandas().is_unique


def test_join_oracle_salted(hot_run):
    from tests.test_replicate import _oracle

    root, clips, upd, pipe, metrics = hot_run
    lineage = read_lineage(f"{root}/out")
    import tests.test_replicate as tr

    saved = tr.N_CLIPS
    tr.N_CLIPS = N_CLIPS
    try:
        cdf, udf, ok = _oracle(clips, upd, lineage)
    finally:
        tr.N_CLIPS = saved
    repl = (
        Table(f"{root}/out/replicated")
        .to_arrow()
        .select(["seq", "transcript", "deleted", "epoch"])
        .to_pandas()
        .sort_values("seq")
        .reset_index(drop=True)
    )
    ref = (
        ok[["seq", "final_transcript", "deleted", "emit_epoch"]]
        .sort_values("seq")
        .reset_index(drop=True)
    )
    assert len(repl) == len(ref)
    assert (repl["transcript"].fillna("∅") == ref["final_transcript"].fillna("∅")).all()
    assert (repl["deleted"] == ref["deleted"]).all()
    assert repl["epoch"].tolist() == ref["emit_epoch"].tolist()


def test_window_oracle_salted(hot_run):
    """Hot-key windows merge across salt partitions: exactly one output row
    per (clip_id, window) with the global count."""
    from tests.test_replicate import _oracle

    root, clips, upd, pipe, metrics = hot_run
    lineage = read_lineage(f"{root}/out")
    import tests.test_replicate as tr

    saved = tr.N_CLIPS
    tr.N_CLIPS = N_CLIPS
    try:
        cdf, _, _ = _oracle(clips, upd, lineage)
    finally:
        tr.N_CLIPS = saved
    ok = cdf[~cdf["late"]]
    ref = (
        ok.assign(window_start=(ok["ms"] // 10_000) * 10_000)
        .groupby(["clip_id", "window_start"])
        .agg(n_clips=("seq", "size"), sum_dur_ms=("dur_ms", "sum"))
        .reset_index()
        .sort_values(["clip_id", "window_start"])
        .reset_index(drop=True)
    )
    got = (
        Table(f"{root}/out/windows")
        .to_arrow()
        .to_pandas()
        .sort_values(["clip_id", "window_start"])
        .reset_index(drop=True)
    )
    assert len(got) == len(ref), (len(got), len(ref))
    pd.testing.assert_frame_equal(
        got[["clip_id", "window_start", "n_clips", "sum_dur_ms"]],
        ref.astype({"sum_dur_ms": "int64"}),
        check_dtype=False,
    )


def test_session_oracle_salted(hot_run):
    from hydra_ray.stages.windows import sessionize_sorted
    from tests.test_replicate import _oracle

    root, clips, upd, pipe, metrics = hot_run
    lineage = read_lineage(f"{root}/out")
    import tests.test_replicate as tr

    saved = tr.N_CLIPS
    tr.N_CLIPS = N_CLIPS
    try:
        cdf, _, _ = _oracle(clips, upd, lineage)
    finally:
        tr.N_CLIPS = saved
    ok = cdf[~cdf["late"]]
    rows = []
    for cid, g in ok.groupby("clip_id"):
        ms = np.sort(g["ms"].to_numpy())
        sid = sessionize_sorted(ms, 5_000)
        g = g.sort_values("ms")
        for s in np.unique(sid):
            sel = g[sid == s]
            rows.append(
                (cid, int(sel["ms"].iloc[0]), int(sel["ms"].iloc[-1]),
                 len(sel), int(sel["dur_ms"].sum()))
            )
    ref = pd.DataFrame(
        rows, columns=["clip_id", "session_start", "session_end", "n_clips", "sum_dur_ms"]
    ).sort_values(["clip_id", "session_start"]).reset_index(drop=True)
    got = (
        Table(f"{root}/out/sessions")
        .to_arrow()
        .to_pandas()
        .sort_values(["clip_id", "session_start"])
        .reset_index(drop=True)
    )
    assert len(got) == len(ref), (len(got), len(ref))
    pd.testing.assert_frame_equal(got[ref.columns.tolist()], ref, check_dtype=False)


def test_view_oracle_salted(hot_run):
    """Compacted view: hot keys appear exactly once (home partition only)."""
    from tests.test_replicate import _oracle

    root, clips, upd, pipe, metrics = hot_run
    lineage = read_lineage(f"{root}/out")
    import tests.test_replicate as tr

    saved = tr.N_CLIPS
    tr.N_CLIPS = N_CLIPS
    try:
        _, udf, _ = _oracle(clips, upd, lineage)
    finally:
        tr.N_CLIPS = saved
    live = udf[~udf["late"]].copy()
    live = live.sort_values(["clip_id", "ms", "revision"], kind="mergesort")
    ref = live.drop_duplicates(subset=["clip_id"], keep="last")
    got = (
        Table(f"{root}/out/views")
        .to_arrow()
        .to_pandas()
        .sort_values("clip_id")
        .reset_index(drop=True)
    )
    ref = ref.sort_values("clip_id").reset_index(drop=True)
    assert got["clip_id"].is_unique
    assert got["clip_id"].tolist() == ref["clip_id"].tolist()
    assert (
        got["transcript"].fillna("∅").tolist() == ref["transcript"].fillna("∅").tolist()
    )


def test_exactly_once_salted(tmp_path, ray_session, hot_run):
    """Crash+resume under salting reproduces the clean salted run exactly
    (hot set restored from the commit, buffers re-copied idempotently)."""
    from tests.test_replicate import _content_signature

    clean_sig = _content_signature(f"{hot_run[0]}/out")
    root = str(tmp_path)
    build_sources(root)
    pipe = ReplicatePipeline(
        f"{root}/clips", f"{root}/out", cfg(crash_at=(2, "after_prepare")),
        f"{root}/updates",
    )
    with pytest.raises(CrashPoint):
        pipe.run()
    pipe2 = ReplicatePipeline(f"{root}/clips", f"{root}/out", cfg(), f"{root}/updates")
    pipe2.run()
    assert _content_signature(f"{root}/out") == clean_sig
