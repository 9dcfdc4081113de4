"""Every streaming feature enabled simultaneously: exact dedup tier,
near-dup tier, CEP funnel, CDC changelog, hot-key salting, payload audio
features, and the silence-trim payload transform — composition must not
break any individual invariant, and crash/resume must stay exactly-once
with the whole stack on."""

import numpy as np
import pandas as pd
import pytest

from hydra_ray.pipelines.replicate import (
    CrashPoint,
    ReplicateConfig,
    ReplicatePipeline,
    read_replicated,
    trim_payload,
)
from hydra_ray.synth import synth_clips_table, synth_updates_table
from hydra_ray.table import Table

N_CLIPS = 576  # 3 × synth_wave period 192 → every payload has 2 dup copies
VERSIONS = 3


def full_cfg(**kw):
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
        dedup=True,
        neardup=True,
        funnel_steps=("clip", "update"),
        changelog=True,
        window_sample_k=64,
        window_distinct_k=64,
        window_mode_k=64,
        window_top_k=3,
        session_sample_k=64,
        temporal_join=True,
        early_fire=True,
        audio_features=True,
        payload_transform=trim_payload,
        compact_sinks_every=2,
        **kw,
    )


def _build(root):
    clips = synth_clips_table(N_CLIPS, hot_fraction=0.5)
    ct = Table.create(f"{root}/clips", schema=clips.schema)
    step = N_CLIPS // VERSIONS
    for v in range(VERSIONS):
        ct.append(clips.slice(v * step, step))
    upd = synth_updates_table(N_CLIPS)
    ut = Table.create(f"{root}/updates", schema=upd.schema)
    ustep = -(-upd.num_rows // VERSIONS)
    for v in range(VERSIONS):
        ut.append(upd.slice(v * ustep, min(ustep, upd.num_rows - v * ustep)))


def _check_outputs(root, metrics):
    repl = read_replicated(f"{root}/out")
    df = repl.to_pandas()
    # payload enrichment columns present on every emitted row
    for c in ("rms", "dom_freq_hz", "trimmed_ms", "n_samples"):
        assert c in df.columns, c
    # temporal as-of columns present; rev only ever null alongside text
    assert "asof_transcript" in df.columns and "asof_rev" in df.columns
    assert (df["asof_rev"].isna() <= df["asof_transcript"].isna()).all()
    emitted = df[~df["deleted"].astype(bool)] if "deleted" in df else df
    assert df["seq"].is_unique
    # both dedup tiers fired; their drop sets OVERLAP (an exact copy is
    # also a hamming-0 near-dup), and on the periodic synth fixture the
    # near-dup set is a superset — so the union equals neardup_dropped
    # and the accounting closes against it
    dd, nd = metrics.get("dedup_dropped", 0), metrics.get("neardup_dropped", 0)
    late = metrics.get("clips_late", 0)
    assert dd > 0 and nd >= dd
    assert len(df) + late + nd == N_CLIPS
    # the other sinks produced rows under the full stack
    for sink in ("windows", "sessions", "changelog", "funnels"):
        assert Table(f"{root}/out/{sink}").count_rows() > 0, sink
    # all four window sketches ride together (10-entry cells)
    win = Table(f"{root}/out/windows").to_arrow().to_pandas()
    assert {"p50_dur_ms", "distinct_content", "mode_h",
            "top_durs", "top1_dur_ms"} <= set(win.columns)
    assert (win["top1_dur_ms"] == [
        x[0] if len(x) else 0 for x in win["top_durs"]]).all()
    return df


def test_all_features_compose(ray_session, tmp_path):
    root = str(tmp_path)
    _build(root)
    pipe = ReplicatePipeline(f"{root}/clips", f"{root}/out", full_cfg(),
                             f"{root}/updates")
    metrics = pipe.run()
    df = _check_outputs(root, metrics)

    # exactly-once under crash/resume with EVERYTHING on: crash between
    # prepare and commit, resume, outputs byte-identical to the clean run
    root2 = str(tmp_path / "crashy")
    import os

    os.makedirs(root2)
    _build(root2)
    pipe2 = ReplicatePipeline(
        f"{root2}/clips", f"{root2}/out",
        full_cfg(crash_at=(2, "after_prepare")), f"{root2}/updates")
    with pytest.raises(CrashPoint):
        pipe2.run()
    pipe3 = ReplicatePipeline(f"{root2}/clips", f"{root2}/out", full_cfg(),
                              f"{root2}/updates")
    metrics3 = pipe3.run()
    df2 = _check_outputs(root2, metrics3)
    a = df.sort_values("seq").reset_index(drop=True)
    b = df2.sort_values("seq").reset_index(drop=True)
    cols = ["seq", "clip_id", "transcript", "deleted", "epoch",
            "n_samples", "trimmed_ms", "asof_transcript", "asof_rev"]
    pd.testing.assert_frame_equal(a[cols], b[cols])
    assert np.allclose(a["rms"], b["rms"], equal_nan=True)
