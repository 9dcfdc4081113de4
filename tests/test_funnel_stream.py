"""Streaming CEP funnel tier: batch-kernel parity, salting invariance,
crash/resume exactly-once."""

import numpy as np
import pandas as pd
import pytest

from hydra_ray.pipelines.replicate import (
    CrashPoint,
    ReplicateConfig,
    ReplicatePipeline,
    read_lineage,
)
from hydra_ray.stages.cep import _I64MAX, funnel_chain
from hydra_ray.synth import synth_clips_table, synth_updates_table
from hydra_ray.table import Table

N_CLIPS = 600
VERSIONS = 3
STEPS = ("clip", "update", "delete")
CODES = {"clip": 0, "update": 1, "delete": 2}


def _build(root, hot_fraction=0.1):
    clips = synth_clips_table(N_CLIPS, hot_fraction=hot_fraction)
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
        funnel_steps=STEPS,
    )
    base.update(kw)
    return ReplicateConfig(**base)


def _epoch_of(lineage, source, version):
    for ent in lineage:
        lo, hi = ent[source]
        if lo < version <= hi:
            return ent["epoch"]
    return None


def _funnel_ref(clips, upd, lineage, steps=STEPS, within=0):
    """Batch funnel_chain over exactly the rows the stream accepted
    (non-late vs each epoch's opening watermark, per committed lineage)."""
    wm_prev = {e["epoch"]: e["wm_prev"] for e in lineage}

    cdf = clips.to_pandas()
    cdf["ms"] = cdf["event_ts"].astype("int64")
    step = len(cdf) // VERSIONS
    cdf["version"] = cdf.index // step + 1
    cdf["epoch"] = cdf["version"].map(lambda v: _epoch_of(lineage, "clips", v))
    cdf = cdf[cdf["ms"] >= cdf["epoch"].map(wm_prev)]

    udf = upd.to_pandas()
    udf["ms"] = udf["event_ts"].astype("int64")
    ustep = -(-len(udf) // VERSIONS)
    udf["version"] = udf.index // ustep + 1
    udf["epoch"] = udf["version"].map(lambda v: _epoch_of(lineage, "updates", v))
    udf = udf[udf["ms"] >= udf["epoch"].map(wm_prev)]

    keys = np.concatenate([cdf["clip_id"].to_numpy(object),
                           udf["clip_id"].to_numpy(object)])
    tss = np.concatenate([cdf["ms"].to_numpy(np.int64),
                          udf["ms"].to_numpy(np.int64)])
    kinds = np.concatenate([
        np.zeros(len(cdf), np.int8),
        np.where(udf["transcript"].isna(), np.int8(2), np.int8(1)),
    ])
    uniq, t = funnel_chain(keys, tss, kinds, [CODES[s] for s in steps])
    done = t[:, -1] != _I64MAX
    if within:
        done &= (t[:, -1] - t[:, 0]) <= within
    out = pd.DataFrame({"clip_id": uniq[done].astype(str)})
    for i in range(len(steps)):
        out[f"t{i + 1}_ms"] = t[done, i]
    return out.sort_values("clip_id").reset_index(drop=True)


def _read_funnels(root):
    got = Table(f"{root}/out/funnels").to_arrow().to_pandas()
    cols = ["clip_id"] + [c for c in got.columns if c.startswith("t")]
    return got[cols].sort_values("clip_id").reset_index(drop=True)


def test_funnel_stream_matches_batch_chain(tmp_path, ray_session):
    root = str(tmp_path)
    clips, upd = _build(root)
    pipe = ReplicatePipeline(f"{root}/clips", f"{root}/out", _cfg(),
                             f"{root}/updates")
    metrics = pipe.run()
    lineage = read_lineage(f"{root}/out")
    ref = _funnel_ref(clips, upd, lineage)
    got = _read_funnels(root)
    assert len(got) > 0, "fixture must produce funnel completions"
    pd.testing.assert_frame_equal(got, ref)
    assert metrics["funnel_matches"] == len(ref)
    # each key emits exactly once
    assert got["clip_id"].is_unique


def test_funnel_within_window_filters(tmp_path, ray_session):
    root = str(tmp_path)
    clips, upd = _build(root)
    within = 28_500  # fixture chain durations span ~24.8–29 s
    pipe = ReplicatePipeline(
        f"{root}/clips", f"{root}/out",
        _cfg(funnel_within_ms=within), f"{root}/updates",
    )
    pipe.run()
    lineage = read_lineage(f"{root}/out")
    ref = _funnel_ref(clips, upd, lineage, within=within)
    got = _read_funnels(root)
    unfiltered = _funnel_ref(clips, upd, lineage)
    assert 0 < len(ref) < len(unfiltered), "within must filter some matches"
    pd.testing.assert_frame_equal(got, ref)


def test_funnel_salting_invariance(tmp_path, ray_session):
    # aggressive salting must not change funnel output (routing-independent
    # semantics: funnel rows always reach the home partition)
    roots = {}
    for name, kw in (("plain", dict(hot_key_threshold=0.0)),
                     ("salted", dict(hot_key_threshold=0.005, n_salts=3))):
        root = str(tmp_path / name)
        clips, upd = _build(root, hot_fraction=0.4)
        pipe = ReplicatePipeline(f"{root}/clips", f"{root}/out",
                                 _cfg(**kw), f"{root}/updates")
        pipe.run()
        roots[name] = _read_funnels(root)
    assert len(roots["plain"]) > 0
    pd.testing.assert_frame_equal(roots["plain"], roots["salted"])


def test_funnel_crash_resume_exactly_once(tmp_path, ray_session):
    clean_root = str(tmp_path / "clean")
    _build(clean_root)
    pipe = ReplicatePipeline(f"{clean_root}/clips", f"{clean_root}/out",
                             _cfg(), f"{clean_root}/updates")
    pipe.run()
    clean = _read_funnels(clean_root)

    crash_root = str(tmp_path / "crash")
    _build(crash_root)
    with pytest.raises(CrashPoint):
        ReplicatePipeline(
            f"{crash_root}/clips", f"{crash_root}/out",
            _cfg(crash_at=(2, "after_prepare")), f"{crash_root}/updates",
        ).run()
    ReplicatePipeline(f"{crash_root}/clips", f"{crash_root}/out",
                      _cfg(), f"{crash_root}/updates").run()
    resumed = _read_funnels(crash_root)
    assert len(clean) > 0
    pd.testing.assert_frame_equal(resumed, clean)
