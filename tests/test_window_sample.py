"""window_sample_k: streaming per-window quantiles from a deterministic
bottom-k-by-hash sample — exact when k covers the window, routing-
(salting-)independent, and a pure function of the data at any k."""

import numpy as np
import pandas as pd
import pytest

from hydra_ray.hashing import hash64
from hydra_ray.pipelines.replicate import ReplicateConfig, ReplicatePipeline
from hydra_ray.state.store import _sample_quantiles
from hydra_ray.synth import synth_clips_table, synth_updates_table
from hydra_ray.table import Table

N_CLIPS = 600
VERSIONS = 3
HOT_FRACTION = 0.9           # 90% of rows on few keys: windows hold many rows
WIN = 10_000


def _build(root):
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
    return clips


def _cfg(k, salted, **kw):
    return ReplicateConfig(
        num_partitions=4,
        join_window_ms=60_000,
        allowed_lateness_ms=30_000,
        window_size_ms=WIN,
        session_gap_ms=0,
        sliding_size_ms=20_000,
        sliding_slide_ms=10_000,
        actor_num_cpus=0.25,
        window_sample_k=k,
        hot_key_threshold=0.01 if salted else 0.0,
        n_salts=4,
        **kw,
    )


def _run(root, k, salted, **kw):
    clips = _build(root)
    ReplicatePipeline(f"{root}/clips", f"{root}/out", _cfg(k, salted, **kw),
                      f"{root}/updates").run()
    got = (
        Table(f"{root}/out/windows").to_arrow().to_pandas()
        .sort_values(["clip_id", "window_start"]).reset_index(drop=True)
    )
    return clips, got


def _member_rows(clips, root):
    """Window membership = every clip row minus the DLQ'd late ones."""
    df = clips.to_pandas()
    df["ms"] = df["event_ts"].astype("int64")
    dlq = Table(f"{root}/out/dlq").to_arrow().to_pandas()
    late = set(dlq[(dlq["source"] == "clips") & (dlq["reason"] == "late")]["seq"])
    ok = df[~df["seq"].isin(late)].copy()
    ok["window_start"] = (ok["ms"] // WIN) * WIN
    return ok


def _ref_quantiles(ok, k=None):
    rows = []
    for (cid, ws), g in ok.groupby(["clip_id", "window_start"]):
        d = g["dur_ms"].to_numpy().astype(np.int64)
        if k is not None:
            import pyarrow as pa

            h = hash64(pa.array(g["seq"].to_numpy()))
            sel = np.argsort(h, kind="stable")[:k]
            d = d[sel]
        p50, p90 = _sample_quantiles(d)
        rows.append((cid, int(ws), len(d), p50, p90))
    return (
        pd.DataFrame(rows, columns=["clip_id", "window_start", "sample_n",
                                    "p50_dur_ms", "p90_dur_ms"])
        .sort_values(["clip_id", "window_start"]).reset_index(drop=True)
    )


def test_exact_quantiles_when_k_covers_windows(tmp_path, ray_session):
    clips, got = _run(str(tmp_path / "a"), k=4096, salted=False)
    assert {"p50_dur_ms", "p90_dur_ms", "sample_n"} <= set(got.columns)
    ok = _member_rows(clips, str(tmp_path / "a"))
    ref = _ref_quantiles(ok)
    assert len(got) == len(ref)
    pd.testing.assert_frame_equal(
        got[["clip_id", "window_start", "sample_n", "p50_dur_ms", "p90_dur_ms"]],
        ref, check_dtype=False,
    )
    # the sample covered every window exactly
    assert (got["sample_n"] == got["n_clips"]).all()
    assert int(got["n_clips"].max()) > 3  # skewed fixture: real multi-row windows


def test_small_k_deterministic_and_salting_invariant(tmp_path, ray_session):
    k = 3
    cols = ["clip_id", "window_start", "n_clips", "sum_dur_ms",
            "p50_dur_ms", "p90_dur_ms", "sample_n"]
    clips, plain = _run(str(tmp_path / "p"), k=k, salted=False)
    _, salted = _run(str(tmp_path / "s"), k=k, salted=True)
    # routing independence: forced salting changes nothing
    pd.testing.assert_frame_equal(plain[cols], salted[cols])
    # the sample is a pure function of the data: k smallest hash64(seq)
    ok = _member_rows(clips, str(tmp_path / "p"))
    ref = _ref_quantiles(ok, k=k)
    pd.testing.assert_frame_equal(
        plain[["clip_id", "window_start", "sample_n", "p50_dur_ms",
               "p90_dur_ms"]],
        ref, check_dtype=False,
    )
    assert (plain["sample_n"] <= k).all()
    # counts/sums agree with a no-sampling run (schema minus the new cols)
    _, off = _run(str(tmp_path / "o"), k=0, salted=False)
    assert "p50_dur_ms" not in off.columns
    pd.testing.assert_frame_equal(
        plain[["clip_id", "window_start", "n_clips", "sum_dur_ms"]],
        off[["clip_id", "window_start", "n_clips", "sum_dur_ms"]],
    )


def test_sliding_windows_carry_samples_too(tmp_path, ray_session):
    _, got = _run(str(tmp_path / "sl"), k=4096, salted=True)
    sl = (
        Table(f"{tmp_path}/sl/out/sliding").to_arrow().to_pandas()
        .sort_values(["clip_id", "window_start"]).reset_index(drop=True)
    )
    assert {"p50_dur_ms", "p90_dur_ms", "sample_n"} <= set(sl.columns)
    assert (sl["sample_n"] == sl["n_clips"]).all()
    # each sliding window's p50 lies within the window's value range
    assert (sl["p50_dur_ms"] * sl["n_clips"] <= sl["sum_dur_ms"] * 2).all()


def test_sample_state_survives_crash_resume(tmp_path, ray_session):
    from hydra_ray.pipelines.replicate import CrashPoint

    cols = ["clip_id", "window_start", "n_clips", "sum_dur_ms",
            "p50_dur_ms", "p90_dur_ms", "sample_n"]
    clips, clean = _run(str(tmp_path / "c"), k=3, salted=True,
                        full_checkpoint_every=2)

    root = str(tmp_path / "x")
    _build(root)
    crash_cfg = _cfg(3, salted=True, full_checkpoint_every=2,
                     crash_at=(2, "after_prepare"))
    pipe = ReplicatePipeline(f"{root}/clips", f"{root}/out", crash_cfg,
                             f"{root}/updates")
    with pytest.raises(CrashPoint):
        pipe.run()
    ReplicatePipeline(f"{root}/clips", f"{root}/out",
                      _cfg(3, salted=True, full_checkpoint_every=2),
                      f"{root}/updates").run()
    got = (
        Table(f"{root}/out/windows").to_arrow().to_pandas()
        .sort_values(["clip_id", "window_start"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[cols], clean[cols])
