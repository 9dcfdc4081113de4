"""session_sample_k: streaming per-SESSION duration quantiles from the
deterministic bottom-k-by-hash(seq) sample, unioned through every
gap-merge (batch pre-merge, cross-salt driver merge, home adoption,
crash/resume) — exact when k covers the session, routing-independent."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from hydra_ray.hashing import hash64
from hydra_ray.pipelines.replicate import ReplicateConfig, ReplicatePipeline
from hydra_ray.state.store import _sample_quantiles
from hydra_ray.synth import synth_clips_table, synth_updates_table
from hydra_ray.table import Table

N_CLIPS = 600
VERSIONS = 3
HOT_FRACTION = 0.9           # 90% of rows on few keys: long, dense sessions
GAP = 5_000


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
        window_size_ms=10_000,
        session_gap_ms=GAP,
        actor_num_cpus=0.25,
        session_sample_k=k,
        hot_key_threshold=0.01 if salted else 0.0,
        n_salts=4,
        **kw,
    )


def _run(root, k, salted, **kw):
    clips = _build(root)
    ReplicatePipeline(f"{root}/clips", f"{root}/out", _cfg(k, salted, **kw),
                      f"{root}/updates").run()
    got = (
        Table(f"{root}/out/sessions").to_arrow().to_pandas()
        .sort_values(["clip_id", "session_start"]).reset_index(drop=True)
    )
    return clips, got


def _member_rows(clips, root):
    df = clips.to_pandas()
    df["ms"] = df["event_ts"].astype("int64")
    dlq = Table(f"{root}/out/dlq").to_arrow().to_pandas()
    late = (
        set(dlq[(dlq["source"] == "clips") & (dlq["reason"] == "late")]["seq"])
        if "source" in dlq.columns else set()
    )
    return df[~df["seq"].isin(late)].copy()


def _ref_sessions(ok, k):
    """Pandas reference: gap-sessionize member rows per key; per session
    the bottom-k-by-hash(seq) duration sample's nearest-rank p50/p90."""
    rows = []
    for cid, g in ok.groupby("clip_id"):
        g = g.sort_values(["ms", "seq"])
        ms = g["ms"].to_numpy()
        brk = np.ones(len(ms), dtype=bool)
        brk[1:] = (ms[1:] - ms[:-1]) > GAP
        sid = np.cumsum(brk) - 1
        for s in np.unique(sid):
            sub = g[sid == s]
            d = sub["dur_ms"].to_numpy().astype(np.int64)
            h = hash64(pa.array(sub["seq"].to_numpy()))
            sel = np.argsort(h, kind="stable")[:k]
            p50, p90 = _sample_quantiles(d[sel])
            rows.append((cid, int(ms[sid == s].min()),
                         int(ms[sid == s].max()), len(sub),
                         int(d.sum()), len(sel), p50, p90))
    return (
        pd.DataFrame(rows, columns=["clip_id", "session_start",
                                    "session_end", "n_clips", "sum_dur_ms",
                                    "sample_n", "p50_dur_ms", "p90_dur_ms"])
        .sort_values(["clip_id", "session_start"]).reset_index(drop=True)
    )


COLS = ["clip_id", "session_start", "session_end", "n_clips",
        "sum_dur_ms", "sample_n", "p50_dur_ms", "p90_dur_ms"]


def test_exact_session_quantiles_when_k_covers(tmp_path, ray_session):
    clips, got = _run(str(tmp_path / "a"), k=4096, salted=False)
    assert {"p50_dur_ms", "p90_dur_ms", "sample_n"} <= set(got.columns)
    ok = _member_rows(clips, str(tmp_path / "a"))
    ref = _ref_sessions(ok, k=4096)
    assert len(got) == len(ref)
    pd.testing.assert_frame_equal(got[COLS], ref, check_dtype=False)
    assert (got["sample_n"] == got["n_clips"]).all()
    assert int(got["n_clips"].max()) > 3   # skewed fixture: dense sessions


def test_small_k_salting_invariant_and_flag_off(tmp_path, ray_session):
    k = 3
    clips, plain = _run(str(tmp_path / "p"), k=k, salted=False)
    _, salted = _run(str(tmp_path / "s"), k=k, salted=True)
    pd.testing.assert_frame_equal(plain[COLS], salted[COLS])
    ok = _member_rows(clips, str(tmp_path / "p"))
    ref = _ref_sessions(ok, k=k)
    pd.testing.assert_frame_equal(plain[COLS], ref, check_dtype=False)
    _, off = _run(str(tmp_path / "o"), k=0, salted=False)
    assert "p50_dur_ms" not in off.columns
    pd.testing.assert_frame_equal(
        plain[["clip_id", "session_start", "session_end", "n_clips"]],
        off[["clip_id", "session_start", "session_end", "n_clips"]],
    )


def test_session_sample_survives_crash_resume(tmp_path, ray_session):
    from hydra_ray.pipelines.replicate import CrashPoint

    _, clean = _run(str(tmp_path / "c"), k=3, salted=True,
                    full_checkpoint_every=2)
    root = str(tmp_path / "x")
    _build(root)
    crash_cfg = _cfg(3, salted=True, full_checkpoint_every=2,
                     crash_at=(1, "after_prepare"))
    pipe = ReplicatePipeline(f"{root}/clips", f"{root}/out", crash_cfg,
                             f"{root}/updates")
    with pytest.raises(CrashPoint):
        pipe.run()
    ReplicatePipeline(f"{root}/clips", f"{root}/out",
                      _cfg(3, salted=True, full_checkpoint_every=2),
                      f"{root}/updates").run()
    got = (
        Table(f"{root}/out/sessions").to_arrow().to_pandas()
        .sort_values(["clip_id", "session_start"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[COLS], clean[COLS])
