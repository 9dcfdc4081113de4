"""window_mode_k: streaming per-window most-frequent-content (mode) from
a bottom-k-by-content-hash COUNT sample — counts are exact additive
partials, hash membership follows the KMV rule, so the sample is an
order-independent monoid: routing-(salting-)independent, delta-
checkpoint- and rescale-safe, and composable with the other window
sketches.  Exact mode whenever a cell's distinct content ≤ k."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from hydra_ray.pipelines.replicate import ReplicateConfig, ReplicatePipeline
from hydra_ray.state.dedup_index import content_hash_of
from hydra_ray.synth import synth_clips_table, synth_updates_table
from hydra_ray.table import Table

N_CLIPS = 300
VERSIONS = 2
HOT_FRACTION = 0.9
WIN = 10_000


def _build(root):
    """Clip stream with CONTROLLED content multiplicities: every base
    payload appears twice (a same-timestamp twin under a fresh seq) and
    every third base row appears a THIRD time — so cells have a clear
    per-content count structure.  Copies are interleaved per version so
    they share their epoch (and thus their late/not-late fate)."""
    base = synth_clips_table(N_CLIPS, hot_fraction=HOT_FRACTION)
    dup = base.set_column(
        base.schema.get_field_index("seq"), "seq",
        pa.array(np.arange(N_CLIPS, 2 * N_CLIPS), pa.int64()),
    )
    tri_rows = np.flatnonzero(np.arange(N_CLIPS) % 3 == 0)
    tri = base.take(pa.array(tri_rows)).set_column(
        base.schema.get_field_index("seq"), "seq",
        pa.array(np.arange(2 * N_CLIPS, 2 * N_CLIPS + len(tri_rows)),
                 pa.int64()),
    )
    ct = Table.create(f"{root}/clips", schema=base.schema)
    step = N_CLIPS // VERSIONS
    for v in range(VERSIONS):
        lo, hi = v * step, (v + 1) * step
        tsel = np.flatnonzero((tri_rows >= lo) & (tri_rows < hi))
        ct.append(pa.concat_tables(
            [base.slice(lo, step), dup.slice(lo, step),
             tri.take(pa.array(tsel))]))
    upd = synth_updates_table(N_CLIPS)
    ut = Table.create(f"{root}/updates", schema=upd.schema)
    ustep = -(-upd.num_rows // VERSIONS)
    for v in range(VERSIONS):
        ut.append(upd.slice(v * ustep, min(ustep, upd.num_rows - v * ustep)))
    return pa.concat_tables([base, dup, tri])


def _cfg(mk, salted, **kw):
    return ReplicateConfig(
        num_partitions=4,
        join_window_ms=60_000,
        allowed_lateness_ms=30_000,
        window_size_ms=WIN,
        session_gap_ms=0,
        sliding_size_ms=20_000,
        sliding_slide_ms=10_000,
        actor_num_cpus=0.25,
        window_mode_k=mk,
        hot_key_threshold=0.01 if salted else 0.0,
        n_salts=4,
        **kw,
    )


def _run(root, mk, salted, **kw):
    clips = _build(root)
    ReplicatePipeline(f"{root}/clips", f"{root}/out", _cfg(mk, salted, **kw),
                      f"{root}/updates").run()
    got = (
        Table(f"{root}/out/windows").to_arrow().to_pandas()
        .sort_values(["clip_id", "window_start"]).reset_index(drop=True)
    )
    return clips, got


def _member_rows(clips, root):
    df = clips.to_pandas()
    df["ms"] = df["event_ts"].astype("int64")
    df["content_h"] = content_hash_of(clips, ("bytes",)).astype(np.uint64)
    dlq = Table(f"{root}/out/dlq").to_arrow().to_pandas()
    late = (
        set(dlq[(dlq["source"] == "clips") & (dlq["reason"] == "late")]["seq"])
        if "source" in dlq.columns else set()   # 0-row table loses names
    )
    ok = df[~df["seq"].isin(late)].copy()
    ok["window_start"] = (ok["ms"] // WIN) * WIN
    return ok


def _ref_mode(ok, mk):
    """Pandas reference: per cell, counts of the mk smallest distinct
    content hashes; mode = max count, ties → smallest hash."""
    rows = []
    for (cid, ws), g in ok.groupby(["clip_id", "window_start"]):
        h, c = np.unique(g["content_h"].to_numpy().astype(np.uint64),
                         return_counts=True)
        h, c = h[:mk], c[:mk]
        j = int(np.argmax(c)) if len(h) else 0
        rows.append((cid, int(ws),
                     int(h[j]) if len(h) else 0,
                     int(c[j]) if len(h) else 0))
    return (
        pd.DataFrame(rows, columns=["clip_id", "window_start",
                                    "mode_h", "mode_n"])
        .sort_values(["clip_id", "window_start"]).reset_index(drop=True)
    )


def test_exact_mode_and_compose_with_other_sketches(tmp_path, ray_session):
    """mk large ⇒ exact per-cell mode; with sample + distinct sketches
    also on, all three column sets coexist (8-entry cells)."""
    clips, got = _run(str(tmp_path / "a"), mk=4096, salted=False,
                      window_sample_k=4096, window_distinct_k=4096)
    assert {"mode_h", "mode_n", "distinct_content", "p50_dur_ms"} <= set(
        got.columns)
    ok = _member_rows(clips, str(tmp_path / "a"))
    ref = _ref_mode(ok, mk=4096)
    assert len(got) == len(ref)
    pd.testing.assert_frame_equal(
        got[["clip_id", "window_start", "mode_h", "mode_n"]], ref,
        check_dtype=False,
    )
    # the triple fixture is real: some cells have a 3-copy mode
    assert (got["mode_n"] >= 3).any()
    assert (got["mode_n"] >= 1).all()
    assert (got["mode_n"] <= got["n_clips"]).all()
    # riding sketches unaffected
    assert (got["distinct_content"] <= got["n_clips"]).all()


def test_small_k_pure_function_and_salting_invariant(tmp_path, ray_session):
    mk = 4
    cols = ["clip_id", "window_start", "n_clips", "sum_dur_ms",
            "mode_h", "mode_n"]
    clips, plain = _run(str(tmp_path / "p"), mk=mk, salted=False)
    _, salted = _run(str(tmp_path / "s"), mk=mk, salted=True)
    pd.testing.assert_frame_equal(plain[cols], salted[cols])
    ok = _member_rows(clips, str(tmp_path / "p"))
    ref = _ref_mode(ok, mk=mk)
    pd.testing.assert_frame_equal(
        plain[["clip_id", "window_start", "mode_h", "mode_n"]], ref,
        check_dtype=False,
    )
    # counts/sums agree with a flag-off run; the columns only exist on
    _, off = _run(str(tmp_path / "o"), mk=0, salted=False)
    assert "mode_h" not in off.columns
    pd.testing.assert_frame_equal(
        plain[["clip_id", "window_start", "n_clips", "sum_dur_ms"]],
        off[["clip_id", "window_start", "n_clips", "sum_dur_ms"]],
    )
    # sliding windows carry the mode too
    sl = Table(f"{tmp_path}/p/out/sliding").to_arrow().to_pandas()
    assert "mode_h" in sl.columns
    assert (sl["mode_n"] <= sl["n_clips"]).all()


def test_mode_state_survives_crash_resume(tmp_path, ray_session):
    from hydra_ray.pipelines.replicate import CrashPoint

    cols = ["clip_id", "window_start", "n_clips", "sum_dur_ms",
            "mode_h", "mode_n"]
    _, clean = _run(str(tmp_path / "c"), mk=3, salted=True,
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
        Table(f"{root}/out/windows").to_arrow().to_pandas()
        .sort_values(["clip_id", "window_start"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[cols], clean[cols])
