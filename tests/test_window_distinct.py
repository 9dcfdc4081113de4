"""window_distinct_k: streaming per-window distinct-content counts from
a KMV (k-minimum-values) sketch over the routing task's content hash —
exact below k distinct payloads, routing-(salting-)independent, a pure
function of the data at any k, and composable with window_sample_k."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from hydra_ray.pipelines.replicate import ReplicateConfig, ReplicatePipeline
from hydra_ray.state.dedup_index import content_hash_of
from hydra_ray.state.store import _kmv_estimate
from hydra_ray.synth import synth_clips_table, synth_updates_table
from hydra_ray.table import Table

N_CLIPS = 400
VERSIONS = 2
HOT_FRACTION = 0.9
WIN = 10_000


def _build(root):
    """Clip stream where EVERY payload appears twice in the same
    (clip, window) cell: each base row gets a same-timestamp twin under
    a fresh seq, interleaved per version so twins share their epoch
    (and thus their late/not-late fate)."""
    base = synth_clips_table(N_CLIPS, hot_fraction=HOT_FRACTION)
    dup = base.set_column(
        base.schema.get_field_index("seq"), "seq",
        pa.array(np.arange(N_CLIPS, 2 * N_CLIPS), pa.int64()),
    )
    ct = Table.create(f"{root}/clips", schema=base.schema)
    step = N_CLIPS // VERSIONS
    for v in range(VERSIONS):
        ct.append(pa.concat_tables(
            [base.slice(v * step, step), dup.slice(v * step, step)]))
    upd = synth_updates_table(N_CLIPS)
    ut = Table.create(f"{root}/updates", schema=upd.schema)
    ustep = -(-upd.num_rows // VERSIONS)
    for v in range(VERSIONS):
        ut.append(upd.slice(v * ustep, min(ustep, upd.num_rows - v * ustep)))
    return pa.concat_tables([base, dup])


def _cfg(dk, salted, sample_k=0, **kw):
    return ReplicateConfig(
        num_partitions=4,
        join_window_ms=60_000,
        allowed_lateness_ms=30_000,
        window_size_ms=WIN,
        session_gap_ms=0,
        sliding_size_ms=20_000,
        sliding_slide_ms=10_000,
        actor_num_cpus=0.25,
        window_distinct_k=dk,
        window_sample_k=sample_k,
        hot_key_threshold=0.01 if salted else 0.0,
        n_salts=4,
        **kw,
    )


def _run(root, dk, salted, **kw):
    clips = _build(root)
    ReplicatePipeline(f"{root}/clips", f"{root}/out", _cfg(dk, salted, **kw),
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


def _ref_distinct(ok, dk):
    rows = []
    for (cid, ws), g in ok.groupby(["clip_id", "window_start"]):
        h = np.unique(g["content_h"].to_numpy().astype(np.uint64))
        rows.append((cid, int(ws), _kmv_estimate(h[:dk], dk, n_cap=len(g))))
    return (
        pd.DataFrame(rows, columns=["clip_id", "window_start",
                                    "distinct_content"])
        .sort_values(["clip_id", "window_start"]).reset_index(drop=True)
    )


def test_exact_distinct_and_compose_with_sample(tmp_path, ray_session):
    """dk large ⇒ exact per-cell distinct counts; with window_sample_k
    also on, both sketch column sets coexist (5-entry cells)."""
    clips, got = _run(str(tmp_path / "a"), dk=4096, salted=False,
                      sample_k=4096)
    assert {"distinct_content", "p50_dur_ms", "sample_n"} <= set(got.columns)
    ok = _member_rows(clips, str(tmp_path / "a"))
    ref = _ref_distinct(ok, dk=4096)
    assert len(got) == len(ref)
    pd.testing.assert_frame_equal(
        got[["clip_id", "window_start", "distinct_content"]], ref,
        check_dtype=False,
    )
    # the twin fixture is real: duplicates collapse (distinct < rows)
    assert (got["distinct_content"] < got["n_clips"]).any()
    assert (got["distinct_content"] <= got["n_clips"]).all()
    # exactly-two-copies fixture: every cell counts ceil(n/2) contents
    # unless a twin was split from its original by lateness
    half = -(-got["n_clips"] // 2)
    assert (got["distinct_content"] >= half).all()
    # sample sketch unaffected by the distinct sketch riding along
    assert (got["sample_n"] == got["n_clips"]).all()


def test_small_k_pure_function_and_salting_invariant(tmp_path, ray_session):
    dk = 4
    cols = ["clip_id", "window_start", "n_clips", "sum_dur_ms",
            "distinct_content"]
    clips, plain = _run(str(tmp_path / "p"), dk=dk, salted=False)
    _, salted = _run(str(tmp_path / "s"), dk=dk, salted=True)
    pd.testing.assert_frame_equal(plain[cols], salted[cols])
    ok = _member_rows(clips, str(tmp_path / "p"))
    ref = _ref_distinct(ok, dk=dk)
    pd.testing.assert_frame_equal(
        plain[["clip_id", "window_start", "distinct_content"]], ref,
        check_dtype=False,
    )
    # counts/sums agree with a flag-off run; the column only exists on
    _, off = _run(str(tmp_path / "o"), dk=0, salted=False)
    assert "distinct_content" not in off.columns
    pd.testing.assert_frame_equal(
        plain[["clip_id", "window_start", "n_clips", "sum_dur_ms"]],
        off[["clip_id", "window_start", "n_clips", "sum_dur_ms"]],
    )
    # sliding windows carry the sketch too
    sl = Table(f"{tmp_path}/p/out/sliding").to_arrow().to_pandas()
    assert "distinct_content" in sl.columns
    assert (sl["distinct_content"] <= sl["n_clips"]).all()


def test_distinct_state_survives_crash_resume(tmp_path, ray_session):
    from hydra_ray.pipelines.replicate import CrashPoint

    cols = ["clip_id", "window_start", "n_clips", "sum_dur_ms",
            "distinct_content"]
    _, clean = _run(str(tmp_path / "c"), dk=3, salted=True,
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
