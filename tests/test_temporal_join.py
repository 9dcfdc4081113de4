"""Streaming TEMPORAL (as-of) join: every emitted clip additionally
carries the transcript version that was VALID AT the clip's own event
time — the latest non-late update with u.ts ≤ c.ts (ties by revision),
Flink's temporal-table join against the versioned view — vs the
forward-looking [c.ts, c.ts + W) enrich that `transcript` reports.

Oracle: the lineage-driven pandas replay from tests/test_replicate.py
(_oracle gives the emission schedule), plus the backward probe here.
The crash/resume case pins that the relaxed eviction rule (keep the
latest below-horizon version per key) stays a monotone watermark
predicate, so full+delta checkpoint replay is byte-identical.
"""

import pandas as pd
import pytest

import test_replicate as tr
from hydra_ray.pipelines.replicate import (
    CrashPoint,
    ReplicatePipeline,
    read_lineage,
)
from hydra_ray.synth import synth_clips_table, synth_updates_table
from hydra_ray.table import Table

# reuse test_replicate's N_CLIPS/VERSIONS so tr._oracle's version/step
# bookkeeping applies to these sources unchanged
N_CLIPS = tr.N_CLIPS
VERSIONS = tr.VERSIONS


def _build(root):
    clips = synth_clips_table(N_CLIPS)
    ct = Table.create(f"{root}/clips", schema=clips.schema)
    step = N_CLIPS // VERSIONS
    for v in range(VERSIONS):
        ct.append(clips.slice(v * step, step))
    # EARLY-heavy update stream: as-of matches need updates at or before
    # the clip's event ts; the default synth is mostly forward-lagged
    upd = synth_updates_table(N_CLIPS, early_fraction=0.45)
    ut = Table.create(f"{root}/updates", schema=upd.schema)
    ustep = -(-upd.num_rows // VERSIONS)
    for v in range(VERSIONS):
        ut.append(upd.slice(v * ustep, min(ustep, upd.num_rows - v * ustep)))
    return clips, upd


def _cfg(**kw):
    return tr.cfg(temporal_join=True, **kw)


def _asof_ref(udf: pd.DataFrame, ok: pd.DataFrame) -> pd.DataFrame:
    """Backward probe over the replay: per emitted clip, the max-(ts,
    rev) non-late update with u.ts ≤ c.ts visible by the emit epoch."""
    by_key: dict = {}
    for r in udf[~udf["late"]].itertuples():
        by_key.setdefault(r.clip_id, []).append(
            (r.ms, r.revision, r.transcript, r.epoch))
    txt, rev = [], []
    for r in ok.itertuples():
        best = None
        for u in by_key.get(r.clip_id, ()):
            if u[0] <= r.ms and u[3] <= r.emit_epoch and (
                    best is None or (u[0], u[1]) > (best[0], best[1])):
                best = u
        if best is None:
            txt.append(None)
            rev.append(None)
        else:  # tombstone version valid at c.ts → null text, real rev
            txt.append(best[2] if isinstance(best[2], str) else None)
            rev.append(best[1])
    return ok.assign(asof_transcript=txt, asof_rev=rev)


@pytest.fixture(scope="module")
def temporal_run(tmp_path_factory, ray_session):
    root = str(tmp_path_factory.mktemp("temporal"))
    clips, upd = _build(root)
    pipe = ReplicatePipeline(
        f"{root}/clips", f"{root}/out", _cfg(), f"{root}/updates")
    metrics = pipe.run()
    return root, clips, upd, metrics


def test_temporal_asof_oracle(temporal_run):
    root, clips, upd, _ = temporal_run
    lineage = read_lineage(f"{root}/out")
    _, udf, ok = tr._oracle(clips, upd, lineage)
    ref = _asof_ref(udf, ok)[["seq", "asof_transcript", "asof_rev"]]
    ref = ref.sort_values("seq").reset_index(drop=True)

    repl = (
        Table(f"{root}/out/replicated")
        .to_arrow()
        .select(["seq", "asof_transcript", "asof_rev"])
        .to_pandas()
        .sort_values("seq")
        .reset_index(drop=True)
    )
    assert repl["seq"].tolist() == ref["seq"].tolist()
    bad = repl["asof_transcript"].fillna("∅") != ref["asof_transcript"].fillna("∅")
    assert bad.sum() == 0, repl[bad].head().to_dict()
    assert (
        repl["asof_rev"].fillna(-1).astype("int64")
        == ref["asof_rev"].fillna(-1).astype("int64")
    ).all()
    # fixture must exercise real matches AND version-less clips AND
    # multi-version keys (a max-(ts, rev) pick that matters)
    assert ref["asof_rev"].notna().sum() > 20
    assert ref["asof_rev"].isna().sum() > 20
    assert (ref["asof_rev"].dropna() > 1).any()


def test_forward_join_unchanged(temporal_run):
    """temporal_join must not perturb the forward [c.ts, c.ts+W) enrich."""
    root, clips, upd, _ = temporal_run
    lineage = read_lineage(f"{root}/out")
    _, _, ok = tr._oracle(clips, upd, lineage)
    repl = (
        Table(f"{root}/out/replicated")
        .to_arrow()
        .select(["seq", "transcript", "deleted"])
        .to_pandas()
        .sort_values("seq")
        .reset_index(drop=True)
    )
    ref = ok[["seq", "final_transcript", "deleted"]].sort_values(
        "seq").reset_index(drop=True)
    assert (repl["transcript"].fillna("∅")
            == ref["final_transcript"].fillna("∅")).all()
    assert (repl["deleted"] == ref["deleted"]).all()


def test_temporal_crash_resume_identical(tmp_path, ray_session, temporal_run):
    """Kill between prepare and commit, resume fresh: replicated output
    (incl. the as-of columns) byte-identical to the clean run — the
    temporal keep-latest eviction must replay exactly from full+delta
    checkpoints pruned at the final watermark."""
    clean_root = temporal_run[0]

    def sig(out_root):
        df = (
            Table(f"{out_root}/replicated")
            .to_arrow()
            .select(["seq", "clip_id", "transcript", "deleted",
                     "asof_transcript", "asof_rev"])
            .to_pandas()
            .sort_values("seq")
            .reset_index(drop=True)
        )
        return len(df), pd.util.hash_pandas_object(df).sum()

    root = str(tmp_path)
    _build(root)
    crash_cfg = _cfg(crash_at=(2, "before_main_commit"))
    pipe = ReplicatePipeline(
        f"{root}/clips", f"{root}/out", crash_cfg, f"{root}/updates")
    with pytest.raises(CrashPoint):
        pipe.run()
    pipe2 = ReplicatePipeline(
        f"{root}/clips", f"{root}/out", _cfg(), f"{root}/updates")
    pipe2.run()
    assert sig(f"{root}/out") == sig(f"{clean_root}/out")
