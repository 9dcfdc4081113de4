"""Streaming replication pipeline: join/window oracles + exactly-once.

FIXTURES.md F4: the pandas oracle recomputes emission/join/window results
from the committed per-epoch lineage (wm_prev / wm_close per epoch), and
the exactly-once oracle compares a clean run against crash+resume runs.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from hydra_ray.pipelines.replicate import (
    CrashPoint,
    ReplicateConfig,
    ReplicatePipeline,
    read_lineage,
)
from hydra_ray.stages.windows import sessionize_sorted
from hydra_ray.synth import synth_clips_table, synth_updates_table
from hydra_ray.table import Table

N_CLIPS = 800
VERSIONS = 4
W = 60_000
LATENESS = 30_000


def build_sources(root):
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


def cfg(**kw):
    return ReplicateConfig(
        num_partitions=4,
        join_window_ms=W,
        allowed_lateness_ms=LATENESS,
        window_size_ms=10_000,
        session_gap_ms=5_000,
        sliding_size_ms=20_000,
        sliding_slide_ms=10_000,
        actor_num_cpus=0.25,
        **kw,
    )


@pytest.fixture(scope="module")
def clean_run(tmp_path_factory, ray_session):
    root = str(tmp_path_factory.mktemp("repl"))
    clips, upd = build_sources(root)
    pipe = ReplicatePipeline(f"{root}/clips", f"{root}/out", cfg(), f"{root}/updates")
    metrics = pipe.run()
    return root, clips, upd, pipe, metrics


def _epoch_of(lineage, source, version):
    """Which epoch ingested `version` of `source` (versions are 1-based)."""
    for ent in lineage:
        lo, hi = ent[source]
        if lo < version <= hi:
            return ent["epoch"]
    return None


def _oracle(clips: pa.Table, upd: pa.Table, lineage):
    """Pandas recomputation of the full replication semantics."""
    cdf = clips.to_pandas()
    cdf["ms"] = cdf["event_ts"].astype("int64")
    step = N_CLIPS // VERSIONS
    cdf["version"] = cdf.index // step + 1
    cdf["epoch"] = cdf["version"].map(lambda v: _epoch_of(lineage, "clips", v))
    wm_prev = {e["epoch"]: e["wm_prev"] for e in lineage}
    wm_close = {e["epoch"]: e["wm_close"] for e in lineage}
    cdf["late"] = cdf["ms"] < cdf["epoch"].map(wm_prev)

    udf = upd.to_pandas()
    udf["ms"] = udf["event_ts"].astype("int64")
    ustep = -(-len(udf) // VERSIONS)
    udf["version"] = udf.index // ustep + 1
    udf["epoch"] = udf["version"].map(lambda v: _epoch_of(lineage, "updates", v))
    udf["late"] = udf["ms"] < udf["epoch"].map(wm_prev)

    epochs = sorted(wm_close.keys())

    def emit_epoch(row):
        for e in epochs:
            if e >= row["epoch"] and wm_close[e] > row["ms"] + W:
                return e
        return epochs[-1]  # flush epoch

    ok = cdf[~cdf["late"]].copy()
    ok["emit_epoch"] = ok.apply(emit_epoch, axis=1)

    live_upd = udf[~udf["late"]]
    upd_by_key: dict = {}
    for r in live_upd.itertuples():
        upd_by_key.setdefault(r.clip_id, []).append((r.ms, r.revision, r.transcript, r.epoch))

    final_txt, deleted = [], []
    for r in ok.itertuples():
        best = None
        for u in upd_by_key.get(r.clip_id, ()):
            # half-open join bound [c.ts, c.ts + W) — matches the batch
            # interval_join convention
            if r.ms <= u[0] < r.ms + W and u[3] <= r.emit_epoch:
                if best is None or (u[0], u[1]) > (best[0], best[1]):
                    best = u
        if best is None:
            final_txt.append(r.transcript)
            deleted.append(False)
        else:
            final_txt.append(best[2] if isinstance(best[2], str) else None)
            deleted.append(not isinstance(best[2], str))
    ok["final_transcript"] = final_txt
    ok["deleted"] = deleted
    return cdf, udf, ok


def test_counts_add_up(clean_run):
    root, clips, upd, pipe, metrics = clean_run
    repl = Table(f"{root}/out/replicated").to_arrow()
    dlq = Table(f"{root}/out/dlq").to_arrow()
    n_late_clips = metrics.get("clips_late", 0)
    assert repl.num_rows + n_late_clips == N_CLIPS
    dlq_df = dlq.to_pandas()
    assert (dlq_df[dlq_df["source"] == "clips"]["reason"] == "late").sum() == n_late_clips
    assert metrics.get("updates_late", 0) > 0  # engineered late updates exist
    # replicated rows are unique by seq (each clip exactly once)
    assert repl.column("seq").to_pandas().is_unique
    # payload fragments cover exactly the emitted rows; join is 1:1
    from hydra_ray.pipelines.replicate import read_replicated
    from hydra_ray.table import Table as LTable

    payload = LTable(f"{root}/out/payload").to_arrow()
    assert payload.num_rows == repl.num_rows
    joined = read_replicated(f"{root}/out")
    assert joined.num_rows == repl.num_rows
    assert joined.column("n_samples").null_count == 0


def test_join_oracle(clean_run):
    root, clips, upd, pipe, metrics = clean_run
    lineage = read_lineage(f"{root}/out")
    cdf, udf, ok = _oracle(clips, upd, lineage)

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
    assert len(repl) == len(ref), (len(repl), len(ref))
    assert repl["seq"].tolist() == ref["seq"].tolist()
    mismatch = repl["transcript"].fillna("∅") != ref["final_transcript"].fillna("∅")
    assert mismatch.sum() == 0, repl[mismatch].head().to_dict()
    assert (repl["deleted"] == ref["deleted"]).all()
    assert repl["epoch"].tolist() == ref["emit_epoch"].tolist()


def test_window_oracle(clean_run):
    root, clips, upd, pipe, metrics = clean_run
    lineage = read_lineage(f"{root}/out")
    cdf, _, _ = _oracle(clips, upd, lineage)
    ok = cdf[~cdf["late"]]
    ref = (
        ok.assign(window_start=(ok["ms"] // 10_000) * 10_000)
        .groupby(["clip_id", "window_start"])
        .agg(n_clips=("seq", "size"), sum_dur_ms=("dur_ms", "sum"))
        .reset_index()
    )
    got = (
        Table(f"{root}/out/windows")
        .to_arrow()
        .to_pandas()
        .sort_values(["clip_id", "window_start"])
        .reset_index(drop=True)
    )
    ref = ref.sort_values(["clip_id", "window_start"]).reset_index(drop=True)
    assert len(got) == len(ref)
    pd.testing.assert_frame_equal(
        got[["clip_id", "window_start", "n_clips", "sum_dur_ms"]],
        ref.astype({"sum_dur_ms": "int64"}),
        check_dtype=False,
    )


def test_sliding_oracle(clean_run):
    root, clips, upd, pipe, metrics = clean_run
    lineage = read_lineage(f"{root}/out")
    cdf, _, _ = _oracle(clips, upd, lineage)
    ok = cdf[~cdf["late"]]
    size, slide = 20_000, 10_000
    parts = []
    for j in range(size // slide):
        p = ok.copy()
        p["window_start"] = (p["ms"] // slide) * slide - j * slide
        parts.append(p)
    ref = (
        pd.concat(parts)
        .groupby(["clip_id", "window_start"])
        .agg(n_clips=("seq", "size"), sum_dur_ms=("dur_ms", "sum"))
        .reset_index()
        .sort_values(["clip_id", "window_start"])
        .reset_index(drop=True)
    )
    got = (
        Table(f"{root}/out/sliding")
        .to_arrow()
        .to_pandas()
        .sort_values(["clip_id", "window_start"])
        .reset_index(drop=True)
    )
    assert len(got) == len(ref)
    pd.testing.assert_frame_equal(
        got[["clip_id", "window_start", "n_clips", "sum_dur_ms"]],
        ref.astype({"sum_dur_ms": "int64"}),
        check_dtype=False,
    )


def test_compacted_view_oracle(clean_run):
    """The materialized latest-transcript view (T2 compacted topic):
    last-write-wins by (ts, revision), including tombstones as nulls."""
    root, clips, upd, pipe, metrics = clean_run
    lineage = read_lineage(f"{root}/out")
    _, udf, _ = _oracle(clips, upd, lineage)
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
    assert len(got) == len(ref)
    assert got["clip_id"].tolist() == ref["clip_id"].tolist()
    assert (
        got["transcript"].fillna("∅").tolist()
        == ref["transcript"].fillna("∅").tolist()
    )
    assert got["revision"].tolist() == ref["revision"].tolist()


def test_session_oracle(clean_run):
    root, clips, upd, pipe, metrics = clean_run
    lineage = read_lineage(f"{root}/out")
    cdf, _, _ = _oracle(clips, upd, lineage)
    ok = cdf[~cdf["late"]]
    rows = []
    for cid, g in ok.groupby("clip_id"):
        ms = np.sort(g["ms"].to_numpy())
        sid = sessionize_sorted(ms, 5_000)
        g = g.sort_values("ms")
        for s in np.unique(sid):
            sel = g[sid == s]
            rows.append(
                (cid, int(sel["ms"].iloc[0]), int(sel["ms"].iloc[-1]), len(sel), int(sel["dur_ms"].sum()))
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
    assert len(got) == len(ref)
    pd.testing.assert_frame_equal(got[ref.columns.tolist()], ref, check_dtype=False)


def _content_signature(out_root):
    repl = Table(f"{out_root}/replicated").to_arrow()
    df = repl.select(["seq", "clip_id", "transcript", "deleted"]).to_pandas()
    df = df.sort_values("seq").reset_index(drop=True)
    win = Table(f"{out_root}/windows").to_arrow().to_pandas()
    win = win.sort_values(["clip_id", "window_start"]).reset_index(drop=True)
    return (
        repl.num_rows,
        pd.util.hash_pandas_object(df).sum(),
        len(win),
        pd.util.hash_pandas_object(win[["clip_id", "window_start", "n_clips"]]).sum(),
    )


def test_epoch_stash_isolation(tmp_path, ray_session):
    """Pipelined ingests for epoch e+1 must NOT enter close(e) state or
    its checkpoint (they replay from source after a crash)."""
    import ray

    from hydra_ray.pipelines.replicate import _StateCfg
    from hydra_ray.state.store import PartitionStateActor

    sinks = {}
    for s in ("replicated", "windows", "sliding", "sessions", "dlq", "views"):
        sinks[s] = Table.create(str(tmp_path / s)).root
    actor = PartitionStateActor().options(num_cpus=0).remote(
        0, _StateCfg(cfg()), sinks, str(tmp_path / "ck")
    )
    light = synth_clips_table(6, hot_fraction=0.0).drop_columns(["bytes"])
    wm = -(1 << 62)
    ray.get(actor.ingest.remote("clips", light.slice(0, 3), wm, 1))
    ray.get(actor.ingest.remote("clips", light.slice(3, 3), wm, 2))  # pipelined
    r1 = ray.get(actor.close_epoch.remote(1, wm))
    assert r1["metrics"]["clips_in"] == 3  # epoch-2 stash untouched
    ray.get(actor.checkpoint.remote(1))
    # crash: restore drops the stash; replayed ingest must not double-count
    ray.get(actor.restore.remote(1))
    ray.get(actor.ingest.remote("clips", light.slice(3, 3), wm, 2))
    r2 = ray.get(actor.close_epoch.remote(2, wm))
    assert r2["metrics"]["clips_in"] == 6
    ray.kill(actor)


def test_stale_prelaunch_nonce_dropped(tmp_path, ray_session):
    """A discarded pre-launched ingest (driver re-launched the epoch with a
    wider slice) must NOT double-apply: close only applies the stash whose
    nonce the driver recorded as authoritative."""
    import ray

    from hydra_ray.pipelines.replicate import _StateCfg
    from hydra_ray.state.store import PartitionStateActor

    sinks = {}
    for s in ("replicated", "windows", "sliding", "sessions", "dlq", "views"):
        sinks[s] = Table.create(str(tmp_path / s)).root
    actor = PartitionStateActor().options(num_cpus=0).remote(
        0, _StateCfg(cfg()), sinks, str(tmp_path / "ck")
    )
    light = synth_clips_table(6, hot_fraction=0.0).drop_columns(["bytes"])
    wm = -(1 << 62)
    # stale pre-launch stashed rows 0-2 under nonce 1, then the driver
    # re-launched the same epoch (wider slice: rows 0-5) under nonce 2
    ray.get(actor.ingest.remote("clips", light.slice(0, 3), wm, 1, 1))
    ray.get(actor.ingest.remote("clips", light.slice(0, 6), wm, 1, 2))
    r = ray.get(actor.close_epoch.remote(1, wm, {1: 2}))
    assert r["metrics"]["clips_in"] == 6  # not 9
    ray.kill(actor)


def test_read_replicated_inflight(tmp_path, ray_session):
    """Reading the output mid-run (finalize rows without their payload
    flush) yields null-padded heavy columns, not an error."""
    from hydra_ray.pipelines.replicate import read_replicated

    root = str(tmp_path)
    build_sources(root)
    # short horizon so rows emit before the flush epoch
    c = ReplicateConfig(
        num_partitions=4, join_window_ms=5_000, allowed_lateness_ms=2_000,
        window_size_ms=10_000, actor_num_cpus=0.25,
    )
    pipe = ReplicatePipeline(f"{root}/clips", f"{root}/out", c, f"{root}/updates")
    pipe.run(max_epochs=3)  # mid-run: some epochs closed, no final flush
    repl = Table(f"{root}/out/replicated").to_arrow()
    assert repl.num_rows > 0
    joined = read_replicated(f"{root}/out")
    assert joined.num_rows == repl.num_rows
    # finish the run: every visible row now has its payload
    pipe2 = ReplicatePipeline(f"{root}/clips", f"{root}/out", c, f"{root}/updates")
    pipe2.run()
    joined2 = read_replicated(f"{root}/out")
    assert joined2.column("n_samples").null_count == 0


def test_ingest_modes_identical(tmp_path, ray_session, clean_run):
    """Raw-task ingest (micro-batch fast path) and the ray.data Dataset
    path must produce byte-identical committed output."""
    clean_sig = _content_signature(f"{clean_run[0]}/out")
    root = str(tmp_path)
    build_sources(root)
    pipe = ReplicatePipeline(
        f"{root}/clips", f"{root}/out", cfg(ingest_mode="dataset"), f"{root}/updates"
    )
    pipe.run()
    assert _content_signature(f"{root}/out") == clean_sig


@pytest.mark.parametrize("crash_point", ["after_prepare", "before_main_commit", "before_close"])
def test_exactly_once_crash_resume(tmp_path, ray_session, clean_run, crash_point):
    clean_root = clean_run[0]
    clean_sig = _content_signature(f"{clean_root}/out")

    root = str(tmp_path)
    build_sources(root)
    crash_cfg = cfg(crash_at=(2, crash_point))
    pipe = ReplicatePipeline(f"{root}/clips", f"{root}/out", crash_cfg, f"{root}/updates")
    with pytest.raises(CrashPoint):
        pipe.run()
    # resume with a fresh driver (no crash hook)
    pipe2 = ReplicatePipeline(f"{root}/clips", f"{root}/out", cfg(), f"{root}/updates")
    pipe2.run()
    sig = _content_signature(f"{root}/out")
    assert sig == clean_sig
    # per-partition epoch lineage contiguous
    frags = Table(f"{root}/out/replicated").fragments()
    epochs = sorted({f.epoch for f in frags})
    assert epochs == list(range(min(epochs), max(epochs) + 1))


def test_long_run_bounded_manifest_and_delta_resume(tmp_path, ray_session):
    """Many-epoch run: per-epoch lineage lives in the side log (manifest
    properties stay O(1)), checkpoints between full snapshots are deltas,
    GC keeps only the restorable chain, and a crash on a DELTA epoch
    resumes through full+delta restore to the clean run's output."""
    import json as _json
    import os as _os

    n, versions = 240, 30
    clips = synth_clips_table(n)
    upd = synth_updates_table(n)

    def build(root):
        ct = Table.create(f"{root}/clips", schema=clips.schema)
        step = n // versions
        for v in range(versions):
            ct.append(clips.slice(v * step, step))
        ut = Table.create(f"{root}/updates", schema=upd.schema)
        ustep = -(-upd.num_rows // versions)
        for v in range(versions):
            lo = v * ustep
            if lo < upd.num_rows:
                ut.append(upd.slice(lo, min(ustep, upd.num_rows - lo)))

    c = ReplicateConfig(
        num_partitions=2, join_window_ms=5_000, allowed_lateness_ms=2_000,
        window_size_ms=10_000, actor_num_cpus=0.25, full_checkpoint_every=5,
        keep_checkpoints=3,
    )
    root = str(tmp_path / "clean")
    _os.makedirs(root)
    build(root)
    ReplicatePipeline(f"{root}/clips", f"{root}/out", c, f"{root}/updates").run()

    lineage = read_lineage(f"{root}/out")
    assert len(lineage) == versions + 1  # one per epoch + flush
    assert [e["epoch"] for e in lineage] == list(range(versions + 1))
    # manifest properties stay small at any horizon
    props = Table(f"{root}/out/replicated").properties()
    assert len(_json.dumps(props)) < 16_000
    # delta checkpoints were written and GC kept a restorable chain
    pdir = _os.path.join(f"{root}/out", "_checkpoints", "p0000")
    entries = sorted(_os.listdir(pdir))
    kinds = {
        e: ("full" if _os.path.exists(_os.path.join(pdir, e, "state.pkl")) else "delta")
        for e in entries
    }
    assert "delta" in kinds.values() and "full" in kinds.values()
    oldest = min(int(e[1:]) for e in entries)
    assert kinds[f"e{oldest:06d}"] == "full"  # chain starts at a full snapshot

    sig_clean = _content_signature(f"{root}/out")

    # crash on an epoch whose checkpoint is a DELTA (17 % 5 != 0)
    root2 = str(tmp_path / "crash")
    _os.makedirs(root2)
    build(root2)
    c_crash = ReplicateConfig(
        num_partitions=2, join_window_ms=5_000, allowed_lateness_ms=2_000,
        window_size_ms=10_000, actor_num_cpus=0.25, full_checkpoint_every=5,
        keep_checkpoints=3, crash_at=(18, "before_close"),
    )
    with pytest.raises(CrashPoint):
        ReplicatePipeline(f"{root2}/clips", f"{root2}/out", c_crash, f"{root2}/updates").run()
    ReplicatePipeline(f"{root2}/clips", f"{root2}/out", c, f"{root2}/updates").run()
    assert _content_signature(f"{root2}/out") == sig_clean


def test_compaction_preserves_replicated_output(clean_run):
    """Post-run sink compaction (maintenance) must not change what
    read_replicated returns — byte-identical join, far fewer fragments."""
    from hydra_ray.pipelines.replicate import read_replicated
    from hydra_ray.table import Table as LTable

    root = clean_run[0]
    before = read_replicated(f"{root}/out").to_pandas().sort_values("seq")
    shrunk = 0
    for name in ("replicated", "payload", "views", "dlq"):
        t = LTable(f"{root}/out/{name}")
        n0 = len(t.fragments())
        if t.compact(target_rows=10**9) is not None:
            shrunk += n0 - len(t.fragments())
        assert t.count_rows() == sum(f.rows for f in t.fragments())
    assert shrunk > 0  # per-(partition, epoch) fragments actually merged
    after = read_replicated(f"{root}/out").to_pandas().sort_values("seq")
    pd.testing.assert_frame_equal(
        before.reset_index(drop=True), after.reset_index(drop=True)
    )


def test_periodic_sink_compaction_preserves_output(tmp_path, ray_session, clean_run):
    """compact_sinks_every: maintenance bin-packing mid-run must not
    change any sink's content, and must actually shrink fragment counts."""
    clean_sig = _content_signature(f"{clean_run[0]}/out")
    root = str(tmp_path)
    build_sources(root)
    pipe = ReplicatePipeline(
        f"{root}/clips", f"{root}/out", cfg(compact_sinks_every=2),
        f"{root}/updates",
    )
    pipe.run()
    assert _content_signature(f"{root}/out") == clean_sig
    # payload is the fragmented sink here: an uncompacted run leaves one
    # fragment per (partition, epoch) = 4 x VERSIONS = 16 (don't compare
    # against clean_run: test_compaction_preserves_replicated_output
    # compacts those sinks in place)
    compacted = len(Table(f"{root}/out/payload").fragments())
    assert compacted == cfg().num_partitions  # 16 fragments bin-packed to 4


def test_streaming_audio_features_on_payload(ray_session, tmp_path):
    """ReplicateConfig(audio_features=True): per-clip features computed in
    the decode task ride the payload fragments and surface through
    read_replicated, matching the batch audio_features kernel exactly."""
    from hydra_ray.pipelines.replicate import read_replicated
    from hydra_ray.stages.audio_features import audio_features
    from hydra_ray.stages.decode import AudioDecoder

    root = str(tmp_path)
    clips = synth_clips_table(200)
    ct = Table.create(f"{root}/clips", schema=clips.schema)
    for v in range(2):
        ct.append(clips.slice(v * 100, 100))
    pipe = ReplicatePipeline(
        f"{root}/clips", f"{root}/out", cfg(audio_features=True))
    metrics = pipe.run()
    out = read_replicated(f"{root}/out")
    for c in ("rms", "peak", "zero_cross_rate", "clip_ratio", "dom_freq_hz"):
        assert c in out.column_names
    # reference: decode the same source rows directly and run the kernel
    dec = AudioDecoder()(clips)
    import pyarrow.compute as pc

    dec = dec.filter(pc.is_null(dec["decode_error"]))
    ref = audio_features(dec.select(["seq", "pcm", "sr_hz"]))
    ref_df = ref.to_pandas().set_index("seq")
    got = out.select(
        ["seq", "rms", "peak", "zero_cross_rate", "clip_ratio", "dom_freq_hz"]
    ).to_pandas().set_index("seq")
    joined = got.join(ref_df, rsuffix="_ref").dropna()
    assert len(joined) == len(got)  # every emitted row has features
    for c in ("rms", "peak", "zero_cross_rate", "clip_ratio", "dom_freq_hz"):
        assert np.allclose(joined[c], joined[f"{c}_ref"], atol=1e-12), c

    # default off: no feature columns on the payload
    pipe2 = ReplicatePipeline(f"{root}/clips", f"{root}/out2", cfg())
    pipe2.run()
    out2 = read_replicated(f"{root}/out2")
    assert "rms" not in out2.column_names


def test_payload_transform_trim_silence(ray_session, tmp_path):
    """ReplicateConfig(payload_transform=trim_payload): silence-padded
    clips stage trimmed payload fragments (curation at ingest), exactly
    matching the batch trim_silence kernel on the decoded rows."""
    from hydra_ray.audio import encode_pcm16
    from hydra_ray.pipelines.replicate import read_replicated, trim_payload
    from hydra_ray.stages.audio_curation import trim_silence
    from hydra_ray.stages.decode import AudioDecoder

    root = str(tmp_path)
    base = synth_clips_table(60)
    sr = 16_000
    frame = sr * 20 // 1000
    rng = np.random.default_rng(3)
    cols = {n: base[n].to_pylist() for n in base.column_names}
    tone = (0.5 * np.sin(2 * np.pi * 330 * np.arange(sr // 2) / sr)
            ).astype(np.float32)
    padded = set()
    for i in range(0, 60, 3):     # every third clip: silence-padded pcm16
        pad = np.zeros(int(rng.integers(2, 6)) * frame, np.float32)
        wave = np.r_[pad, tone, pad]
        cols["bytes"][i] = encode_pcm16(wave)
        cols["codec"][i] = "pcm16"
        cols["sr_hz"][i] = sr
        padded.add(cols["seq"][i])
    clips = pa.table(cols, schema=base.schema)
    ct = Table.create(f"{root}/clips", schema=clips.schema)
    ct.append(clips)

    pipe = ReplicatePipeline(
        f"{root}/clips", f"{root}/out", cfg(payload_transform=trim_payload))
    pipe.run()
    out = read_replicated(f"{root}/out")
    assert "trimmed_ms" in out.column_names
    got = out.select(["seq", "n_samples", "trimmed_ms"]).to_pandas() \
             .set_index("seq")

    dec = AudioDecoder()(clips)
    import pyarrow.compute as pc

    dec = dec.filter(pc.is_null(dec["decode_error"]))
    ref = trim_silence(dec.select(["seq", "pcm", "sr_hz"]))
    ref_ns = dict(zip(ref["seq"].to_pylist(),
                      pc.list_value_length(ref["pcm"]).to_pylist()))
    ref_tms = dict(zip(ref["seq"].to_pylist(), ref["trimmed_ms"].to_pylist()))
    assert len(got) == len(ref_ns)
    for seq, row in got.iterrows():
        assert row["n_samples"] == ref_ns[seq], seq
        assert row["trimmed_ms"] == ref_tms[seq], seq
    # padded clips actually lost their padding
    assert all(got.loc[s, "trimmed_ms"] > 0 for s in padded)

    # --- features + transform compose: features must describe the
    # TRANSFORMED (stored) payload, not the as-decoded clip (ADVICE r2)
    pipe2 = ReplicatePipeline(
        f"{root}/clips", f"{root}/out2",
        cfg(payload_transform=trim_payload, audio_features=True))
    pipe2.run()
    out2 = read_replicated(f"{root}/out2")
    got2 = out2.select(["seq", "rms", "zero_cross_rate", "dom_freq_hz"]) \
               .to_pandas().set_index("seq")
    from hydra_ray.stages.audio_features import audio_features

    ref2 = audio_features(ref.select(["seq", "pcm", "sr_hz"]))
    ref2_df = ref2.to_pandas().set_index("seq")
    joined = got2.join(ref2_df, rsuffix="_ref").dropna()
    assert len(joined) == len(got2)
    for c in ("rms", "zero_cross_rate", "dom_freq_hz"):
        assert np.allclose(joined[c], joined[f"{c}_ref"], atol=1e-12), c
    # the padded clips' post-trim rms differs from their pre-trim rms
    pre = audio_features(dec.select(["seq", "pcm", "sr_hz"])) \
        .to_pandas().set_index("seq")
    for s in padded:
        assert got2.loc[s, "rms"] > pre.loc[s, "rms"]


def test_streaming_fbank_on_payload(ray_session, tmp_path):
    """ReplicateConfig(audio_fbank=True): pooled log-mel features ride
    the payload fragments (mixed native sample rates handled per-rate),
    matching the batch audio_fbank kernel exactly; composes with the
    payload transform (features describe the TRANSFORMED audio)."""
    from hydra_ray.pipelines.replicate import read_replicated, trim_payload
    from hydra_ray.stages.audio_curation import trim_silence
    from hydra_ray.stages.audio_features import audio_fbank
    from hydra_ray.stages.decode import AudioDecoder

    root = str(tmp_path)
    clips = synth_clips_table(150)
    ct = Table.create(f"{root}/clips", schema=clips.schema)
    for v in range(2):
        ct.append(clips.slice(v * 75, 75))
    pipe = ReplicatePipeline(
        f"{root}/clips", f"{root}/out", cfg(audio_fbank=True))
    pipe.run()
    out = read_replicated(f"{root}/out")
    for c in ("fbank_mean", "fbank_std", "n_frames"):
        assert c in out.column_names

    import pyarrow.compute as pc

    dec = AudioDecoder()(clips)
    dec = dec.filter(pc.is_null(dec["decode_error"]))
    ref = audio_fbank(dec.select(["seq", "pcm", "sr_hz"]))
    ref_mean = np.asarray(
        ref["fbank_mean"].combine_chunks().flatten()).reshape(-1, 16)
    ref_by_seq = dict(zip(ref["seq"].to_pylist(), ref_mean))
    ref_nf = dict(zip(ref["seq"].to_pylist(), ref["n_frames"].to_pylist()))

    got_seq = out["seq"].to_pylist()
    got_mean = np.asarray(
        out["fbank_mean"].combine_chunks().flatten()).reshape(-1, 16)
    got_nf = out["n_frames"].to_pylist()
    assert len(got_seq) == len(ref_by_seq)
    for s, m, k in zip(got_seq, got_mean, got_nf):
        assert k == ref_nf[s], s
        assert np.allclose(m, ref_by_seq[s], atol=1e-5), s

    # composes with a payload transform: fbank over the TRIMMED pcm
    pipe2 = ReplicatePipeline(
        f"{root}/clips", f"{root}/out2",
        cfg(audio_fbank=True, payload_transform=trim_payload))
    pipe2.run()
    out2 = read_replicated(f"{root}/out2")
    trimmed = trim_silence(dec.select(["seq", "pcm", "sr_hz"]))
    ref2 = audio_fbank(trimmed.select(["seq", "pcm", "sr_hz"]))
    r2_mean = np.asarray(
        ref2["fbank_mean"].combine_chunks().flatten()).reshape(-1, 16)
    r2_by_seq = dict(zip(ref2["seq"].to_pylist(), r2_mean))
    g2_seq = out2["seq"].to_pylist()
    g2_mean = np.asarray(
        out2["fbank_mean"].combine_chunks().flatten()).reshape(-1, 16)
    for s, m in zip(g2_seq, g2_mean):
        assert np.allclose(m, r2_by_seq[s], atol=1e-5), s


def test_history_truncation_preserves_output(tmp_path, ray_session, clean_run):
    """keep_history_versions bounds every sink's manifest log mid-stream
    without changing any output (maintenance runs between epochs)."""
    clean_sig = _content_signature(f"{clean_run[0]}/out")
    root = str(tmp_path)
    build_sources(root)
    c = cfg(compact_sinks_every=2, keep_history_versions=3)
    ReplicatePipeline(f"{root}/clips", f"{root}/out", c,
                      f"{root}/updates").run()
    assert _content_signature(f"{root}/out") == clean_sig
    import os

    for sink in ("replicated", "windows"):
        t = Table(f"{root}/out/{sink}")
        versions = [n for n in t.fs.list_dir(
            os.path.join(t.root, "_versions")) if n.endswith(".json")]
        # bounded: 3 kept at the last tick + (epoch + compaction)
        # versions appended since — far below the ~20 an unbounded
        # 8-epoch run accumulates
        assert len(versions) <= 8, len(versions)


def test_quantized_pcm_staging_bit_exact(tmp_path, ray_session, clean_run):
    """Transform-path fragments store int16-grid rows as pcm_q
    (2 B/sample) and read_replicated reconstructs bit-identically: the
    trim_payload config's joined pcm must equal a clean pre-r5-style
    float read (the per-row verify-by-roundtrip rule guarantees it)."""
    import numpy as np
    import pyarrow.compute as pc

    from hydra_ray.audio import decode_batch
    from hydra_ray.pipelines.replicate import read_replicated, trim_payload
    from hydra_ray.stages.audio_curation import trim_silence
    from hydra_ray.table import Table as LTable

    root = str(tmp_path)
    build_sources(root)
    pipe = ReplicatePipeline(
        f"{root}/clips", f"{root}/out", cfg(payload_transform=trim_payload),
        f"{root}/updates",
    )
    pipe.run()
    # fragments actually used the quantized column
    payload = LTable(f"{root}/out/payload").to_arrow()
    assert "pcm_q" in payload.column_names
    n_q = pc.sum(pc.cast(pc.is_valid(payload["pcm_q"]), pa.int64())).as_py()
    assert n_q > 0, "no rows quantized — grid check broken?"

    out = read_replicated(f"{root}/out")
    assert "pcm_q" not in out.column_names
    # oracle: decode + trim the source clips directly
    clips = LTable(f"{root}/clips").to_arrow()
    pcm, err = decode_batch(clips["bytes"].combine_chunks(),
                            clips["codec"], clips["sr_hz"])
    okm = pc.is_null(err).to_numpy(zero_copy_only=False)
    dec = pa.table({"seq": clips["seq"], "pcm": pcm,
                    "sr_hz": clips["sr_hz"]}).filter(pa.array(okm))
    ref = trim_silence(dec.select(["seq", "pcm", "sr_hz"]))

    def row_span(col, i):
        # Arrow-side per-row span (no pcm to_pylist — CLAUDE.md rule)
        arr = col.combine_chunks()
        offs = arr.offsets.to_numpy(zero_copy_only=False)
        vals = np.asarray(arr.values, dtype=np.float32)
        return vals[offs[i]:offs[i + 1]]

    ref_pos = {s: j for j, s in enumerate(ref["seq"].to_pylist())}
    got_seq = out["seq"].to_pylist()
    # bit-exact per-row equality on a deterministic sample of rows
    idx = np.linspace(0, len(got_seq) - 1, 40).astype(int)
    for i in idx:
        g = row_span(out["pcm"], int(i))
        r = row_span(ref["pcm"], ref_pos[got_seq[int(i)]])
        assert np.array_equal(g.view(np.uint32), r.view(np.uint32)), i


def test_reconstruct_pcm_mixed_version_fragments():
    """A payload table holding BOTH pre-passthrough float fragments and
    passthrough bytes fragments (in-place upgrade) reconstructs every
    row: stored pcm wins where present, bytes decode elsewhere,
    in-flight rows stay null."""
    import numpy as np
    import pyarrow as pa

    from hydra_ray.audio import encode
    from hydra_ray.pipelines.replicate import _reconstruct_pcm

    inv = np.float32(1.0 / 32767.0)
    old_pcm = (np.arange(-5, 5, dtype=np.int16).astype(np.float32) * inv)
    wave = np.sin(np.linspace(0, 1, 50)).astype(np.float32) * 0.5
    raw = encode(wave, "pcm16", 8000)
    # row0: old float fragment; row1: passthrough; row2: in-flight null
    matched = pa.table({
        "seq": pa.array([1, 2, 3], pa.int64()),
        "pcm": pa.LargeListArray.from_arrays(
            pa.array([0, 10, 10, 10], pa.int64()),
            pa.array(old_pcm, pa.float32()),
            mask=pa.array([False, True, True])),
        "bytes": pa.array([None, raw, None], pa.binary()),
        "codec": pa.array([None, "pcm16", None], pa.string()),
        "sr_hz": pa.array([None, 8000, None], pa.int32()),
        "n_samples": pa.array([10, 50, None], pa.int32()),
    })
    out = _reconstruct_pcm(matched)
    assert out.column_names == ["seq", "pcm", "n_samples"]
    col = out["pcm"].combine_chunks()
    got0 = np.asarray(col[0].as_py(), dtype=np.float32)
    assert np.array_equal(got0.view(np.uint32), old_pcm.view(np.uint32))
    got1 = np.asarray(col[1].as_py(), dtype=np.float32)
    ref1 = (np.clip(wave, -1, 1) * 32767.0).astype("<i2").astype(
        np.float32) * inv
    assert np.array_equal(got1.view(np.uint32), ref1.view(np.uint32))
    assert not col[2].is_valid
