"""Curation-at-ingest payload filter (ReplicateConfig(payload_filter=…)):
gate-dropped clips DLQ with reason "filtered", never enter windows or the
replicated output, their payload is never staged, and the accounting
closes exactly.  The offline oracle re-derives the drop set from the same
deterministic gate over the decoded corpus."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import test_replicate as tr
from hydra_ray.pipelines.replicate import (
    CrashPoint,
    ReplicatePipeline,
    read_lineage,
    read_replicated,
)
from hydra_ray.stages.audio_loudness import loudness_gate, loudness_lufs
from hydra_ray.stages.decode import AudioDecoder
from hydra_ray.synth import synth_clips_table
from hydra_ray.table import Table

N_CLIPS = tr.N_CLIPS
GATE_LUFS = None  # filled by _threshold()


def _threshold(clips):
    """Median loudness of the decodable corpus — guarantees the gate
    really splits the fixture."""
    dec = AudioDecoder()(clips)
    okm = pa.compute.is_null(dec["decode_error"]).to_numpy(
        zero_copy_only=False)
    sub = dec.filter(pa.array(okm))
    lufs = loudness_lufs(sub.select(["pcm", "sr_hz"]))["lufs"].to_numpy(
        zero_copy_only=False)
    seqs = sub["seq"].to_numpy(zero_copy_only=False)
    med = float(np.nanmedian(lufs))
    dropped = set(seqs[np.isnan(lufs) | (lufs < med)].tolist())
    kept = set(seqs[~np.isnan(lufs) & (lufs >= med)].tolist())
    return med, dropped, kept


@pytest.fixture(scope="module")
def filtered_run(tmp_path_factory, ray_session):
    root = str(tmp_path_factory.mktemp("pfilter"))
    clips, upd = tr.build_sources(root)
    med, dropped, kept = _threshold(clips)
    cfg = tr.cfg(payload_filter=loudness_gate(min_lufs=med))
    pipe = ReplicatePipeline(
        f"{root}/clips", f"{root}/out", cfg, f"{root}/updates")
    metrics = pipe.run()
    return root, clips, upd, metrics, med, dropped, kept


def test_filtered_set_exact_and_counts_close(filtered_run):
    root, clips, upd, metrics, med, dropped, kept = filtered_run
    assert len(dropped) > 50 and len(kept) > 50  # the gate really splits

    repl = Table(f"{root}/out/replicated").to_arrow()
    repl_seqs = set(repl["seq"].to_pylist())
    dlq = Table(f"{root}/out/dlq").to_arrow().to_pandas()
    filt_rows = dlq[(dlq["source"] == "clips") & (dlq["reason"] == "filtered")]
    late_rows = dlq[(dlq["source"] == "clips") & (dlq["reason"] == "late")]

    # gate precedence: every gate-failing decodable clip is "filtered"
    # (even if also late); late counts only the gate-passing late ones
    assert set(filt_rows["seq"]) == dropped
    assert metrics.get("clips_filtered", 0) == len(dropped)
    assert repl_seqs == kept - set(late_rows["seq"])
    assert len(repl_seqs) + len(filt_rows) + len(late_rows) == N_CLIPS

    # filtered clips never reach window state: tumbling windows place
    # each ingested clip exactly once, so the counts re-derive from the
    # surviving rows alone (late and filtered rows never ingest)
    win = Table(f"{root}/out/windows").to_arrow().to_pandas()
    assert win["n_clips"].sum() == len(repl_seqs)
    # payload fragments cover exactly the emitted rows
    payload = Table(f"{root}/out/payload").to_arrow()
    assert set(payload["seq"].to_pylist()) == repl_seqs
    joined = read_replicated(f"{root}/out")
    assert joined.num_rows == len(repl_seqs)
    assert joined.column("n_samples").null_count == 0


def test_filter_crash_resume_identical(tmp_path, ray_session, filtered_run):
    clean_root, _, _, _, med, dropped, kept = filtered_run

    def sig(out_root):
        df = (Table(f"{out_root}/replicated").to_arrow()
              .select(["seq", "clip_id", "transcript", "deleted"])
              .to_pandas().sort_values("seq").reset_index(drop=True))
        return len(df), pd.util.hash_pandas_object(df).sum()

    root = str(tmp_path)
    tr.build_sources(root)
    cfg = tr.cfg(payload_filter=loudness_gate(min_lufs=med),
                 crash_at=(2, "after_prepare"))
    with pytest.raises(CrashPoint):
        ReplicatePipeline(f"{root}/clips", f"{root}/out", cfg,
                          f"{root}/updates").run()
    cfg2 = tr.cfg(payload_filter=loudness_gate(min_lufs=med))
    ReplicatePipeline(f"{root}/clips", f"{root}/out", cfg2,
                      f"{root}/updates").run()
    assert sig(f"{root}/out") == sig(f"{clean_root}/out")
