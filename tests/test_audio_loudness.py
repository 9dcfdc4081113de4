"""BS.1770-style loudness: batch kernel vs per-clip reference, analytic
sine check, normalization round trip, gating edge cases."""

import numpy as np
import pyarrow as pa
import pytest

from hydra_ray.stages.audio_loudness import (
    _ABS_GATE_LUFS,
    _OFFSET_LU,
    _REL_GATE_LU,
    _k_weight_sq,
    loudness_lufs,
    normalize_loudness,
)


def _clip_table(waves, srs):
    off = np.r_[0, np.cumsum([len(w) for w in waves])].astype(np.int64)
    flat = (np.concatenate(waves).astype(np.float32)
            if len(waves) else np.empty(0, np.float32))
    return pa.table({
        "seq": pa.array(np.arange(len(waves), dtype=np.int64)),
        "pcm": pa.LargeListArray.from_arrays(
            pa.array(off, pa.int64()), pa.array(flat, pa.float32())),
        "sr_hz": pa.array(np.asarray(srs, np.int32), pa.int32()),
    })


def _ref_lufs(wave: np.ndarray, sr: float):
    """Per-clip reference: explicit block loop, same frequency-domain
    K-weighting recipe."""
    win, hop = int(round(0.4 * sr)), int(round(0.1 * sr))
    if len(wave) < win:
        return None
    wk = _k_weight_sq(np.fft.rfftfreq(win, 1.0 / sr))
    scale = np.full(win // 2 + 1, 2.0)
    scale[0] = 1.0
    if win % 2 == 0:
        scale[-1] = 1.0
    zs = []
    for s in range(0, len(wave) - win + 1, hop):
        x = np.fft.rfft(wave[s:s + win].astype(np.float64))
        zs.append(float(((x.real**2 + x.imag**2) * wk * scale).sum()
                        / (win * win)))
    zs = np.array(zs)
    lb = _OFFSET_LU + 10 * np.log10(np.maximum(zs, 1e-30))
    m1 = lb > _ABS_GATE_LUFS
    if not m1.any():
        return None
    thr = _OFFSET_LU + 10 * np.log10(zs[m1].mean()) - _REL_GATE_LU
    m2 = m1 & (lb > thr)
    if not m2.any():
        return None
    return _OFFSET_LU + 10 * np.log10(zs[m2].mean())


def _mixed_fixture():
    rng = np.random.default_rng(7)
    waves, srs = [], []
    for i in range(12):
        sr = [8000, 16000, 16000, 44100][i % 4]
        dur = [0.3, 0.8, 2.0, 1.3][i % 4]   # includes a sub-block clip
        n = int(sr * dur)
        amp = [0.5, 0.02, 0.3, 0.001][i % 4]
        f = 200.0 + 37 * i
        w = amp * np.sin(2 * np.pi * f * np.arange(n) / sr)
        if i == 5:
            w[:] = 0.0                       # digital silence
        if i == 9:                           # loud head, quiet tail (gating)
            w[n // 2:] *= 0.001
        waves.append(w.astype(np.float32))
        srs.append(sr)
    return waves, srs


def test_batch_matches_per_clip_reference():
    waves, srs = _mixed_fixture()
    out = loudness_lufs(_clip_table(waves, srs))
    got = out["lufs"].to_pylist()
    for i, (w, sr) in enumerate(zip(waves, srs)):
        ref = _ref_lufs(w, float(sr))
        if ref is None:
            assert got[i] is None, i
        else:
            assert got[i] == pytest.approx(ref, abs=1e-9), i


def test_sine_analytic_loudness():
    sr, amp, f = 16000, 0.25, 1000.0        # bin-aligned at win=6400
    w = amp * np.sin(2 * np.pi * f * np.arange(2 * sr) / sr)
    out = loudness_lufs(_clip_table([w.astype(np.float32)], [sr]))
    expect = _OFFSET_LU + 10 * np.log10(
        float(_k_weight_sq(np.array([f]))[0]) * amp * amp / 2.0)
    assert out["lufs"][0].as_py() == pytest.approx(expect, abs=0.05)


def test_normalize_hits_target_and_reports_gain():
    waves, srs = _mixed_fixture()
    out = normalize_loudness(_clip_table(waves, srs), target_lufs=-23.0)
    lufs = out["lufs"].to_pylist()
    gain = out["gain_db"].to_pylist()
    remeasured = loudness_lufs(
        out.select(["seq", "pcm", "sr_hz"]))["lufs"].to_pylist()
    hit = 0
    for i in range(len(waves)):
        if lufs[i] is None:
            assert gain[i] == 0.0
            continue
        assert gain[i] == pytest.approx(
            np.clip(-23.0 - lufs[i], -40, 40), abs=1e-12)
        if abs(gain[i]) < 40 and max(abs(waves[i])) * 10 ** (gain[i] / 20) <= 1.0:
            # no clipping and no clamp ⇒ gating survives the shift and the
            # re-measured loudness lands on target
            assert remeasured[i] == pytest.approx(-23.0, abs=0.05)
            hit += 1
    assert hit >= 4  # fixture really exercises the on-target path


def test_silence_and_short_clips_pass_through():
    sr = 16000
    silent = np.zeros(sr, np.float32)
    short = 0.5 * np.ones(int(0.2 * sr), np.float32)
    tbl = _clip_table([silent, short], [sr, sr])
    out = normalize_loudness(tbl)
    assert out["lufs"].null_count == 2
    assert out["gain_db"].to_pylist() == [0.0, 0.0]
    got = np.asarray(out["pcm"].combine_chunks().flatten())
    orig = np.asarray(tbl["pcm"].combine_chunks().flatten())
    assert np.array_equal(got, orig)


def test_batch_composition_independent():
    waves, srs = _mixed_fixture()
    whole = loudness_lufs(_clip_table(waves, srs))["lufs"].to_pylist()
    single = [
        loudness_lufs(_clip_table([w], [sr]))["lufs"][0].as_py()
        for w, sr in zip(waves, srs)
    ]
    assert whole == single


def test_normalizer_as_streaming_payload_transform(ray_session, tmp_path):
    """LoudnessNormalizer satisfies the payload_transform contract: the
    STORED payload is level-normalized and carries lufs/gain_db, exactly
    matching the batch normalize_loudness kernel on the decoded rows."""
    from hydra_ray.pipelines.replicate import (
        ReplicateConfig,
        ReplicatePipeline,
        read_replicated,
    )
    from hydra_ray.stages.audio_loudness import LoudnessNormalizer
    from hydra_ray.stages.decode import AudioDecoder
    from hydra_ray.synth import synth_clips_table
    from hydra_ray.table import Table

    root = str(tmp_path)
    clips = synth_clips_table(80)
    ct = Table.create(f"{root}/clips", schema=clips.schema)
    ct.append(clips)
    cfg = ReplicateConfig(
        num_partitions=4, actor_num_cpus=0.25, window_size_ms=10_000,
        payload_transform=LoudnessNormalizer(-23.0))
    ReplicatePipeline(f"{root}/clips", f"{root}/out", cfg).run()

    out = read_replicated(f"{root}/out")
    df = out.to_pandas()
    assert {"lufs", "gain_db"} <= set(df.columns)

    # oracle: batch kernel over the decoded corpus
    dec = AudioDecoder()(clips)
    okm = pa.compute.is_null(dec["decode_error"]).to_numpy(
        zero_copy_only=False)
    ref = normalize_loudness(
        dec.filter(pa.array(okm)).select(["seq", "pcm", "sr_hz"]), -23.0)
    ref_gain = dict(zip(ref["seq"].to_pylist(), ref["gain_db"].to_pylist()))
    got = df.set_index("seq")["gain_db"].to_dict()
    assert set(got) <= set(ref_gain)
    for seq, g in got.items():
        assert g == pytest.approx(ref_gain[seq], abs=1e-12), seq
    # stored PCM really is the scaled one: re-measure a few stored clips
    stored = out.select(["seq", "pcm"])
    sr = dict(zip(dec["seq"].to_pylist(), dec["sr_hz"].to_pylist()))
    check = df[df["lufs"].notna()].head(5)["seq"].tolist()
    assert len(check) >= 3
    sub = stored.filter(pa.compute.is_in(
        stored["seq"], value_set=pa.array(check)))
    sub = sub.append_column("sr_hz", pa.array(
        [sr[s] for s in sub["seq"].to_pylist()], pa.int32()))
    lu = loudness_lufs(sub)["lufs"].to_pylist()
    for s, v in zip(sub["seq"].to_pylist(), lu):
        gain = got[s]
        if abs(gain) < 39.9:   # unclamped ⇒ should land on target
            assert v == pytest.approx(-23.0, abs=0.1), (s, v)
