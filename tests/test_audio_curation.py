"""Audio curation kernels vs analytic signals (spectral / resample / VAD)."""

import numpy as np
import pyarrow as pa
import pytest

from hydra_ray.stages.audio_curation import (
    resample_clips,
    spectral_features,
    vad_segments,
)


def _tbl(clips, srs, ids=None):
    off = np.r_[0, np.cumsum([len(c) for c in clips])].astype(np.int64)
    flat = np.concatenate(clips).astype(np.float32) if clips else np.array([], np.float32)
    pcm = pa.LargeListArray.from_arrays(pa.array(off), pa.array(flat, pa.float32()))
    return pa.table({
        "clip_id": pa.array(ids or [f"c{i}" for i in range(len(clips))]),
        "pcm": pcm,
        "sr_hz": pa.array(np.asarray(srs, np.int32), pa.int32()),
    })


def _sine(f, sr, dur_s, amp=0.5, phase=0.0):
    t = np.arange(int(sr * dur_s)) / sr
    return amp * np.sin(2 * np.pi * f * t + phase)


def test_spectral_centroid_tracks_sine_freq():
    sr = 16_000
    t = spectral_features(_tbl([_sine(1000, sr, 1.0), _sine(3000, sr, 1.0)],
                               [sr, sr]))
    cent = t["spec_centroid_hz"].to_numpy()
    bin_hz = sr / 1024
    assert abs(cent[0] - 1000) < 3 * bin_hz
    assert abs(cent[1] - 3000) < 3 * bin_hz
    # pure tones are spectrally peaky: flatness near 0
    assert (t["spec_flatness"].to_numpy() < 0.05).all()


def test_spectral_noise_vs_tone_and_short_clip():
    sr = 16_000
    rng = np.random.default_rng(0)
    noise = rng.normal(0, 0.2, sr).astype(np.float32)
    t = spectral_features(_tbl([noise, _sine(500, sr, 1.0), np.zeros(100)],
                               [sr, sr, sr]))
    flat = t["spec_flatness"].to_numpy()
    assert flat[0] > 0.3 > flat[1]          # white noise ≫ tone
    assert np.isnan(t["spec_centroid_hz"].to_numpy()[2])  # < 1 frame → NULL
    # rolloff of white noise sits well above the tone's
    roll = t["spec_rolloff_hz"].to_numpy()
    assert roll[0] > 4000 and roll[1] < 1000


def test_resample_sine_snr_and_lengths():
    f, amp = 440.0, 0.4
    src = _sine(f, 8000, 1.0, amp)
    t = resample_clips(_tbl([src, _sine(f, 16000, 0.5, amp)], [8000, 16000]),
                       target_sr=16000)
    assert t["sr_hz"].to_numpy().tolist() == [16000, 16000]
    out = t["pcm"].combine_chunks()
    lens = np.diff(out.offsets.to_numpy())
    assert lens.tolist() == [16000, 8000]
    up = out.flatten().to_numpy(zero_copy_only=False)[:16000]
    ref = _sine(f, 16000, 1.0, amp).astype(np.float32)
    err = up - ref
    snr = 10 * np.log10((ref ** 2).sum() / max((err ** 2).sum(), 1e-30))
    assert snr >= 30.0, snr
    # same-rate clip passes through bit-identically
    down = out.flatten().to_numpy(zero_copy_only=False)[16000:]
    np.testing.assert_array_equal(down, _sine(f, 16000, 0.5, amp).astype(np.float32))


def test_resample_empty_and_zero_len():
    t = resample_clips(_tbl([np.array([], np.float32)], [8000]), 16000)
    assert t["pcm"].combine_chunks().offsets.to_numpy().tolist() == [0, 0]


def test_vad_finds_tone_span():
    sr = 16_000
    sil = np.zeros(sr // 2, np.float32)           # 500 ms
    tone = _sine(440, sr, 0.6, 0.3).astype(np.float32)  # 600 ms
    clip = np.concatenate([sil, tone, sil])
    t = vad_segments(_tbl([clip], [sr]), "clip_id", frame_ms=20,
                     thresh_db=-35.0, hang_frames=2)
    assert t.num_rows == 1
    start, end = t["start_ms"][0].as_py(), t["end_ms"][0].as_py()
    assert abs(start - 500) <= 20
    # hangover extends the tail by up to hang_frames*20 ms
    assert 1100 - 20 <= end <= 1100 + 3 * 20


def test_vad_multiple_segments_and_silence():
    sr = 8_000
    seg = _sine(300, sr, 0.2, 0.5).astype(np.float32)
    gap = np.zeros(int(sr * 0.3), np.float32)
    clip = np.concatenate([gap, seg, gap, seg, gap])
    t = vad_segments(_tbl([clip, np.zeros(sr, np.float32)], [sr, sr]),
                     "clip_id", frame_ms=20, hang_frames=1)
    df = t.to_pandas()
    assert (df["clip_id"] == "c0").all()
    assert df["seg"].tolist() == [0, 1]
    assert abs(df["start_ms"][0] - 300) <= 20
    assert abs(df["start_ms"][1] - 800) <= 20


def test_vad_segments_on_dataset(ray_session):
    import ray.data as rd

    sr = 16_000
    clips = [np.concatenate([np.zeros(sr // 4, np.float32),
                             _sine(200 + 50 * i, sr, 0.25, 0.4).astype(np.float32)])
             for i in range(20)]
    tbl = _tbl(clips, [sr] * 20, ids=[f"clip{i:02d}" for i in range(20)])
    from hydra_ray.stages.audio_curation import VadSegments

    out = (
        rd.from_arrow(tbl).repartition(4)
        .map_batches(VadSegments("clip_id"), batch_format="pyarrow")
        .to_pandas()
    )
    assert len(out) == 20 and set(out["seg"]) == {0}


def test_trim_silence_removes_padding_exactly():
    from hydra_ray.stages.audio_curation import trim_silence

    sr = 16_000
    frame = sr * 20 // 1000  # 320 samples per 20 ms frame
    tone = _sine(440, sr, 0.5, amp=0.6)
    pad_l, pad_r = np.zeros(5 * frame), np.zeros(3 * frame)
    clips = [
        np.r_[pad_l, tone, pad_r],          # padded both sides
        tone,                                # no padding
        np.zeros(10 * frame),                # fully silent
        np.array([], np.float32),            # empty
    ]
    out = trim_silence(_tbl(clips, [sr] * 4), thresh_db=-35.0)
    kept = out["pcm"].combine_chunks()
    lens = [len(kept[i]) for i in range(4)]
    # frame-granular: padding frames are silent, tone frames active
    assert lens[0] == len(tone) + (len(tone) % frame and frame - len(tone) % frame)
    got = np.asarray(kept[0].as_py(), dtype=np.float32)
    assert np.array_equal(got[: len(tone)], tone.astype(np.float32))
    assert lens[1] == len(tone) + (len(tone) % frame and frame - len(tone) % frame)
    assert lens[2] == 0 and lens[3] == 0
    tms = out["trimmed_ms"].to_pylist()
    assert tms[0] == (len(clips[0]) - lens[0]) * 1000 // sr
    assert tms[2] == 10 * frame * 1000 // sr and tms[3] == 0


def test_chunk_audio_windows_cover_and_overlap():
    from hydra_ray.stages.audio_curation import chunk_audio

    sr = 8_000
    win, hop = sr * 250 // 1000, sr * 125 // 1000  # 2000 / 1000 samples
    x = np.arange(5_500, dtype=np.float32) / 5_500  # recognizable ramp
    short = np.arange(300, dtype=np.float32)
    out = chunk_audio(_tbl([x, short, np.array([], np.float32)], [sr] * 3),
                      "clip_id", win_ms=250, hop_ms=125)
    df = out.to_pandas()
    a = df[df["clip_id"] == "c0"]
    # ceil((5500-2000)/1000)+1 = 5 windows, starts 0,1000,...,4000
    assert a["chunk"].tolist() == [0, 1, 2, 3, 4]
    assert a["start_ms"].tolist() == [0, 125, 250, 375, 500]
    assert [len(p) for p in a["pcm"]] == [2000, 2000, 2000, 2000, 1500]
    # content: window k starts at sample k*hop
    w2 = np.asarray(a["pcm"].iloc[2], dtype=np.float32)
    assert np.array_equal(w2, x[2000:4000])
    b = df[df["clip_id"] == "c1"]  # shorter than one window: one chunk
    assert len(b) == 1 and len(b["pcm"].iloc[0]) == 300
    assert not (df["clip_id"] == "c2").any()  # empty clip emits nothing


def test_transcode_flac_roundtrip_ratio():
    from hydra_ray.audio import encode_pcm16
    from hydra_ray.flaclite import decode_flac, encode_flac

    sr = 16_000
    w = _sine(220, sr, 1.0, amp=0.4).astype(np.float32)
    blob = encode_flac(w, sr)
    dec, got_sr = decode_flac(blob)
    ref = np.frombuffer(encode_pcm16(w), dtype="<i2")
    assert got_sr == sr and np.array_equal(dec, ref)
    assert len(blob) < 2 * len(w)  # actually compresses vs pcm16


def test_audio_fbank_matches_per_clip_reference(ray_session):
    """audio_fbank: batched gather/rfft/matmul/reduceat pooling equals a
    plain per-clip numpy reference; short clips emit zero frames and
    zero pools; batch-composition independent."""
    import numpy as np
    import pyarrow as pa

    from hydra_ray.stages.audio_features import _mel_filters, audio_fbank

    rng = np.random.default_rng(4)
    sr, win, hop, n_mels = 16_000, 400, 160, 16
    clips = [
        (0.5 * np.sin(2 * np.pi * 440 * np.arange(8000) / sr)).astype(np.float32),
        (rng.standard_normal(5200) * 0.1).astype(np.float32),
        np.zeros(win - 1, np.float32),               # < one window
        (0.3 * np.sin(2 * np.pi * 3000 * np.arange(6000) / sr)).astype(np.float32),
        np.zeros(0, np.float32),                     # empty
    ]
    batch = pa.table({
        "seq": pa.array(range(len(clips)), pa.int64()),
        "pcm": pa.array([c.tolist() for c in clips], pa.list_(pa.float32())),
        "sr_hz": pa.array([sr] * len(clips), pa.int32()),
    })
    out = audio_fbank(batch)
    mean = np.asarray(out["fbank_mean"].combine_chunks().flatten()) \
        .reshape(len(clips), n_mels)
    std = np.asarray(out["fbank_std"].combine_chunks().flatten()) \
        .reshape(len(clips), n_mels)
    nf = out["n_frames"].to_pylist()

    fb = _mel_filters(n_mels, win, sr)
    for i, x in enumerate(clips):
        if len(x) < win:
            assert nf[i] == 0 and not mean[i].any() and not std[i].any()
            continue
        k = (len(x) - win) // hop + 1
        frames = np.stack([x[j * hop:j * hop + win] for j in range(k)])
        frames = frames * np.hanning(win).astype(np.float32)
        p = np.abs(np.fft.rfft(frames, axis=1)) ** 2
        mel = np.log(p @ fb.T + 1e-10)
        assert nf[i] == k
        assert np.allclose(mean[i], mel.mean(axis=0), atol=1e-4), i
        assert np.allclose(std[i], mel.std(axis=0), atol=1e-4), i
    # tonal clips peak in the right bands (440 Hz below 3 kHz)
    assert mean[0].argmax() < mean[3].argmax()
    # composition independence: single-row run equals batched row
    one = audio_fbank(batch.slice(1, 1))
    om = np.asarray(one["fbank_mean"].combine_chunks().flatten())
    assert np.allclose(om, mean[1], atol=1e-6)


def test_audio_mfcc_matches_per_clip_reference(ray_session):
    """n_mfcc path: frame log-mels pass through the orthonormal DCT-II
    before pooling; equals a per-clip numpy reference (incl. scipy-free
    DCT built from the definition)."""
    import numpy as np
    import pyarrow as pa

    from hydra_ray.stages.audio_features import (
        _dct2_ortho,
        _mel_filters,
        audio_fbank,
    )

    rng = np.random.default_rng(8)
    sr, win, hop, n_mels, n_mfcc = 16_000, 400, 160, 24, 13
    clips = [
        (0.4 * np.sin(2 * np.pi * 700 * np.arange(7000) / sr)).astype(np.float32),
        (rng.standard_normal(4800) * 0.2).astype(np.float32),
        np.zeros(win - 1, np.float32),
    ]
    batch = pa.table({
        "pcm": pa.array([c.tolist() for c in clips], pa.list_(pa.float32())),
        "sr_hz": pa.array([sr] * len(clips), pa.int32()),
    })
    out = audio_fbank(batch, n_mels=n_mels, n_mfcc=n_mfcc)
    assert "mfcc_mean" in out.column_names and "fbank_mean" not in out.column_names
    mean = np.asarray(out["mfcc_mean"].combine_chunks().flatten()) \
        .reshape(len(clips), n_mfcc)
    std = np.asarray(out["mfcc_std"].combine_chunks().flatten()) \
        .reshape(len(clips), n_mfcc)

    fb = _mel_filters(n_mels, win, sr)
    D = _dct2_ortho(n_mfcc, n_mels)
    # DCT matrix is orthonormal: D @ D.T == I on the kept rows
    np.testing.assert_allclose(D @ D.T, np.eye(n_mfcc), atol=1e-6)
    for i, x in enumerate(clips):
        if len(x) < win:
            assert not mean[i].any() and not std[i].any()
            continue
        k = (len(x) - win) // hop + 1
        frames = np.stack([x[j * hop:j * hop + win] for j in range(k)])
        frames = frames * np.hanning(win).astype(np.float32)
        p = np.abs(np.fft.rfft(frames, axis=1)) ** 2
        cep = np.log(p @ fb.T + 1e-10) @ D.T
        assert np.allclose(mean[i], cep.mean(axis=0), atol=1e-3), i
        assert np.allclose(std[i], cep.std(axis=0), atol=1e-3), i


def test_audio_pitch_recovers_synth_fundamental():
    """The ACF pitch tracker recovers every synth fundamental
    (f = 220 + (i % 64)·7 Hz, includes the 0.1-amplitude 3f harmonic)
    within 2 Hz at each native sample rate, flags silence unvoiced, and
    emits zero frames for sub-window clips."""
    import numpy as np
    import pyarrow as pa

    from hydra_ray.audio import synth_wave
    from hydra_ray.stages.audio_features import audio_pitch

    rows, exp, srs = [], [], []
    for i in range(64):
        sr = (8000, 16000, 22050, 44100)[i % 4]   # mixed rates in ONE batch
        rows.append(synth_wave(i, sr, 500))
        exp.append(220.0 + (i % 64) * 7.0)
        srs.append(sr)
    rows.append(np.zeros(8000, np.float32)); exp.append(None); srs.append(16000)
    rows.append(np.ones(10, np.float32)); exp.append(None); srs.append(16000)
    t = pa.table({
        "pcm": pa.array([r.tolist() for r in rows], pa.large_list(pa.float32())),
        "sr_hz": pa.array(srs, pa.int32()),
    })
    out = audio_pitch(t)
    f0 = out["f0_hz"].to_numpy()
    vr = out["voiced_ratio"].to_numpy()
    nf = out["n_frames"].to_numpy()
    for i, e in enumerate(exp[:64]):
        assert abs(f0[i] - e) < 2.0, (i, f0[i], e)
        assert vr[i] > 0.9, (i, vr[i])
    assert vr[64] == 0.0 and f0[64] == 0.0        # silence: unvoiced
    assert nf[65] == 0 and f0[65] == 0.0          # sub-window clip

    # batch-composition independence: a single-clip batch gives the
    # same answer as the mixed batch (per-rate recursion is pure)
    one = audio_pitch(t.slice(3, 1))
    assert one["f0_hz"][0].as_py() == f0[3]


def test_audio_search_finds_exact_duplicates(ray_session):
    """q_audio_search: each probe's synth-period duplicates (period 192
    over 600 clips → 3-4 exact copies) rank at the top with cosine ≈ 1,
    and every probe returns exactly k=5 ranked rows."""
    from hydra_ray.pipelines.batch_queries import q_audio_search

    out = q_audio_search("/root/testdata/sf0.001").to_pandas()
    assert set(out["query_id"]) == {5, 100, 201}
    for qid, g in out.groupby("query_id"):
        g = g.sort_values("rank")
        assert list(g["rank"]) == [1, 2, 3, 4, 5]
        dup_seqs = set(range(int(qid) % 192, 600, 192))
        top = g.head(len(dup_seqs))
        # the exact duplicates (same synth wave) fill the top ranks
        assert set(top["seq"]) == dup_seqs
        assert (top["cosine"] > 0.999_999).all()
        # and non-duplicates score strictly below
        rest = g.iloc[len(dup_seqs):]
        assert (rest["cosine"] < 0.999_999).all()
