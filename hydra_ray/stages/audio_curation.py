"""Audio curation operators: FFT spectral features, resampling, energy
VAD segmentation.

The curation stages a speech/audio training-data pipeline runs after
decode: real spectral statistics (the FFT-based complement to the
time-domain proxies in `audio_features.py`), sample-rate normalization,
and voice-activity segmentation for clip trimming.  All three follow the
repo's PCM kernel conventions: one flat float32 buffer view over the
Arrow ``large_list<float32>`` column + offsets, arange/repeat index
math, no per-row Python numerics (`_flat_and_offsets`, reduceat
boundaries).  Reference has no audio analysis at all (payloads are
opaque Avro byte strings, `avro/src/main/java/com/pluralsight/hydra/
avro/JsonConverter.java`); these are beyond-reference components of the
audio graft cell.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .audio_features import _flat_and_offsets

__all__ = ["spectral_features", "SpectralFeatures", "resample_clips",
           "Resampler", "vad_segments", "VadSegments", "trim_silence",
           "TrimSilence", "chunk_audio", "ChunkAudio"]


# ----------------------------------------------------------- spectral
_HANN: dict = {}


def _hann(n: int) -> np.ndarray:
    w = _HANN.get(n)
    if w is None:
        w = (0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n) / n)).astype(np.float32)
        _HANN[n] = w
    return w


def spectral_features(batch: pa.Table, pcm_col: str = "pcm",
                      sr_col: str = "sr_hz", frame: int = 1024,
                      hop: int = 512) -> pa.Table:
    """Per-clip mean spectral centroid / bandwidth / 85%-rolloff (Hz) and
    spectral flatness from Hann-windowed rFFT frames.

    ALL clips' frames form one (n_frames, frame) gather + ONE rfft call;
    per-clip means come from ``reduceat`` over frame-count boundaries.
    Clips shorter than one frame emit NULL features.
    """
    out_names = ("spec_centroid_hz", "spec_bandwidth_hz",
                 "spec_rolloff_hz", "spec_flatness")
    n = batch.num_rows
    if n == 0:
        for name in out_names:
            batch = batch.append_column(name, pa.array([], pa.float64()))
        return batch

    flat, offsets = _flat_and_offsets(batch[pcm_col])
    lens = offsets[1:] - offsets[:-1]
    nframes = np.maximum((lens - frame) // hop + 1, 0)
    total = int(nframes.sum())
    sr = batch[sr_col].to_numpy(zero_copy_only=False).astype(np.float64)

    feats = np.full((n, 4), np.nan)
    if total > 0:
        fstarts = (
            np.repeat(offsets[:-1], nframes)
            + (np.arange(total) - np.repeat(np.cumsum(nframes) - nframes, nframes))
            * hop
        )
        X = flat[fstarts[:, None] + np.arange(frame)[None, :]] * _hann(frame)
        mag = np.abs(np.fft.rfft(X, axis=1)).astype(np.float64)
        k = np.arange(mag.shape[1], dtype=np.float64)
        tot = mag.sum(axis=1)
        safe = np.maximum(tot, 1e-30)
        cent_bin = (mag * k).sum(axis=1) / safe
        bw_bin = np.sqrt((mag * (k - cent_bin[:, None]) ** 2).sum(axis=1) / safe)
        cum = np.cumsum(mag, axis=1)
        roll_bin = np.argmax(cum >= 0.85 * tot[:, None], axis=1).astype(np.float64)
        flatness = np.exp(np.mean(np.log(mag + 1e-12), axis=1)) / (
            mag.mean(axis=1) + 1e-12
        )

        # mean over each clip's frames (bincount handles zero-frame clips
        # exactly, unlike reduceat), then bins → Hz with the clip's sr
        has = nframes > 0
        cnt = np.maximum(nframes, 1).astype(np.float64)
        frame_clip = np.repeat(np.arange(n), nframes)
        for j, col in enumerate((cent_bin, bw_bin, roll_bin, flatness)):
            m = np.bincount(frame_clip, weights=col, minlength=n) / cnt
            if j < 3:
                m = m * (sr / frame)  # bin → Hz
            feats[:, j] = np.where(has, m, np.nan)

    for j, name in enumerate(out_names):
        batch = batch.append_column(name, pa.array(feats[:, j], pa.float64()))
    return batch


class SpectralFeatures:
    """Actor/task-pool wrapper (Hann table + FFT plan warm per worker)."""

    def __init__(self, pcm_col: str = "pcm", sr_col: str = "sr_hz",
                 frame: int = 1024, hop: int = 512):
        self.kw = dict(pcm_col=pcm_col, sr_col=sr_col, frame=frame, hop=hop)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return spectral_features(batch, **self.kw)


# ----------------------------------------------------------- resample
def resample_clips(batch: pa.Table, target_sr: int, pcm_col: str = "pcm",
                   sr_col: str = "sr_hz") -> pa.Table:
    """Linear-interpolation resample of every clip to ``target_sr``.

    Fully vectorized across clips: output sample positions come from one
    arange/repeat pass, the two neighbor gathers + lerp are single flat
    operations.  Output length = round(len·target/sr) per clip; the
    ``sr_hz`` column is rewritten.  Linear interpolation is the standard
    cheap resampler (alias-prone above Nyquist/2 of the coarser rate —
    callers doing hi-fi downsampling should low-pass first)."""
    n = batch.num_rows
    i_sr = batch.schema.get_field_index(sr_col)
    if n == 0:
        return batch
    flat, offsets = _flat_and_offsets(batch[pcm_col])
    lens = offsets[1:] - offsets[:-1]
    sr = batch[sr_col].to_numpy(zero_copy_only=False).astype(np.float64)
    out_lens = np.where(
        sr == target_sr, lens,
        np.round(lens * (float(target_sr) / sr)).astype(np.int64),
    ).astype(np.int64)
    out_lens = np.where(lens == 0, 0, out_lens)
    total = int(out_lens.sum())
    out_off = np.r_[0, np.cumsum(out_lens)]

    j = np.arange(total, dtype=np.float64) - np.repeat(
        out_off[:-1].astype(np.float64), out_lens
    )
    ratio = np.repeat(sr / float(target_sr), out_lens)
    t = j * ratio
    last = np.repeat(np.maximum(lens - 1, 0), out_lens).astype(np.float64)
    np.minimum(t, last, out=t)
    idx0 = t.astype(np.int64)
    frac = (t - idx0).astype(np.float32)
    base = np.repeat(offsets[:-1], out_lens)
    i0 = base + idx0
    i1 = np.minimum(i0 + 1, np.repeat(offsets[1:], out_lens) - 1)
    res = flat[i0] * (np.float32(1.0) - frac) + flat[i1] * frac

    pcm = pa.LargeListArray.from_arrays(
        pa.array(out_off, pa.int64()), pa.array(res, pa.float32())
    )
    i_pcm = batch.schema.get_field_index(pcm_col)
    batch = batch.set_column(i_pcm, pcm_col, pcm)
    return batch.set_column(
        i_sr, sr_col, pa.array(np.full(n, target_sr, np.int32), pa.int32())
    )


class Resampler:
    def __init__(self, target_sr: int, pcm_col: str = "pcm",
                 sr_col: str = "sr_hz"):
        self.target_sr = target_sr
        self.pcm_col = pcm_col
        self.sr_col = sr_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        return resample_clips(batch, self.target_sr, self.pcm_col, self.sr_col)


# ----------------------------------------------------------- VAD
def vad_segments(batch: pa.Table, id_col: str, pcm_col: str = "pcm",
                 sr_col: str = "sr_hz", frame_ms: int = 20,
                 thresh_db: float = -35.0, hang_frames: int = 2) -> pa.Table:
    """Energy VAD: explode each clip into active segments
    ``(id, seg, start_ms, end_ms)``.

    Non-overlapping ``frame_ms`` frames; a frame is active when its RMS
    exceeds ``thresh_db`` dBFS; active runs are extended ``hang_frames``
    frames forward (hangover) before run extraction.  One reduceat over
    all clips' frames; run boundaries come from one diff pass over the
    flat frame mask with clip breaks."""
    n = batch.num_rows

    def _empty() -> pa.Table:
        return pa.table({
            id_col: batch[id_col].combine_chunks().slice(0, 0)
            if n else pa.array([], batch.schema.field(id_col).type),
            "seg": pa.array([], pa.int32()),
            "start_ms": pa.array([], pa.int64()),
            "end_ms": pa.array([], pa.int64()),
        })

    if n == 0:
        return _empty()

    flat, offsets = _flat_and_offsets(batch[pcm_col])
    lens = offsets[1:] - offsets[:-1]
    sr = batch[sr_col].to_numpy(zero_copy_only=False).astype(np.int64)
    flen = np.maximum(sr * frame_ms // 1000, 1)
    nframes = -(-lens // flen)  # ceil; tail frame may be short

    total = int(nframes.sum())
    if total == 0:
        return _empty()
    clip_of = np.repeat(np.arange(n), nframes)
    local = np.arange(total) - np.repeat(np.cumsum(nframes) - nframes, nframes)
    fstart = offsets[:-1][clip_of] + local * flen[clip_of]
    fcnt = np.minimum(flen[clip_of], offsets[1:][clip_of] - fstart).astype(np.float64)

    sq = (flat.astype(np.float32)) ** 2
    e = np.add.reduceat(sq, np.minimum(fstart, max(len(flat) - 1, 0)),
                        dtype=np.float64)
    rms = np.sqrt(e / np.maximum(fcnt, 1.0))
    active = rms > 10.0 ** (thresh_db / 20.0)

    # hangover: OR with up-to-hang_frames previous frames, clip-bounded
    ext = active.copy()
    for s in range(1, hang_frames + 1):
        shifted = np.zeros(total, dtype=bool)
        shifted[s:] = active[:-s]
        same = np.zeros(total, dtype=bool)
        same[s:] = clip_of[s:] == clip_of[:-s]
        ext |= shifted & same
    active = ext

    brk = np.r_[True, clip_of[1:] != clip_of[:-1]]
    rise = active & (np.r_[False, ~active[:-1]] | brk)
    fall = active & (np.r_[~active[1:], True] | np.r_[brk[1:], True])
    si, ei = np.flatnonzero(rise), np.flatnonzero(fall)
    if len(si) == 0:
        return _empty()
    cseg = clip_of[si]
    # per-clip segment index: rank within run of equal clip ids
    first = np.r_[True, cseg[1:] != cseg[:-1]]
    seg_idx = np.arange(len(cseg)) - np.maximum.accumulate(
        np.where(first, np.arange(len(cseg)), 0)
    )
    start_ms = (local[si] * flen[cseg] * 1000) // np.maximum(sr[cseg], 1)
    end_frame_end = np.minimum((local[ei] + 1) * flen[cseg], lens[cseg])
    end_ms = (end_frame_end * 1000) // np.maximum(sr[cseg], 1)

    ids = batch[id_col].take(pa.array(cseg, pa.int64()))
    return pa.table({
        id_col: ids,
        "seg": pa.array(seg_idx.astype(np.int32), pa.int32()),
        "start_ms": pa.array(start_ms.astype(np.int64), pa.int64()),
        "end_ms": pa.array(end_ms.astype(np.int64), pa.int64()),
    })


def trim_silence(batch: pa.Table, pcm_col: str = "pcm", sr_col: str = "sr_hz",
                 frame_ms: int = 20, thresh_db: float = -35.0) -> pa.Table:
    """Trim leading/trailing silence per clip: keep the span from the
    first to the last frame whose RMS exceeds ``thresh_db`` dBFS (frame
    granularity, clamped to the clip).  Fully-silent clips keep zero
    samples.  Replaces ``pcm_col`` and appends ``trimmed_ms`` (samples
    removed, in ms).  Same one-reduceat frame-energy pass as
    ``vad_segments``; the kept spans gather through a single
    arange/repeat index — no per-clip Python.
    """
    n = batch.num_rows
    if n == 0:
        return batch.append_column("trimmed_ms", pa.array([], pa.int64()))

    flat, offsets = _flat_and_offsets(batch[pcm_col])
    lens = offsets[1:] - offsets[:-1]
    sr = batch[sr_col].to_numpy(zero_copy_only=False).astype(np.int64)
    flen = np.maximum(sr * frame_ms // 1000, 1)
    nframes = np.maximum(-(-lens // flen), 0)
    total = int(nframes.sum())
    lo = np.zeros(n, dtype=np.int64)     # first kept sample (per clip)
    hi = np.zeros(n, dtype=np.int64)     # one past last kept sample
    if total:
        clip_of = np.repeat(np.arange(n), nframes)
        local = np.arange(total) - np.repeat(np.cumsum(nframes) - nframes, nframes)
        fstart = offsets[:-1][clip_of] + local * flen[clip_of]
        fcnt = np.minimum(flen[clip_of], offsets[1:][clip_of] - fstart).astype(np.float64)
        sq = (flat.astype(np.float32)) ** 2
        e = np.add.reduceat(sq, np.minimum(fstart, max(len(flat) - 1, 0)),
                            dtype=np.float64)
        rms = np.sqrt(e / np.maximum(fcnt, 1.0))
        active = rms > 10.0 ** (thresh_db / 20.0)
        act_clip = clip_of[active]
        act_local = local[active]
        if len(act_clip):
            first = np.r_[True, act_clip[1:] != act_clip[:-1]]
            firsts = np.flatnonzero(first)
            lasts = np.r_[firsts[1:] - 1, len(act_clip) - 1]
            cc = act_clip[firsts]
            lo[cc] = act_local[firsts] * flen[cc]
            hi[cc] = np.minimum((act_local[lasts] + 1) * flen[cc], lens[cc])
    keep = hi - lo
    cum = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(keep, out=cum[1:])
    pos = (np.arange(cum[-1]) - np.repeat(cum[:-1], keep)
           + np.repeat(offsets[:-1] + lo, keep))
    values = flat[pos] if cum[-1] else flat[:0]
    trimmed = pa.LargeListArray.from_arrays(
        pa.array(cum, pa.int64()), pa.array(values, pa.float32())
    )
    trimmed_ms = ((lens - keep) * 1000) // np.maximum(sr, 1)
    i = batch.column_names.index(pcm_col)
    out = batch.set_column(i, pcm_col, trimmed)
    return out.append_column("trimmed_ms", pa.array(trimmed_ms, pa.int64()))


class TrimSilence:
    def __init__(self, pcm_col: str = "pcm", sr_col: str = "sr_hz",
                 frame_ms: int = 20, thresh_db: float = -35.0):
        self.kw = dict(pcm_col=pcm_col, sr_col=sr_col, frame_ms=frame_ms,
                       thresh_db=thresh_db)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return trim_silence(batch, **self.kw)


def chunk_audio(batch: pa.Table, id_col: str, pcm_col: str = "pcm",
                sr_col: str = "sr_hz", win_ms: int = 250,
                hop_ms: int = 125) -> pa.Table:
    """Explode clips into overlapping fixed-duration PCM windows for
    batched feature/embedding extraction — the audio analogue of
    ``text.chunk_tokens``.  Output: ``(id, chunk, start_ms, pcm)`` with
    ``win_ms`` windows every ``hop_ms`` (the tail window is truncated;
    clips shorter than one hop emit one window).  One arange/repeat
    index gather over the flat PCM buffer; no per-clip Python.
    """
    n = batch.num_rows
    if n == 0:
        return pa.table({
            id_col: batch[id_col].combine_chunks().slice(0, 0),
            "chunk": pa.array([], pa.int32()),
            "start_ms": pa.array([], pa.int64()),
            pcm_col: pa.array([], pa.large_list(pa.float32())),
        })
    flat, offsets = _flat_and_offsets(batch[pcm_col])
    lens = offsets[1:] - offsets[:-1]
    sr = batch[sr_col].to_numpy(zero_copy_only=False).astype(np.int64)
    win = np.maximum(sr * win_ms // 1000, 1)
    hop = np.maximum(sr * hop_ms // 1000, 1)
    nchunks = np.where(lens > 0, np.maximum(-(-(lens - win) // hop) + 1, 1), 0)
    total = int(nchunks.sum())
    clip_of = np.repeat(np.arange(n), nchunks)
    local = np.arange(total) - np.repeat(np.cumsum(nchunks) - nchunks, nchunks)
    cstart = local * hop[clip_of]
    # hop > win can push the final start past the clip end; clamp to zero
    clen = np.maximum(np.minimum(win[clip_of], lens[clip_of] - cstart), 0)
    cum = np.zeros(total + 1, dtype=np.int64)
    np.cumsum(clen, out=cum[1:])
    pos = (np.arange(cum[-1]) - np.repeat(cum[:-1], clen)
           + np.repeat(offsets[:-1][clip_of] + cstart, clen))
    values = flat[pos] if cum[-1] else flat[:0]
    chunks = pa.LargeListArray.from_arrays(
        pa.array(cum, pa.int64()), pa.array(values, pa.float32())
    )
    start_ms = (cstart * 1000) // np.maximum(sr[clip_of], 1)
    return pa.table({
        id_col: batch[id_col].take(pa.array(clip_of, pa.int64())),
        "chunk": pa.array(local.astype(np.int32), pa.int32()),
        "start_ms": pa.array(start_ms, pa.int64()),
        pcm_col: chunks,
    })


class ChunkAudio:
    def __init__(self, id_col: str, pcm_col: str = "pcm",
                 sr_col: str = "sr_hz", win_ms: int = 250, hop_ms: int = 125):
        self.id_col = id_col
        self.kw = dict(pcm_col=pcm_col, sr_col=sr_col, win_ms=win_ms,
                       hop_ms=hop_ms)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return chunk_audio(batch, self.id_col, **self.kw)


class VadSegments:
    def __init__(self, id_col: str, pcm_col: str = "pcm",
                 sr_col: str = "sr_hz", frame_ms: int = 20,
                 thresh_db: float = -35.0, hang_frames: int = 2):
        self.kw = dict(pcm_col=pcm_col, sr_col=sr_col, frame_ms=frame_ms,
                       thresh_db=thresh_db, hang_frames=hang_frames)
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        return vad_segments(batch, self.id_col, **self.kw)
