"""BS.1770-style programme loudness + loudness normalization.

The audio-curation gain stage a training pipeline runs before feature
extraction: measure each clip's gated loudness, then scale it to a
target (classic −23 LUFS broadcast target by default) so model inputs
share a level.  Beyond-reference (the reference has no audio DSP); the
measurement follows the PUBLIC ITU-R BS.1770-4 recipe:

* 400 ms gating blocks, 75 % overlap (100 ms hop);
* K-weighting — here evaluated in the FREQUENCY domain: each block's
  power is its rfft power spectrum times |H1(f)|²·|H2(f)|² of the two
  published 48 kHz reference biquads, evaluated at absolute Hz (so the
  weighting curve is sample-rate independent).  By Parseval this equals
  the time-domain filtered block power up to windowing edge effects,
  and it VECTORIZES — the IIR recursion would serialize every sample;
* two-stage gating: blocks ≤ −70 LUFS drop (absolute gate), then blocks
  more than 10 LU below the absolute-gated mean drop (relative gate);
  programme loudness = −0.691 + 10·log10(mean power of survivors).

Everything is one frame-gather + one rfft + bincount folds across the
whole batch (the audio_features conventions); no per-clip Python.
Clips with no measurable block (shorter than 400 ms, or silence below
the absolute gate) report null loudness and pass through normalization
unchanged.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .audio_features import _flat_and_offsets

__all__ = ["loudness_lufs", "loudness_gate", "normalize_loudness",
           "LoudnessNormalizer"]

# ITU-R BS.1770-4 Table 1/2: the 48 kHz reference K-weighting biquads
# (stage 1 spherical-head shelf, stage 2 RLB high-pass)
_B1 = (1.53512485958697, -2.69169618940638, 1.19839281085285)
_A1 = (1.0, -1.69065929318241, 0.73248077421585)
_B2 = (1.0, -2.0, 1.0)
_A2 = (1.0, -1.99004745483398, 0.99007225036621)
_REF_SR = 48_000.0
_ABS_GATE_LUFS = -70.0
_REL_GATE_LU = 10.0
_OFFSET_LU = -0.691


def _biquad_mag_sq(w: np.ndarray, b, a) -> np.ndarray:
    """|H(e^{jw})|² of a biquad from its coefficient triples."""
    e1 = np.exp(-1j * w)
    e2 = np.exp(-2j * w)
    num = b[0] + b[1] * e1 + b[2] * e2
    den = a[0] + a[1] * e1 + a[2] * e2
    return (num.real**2 + num.imag**2) / (den.real**2 + den.imag**2)


def _k_weight_sq(freqs_hz: np.ndarray) -> np.ndarray:
    """Squared magnitude of the K-weighting chain at absolute Hz
    (reference-filter response; clamped at the 48 kHz Nyquist)."""
    f = np.minimum(np.asarray(freqs_hz, np.float64), _REF_SR / 2.0)
    w = 2.0 * np.pi * f / _REF_SR
    return _biquad_mag_sq(w, _B1, _A1) * _biquad_mag_sq(w, _B2, _A2)


def _gated_power(flat: np.ndarray, offsets: np.ndarray,
                 sr: float) -> tuple[np.ndarray, np.ndarray]:
    """(mean gated K-weighted power, n surviving blocks) per clip for
    one homogeneous-sample-rate subset."""
    n = len(offsets) - 1
    win = int(round(0.4 * sr))
    hop = int(round(0.1 * sr))
    lengths = np.diff(offsets)
    n_blocks = np.where(lengths >= win, (lengths - win) // hop + 1, 0)
    total = int(n_blocks.sum())
    power = np.zeros(n, np.float64)
    survivors = np.zeros(n, np.int64)
    if total == 0:
        return power, survivors

    blk_clip = np.repeat(np.arange(n, dtype=np.int64), n_blocks)
    run_starts = np.zeros(n, dtype=np.int64)
    np.cumsum(n_blocks[:-1], out=run_starts[1:])
    pos = (np.arange(total, dtype=np.int64)
           - run_starts[blk_clip]) * hop + offsets[blk_clip]
    frames = flat[pos[:, None] + np.arange(win)].astype(np.float64)
    spec = np.fft.rfft(frames, axis=1)
    pw = spec.real**2 + spec.imag**2
    wk = _k_weight_sq(np.fft.rfftfreq(win, 1.0 / sr))
    # Parseval fold of the one-sided spectrum: interior bins count twice
    scale = np.full(win // 2 + 1, 2.0)
    scale[0] = 1.0
    if win % 2 == 0:
        scale[-1] = 1.0
    z = (pw * (wk * scale)).sum(axis=1) / (win * win)  # block mean square

    lb = _OFFSET_LU + 10.0 * np.log10(np.maximum(z, 1e-30))
    m1 = lb > _ABS_GATE_LUFS
    c1 = np.bincount(blk_clip[m1], minlength=n)
    s1 = np.bincount(blk_clip[m1], weights=z[m1], minlength=n)
    with np.errstate(divide="ignore", invalid="ignore"):
        mean1 = np.where(c1 > 0, s1 / np.maximum(c1, 1), 0.0)
        rel_thr = _OFFSET_LU + 10.0 * np.log10(
            np.maximum(mean1, 1e-30)) - _REL_GATE_LU
    m2 = m1 & (lb > rel_thr[blk_clip]) & (c1[blk_clip] > 0)
    survivors = np.bincount(blk_clip[m2], minlength=n)
    s2 = np.bincount(blk_clip[m2], weights=z[m2], minlength=n)
    power = np.where(survivors > 0, s2 / np.maximum(survivors, 1), 0.0)
    return power, survivors


def loudness_lufs(batch: pa.Table, pcm_col: str = "pcm",
                  sr_col: str = "sr_hz",
                  out_col: str = "lufs") -> pa.Table:
    """Append gated programme loudness (float64 LUFS; null when the clip
    has no surviving gating block).  Mixed sample rates are processed
    per rate subset and scattered back (per-clip results are a pure
    function of the clip)."""
    n = batch.num_rows
    if n == 0:
        return batch.append_column(out_col, pa.array([], pa.float64()))
    srs = batch[sr_col].to_numpy(zero_copy_only=False)
    flat, offsets = _flat_and_offsets(batch[pcm_col])
    power = np.zeros(n, np.float64)
    surv = np.zeros(n, np.int64)
    for sr_v in np.unique(srs):
        idx = np.flatnonzero(srs == sr_v)
        lens = np.diff(offsets)[idx]
        sub_off = np.r_[0, np.cumsum(lens)]
        sub_flat = np.concatenate(
            [flat[offsets[i]:offsets[i + 1]] for i in idx]
        ) if len(idx) < n else flat
        p, s = _gated_power(sub_flat, sub_off, float(sr_v))
        power[idx], surv[idx] = p, s
    lufs = _OFFSET_LU + 10.0 * np.log10(np.maximum(power, 1e-30))
    return batch.append_column(
        out_col, pa.array(lufs, pa.float64(), mask=surv == 0))


def normalize_loudness(batch: pa.Table, target_lufs: float = -23.0,
                       pcm_col: str = "pcm", sr_col: str = "sr_hz",
                       max_gain_db: float = 40.0) -> pa.Table:
    """Scale every measurable clip to ``target_lufs``: gain (dB) =
    target − measured, clamped to ±``max_gain_db`` (a silence-adjacent
    clip would otherwise get a huge boost), samples clipped into
    [−1, 1] after scaling.  Unmeasurable clips pass through at 0 dB.
    Appends ``lufs`` (pre-gain, null when unmeasurable) and ``gain_db``;
    rewrites ``pcm``."""
    batch = loudness_lufs(batch, pcm_col, sr_col)
    n = batch.num_rows
    if n == 0:
        return batch.append_column("gain_db", pa.array([], pa.float64()))
    lufs = batch["lufs"].to_numpy(zero_copy_only=False)
    measurable = ~np.isnan(lufs)
    gain_db = np.zeros(n, np.float64)
    gain_db[measurable] = np.clip(
        target_lufs - lufs[measurable], -max_gain_db, max_gain_db)
    flat, offsets = _flat_and_offsets(batch[pcm_col])
    g = np.repeat((10.0 ** (gain_db / 20.0)).astype(np.float32),
                  np.diff(offsets))
    scaled = np.clip(flat * g, -1.0, 1.0).astype(np.float32)
    pcm = pa.LargeListArray.from_arrays(
        pa.array(offsets, pa.int64()), pa.array(scaled, pa.float32()))
    i_pcm = batch.schema.get_field_index(pcm_col)
    return batch.set_column(i_pcm, pcm_col, pcm).append_column(
        "gain_db", pa.array(gain_db, pa.float64()))


class LoudnessNormalizer:
    """Actor-pool form for long pipelines (state-free; kept for symmetry
    with Resampler/FbankFeatures so map_batches callsites read alike)."""

    def __init__(self, target_lufs: float = -23.0, pcm_col: str = "pcm",
                 sr_col: str = "sr_hz"):
        self.target_lufs = target_lufs
        self.pcm_col = pcm_col
        self.sr_col = sr_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        return normalize_loudness(
            batch, self.target_lufs, self.pcm_col, self.sr_col)


def loudness_gate(min_lufs: float = -50.0, max_lufs: float | None = None,
                  keep_unmeasurable: bool = False,
                  pcm_col: str = "pcm", sr_col: str = "sr_hz"):
    """``ReplicateConfig(payload_filter=...)`` factory: keep clips whose
    gated programme loudness lies in ``[min_lufs, max_lufs]``.
    Unmeasurable clips (shorter than one gating block, or everything
    below the absolute gate — i.e. near-silence) drop by default.
    Deterministic (pure function of the PCM), so ingest replay after a
    crash re-derives the identical drop set."""

    def gate(batch: pa.Table) -> np.ndarray:
        out = loudness_lufs(batch.select([pcm_col, sr_col]),
                            pcm_col, sr_col)
        lufs = out["lufs"].to_numpy(zero_copy_only=False)
        meas = ~np.isnan(lufs)
        keep = np.where(meas, lufs >= min_lufs, keep_unmeasurable)
        if max_lufs is not None:
            keep = keep & np.where(meas, lufs <= max_lufs,
                                   keep_unmeasurable)
        return keep.astype(bool)

    return gate
