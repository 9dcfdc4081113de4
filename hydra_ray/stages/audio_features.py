"""Audio feature extraction over decoded PCM columns (vectorized).

The per-clip analysis stage a training-data pipeline runs after decode:
RMS energy, peak amplitude, zero-crossing rate, clipping ratio, and a
crude dominant-frequency estimate — all computed from the Arrow
``large_list<float32>`` PCM column without per-row Python numerics:
one flat buffer view + ``np.*.reduceat`` over the list offsets.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["audio_features", "AudioFeatures"]


def _flat_and_offsets(col) -> tuple[np.ndarray, np.ndarray]:
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    offsets = np.asarray(arr.offsets.to_numpy(zero_copy_only=False), dtype=np.int64)
    return flat, offsets


def audio_features(batch: pa.Table, pcm_col: str = "pcm", sr_col: str = "sr_hz") -> pa.Table:
    n = batch.num_rows
    if n == 0:
        for name in ("rms", "peak", "zero_cross_rate", "clip_ratio", "dom_freq_hz"):
            batch = batch.append_column(name, pa.array([], pa.float64()))
        return batch
    flat, offsets = _flat_and_offsets(batch[pcm_col])
    starts = offsets[:-1]
    counts = (offsets[1:] - offsets[:-1]).astype(np.float64)
    safe = np.maximum(counts, 1.0)

    sq_sum = np.add.reduceat(flat * flat, np.minimum(starts, max(len(flat) - 1, 0)))
    sq_sum = np.where(counts > 0, sq_sum, 0.0)
    rms = np.sqrt(sq_sum / safe)

    absf = np.abs(flat)
    peak = np.maximum.reduceat(absf, np.minimum(starts, max(len(absf) - 1, 0)))
    peak = np.where(counts > 0, peak, 0.0)

    # zero crossings: sign change counts per segment
    sign = np.signbit(flat)
    change = np.empty(len(flat), dtype=np.float64)
    change[0] = 0.0
    if len(flat) > 1:
        change[1:] = (sign[1:] != sign[:-1]).astype(np.float64)
    change[starts] = 0.0  # don't count across row boundaries
    zc = np.add.reduceat(change, np.minimum(starts, max(len(change) - 1, 0)))
    zc_rate = np.where(counts > 1, zc / safe, 0.0)

    clip_ratio = np.add.reduceat((absf >= 0.999).astype(np.float64), np.minimum(starts, max(len(absf) - 1, 0)))
    clip_ratio = np.where(counts > 0, clip_ratio / safe, 0.0)

    # dominant frequency ≈ zero-crossing rate × sr / 2 (two crossings per cycle)
    sr = batch[sr_col].to_numpy(zero_copy_only=False).astype(np.float64)
    dom = zc_rate * sr / 2.0

    for name, vals in (
        ("rms", rms),
        ("peak", peak),
        ("zero_cross_rate", zc_rate),
        ("clip_ratio", clip_ratio),
        ("dom_freq_hz", dom),
    ):
        batch = batch.append_column(name, pa.array(vals, pa.float64()))
    return batch


class AudioFeatures:
    """Callable form for ``map_batches`` actor pools."""

    def __init__(self, pcm_col: str = "pcm", sr_col: str = "sr_hz"):
        self.pcm_col = pcm_col
        self.sr_col = sr_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        return audio_features(batch, self.pcm_col, self.sr_col)
