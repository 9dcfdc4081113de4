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


# Per-worker-process scratch buffers, keyed by dtype.  Every fresh numpy
# allocation on this host pays lazy-restore first-touch page faults
# (~180 µs/page, CLAUDE.md), so the kernel's full-width temporaries reuse
# one warm buffer per dtype across calls.  Safe: Ray task/actor workers
# run one batch at a time per process.
_SCRATCH: dict = {}


def _scratch(n: int, dtype) -> np.ndarray:
    key = np.dtype(dtype).str
    buf = _SCRATCH.get(key)
    if buf is None or len(buf) < n:
        buf = np.empty(max(int(n * 5 // 4), 1024), dtype)
        _SCRATCH[key] = buf
    return buf[:n]


def _flat_and_offsets(col) -> tuple[np.ndarray, np.ndarray]:
    """Zero-copy float32 view of the flattened PCM + row offsets.

    Stays float32 throughout: casting 10⁸ samples to float64 would double
    the traffic of every subsequent pass for no feature-level benefit."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat = arr.flatten().to_numpy(zero_copy_only=False)
    offsets = np.asarray(arr.offsets.to_numpy(zero_copy_only=False), dtype=np.int64)
    return flat, offsets


def audio_features(batch: pa.Table, pcm_col: str = "pcm", sr_col: str = "sr_hz") -> pa.Table:
    n = batch.num_rows
    if n == 0:
        for name in ("rms", "peak", "zero_cross_rate", "clip_ratio", "dom_freq_hz"):
            batch = batch.append_column(name, pa.array([], pa.float64()))
        return batch
    flat, offsets = _flat_and_offsets(batch[pcm_col])
    starts = np.minimum(offsets[:-1], max(len(flat) - 1, 0))
    counts = (offsets[1:] - offsets[:-1]).astype(np.float64)
    safe = np.maximum(counts, 1.0)

    # float32 intermediates throughout: ~3 single-width passes total
    # instead of ~6 double-width ones (this kernel is memory-bound), and
    # every temporary lives in a reused per-worker scratch buffer
    nf = len(flat)
    work = _scratch(nf, np.float32)
    mask = _scratch(nf, np.bool_)

    np.multiply(flat, flat, out=work)
    sq_sum = np.add.reduceat(work, starts, dtype=np.float64)
    sq_sum = np.where(counts > 0, sq_sum, 0.0)
    rms = np.sqrt(sq_sum / safe)

    np.abs(flat, out=work)  # |pcm| — feeds both peak and the clip mask
    peak = np.maximum.reduceat(work, starts).astype(np.float64)
    peak = np.where(counts > 0, peak, 0.0)

    np.greater_equal(work, np.float32(0.999), out=mask)
    clip_ratio = np.add.reduceat(
        mask.view(np.uint8), starts, dtype=np.int64
    ).astype(np.float64)
    clip_ratio = np.where(counts > 0, clip_ratio / safe, 0.0)

    # zero crossings: sign change counts per segment (uint8 mask pass)
    np.signbit(flat, out=mask)
    change = _scratch(nf, np.uint8)
    if nf > 1:
        np.not_equal(mask[1:], mask[:-1], out=change[1:])
    if nf > 0:
        change[0] = 0
    change[starts] = 0  # don't count across row boundaries
    zc = np.add.reduceat(change, starts, dtype=np.int64).astype(np.float64)
    zc_rate = np.where(counts > 1, zc / safe, 0.0)

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
