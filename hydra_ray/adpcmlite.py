"""Pure-spec IMA/DVI ADPCM codec (WAV format tag 0x0011, mono, 4-bit).

Implements the published IMA ADPCM algorithm (IMA Digital Audio Focus
and Technical Working Groups, "Recommended Practices for Enhancing
Digital Audio Compatibility in Multimedia Systems", rev 3.00, 1992 —
the step-size/index tables and the decode recurrence) inside the
standard RIFF/WAVE container for tag 0x0011 (fmt with wSamplesPerBlock
extension + fact chunk carrying the true sample count; data chunk =
independent fixed-size blocks, each led by a 4-byte state header).

The reference engine treats codecs as per-record payload decoders
(`KafkaClientAlgebra.scala:354-378` Either-routing); like `flaclite` /
`jpeglite` / `pnglite` this is an original from-spec implementation —
no third-party codec library exists in the sandbox.

Vectorization: blocks are independent (each header carries predictor +
step index), so BOTH directions run the per-sample recurrence in
lockstep ACROSS blocks — the sequential loop is ``samples_per_block``
iterations of ~10 numpy ops over an (n_blocks,) state vector, never a
Python loop over samples × blocks.  A batch-level helper concatenates
every clip's blocks first, so the lockstep width is the whole batch.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_adpcm", "decode_adpcm", "AdpcmError",
           "BLOCK_ALIGN", "SAMPLES_PER_BLOCK"]


class AdpcmError(ValueError):
    """Malformed or unsupported ADPCM payload (DLQ-routed upstream)."""


# IMA 1992 rev 3.00 tables (public spec)
STEP_TABLE = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
], dtype=np.int32)

INDEX_TABLE = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32)

BLOCK_ALIGN = 256                        # bytes per block (standard mono)
SAMPLES_PER_BLOCK = (BLOCK_ALIGN - 4) * 2 + 1   # 505


def _clamp16(x: np.ndarray) -> np.ndarray:
    return np.clip(x, -32768, 32767, out=x)


def _decode_nibbles(pred: np.ndarray, idx: np.ndarray,
                    nib: np.ndarray) -> np.ndarray:
    """Lockstep IMA decode: ``nib`` is (n_blocks, n_steps) uint8 4-bit
    codes, ``pred``/``idx`` the per-block header state.  Returns
    (n_blocks, n_steps) int16-range int32 samples."""
    n_blocks, n_steps = nib.shape
    out = np.empty((n_blocks, n_steps), dtype=np.int32)
    pred = pred.astype(np.int32).copy()
    idx = idx.astype(np.int32).copy()
    for t in range(n_steps):
        d = nib[:, t].astype(np.int32)
        step = STEP_TABLE[idx]
        diff = step >> 3
        diff += np.where(d & 4, step, 0)
        diff += np.where(d & 2, step >> 1, 0)
        diff += np.where(d & 1, step >> 2, 0)
        pred += np.where(d & 8, -diff, diff)
        _clamp16(pred)
        idx += INDEX_TABLE[d & 7]
        np.clip(idx, 0, 88, out=idx)
        out[:, t] = pred
    return out


def _encode_samples(pred: np.ndarray, idx: np.ndarray,
                    samples: np.ndarray) -> np.ndarray:
    """Lockstep IMA encode: quantize (n_blocks, n_steps) int32 samples
    against the evolving per-block predictor; returns the nibble codes.
    Uses the spec's decoder-mirrored reconstruction so encoder and
    decoder predictors never drift."""
    n_blocks, n_steps = samples.shape
    nib = np.empty((n_blocks, n_steps), dtype=np.uint8)
    pred = pred.astype(np.int32).copy()
    idx = idx.astype(np.int32).copy()
    for t in range(n_steps):
        step = STEP_TABLE[idx]
        diff = samples[:, t] - pred
        sign = diff < 0
        ad = np.abs(diff)
        d = np.zeros(n_blocks, dtype=np.int32)
        m = ad >= step
        d |= m << 2
        ad -= np.where(m, step, 0)
        half = step >> 1
        m = ad >= half
        d |= m << 1
        ad -= np.where(m, half, 0)
        quarter = step >> 2
        m = ad >= quarter
        d |= m.astype(np.int32)
        # reconstruct exactly as the decoder will
        rec = step >> 3
        rec += np.where(d & 4, step, 0)
        rec += np.where(d & 2, half, 0)
        rec += np.where(d & 1, quarter, 0)
        pred += np.where(sign, -rec, rec)
        _clamp16(pred)
        d |= sign << 3
        nib[:, t] = d
        idx += INDEX_TABLE[d & 7]
        np.clip(idx, 0, 88, out=idx)
    return nib


def encode_adpcm(wave: np.ndarray, sr_hz: int) -> bytes:
    """float32 wave in [-1, 1] → RIFF/WAVE with wFormatTag=0x0011.

    Quantization to int16 is BIT-IDENTICAL to ``encode_pcm16`` (clip
    then multiply in the input's float32 — see CLAUDE.md's float-domain
    gotcha); each block's header stores its first sample verbatim and a
    zero step index, so blocks decode independently."""
    w = np.asarray(wave, dtype=np.float32)
    x = (np.clip(w, -1.0, 1.0) * np.float32(32767.0)).astype(np.int16)
    n = len(x)
    spb = SAMPLES_PER_BLOCK
    n_blocks = max(1, -(-n // spb))
    pad = n_blocks * spb - n
    xi = np.pad(x.astype(np.int32), (0, pad))  # zero-pad the tail block
    blocks = xi.reshape(n_blocks, spb)
    pred0 = blocks[:, 0]
    # seed each block's step index from its mean |first difference| —
    # the header may carry ANY index (the decoder honors it), and this
    # makes the quantizer adapt instantly instead of ramping from step 7
    mad = np.abs(np.diff(blocks, axis=1)).mean(axis=1)
    idx0 = np.clip(np.searchsorted(STEP_TABLE, mad), 0, 88).astype(np.int32)
    nib = _encode_samples(pred0, idx0, blocks[:, 1:])
    # pack: low nibble = earlier sample
    packed = (nib[:, 0::2] | (nib[:, 1::2] << 4)).astype(np.uint8)
    hdr = np.zeros((n_blocks, 4), dtype=np.uint8)
    hdr[:, 0] = pred0 & 0xFF
    hdr[:, 1] = (pred0 >> 8) & 0xFF
    hdr[:, 2] = idx0
    data = np.concatenate([hdr, packed], axis=1).tobytes()

    byte_rate = (sr_hz * BLOCK_ALIGN + spb - 1) // spb
    fmt = struct.pack("<HHIIHHHH", 0x0011, 1, sr_hz, byte_rate,
                      BLOCK_ALIGN, 4, 2, spb)
    fact = struct.pack("<I", n)
    riff = b"WAVE"
    riff += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    riff += b"fact" + struct.pack("<I", len(fact)) + fact
    riff += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def _parse_container(raw) -> tuple[int, int, memoryview]:
    """Parse the RIFF container → (sr_hz, n_samples, data bytes)."""
    mv = memoryview(raw)
    if len(mv) < 12 or bytes(mv[0:4]) != b"RIFF" or bytes(mv[8:12]) != b"WAVE":
        raise AdpcmError("not a RIFF/WAVE payload")
    pos = 12
    sr = n_samples = None
    data = None
    spb = None
    while pos + 8 <= len(mv):
        cid = bytes(mv[pos:pos + 4])
        (clen,) = struct.unpack_from("<I", mv, pos + 4)
        body = mv[pos + 8: pos + 8 + clen]
        if len(body) < clen:
            raise AdpcmError("truncated chunk")
        if cid == b"fmt ":
            if clen < 20:
                raise AdpcmError("fmt chunk too short for ADPCM")
            tag, ch, sr, _br, align, bits, _ext, spb = struct.unpack_from(
                "<HHIIHHHH", body, 0)
            if tag != 0x0011:
                raise AdpcmError(f"not IMA ADPCM (wFormatTag={tag:#06x})")
            if ch != 1:
                raise AdpcmError(f"only mono supported (channels={ch})")
            if bits != 4:
                raise AdpcmError(f"only 4-bit supported (bits={bits})")
            if align != BLOCK_ALIGN or spb != SAMPLES_PER_BLOCK:
                raise AdpcmError(
                    f"unsupported block layout align={align} spb={spb}")
        elif cid == b"fact":
            (n_samples,) = struct.unpack_from("<I", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)     # chunks are word-aligned
    if sr is None or data is None:
        raise AdpcmError("missing fmt or data chunk")
    if n_samples is None:
        raise AdpcmError("missing fact chunk (sample count)")
    if len(data) % BLOCK_ALIGN:
        raise AdpcmError("data chunk not a whole number of blocks")
    return sr, n_samples, data


def decode_adpcm(raw) -> tuple[np.ndarray, int]:
    """RIFF/WAVE IMA-ADPCM payload → (int16 samples, sr_hz)."""
    sr, n_samples, data = _parse_container(raw)
    buf = np.frombuffer(data, dtype=np.uint8)
    n_blocks = len(buf) // BLOCK_ALIGN
    if n_blocks * SAMPLES_PER_BLOCK < n_samples:
        raise AdpcmError("fact sample count exceeds data capacity")
    if n_blocks == 0:
        if n_samples:
            raise AdpcmError("fact sample count exceeds data capacity")
        return np.empty(0, dtype=np.int16), sr
    blocks = buf.reshape(n_blocks, BLOCK_ALIGN)
    pred0 = (blocks[:, 0].astype(np.int32)
             | (blocks[:, 1].astype(np.int32) << 8))
    pred0 = (pred0 ^ 0x8000) - 0x8000     # sign-extend int16
    idx0 = blocks[:, 2].astype(np.int32)
    if (idx0 > 88).any():
        raise AdpcmError("block step index out of range")
    packed = blocks[:, 4:]
    nib = np.empty((n_blocks, (BLOCK_ALIGN - 4) * 2), dtype=np.uint8)
    nib[:, 0::2] = packed & 0x0F
    nib[:, 1::2] = packed >> 4
    body = _decode_nibbles(pred0, idx0, nib)
    full = np.concatenate([pred0[:, None], body], axis=1).reshape(-1)
    return full[:n_samples].astype(np.int16), sr
