"""adpcmlite (IMA/DVI ADPCM, WAV tag 0x0011): spec goldens, scalar-reference
exactness of the lockstep decoder, round-trip SNR, and DLQ routing."""

import struct

import numpy as np
import pyarrow as pa
import pytest

from hydra_ray.adpcmlite import (
    BLOCK_ALIGN,
    INDEX_TABLE,
    SAMPLES_PER_BLOCK,
    STEP_TABLE,
    AdpcmError,
    decode_adpcm,
    encode_adpcm,
)
from hydra_ray.audio import decode_batch, snr_db, synth_wave


def _scalar_decode(raw):
    """Pure-Python IMA recurrence straight from the 1992 spec text —
    the parity reference for the lockstep numpy decoder."""
    mv = memoryview(raw)
    pos = 12
    sr = n = data = None
    while pos + 8 <= len(mv):
        cid = bytes(mv[pos:pos + 4])
        (clen,) = struct.unpack_from("<I", mv, pos + 4)
        body = bytes(mv[pos + 8:pos + 8 + clen])
        if cid == b"fmt ":
            _, _, sr, _, _, _, _, _ = struct.unpack_from("<HHIIHHHH", body, 0)
        elif cid == b"fact":
            (n,) = struct.unpack_from("<I", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)
    out = []
    for b0 in range(0, len(data), BLOCK_ALIGN):
        blk = data[b0:b0 + BLOCK_ALIGN]
        pred = int.from_bytes(blk[0:2], "little", signed=True)
        idx = blk[2]
        out.append(pred)
        for byte in blk[4:]:
            for d in (byte & 0xF, byte >> 4):
                step = int(STEP_TABLE[idx])
                diff = step >> 3
                if d & 4:
                    diff += step
                if d & 2:
                    diff += step >> 1
                if d & 1:
                    diff += step >> 2
                pred = pred - diff if d & 8 else pred + diff
                pred = max(-32768, min(32767, pred))
                idx = max(0, min(88, idx + int(INDEX_TABLE[d & 7])))
                out.append(pred)
    return np.array(out[:n], dtype=np.int16), sr


def _container(data: bytes, n_samples: int, sr=16000, tag=0x0011, ch=1,
               bits=4, align=BLOCK_ALIGN, spb=SAMPLES_PER_BLOCK,
               with_fact=True):
    fmt = struct.pack("<HHIIHHHH", tag, ch, sr, 4055, align, bits, 2, spb)
    riff = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if with_fact:
        riff += b"fact" + struct.pack("<I", 4) + struct.pack("<I", n_samples)
    riff += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def test_golden_block_hand_computed():
    # pred0=100, idx0=0; nibbles [2, 9] then zeros.
    # step=7: d=2 → diff = 0 + (7>>1) = 3 → pred 103, idx→0
    #          d=9 → sign, |d|&7=1 → diff = 7>>2 = 1 → pred 102, idx→0
    # d=0 afterwards → diff = 7>>3 = 0 → pred stays 102
    blk = bytearray(BLOCK_ALIGN)
    blk[0:2] = (100).to_bytes(2, "little")
    blk[2] = 0
    blk[4] = 2 | (9 << 4)          # low nibble first
    raw = _container(bytes(blk), n_samples=6)
    x, sr = decode_adpcm(raw)
    assert sr == 16000
    np.testing.assert_array_equal(x, [100, 103, 102, 102, 102, 102])


def test_lockstep_decoder_matches_scalar_reference():
    rng = np.random.default_rng(7)
    for i in range(4):
        n = int(rng.integers(200, 4000))
        w = (rng.standard_normal(n) * 0.3).clip(-1, 1).astype(np.float32)
        raw = encode_adpcm(w, 16000)
        x, sr = decode_adpcm(raw)
        xs, srs = _scalar_decode(raw)
        assert sr == srs
        np.testing.assert_array_equal(x, xs)
        assert len(x) == n


def test_roundtrip_snr_and_length():
    for i in (0, 5, 11):
        w = synth_wave(i, 16000, 600 + i * 40)
        x, sr = decode_adpcm(encode_adpcm(w, 16000))
        assert sr == 16000 and len(x) == len(w)
        assert snr_db(w, x.astype(np.float32) / 32767.0) >= 18.0


def test_empty_and_single_sample():
    x, sr = decode_adpcm(encode_adpcm(np.zeros(0, np.float32), 8000))
    assert len(x) == 0 and sr == 8000
    x, sr = decode_adpcm(encode_adpcm(np.array([0.5], np.float32), 8000))
    np.testing.assert_array_equal(x, [16383])  # header sample verbatim


def test_malformed_rejections():
    good = encode_adpcm(synth_wave(1, 16000, 300), 16000)
    with pytest.raises(AdpcmError):
        decode_adpcm(b"garbage")
    with pytest.raises(AdpcmError):
        decode_adpcm(good[:40])                       # truncated chunk
    with pytest.raises(AdpcmError):
        decode_adpcm(_container(bytes(BLOCK_ALIGN), 1, tag=0x0001))
    with pytest.raises(AdpcmError):
        decode_adpcm(_container(bytes(BLOCK_ALIGN), 1, ch=2))
    with pytest.raises(AdpcmError):
        decode_adpcm(_container(bytes(BLOCK_ALIGN), 1, with_fact=False))
    with pytest.raises(AdpcmError):                   # fact > capacity
        decode_adpcm(_container(bytes(BLOCK_ALIGN), SAMPLES_PER_BLOCK + 1))
    bad_idx = bytearray(BLOCK_ALIGN)
    bad_idx[2] = 97
    with pytest.raises(AdpcmError):
        decode_adpcm(_container(bytes(bad_idx), 5))


def test_decode_batch_routes_adpcm_and_dlq():
    waves = [synth_wave(i, 16000, 400) for i in range(3)]
    payloads = [encode_adpcm(w, 16000) for w in waves]
    payloads.append(b"not-a-riff")
    codecs = ["adpcm"] * 4
    pcm, err = decode_batch(
        pa.array(payloads, pa.large_binary()),
        pa.array(codecs),
        pa.array([16000] * 4, pa.int32()),
    )
    assert err[3].as_py() is not None and "RIFF" in err[3].as_py()
    for i, w in enumerate(waves):
        assert err[i].as_py() is None
        got = np.asarray(pcm[i].as_py(), dtype=np.float32)
        assert len(got) == len(w)
        assert snr_db(w, got) >= 18.0
    # declared-sr mismatch routes to DLQ too
    pcm2, err2 = decode_batch(
        pa.array(payloads[:1], pa.large_binary()),
        pa.array(["adpcm"]),
        pa.array([8000], pa.int32()),
    )
    assert "sample rate" in err2[0].as_py()
