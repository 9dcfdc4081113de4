"""flaclite FLAC-subset codec: bitstream round-trip, losslessness vs the
pcm16 quantization, DLQ routing of out-of-subset payloads."""

import numpy as np
import pyarrow as pa
import pytest

from hydra_ray.audio import decode_batch, encode, encode_pcm16, snr_db, synth_wave
from hydra_ray.flaclite import FlacError, decode_flac, encode_flac


def _ref_int16(wave):
    return np.frombuffer(encode_pcm16(wave), dtype="<i2")


@pytest.mark.parametrize("i,dur_ms", [(0, 1000), (7, 333), (63, 50), (12, 900)])
def test_roundtrip_lossless_tones(i, dur_ms):
    w = synth_wave(i, 16000, dur_ms)
    x, sr = decode_flac(encode_flac(w, 16000), verify_crc=True)
    assert sr == 16000
    assert np.array_equal(x, _ref_int16(w))


def test_roundtrip_lossless_noise_and_silence():
    rng = np.random.default_rng(0)
    w = rng.uniform(-1, 1, 9001).astype(np.float32)  # verbatim/high-k path
    x, _ = decode_flac(encode_flac(w, 16000), verify_crc=True)
    assert np.array_equal(x, _ref_int16(w))
    x, _ = decode_flac(encode_flac(np.zeros(5000, np.float32), 8000),
                       verify_crc=True)
    assert np.array_equal(x, np.zeros(5000, np.int16))  # constant subframes
    x, _ = decode_flac(encode_flac(np.full(300, 0.25, np.float32), 8000),
                       verify_crc=True)
    assert (x == x[0]).all() and len(x) == 300


@pytest.mark.parametrize("i,dur_ms", [(0, 700), (5, 250), (63, 120)])
def test_roundtrip_lossless_lpc_subframes(i, dur_ms):
    # encoder writes LPC subframes (fixed-equivalent coefficients) so the
    # decoder's general LPC path is exercised with real bitstreams
    w = synth_wave(i, 16000, dur_ms)
    raw = encode_flac(w, 16000, use_lpc=True)
    assert raw != encode_flac(w, 16000)  # genuinely different bitstream
    x, sr = decode_flac(raw, verify_crc=True)
    assert sr == 16000
    assert np.array_equal(x, _ref_int16(w))


def test_lpc_decode_nonzero_shift():
    # hand-rolled LPC restore: coefs [3,-3,1] with shift 1 ≈ half the
    # order-3 fixed prediction — check the recursion against a direct ref
    from hydra_ray.flaclite import _restore_lpc

    rng = np.random.default_rng(3)
    warm = rng.integers(-2000, 2000, 5).astype(np.int64)
    res = rng.integers(-50, 50, 200).astype(np.int64)
    coefs = np.array([3, -3, 1, 2, -1], np.int64)
    out = _restore_lpc(warm, res, coefs, 2)
    x = list(warm)
    for r in res:
        acc = sum(int(coefs[j]) * x[-1 - j] for j in range(5))
        x.append((acc >> 2) + int(r))
    assert np.array_equal(out, np.array(x, np.int64))


def test_compression_on_tonal_content():
    w = synth_wave(3, 16000, 2000)
    raw = encode_flac(w, 16000)
    assert len(raw) < 0.6 * len(w) * 2  # fixed predictors actually help


def test_subset_rejections_and_corruption():
    w = synth_wave(1, 8000, 200)
    raw = bytearray(encode_flac(w, 8000))
    with pytest.raises(FlacError, match="not a FLAC"):
        decode_flac(b"garbage-not-flac-at-all")
    # flip a channel bit in STREAMINFO (mono → stereo declaration)
    stereo = bytearray(raw)
    stereo[8 + 10 + 2] |= 0x02  # ch-1 bits 43..41 of the SI info word
    with pytest.raises(FlacError, match="mono"):
        decode_flac(bytes(stereo))
    # corrupt a frame header byte → CRC-8 mismatch
    bad = bytearray(raw)
    bad[4 + 4 + 34 + 2] ^= 0x10  # blocksize/sr code byte of first frame
    with pytest.raises(FlacError):
        decode_flac(bytes(bad))
    # truncated payload
    with pytest.raises(FlacError):
        decode_flac(bytes(raw[: len(raw) // 2]), verify_crc=True)
    # corrupt frame BODY: caught when verify_crc=True
    body_bad = bytearray(raw)
    body_bad[-10] ^= 0x01
    with pytest.raises(FlacError):
        decode_flac(bytes(body_bad), verify_crc=True)


def test_decode_batch_flac_matches_pcm16_exactly():
    n = 12
    waves = [synth_wave(i, 16000, 250 + 40 * i) for i in range(n)]
    payloads = pa.array(
        [encode(w, "flac", 16000) for w in waves]
        + [encode(w, "pcm16", 16000) for w in waves],
        pa.large_binary(),
    )
    codecs = pa.array(["flac"] * n + ["pcm16"] * n)
    srs = pa.array([16000] * 2 * n, pa.int32())
    pcm, err = decode_batch(payloads, codecs, srs)
    assert err.null_count == 2 * n
    flat = pcm.values.to_numpy(zero_copy_only=False)
    offs = pcm.offsets.to_numpy(zero_copy_only=False)
    for i, w in enumerate(waves):
        a = flat[offs[i] : offs[i + 1]]                  # flac row
        b = flat[offs[n + i] : offs[n + i + 1]]          # pcm16 row
        assert np.array_equal(a, b), f"row {i} not bit-identical to pcm16"
        assert snr_db(w, a) >= 30.0


def test_decode_batch_flac_sr_mismatch():
    w = synth_wave(2, 16000, 100)
    payloads = pa.array([encode(w, "flac", 16000)], pa.large_binary())
    pcm, err = decode_batch(payloads, pa.array(["flac"]),
                            pa.array([8000], pa.int32()))
    assert "sample rate" in err[0].as_py()
