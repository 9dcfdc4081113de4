"""mp4lite: box-structure goldens, raw round trip, general sample-table
resolution, coded-track metadata-with-DLQ contract."""

import struct

import numpy as np
import pytest

from hydra_ray.mp4lite import Mp4Error, decode_mp4, encode_mp4, parse_mp4


def _frames(n=6, h=8, w=10, seed=5):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (n, h, w), np.uint8)


def test_box_structure_golden():
    raw = encode_mp4(_frames(), fps=5)
    # ftyp first: size, fourcc, major brand
    assert raw[4:8] == b"ftyp"
    assert raw[8:12] == b"isom"
    ftyp_size = struct.unpack_from(">I", raw, 0)[0]
    assert raw[ftyp_size + 4:ftyp_size + 8] == b"mdat"
    mdat_size = struct.unpack_from(">I", raw, ftyp_size)[0]
    assert mdat_size == 8 + 6 * 8 * 10
    moov_at = ftyp_size + mdat_size
    assert raw[moov_at + 4:moov_at + 8] == b"moov"
    assert moov_at + struct.unpack_from(">I", raw, moov_at)[0] == len(raw)
    # first sample bytes sit right after the mdat header
    f = _frames()
    assert raw[ftyp_size + 8:ftyp_size + 8 + 80] == f[0].tobytes()


def test_roundtrip_bit_exact():
    f = _frames(n=9, h=16, w=12)
    frames, fps = decode_mp4(encode_mp4(f, fps=4))
    assert fps == 4
    assert np.array_equal(frames, f)


def test_parse_metadata():
    meta = parse_mp4(encode_mp4(_frames(n=10), fps=5))
    assert meta["major_brand"] == "isom"
    assert meta["timescale"] == 1000 and meta["duration_ms"] == 2000
    (t,) = meta["tracks"]
    assert (t["handler"], t["fourcc"]) == ("vide", "raw ")
    assert (t["width"], t["height"], t["n_samples"]) == (10, 8, 10)
    assert t["fps"] == pytest.approx(5.0)


def test_multi_chunk_sample_table_resolves():
    """Rewrite the single-chunk tables into 3 chunks with a 2-entry stsc
    run list — parse/decode must follow the general mapping, not our
    writer's layout."""
    f = _frames(n=6, h=4, w=4)
    raw = bytearray(encode_mp4(f, fps=3))
    plane = 16
    ftyp_size = struct.unpack_from(">I", raw, 0)[0]
    base = ftyp_size + 8
    # chunks: [s0 s1] [s2 s3] [s4 s5]  (same byte layout, new bookkeeping)
    stsc_pat = struct.pack(">IIII", 1, 1, 6, 1)
    stsc_new = struct.pack(">IIII", 1, 1, 2, 1)  # every chunk holds 2
    i = bytes(raw).find(stsc_pat)
    assert i > 0
    raw[i:i + 16] = stsc_new
    stco_pat = struct.pack(">II", 1, base)
    j = bytes(raw).find(stco_pat, i)
    assert j > 0
    stco_new = struct.pack(">IIII", 3, base, base + 2 * plane,
                           base + 4 * plane)
    # stco grew by 8 bytes: rebuild the file via re-mux of the box tree
    # (simpler: craft the new stco in place by padding is invalid — so
    # instead decode expectations against a hand-built variant)
    raw2 = bytes(raw[:j]) + stco_new + bytes(raw[j + 8:])
    # fix enclosing box sizes (stco, stbl, minf, mdia, trak, moov) +8
    raw2 = bytearray(raw2)
    grown = [b"stco", b"stbl", b"minf", b"mdia", b"trak", b"moov"]
    pos = 0
    def grow(buf, fourcc):
        k = buf.find(fourcc)
        assert k >= 4, fourcc
        sz = struct.unpack_from(">I", buf, k - 4)[0]
        struct.pack_into(">I", buf, k - 4, sz + 8)
    for fc in grown:
        grow(raw2, fc)
    frames, fps = decode_mp4(bytes(raw2))
    assert np.array_equal(frames, f)
    meta = parse_mp4(bytes(raw2))
    assert meta["tracks"][0]["n_samples"] == 6


def test_coded_track_metadata_but_decode_dlqs():
    raw = bytearray(encode_mp4(_frames(), fps=5))
    i = bytes(raw).find(b"raw \x00\x00\x00\x00\x00\x00\x00\x01")
    assert i > 0
    raw[i:i + 4] = b"avc1"
    meta = parse_mp4(bytes(raw))         # metadata still fully readable
    assert meta["tracks"][0]["fourcc"] == "avc1"
    with pytest.raises(Mp4Error, match="avc1"):
        decode_mp4(bytes(raw))


def test_corrupt_payloads_raise():
    with pytest.raises(Mp4Error):
        parse_mp4(b"\x00\x00\x00\x08free")
    good = encode_mp4(_frames(), fps=5)
    with pytest.raises(Mp4Error):
        decode_mp4(good[:40])            # truncated mid-mdat
    bad = bytearray(good)
    struct.pack_into(">I", bad, 0, 1 << 30)  # ftyp overruns file
    with pytest.raises(Mp4Error):
        parse_mp4(bytes(bad))


def test_frame_sampler_mp4_equals_rawv(ray_session):
    """The same frames through mp4 vs rawv containers sample to
    identical rows; a coded mp4 and a malformed webm land in the DLQ."""
    import pyarrow as pa

    from hydra_ray.mp4lite import encode_mp4
    from hydra_ray.stages.multimodal import FrameSampler, encode_rawv

    f = _frames(n=12, h=6, w=6)
    coded = bytearray(encode_mp4(f, fps=6))
    k = bytes(coded).find(b"raw \x00\x00\x00\x00\x00\x00\x00\x01")
    coded[k:k + 4] = b"avc1"
    batch = pa.table({
        "video_id": pa.array(["m", "r", "c", "w"]),
        "format": pa.array(["mp4", "rawv", "mp4", "webm"]),
        "bytes": pa.array([encode_mp4(f, fps=6), encode_rawv(f, fps=6),
                           bytes(coded), b"\x1aE\xdf\xa3junk"],
                          pa.binary()),
    })
    out = FrameSampler(stride_ms=500)(batch).to_pandas()
    good = out[out["decode_error"].isna()].drop(columns="decode_error")
    m = good[good["video_id"] == "m"].drop(columns="video_id")
    r = good[good["video_id"] == "r"].drop(columns="video_id")
    assert len(m) == len(r) > 0
    assert (m.reset_index(drop=True) == r.reset_index(drop=True)).all().all()
    bad = out[out["decode_error"].notna()].set_index("video_id")
    assert "avc1" in bad.loc["c", "decode_error"]
    assert "MkvError" in bad.loc["w", "decode_error"]
