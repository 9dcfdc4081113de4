"""mkvlite: pure-spec EBML/Matroska (webm) mux/demux.

No independent Matroska tool exists in this sandbox, so spec
correctness rests on (a) a HAND-ASSEMBLED golden bitstream written
byte-by-byte from RFC 8794 + the Matroska registry (independent of our
encoder), (b) hand-built lacing payloads for all three schemes, and
(c) round-trips.  Keep the golden tests if touching the codec.
"""

import struct

import numpy as np
import pyarrow as pa
import pytest

from hydra_ray.mkvlite import MkvError, decode_mkv, encode_mkv, parse_mkv


def _frames(n=12, h=6, w=8, seed=7):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (n, h, w), dtype=np.uint8)


# ------------------------------------------------------------- round-trip
@pytest.mark.parametrize("doctype", ["matroska", "webm"])
def test_roundtrip_bit_exact(doctype):
    f = _frames(37, 24, 32)
    raw = encode_mkv(f, fps=10, doctype=doctype)
    meta = parse_mkv(raw)
    assert meta["doctype"] == doctype
    assert meta["duration_ms"] == 3700
    tr = meta["tracks"][0]
    assert tr["codec_id"] == "V_UNCOMPRESSED"
    assert (tr["width"], tr["height"]) == (32, 24)
    assert abs(tr["fps"] - 10.0) < 1e-9
    dec, fps = decode_mkv(raw)
    assert fps == 10
    assert (dec == f).all()


def test_multi_cluster_split():
    """> 5 s of media time splits into multiple clusters; frames still
    come back in timestamp order."""
    f = _frames(n=23, h=4, w=4)
    raw = encode_mkv(f, fps=2)  # 11.5 s -> 3 clusters at 5 s each
    meta = parse_mkv(raw)
    assert len(meta["blocks"]) == 23
    ts = [t for _, t, _, _ in meta["blocks"]]
    assert ts == sorted(ts)
    dec, _ = decode_mkv(raw)
    assert (dec == f).all()


# ------------------------------------------------- hand-assembled golden
def _vint(v, width=None):
    """EBML data-size varint with explicit or minimal width."""
    if width is None:
        width = 1
        while v >= (1 << (7 * width)) - 1:
            width += 1
    return ((1 << (7 * width)) | v).to_bytes(width, "big")


def _el(eid, payload):
    n = (eid.bit_length() + 7) // 8
    return eid.to_bytes(n, "big") + _vint(len(payload)) + payload


def _golden(frame_bytes, w, h, extra_track_fields=b"",
            codec=b"V_UNCOMPRESSED", colour=b"Y800"):
    head = _el(0x1A45DFA3, _el(0x4282, b"matroska"))
    info = _el(0x1549A966,
               _el(0x2AD7B1, (1_000_000).to_bytes(3, "big"))
               + _el(0x4489, struct.pack(">f", 2000.0)))
    video = _el(0xE0, _el(0xB0, bytes([w])) + _el(0xBA, bytes([h]))
                + _el(0x2EB524, colour))
    track = _el(0xAE, _el(0xD7, b"\x01") + _el(0x83, b"\x01")
                + _el(0x86, codec)
                + _el(0x23E383, (500_000_000).to_bytes(4, "big"))
                + video + extra_track_fields)
    tracks = _el(0x1654AE6B, track)
    blocks = b"".join(
        _el(0xA3, b"\x81" + struct.pack(">h", i * 500) + b"\x00" + fb)
        for i, fb in enumerate(frame_bytes))
    cluster = _el(0x1F43B675, _el(0xE7, b"\x00") + blocks)
    return head + _el(0x18538067, info + tracks + cluster)


def test_golden_bitstream_decodes():
    """Byte-by-byte hand assembly (2 fps, 3×2 plane): parse + decode
    must read back exactly what the spec says those bytes mean."""
    w, h = 3, 2
    planes = [bytes(range(k, k + w * h)) for k in (0, 50, 100, 150)]
    raw = _golden(planes, w, h)
    meta = parse_mkv(raw)
    assert meta["duration_ms"] == 2000
    assert meta["timescale_ns"] == 1_000_000
    tr = meta["tracks"][0]
    assert tr["fps"] == pytest.approx(2.0)
    assert tr["colour_space"] == "Y800"
    dec, fps = decode_mkv(raw)
    assert fps == 2
    assert dec.shape == (4, h, w)
    for i, p in enumerate(planes):
        assert dec[i].tobytes() == p


def test_golden_coded_track_raises_with_codec_id():
    raw = _golden([bytes(6)] * 2, 3, 2, codec=b"V_VP9", colour=b"")
    with pytest.raises(MkvError, match="V_VP9"):
        decode_mkv(raw)
    # but metadata still demuxes
    meta = parse_mkv(raw)
    assert meta["tracks"][0]["codec_id"] == "V_VP9"
    assert len(meta["blocks"]) == 2


# ----------------------------------------------------------------- lacing
def _laced_cluster(block_body):
    head = _el(0x1A45DFA3, _el(0x4282, b"matroska"))
    video = _el(0xE0, _el(0xB0, b"\x02") + _el(0xBA, b"\x02")
                + _el(0x2EB524, b"Y800"))
    track = _el(0xAE, _el(0xD7, b"\x01") + _el(0x83, b"\x01")
                + _el(0x86, b"V_UNCOMPRESSED")
                + _el(0x23E383, (250_000_000).to_bytes(4, "big")) + video)
    seg = (_el(0x1549A966, _el(0x2AD7B1, (1_000_000).to_bytes(3, "big")))
           + _el(0x1654AE6B, track)
           + _el(0x1F43B675, _el(0xE7, b"\x00") + _el(0xA3, block_body)))
    return head + _el(0x18538067, seg)


def test_xiph_lacing():
    """3 laced frames of sizes 4/4/4 in one SimpleBlock (Xiph sizes
    4, 4; last implicit)."""
    f = [bytes([i] * 4) for i in (1, 2, 3)]
    body = (b"\x81" + struct.pack(">h", 0) + bytes([0x02])  # Xiph
            + bytes([2]) + bytes([4]) + bytes([4])
            + b"".join(f))
    dec, fps = decode_mkv(_laced_cluster(body))
    assert fps == 4
    assert [p.tobytes() for p in dec] == f


def test_xiph_lacing_255_continuation():
    """A lace size of 255+45=300 exercises the 255-continuation rule."""
    sizes = [300, 4]
    f = [bytes([9]) * 300, bytes([7]) * 4, bytes([5]) * 4]
    body = (b"\x81" + struct.pack(">h", 0) + bytes([0x02])
            + bytes([2]) + bytes([255, 45]) + bytes([4])
            + b"".join(f))
    meta = parse_mkv(_laced_cluster(body))
    got = [sz for _, _, _, sz in meta["blocks"]]
    assert got == [300, 4, 4]


def test_fixed_lacing():
    f = [bytes([i] * 4) for i in (10, 20, 30)]
    body = (b"\x81" + struct.pack(">h", 0) + bytes([0x04])  # fixed
            + bytes([2]) + b"".join(f))
    dec, _ = decode_mkv(_laced_cluster(body))
    assert [p.tobytes() for p in dec] == f


def test_ebml_lacing():
    """EBML lacing: first size absolute (4), second = delta 0 via the
    signed-bias rule (raw 0x3F = bias 63 -> delta 0), third implicit."""
    f = [bytes([i] * 4) for i in (11, 22, 33)]
    body = (b"\x81" + struct.pack(">h", 0) + bytes([0x06])  # EBML
            + bytes([2]) + _vint(4) + bytes([0x80 | 0x3F])
            + b"".join(f))
    dec, _ = decode_mkv(_laced_cluster(body))
    assert [p.tobytes() for p in dec] == f


def test_blockgroup_block_path():
    """BlockGroup/Block (non-Simple) resolves like SimpleBlock."""
    f = bytes(range(4))
    blk = _el(0xA1, b"\x81" + struct.pack(">h", 0) + b"\x00" + f)
    head = _el(0x1A45DFA3, _el(0x4282, b"matroska"))
    video = _el(0xE0, _el(0xB0, b"\x02") + _el(0xBA, b"\x02")
                + _el(0x2EB524, b"Y800"))
    track = _el(0xAE, _el(0xD7, b"\x01") + _el(0x83, b"\x01")
                + _el(0x86, b"V_UNCOMPRESSED")
                + _el(0x23E383, (100_000_000).to_bytes(4, "big")) + video)
    seg = (_el(0x1654AE6B, track)
           + _el(0x1F43B675, _el(0xE7, b"\x00") + _el(0xA0, blk)))
    dec, fps = decode_mkv(head + _el(0x18538067, seg))
    assert fps == 10 and dec[0].tobytes() == f


# ----------------------------------------------------- unknown-size forms
def test_unknown_size_segment_and_cluster():
    """Streamed files leave Segment (and sometimes Cluster) sizes
    unknown (all-ones varint); the parser must cut the Cluster at the
    next sibling boundary."""
    good = encode_mkv(_frames(4, 4, 4), fps=2)
    meta0 = parse_mkv(good)
    # rebuild with unknown-size Segment: header + 0xFF size
    seg_id = bytes.fromhex("18538067")
    k = good.find(seg_id)
    head, seg_hdr_end = good[:k], k + 4
    # original size vint width:
    first = good[seg_hdr_end]
    width = 9 - first.bit_length()
    body = good[seg_hdr_end + width:]
    streamed = head + seg_id + b"\xFF" + body
    meta1 = parse_mkv(streamed)
    assert meta1["blocks"] == [
        (t, ts, off - width + 1, sz) for t, ts, off, sz in meta0["blocks"]]
    assert meta1["tracks"] == meta0["tracks"]


def test_corrupt_payloads_raise():
    with pytest.raises(MkvError):
        parse_mkv(b"\x00\x00\x00\x08junkjunk")
    with pytest.raises(MkvError):
        parse_mkv(b"\x1aE\xdf\xa3junk")
    good = encode_mkv(_frames(3, 4, 4), fps=3)
    with pytest.raises(MkvError):
        parse_mkv(good[:40])
    # wrong doctype
    bad = good.replace(b"matroska", b"webmlike")
    with pytest.raises(MkvError, match="doctype"):
        parse_mkv(bad)


def test_frame_sampler_mkv_equals_rawv(ray_session):
    """The same frames through webm/mkv vs rawv containers sample to
    identical rows; a VP9 webm lands in the DLQ with its codec id."""
    from hydra_ray.stages.multimodal import FrameSampler, encode_rawv

    f = _frames(n=12, h=6, w=6)
    coded = encode_mkv(f, fps=6, doctype="webm").replace(
        b"V_UNCOMPRESSED", b"V_VP9\x00\x00\x00\x00\x00\x00\x00\x00\x00")
    batch = pa.table({
        "video_id": pa.array(["k", "r", "w", "c"]),
        "format": pa.array(["mkv", "rawv", "webm", "webm"]),
        "bytes": pa.array([encode_mkv(f, fps=6),
                           encode_rawv(f, fps=6),
                           encode_mkv(f, fps=6, doctype="webm"),
                           coded], pa.binary()),
    })
    out = FrameSampler(stride_ms=500)(batch).to_pandas()
    good = out[out["decode_error"].isna()].drop(columns="decode_error")
    by = {v: good[good["video_id"] == v].drop(columns="video_id")
          .reset_index(drop=True) for v in ("k", "r", "w")}
    assert len(by["k"]) == len(by["r"]) > 0
    assert (by["k"] == by["r"]).all().all()
    assert (by["w"] == by["r"]).all().all()
    bad = out[out["decode_error"].notna()].set_index("video_id")
    assert "V_VP9" in bad.loc["c", "decode_error"]
