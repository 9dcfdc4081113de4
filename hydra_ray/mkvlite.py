"""Pure-spec EBML / Matroska (and WebM) mux+demux for uncompressed video.

Upgrades the LAST declared video container stubs (webm/mkv in
`stages/multimodal.py`) the way mp4lite upgraded mp4: the CONTAINER
layer is real and general — `parse_mkv` walks any EBML element tree
(4-byte-max IDs, 8-byte-max sizes, unknown-size masters for streamed
Segments/Clusters) and resolves every block (SimpleBlock and
BlockGroup/Block, all three lacing schemes: Xiph, fixed-size, EBML), so
metadata extraction works on arbitrary Matroska/WebM files — while the
CODEC layer decodes exactly one CodecID, ``V_UNCOMPRESSED`` with
ColourSpace ``Y800`` (8-bit grayscale, one plane per frame).  Coded
tracks (V_VP8/V_VP9/V_AV1/V_MPEG4/…) demux fine but frame decode raises
with the CodecID — the caller DLQs them, the same honest contract the
stub had, now WITH the metadata.

Layout written by ``encode_mkv``: EBML(DocType matroska|webm) ·
Segment(Info(TimestampScale 1 ms · Duration) · Tracks(TrackEntry(
TrackNumber 1 · TrackType video · CodecID V_UNCOMPRESSED ·
DefaultDuration · Video(PixelWidth/Height · ColourSpace Y800))) ·
Cluster(Timestamp · one no-lacing SimpleBlock per frame)) — clusters
are split every ~5 s of media time, matching common muxer practice.

Public spec: RFC 8794 (EBML), the Matroska element registry
(matroska.org / IETF cellar drafts), and the WebM container guidelines
(WebM = Matroska subset with DocType "webm").  Reference analogue:
format-dispatched payload decode at ingest (SURVEY §2.3 P10) — webm/mkv
are the remaining real container edges.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["MkvError", "encode_mkv", "parse_mkv", "decode_mkv"]


class MkvError(ValueError):
    """Malformed or unsupported Matroska payload (caller routes to DLQ)."""


# ------------------------------------------------------------- EBML core
# Element IDs (class IDs, marker bit kept — RFC 8794 §5).
_EBML = 0x1A45DFA3
_DOCTYPE = 0x4282
_DOCTYPE_VER = 0x4287
_DOCTYPE_READ = 0x4285
_EBML_VER = 0x4286
_EBML_READ = 0x42F7
_MAX_ID_LEN = 0x42F2
_MAX_SIZE_LEN = 0x42F3
_SEGMENT = 0x18538067
_INFO = 0x1549A966
_TS_SCALE = 0x2AD7B1
_DURATION = 0x4489
_MUX_APP = 0x4D80
_WRITE_APP = 0x5741
_TRACKS = 0x1654AE6B
_TRACK_ENTRY = 0xAE
_TRACK_NUM = 0xD7
_TRACK_UID = 0x73C5
_TRACK_TYPE = 0x83
_CODEC_ID = 0x86
_DEFAULT_DUR = 0x23E383
_VIDEO = 0xE0
_PIX_W = 0xB0
_PIX_H = 0xBA
_COLOUR_SPACE = 0x2EB524
_CLUSTER = 0x1F43B675
_CLUSTER_TS = 0xE7
_SIMPLE_BLOCK = 0xA3
_BLOCK_GROUP = 0xA0
_BLOCK = 0xA1

# Master elements whose children we descend into.
_MASTERS = frozenset({_EBML, _SEGMENT, _INFO, _TRACKS, _TRACK_ENTRY,
                      _VIDEO, _CLUSTER, _BLOCK_GROUP})
# Top-level children of Segment: an unknown-size Cluster ends when one
# of these (or another Cluster) starts (RFC 8794 §6.2 end rule, applied
# to the Matroska schema).
_SEGMENT_CHILDREN = frozenset({
    _INFO, _TRACKS, _CLUSTER, 0x114D9B74,  # SeekHead
    0x1C53BB6B,                            # Cues
    0x1941A469,                            # Attachments
    0x1043A770,                            # Chapters
    0x1254C367,                            # Tags
})


def _enc_id(eid: int) -> bytes:
    n = (eid.bit_length() + 7) // 8
    return eid.to_bytes(n, "big")


def _enc_size(value: int) -> bytes:
    """EBML data-size varint: shortest width whose marker fits."""
    for width in range(1, 9):
        if value < (1 << (7 * width)) - 1:   # all-ones is reserved
            return ((1 << (7 * width)) | value).to_bytes(width, "big")
    raise MkvError("size too large for EBML varint")


def _el(eid: int, payload: bytes) -> bytes:
    return _enc_id(eid) + _enc_size(len(payload)) + payload


def _uint(v: int) -> bytes:
    n = max(1, (v.bit_length() + 7) // 8)
    return v.to_bytes(n, "big")


def _read_vint(mv: memoryview, pos: int, hi: int,
               keep_marker: bool) -> tuple[int | None, int]:
    """Read an EBML varint at ``pos``; returns (value, next_pos).
    For data sizes (keep_marker=False) an all-ones pattern returns
    None = unknown size."""
    if pos >= hi:
        raise MkvError("truncated EBML varint")
    first = mv[pos]
    if first == 0:
        raise MkvError("invalid EBML varint (>8 bytes)")
    width = 9 - first.bit_length()           # leading zeros + 1
    if pos + width > hi:
        raise MkvError("truncated EBML varint body")
    raw = int.from_bytes(mv[pos:pos + width], "big")
    if keep_marker:
        return raw, pos + width
    val = raw & ((1 << (7 * width)) - 1)
    if val == (1 << (7 * width)) - 1:        # all value bits set
        return None, pos + width
    return val, pos + width


def _walk(mv: memoryview, lo: int, hi: int):
    """Yield (element_id, body_lo, body_hi, unknown_size) for each
    element in [lo, hi).  Unknown-size masters run to ``hi`` unless a
    sibling-level boundary cuts them (handled by the caller for
    Clusters)."""
    pos = lo
    while pos < hi:
        eid, p = _read_vint(mv, pos, hi, keep_marker=True)
        size, body = _read_vint(mv, p, hi, keep_marker=False)
        if size is None:
            yield eid, body, hi, True
            return                            # rest belongs to this one
        end = body + size
        if end > hi:
            raise MkvError(f"element 0x{eid:X} overruns its parent")
        yield eid, body, end, False
        pos = end


def _find(mv: memoryview, lo: int, hi: int, *path: int):
    for eid, b, e, _ in _walk(mv, lo, hi):
        if eid == path[0]:
            if len(path) == 1:
                return b, e
            return _find(mv, b, e, *path[1:])
    return None


def _read_uint(mv: memoryview, lo: int, hi: int) -> int:
    return int.from_bytes(mv[lo:hi], "big")


def _read_float(mv: memoryview, lo: int, hi: int) -> float:
    n = hi - lo
    if n == 4:
        return struct.unpack(">f", mv[lo:hi])[0]
    if n == 8:
        return struct.unpack(">d", mv[lo:hi])[0]
    raise MkvError("EBML float must be 4 or 8 bytes")


# ------------------------------------------------------------------ mux
def encode_mkv(frames: np.ndarray, fps: int,
               doctype: str = "matroska") -> bytes:
    """(n, h, w) uint8 grayscale frames → Matroska/WebM bytes with one
    V_UNCOMPRESSED (ColourSpace Y800) video track, one no-lacing
    SimpleBlock per frame, clusters split every ~5 s."""
    frames = np.ascontiguousarray(frames, np.uint8)
    if frames.ndim != 3 or frames.size == 0 or fps <= 0:
        raise MkvError("encode_mkv needs (n, h, w) uint8 frames, fps > 0")
    n, h, w = frames.shape

    ebml = _el(_EBML, b"".join([
        _el(_EBML_VER, _uint(1)), _el(_EBML_READ, _uint(1)),
        _el(_MAX_ID_LEN, _uint(4)), _el(_MAX_SIZE_LEN, _uint(8)),
        _el(_DOCTYPE, doctype.encode("ascii")),
        _el(_DOCTYPE_VER, _uint(2)), _el(_DOCTYPE_READ, _uint(2)),
    ]))

    dur_ms = n * 1000.0 / fps
    info = _el(_INFO, b"".join([
        _el(_TS_SCALE, _uint(1_000_000)),         # 1 tick = 1 ms
        _el(_DURATION, struct.pack(">d", dur_ms)),
        _el(_MUX_APP, b"hydra_ray"), _el(_WRITE_APP, b"hydra_ray"),
    ]))

    video = _el(_VIDEO, b"".join([
        _el(_PIX_W, _uint(w)), _el(_PIX_H, _uint(h)),
        _el(_COLOUR_SPACE, b"Y800"),
    ]))
    tracks = _el(_TRACKS, _el(_TRACK_ENTRY, b"".join([
        _el(_TRACK_NUM, _uint(1)), _el(_TRACK_UID, _uint(1)),
        _el(_TRACK_TYPE, _uint(1)),               # 1 = video
        _el(_CODEC_ID, b"V_UNCOMPRESSED"),
        _el(_DEFAULT_DUR, _uint(1_000_000_000 // fps)),
        video,
    ])))

    clusters = []
    per_cluster = max(1, 5 * fps)                 # ~5 s of media time
    plane = h * w
    for c0 in range(0, n, per_cluster):
        base_ms = int(c0 * 1000 / fps)
        body = [_el(_CLUSTER_TS, _uint(base_ms))]
        for f in range(c0, min(c0 + per_cluster, n)):
            rel = int(f * 1000 / fps) - base_ms
            blk = (b"\x81" + struct.pack(">h", rel) + b"\x80"
                   + frames[f].tobytes())         # track 1, keyframe
            body.append(_el(_SIMPLE_BLOCK, blk))
        clusters.append(_el(_CLUSTER, b"".join(body)))
        del body
    segment = _el(_SEGMENT, info + tracks + b"".join(clusters))
    return ebml + segment


# ---------------------------------------------------------------- demux
def _block_frames(mv: memoryview, lo: int, hi: int):
    """Resolve a (Simple)Block body: returns (track, rel_ts,
    [(offset, size), ...]) handling all three lacing schemes."""
    track, pos = _read_vint(mv, lo, hi, keep_marker=False)
    if track is None:
        raise MkvError("block track number cannot be unknown-size")
    if pos + 3 > hi:
        raise MkvError("truncated block header")
    rel = struct.unpack(">h", mv[pos:pos + 2])[0]
    flags = mv[pos + 2]
    pos += 3
    lacing = flags & 0x06
    if lacing == 0x00:                            # no lacing
        return track, rel, [(pos, hi - pos)]
    if pos >= hi:
        raise MkvError("truncated lace count")
    n_frames = mv[pos] + 1
    pos += 1
    sizes = []
    if lacing == 0x02:                            # Xiph
        for _ in range(n_frames - 1):
            s = 0
            while True:
                if pos >= hi:
                    raise MkvError("truncated Xiph lace")
                b = mv[pos]
                pos += 1
                s += b
                if b != 255:
                    break
            sizes.append(s)
    elif lacing == 0x04:                          # fixed-size
        total = hi - pos
        if total % n_frames:
            raise MkvError("fixed lacing: total not divisible")
        sizes = [total // n_frames] * (n_frames - 1)
    elif lacing == 0x06:                          # EBML
        first, pos = _read_vint(mv, pos, hi, keep_marker=False)
        if first is None:
            raise MkvError("EBML lace size cannot be unknown")
        sizes.append(first)
        prev = first
        for _ in range(n_frames - 2):
            start = pos
            raw, pos = _read_vint(mv, start, hi, keep_marker=False)
            if raw is None:
                raise MkvError("EBML lace delta cannot be unknown")
            width = pos - start
            delta = raw - ((1 << (7 * width - 1)) - 1)  # signed bias
            prev += delta
            if prev < 0:
                raise MkvError("negative EBML lace size")
            sizes.append(prev)
    out = []
    for s in sizes:
        if pos + s > hi:
            raise MkvError("lace overruns block")
        out.append((pos, s))
        pos += s
    if pos > hi:
        raise MkvError("laces overrun block")
    out.append((pos, hi - pos))                   # last frame: implicit
    return track, rel, out


def _iter_segment(mv: memoryview, lo: int, hi: int):
    """Children of Segment, cutting unknown-size Clusters at the next
    sibling boundary (RFC 8794 unknown-size end rule for this schema)."""
    pos = lo
    while pos < hi:
        eid, p = _read_vint(mv, pos, hi, keep_marker=True)
        size, body = _read_vint(mv, p, hi, keep_marker=False)
        if size is not None:
            end = body + size
            if end > hi:
                raise MkvError(f"element 0x{eid:X} overruns segment")
            yield eid, body, end
            pos = end
            continue
        # unknown size: scan forward for the next sibling-level ID
        scan = body
        end = hi
        while scan < hi:
            try:
                sid, sp = _read_vint(mv, scan, hi, keep_marker=True)
                ssize, sbody = _read_vint(mv, sp, hi, keep_marker=False)
            except MkvError:
                break
            if sid in _SEGMENT_CHILDREN:
                end = scan
                break
            scan = sbody + (ssize or 0)
        yield eid, body, end
        pos = end


def parse_mkv(raw: bytes) -> dict:
    """Container metadata from any EBML/Matroska payload: doctype,
    timestamp scale, duration_ms, per-track codec/dims/fps, and every
    resolved block (track, abs ts ms, offset, size)."""
    mv = memoryview(raw)
    top = list(_walk(mv, 0, len(mv)))
    if not top or top[0][0] != _EBML:
        raise MkvError("not an EBML payload")
    head_lo, head_hi = top[0][1], top[0][2]
    dt = _find(mv, head_lo, head_hi, _DOCTYPE)
    doctype = (bytes(mv[dt[0]:dt[1]]).decode("latin-1")
               if dt else "matroska")
    if doctype not in ("matroska", "webm"):
        raise MkvError(f"unsupported EBML doctype {doctype!r}")
    seg = next(((b, e) for eid, b, e, _ in top[1:] if eid == _SEGMENT),
               None)
    if seg is None:
        raise MkvError("Segment missing")

    out = {"doctype": doctype, "timescale_ns": 1_000_000,
           "duration_ms": 0, "tracks": [], "blocks": []}
    tracks_by_num: dict[int, dict] = {}
    for eid, b, e in _iter_segment(mv, *seg):
        if eid == _INFO:
            ts = _find(mv, b, e, _TS_SCALE)
            if ts:
                out["timescale_ns"] = _read_uint(mv, *ts)
            du = _find(mv, b, e, _DURATION)
            if du:
                out["duration_ms"] = int(
                    _read_float(mv, *du) * out["timescale_ns"] / 1e6)
        elif eid == _TRACKS:
            for tid, tb, te, _ in _walk(mv, b, e):
                if tid != _TRACK_ENTRY:
                    continue
                tr = {"number": 0, "type": 0, "codec_id": "",
                      "width": 0, "height": 0, "colour_space": "",
                      "fps": 0.0}
                for fid, fb, fe, _ in _walk(mv, tb, te):
                    if fid == _TRACK_NUM:
                        tr["number"] = _read_uint(mv, fb, fe)
                    elif fid == _TRACK_TYPE:
                        tr["type"] = _read_uint(mv, fb, fe)
                    elif fid == _CODEC_ID:
                        tr["codec_id"] = bytes(
                            mv[fb:fe]).decode("latin-1")
                    elif fid == _DEFAULT_DUR:
                        dd = _read_uint(mv, fb, fe)
                        if dd:
                            tr["fps"] = 1e9 / dd
                    elif fid == _VIDEO:
                        pw = _find(mv, fb, fe, _PIX_W)
                        ph = _find(mv, fb, fe, _PIX_H)
                        cs = _find(mv, fb, fe, _COLOUR_SPACE)
                        if pw:
                            tr["width"] = _read_uint(mv, *pw)
                        if ph:
                            tr["height"] = _read_uint(mv, *ph)
                        if cs:
                            tr["colour_space"] = bytes(
                                mv[cs[0]:cs[1]]).decode("latin-1")
                out["tracks"].append(tr)
                tracks_by_num[tr["number"]] = tr
        elif eid == _CLUSTER:
            base = 0
            for cid, cb, ce, _ in _walk(mv, b, e):
                if cid == _CLUSTER_TS:
                    base = _read_uint(mv, cb, ce)
                elif cid == _SIMPLE_BLOCK:
                    tnum, rel, laces = _block_frames(mv, cb, ce)
                    for off, sz in laces:
                        out["blocks"].append((tnum, base + rel, off, sz))
                elif cid == _BLOCK_GROUP:
                    blk = _find(mv, cb, ce, _BLOCK)
                    if blk:
                        tnum, rel, laces = _block_frames(mv, *blk)
                        for off, sz in laces:
                            out["blocks"].append(
                                (tnum, base + rel, off, sz))
    if not out["tracks"]:
        raise MkvError("no Tracks element")
    # per-track fps fallback from block cadence when DefaultDuration
    # is absent
    for tr in out["tracks"]:
        if tr["fps"] or tr["type"] != 1:
            continue
        ts = sorted(t for n_, t, _, _ in out["blocks"]
                    if n_ == tr["number"])
        if len(ts) >= 2 and ts[-1] > ts[0]:
            scale_ms = out["timescale_ns"] / 1e6
            tr["fps"] = (len(ts) - 1) * 1000.0 / (
                (ts[-1] - ts[0]) * scale_ms)
    return out


def decode_mkv(raw: bytes) -> tuple[np.ndarray, int]:
    """(frames (n, h, w) uint8, fps) from the first video track.  Only
    ``V_UNCOMPRESSED`` + ColourSpace Y800 decodes; coded tracks raise
    with their CodecID so the caller can DLQ informatively."""
    meta = parse_mkv(raw)
    vid = next((t for t in meta["tracks"] if t["type"] == 1), None)
    if vid is None:
        raise MkvError("no video track")
    if vid["codec_id"] != "V_UNCOMPRESSED" or (
            vid["colour_space"] not in ("Y800", "Y8  ", "GREY")):
        raise MkvError(
            f"coded video track {vid['codec_id']!r} "
            f"(colour {vid['colour_space']!r}) requires a codec (only "
            "V_UNCOMPRESSED Y800 8-bit grayscale decodes)")
    h, w = vid["height"], vid["width"]
    if h <= 0 or w <= 0:
        raise MkvError("bad V_UNCOMPRESSED track dimensions")
    plane = h * w
    mv = memoryview(raw)
    blocks = sorted(
        (ts, off, sz) for tnum, ts, off, sz in meta["blocks"]
        if tnum == vid["number"])
    if not blocks:
        raise MkvError("video track has no blocks")
    frames = np.empty((len(blocks), h, w), np.uint8)
    for i, (_, off, sz) in enumerate(blocks):
        if sz != plane:
            raise MkvError(
                f"V_UNCOMPRESSED frame size {sz} != plane {plane}")
        frames[i] = np.frombuffer(mv[off:off + plane],
                                  np.uint8).reshape(h, w)
    fps = int(round(vid["fps"])) if vid["fps"] else 0
    if fps <= 0:
        raise MkvError("unusable frame timing (DefaultDuration/blocks)")
    return frames, fps
