"""Pure-spec ISO-BMFF (MP4) mux/demux for uncompressed grayscale video.

Upgrades the former mp4 DLQ stub (`stages/multimodal.py`) the same way
flaclite/jpeglite upgraded audio/image: the CONTAINER layer is real and
general — `parse_mp4` walks any ISO/IEC 14496-12 box tree and reads the
full sample-table machinery (stts/stsc/stsz/stz2/stco/co64, any
chunk↔sample mapping), so metadata extraction works on arbitrary MP4s —
while the CODEC layer supports exactly one VisualSampleEntry, the
classic QuickTime ``raw `` entry at depth 40 (8-bit grayscale, one
plane per sample).  Files whose track is coded (avc1/hev1/vp09/…)
demux fine but frame decode raises with the fourcc — the caller DLQs
them, the same honest contract the stub had, now WITH the metadata.

Layout written by ``encode_mp4`` (progressive: moov after mdat):
ftyp · mdat(frame planes) · moov(mvhd · trak(tkhd · mdia(mdhd ·
hdlr'vide' · minf(vmhd · dinf/dref'url ' · stbl(stsd'raw ' · stts ·
stsc · stsz · stco))))) — one chunk holding all samples, constant
sample size h·w, media timescale = fps so every stts delta is 1.

Public spec: ISO/IEC 14496-12 (boxes, sample tables), QuickTime File
Format (the ``raw `` video sample entry; depth 40 = 8-bit grayscale).
Reference analogue: format-dispatched payload decode at ingest
(SURVEY §2.3 P10) — mp4 is one more real container edge.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["Mp4Error", "encode_mp4", "parse_mp4", "decode_mp4"]


class Mp4Error(ValueError):
    """Malformed or unsupported MP4 payload (caller routes to DLQ)."""


# ------------------------------------------------------------------ mux
def _box(fourcc: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + fourcc + payload


def _full(fourcc: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(fourcc, struct.pack(">B3s", version,
                                    flags.to_bytes(3, "big")) + payload)


_MATRIX = struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)


def encode_mp4(frames: np.ndarray, fps: int) -> bytes:
    """(n, h, w) uint8 grayscale frames → MP4 with a ``raw `` video
    track (one sample per frame, single chunk)."""
    frames = np.ascontiguousarray(frames, np.uint8)
    if frames.ndim != 3 or frames.size == 0 or fps <= 0:
        raise Mp4Error("encode_mp4 needs (n, h, w) uint8 frames, fps > 0")
    n, h, w = frames.shape
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2")
    mdat = _box(b"mdat", frames.tobytes())
    data_off = len(ftyp) + 8                      # first sample's offset

    stsd_entry = (
        struct.pack(">I", 86 + 16) + b"raw " + bytes(6) +
        struct.pack(">H", 1) +                    # data_reference_index
        bytes(16) +                               # pre_defined/reserved
        struct.pack(">HH", w, h) +
        struct.pack(">II", 0x480000, 0x480000) +  # 72 dpi
        struct.pack(">I", 0) + struct.pack(">H", 1) +  # frame_count 1
        bytes(32) +                               # compressorname
        struct.pack(">Hh", 40, -1)                # depth 40 = 8-bit gray
    )
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + stsd_entry)
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, 1))
    stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n, 1))
    stsz = _full(b"stsz", 0, 0, struct.pack(">III", h * w, n, 0))
    stco = _full(b"stco", 0, 0, struct.pack(">II", 1, data_off))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dref = _full(b"dref", 0, 0,
                 struct.pack(">I", 1) + _full(b"url ", 0, 1, b""))
    dinf = _box(b"dinf", dref)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdhd = _full(b"mdhd", 0, 0,
                 struct.pack(">IIIIHH", 0, 0, fps, n, 0x55C4, 0))
    hdlr = _full(b"hdlr", 0, 0,
                 struct.pack(">I", 0) + b"vide" + bytes(12) + b"hydra\x00")
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    dur_mv = n * 1000 // fps
    tkhd = _full(b"tkhd", 0, 7, struct.pack(
        ">IIIIIII", 0, 0, 1, 0, dur_mv, 0, 0)
        + struct.pack(">HHHH", 0, 0, 0, 0) + _MATRIX
        + struct.pack(">II", w << 16, h << 16))
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _full(b"mvhd", 0, 0, struct.pack(
        ">IIII", 0, 0, 1000, dur_mv)
        + struct.pack(">IH", 0x00010000, 0x0100) + bytes(10) + _MATRIX
        + bytes(24) + struct.pack(">I", 2))
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


# ---------------------------------------------------------------- demux
def _walk(raw: memoryview, lo: int, hi: int):
    """Yield (fourcc, body_lo, body_hi) for each box in [lo, hi)."""
    pos = lo
    while pos + 8 <= hi:
        size = struct.unpack_from(">I", raw, pos)[0]
        fourcc = bytes(raw[pos + 4:pos + 8])
        body = pos + 8
        if size == 1:                      # 64-bit largesize
            if body + 8 > hi:
                raise Mp4Error("truncated largesize box")
            size = struct.unpack_from(">Q", raw, body)[0]
            body += 8
            end = pos + size
        elif size == 0:                    # to end of enclosing box
            end = hi
        else:
            end = pos + size
        if end < body or end > hi:
            raise Mp4Error(f"box {fourcc!r} overruns its parent")
        yield fourcc, body, end
        pos = end


def _find(raw: memoryview, lo: int, hi: int, *path: bytes):
    for fourcc, b, e in _walk(raw, lo, hi):
        if fourcc == path[0]:
            if len(path) == 1:
                return b, e
            return _find(raw, b, e, *path[1:])
    return None


def parse_mp4(raw: bytes) -> dict:
    """Container metadata from any ISO-BMFF payload: brand, movie
    duration/timescale, per-video-track fourcc/dims/fps/sample count +
    the resolved (offset, size) of every sample."""
    mv = memoryview(raw)
    top = list(_walk(mv, 0, len(mv)))
    brands = [f for f, _, _ in top]
    if b"ftyp" not in brands or b"moov" not in brands:
        raise Mp4Error("not an ISO-BMFF payload (ftyp/moov missing)")
    ft = next((b, e) for f, b, e in top if f == b"ftyp")
    major = bytes(mv[ft[0]:ft[0] + 4]).decode("latin-1")
    moov = next((b, e) for f, b, e in top if f == b"moov")
    out = {"major_brand": major, "tracks": []}
    mvhd = _find(mv, *moov, b"mvhd")
    if mvhd:
        ver = mv[mvhd[0]]
        if ver == 1:
            ts, dur = struct.unpack_from(">IQ", mv, mvhd[0] + 20)
        else:
            ts, dur = struct.unpack_from(">II", mv, mvhd[0] + 12)
        out["timescale"], out["duration"] = int(ts), int(dur)
        out["duration_ms"] = int(dur * 1000 // ts) if ts else 0
    for fourcc, b, e in _walk(mv, *moov):
        if fourcc != b"trak":
            continue
        mdia = _find(mv, b, e, b"mdia")
        if not mdia:
            continue
        hdlr = _find(mv, *mdia, b"hdlr")
        handler = bytes(mv[hdlr[0] + 8:hdlr[0] + 12]) if hdlr else b"????"
        mdhd = _find(mv, *mdia, b"mdhd")
        if mdhd:
            ver = mv[mdhd[0]]
            if ver == 1:
                mts, mdur = struct.unpack_from(">IQ", mv, mdhd[0] + 20)
            else:
                mts, mdur = struct.unpack_from(">II", mv, mdhd[0] + 12)
        else:
            mts = mdur = 0
        stbl = _find(mv, *mdia, b"minf", b"stbl")
        if not stbl:
            continue
        stsd = _find(mv, *stbl, b"stsd")
        entry_fourcc, w, h = "????", 0, 0
        if stsd:
            lo = stsd[0] + 8                  # fullbox header + count
            entry_fourcc = bytes(mv[lo + 4:lo + 8]).decode("latin-1")
            if handler == b"vide" and lo + 36 <= stsd[1]:
                w, h = struct.unpack_from(">HH", mv, lo + 32)
        # ---- sample sizes (stsz / stz2)
        sizes = None
        stsz = _find(mv, *stbl, b"stsz")
        if stsz:
            const, n = struct.unpack_from(">II", mv, stsz[0] + 4)
            if const:
                sizes = np.full(n, const, np.int64)
            else:
                sizes = np.frombuffer(
                    mv[stsz[0] + 12:stsz[0] + 12 + 4 * n], ">u4"
                ).astype(np.int64)
        else:
            stz2 = _find(mv, *stbl, b"stz2")
            if stz2:
                field, n = struct.unpack_from(">II", mv, stz2[0] + 4)
                field &= 0xFF
                if field == 16:
                    sizes = np.frombuffer(
                        mv[stz2[0] + 12:stz2[0] + 12 + 2 * n], ">u2"
                    ).astype(np.int64)
                elif field == 8:
                    sizes = np.frombuffer(
                        mv[stz2[0] + 12:stz2[0] + 12 + n], np.uint8
                    ).astype(np.int64)
                else:
                    raise Mp4Error("stz2 4-bit fields unsupported")
        if sizes is None:
            raise Mp4Error("sample sizes missing (stsz/stz2)")
        n_samples = len(sizes)
        # ---- chunk offsets (stco / co64)
        stco = _find(mv, *stbl, b"stco")
        if stco:
            nc = struct.unpack_from(">I", mv, stco[0] + 4)[0]
            chunk_off = np.frombuffer(
                mv[stco[0] + 8:stco[0] + 8 + 4 * nc], ">u4").astype(np.int64)
        else:
            co64 = _find(mv, *stbl, b"co64")
            if not co64:
                raise Mp4Error("chunk offsets missing (stco/co64)")
            nc = struct.unpack_from(">I", mv, co64[0] + 4)[0]
            chunk_off = np.frombuffer(
                mv[co64[0] + 8:co64[0] + 8 + 8 * nc], ">u8").astype(np.int64)
        # ---- chunk → sample mapping (stsc runs)
        stsc = _find(mv, *stbl, b"stsc")
        if not stsc:
            raise Mp4Error("stsc missing")
        ne = struct.unpack_from(">I", mv, stsc[0] + 4)[0]
        ent = np.frombuffer(
            mv[stsc[0] + 8:stsc[0] + 8 + 12 * ne], ">u4"
        ).astype(np.int64).reshape(ne, 3)      # first_chunk, spc, sdi
        if ne == 0 or int(ent[0, 0]) != 1:
            raise Mp4Error("stsc first run must start at chunk 1")
        per_chunk = np.zeros(len(chunk_off), np.int64)
        for i in range(ne):
            first = int(ent[i, 0]) - 1
            last = int(ent[i + 1, 0]) - 1 if i + 1 < ne else len(chunk_off)
            per_chunk[first:last] = ent[i, 1]
        if per_chunk.sum() < n_samples:
            raise Mp4Error("stsc maps fewer samples than stsz declares")
        # resolve every sample's absolute offset
        s_chunk = np.repeat(np.arange(len(chunk_off)), per_chunk)[:n_samples]
        csum = np.r_[0, np.cumsum(sizes)]
        first_of_chunk = np.r_[
            0, np.cumsum(per_chunk)][:-1].clip(max=n_samples)
        within = csum[:-1] - csum[first_of_chunk[s_chunk]]
        offsets = chunk_off[s_chunk] + within
        # ---- timing (stts)
        stts = _find(mv, *stbl, b"stts")
        fps = 0.0
        if stts and mts:
            ns = struct.unpack_from(">I", mv, stts[0] + 4)[0]
            tt = np.frombuffer(
                mv[stts[0] + 8:stts[0] + 8 + 8 * ns], ">u4"
            ).astype(np.int64).reshape(ns, 2)
            total = int((tt[:, 0] * tt[:, 1]).sum())
            if total:
                fps = float(mts) * n_samples / total
        out["tracks"].append({
            "handler": handler.decode("latin-1"),
            "fourcc": entry_fourcc,
            "width": int(w), "height": int(h),
            "n_samples": int(n_samples),
            "media_timescale": int(mts),
            "media_duration": int(mdur),
            "fps": fps,
            "sample_offsets": offsets,
            "sample_sizes": sizes,
        })
    if not out["tracks"]:
        raise Mp4Error("no readable track")
    return out


def decode_mp4(raw: bytes) -> tuple[np.ndarray, int]:
    """(frames (n, h, w) uint8, fps) from the first video track.  Only
    the ``raw `` 8-bit-gray sample entry decodes; coded tracks raise
    with their fourcc so the caller can DLQ informatively."""
    meta = parse_mp4(raw)
    vid = next((t for t in meta["tracks"] if t["handler"] == "vide"), None)
    if vid is None:
        raise Mp4Error("no video track")
    if vid["fourcc"] != "raw ":
        raise Mp4Error(
            f"coded video track {vid['fourcc']!r} requires a codec (only "
            "'raw ' 8-bit grayscale decodes)")
    h, w = vid["height"], vid["width"]
    if h <= 0 or w <= 0:
        raise Mp4Error("bad raw track dimensions")
    n = vid["n_samples"]
    if not (vid["sample_sizes"] == h * w).all():
        raise Mp4Error("raw sample size != h*w plane")
    mv = memoryview(raw)
    frames = np.empty((n, h, w), np.uint8)
    for i, off in enumerate(vid["sample_offsets"]):
        off = int(off)
        if off + h * w > len(mv):
            raise Mp4Error("sample raster truncated")
        frames[i] = np.frombuffer(
            mv[off:off + h * w], np.uint8).reshape(h, w)
    fps = int(round(vid["fps"])) if vid["fps"] else 0
    if fps <= 0:
        raise Mp4Error("unusable frame timing (stts/mdhd)")
    return frames, fps
