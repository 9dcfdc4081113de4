"""Pure-spec PNG codec (stdlib zlib + numpy, no third-party code).

Closes the last real-image-format gap in `stages/multimodal.py`: png was
a DLQ-routed stub because PIL isn't in this build, but PNG's only
external dependency is DEFLATE — which the Python stdlib ships.  This
module implements the public W3C PNG specification (RFC 2083):

- DECODE: 8-bit samples, color types 0 (gray), 2 (RGB), 3 (palette),
  4 (gray+alpha) and 6 (RGBA); all five scanline filters (None / Sub /
  Up / Average / Paeth); multi-IDAT streams; per-chunk CRC-32
  verification.  Alpha is discarded after unfiltering (the downstream
  feature/thumbnail stages are gray/RGB-only — same convention as the
  BMP/JPEG paths).  Interlaced (Adam7), 1/2/4/16-bit depths and unknown
  critical chunks raise ``UnsupportedPng``; malformed streams raise
  ``PngError`` — callers DLQ-route both exactly like the old stub.
- ENCODE: 8-bit grayscale or RGB, filter 0 scanlines, one zlib IDAT —
  minimal, valid, deterministic output (fixed compression level).

Performance shape: rows filtered with None/Sub/Up unfilter as whole-row
numpy ops (Sub is a modular ``np.add.accumulate`` over the per-channel
byte chains); Average/Paeth carry an inherent left-pixel data dependency,
so those rows run a per-pixel loop vectorized across channels — the same
sequential-inner-loop situation as the Huffman walk in `jpeglite.py`.
Corpus-level parallelism comes from the `map_batches` decode stage, one
image per row.

Reference has no image handling at all (payloads are opaque Avro bytes,
`avro/src/main/java/com/pluralsight/hydra/avro/JsonConverter.java`);
this is a beyond-reference component of the multimodal tier.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = ["PngError", "UnsupportedPng", "decode_png", "encode_png"]

_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# color type → samples per pixel (before alpha stripping)
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


class PngError(ValueError):
    """Malformed PNG payload."""


class UnsupportedPng(PngError):
    """Valid-looking PNG outside the supported subset (interlace,
    non-8-bit depth, exotic chunks)."""


# ------------------------------------------------------------- chunks
def _iter_chunks(raw: bytes):
    """Yield (type, data) for every chunk, verifying length and CRC-32."""
    if raw[:8] != _SIGNATURE:
        raise PngError("bad PNG signature")
    pos, n = 8, len(raw)
    while pos < n:
        if pos + 8 > n:
            raise PngError("truncated chunk header")
        (length,) = struct.unpack(">I", raw[pos:pos + 4])
        typ = raw[pos + 4:pos + 8]
        end = pos + 8 + length
        if end + 4 > n:
            raise PngError(f"truncated {typ!r} chunk")
        data = raw[pos + 8:end]
        (crc,) = struct.unpack(">I", raw[end:end + 4])
        if zlib.crc32(typ + data) & 0xFFFFFFFF != crc:
            raise PngError(f"CRC mismatch in {typ!r} chunk")
        yield typ, data
        pos = end + 4
        if typ == b"IEND":
            return
    raise PngError("missing IEND chunk")


# ----------------------------------------------------------- unfilter
def _unfilter_sub(row: np.ndarray, bpp: int) -> np.ndarray:
    # recon[x] = raw[x] + recon[x-bpp]: per-channel modular prefix sum
    rec = row.reshape(-1, bpp).copy()
    np.add.accumulate(rec, axis=0, dtype=np.uint8, out=rec)
    return rec.reshape(-1)


def _unfilter_avg(row: np.ndarray, prev: np.ndarray, bpp: int) -> np.ndarray:
    r = row.reshape(-1, bpp).astype(np.uint16)
    p = prev.reshape(-1, bpp).astype(np.uint16)
    out = np.empty_like(r)
    left = np.zeros(bpp, np.uint16)
    for i in range(r.shape[0]):
        left = (r[i] + ((left + p[i]) >> 1)) & 0xFF
        out[i] = left
    return out.astype(np.uint8).reshape(-1)


def _unfilter_paeth(row: np.ndarray, prev: np.ndarray, bpp: int) -> np.ndarray:
    r = row.reshape(-1, bpp).astype(np.int32)
    p = prev.reshape(-1, bpp).astype(np.int32)
    out = np.empty_like(r)
    left = np.zeros(bpp, np.int32)
    ul = np.zeros(bpp, np.int32)
    for i in range(r.shape[0]):
        up = p[i]
        # predictor distances: pr = left+up-ul; pa=|pr-left| pb=|pr-up| pc=|pr-ul|
        pa_ = np.abs(up - ul)
        pb = np.abs(left - ul)
        pc_ = np.abs(left + up - 2 * ul)
        pred = np.where((pa_ <= pb) & (pa_ <= pc_), left,
                        np.where(pb <= pc_, up, ul))
        left = (r[i] + pred) & 0xFF
        out[i] = left
        ul = up
    return out.astype(np.uint8).reshape(-1)


def _unfilter(flat: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    rows = flat.reshape(h, 1 + stride)
    out = np.empty((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    for y in range(h):
        ft = int(rows[y, 0])
        row = rows[y, 1:]
        if ft == 0:
            rec = row
        elif ft == 1:
            rec = _unfilter_sub(row, bpp)
        elif ft == 2:
            rec = row + prev  # uint8 wraps mod 256
        elif ft == 3:
            rec = _unfilter_avg(row, prev, bpp)
        elif ft == 4:
            rec = _unfilter_paeth(row, prev, bpp)
        else:
            raise PngError(f"unknown scanline filter {ft}")
        out[y] = rec
        prev = out[y]
    return out


# --------------------------------------------------------------- API
def decode_png(raw: bytes) -> np.ndarray:
    """Decode a PNG payload → uint8 array, ``(h, w)`` gray or
    ``(h, w, 3)`` RGB (palette expanded, alpha discarded)."""
    chunks = _iter_chunks(bytes(raw))
    try:
        typ, data = next(chunks)
    except StopIteration:
        raise PngError("empty PNG stream")
    if typ != b"IHDR" or len(data) != 13:
        raise PngError("first chunk is not a valid IHDR")
    w, h, depth, ctype, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", data)
    if w == 0 or h == 0:
        raise PngError("zero-dimension image")
    if comp != 0 or filt != 0:
        raise PngError("unknown compression/filter method")
    if interlace == 1:
        raise UnsupportedPng("Adam7 interlace not supported")
    if interlace != 0:
        raise PngError(f"unknown interlace method {interlace}")
    if ctype not in _CHANNELS:
        raise PngError(f"unknown color type {ctype}")
    if depth != 8:
        raise UnsupportedPng(f"bit depth {depth} not supported (8 only)")

    palette = None
    idat = []
    for typ, data in chunks:
        if typ == b"IDAT":
            idat.append(data)
        elif typ == b"PLTE":
            if len(data) % 3 or not 3 <= len(data) <= 768:
                raise PngError("bad PLTE length")
            palette = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif typ == b"IEND":
            break
        elif typ[0] & 0x20 == 0:  # critical chunk we don't know
            raise UnsupportedPng(f"critical chunk {typ!r} not supported")
        # ancillary chunks (tEXt, gAMA, tRNS, …) are skipped
    if not idat:
        raise PngError("no IDAT data")
    if ctype == 3 and palette is None:
        raise PngError("palette image without PLTE")

    try:
        flat_bytes = zlib.decompress(b"".join(idat))
    except zlib.error as e:
        raise PngError(f"IDAT inflate failed: {e}")
    bpp = _CHANNELS[ctype]
    stride = w * bpp
    if len(flat_bytes) != h * (1 + stride):
        raise PngError("decompressed length does not match dimensions")
    flat = np.frombuffer(flat_bytes, np.uint8)
    img = _unfilter(flat, h, stride, bpp).reshape(h, w, bpp)

    if ctype == 0:
        return img[:, :, 0]
    if ctype == 2:
        return img
    if ctype == 3:
        idx = img[:, :, 0]
        if int(idx.max(initial=0)) >= len(palette):
            raise PngError("palette index out of range")
        return palette[idx]
    if ctype == 4:  # gray + alpha → gray
        return img[:, :, 0]
    return img[:, :, :3]  # RGBA → RGB


def encode_png(arr: np.ndarray, level: int = 6) -> bytes:
    """Encode an 8-bit ``(h, w)`` gray or ``(h, w, 3)`` RGB array as a
    minimal valid PNG (filter-0 scanlines, single zlib IDAT)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        ctype, bpp = 0, 1
        h, w = arr.shape
        body = arr.reshape(h, w)
    elif arr.ndim == 3 and arr.shape[2] == 3:
        ctype, bpp = 2, 3
        h, w = arr.shape[:2]
        body = arr.reshape(h, w * 3)
    else:
        raise ValueError(f"encode_png wants (h,w) or (h,w,3), got {arr.shape}")
    if h == 0 or w == 0:
        raise ValueError("zero-dimension image")

    rows = np.empty((h, 1 + w * bpp), np.uint8)
    rows[:, 0] = 0  # filter: None
    rows[:, 1:] = body

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    idat = zlib.compress(rows.tobytes(), level)
    return (_SIGNATURE + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat)
            + chunk(b"IEND", b""))
