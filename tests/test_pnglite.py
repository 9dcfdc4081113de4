"""pnglite spec conformance: encode/decode round-trips, an all-filters
golden stream built by an independent per-byte spec-pseudocode filterer,
palette / alpha handling, and unsupported/malformed routing.

No third-party PNG decoder exists in this sandbox, so (as with jpeglite
and flaclite) the independent oracle is a naive reference implementation
of the spec's filter pseudocode written here in the test — decode must
invert it for every filter type."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from hydra_ray.pnglite import PngError, UnsupportedPng, decode_png, encode_png

SIG = b"\x89PNG\r\n\x1a\n"


def chunk(typ: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))


def build_png(w, h, ctype, raw_rows: bytes, depth=8, interlace=0,
              plte: bytes | None = None) -> bytes:
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace)
    out = SIG + chunk(b"IHDR", ihdr)
    if plte is not None:
        out += chunk(b"PLTE", plte)
    out += chunk(b"IDAT", zlib.compress(raw_rows))
    return out + chunk(b"IEND", b"")


def ref_filter_row(ft, cur, prev, bpp):
    """Spec pseudocode, per byte: Filt(x) from Orig(x)."""
    n = len(cur)
    out = bytearray(n)
    for x in range(n):
        a = cur[x - bpp] if x >= bpp else 0       # left
        b = prev[x]                                # up
        c = prev[x - bpp] if x >= bpp else 0       # upper-left
        if ft == 0:
            f = cur[x]
        elif ft == 1:
            f = (cur[x] - a) % 256
        elif ft == 2:
            f = (cur[x] - b) % 256
        elif ft == 3:
            f = (cur[x] - (a + b) // 2) % 256
        else:  # Paeth
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            f = (cur[x] - pred) % 256
        out[x] = f
    return bytes(out)


def test_roundtrip_gray_and_rgb():
    rng = np.random.default_rng(11)
    for shape in ((1, 1), (7, 5), (16, 16, 3), (3, 31, 3)):
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        out = decode_png(encode_png(img))
        np.testing.assert_array_equal(out, img)


def test_all_filters_golden():
    """One image, each row filtered with a different filter type by the
    per-byte reference — decode must reproduce the original exactly."""
    rng = np.random.default_rng(3)
    for bpp, ctype in ((1, 0), (3, 2)):
        w, h = 9, 5
        img = rng.integers(0, 256, size=(h, w * bpp), dtype=np.uint8)
        rows = bytearray()
        prev = bytes(w * bpp)
        for y in range(h):
            ft = y % 5
            cur = img[y].tobytes()
            rows += bytes([ft]) + ref_filter_row(ft, cur, prev, bpp)
            prev = cur
        got = decode_png(build_png(w, h, ctype, bytes(rows)))
        expect = img.reshape(h, w) if bpp == 1 else img.reshape(h, w, 3)
        np.testing.assert_array_equal(got, expect)


def test_multi_idat_and_ancillary_chunks():
    img = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    rows = b"".join(b"\x00" + img[y].tobytes() for y in range(4))
    z = zlib.compress(rows)
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)
    raw = (SIG + chunk(b"IHDR", ihdr) + chunk(b"tEXt", b"k\x00v")
           + chunk(b"IDAT", z[:7]) + chunk(b"IDAT", z[7:])
           + chunk(b"IEND", b""))
    np.testing.assert_array_equal(decode_png(raw), img)


def test_palette_expansion():
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 7, 8, 9])
    idx = np.array([[0, 1], [2, 3]], np.uint8)
    rows = b"".join(b"\x00" + idx[y].tobytes() for y in range(2))
    got = decode_png(build_png(2, 2, 3, rows, plte=plte))
    expect = np.frombuffer(plte, np.uint8).reshape(4, 3)[idx.reshape(-1)]
    np.testing.assert_array_equal(got, expect.reshape(2, 2, 3))
    # palette index past PLTE end is malformed
    rows_bad = b"\x00" + bytes([9, 9]) + b"\x00" + bytes([0, 0])
    with pytest.raises(PngError):
        decode_png(build_png(2, 2, 3, rows_bad, plte=plte))


def test_alpha_is_discarded():
    rng = np.random.default_rng(5)
    rgba = rng.integers(0, 256, size=(3, 4, 4), dtype=np.uint8)
    rows = b"".join(b"\x00" + rgba[y].tobytes() for y in range(3))
    got = decode_png(build_png(4, 3, 6, rows))
    np.testing.assert_array_equal(got, rgba[:, :, :3])
    ga = rng.integers(0, 256, size=(2, 3, 2), dtype=np.uint8)
    rows = b"".join(b"\x00" + ga[y].tobytes() for y in range(2))
    got = decode_png(build_png(3, 2, 4, rows))
    np.testing.assert_array_equal(got, ga[:, :, 0])


def test_unsupported_routes():
    img = np.zeros((2, 2), np.uint8)
    ok = encode_png(img)
    rows = b"\x00\x00\x00" * 2
    with pytest.raises(UnsupportedPng):
        decode_png(build_png(2, 2, 0, rows, interlace=1))
    with pytest.raises(UnsupportedPng):
        decode_png(build_png(2, 2, 0, rows * 2, depth=16))
    # unknown CRITICAL chunk → unsupported; ancillary is skipped (above)
    parts = ok.split(chunk(b"IEND", b""))
    with_critical = parts[0] + chunk(b"CrIT", b"x") + chunk(b"IEND", b"")
    with pytest.raises(UnsupportedPng):
        decode_png(with_critical)


def test_malformed_routes():
    img = np.zeros((2, 3), np.uint8)
    ok = encode_png(img)
    with pytest.raises(PngError):
        decode_png(b"NOPE" + ok[4:])           # bad signature
    bad_crc = bytearray(ok)
    bad_crc[-5] ^= 0xFF                        # corrupt IEND CRC
    with pytest.raises(PngError):
        decode_png(bytes(bad_crc))
    with pytest.raises(PngError):
        decode_png(ok[:30])                    # truncated
    # wrong decompressed length (one row short)
    rows = b"\x00" + bytes(3)
    with pytest.raises(PngError):
        decode_png(build_png(3, 2, 0, rows))
    # unknown filter type
    rows = b"\x07" + bytes(3) + b"\x00" + bytes(3)
    with pytest.raises(PngError):
        decode_png(build_png(3, 2, 0, rows))


def test_image_decoder_handles_png(ray_session):
    """Integration: png rows flow through ImageDecoder with no DLQ and
    match the ppm-encoded decode of the same pixels."""
    import pyarrow as pa
    import ray.data as rd

    from hydra_ray.stages.multimodal import ImageDecoder, encode_ppm

    rng = np.random.default_rng(9)
    imgs = [rng.integers(0, 256, size=(12, 10, 3), dtype=np.uint8)
            for _ in range(6)]
    t = pa.table({
        "image_id": pa.array([f"i{k}" for k in range(12)]),
        "bytes": pa.array(
            [encode_png(im) for im in imgs] + [encode_ppm(im) for im in imgs],
            pa.large_binary()),
        "format": pa.array(["png"] * 6 + ["ppm"] * 6),
    })
    out = (rd.from_arrow(t)
           .map_batches(ImageDecoder(), batch_format="pyarrow")
           .to_pandas().set_index("image_id"))
    assert out["decode_error"].isna().all()
    for k in range(6):
        a, b = out.loc[f"i{k}"], out.loc[f"i{k + 6}"]
        assert a["dhash"] == b["dhash"] and a["width"] == b["width"]


def test_image_resize_keeps_png(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from hydra_ray.stages.multimodal import ImageResize

    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, size=(40, 40, 3), dtype=np.uint8)
    t = pa.table({
        "image_id": pa.array(["a"]),
        "bytes": pa.array([encode_png(img)], pa.large_binary()),
        "format": pa.array(["png"]),
    })
    out = (rd.from_arrow(t)
           .map_batches(ImageResize(8, 8), batch_format="pyarrow")
           .to_pandas())
    assert out.loc[0, "format"] == "png"
    small = decode_png(out.loc[0, "bytes"])
    assert small.shape == (8, 8, 3)
