"""Baseline JPEG codec (jpeglite) — round-trip PSNR, spec golden vector,
subsampling, restart markers, DLQ routing for non-baseline streams."""

import struct

import numpy as np
import pytest

from hydra_ray.jpeglite import (
    JpegError,
    UnsupportedJpeg,
    decode_jpeg,
    encode_jpeg,
)


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(255.0**2 / mse) if mse else np.inf


@pytest.fixture(scope="module")
def smooth_rgb():
    yy, xx = np.mgrid[0:96, 0:80]
    return np.stack([
        128 + 90 * np.sin(xx / 17.0),
        128 + 90 * np.cos(yy / 13.0),
        128 + 60 * np.sin((xx + yy) / 23.0),
    ], axis=-1).astype(np.uint8)


def test_roundtrip_color_444(smooth_rgb):
    enc = encode_jpeg(smooth_rgb, quality=90)
    assert enc[:2] == b"\xff\xd8" and enc[-2:] == b"\xff\xd9"
    dec = decode_jpeg(enc)
    assert dec.shape == smooth_rgb.shape
    assert _psnr(smooth_rgb, dec) > 35.0
    # smaller than raw
    assert len(enc) < smooth_rgb.size


def test_roundtrip_color_420(smooth_rgb):
    dec = decode_jpeg(encode_jpeg(smooth_rgb, quality=90, subsample="420"))
    assert dec.shape == smooth_rgb.shape
    assert _psnr(smooth_rgb, dec) > 30.0


def test_roundtrip_gray():
    yy, xx = np.mgrid[0:64, 0:64]
    g = (128 + 90 * np.sin(xx / 15.0) * np.cos(yy / 12.0)).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(g, quality=90))
    assert dec.shape == g.shape and dec.ndim == 2
    assert _psnr(g, dec) > 35.0


def test_non_multiple_of_8_dims(smooth_rgb):
    img = smooth_rgb[:37, :61]
    for sub in ("444", "420"):
        dec = decode_jpeg(encode_jpeg(img, quality=90, subsample=sub))
        assert dec.shape == img.shape, sub


def test_restart_markers(smooth_rgb):
    enc = encode_jpeg(smooth_rgb, quality=90, restart_interval=3)
    assert b"\xff\xdd" in enc                      # DRI emitted
    assert any(bytes([0xFF, 0xD0 + i]) in enc for i in range(8))
    ref = decode_jpeg(encode_jpeg(smooth_rgb, quality=90))
    got = decode_jpeg(enc)
    # restart path decodes to the same pixels as the plain path
    assert np.array_equal(ref, got)


def test_quality_monotone(smooth_rgb):
    sizes = [len(encode_jpeg(smooth_rgb, quality=q)) for q in (30, 60, 95)]
    assert sizes[0] < sizes[1] < sizes[2]


def test_golden_handmade_dc_only_block():
    """Hand-assembled 8×8 grayscale JPEG (bitstream written from the
    T.81 spec by hand, independent of our encoder): quant table all 8s,
    single block, DC value 64, no AC.  Every decoded sample must be
    128 + 64·8/8 = 192."""
    # DC luma size-7 code (Annex K canonical) = 11110; magnitude 64 =
    # 1000000; AC EOB = 1010 → bits 11110_1000000_1010 = 0xF4 0x0A
    qt = bytes([0]) + bytes([8] * 64)
    dqt = b"\xff\xdb" + struct.pack(">H", 2 + len(qt)) + qt
    sof = (b"\xff\xc0" + struct.pack(">H", 11)
           + bytes([8]) + struct.pack(">HH", 8, 8)
           + bytes([1, 1, 0x11, 0]))
    from hydra_ray.jpeglite import HT_AC_LUMA, HT_DC_LUMA

    def dht(tc, th, tab):
        body = bytes([(tc << 4) | th]) + bytes(tab[0]) + bytes(tab[1])
        return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body

    sos = (b"\xff\xda" + struct.pack(">H", 8)
           + bytes([1, 1, 0x00, 0, 63, 0]))
    raw = (b"\xff\xd8" + dqt + sof + dht(0, 0, HT_DC_LUMA)
           + dht(1, 0, HT_AC_LUMA) + sos + b"\xf4\x0a" + b"\xff\xd9")
    dec = decode_jpeg(raw)
    assert dec.shape == (8, 8)
    assert np.all(dec == 192)


def test_progressive_rejected(smooth_rgb):
    enc = bytearray(encode_jpeg(smooth_rgb, quality=80))
    i = enc.find(b"\xff\xc0")
    enc[i + 1] = 0xC2                              # SOF0 → SOF2
    with pytest.raises(UnsupportedJpeg, match="SOF2"):
        decode_jpeg(bytes(enc))


def test_malformed_rejected(smooth_rgb):
    with pytest.raises(JpegError):
        decode_jpeg(b"not a jpeg at all")
    enc = encode_jpeg(smooth_rgb, quality=80)
    with pytest.raises(JpegError):
        decode_jpeg(enc[: len(enc) // 3])          # truncated entropy data
    # 12-bit precision rejected
    e2 = bytearray(enc)
    i = e2.find(b"\xff\xc0")
    e2[i + 4] = 12
    with pytest.raises(UnsupportedJpeg, match="12-bit"):
        decode_jpeg(bytes(e2))


def test_horizontal_orientation():
    """An image varying only along x must decode varying only along x —
    catches any row/column transposition in the DCT or block layout."""
    ramp = np.tile(np.linspace(40, 215, 48).astype(np.uint8), (32, 1))
    dec = decode_jpeg(encode_jpeg(ramp, quality=95))
    assert dec.shape == (32, 48)
    col_spread = dec.astype(float).mean(axis=0).ptp()
    row_spread = dec.astype(float).mean(axis=1).ptp()
    assert col_spread > 150 and row_spread < 3


def test_image_decoder_stage_jpeg(ray_session):
    """ImageDecoder runs on jpeg rows (real decode, features populated);
    progressive jpeg rows land in the DLQ column."""
    import pyarrow as pa
    import ray.data as rd

    from hydra_ray.stages.multimodal import IMAGE_SCHEMA, ImageDecoder

    yy, xx = np.mgrid[0:48, 0:40]
    img = np.stack([
        128 + 80 * np.sin(xx / 9.0),
        128 + 80 * np.cos(yy / 7.0),
        np.full_like(xx, 64, dtype=np.float64),
    ], axis=-1).astype(np.uint8)
    good = encode_jpeg(img, quality=85)
    prog = bytearray(good)
    i = prog.find(b"\xff\xc0")
    prog[i + 1] = 0xC2
    t = pa.table({
        "image_id": ["ok", "prog", "junk"],
        "bytes": pa.array([good, bytes(prog), b"\x00\x01"], pa.large_binary()),
        "format": ["jpeg", "jpeg", "jpeg"],
    }, schema=IMAGE_SCHEMA)
    out = (
        rd.from_arrow(t)
        .map_batches(ImageDecoder(), batch_format="pyarrow", batch_size=4)
        .to_pandas()
        .set_index("image_id")
    )
    assert out.loc["ok", "decode_error"] is None
    assert out.loc["ok", "width"] == 40 and out.loc["ok", "height"] == 48
    assert out.loc["ok", "brightness"] > 0
    assert "SOF2" in out.loc["prog", "decode_error"]
    assert out.loc["junk", "decode_error"] is not None


def test_image_resize_stage_jpeg_stays_jpeg(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from hydra_ray.stages.multimodal import (
        IMAGE_SCHEMA,
        ImageResize,
        decode_image,
    )

    yy, xx = np.mgrid[0:96, 0:96]
    img = np.stack([
        128 + 70 * np.sin(xx / 19.0),
        128 + 70 * np.cos(yy / 17.0),
        128 + 50 * np.sin((xx - yy) / 29.0),
    ], axis=-1).astype(np.uint8)
    t = pa.table({
        "image_id": ["a"],
        "bytes": pa.array([encode_jpeg(img, quality=90)], pa.large_binary()),
        "format": ["jpeg"],
    }, schema=IMAGE_SCHEMA)
    out = (
        rd.from_arrow(t)
        .map_batches(ImageResize(out_h=32, out_w=32), batch_format="pyarrow")
        .to_pandas()
    )
    assert out["format"].iloc[0] == "jpeg"
    small = decode_image(out["bytes"].iloc[0], "jpeg")
    assert small.shape == (32, 32, 3)
    # the resized jpeg still resembles a block-mean downsample
    ref = np.stack([
        np.clip(np.rint(_block_mean(img[:, :, c].astype(np.float32), 32, 32)),
                0, 255)
        for c in range(3)
    ], axis=2)
    assert _psnr(ref.astype(np.uint8), small) > 28.0


def _block_mean(plane, th, tw):
    from hydra_ray.stages.multimodal import block_thumbnail

    return block_thumbnail(plane, th, tw)


def test_fuzz_roundtrip_random_sizes():
    """Round-trip never crashes and keeps reasonable fidelity across odd
    sizes, both subsamplings, gray/color, extreme qualities."""
    rng = np.random.default_rng(42)
    for _ in range(12):
        h = int(rng.integers(1, 70))
        w = int(rng.integers(1, 70))
        gray = bool(rng.integers(0, 2))
        q = int(rng.choice([5, 45, 85, 100]))
        sub = str(rng.choice(["444", "420"]))
        yy, xx = np.mgrid[0:h, 0:w]
        base = 128 + 60 * np.sin(xx / 7.0) * np.cos(yy / 5.0)
        if gray:
            img = base.astype(np.uint8)
            dec = decode_jpeg(encode_jpeg(img, quality=q))
        else:
            img = np.stack([base, 255 - base, np.full_like(base, 90)],
                           axis=-1).astype(np.uint8)
            dec = decode_jpeg(encode_jpeg(img, quality=q, subsample=sub))
        assert dec.shape == img.shape, (h, w, gray, q, sub)
        # even at q=5 a smooth image stays recognizable
        assert _psnr(img, dec) > 15.0, (h, w, gray, q, sub)
