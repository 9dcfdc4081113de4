"""Multimodal operators: real PPM/PGM/BMP decode, features, dHash,
raw-video frame sampling — plus honest stub routing for PIL/ffmpeg
formats."""

import numpy as np
import pyarrow as pa
import pytest

from hydra_ray.pnglite import encode_png
from hydra_ray.stages.multimodal import (
    FrameSampler,
    ImageDecoder,
    block_thumbnail,
    decode_image,
    dhash64,
    encode_bmp,
    encode_pgm,
    encode_ppm,
    encode_rawv,
)


def _synth_rgb(seed: int, h: int = 48, w: int = 64) -> np.ndarray:
    y, x = np.mgrid[0:h, 0:w]
    r = (x * 255 // max(w - 1, 1)).astype(np.uint8)
    g = (y * 255 // max(h - 1, 1)).astype(np.uint8)
    b = ((x * y + seed * 37) % 256).astype(np.uint8)
    return np.stack([r, g, b], axis=-1)


def test_ppm_pgm_bmp_roundtrip_exact():
    rgb = _synth_rgb(1)
    assert np.array_equal(decode_image(encode_ppm(rgb), "ppm"), rgb)
    assert np.array_equal(decode_image(encode_bmp(rgb), "bmp"), rgb)
    gray = rgb[:, :, 1]
    assert np.array_equal(decode_image(encode_pgm(gray), "pgm"), gray)


def test_image_decoder_stage_features_and_errors():
    imgs = [
        ("a", encode_ppm(_synth_rgb(0)), "ppm"),
        ("b", encode_bmp(_synth_rgb(1)), "bmp"),
        ("c", encode_pgm(_synth_rgb(2)[:, :, 0]), "pgm"),
        ("d", encode_png(_synth_rgb(3)), "png"),  # real since pnglite
        ("e", b"garbage", "ppm"),              # malformed
    ]
    batch = pa.table(
        {
            "image_id": pa.array([i[0] for i in imgs]),
            "bytes": pa.array([i[1] for i in imgs], pa.large_binary()),
            "format": pa.array([i[2] for i in imgs]),
        }
    )
    out = ImageDecoder()(batch)
    errs = out["decode_error"].to_pylist()
    assert errs[:4] == [None, None, None, None]
    assert errs[4] is not None
    assert out["width"].to_pylist()[:4] == [64, 64, 64, 64]
    assert out["height"].to_pylist()[:4] == [48, 48, 48, 48]
    # brightness of the gradient image is mid-range
    b = out["brightness"].to_pylist()[0]
    assert 100 < b < 160


def test_dhash_near_dup_property():
    """dHash: small brightness shift ≈ same hash; unrelated image far."""
    base = _synth_rgb(3).astype(np.int32)
    lum0 = (0.299 * base[:, :, 0] + 0.587 * base[:, :, 1] + 0.114 * base[:, :, 2])
    shifted = np.clip(lum0 + 10, 0, 255)  # brightness shift
    other = np.random.default_rng(0).integers(0, 256, lum0.shape).astype(np.float64)

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    h0, h1, h2 = dhash64(lum0), dhash64(shifted), dhash64(other)
    assert ham(h0, h1) <= 4
    assert ham(h0, h2) >= 16


def test_block_thumbnail_constant_regions():
    img = np.zeros((32, 32), np.float64)
    img[:, 16:] = 200.0
    t = block_thumbnail(img, 8, 8)
    assert np.allclose(t[:, :4], 0.0) and np.allclose(t[:, 4:], 200.0)


def test_frame_sampler_rawv_and_stub():
    nf, h, w, fps = 24, 16, 16, 12
    frames = np.zeros((nf, h, w), np.uint8)
    for f in range(nf):
        frames[f] = (f * 10) % 256  # brightness ramps per frame
    batch = pa.table(
        {
            "video_id": pa.array(["v1", "v2"]),
            "bytes": pa.array([encode_rawv(frames, fps), b"\x00\x00"], pa.large_binary()),
            "format": pa.array(["rawv", "webm"]),
        }
    )
    out = FrameSampler(stride_ms=1000)(batch)
    df = out.to_pandas()
    ok = df[df["decode_error"].isna()]
    err = df[~df["decode_error"].isna()]
    # stride 1000ms at 12 fps → every 12th frame → frames 0 and 12
    assert ok["frame_idx"].tolist() == [0, 12]
    assert ok["frame_ts_ms"].tolist() == [0, 1000]
    assert ok["brightness"].tolist() == [0.0, 120.0]
    assert ok["motion"].tolist()[1] == 120.0
    # a malformed webm DLQs through the REAL EBML demuxer now
    assert len(err) == 1 and "MkvError" in err["decode_error"].iloc[0]
    # a malformed mp4 payload DLQs through the real demuxer now
    bad = pa.table({"video_id": pa.array(["v3"]),
                    "bytes": pa.array([b"\x00\x00"], pa.large_binary()),
                    "format": pa.array(["mp4"])})
    dfe = FrameSampler()(bad).to_pandas()
    assert "Mp4Error" in dfe["decode_error"].iloc[0]


def test_image_pipeline_on_dataset(ray_session):
    """Actor-pool plumbing: decode+features over a Dataset with DLQ split."""
    import ray.data as rd

    rows = []
    for i in range(40):
        fmt = ("ppm", "bmp", "pgm", "png")[i % 4]
        rgb = _synth_rgb(i)
        if fmt == "ppm":
            payload = encode_ppm(rgb)
        elif fmt == "bmp":
            payload = encode_bmp(rgb)
        elif fmt == "pgm":
            payload = encode_pgm(rgb[:, :, 0])
        else:
            payload = b"\x89PNG"
        rows.append({"image_id": f"img-{i}", "bytes": payload, "format": fmt})
    tbl = pa.table(
        {
            "image_id": pa.array([r["image_id"] for r in rows]),
            "bytes": pa.array([r["bytes"] for r in rows], pa.large_binary()),
            "format": pa.array([r["format"] for r in rows]),
        }
    )
    ds = rd.from_arrow(tbl).map_batches(
        ImageDecoder(), batch_format="pyarrow", batch_size=8
    )
    out = ds.to_arrow_refs()
    import ray

    got = pa.concat_tables(ray.get(out))
    ok = got.filter(pa.compute.is_null(got["decode_error"]))
    bad = got.filter(pa.compute.is_valid(got["decode_error"]))
    assert ok.num_rows == 30 and bad.num_rows == 10
    th = ok["thumbnail"].combine_chunks()
    assert th.flatten().to_numpy(zero_copy_only=False).shape[0] == 30 * 64


def test_image_neardup_query_finds_planted(ray_session):
    """q_image_neardup: brightness-shifted copies pair with their source
    at small Hamming distance; unrelated images don't flood the result."""
    from hydra_ray.pipelines.batch_queries import q_image_neardup

    out = q_image_neardup("/root/testdata/sf0.001").to_pandas()
    # planted pairs are (img-(3k), img-(3k+1)); 100 planted in 300 images
    planted = 0
    for _, r in out.iterrows():
        a, b = sorted([r["id_a"], r["id_b"]])
        ia, ib = int(a.split("-")[1]), int(b.split("-")[1])
        if ib == ia + 1 and ib % 3 == 1:
            planted += 1
    assert planted >= 90, (planted, len(out))
    assert len(out) <= 3 * planted  # not flooded by false positives


def test_malformed_headers_route_to_dlq_not_crash():
    """Corrupt-but-plausible headers must land in decode_error, never
    abort the stage (code-review regression)."""
    imgs = [
        ("bad-pnm", b"P6\nx y\n255\n" + b"\x00" * 32, "ppm"),
        ("bad-bmp-neg", b"BM" + b"\x00" * 8 + b"\x36\x00\x00\x00"
         + b"\x28\x00\x00\x00" + (-5).to_bytes(4, "little", signed=True)
         + (4).to_bytes(4, "little") + b"\x01\x00\x18\x00" + b"\x00" * 24, "bmp"),
        ("ok", encode_ppm(_synth_rgb(0)), "ppm"),
    ]
    batch = pa.table(
        {
            "image_id": pa.array([i[0] for i in imgs]),
            "bytes": pa.array([i[1] for i in imgs], pa.large_binary()),
            "format": pa.array([i[2] for i in imgs]),
        }
    )
    out = ImageDecoder()(batch)
    errs = out["decode_error"].to_pylist()
    assert errs[0] is not None and errs[1] is not None and errs[2] is None


def test_rawv_zero_fps_routed():
    import struct as _struct

    bad = b"RAWV" + _struct.pack("<HHHI", 2, 2, 0, 1) + b"\x00" * 4
    batch = pa.table(
        {
            "video_id": pa.array(["v"]),
            "bytes": pa.array([bad], pa.large_binary()),
            "format": pa.array(["rawv"]),
        }
    )
    out = FrameSampler()(batch).to_pandas()
    assert "malformed rawv header" in out["decode_error"].iloc[0]


def test_image_resize_block_mean_and_dlq(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from hydra_ray.stages.multimodal import (
        ImageResize,
        decode_image,
        encode_pgm,
        encode_ppm,
    )

    # a 4x4 color image whose 2x2 block means are exactly representable
    rgb = np.zeros((4, 4, 3), np.uint8)
    rgb[:2, :2] = 10; rgb[:2, 2:] = 20; rgb[2:, :2] = 30; rgb[2:, 2:] = 40
    gray = np.arange(64, dtype=np.uint8).reshape(8, 8)
    t = pa.table({
        "image_id": pa.array(["a", "b", "c"]),
        "bytes": pa.array([encode_ppm(rgb), encode_pgm(gray), b"PNG-stub"],
                          pa.large_binary()),
        "format": pa.array(["ppm", "pgm", "png"]),
    })
    out = (
        rd.from_arrow(t)
        .map_batches(ImageResize(2, 2), batch_format="pyarrow")
        .to_pandas()
        .set_index("image_id")
    )
    a = decode_image(out.loc["a", "bytes"], "ppm")
    assert a.shape == (2, 2, 3)
    assert a[:, :, 0].tolist() == [[10, 20], [30, 40]]
    b = decode_image(out.loc["b", "bytes"], "pgm")
    assert b.shape == (2, 2)
    # block means of the 8x8 ramp quadrants: mean of each 4x4 block
    ref = gray.reshape(2, 4, 2, 4).mean(axis=(1, 3))
    assert np.array_equal(b, np.rint(ref).astype(np.uint8))
    assert out.loc["c", "decode_error"] is not None
    assert out.loc["c", "bytes"] is None
