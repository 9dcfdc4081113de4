"""Content-based video near-dup (`multimodal.video_neardup`)."""

import numpy as np
import pyarrow as pa
import pytest

from hydra_ray.mkvlite import encode_mkv
from hydra_ray.mp4lite import encode_mp4
from hydra_ray.stages.multimodal import (
    VideoFingerprinter,
    encode_rawv,
    video_neardup,
)


def _video(seed, nf=24, h=32, w=32):
    """Structured frames so dHash is stable under mild noise (pure
    noise has no perceptual structure) — but structure must DIFFER per
    seed or every fixture video is a near-dup of every other: a random
    fixed texture per video + a moving bar whose speed/axis vary."""
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:h, 0:w]
    texture = rng.integers(0, 160, (h // 4, w // 4)).repeat(4, 0).repeat(4, 1)
    speed = 1 + seed % 5
    frames = np.empty((nf, h, w), np.uint8)
    for f in range(nf):
        axis = x if seed % 2 == 0 else y
        bar = ((axis + speed * f) % w < 6) * 95
        frames[f] = np.clip(texture + bar + rng.integers(-4, 5, (h, w)),
                            0, 255).astype(np.uint8)
    return frames


def _fixture():
    rows = []
    vids = {}
    for i in range(8):
        f = _video(seed=i * 100)
        vids[f"orig-{i}"] = f
        rows.append({"video_id": f"orig-{i}", "format": "rawv",
                     "bytes": encode_rawv(f, 12)})
    # planted copies: same content, light noise, DIFFERENT containers
    noisy = np.clip(
        vids["orig-2"].astype(np.int64)
        + np.random.default_rng(9).integers(-3, 4, vids["orig-2"].shape),
        0, 255).astype(np.uint8)
    rows.append({"video_id": "copy-mkv", "format": "mkv",
                 "bytes": encode_mkv(noisy, 12)})
    rows.append({"video_id": "copy-mp4", "format": "mp4",
                 "bytes": encode_mp4(vids["orig-5"], 12)})
    return rows


def test_video_neardup_finds_planted_copies(ray_session):
    import ray.data as rd

    ds = rd.from_items(_fixture())
    out = video_neardup(ds, stride_ms=250, max_hamming=6,
                        min_shared=0.5).to_pandas()
    pairs = set(map(tuple, out[["video_a", "video_b"]].to_numpy()))
    assert ("copy-mkv", "orig-2") in pairs
    assert ("copy-mp4", "orig-5") in pairs
    # different-content videos never pair
    for a, b in pairs:
        ca = a.split("-")[1] if a.startswith("orig") else a
        assert not (a.startswith("orig") and b.startswith("orig")), (a, b)
    # shared fraction for the bit-identical mp4 copy is 1.0
    row = out[(out["video_a"] == "copy-mp4")].iloc[0]
    assert row["shared"] == 1.0


def test_fingerprinter_dlq_and_positions(ray_session):
    f = _video(seed=1, nf=12)
    batch = pa.table({
        "video_id": pa.array(["good", "bad"]),
        "format": pa.array(["rawv", "webm"]),
        "bytes": pa.array([encode_rawv(f, 12), b"\x00garbage"],
                          pa.binary()),
    })
    out = VideoFingerprinter(stride_ms=500)(batch).to_pandas()
    good = out[out["decode_error"].isna()]
    bad = out[out["decode_error"].notna()]
    # 12 frames at 12 fps, 500 ms stride -> positions 0, 1
    assert good["pos"].tolist() == [0, 1]
    assert len(bad) == 1 and bad["pos"].iloc[0] == -1
