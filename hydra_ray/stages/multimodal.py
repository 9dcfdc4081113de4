"""Multimodal column operators: image / video / generic binary payloads.

Audio is fully implemented (`hydra_ray.audio`).  Image/video codecs are
NOT available in this environment (no PIL/ffmpeg), so the decode kernels
here are explicit STUBS — the Ray-side plumbing (schemas, batch sizing,
actor-pool signatures, output layout, DLQ routing) is real and tested;
swapping in a real decoder is a one-function change in the operator's
``__init__``.

Design rules for opaque binary columns at scale (same as audio):
- batch size capped by BYTES not rows (a 4K frame ≈ 24 MB raw); callers
  pass ``batch_size`` small and keep ``target_max_block_size`` generous;
- decode runs once per actor-pool worker with the codec handle loaded in
  ``__init__``;
- per-row failures go to an error column (DLQ), never exceptions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["IMAGE_SCHEMA", "ImageDecodeStub", "FrameSampleStub", "binary_stats"]

IMAGE_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("bytes", pa.large_binary()),
        ("format", pa.string()),      # "png" | "jpeg" | ...
        ("width", pa.int32()),
        ("height", pa.int32()),
    ]
)


class ImageDecodeStub:
    """Actor-pool image decode stage (STUB decode, real plumbing).

    Real deployment: ``self._decode = PIL.Image.open`` loaded here, once
    per actor.  In this sandbox the decode is a deterministic fake that
    emits a feature vector from the payload hash, and unknown formats are
    routed to the error column exactly as the real decoder would.
    """

    SUPPORTED = ("png", "jpeg")

    def __init__(self, feature_dim: int = 16):
        self.feature_dim = feature_dim
        # STUB: real codec handle would be constructed here.

    def __call__(self, batch: pa.Table) -> pa.Table:
        fmts = np.asarray(batch["format"].to_pylist(), dtype=object)
        errs = [
            None if f in self.SUPPORTED else f"UnsupportedImageFormat: {f!r}"
            for f in fmts
        ]
        payloads = batch["bytes"]
        feats = np.zeros((batch.num_rows, self.feature_dim), dtype=np.float32)
        lengths = pa.compute.binary_length(payloads).to_numpy(zero_copy_only=False)
        h = pd.util.hash_array(lengths.astype(np.uint64))
        for j in range(self.feature_dim):
            feats[:, j] = ((h >> np.uint64(j * 4)) & np.uint64(0xF)).astype(np.float32) / 15.0
        ok = np.array([e is None for e in errs])
        feats[~ok] = 0.0
        return pa.table(
            {
                "image_id": batch["image_id"],
                "features": pa.FixedSizeListArray.from_arrays(
                    pa.array(feats.reshape(-1), pa.float32()), self.feature_dim
                ),
                "decode_error": pa.array(errs, pa.string()),
            }
        )


class FrameSampleStub:
    """Video frame-sampling stage signature (STUB).

    Real deployment: ffmpeg handle in ``__init__``; per batch, sample
    every ``stride_ms`` frame into rows (one row per sampled frame) —
    a flat_map-shaped batch op.  Raises to make the stub status explicit.
    """

    def __init__(self, stride_ms: int = 1000):
        self.stride_ms = stride_ms

    def __call__(self, batch: pa.Table) -> pa.Table:
        raise NotImplementedError(
            "video frame sampling requires ffmpeg, not present in this build"
        )


def binary_stats(batch: pa.Table, col: str = "bytes") -> pa.Table:
    """Generic opaque-binary health stats (vectorized, codec-free):
    payload byte length + the leading magic byte (format sniffing)."""
    import pyarrow.compute as pc

    lengths = pc.cast(pc.binary_length(batch[col]), pa.int64())
    magic = pc.binary_slice(pc.cast(batch[col], pa.large_binary()), 0, 1)
    batch = batch.append_column("payload_bytes", lengths)
    return batch.append_column("payload_magic", magic)
