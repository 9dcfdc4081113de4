"""Deterministic synthesis of the engine's input streams (FIXTURES.md F1/F2).

Everything is a pure function of (row index, seed) — never wall clock — so
every run, at every parallelism, produces identical bytes.  Small scales
are built driver-side as Arrow tables; bench scale is built in parallel
through Ray Data itself (``ray.data.range(n).map_batches``) since every
row is independent given its index.

Schema (authoritative shape from BASELINE.json ``input_hint``):
  clip_id:string, bytes:binary, sr_hz:int32, dur_ms:int32, codec:string,
  transcript:string
plus engine-visible stream columns:
  event_ts:timestamp[ms] (seeded out-of-orderness to exercise watermarks),
  seq:int64 (the synthesis index — lets tests recompute the decode oracle
  even for hot-key rows that reuse a clip_id).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .audio import encode, synth_wave

__all__ = [
    "CLIP_SCHEMA",
    "UPDATE_SCHEMA",
    "VOCAB",
    "BASE_TS_MS",
    "CLIP_INTERVAL_MS",
    "synth_clips_table",
    "synth_updates_table",
    "transcript_for",
]

VOCAB = (
    "stream window join key value record topic clip audio transcript "
    "epoch commit offset partition watermark state actor batch arrow "
    "replica schema registry ingest transport ack tombstone compact"
).split()

BASE_TS_MS = 1_704_067_200_000  # 2024-01-01T00:00:00Z
CLIP_INTERVAL_MS = 100
_CODECS = ("pcm16", "wav", "mulaw", "alaw", "pcm8", "f32")
_SRS = (8000, 16000, 22050, 44100)

CLIP_SCHEMA = pa.schema(
    [
        ("clip_id", pa.string()),
        ("bytes", pa.large_binary()),
        ("sr_hz", pa.int32()),
        ("dur_ms", pa.int32()),
        ("codec", pa.string()),
        ("transcript", pa.string()),
        ("event_ts", pa.timestamp("ms")),
        ("seq", pa.int64()),
    ]
)

UPDATE_SCHEMA = pa.schema(
    [
        ("clip_id", pa.string()),
        ("transcript", pa.string()),  # null ⇒ tombstone (delete marker)
        ("revision", pa.int32()),
        ("event_ts", pa.timestamp("ms")),
        ("seq", pa.int64()),
    ]
)


def transcript_for(i: int) -> str:
    nv = len(VOCAB)
    return " ".join(VOCAB[(i * 7 + k) % nv] for k in range(1 + i % 12))


def _clip_ids_for(idx: np.ndarray, hot_fraction: float, seed: int) -> list[str]:
    """10% of rows (seeded, vectorized) reuse the first 10 ids — hot-key skew.

    The hot/cold decision is a stable per-index hash so any row range can
    be synthesized independently of block splits.
    """
    import pandas as pd

    eff = idx.astype(np.int64)
    if hot_fraction > 0.0:
        h = pd.util.hash_array((idx + seed * 1_000_003).astype(np.uint64))
        hot = h < np.uint64(int(hot_fraction * 2**64))
        eff = np.where(hot, idx % 10, idx)
    return [f"clip-{int(e):08d}" for e in eff]


def _event_ts_for_rows(idx: np.ndarray, seed: int) -> np.ndarray:
    """Event times with seeded out-of-orderness (FIXTURES.md F1).

    Base time ``BASE_TS_MS + i*interval``; rows are grouped in blocks of
    5 and a seeded 20% of blocks get their timestamps permuted within the
    block.  Block decisions depend only on the block index, so any row
    range can be synthesized independently and identically.
    """
    ts = BASE_TS_MS + idx.astype(np.int64) * CLIP_INTERVAL_MS
    out = ts.copy()
    blocks = np.unique(idx // 5)
    for b in blocks:
        rng = np.random.default_rng(seed * 7_777_777 + int(b))
        if rng.random() < 0.2:
            perm = rng.permutation(5)
            block_idx = np.arange(b * 5, b * 5 + 5)
            block_ts = BASE_TS_MS + block_idx * CLIP_INTERVAL_MS
            permuted = block_ts[perm]
            sel = (idx >= b * 5) & (idx < b * 5 + 5)
            out[sel] = permuted[idx[sel] - b * 5]
    return out


def synth_clips_batch(
    idx: np.ndarray, n_total: int, seed: int = 42, hot_fraction: float = 0.1
) -> pa.Table:
    """Synthesize the clip rows for an arbitrary set of indices."""
    idx = np.asarray(idx, dtype=np.int64)
    clip_ids = _clip_ids_for(idx, hot_fraction, seed)
    payloads, srs, durs, codecs, texts = [], [], [], [], []
    for i in idx.tolist():
        sr = _SRS[i % 4]
        dur = 250 + (i % 16) * 250
        codec = _CODECS[i % len(_CODECS)]
        payloads.append(encode(synth_wave(i, sr, dur), codec, sr))
        srs.append(sr)
        durs.append(dur)
        codecs.append(codec)
        texts.append(transcript_for(i))
    ts = _event_ts_for_rows(idx, seed)
    return pa.table(
        {
            "clip_id": pa.array(clip_ids, pa.string()),
            "bytes": pa.array(payloads, pa.large_binary()),
            "sr_hz": pa.array(srs, pa.int32()),
            "dur_ms": pa.array(durs, pa.int32()),
            "codec": pa.array(codecs, pa.string()),
            "transcript": pa.array(texts, pa.string()),
            "event_ts": pa.array(ts, pa.timestamp("ms")),
            "seq": pa.array(idx, pa.int64()),
        },
        schema=CLIP_SCHEMA,
    )


def synth_clips_table(n: int, seed: int = 42, hot_fraction: float = 0.1) -> pa.Table:
    return synth_clips_batch(np.arange(n), n, seed=seed, hot_fraction=hot_fraction)


def synth_updates_table(
    n_clips: int,
    seed: int = 42,
    update_fraction: float = 0.3,
    tombstone_fraction: float = 0.05,
    late_fraction: float = 0.02,
    early_fraction: float = 0.05,
    lateness_ms: int = 30_000,
) -> pa.Table:
    """Transcript-update stream (FIXTURES.md F2), arrival-ordered.

    ~30% of clips get 1–3 revisions; ~5% of updates are tombstones
    (``transcript`` null ⇒ delete, mirroring Kafka null-payload tombstones,
    `core/src/main/scala/hydra/core/ingest/HydraRequest.scala:13-14`);
    a seeded ~2% carry event times older than the allowed lateness (late
    data); ~5% arrive *before* their clip (join buffering).
    """
    rng = np.random.default_rng(seed * 999_983)
    rows: list[tuple[str, str | None, int, int]] = []
    for i in range(n_clips):
        if rng.random() >= update_fraction:
            continue
        n_rev = int(rng.integers(1, 4))
        clip_ts = BASE_TS_MS + i * CLIP_INTERVAL_MS
        for rev in range(1, n_rev + 1):
            lag = int(rng.integers(0, 30_000))
            nominal = clip_ts + lag
            r = rng.random()
            if r < late_fraction:
                ev = nominal  # arrival slot stays, event time pushed far back
                ev_field = nominal - (lateness_ms * 2 + 60_000)
            elif r < late_fraction + early_fraction:
                ev = clip_ts - int(rng.integers(1_000, 10_000))
                ev_field = ev
            else:
                ev = nominal
                ev_field = nominal
            text = (
                None
                if rng.random() < tombstone_fraction
                else f"{transcript_for(i)} (rev {rev})"
            )
            rows.append((f"clip-{i:08d}", text, rev, ev, ev_field))
    rows.sort(key=lambda r: (r[3], r[0], r[2]))  # arrival order
    return pa.table(
        {
            "clip_id": pa.array([r[0] for r in rows], pa.string()),
            "transcript": pa.array([r[1] for r in rows], pa.string()),
            "revision": pa.array([r[2] for r in rows], pa.int32()),
            "event_ts": pa.array([r[4] for r in rows], pa.timestamp("ms")),
            "seq": pa.array(np.arange(len(rows)), pa.int64()),
        },
        schema=UPDATE_SCHEMA,
    )
