"""Broadcast Bloom-filter prefilters: cut join shuffle volume at scale.

A partitioned hash join moves EVERY left row through the all-to-all
exchange even when only a sliver of keys have a match.  The standard fix
(runtime filters in Spark/Presto/DuckDB) is a Bloom filter built from the
build side's keys, broadcast to the probe side, and applied as a pure
per-batch filter BEFORE the shuffle:

- inner/semi joins: a bloom miss can never match → drop before shuffling;
- anti joins: a bloom miss can never match → it is a definite KEEP, so it
  bypasses the shuffle entirely and only bloom hits go through the join.

False positives only let extra rows through to the exact join (never
wrong results); ``fpp`` trades bitmap size for shuffle savings.

The filter itself is a plain numpy bitmap over the engine's stable 64-bit
key hashes (``hashing.hash64``) with double-hashing probes — one
``ray.put`` broadcasts it, every probe batch tests vectorized.  No
reference analogue (ps-dev/hydra has no large-large join); semantics
follow the textbook Bloom construction (Bloom 1970; probe scheme of
Kirsch & Mitzenmacher 2006).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

__all__ = ["BloomFilter", "build_bloom", "bloom_filter_batches"]

_MIX = np.uint64(0x9E3779B97F4A7C15)  # odd golden-ratio multiplier


class BloomFilter:
    """Fixed-size Bloom filter over 64-bit hashes; vectorized add/test,
    mergeable via bitwise OR (so per-shard builds can union)."""

    __slots__ = ("m", "k", "bits")

    def __init__(self, n_items: int, fpp: float = 0.01):
        if not 0.0 < fpp < 1.0:
            raise ValueError(f"fpp must be in (0, 1), got {fpp}")
        n = max(int(n_items), 1)
        m = int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2)))
        self.m = np.uint64(max(64, (m + 63) // 64 * 64))
        self.k = max(1, round(float(self.m) / n * math.log(2)))
        self.bits = np.zeros(int(self.m) >> 6, dtype=np.uint64)

    def _probes(self, h: np.ndarray, i: int) -> np.ndarray:
        # double hashing: pos_i = (h1 + i*h2) mod m, h2 forced odd so the
        # probe sequence walks the whole bitmap
        h1 = h
        h2 = (h * _MIX) | np.uint64(1)
        return (h1 + np.uint64(i) * h2) % self.m

    def add(self, h: np.ndarray) -> None:
        h = np.ascontiguousarray(h, dtype=np.uint64)
        for i in range(self.k):
            pos = self._probes(h, i)
            # or.at handles duplicate word indexes within one scatter
            np.bitwise_or.at(
                self.bits, (pos >> np.uint64(6)).astype(np.int64),
                np.uint64(1) << (pos & np.uint64(63)),
            )

    def contains(self, h: np.ndarray) -> np.ndarray:
        h = np.ascontiguousarray(h, dtype=np.uint64)
        out = np.ones(len(h), dtype=bool)
        for i in range(self.k):
            pos = self._probes(h[out], i)
            hit = (
                self.bits[(pos >> np.uint64(6)).astype(np.int64)]
                >> (pos & np.uint64(63))
            ) & np.uint64(1)
            # short-circuit: only rows still plausible get the next probe
            idx = np.flatnonzero(out)
            out[idx[hit == 0]] = False
            if not out.any():
                break
        return out

    def union(self, other: "BloomFilter") -> "BloomFilter":
        if self.m != other.m or self.k != other.k:
            raise ValueError("bloom parameters differ; cannot union")
        np.bitwise_or(self.bits, other.bits, out=self.bits)
        return self


def build_bloom(ds, key: str, fpp: float = 0.01, n_items: int | None = None):
    """Build a BloomFilter from a Dataset column — the BUILD side of a
    join (use the smaller table: the driver holds one distinct 64-bit
    hash per build key transiently, plus the bitmap).

    Per-batch work is hash + dedup (vectorized); the driver folds each
    batch's distinct hashes into the bitmap as batches stream in, so peak
    driver memory is one batch of hashes + the bitmap, never the column.
    """
    from ..hashing import hash64

    n = n_items if n_items is not None else ds.count()
    bf = BloomFilter(n, fpp)

    def distinct_hashes(t: pa.Table) -> pa.Table:
        return pa.table({"h": pa.array(np.unique(hash64(t[key])), pa.uint64())})

    for batch in ds.map_batches(
        distinct_hashes, batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow"):
        bf.add(batch["h"].to_numpy(zero_copy_only=False))
    return bf


def bloom_filter_batches(ds, bloom_ref, key: str, keep_hits: bool = True):
    """Apply a broadcast bloom (an ``ray.put`` ref of a BloomFilter) as a
    pure per-batch filter: ``keep_hits=True`` keeps possible matches
    (inner/semi prefilter), ``False`` keeps definite non-matches (the
    anti-join bypass set).  No shuffle; linear in the probe side."""
    from ..hashing import hash64

    from .join import _bcast_get  # per-worker cache: one get per worker

    def f(t: pa.Table) -> pa.Table:
        bf = _bcast_get(bloom_ref)
        mask = bf.contains(hash64(t[key]))
        return t.filter(pa.array(mask if keep_hits else ~mask))

    return ds.map_batches(f, batch_format="pyarrow")
