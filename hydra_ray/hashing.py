"""Stable, vectorized key hashing → partition assignment.

The reference partitions records by Kafka's key hash (murmur2 % P,
`ingestors/kafka/.../producer/KafkaRecord.scala` relies on the producer's
default partitioner; default 10 partitions per
`ingest/src/main/scala/hydra.ingest/app/AppConfig.scala:96-99`).  We need
the same property — a deterministic ``hash(key) % P`` that is stable
across processes, runs and cluster sizes, because partition identity is
the unit of operator state, epoch lineage and exactly-once commits.

``pandas.util.hash_array`` (SipHash-style, fixed default key, Cython
vectorized) gives us a stable 64-bit hash without a per-row Python loop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["hash64", "partition_for", "add_partition_column"]


_NULL_HASH = np.uint64(0x517CC1B727220A95)  # fixed hash for null/NaN keys


def hash64(keys) -> np.ndarray:
    """Stable unsigned 64-bit hash of a key array (vectorized).

    Null-safe: None/NaN positions hash to ONE fixed constant.  Without
    this, CPython ≥ 3.10 hashes ``nan`` (and ``None``) by object id, so
    equal null keys from different batches land in different hash
    buckets and never meet in a grouped reduce (observed: rollup null
    key split across buckets)."""
    if isinstance(keys, (pa.Array, pa.ChunkedArray)):
        keys = keys.to_numpy(zero_copy_only=False)
    arr = np.asarray(keys, dtype=object)
    h = pd.util.hash_array(arr, categorize=False)
    na = pd.isna(arr)
    if na.any():
        h = h.copy()
        h[na] = _NULL_HASH
    return h


def partition_for(keys, num_partitions: int) -> np.ndarray:
    """``hash(key) % P`` as int32 — the engine's partitioner."""
    return (hash64(keys) % np.uint64(num_partitions)).astype(np.int32)


def add_partition_column(
    batch: pa.Table, key_col: str, num_partitions: int, out_col: str = "partition"
) -> pa.Table:
    """Append the partition column to an Arrow batch (map_batches kernel)."""
    part = partition_for(batch[key_col], num_partitions)
    if out_col in batch.column_names:
        batch = batch.drop_columns([out_col])
    return batch.append_column(out_col, pa.array(part, type=pa.int32()))
