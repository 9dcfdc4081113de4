"""Distributed connected components over an edge Dataset.

Near-dup clustering ends in "group verified pairs into components".
Driver-side union-find is fine while verified pairs fit on one node, but
at 10^12-doc scale the pair set itself is distributed — this module
implements the alternating large-star / small-star MapReduce algorithm
(Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC
2014 — public paper), which converges in O(log n) rounds, each round a
single hash-bucket shuffle + one vectorized per-bucket kernel.

Contract: input is a Dataset of undirected edges (int64 endpoints,
self-loops ignored); output is a Dataset ``(node, component)`` covering
every endpoint, with ``component`` = the minimum node id of its
component (same labels as union-find-by-min, so the two resolvers are
interchangeable and testable against each other).

Each round materializes the edge Dataset: rounds are iterative, and the
edge set shrinks toward one star edge per non-root node — O(nodes), far
below the corpus the pairs came from.  The per-round convergence probe
is a tiny per-block (count, xor-of-pair-hashes) summary, not a driver
collect of the edges.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["connected_components"]


def _star_kernel(g: pd.DataFrame, large: bool) -> pd.DataFrame:
    """One reduce of large-star (input has both edge directions, grouped
    by hash(u)) or small-star (input oriented v <= u, grouped by
    hash(u)).  All nodes in the bucket are resolved in one lexsort +
    reduceat pass."""
    g = g.drop(columns="__bucket")
    if g.empty:
        return pd.DataFrame({"u": pd.Series([], dtype="int64"),
                             "v": pd.Series([], dtype="int64")})
    u = g["u"].to_numpy(dtype=np.int64)
    v = g["v"].to_numpy(dtype=np.int64)
    pos = np.lexsort((v, u))
    u, v = u[pos], v[pos]
    keep = np.r_[True, (u[1:] != u[:-1]) | (v[1:] != v[:-1])]
    u, v = u[keep], v[keep]
    starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
    counts = np.diff(np.r_[starts, len(u)])
    m = np.minimum(np.minimum.reduceat(v, starts), u[starts])
    mrow = np.repeat(m, counts)
    if large:
        mask = v > u
        out_u, out_v = v[mask], mrow[mask]
    else:
        mask = v != mrow
        head = u[starts] != m
        out_u = np.concatenate([v[mask], u[starts][head]])
        out_v = np.concatenate([mrow[mask], m[head]])
    return pd.DataFrame({"u": out_u, "v": out_v})


def connected_components(edges, src_col: str, dst_col: str,
                         num_buckets: int = 64, max_rounds: int = 50):
    """Return a Dataset ``(node:int64, component:int64)``; component =
    min node id reachable.  O(log n) bucket-shuffle rounds."""
    from ..hashing import hash64

    def canon(t: pa.Table) -> pa.Table:
        a = t[src_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        b = t[dst_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        keep = a != b
        a, b = a[keep], b[keep]
        return pa.table({"u": np.maximum(a, b), "v": np.minimum(a, b)})

    ds = edges.map_batches(canon, batch_format="pyarrow")

    def tag(t: pa.Table) -> pa.Table:
        b = (hash64(t["u"]) % np.uint64(num_buckets)).astype(np.int32)
        return t.append_column("__bucket", pa.array(b))

    def big_small(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        return pa.table({"u": np.maximum(u, v), "v": np.minimum(u, v)})

    def both_dirs(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        return pa.table({"u": np.concatenate([u, v]),
                         "v": np.concatenate([v, u])})

    def summary(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy(zero_copy_only=False).astype(np.uint64)
        v = t["v"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (np.maximum(u, v) * np.uint64(0x9E3779B97F4A7C15)) ^ np.minimum(u, v)
        x = np.bitwise_xor.reduce(h) if len(h) else np.uint64(0)
        return pa.table({"n": pa.array([t.num_rows], pa.int64()),
                         "x": pa.array([int(x)], pa.uint64())})

    def probe(d):
        rows = d.map_batches(summary, batch_format="pyarrow").take_all()
        n = sum(r["n"] for r in rows)
        x = 0
        for r in rows:
            x ^= r["x"]
        return n, x

    ds = ds.materialize()
    if ds.count() == 0:
        import ray.data as rd

        return rd.from_arrow(pa.table({"node": pa.array([], pa.int64()),
                                       "component": pa.array([], pa.int64())}))

    prev = None
    for _ in range(max_rounds):
        ds = (
            ds.map_batches(both_dirs, batch_format="pyarrow")
            .map_batches(tag, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(lambda g: _star_kernel(g, large=True),
                        batch_format="pandas")
            .map_batches(big_small, batch_format="pyarrow")
            .map_batches(tag, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(lambda g: _star_kernel(g, large=False),
                        batch_format="pandas")
            .materialize()
        )
        cur = probe(ds)
        if cur == prev:
            break
        prev = cur

    # converged edge set is a star forest (child > root); emit child rows
    # plus one self row per distinct root, deduped in the same buckets
    def child_rows(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        return pa.table({"node": np.concatenate([np.maximum(u, v), np.minimum(u, v)]),
                         "component": np.concatenate([np.minimum(u, v), np.minimum(u, v)])})

    def tag_node(t: pa.Table) -> pa.Table:
        b = (hash64(t["node"]) % np.uint64(num_buckets)).astype(np.int32)
        return t.append_column("__bucket", pa.array(b))

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        n = g["node"].to_numpy(dtype=np.int64)
        c = g["component"].to_numpy(dtype=np.int64)
        pos = np.lexsort((c, n))
        n, c = n[pos], c[pos]
        starts = np.flatnonzero(np.r_[True, n[1:] != n[:-1]])
        return pd.DataFrame({"node": n[starts], "component": c[starts]})

    return (
        ds.map_batches(child_rows, batch_format="pyarrow")
        .map_batches(tag_node, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(resolve, batch_format="pandas")
    )
