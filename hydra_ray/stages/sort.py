"""Distributed global sort / exact ranking by range partitioning.

Ray Data's ``ds.sort`` is a full all-to-all exchange whose outputs are
ordered blocks but carry no explicit position; downstream training-data
work (curriculum ordering, percentile cuts, deterministic splits) wants
the RANK itself.  ``global_rank`` is the classic sample-sort shape made
rank-exact:

1. **sample pass** — per-block evenly-spaced value samples (value column
   only) merge driver-side into ``num_buckets − 1`` range cutpoints.
   Cutpoints are deduplicated, so EVERY row with the same primary value
   lands in the same bucket — ties never straddle a boundary, which is
   what makes intra-bucket ranking globally exact.
2. **count pass** — per-block ``searchsorted`` bucket counts (value
   column only) reduce to O(buckets) rows; the driver prefix-sums them
   into bucket rank offsets.
3. **main pass** — ONE shuffle of the full rows by range bucket; each
   bucket lexsorts ``(value, *tiebreak_cols)`` in a single vectorized
   pass and emits ``rank = bucket_offset + intra_rank + 1`` — exactly
   SQL ``row_number() OVER (ORDER BY value, tiebreaks)``.

Cutpoint quality affects only balance, never correctness: any cut set
yields identical ranks.  The input is consumed three times (twice
column-pruned to the sort key), so pass a cheap re-readable source (a
parquet read), not an expensive upstream pipeline — or materialize it
first.  Skew caveat: a single value with huge multiplicity pins one
bucket (same caveat as any range partitioner); rank semantics need the
tie class co-located, so such keys must fit a worker.

Nulls in the sort column are rejected (rank order would be
engine-defined); filter or fill upstream.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["global_rank", "range_cutpoints", "skyline2"]


def range_cutpoints(ds, value_col: str, num_buckets: int,
                    sample_per_block: int = 32) -> np.ndarray | None:
    """Sample-sort range cutpoints over ``value_col``: per-block evenly
    spaced value samples pooled on the driver, deduped so equal values
    never straddle a range boundary.  ``None`` on an empty dataset.
    Shared by :func:`global_rank` and ``sinks.sorted_write``."""
    vals_only = ds.select_columns([value_col])

    def sample(t: pa.Table) -> pa.Table:
        v = t[value_col].to_numpy(zero_copy_only=False)
        if t[value_col].null_count:
            raise ValueError(f"NULLs in sort column {value_col!r}")
        v = np.sort(v, kind="stable")
        k = min(sample_per_block, len(v))
        if k == 0:
            return pa.table({value_col: v[:0]})
        idx = np.linspace(0, len(v) - 1, k).astype(np.int64)
        return pa.table({value_col: v[idx]})

    sampled = vals_only.map_batches(sample, batch_format="pyarrow").take_all()
    pool = np.sort(np.array([r[value_col] for r in sampled]))
    if len(pool) == 0:
        return None
    q = np.linspace(0, len(pool) - 1, num_buckets + 1)[1:-1].astype(np.int64)
    return np.unique(pool[q])  # dedupe: one bucket per tied cut value


def global_rank(
    ds,
    value_col: str,
    tiebreak_cols: list[str],
    rank_col: str = "rnk",
    num_buckets: int = 64,
    sample_per_block: int = 32,
):
    """Add an exact ascending dense row-number ``rank_col`` (1-based) by
    ``ORDER BY value_col, *tiebreak_cols`` without a global sort."""

    vals_only = ds.select_columns([value_col])
    cuts = range_cutpoints(ds, value_col, num_buckets, sample_per_block)
    if cuts is None:
        return ds.map_batches(
            lambda t: t.append_column(rank_col, pa.array([], pa.int64())),
            batch_format="pyarrow",
        )
    nb = len(cuts) + 1

    def bucket_of(v: np.ndarray) -> np.ndarray:
        # bucket b holds (cuts[b-1], cuts[b]]: equal values share a bucket
        return np.searchsorted(cuts, v, side="left")

    def count(t: pa.Table) -> pa.Table:
        if t[value_col].null_count:
            raise ValueError(f"global_rank: NULLs in sort column {value_col!r}")
        b = bucket_of(t[value_col].to_numpy(zero_copy_only=False))
        return pa.table({
            "b": np.arange(nb, dtype=np.int64),
            "n": np.bincount(b, minlength=nb).astype(np.int64),
        })

    counts = np.zeros(nb, dtype=np.int64)
    for r in vals_only.map_batches(count, batch_format="pyarrow").take_all():
        counts[r["b"]] += r["n"]
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])

    def tag(t: pa.Table) -> pa.Table:
        b = bucket_of(t[value_col].to_numpy(zero_copy_only=False))
        return t.append_column("__bucket", pa.array(b))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        b = int(g["__bucket"].iloc[0])
        g = g.drop(columns="__bucket")
        keys = tuple(
            g[c].to_numpy() for c in reversed(tiebreak_cols)
        ) + (g[value_col].to_numpy(),)
        order = np.lexsort(keys)
        intra = np.empty(len(g), dtype=np.int64)
        intra[order] = np.arange(len(g), dtype=np.int64)
        g = g.copy()
        g[rank_col] = offsets[b] + intra + 1
        return g

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


def skyline2(ds, x_col: str, y_col: str):
    """Exact 2-D SKYLINE (Pareto frontier, minimize both columns):
    rows no other row dominates — ``other.x ≤ x AND other.y ≤ y`` with
    at least one strict inequality (exact duplicates all survive, the
    standard skyline convention; Börzsönyi et al. 2001, ICDE).

    Block-nested-loop shape made streaming: each block prunes LOCALLY
    with one vectorized sorted scan (sort by (x, y); a row survives iff
    its y is strictly below the running min-y of all strictly-cheaper x
    AND it is min-y within its equal-x run, or duplicates a surviving
    (x, y)), then the O(frontier·blocks) survivor union — tiny for any
    non-degenerate distribution — takes one final exact pass on the
    driver with the same kernel.  Local pruning is CORRECT because
    dominance within a subset implies dominance in the full set; the
    final pass restores global exactness.
    """

    def _local_skyline(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        x = t[x_col].to_numpy(zero_copy_only=False)
        y = t[y_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((y, x))
        xs, ys = x[order], y[order]
        # running strict-prefix min of y over rows with strictly smaller x
        new_x = np.empty(len(xs), bool)
        new_x[0] = True
        new_x[1:] = xs[1:] != xs[:-1]
        run_id = np.cumsum(new_x) - 1
        # min y per equal-x run (runs are y-sorted: first element)
        run_first = np.flatnonzero(new_x)
        run_min_y = ys[run_first]
        # prefix min of run minima over PREVIOUS runs
        prev_min = np.empty(len(run_min_y))
        prev_min[0] = np.inf
        np.minimum.accumulate(run_min_y[:-1], out=prev_min[1:])
        surv = (ys < prev_min[run_id]) & (ys == run_min_y[run_id])
        keep = np.sort(order[surv])
        return t.take(pa.array(keep))

    import ray

    survivors = ds.map_batches(_local_skyline, batch_format="pyarrow")
    tables = [t for t in ray.get(survivors.to_arrow_refs()) if t.num_rows]
    if not tables:
        return survivors
    merged = pa.concat_tables(tables, promote_options="default")
    final = _local_skyline(merged)
    import ray.data as rd

    return rd.from_arrow(final)
