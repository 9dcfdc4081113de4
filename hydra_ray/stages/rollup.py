"""Reshape + ordered-window operators: pivot to wide, per-key rolling
aggregates.

Both are standard relational/time-series steps Ray Data has no built-in
for; both follow the repo's wide-reduce conventions (per-batch partials
where an exact combiner exists, ONE hash-bucket shuffle where order is
required, vectorized per-bucket kernels — never a Python dispatch per
key).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["pivot_wider", "grouped_rolling"]


def pivot_wider(ds, group_cols: list[str], name_col: str, value_col: str,
                names: list[str], prefix: str = ""):
    """Pivot long → wide: one output row per group, one SUM column per
    category in ``names`` (rows with other categories are ignored; a
    group with no rows for a category gets 0 — SQL ``sum(CASE WHEN …
    THEN v ELSE 0 END)`` semantics, never NULL).

    ``names`` is explicit because the output SCHEMA must be known before
    execution — discovery would need a blocking distinct pass.  Scale
    shape: widening is a pure per-batch map (one vectorized mask per
    category), then the existing partial/combine grouped sum — the
    shuffle carries one wide row per (group, batch).
    """
    from .windows import AggSpec, grouped_aggregate

    cols = [f"{prefix}{n}" for n in names]

    def widen(t: pa.Table) -> pa.Table:
        cat = np.asarray(t[name_col].to_numpy(zero_copy_only=False), dtype=object)
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        v = np.where(np.isnan(v), 0.0, v)
        out = {c: t[c] for c in group_cols}
        for name, col in zip(names, cols):
            out[col] = pa.array(np.where(cat == name, v, 0.0))
        return pa.table(out)

    return grouped_aggregate(
        ds.map_batches(widen, batch_format="pyarrow"),
        group_cols,
        [AggSpec("sum", c, c) for c in cols],
    )


def grouped_rolling(ds, key_col: str, order_col: str, tie_col: str,
                    value_col: str, window_rows: int,
                    out_col: str = "rolling_mean", num_buckets: int = 64):
    """Per-key rolling MEAN over the trailing ``window_rows`` rows in
    ``(order_col, tie_col)`` order — SQL ``AVG(v) OVER (PARTITION BY key
    ORDER BY order, tie ROWS BETWEEN window_rows-1 PRECEDING AND CURRENT
    ROW)``.  Emits every input row plus ``out_col``.

    Ordered windows need each key's rows co-located and sorted, so this
    is ONE hash(key)-bucket shuffle; each bucket then resolves ALL its
    keys in a single lexsort + cumsum pass (window sums are cumsum
    differences clamped at each key's run start — no per-key Python, no
    pandas .rolling dispatch per group).
    """
    from ..hashing import hash64

    def tag(t: pa.Table) -> pa.Table:
        b = (hash64(t[key_col]) % np.uint64(num_buckets)).astype(np.int64)
        return t.append_column("__bucket", pa.array(b))

    def roll(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__bucket")
        if g.empty:
            out = g.copy()
            out[out_col] = pd.Series([], dtype="float64")
            return out
        keys = g[key_col].to_numpy(dtype=object)
        _, codes = np.unique(keys, return_inverse=True)
        pos = np.lexsort((g[tie_col].to_numpy(), g[order_col].to_numpy(), codes))
        sc = codes[pos]
        v = g[value_col].to_numpy(dtype=np.float64)[pos]
        n = len(sc)
        run_start = np.flatnonzero(np.r_[True, sc[1:] != sc[:-1]])
        counts = np.diff(np.append(run_start, n))
        run_first = np.repeat(run_start, counts)       # run start per row
        i = np.arange(n)
        j = np.maximum(i - window_rows + 1, run_first)  # window start per row
        cs = np.cumsum(v)
        wsum = cs - np.where(j > 0, cs[np.maximum(j - 1, 0)], 0.0)
        wcnt = (i - j + 1).astype(np.float64)
        out = g.iloc[pos].copy()
        out[out_col] = wsum / wcnt
        return out

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(roll, batch_format="pandas")
    )
