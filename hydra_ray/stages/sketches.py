"""Mergeable sketches: HyperLogLog distinct counting + Misra–Gries
frequent items (vectorized numpy/pandas).

Standard HLL (Flajolet et al. 2007, with the small-range linear-counting
correction): per batch, hash the keys, split into (register index, rank of
leading zeros), take per-register max — ONE serialized sketch row per
batch leaves the task, and sketches merge by elementwise max in a tiny
final stage.  This is the scale shape for distinct counts at 10^12 rows:
the shuffle carries `2^p` bytes per block instead of the keys.

Misra–Gries (`frequent_items`): bounded-memory frequency counting.  The
exact path (groupby-count) shuffles one row per distinct key per block —
fine at 10^5 keys, hopeless at 10^9.  MG caps each block's summary at
``capacity`` rows with a deterministic undercount bound, and summaries
merge by addition (Agarwal et al., "Mergeable Summaries", PODS 2012), so
the shuffle stays O(capacity) per block at ANY key cardinality.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = [
    "hll_add_batch",
    "hll_merge",
    "hll_estimate",
    "approx_distinct",
    "frequent_items",
]


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def hll_add_batch(keys, p: int = 12) -> np.ndarray:
    """Batch → HLL register array (uint8[2^p])."""
    m = 1 << p
    arr = np.asarray(
        keys.to_numpy(zero_copy_only=False)
        if isinstance(keys, (pa.Array, pa.ChunkedArray))
        else keys,
        dtype=object,
    )
    h = pd.util.hash_array(arr, categorize=False)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)  # pad low bits
    # rank = leading zeros of `rest` + 1, capped at 64-p+1
    lz = np.zeros(len(h), dtype=np.uint8)
    val = rest.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        mask = val < (np.uint64(1) << np.uint64(64 - shift))
        lz[mask] += shift
        val[mask] = val[mask] << np.uint64(shift)
    rank = lz.astype(np.uint8) + 1
    regs = np.zeros(m, dtype=np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_merge(sketches: list[np.ndarray]) -> np.ndarray:
    out = sketches[0].copy()
    for s in sketches[1:]:
        np.maximum(out, s, out=out)
    return out


def hll_estimate(regs: np.ndarray) -> float:
    m = len(regs)
    est = _alpha(m) * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear counting for small cardinalities
    return float(est)


def approx_distinct(ds, key_col: str, group_col: str | None = None, p: int = 12):
    """Approximate distinct count (optionally per group) via HLL.

    Per-batch: one sketch (or one per group value) serialized as a binary
    row.  Final: a distributed ``groupby(g).map_groups`` merges each
    group's sketches (elementwise max) and emits one row per group — the
    shuffle carries 2^p bytes per (batch, group), never the keys, and the
    merge parallelizes across groups at any key cardinality.
    Returns a Dataset [group?, approx_distinct].
    """

    def sketch_batch(t: pa.Table) -> pa.Table:
        if group_col is None:
            regs = hll_add_batch(t[key_col], p)
            return pa.table(
                {"g": pa.array(["__all__"]), "sketch": pa.array([regs.tobytes()], pa.large_binary())}
            )
        groups, sketches = [], []
        gvals = np.asarray(t[group_col].to_numpy(zero_copy_only=False), dtype=object)
        keys = np.asarray(t[key_col].to_numpy(zero_copy_only=False), dtype=object)
        for g in pd.unique(gvals):
            groups.append(str(g))
            sketches.append(hll_add_batch(keys[gvals == g], p).tobytes())
        return pa.table(
            {"g": pa.array(groups), "sketch": pa.array(sketches, pa.large_binary())}
        )

    rows = ds.map_batches(sketch_batch, batch_format="pyarrow")

    def merge_group(grp: pd.DataFrame) -> pd.DataFrame:
        merged = hll_merge([np.frombuffer(b, dtype=np.uint8) for b in grp["sketch"]])
        out = {"approx_distinct": [int(round(hll_estimate(merged)))]}
        if group_col is None:
            return pd.DataFrame(out)
        return pd.DataFrame({group_col: [grp["g"].iloc[0]], **out})

    return rows.groupby("g").map_groups(merge_group, batch_format="pandas")


def frequent_items(
    ds, cols: list[str], capacity: int = 4096, num_buckets: int = 16
):
    """Frequency counts with bounded per-block memory (Misra–Gries).

    Per block (pandas C-side): exact groupby-size; if the block holds more
    than ``capacity`` distinct keys, subtract the (capacity+1)-th largest
    count from every counter and drop the non-positive ones — the classic
    MG decrement, ≤ ``capacity`` survivors, every key (kept or dropped)
    undercounted by at most that cut.  Each block also emits its cut to
    EVERY bucket (one tiny row per bucket) so the reduce can bound errors
    without a driver round-trip.

    Reduce: keys hash-shuffle into ``num_buckets`` groups (a key's partials
    all land in one bucket — `bucketed_distinct`'s pattern, one vectorized
    groupby-sum per bucket, never ray.data's per-group Python aggregate).
    Output columns: ``cols…, count_lo, count_hi`` where
    ``count_lo ≤ true ≤ count_hi = count_lo + Σ cuts`` and any key with
    true count > Σ cuts ≤ N/(capacity+1) is guaranteed present.  With
    ``capacity`` ≥ per-block distinct keys, no cuts happen and the result
    is EXACT (count_lo == count_hi == true) — the oracle regime.
    """

    def local(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(cols, sort=False, dropna=False).size().reset_index(name="cnt")
        cut = 0
        if len(g) > capacity:
            cnts = g["cnt"].to_numpy()
            cut = int(np.partition(cnts, -capacity - 1)[-capacity - 1])
            g = g[cnts > cut].copy()
            g["cnt"] -= cut
        h = pd.util.hash_pandas_object(g[cols], index=False).to_numpy()
        g = g.assign(
            __bucket=(h % num_buckets).astype("int64"), __cut=np.int64(0)
        )
        if len(df) == 0 or cut == 0:
            return g
        # one cut row per bucket (key filler = any real key value; the
        # reduce selects on __cut, never on the filler)
        errs = pd.DataFrame(
            {
                **{
                    c: pd.Series([df[c].iloc[0]] * num_buckets, dtype=df[c].dtype)
                    for c in cols
                },
                "cnt": np.zeros(num_buckets, dtype=np.int64),
                "__bucket": np.arange(num_buckets, dtype=np.int64),
                "__cut": np.full(num_buckets, cut, dtype=np.int64),
            }
        )
        return pd.concat([g, errs], ignore_index=True)

    partials = ds.map_batches(local, batch_format="pandas")

    def reduce_bucket(grp: pd.DataFrame) -> pd.DataFrame:
        total_err = int(grp["__cut"].sum())
        keys = grp[grp["__cut"] == 0]
        out = keys.groupby(cols, sort=False, dropna=False)["cnt"].sum().reset_index()
        out = out.rename(columns={"cnt": "count_lo"})
        out["count_hi"] = out["count_lo"] + total_err
        return out

    return partials.groupby("__bucket").map_groups(
        reduce_bucket, batch_format="pandas"
    )
