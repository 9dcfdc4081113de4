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
import pyarrow.compute as pc

__all__ = ["pivot_wider", "unpivot", "grouped_rolling",
           "grouped_rolling_range", "grouped_shift", "grouped_cumsum",
           "collect_sorted", "grouped_rank", "grouped_bounds",
           "grouped_resample", "sessionize"]


def _bucket_tag(key_col: str, num_buckets: int):
    """Append the hash(key)-bucket column — the ONE shuffle key every
    ordered-window operator here shares."""
    from ..hashing import hash64

    def tag(t: pa.Table) -> pa.Table:
        b = (hash64(t[key_col]) % np.uint64(num_buckets)).astype(np.int64)
        return t.append_column("__bucket", pa.array(b))

    return tag


def _sorted_runs(g: pd.DataFrame, key_col: str, order_col: str, tie_col: str):
    """Lexsort one bucket's rows by (key, order, tie); return the sort
    permutation, the per-row key codes in sorted order, and a boolean
    mask marking each key-run's first row.  Shared kernel for every
    per-key ordered window in this module — all keys in the bucket are
    resolved in ONE pass, never a Python dispatch per key."""
    keys = g[key_col].to_numpy(dtype=object)
    _, codes = np.unique(keys, return_inverse=True)
    pos = np.lexsort((g[tie_col].to_numpy(), g[order_col].to_numpy(), codes))
    sc = codes[pos]
    first = np.r_[True, sc[1:] != sc[:-1]]
    return pos, sc, first


def grouped_shift(ds, key_col: str, order_col: str, tie_col: str,
                  value_col: str, periods: int = 1,
                  out_col: str = "lag_value", num_buckets: int = 64):
    """Per-key LAG/LEAD: SQL ``LAG(v, periods) OVER (PARTITION BY key
    ORDER BY order, tie)`` (negative ``periods`` = LEAD).  Emits every
    input row plus ``out_col`` (float64, NaN→NULL where the shifted row
    falls outside the key's run).

    Reference has no window functions (its views are last-write-wins
    compactions, `ConsumerGroupsAlgebra.scala`); this is part of the
    beyond-reference ordered-window family.  Scale shape: ONE
    hash(key)-bucket shuffle, then one lexsort + shifted-array pass per
    bucket resolves all keys at once.
    """
    tag = _bucket_tag(key_col, num_buckets)
    k = abs(int(periods))
    lead = periods < 0

    def shift(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__bucket")
        if g.empty:
            out = g.copy()
            out[out_col] = pd.Series([], dtype="float64")
            return out
        pos, sc, first = _sorted_runs(g, key_col, order_col, tie_col)
        v = g[value_col].to_numpy(dtype=np.float64)[pos]
        n = len(sc)
        shifted = np.full(n, np.nan)
        if k == 0:
            shifted = v.copy()
        elif lead:
            shifted[:n - k] = v[k:]
            # invalid where the source row belongs to a different key
            bad = sc[:n - k] != sc[k:]
            shifted[:n - k][bad] = np.nan
        else:
            shifted[k:] = v[:n - k]
            bad = sc[k:] != sc[:n - k]
            shifted[k:][bad] = np.nan
        out = g.iloc[pos].copy()
        out[out_col] = shifted
        return out

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(shift, batch_format="pandas")
    )


def collect_sorted(ds, key_col: str, order_col: str, tie_col: str,
                   value_col: str, sep: str = ",",
                   out_col: str = "path", num_buckets: int = 64):
    """Ordered group-concat: one row per key with ``value_col`` joined by
    ``sep`` in ``(order_col, tie_col)`` order plus the element count —
    SQL ``string_agg(v, sep ORDER BY order, tie)``.  The classic
    event-sequence / session-path reshape (and the list-collect step
    before sequence modeling).

    Scale shape: ONE hash(key)-bucket shuffle; each bucket lexsorts once
    and joins ALL its keys' runs in a single Arrow ``binary_join`` over
    a ListArray built from the run offsets — no per-key Python join.
    Output strings are O(rows in the key); keys with pathological
    cardinality belong under a ``per_key_topn`` cap first.
    """
    import pyarrow.compute as pc

    tag = _bucket_tag(key_col, num_buckets)

    def join_runs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__bucket")
        if g.empty:
            return pd.DataFrame({key_col: pd.Series([], dtype=g[key_col].dtype),
                                 out_col: pd.Series([], dtype="object"),
                                 "n_items": pd.Series([], dtype="int64")})
        pos, sc, first = _sorted_runs(g, key_col, order_col, tie_col)
        vals = pa.array(g[value_col].to_numpy(dtype=object)[pos], pa.string())
        run_start = np.flatnonzero(first)
        offsets = np.append(run_start, len(sc)).astype(np.int32)
        joined = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), vals),
            sep,
        )
        keys = g[key_col].to_numpy()[pos][run_start]  # native dtype (int keys stay int64)
        return pd.DataFrame({
            key_col: keys,
            out_col: joined.to_numpy(zero_copy_only=False),
            "n_items": np.diff(offsets).astype(np.int64),
        })

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(join_runs, batch_format="pandas")
    )


def grouped_cumsum(ds, key_col: str, order_col: str, tie_col: str,
                   value_col: str, out_col: str = "running_sum",
                   num_buckets: int = 64):
    """Per-key running total: SQL ``SUM(v) OVER (PARTITION BY key ORDER
    BY order, tie ROWS UNBOUNDED PRECEDING)``.  Same shuffle shape as
    :func:`grouped_shift`; the running sum is a global cumsum minus the
    cumsum value just before each key-run start (no per-key loop).
    """
    tag = _bucket_tag(key_col, num_buckets)

    def cum(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__bucket")
        if g.empty:
            out = g.copy()
            out[out_col] = pd.Series([], dtype="float64")
            return out
        pos, sc, first = _sorted_runs(g, key_col, order_col, tie_col)
        v = g[value_col].to_numpy(dtype=np.float64)[pos]
        cs = np.cumsum(v)
        run_start = np.flatnonzero(first)
        counts = np.diff(np.append(run_start, len(sc)))
        # cumsum just before each run's first row, broadcast over the run
        base = np.where(run_start > 0, cs[run_start - 1], 0.0)
        out = g.iloc[pos].copy()
        out[out_col] = cs - np.repeat(base, counts)
        return out

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(cum, batch_format="pandas")
    )


def grouped_ewma(ds, key_col: str, order_col: str, tie_col: str,
                 value_col: str, alpha: float, out_col: str = "ewma",
                 num_buckets: int = 64):
    """Per-key exponentially-weighted moving average (the standard
    time-series smoothing signal): ``y_0 = x_0``,
    ``y_i = (1−α)·y_{i−1} + α·x_i`` in ``(order, tie)`` order — the
    pandas ``ewm(adjust=False)`` recurrence.

    Same single hash(key)-bucket exchange as :func:`grouped_shift`;
    each bucket lexsorts once and then runs pandas' cython grouped-EWM
    kernel over the key runs (no per-row Python).  Not SQL-expressible
    without recursion, so the catalog query is rows-only; the exact
    recurrence is pinned by a naive-fold pytest oracle.
    """
    if not (0.0 < alpha <= 1.0):
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    tag = _bucket_tag(key_col, num_buckets)

    def ewm(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__bucket")
        if g.empty:
            out = g.copy()
            out[out_col] = pd.Series([], dtype="float64")
            return out
        pos, _, _ = _sorted_runs(g, key_col, order_col, tie_col)
        out = g.iloc[pos].copy()
        # rows are sorted by (key, order, tie): groupby(sort=False) emits
        # groups in first-appearance order, so the flattened EWM series
        # aligns positionally with the sorted frame
        out[out_col] = (
            out.groupby(key_col, sort=False)[value_col]
            .ewm(alpha=alpha, adjust=False).mean().to_numpy()
        )
        return out

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(ewm, batch_format="pandas")
    )


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


def unpivot(ds, id_cols: list[str], value_cols: list[str],
            var_name: str = "measure", value_name: str = "value"):
    """Melt wide → long (pivot_wider's inverse, SQL ``UNPIVOT`` /
    ``UNION ALL`` of per-column projections): one output row per
    (input row, value column), id columns repeated, the source column
    name in ``var_name`` and its value cast to float64 in
    ``value_name``.

    Scale shape: a pure per-batch map — each value column contributes a
    zero-copy slice of the batch's id columns plus one cast, so the
    operator streams with no exchange and output size is exactly
    ``len(value_cols)`` × input (the reader should column-prune to
    ``id_cols + value_cols``)."""

    def melt(t: pa.Table) -> pa.Table:
        parts = []
        for c in value_cols:
            cols = {ic: t[ic] for ic in id_cols}
            cols[var_name] = pa.array([c] * t.num_rows, pa.string())
            cols[value_name] = pc.cast(t[c], pa.float64())
            parts.append(pa.table(cols))
        return pa.concat_tables(parts)

    return ds.map_batches(melt, batch_format="pyarrow")


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


def grouped_rolling_range(ds, key_col: str, ts_col: str, value_col: str,
                          range_span: int, out_prefix: str = "range",
                          num_buckets: int = 64):
    """Per-key TIME-based rolling aggregate — SQL ``agg(v) OVER
    (PARTITION BY key ORDER BY ts RANGE BETWEEN range_span PRECEDING AND
    CURRENT ROW)``.  Emits every input row plus ``{prefix}_sum``,
    ``{prefix}_cnt``, ``{prefix}_mean``.

    SQL RANGE frame semantics: a row's frame is every same-key row with
    ``ts ∈ [row.ts − range_span, row.ts]`` — peer rows (equal ts) share
    one frame regardless of physical order.  Same scale shape as
    ``grouped_rolling`` (ONE hash(key)-bucket exchange, one vectorized
    pass per bucket); the frame bounds come from two ``searchsorted``
    probes over a composite ``(key_code << 42) | ts`` axis, so there is
    no per-key dispatch.  Requires ``0 ≤ ts < 2^42`` (epoch-ms until year
    ~2109) and < 2^21 distinct keys per bucket — both asserted.
    """

    def roll(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__bucket")
        if g.empty:
            out = g.copy()
            for c in ("sum", "cnt", "mean"):
                out[f"{out_prefix}_{c}"] = pd.Series([], dtype="float64")
            return out
        keys = g[key_col].to_numpy(dtype=object)
        _, codes = np.unique(keys, return_inverse=True)
        ts = g[ts_col].to_numpy().astype(np.int64)
        # the +range_span headroom keeps a frame start that underflows one
        # key's block from landing inside the previous key's rows
        assert ts.min() >= 0 and ts.max() + range_span < (1 << 42), \
            "ts out of composite range"
        assert codes.max() < (1 << 21), "too many keys per bucket; raise num_buckets"
        comp = (codes.astype(np.int64) << 42) + ts
        pos = np.argsort(comp, kind="stable")
        comp_s = comp[pos]
        v = g[value_col].to_numpy(dtype=np.float64)[pos]
        lo = np.searchsorted(comp_s, comp_s - range_span, side="left")
        hi = np.searchsorted(comp_s, comp_s, side="right")
        csz = np.zeros(len(v) + 1)
        np.cumsum(v, out=csz[1:])
        wsum = csz[hi] - csz[lo]
        wcnt = (hi - lo).astype(np.float64)
        out = g.iloc[pos].copy()
        out[f"{out_prefix}_sum"] = wsum
        out[f"{out_prefix}_cnt"] = wcnt.astype(np.int64)
        out[f"{out_prefix}_mean"] = wsum / wcnt
        return out

    return (
        ds.map_batches(_bucket_tag(key_col, num_buckets), batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(roll, batch_format="pandas")
    )


def grouped_bounds(ds, key_col: str, order_col: str, tie_col: str,
                   value_col: str, ntile: int | None = None,
                   num_buckets: int = 64):
    """Per-key FIRST_VALUE / LAST_VALUE over the full frame (``ROWS
    BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING``) in
    ``(order_col, tie_col)`` order, plus SQL ``NTILE(ntile)`` when
    requested — emitted as ``first_value`` / ``last_value`` / ``tile``.

    NTILE splits each key's rows as evenly as possible with the larger
    buckets first (SQL semantics).  Same scale shape as every ordered
    window here: ONE hash(key)-bucket exchange, one lexsort per bucket,
    index-fill arithmetic — no per-key dispatch.
    """
    tag = _bucket_tag(key_col, num_buckets)

    def bounds(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__bucket")
        if g.empty:
            outd = g.copy()
            outd["first_value"] = pd.Series([], dtype="float64")
            outd["last_value"] = pd.Series([], dtype="float64")
            if ntile:
                outd["tile"] = pd.Series([], dtype="int64")
            return outd
        pos, sc, first = _sorted_runs(g, key_col, order_col, tie_col)
        v = g[value_col].to_numpy(dtype=np.float64)[pos]
        n = len(sc)
        idx = np.arange(n, dtype=np.int64)
        run_start = np.maximum.accumulate(np.where(first, idx, 0))
        starts = np.flatnonzero(first)
        ends_excl = np.r_[starts[1:], n]
        run_end = np.repeat(ends_excl - 1, ends_excl - starts)
        outd = g.iloc[pos].copy()
        outd["first_value"] = v[run_start]
        outd["last_value"] = v[run_end]
        if ntile:
            rn0 = idx - run_start
            cnt = run_end - run_start + 1
            q, r = cnt // ntile, cnt % ntile
            big = r * (q + 1)          # rows covered by the size-(q+1) tiles
            in_big = rn0 < big
            tile = np.where(
                in_big,
                rn0 // np.maximum(q + 1, 1),
                r + (rn0 - big) // np.maximum(q, 1),
            )
            outd["tile"] = tile.astype(np.int64) + 1  # SQL NTILE is 1-based
        return outd

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(bounds, batch_format="pandas")
    )


def grouped_rank(ds, key_col: str, order_col: str, tie_col: str | None,
                 out: dict[str, str], num_buckets: int = 64):
    """Per-key SQL rank window functions, all kinds in ONE pass.

    ``out`` maps output column name → kind ∈ {row_number, rank,
    dense_rank, percent_rank}, all ``OVER (PARTITION BY key ORDER BY
    order_col)``.  Ties on ``order_col`` share rank/dense_rank/
    percent_rank (SQL semantics); ``row_number`` additionally breaks
    ties by ``tie_col`` (required when requested, for determinism).
    ``percent_rank`` = (rank − 1) / (n − 1), 0.0 for single-row keys —
    bit-identical to the SQL double division.  NULL order values are
    rejected (engine-defined placement).

    Scale shape: the module's standard ONE hash(key)-bucket shuffle;
    each bucket lexsorts once and derives every rank kind from the same
    run/tie masks with index-fill tricks — no per-key dispatch.
    """
    kinds = set(out.values())
    bad = kinds - {"row_number", "rank", "dense_rank", "percent_rank",
                   "cume_dist"}
    if bad:
        raise ValueError(f"unknown rank kinds: {bad}")
    if "row_number" in kinds and tie_col is None:
        raise ValueError("row_number needs tie_col for deterministic output")

    tag = _bucket_tag(key_col, num_buckets)

    def ranks(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__bucket")
        if g.empty:
            outd = g.copy()
            for name, kind in out.items():
                outd[name] = pd.Series(
                    [], dtype="float64"
                    if kind in ("percent_rank", "cume_dist") else "int64"
                )
            return outd
        if g[order_col].isna().any():
            raise ValueError(f"grouped_rank: NULLs in order column {order_col!r}")
        pos, sc, first = _sorted_runs(
            g, key_col, order_col, tie_col if tie_col is not None else order_col
        )
        n = len(sc)
        idx = np.arange(n, dtype=np.int64)
        # forward-fill of each run's first index → per-run positions
        run_start = np.maximum.accumulate(np.where(first, idx, 0))
        rn = idx - run_start + 1  # row_number
        ov = g[order_col].to_numpy()[pos]
        new_tie = first.copy()
        new_tie[1:] |= ov[1:] != ov[:-1]  # new ORDER value within the run
        tie_start = np.maximum.accumulate(np.where(new_tie, idx, 0))
        rk = rn[tie_start]               # rank: first row number of the tie
        dr_g = np.cumsum(new_tie)
        dr = dr_g - (dr_g[run_start] - 1)  # dense_rank: ties seen in run
        ends = np.r_[run_start[1:][first[1:]], n]
        cnt = np.repeat(ends - run_start[first], ends - run_start[first])
        outd = g.iloc[pos].copy()
        for name, kind in out.items():
            if kind == "row_number":
                outd[name] = rn
            elif kind == "rank":
                outd[name] = rk
            elif kind == "dense_rank":
                outd[name] = dr
            elif kind == "cume_dist":
                # rows with order value ≤ current / run size: the row
                # number of the LAST row of the current tie group
                tstarts = np.flatnonzero(new_tie)
                tends = np.r_[tstarts[1:], n]
                tie_last_rn = np.repeat(rn[tends - 1], tends - tstarts)
                outd[name] = tie_last_rn / cnt
            else:
                pr = np.zeros(n, dtype=np.float64)
                multi = cnt > 1
                pr[multi] = (rk[multi] - 1) / (cnt[multi] - 1)
                outd[name] = pr
        return outd

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(ranks, batch_format="pandas")
    )


def grouped_resample(ds, key_col: str, ts_col: str, tie_col: str,
                     value_col: str, step: int,
                     grid_col: str = "grid_ms", out_col: str = "value",
                     num_buckets: int = 64):
    """Per-key forward-fill resampling onto a regular time grid — the
    time-series gap-filling reshape (SQL ``generate_series`` + ``ASOF
    JOIN``, which is exactly what the DuckDB oracle runs).

    Grid points for a key are every multiple of ``step`` in
    ``[ceil(min_ts/step)·step, floor(max_ts/step)·step]`` (so every grid
    point has at least one event at-or-before it; keys spanning less
    than one step emit nothing).  The filled value is the key's LAST
    event at or before the grid point, ties on ``ts`` broken by the
    highest ``tie_col``.

    Reference analogue: its compacted views forward-fill per-key state
    between updates (`ConsumerGroupsAlgebra.scala`); this materializes
    that fill onto a regular clock.  Scale shape: ONE hash(key)-bucket
    shuffle, then each bucket resolves ALL keys with one lexsort, an
    arange/repeat grid expansion and a single ``searchsorted`` probe
    over a composite ``(key_code << 42) | ts`` axis — no per-key
    dispatch.  Requires ``0 ≤ ts < 2^42`` and < 2^21 distinct keys per
    bucket (asserted), same contract as ``grouped_rolling_range``.
    """

    def resample(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return pd.DataFrame({
                key_col: g[key_col],
                grid_col: pd.Series([], dtype="int64"),
                out_col: pd.Series([], dtype="float64"),
            })
        keys = g[key_col].to_numpy()
        _, codes = np.unique(keys, return_inverse=True)
        ts = g[ts_col].to_numpy().astype(np.int64)
        assert ts.min() >= 0 and ts.max() < (1 << 42), "ts out of composite range"
        assert codes.max() < (1 << 21), "too many keys per bucket; raise num_buckets"
        pos = np.lexsort((g[tie_col].to_numpy(), ts, codes))
        sc = codes[pos]
        ts_s = ts[pos]
        v_s = g[value_col].to_numpy(dtype=np.float64)[pos]
        first = np.r_[True, sc[1:] != sc[:-1]]
        starts = np.flatnonzero(first)
        ends = np.r_[starts[1:], len(sc)] - 1
        lo = -(-ts_s[starts] // step) * step          # ceil to grid
        hi = (ts_s[ends] // step) * step              # floor to grid
        cnt = np.maximum((hi - lo) // step + 1, 0)
        total = int(cnt.sum())
        if total == 0:
            return pd.DataFrame({
                key_col: keys[:0],
                grid_col: pd.Series([], dtype="int64"),
                out_col: pd.Series([], dtype="float64"),
            })
        run = np.repeat(np.arange(len(starts)), cnt)
        offs = np.zeros(len(starts) + 1, dtype=np.int64)
        np.cumsum(cnt, out=offs[1:])
        grid = lo[run] + (np.arange(total) - offs[run]) * step
        comp_ev = (sc.astype(np.int64) << 42) + ts_s
        comp_g = (sc[starts][run].astype(np.int64) << 42) + grid
        idx = np.searchsorted(comp_ev, comp_g, side="right") - 1
        return pd.DataFrame({
            key_col: keys[pos][starts][run],
            grid_col: grid,
            out_col: v_s[idx],
        })

    return (
        ds.map_batches(_bucket_tag(key_col, num_buckets), batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(resample, batch_format="pandas")
    )


def sessionize(ds, key_col: str, order_col: str, tie_col: str,
               gap: int, out_col: str = "session_id",
               num_buckets: int = 64):
    """Assign a per-key session ordinal to EVERY row (gaps-and-islands):
    a new session starts at a key's first row and whenever the gap from
    the previous row exceeds ``gap`` — SQL ``SUM(CASE WHEN gap > g THEN
    1 ELSE 0 END) OVER (PARTITION BY key ORDER BY order, tie)``.

    The row-level companion of ``session_window`` (which aggregates per
    session; `hydra_ray/stages/windows.py`): this one KEEPS the rows,
    labelling them for downstream joins.  Scale shape: ONE
    hash(key)-bucket shuffle, per-bucket lexsort + two cumsum passes
    resolve all keys at once.
    """

    def label(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__bucket")
        if g.empty:
            out = g.copy()
            out[out_col] = pd.Series([], dtype="int64")
            return out
        pos, sc, first = _sorted_runs(g, key_col, order_col, tie_col)
        ts_s = g[order_col].to_numpy()[pos].astype(np.int64)
        start = first.copy()
        if len(ts_s) > 1:
            start[1:] |= (ts_s[1:] - ts_s[:-1] > gap) & ~first[1:]
        sid = np.cumsum(start)
        run_id = np.cumsum(first) - 1
        base = sid[np.flatnonzero(first)]
        out = g.iloc[pos].copy()
        out[out_col] = sid - base[run_id] + 1
        return out

    return (
        ds.map_batches(_bucket_tag(key_col, num_buckets), batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(label, batch_format="pandas")
    )
