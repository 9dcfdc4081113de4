"""Data-profiling / cleaning operators: grouped histogram, mode,
correlation, z-score outliers.

The profiling pass a pipeline runs before training-data curation
decisions (bin distributions, dominant categories, linear relations,
outlier filtering).  The reference has no analytics at all (its
aggregates are counters/lag totals, SURVEY §2.6); these are
beyond-reference components following the repo's wide-reduce
conventions: exact combiners pre-aggregate per batch wherever one
exists, and the single hash(key)-bucket shuffle pattern everywhere
order/rank is needed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .windows import AggSpec, grouped_aggregate

__all__ = ["grouped_histogram", "grouped_mad", "grouped_mode",
           "grouped_corr", "grouped_outliers", "profile_table"]


def grouped_histogram(ds, group_cols: list[str], value_col: str,
                      lo: float, hi: float, n_bins: int,
                      out_col: str = "n"):
    """Fixed-width histogram per group: rows ``(group…, bin, n)`` with
    under/overflow clamped into the edge bins.  Pure combiner shape —
    per-batch pyarrow counts, one tiny shuffle of (group, bin) partials."""
    w = (hi - lo) / n_bins

    def binify(t: pa.Table) -> pa.Table:
        v = pc.cast(t[value_col], pa.float64()).to_numpy(zero_copy_only=False)
        ok = ~np.isnan(v)
        if not ok.all():
            t = t.filter(pa.array(ok))
            v = v[ok]
        b = np.clip(np.floor((v - lo) / w), 0, n_bins - 1).astype(np.int64)
        return t.append_column("bin", pa.array(b))

    return grouped_aggregate(
        ds.select_columns(list(dict.fromkeys(group_cols + [value_col])))
        .map_batches(binify, batch_format="pyarrow"),
        group_cols + ["bin"],
        [AggSpec("count", None, out_col)],
    )


def grouped_mode(ds, group_cols: list[str], value_col: str,
                 out_col: str = "mode_value", num_buckets: int = 64):
    """Most frequent ``value_col`` per group; ties break to the SMALLEST
    value (deterministic).  Per-batch (group, value) count partials
    prefilter the shuffle, then each bucket resolves all of its groups
    with one factorize + lexsort pass."""
    from ..hashing import hash64

    cnt_name = f"{value_col}_count"
    sel = list(dict.fromkeys(group_cols + [value_col]))

    def partial(t: pa.Table) -> pa.Table:
        gb = t.select(sel).group_by(
            group_cols + [value_col], use_threads=False
        ).aggregate([(value_col, "count")])
        h = hash64(gb[group_cols[0]]).copy()
        for c in group_cols[1:]:
            h ^= hash64(gb[c]) * np.uint64(0x9E3779B97F4A7C15)
        b = (h % np.uint64(num_buckets)).astype(np.int64)
        return gb.append_column("__bucket", pa.array(b))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__bucket")
        if g.empty:
            return g.rename(columns={value_col: out_col}).drop(columns=[cnt_name])
        keys = np.asarray(
            pd.MultiIndex.from_frame(g[group_cols]).to_numpy(), dtype=object
        )
        _, gcodes = np.unique(keys, return_inverse=True)
        _, vcodes = np.unique(g[value_col].to_numpy(), return_inverse=True)
        cnt = g[cnt_name].to_numpy(dtype=np.int64)
        # combine duplicate (group, value) partials from different batches
        order = np.lexsort((vcodes, gcodes))
        gc, vc, ct = gcodes[order], vcodes[order], cnt[order]
        new = np.r_[True, (gc[1:] != gc[:-1]) | (vc[1:] != vc[:-1])]
        starts = np.flatnonzero(new)
        tot = np.add.reduceat(ct, starts)
        gc, vc = gc[starts], vc[starts]
        rows = order[starts]
        # per group: max count, tie → smallest value (vcodes are in value
        # sort order, so lexsort((vc, -tot, gc)) puts the winner first)
        o2 = np.lexsort((vc, -tot, gc))
        win = o2[np.r_[True, gc[o2][1:] != gc[o2][:-1]]]
        out = g.iloc[rows[win]][group_cols + [value_col]].reset_index(drop=True)
        return out.rename(columns={value_col: out_col})

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


def grouped_corr(ds, group_cols: list[str], x_col: str, y_col: str,
                 out_col: str = "corr"):
    """Sample Pearson correlation per group (DuckDB ``corr`` semantics:
    NULL when n ≤ 1 or either variance is 0).  Exact-combiner shape:
    per-batch sums of (x, y, x², y², x·y, n) — composed from the
    existing grouped_aggregate partials plus one product column."""

    def with_xy(t: pa.Table) -> pa.Table:
        x = pc.cast(t[x_col], pa.float64())
        y = pc.cast(t[y_col], pa.float64())
        return t.append_column("__xy", pc.multiply(x, y))

    agg = grouped_aggregate(
        ds.select_columns(list(dict.fromkeys(group_cols + [x_col, y_col])))
        .map_batches(with_xy, batch_format="pyarrow"),
        group_cols,
        [
            AggSpec("count", None, "__n"),
            AggSpec("sum", x_col, "__sx"),
            AggSpec("sum", y_col, "__sy"),
            AggSpec("sum", "__xy", "__sxy"),
            AggSpec("std", x_col, "__stdx"),
            AggSpec("std", y_col, "__stdy"),
        ],
    )

    def finish(t: pa.Table) -> pa.Table:
        n = t["__n"].to_numpy(zero_copy_only=False).astype(np.float64)
        sx = t["__sx"].to_numpy(zero_copy_only=False)
        sy = t["__sy"].to_numpy(zero_copy_only=False)
        sxy = t["__sxy"].to_numpy(zero_copy_only=False)
        stdx = t["__stdx"].to_numpy(zero_copy_only=False)
        stdy = t["__stdy"].to_numpy(zero_copy_only=False)
        with np.errstate(invalid="ignore", divide="ignore"):
            cov = (sxy - sx * sy / n) / (n - 1.0)
            r = cov / (stdx * stdy)
        r = np.where((n > 1) & (stdx > 0) & (stdy > 0), r, np.nan)
        keep = t.select(group_cols)
        return keep.append_column(out_col, pa.array(r, pa.float64()))

    return agg.map_batches(finish, batch_format="pyarrow")


def grouped_outliers(ds, group_cols: list[str], value_col: str,
                     n_sigma: float = 3.0):
    """Rows whose ``value_col`` deviates more than ``n_sigma`` sample
    stddevs from their group mean.  Two passes: the grouped (mean, std)
    stats are O(groups) and broadcast once (ray.put), then one stateless
    filter pass — no second shuffle of the data."""
    import ray

    stats = grouped_aggregate(
        ds.select_columns(list(dict.fromkeys(group_cols + [value_col]))),
        group_cols,
        [AggSpec("mean", value_col, "__m"), AggSpec("std", value_col, "__s")],
    ).to_pandas()
    stats_ref = ray.put(stats)

    def filt(t: pa.Table) -> pa.Table:
        st = ray.get(stats_ref)
        df = pd.DataFrame(
            {c: t[c].to_numpy(zero_copy_only=False) for c in group_cols}
        )
        merged = df.merge(st, on=group_cols, how="left")
        m = merged["__m"].to_numpy(dtype=np.float64)
        s = merged["__s"].to_numpy(dtype=np.float64)
        v = pc.cast(t[value_col], pa.float64()).to_numpy(zero_copy_only=False)
        with np.errstate(invalid="ignore"):
            mask = np.abs(v - m) > n_sigma * s  # NaN stats compare False
        return t.filter(pa.array(np.asarray(mask, dtype=bool)))

    return ds.map_batches(filt, batch_format="pyarrow")


def grouped_mad(ds, group_cols: list[str], value_col: str,
                out_col: str = "mad"):
    """Median absolute deviation per group (DuckDB ``mad`` semantics:
    median of |x − median(x)|, both medians quantile_cont-interpolated).

    Two grouped-quantile shuffles with an O(groups) median broadcast
    between them (``ray.put``, the grouped_outliers pattern) — never a
    second shuffle of the raw data for the join."""
    import ray

    from .windows import grouped_quantile

    cols = list(dict.fromkeys(group_cols + [value_col]))
    ds = ds.select_columns(cols)
    med = grouped_quantile(ds, group_cols, value_col, {"__med": 0.5},
                           interpolation="linear").to_pandas()
    med_ref = ray.put(med)

    def absdev(t: pa.Table) -> pa.Table:
        st = ray.get(med_ref)
        df = pd.DataFrame(
            {c: t[c].to_numpy(zero_copy_only=False) for c in group_cols}
        )
        m = df.merge(st, on=group_cols, how="left")["__med"] \
            .to_numpy(dtype=np.float64)
        v = pc.cast(t[value_col], pa.float64()).to_numpy(zero_copy_only=False)
        out = {c: t[c] for c in group_cols}
        out["__adev"] = pa.array(np.abs(v - m))
        return pa.table(out)

    return grouped_quantile(
        ds.map_batches(absdev, batch_format="pyarrow"), group_cols,
        "__adev", {out_col: 0.5}, interpolation="linear",
    )


def profile_table(ds, cols: list[str], num_buckets: int = 64) -> pa.Table:
    """SUMMARIZE-style one-shot table profile: one output row per column
    with ``n_rows`` / ``n_nonnull`` / exact ``n_distinct`` and (numeric
    columns only) ``min_v`` / ``max_v`` as float64 (null otherwise) —
    the schema-quality pass a pipeline runs before curation decisions.

    Scale shape: two column-pruned streaming passes.  Pass 1 reduces
    counts/min/max per batch to one tiny partial row per column (a
    combiner — only O(blocks × cols) rows ever move).  Pass 2 emits each
    batch's per-column UNIQUE values as injectively-stringified
    ``(col, val)`` pairs into :func:`~.dedup.bucketed_distinct`'s single
    hash-bucket exchange (local pre-dedup bounds the payload by the
    per-block distinct count, never the row count), then a grouped count
    per column.  NaN/null values are excluded from ``n_distinct`` and
    min/max, matching SQL ``count(DISTINCT col)`` / ``min`` / ``max``.
    """
    from .dedup import bucketed_distinct

    # column kinds come from each ARROW batch's concrete schema (Ray's
    # Dataset.schema() reports pandas ext/object dtypes as None/object
    # for pandas-backed blocks, so it cannot be trusted here)
    def _kind(typ: pa.DataType) -> str:
        if pa.types.is_integer(typ):
            return "int"
        if pa.types.is_floating(typ):
            return "float"
        if pa.types.is_timestamp(typ):
            return "ts"
        return "str"

    def stats_partial(t: pa.Table) -> pa.Table:
        rows = []
        for c in cols:
            arr = t[c]
            k = _kind(arr.type)
            n = len(arr)
            nn = n - arr.null_count
            # ±inf = min/max identities (a block may have no numeric
            # values; NaN would poison the combine) — non-numeric
            # columns are nulled out at the end regardless
            mn, mx = np.inf, -np.inf
            if k in ("int", "float"):
                v = pc.cast(arr, pa.float64()).to_numpy(
                    zero_copy_only=False)
                v = v[~np.isnan(v)]
                if len(v):
                    mn, mx = float(v.min()), float(v.max())
            rows.append((c, n, nn, mn, mx, int(k in ("int", "float"))))
        return pa.table({
            "col": pa.array([r[0] for r in rows], pa.string()),
            "n": pa.array([r[1] for r in rows], pa.int64()),
            "nn": pa.array([r[2] for r in rows], pa.int64()),
            "mn": pa.array([r[3] for r in rows], pa.float64()),
            "mx": pa.array([r[4] for r in rows], pa.float64()),
            "isnum": pa.array([r[5] for r in rows], pa.int64()),
        })

    stats = grouped_aggregate(
        ds.map_batches(stats_partial, batch_format="pyarrow"),
        ["col"],
        [AggSpec("sum", "n", "n_rows"), AggSpec("sum", "nn", "n_nonnull"),
         AggSpec("min", "mn", "min_v"), AggSpec("max", "mx", "max_v"),
         AggSpec("max", "isnum", "isnum")],
    ).to_pandas()

    def distinct_pairs(t: pa.Table) -> pa.Table:
        cs, vs = [], []
        for c in cols:
            u = pc.unique(t[c].combine_chunks()).drop_null()
            k = _kind(u.type)
            if k == "str":
                sv = u.cast(pa.string()).to_numpy(
                    zero_copy_only=False).astype(object)
            elif k in ("ts", "int"):
                sv = u.cast(pa.int64()).to_numpy().astype("U")
            else:
                v = u.cast(pa.float64()).to_numpy(zero_copy_only=False)
                v = v[~np.isnan(v)] + 0.0   # NaN is not NULL; -0.0 → +0.0
                # str() of float64 is shortest-round-trip → injective
                sv = v.astype("U")
            cs.append(np.full(len(sv), c, dtype=object))
            vs.append(sv.astype(object))
        return pa.table({
            "col": pa.array(np.concatenate(cs) if cs else [], pa.string()),
            "val": pa.array(np.concatenate(vs) if vs else [], pa.string()),
        })

    dist = grouped_aggregate(
        bucketed_distinct(
            ds.map_batches(distinct_pairs, batch_format="pyarrow"),
            ["col", "val"], num_buckets=num_buckets),
        ["col"], [AggSpec("count", None, "n_distinct")],
    ).to_pandas()

    # left merge: an all-null column emits ZERO distinct pairs and would
    # vanish from an inner merge
    out = stats.merge(dist, on="col", how="left").sort_values(
        "col", ignore_index=True)
    out["n_distinct"] = out["n_distinct"].fillna(0)
    for c in ("min_v", "max_v"):
        out[c] = out[c].astype("float64")
    # all-null numeric column: the ±inf identities survive → SQL NULL
    # (checked while still float64, before the object-dtype None fill)
    bad = ~np.isfinite(out["min_v"].to_numpy(dtype=np.float64,
                                             na_value=np.nan))
    mask = (out["isnum"].to_numpy() == 0) | bad
    out.loc[mask, ["min_v", "max_v"]] = None
    return pa.table({
        "col": pa.array(out["col"], pa.string()),
        "n_rows": pa.array(out["n_rows"].astype(np.int64)),
        "n_nonnull": pa.array(out["n_nonnull"].astype(np.int64)),
        "n_distinct": pa.array(out["n_distinct"].astype(np.int64)),
        "min_v": pa.array(out["min_v"], pa.float64()),
        "max_v": pa.array(out["max_v"], pa.float64()),
    })
