"""Distributed SQL set operations (EXCEPT / INTERSECT, distinct semantics).

The reference's set semantics are keyed-topic membership (compacted
views); the general relational forms live here.  Shape: per-batch local
dedup with a source tag (combiner — the exchange carries one row per
distinct value per block per side), ONE hash-bucket exchange over the
value columns, then a vectorized per-bucket membership resolve
(`groupby(cols).any()` per side).  Like every wide reduce in this repo
it groups by ``hash(value) % num_buckets``, never per key, so the
reduce stays C-side at any cardinality (CLAUDE.md ray.data pitfall).

SQL ``EXCEPT`` / ``INTERSECT`` are DISTINCT by definition — output rows
are unique.  The ``ALL`` (bag) variants keep MULTIPLICITY arithmetic:
the combiner carries per-block value COUNTS instead of membership
flags, the same single exchange sums them per side, and each value
emits ``max(cnt_a − cnt_b, 0)`` (EXCEPT ALL) or ``min(cnt_a, cnt_b)``
(INTERSECT ALL) repeated rows via one ``np.repeat`` — never a row per
duplicate through the shuffle.
"""

from __future__ import annotations

import pandas as pd

__all__ = ["except_distinct", "intersect_distinct", "union_distinct",
           "except_all", "intersect_all"]


def _canon_hash(df: pd.DataFrame, cols: list[str]):
    """Row hash that is dtype-canonical across union-compatible sides:
    integer/bool columns hash as float64, so ``1`` (int64, side a) and
    ``1.0`` (float64, side b) land in the same bucket — the same value
    coercion SQL applies to set-op branches.  The per-bucket groupby
    then compares post-``concat`` (pandas-coerced) values exactly."""
    view = df[cols].copy()
    for c in cols:
        if pd.api.types.is_integer_dtype(view[c]) or pd.api.types.is_bool_dtype(view[c]):
            view[c] = view[c].astype("float64")
    return pd.util.hash_pandas_object(view, index=False).to_numpy()


def _tagged_union(a, b, cols: list[str], num_buckets: int):
    def tag(side: int):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            out = df[cols].drop_duplicates()
            h = _canon_hash(out, cols)
            return out.assign(
                __side=side, __bucket=(h % num_buckets).astype("int64")
            )

        return fn

    return a.map_batches(tag(0), batch_format="pandas").union(
        b.map_batches(tag(1), batch_format="pandas")
    )


def _membership_reduce(ds, cols: list[str], keep):
    """Per bucket: one groupby over the value columns with per-side ANY
    flags; ``keep(in_a, in_b)`` selects output membership."""

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.assign(__a=df["__side"] == 0, __b=df["__side"] == 1)
            .groupby(cols, sort=False, dropna=False)[["__a", "__b"]]
            .any()
            .reset_index()
        )
        return g.loc[keep(g["__a"], g["__b"]), cols]

    return ds.groupby("__bucket").map_groups(resolve, batch_format="pandas")


def except_distinct(a, b, cols: list[str], num_buckets: int = 32):
    """``SELECT DISTINCT cols FROM a EXCEPT SELECT DISTINCT cols FROM b``."""
    u = _tagged_union(a, b, cols, num_buckets)
    return _membership_reduce(u, cols, lambda in_a, in_b: in_a & ~in_b)


def intersect_distinct(a, b, cols: list[str], num_buckets: int = 32):
    """``SELECT DISTINCT cols FROM a INTERSECT SELECT DISTINCT cols FROM b``."""
    u = _tagged_union(a, b, cols, num_buckets)
    return _membership_reduce(u, cols, lambda in_a, in_b: in_a & in_b)


def union_distinct(a, b, cols: list[str], num_buckets: int = 32):
    """``SELECT cols FROM a UNION SELECT cols FROM b`` (SQL UNION is
    distinct).  Same tagged-combiner exchange; membership keeps all."""
    u = _tagged_union(a, b, cols, num_buckets)
    return _membership_reduce(u, cols, lambda in_a, in_b: in_a | in_b)


def _counted_union(a, b, cols: list[str], num_buckets: int):
    def tag(side: int):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            out = df.groupby(cols, sort=False, dropna=False).size()
            out = out.rename("__n").reset_index()
            h = _canon_hash(out, cols)
            return out.assign(
                __side=side, __bucket=(h % num_buckets).astype("int64")
            )

        return fn

    return a.map_batches(tag(0), batch_format="pandas").union(
        b.map_batches(tag(1), batch_format="pandas")
    )


def _bag_reduce(ds, cols: list[str], times):
    """Per bucket: sum per-side counts per value, emit each value
    ``times(cnt_a, cnt_b)`` times (one np.repeat, C-side)."""
    import numpy as np

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(
            __na=df["__n"].where(df["__side"] == 0, 0),
            __nb=df["__n"].where(df["__side"] == 1, 0),
        )
        g = (
            df.groupby(cols, sort=False, dropna=False)[["__na", "__nb"]]
            .sum()
            .reset_index()
        )
        k = times(g["__na"].to_numpy(), g["__nb"].to_numpy())
        k = np.maximum(k, 0)
        return g.loc[g.index.repeat(k), cols].reset_index(drop=True)

    return ds.groupby("__bucket").map_groups(resolve, batch_format="pandas")


def except_all(a, b, cols: list[str], num_buckets: int = 32):
    """``SELECT cols FROM a EXCEPT ALL SELECT cols FROM b`` — each value
    survives ``max(count_a − count_b, 0)`` times (bag difference)."""
    u = _counted_union(a, b, cols, num_buckets)
    return _bag_reduce(u, cols, lambda na, nb: na - nb)


def intersect_all(a, b, cols: list[str], num_buckets: int = 32):
    """``SELECT cols FROM a INTERSECT ALL SELECT cols FROM b`` — each
    value survives ``min(count_a, count_b)`` times (bag intersection)."""
    import numpy as np

    u = _counted_union(a, b, cols, num_buckets)
    return _bag_reduce(u, cols, lambda na, nb: np.minimum(na, nb))
