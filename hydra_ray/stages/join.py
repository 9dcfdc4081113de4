"""Join operators: broadcast lookup, keyed hash join, interval (stream) join.

The reference's joins are all stream-enrichment lookups against a small
side (SURVEY.md §2.5: `MetadataAlgebra.scala:54-68` schema lookups,
`KafkaAdminAlgebra.scala:207-217` lag join, `ConsumerGroupsOffsetConsumer
.scala:59-74` checkpoint seek-join).  Here:

- ``broadcast_join`` — the small side is ``ray.put`` once and merged
  inside every ``map_batches`` task (no shuffle); the Ray-native J1/J2.
- ``keyed_join`` — both sides large: co-partition by key hash
  (``groupby(key).map_groups`` = an explicit partitioned hash join).
- ``interval_join`` — the batch form of the streaming symmetric-hash
  join (`hydra_ray.state.store`): left row ℓ matches right row r when
  keys are equal and ``r.ts ∈ [ℓ.ts + lo, ℓ.ts + hi)``.  Partitioning
  assumption: all rows of one key fit one group (hot keys need the
  salting path, `hydra_ray.stages.skew`).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .windows import ts_to_ms

__all__ = [
    "broadcast_join",
    "keyed_join",
    "bucketed_join",
    "interval_join",
    "asof_join",
    "interval_overlap_join",
]


def _arrow_schema_of(ds) -> pa.Schema:
    """Dataset schema as pyarrow, tolerating pandas-block datasets (their
    object dtype is assumed to be string — the engine's convention)."""
    base = ds.schema().base_schema
    if isinstance(base, pa.Schema):
        return base
    fields = []
    for name, dt in zip(base.names, base.types):
        if getattr(dt, "kind", None) == "O" or dt == object:
            fields.append(pa.field(name, pa.string()))
        else:
            fields.append(pa.field(name, pa.from_numpy_dtype(dt)))
    return pa.schema(fields)


def bucketed_join(
    left,
    right,
    key: str,
    how: str = "inner",
    num_buckets: int = 32,
    suffix: str = "_r",
    bloom_fpp: float | None = None,
    reduce_fn=None,
):
    """Partitioned hash join with BUCKETED reduce granularity.

    Like ``keyed_join`` but the wide step groups by ``hash(key) %
    num_buckets`` instead of by key, so each reduce is ONE vectorized
    pandas merge over a bucket (C-side) rather than a Python dispatch per
    key — the right shape when the key cardinality is large relative to
    the cluster.  Same single all-to-all as any hash join; ``num_buckets``
    only sets reduce parallelism, never results.

    ``how``: pandas merge kinds (inner/left/outer/...) plus ``semi`` /
    ``anti`` — existence filters that emit the LEFT columns only.

    ``bloom_fpp`` turns on a runtime Bloom prefilter (``stages/bloom.py``)
    when the RIGHT side is much smaller than the left: right keys build a
    broadcast bitmap, and left rows that cannot match skip the exchange —
    dropped outright for inner/semi, emitted directly for anti (a bloom
    miss is a definite anti keep).  Results are identical for any fpp;
    the right side is scanned twice (once to build, once to join), so
    leave it None unless the left side dominates the shuffle.  Not valid
    for left/outer joins (unmatched left rows must still be emitted with
    null padding, so nothing can be dropped).

    ``reduce_fn`` (pa.Table -> pa.Table), when given, runs on the COMPLETE
    merged bucket table inside the groupby reduce.  This is the only place
    a downstream kernel may assume key-complete input: a separate
    ``map_batches`` after the join sees blocks that Ray's dynamic block
    splitting may have sliced at arbitrary row boundaries once a reduce
    output exceeds ``target_max_block_size`` (~128 MiB), silently breaking
    any per-key whole-group logic.  Fused kernels (per-key dedup/counts/
    top-k) must therefore be passed here, not chained after the join.
    """
    from ..hashing import hash64

    if reduce_fn is not None and bloom_fpp is not None and how == "anti":
        # the bloom anti bypass emits left rows WITHOUT a bucket reduce,
        # so reduce_fn would see key-incomplete batches there
        raise ValueError("reduce_fn is incompatible with bloom_fpp anti joins")

    if bloom_fpp is not None:
        import ray

        from .bloom import bloom_filter_batches, build_bloom

        if how not in ("inner", "semi", "anti"):
            raise ValueError(
                f"bloom_fpp requires how in inner/semi/anti, got {how!r}"
            )
        bloom_ref = ray.put(build_bloom(right, key, fpp=bloom_fpp))
        if how == "anti":
            bypass = bloom_filter_batches(left, bloom_ref, key, keep_hits=False)
            hits = bloom_filter_batches(left, bloom_ref, key, keep_hits=True)
            joined = bucketed_join(hits, right, key, "anti", num_buckets, suffix)
            return bypass.union(joined)
        left = bloom_filter_batches(left, bloom_ref, key, keep_hits=True)

    lschema = _arrow_schema_of(left)
    rschema = _arrow_schema_of(right)
    lnames = list(lschema.names)
    rnames = list(rschema.names)
    shared = set(lnames) & set(rnames) - {key}
    if shared:
        raise ValueError(
            f"bucketed_join: non-key columns shared by both sides: {shared}"
        )
    all_fields = [lschema.field(n) for n in lnames] + [
        rschema.field(n) for n in rnames if n != key
    ]

    def tag(side: int):
        def f(t: pa.Table) -> pa.Table:
            # pad to the union schema so every block is type-identical —
            # heterogeneous blocks break the sort-based groupby
            for fld in all_fields:
                if fld.name not in t.column_names:
                    t = t.append_column(fld.name, pa.nulls(t.num_rows, fld.type))
            t = t.select([fld.name for fld in all_fields])
            b = (hash64(t[key]) % np.uint64(num_buckets)).astype(np.int32)
            t = t.append_column("__bucket", pa.array(b))
            return t.append_column("__side", pa.array([side] * t.num_rows, pa.int8()))

        return f

    both = left.map_batches(tag(0), batch_format="pyarrow").union(
        right.map_batches(tag(1), batch_format="pyarrow")
    )

    # the null padding of the other side's columns makes pandas upcast
    # ints to float64 in the grouped block; cast each side's own columns
    # back (its own rows are null-free) or downstream key hashing breaks
    ldtypes = {f.name: f.type.to_pandas_dtype() for f in lschema}
    rdtypes = {f.name: f.type.to_pandas_dtype() for f in rschema}

    # declared output schema: empty buckets otherwise re-infer object
    # columns (bytes, lists) as string/null and break the NEXT exchange
    # when this join's output feeds another sort/groupby
    out_schema = pa.schema(
        [lschema.field(n) for n in lnames]
        + [rschema.field(n) for n in rnames if n != key]
    )

    # semi/anti joins emit the LEFT columns only (existence filter)
    left_only_schema = pa.schema([lschema.field(n) for n in lnames])

    def merge(g: pd.DataFrame) -> pa.Table:
        gl = g[g["__side"] == 0][lnames].astype(ldtypes)
        gr = g[g["__side"] == 1][rnames].astype(rdtypes)
        if how in ("semi", "anti"):
            hit = gl[key].isin(gr[key].unique())
            out = gl[hit if how == "semi" else ~hit]
            out_t = pa.Table.from_pandas(
                out, schema=left_only_schema, preserve_index=False
            )
            return reduce_fn(out_t) if reduce_fn is not None else out_t
        out = gl.merge(gr, on=key, how=how, suffixes=("", suffix))
        # from_pandas semantics: NaN padding from outer joins → nulls,
        # ints stay ints; every block leaves with the identical schema
        out_t = pa.Table.from_pandas(out, schema=out_schema, preserve_index=False)
        return reduce_fn(out_t) if reduce_fn is not None else out_t

    return both.groupby("__bucket").map_groups(merge, batch_format="pandas")


# per-worker-process cache of fetched broadcast sides (keyed by object
# ref), so a task pool deserializes each side once per worker instead of
# once per batch — without paying actor-pool spin-up per query
_BCAST_CACHE: dict = {}


def _bcast_get(ref):
    import ray

    key = ref.hex()
    obj = _BCAST_CACHE.get(key)
    if obj is None:
        obj = ray.get(ref)
        if len(_BCAST_CACHE) >= 4:
            _BCAST_CACHE.pop(next(iter(_BCAST_CACHE)))
        _BCAST_CACHE[key] = obj
    return obj


def broadcast_join(ds, small_df: pd.DataFrame, on: str | list[str], how: str = "inner"):
    """Merge a small pandas side into every batch (no shuffle).

    The side table is shipped to the object store once (``ray.put``);
    tasks fetch it from the local plasma store and keep a deserialized
    copy per worker process (``_BCAST_CACHE``).  A plain task pool beats
    the previous actor pool here: no per-query actor spin-up, and the
    pool elastically uses every CPU.
    """
    import ray

    ref = ray.put(small_df)

    def merge(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.merge(_bcast_get(ref), on=on, how=how)

    return ds.map_batches(merge, batch_format="pandas")


def dim_join(left, dim, on: str, how: str = "inner",
             broadcast_max_rows: int = 1_000_000, num_buckets: int = 32,
             suffix: str = "_r"):
    """Fact ⋈ dimension join with an EXPLICIT broadcast bound.

    The documented cutover rule for dimension tables (VERDICT r3 #5):
    broadcast the dimension only while it is genuinely small
    (≤ ``broadcast_max_rows``); beyond the bound fall back to the
    partitioned ``bucketed_join`` — identical results, one all-to-all
    exchange instead of a per-task object-store copy.  region/nation/
    supplier/part stay broadcastable at any scale factor; ``customer``
    (~150k·SF rows) crosses the default bound between sf≈6 and sf10, at
    which point every caller of this helper switches shape automatically
    instead of OOMing a worker heap.

    ``dim`` is a Dataset (materialized once: the row count and the
    broadcast read the same execution) or an already-collected pandas
    DataFrame.  ``how``: inner/left (dimension columns attach) or
    semi/anti (existence filter, left columns only).
    """
    import ray

    if isinstance(dim, pd.DataFrame):
        n = len(dim)
        small_df = dim
    else:
        dim = dim.materialize()
        n = dim.count()
        small_df = None

    if n <= broadcast_max_rows:
        if small_df is None:
            small_df = dim.to_pandas()
        if how in ("semi", "anti"):
            keys_ref = ray.put(np.sort(small_df[on].to_numpy()))

            def filt(t: pa.Table) -> pa.Table:
                keys = _bcast_get(keys_ref)
                v = t[on].to_numpy(zero_copy_only=False)
                if not len(keys):
                    hit = np.zeros(len(v), dtype=bool)
                else:
                    idx = np.searchsorted(keys, v)
                    idx[idx == len(keys)] = 0
                    hit = keys[idx] == v
                return t.filter(pa.array(hit if how == "semi" else ~hit))

            return left.map_batches(filt, batch_format="pyarrow")
        return broadcast_join(left, small_df, on=on, how=how)

    if small_df is not None:
        import ray.data as rd

        dim = rd.from_pandas(small_df)
    return bucketed_join(left, dim, key=on, how=how,
                         num_buckets=num_buckets, suffix=suffix)


def keyed_join(
    left,
    right,
    key: str,
    how: str = "inner",
    left_cols: list[str] | None = None,
    right_cols: list[str] | None = None,
    suffix: str = "_r",
):
    """Partitioned hash join of two Datasets on ``key``.

    Tags each side, unions, groups by key, merges per group.  One
    all-to-all shuffle on the join key (same key a streaming deployment
    would co-partition both topics by).
    """

    left = left.select_columns(left_cols) if left_cols else left
    right = right.select_columns(right_cols) if right_cols else right
    lnames = left.schema().names
    rnames = right.schema().names

    lt = left.map_batches(
        lambda t: t.append_column("__side", pa.array([0] * t.num_rows, pa.int8())),
        batch_format="pyarrow",
    )
    rt = right.map_batches(
        lambda t: t.append_column("__side", pa.array([1] * t.num_rows, pa.int8())),
        batch_format="pyarrow",
    )
    both = lt.union(rt)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        # column ownership is explicit (an empty side still has its schema)
        gl = g[g["__side"] == 0][[c for c in lnames if c in g.columns]]
        gr = g[g["__side"] == 1][[c for c in rnames if c in g.columns]]
        if how == "inner" and (gl.empty or gr.empty):
            return pd.DataFrame()
        return gl.merge(gr, on=key, how=how, suffixes=("", suffix))

    return both.groupby(key).map_groups(merge, batch_format="pandas")


def interval_join(
    left,
    right,
    key: str,
    left_ts: str,
    right_ts: str,
    lo_ms: int,
    hi_ms: int,
    left_cols: list[str],
    right_cols: list[str],
    suffix: str = "_r",
):
    """Batch interval join: keys equal and right.ts − left.ts ∈ [lo, hi).

    Same match semantics as the streaming symmetric-hash join with
    ``join_window = hi`` (there the left is the clip stream, the right the
    update stream).  Implemented as a key-hash shuffle + per-key numpy
    interval sweep.
    """

    from ..hashing import hash64

    num_buckets = 32

    def tag(side: int):
        def f(t: pa.Table) -> pa.Table:
            b = (hash64(t[key]) % np.uint64(num_buckets)).astype(np.int64)
            t = t.append_column("__bucket", pa.array(b))
            return t.append_column("__side", pa.array([side] * t.num_rows, pa.int8()))

        return f

    lsel = left.select_columns(list(dict.fromkeys([key, left_ts] + left_cols)))
    rsel = right.select_columns(list(dict.fromkeys([key, right_ts] + right_cols)))
    both = lsel.map_batches(tag(0), batch_format="pyarrow").union(
        rsel.map_batches(tag(1), batch_format="pyarrow")
    )

    # reduce per BUCKET: every key of the bucket sweeps in one vectorized
    # pass over a composite (key_code, ts) ordering — per-key map_groups
    # dispatches each group in Python (O(keys) driver-speed work)
    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        gl = g[g["__side"] == 0]
        gr = g[g["__side"] == 1]
        if gl.empty or gr.empty:
            return pd.DataFrame()
        lms = ts_to_ms(pa.Array.from_pandas(gl[left_ts]))
        rms = ts_to_ms(pa.Array.from_pandas(gr[right_ts]))
        # np.unique, not pd.factorize: the pandas object hashtable
        # C-string-compares, collapsing NUL-containing keys
        keys_all = np.concatenate(
            [gl[key].to_numpy(dtype=object), gr[key].to_numpy(dtype=object)]
        )
        _, codes = np.unique(keys_all, return_inverse=True)
        cl, cr = codes[: len(gl)].astype(np.int64), codes[len(gl) :].astype(np.int64)
        lo_all = lms + lo_ms
        hi_all = lms + hi_ms
        tmin = min(int(rms.min()), int(lo_all.min()))
        span = max(int(rms.max()), int(hi_all.max())) - tmin + 2
        r_comp = cr * span + (rms - tmin)
        r_order = np.argsort(r_comp, kind="stable")
        r_sorted = r_comp[r_order]
        starts = np.searchsorted(r_sorted, cl * span + (lo_all - tmin), side="left")
        ends = np.searchsorted(r_sorted, cl * span + (hi_all - tmin), side="left")
        counts = ends - starts
        total = int(counts.sum())
        li = np.repeat(np.arange(len(gl)), counts)
        if total:
            run = np.repeat(np.cumsum(counts) - counts, counts)
            pos = np.arange(total, dtype=np.int64) - run + np.repeat(starts, counts)
            ri = r_order[pos]
        else:
            ri = np.empty(0, np.int64)
        out_l = gl.iloc[li][[key, left_ts] + left_cols].reset_index(drop=True)
        out_r = gr.iloc[ri][[right_ts] + right_cols].reset_index(drop=True)
        out_r.columns = [
            c + suffix if c in out_l.columns else c for c in out_r.columns
        ]
        return pd.concat([out_l, out_r], axis=1)

    return both.groupby("__bucket").map_groups(per_bucket, batch_format="pandas")


def interval_overlap_join(
    left,
    right,
    key: str,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    left_cols: list[str],
    right_cols: list[str],
    suffix: str = "_r",
    num_buckets: int = 32,
):
    """General interval-overlap join: keys equal and the half-open
    intervals ``[l.start, l.end)`` and ``[r.start, r.end)`` overlap
    (``l.start < r.end AND r.start < l.end``) — SQL's classic range join.

    Start/end columns are int64 (same units both sides); intervals may
    have ANY per-row length.  Beyond-reference family: `interval_join`
    covers the fixed-window stream-enrichment case, this is the general
    two-sided form (validity-interval joins, overlapping-session pairs).

    Scale shape: ONE key-hash shuffle of both sides, then each bucket
    resolves ALL keys in one pass — right rows sorted once by a
    composite ``(key_code, r.start)`` axis, each left row's candidate
    run bounded by two ``searchsorted`` probes (``r.start ∈ (l.start −
    L, l.end)`` where ``L`` = the bucket's max right-interval length),
    then the exact ``r.end > l.start`` mask filters the expansion.
    Partitioning assumption: a key's rows fit one bucket group; a few
    giant right intervals inflate L and hence the candidate fan-out —
    pre-split pathological intervals upstream if that bites.
    """

    from ..hashing import hash64

    def tag(side: int):
        def f(t: pa.Table) -> pa.Table:
            b = (hash64(t[key]) % np.uint64(num_buckets)).astype(np.int64)
            t = t.append_column("__bucket", pa.array(b))
            return t.append_column("__side", pa.array([side] * t.num_rows, pa.int8()))

        return f

    lsel = left.select_columns(
        list(dict.fromkeys([key, left_start, left_end] + left_cols)))
    rsel = right.select_columns(
        list(dict.fromkeys([key, right_start, right_end] + right_cols)))
    both = lsel.map_batches(tag(0), batch_format="pyarrow").union(
        rsel.map_batches(tag(1), batch_format="pyarrow")
    )
    lout = list(dict.fromkeys([key, left_start, left_end] + left_cols))
    rout = list(dict.fromkeys([right_start, right_end] + right_cols))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        gl = g[g["__side"] == 0]
        gr = g[g["__side"] == 1]
        if gl.empty or gr.empty:
            return pd.DataFrame()
        ls = gl[left_start].to_numpy(dtype=np.int64)
        le = gl[left_end].to_numpy(dtype=np.int64)
        rs = gr[right_start].to_numpy(dtype=np.int64)
        re_ = gr[right_end].to_numpy(dtype=np.int64)
        keys_all = np.concatenate(
            [gl[key].to_numpy(dtype=object), gr[key].to_numpy(dtype=object)]
        )
        _, codes = np.unique(keys_all, return_inverse=True)
        cl, cr = codes[: len(gl)].astype(np.int64), codes[len(gl):].astype(np.int64)
        L = max(int((re_ - rs).max()), 0)
        lo_all = ls - L                      # candidate run: r.start > l.start − L
        tmin = min(int(rs.min()), int(lo_all.min()))
        span = max(int(rs.max()), int(le.max())) - tmin + 2
        r_comp = cr * span + (rs - tmin)
        r_order = np.argsort(r_comp, kind="stable")
        r_sorted = r_comp[r_order]
        starts = np.searchsorted(r_sorted, cl * span + (lo_all - tmin), side="right")
        ends = np.searchsorted(r_sorted, cl * span + (le - tmin), side="left")
        counts = np.maximum(ends - starts, 0)
        total = int(counts.sum())
        if not total:
            return pd.DataFrame()
        li = np.repeat(np.arange(len(gl)), counts)
        run = np.repeat(np.cumsum(counts) - counts, counts)
        pos = np.arange(total, dtype=np.int64) - run + np.repeat(starts, counts)
        ri = r_order[pos]
        keep = re_[ri] > ls[li]              # exact overlap check
        li, ri = li[keep], ri[keep]
        out_l = gl.iloc[li][lout].reset_index(drop=True)
        out_r = gr.iloc[ri][rout].reset_index(drop=True)
        out_r.columns = [
            c + suffix if c in out_l.columns else c for c in out_r.columns
        ]
        return pd.concat([out_l, out_r], axis=1)

    return both.groupby("__bucket").map_groups(per_bucket, batch_format="pandas")


def asof_join(
    left,
    right,
    key: str,
    left_ts: str,
    right_ts: str,
    left_cols: list[str],
    right_cols: list[str],
    tie_col: str | None = None,
    tolerance_ms: int | None = None,
    suffix: str = "_r",
    num_buckets: int = 32,
):
    """Backward as-of join: each left row matches the single right row of
    the same key with the greatest ``right_ts <= left_ts`` (optionally
    within ``left_ts - right_ts <= tolerance_ms``); ties on the timestamp
    break to the greatest ``tie_col`` so the match is deterministic under
    any row/block order.  Inner semantics: unmatched left rows drop.

    Shape mirrors ``interval_join``: one key-hash bucket shuffle, then a
    per-BUCKET vectorized kernel — every key of a bucket resolves in one
    lexsort + searchsorted pass over a composite (key_code, ts) ordering,
    never a per-key Python dispatch.  Same partitioning assumption: one
    key's rows share a bucket (salt hot keys upstream, `stages/skew`).
    """
    from ..hashing import hash64

    def tag(side: int):
        def f(t: pa.Table) -> pa.Table:
            b = (hash64(t[key]) % np.uint64(num_buckets)).astype(np.int64)
            t = t.append_column("__bucket", pa.array(b))
            return t.append_column("__side", pa.array([side] * t.num_rows, pa.int8()))

        return f

    rkeep = list(dict.fromkeys([key, right_ts] + right_cols
                               + ([tie_col] if tie_col else [])))
    lsel = left.select_columns(list(dict.fromkeys([key, left_ts] + left_cols)))
    rsel = right.select_columns(rkeep)
    both = lsel.map_batches(tag(0), batch_format="pyarrow").union(
        rsel.map_batches(tag(1), batch_format="pyarrow")
    )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        gl = g[g["__side"] == 0]
        gr = g[g["__side"] == 1]
        if gl.empty or gr.empty:
            return pd.DataFrame()
        lms = ts_to_ms(pa.Array.from_pandas(gl[left_ts]))
        rms = ts_to_ms(pa.Array.from_pandas(gr[right_ts]))
        # np.unique, not pd.factorize: the pandas object hashtable
        # C-string-compares, collapsing NUL-containing keys
        keys_all = np.concatenate(
            [gl[key].to_numpy(dtype=object), gr[key].to_numpy(dtype=object)]
        )
        _, codes = np.unique(keys_all, return_inverse=True)
        cl, cr = codes[: len(gl)].astype(np.int64), codes[len(gl):].astype(np.int64)
        tmin = int(min(lms.min(), rms.min()))
        span = int(max(lms.max(), rms.max())) - tmin + 2
        r_comp = cr * span + (rms - tmin)
        if tie_col:
            r_order = np.lexsort((gr[tie_col].to_numpy(), r_comp))
        else:
            r_order = np.argsort(r_comp, kind="stable")
        r_sorted = r_comp[r_order]
        # side="right" lands AFTER every right row with comp <= target,
        # so idx points at the greatest (ts, tie) match
        idx = np.searchsorted(r_sorted, cl * span + (lms - tmin), "right") - 1
        valid = idx >= 0
        safe = np.where(valid, idx, 0)
        cand = r_sorted[safe]
        valid &= (cand // span) == cl  # same key
        if tolerance_ms is not None:
            valid &= (lms - tmin) - (cand % span) <= tolerance_ms
        li = np.flatnonzero(valid)
        if not len(li):
            return pd.DataFrame()
        ri = r_order[idx[li]]
        out_l = gl.iloc[li][[key, left_ts] + left_cols].reset_index(drop=True)
        out_r = gr.iloc[ri][[right_ts] + right_cols].reset_index(drop=True)
        out_r.columns = [
            c + suffix if c in out_l.columns else c for c in out_r.columns
        ]
        return pd.concat([out_l, out_r], axis=1)

    return both.groupby("__bucket").map_groups(per_bucket, batch_format="pandas")
