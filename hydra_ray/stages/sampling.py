"""Dataset-shaping operators for training-data pipelines: deterministic
splits and per-group quota capping.

These are the "shape the corpus" steps that follow dedup/quality in a
web-scale pipeline: carve reproducible train/val partitions and cap any
one source's contribution.  Both are embarrassingly parallel or one
bucketed reduce — no global sort, no driver materialization.

No direct reference analogue (ps-dev/hydra is an ingest engine); the
semantics follow the standard corpus-preparation recipes (hash-based
splitting, per-domain quotas) used by public LLM-data pipelines.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["bottom_k_sample", "budget_cap", "hash_split", "pack_sequences",
           "per_key_topn", "stratified_sample", "weighted_bernoulli"]

_KNUTH = 2654435761  # Knuth multiplicative constant, fits int64 products
_MOD = 1 << 32


def hash_split(ds, id_col: str, splits=(("train", 0.8), ("val", 0.2)),
               out_col: str = "split"):
    """Assign each row a deterministic split label from its integer id.

    ``h = (id * 2654435761) mod 2^32`` maps ids to a uniform lattice; the
    cumulative split fractions partition that range.  The assignment is a
    pure per-row function — stable under repartitioning, resumable, and
    exactly reproducible in SQL (the oracle uses the same arithmetic), so
    train/val membership never drifts between runs or engines.

    Per-batch map only (no shuffle); ids must be integers (string keys
    should pre-hash with ``hashing.hash64``, which is engine-stable but
    not SQL-expressible).
    """
    names = [s for s, _ in splits]
    fracs = np.array([f for _, f in splits], dtype=np.float64)
    if not np.isclose(fracs.sum(), 1.0):
        raise ValueError(f"split fractions must sum to 1, got {fracs.sum()}")
    bounds = np.floor(np.cumsum(fracs) * _MOD).astype(np.int64)
    bounds[-1] = _MOD  # close the range against float rounding

    def assign(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ids) and (ids.min() < 0 or ids.max() > (1 << 63) // _KNUTH):
            # numpy % is non-negative while SQL % keeps the dividend's
            # sign, and the product wraps past ~3.47e9 — either silently
            # diverges from the oracle arithmetic
            raise ValueError(
                f"hash_split ids must be in [0, {(1 << 63) // _KNUTH}]"
            )
        h = (ids * _KNUTH) % _MOD
        lab = np.searchsorted(bounds, h, side="right")
        return t.append_column(
            out_col, pa.array(np.asarray(names, dtype=object)[lab], pa.string())
        )

    return ds.map_batches(assign, batch_format="pyarrow")


def weighted_bernoulli(ds, id_col: str, weight_col: str, num: int,
                       den: int = 1):
    """Weighted Bernoulli (Poisson) sample: keep a row with probability
    ``min(1, weight·num / (den·2^32))`` — decided by the pure-integer
    comparison ``h(id)·den < weight·num`` with the same Knuth hash
    lattice as ``hash_split``.

    The importance-sampling step of corpus shaping (sample long/high-
    quality documents proportionally harder) as a stateless per-batch
    filter: no shuffle, no RNG state, stable under repartitioning, and
    the cross-multiplied integer comparison is bit-identical in SQL
    (no transcendentals to diverge at the ulp level), so membership is
    exactly oracle-checkable.

    Weights must be non-negative integers; ``den ≤ 2^30`` and
    ``max(weight) ≤ 2^62/num`` keep both products inside int64.
    """
    if not (1 <= den <= 1 << 30):
        raise ValueError(f"den must be in [1, 2^30], got {den}")
    if num < 1:
        raise ValueError(f"num must be >= 1, got {num}")
    wmax = (1 << 62) // num

    def keep(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ids) and (ids.min() < 0 or ids.max() > (1 << 63) // _KNUTH):
            raise ValueError(
                f"weighted_bernoulli ids must be in [0, {(1 << 63) // _KNUTH}]"
            )
        w = t[weight_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(w) and (w.min() < 0 or w.max() > wmax):
            raise ValueError(f"weights must be in [0, {wmax}]")
        h = (ids * _KNUTH) % _MOD
        return t.filter(pa.array(h * den < w * num))

    return ds.map_batches(keep, batch_format="pyarrow")


def sample_threshold(fraction: float) -> int:
    """The integer keep-threshold a ``fraction`` maps to on the hash
    lattice — exposed so SQL oracles can embed the exact constant."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return int(np.floor(fraction * _MOD))


def stratified_sample(ds, key_col: str, id_col: str, fractions: dict,
                      default: float = 0.0):
    """Keep a deterministic per-stratum fraction of rows: row survives
    iff ``(id * 2654435761) mod 2^32 < floor(fraction[key] * 2^32)``.

    The standard corpus-rebalancing step (upsample scarce languages /
    downsample dominant domains) as a pure per-batch filter: the same
    multiplicative-hash lattice as ``hash_split``, so membership is
    stable under repartitioning and resumable mid-run, and strata nest —
    a stratum sampled at 0.5 contains every row of the same stratum
    sampled at 0.25.  Keys not in ``fractions`` fall back to ``default``.
    No shuffle; embarrassingly parallel at any scale.
    """
    thresholds = {k: sample_threshold(f) for k, f in fractions.items()}
    default_thr = sample_threshold(default)

    def keep(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ids) and (ids.min() < 0 or ids.max() > (1 << 63) // _KNUTH):
            raise ValueError(
                f"stratified_sample ids must be in [0, {(1 << 63) // _KNUTH}]"
            )
        h = (ids * _KNUTH) % _MOD
        # factorize keys (C-side) + one numpy take over a small per-code
        # threshold table — no per-row dict lookup
        codes, uniques = pd.factorize(
            t[key_col].to_numpy(zero_copy_only=False)
        )
        table = np.array(
            [thresholds.get(k, default_thr) for k in uniques] + [default_thr],
            dtype=np.int64,
        )
        thr = table[codes]             # factorize codes nulls as -1 →
        return t.filter(pa.array(h < thr))  # the appended default slot

    return ds.map_batches(keep, batch_format="pyarrow")


def bottom_k_sample(ds, key_col: str, id_col: str, k: int):
    """Deterministic per-group uniform sample of ``k`` rows — the
    bottom-k (KMV) sketch: keep the rows whose hashed id
    ``(id * 2654435761) mod 2^32`` ranks among the group's ``k``
    smallest (ties broken by ascending id).

    Because the winners are a pure function of the ids, the sample is a
    MERGEABLE summary (bottom-k of a union = bottom-k of concatenated
    bottom-ks — ``per_key_topn``'s per-batch combiner exploits exactly
    that), identical under any partitioning/resume, and exactly
    reproducible in SQL (row_number over the same hash).  Feed the sample
    into any downstream aggregate for grouped approximations with
    O(k·groups) state — e.g. ``grouped_quantile`` over the sample is the
    approximate-quantile sketch.
    """

    def add_h(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ids) and (ids.min() < 0 or ids.max() > (1 << 63) // _KNUTH):
            raise ValueError(
                f"bottom_k_sample ids must be in [0, {(1 << 63) // _KNUTH}]"
            )
        return t.append_column("__h", pa.array((ids * _KNUTH) % _MOD))

    sampled = per_key_topn(
        ds.map_batches(add_h, batch_format="pyarrow"),
        key_col, "__h", k, tie_col=id_col, descending=False,
    )
    return sampled.map_batches(
        lambda t: t.drop_columns(["__h"]), batch_format="pyarrow"
    )


def per_key_topn(ds, key_col: str, order_col: str, n: int, tie_col: str,
                 descending: bool = True, num_buckets: int = 64):
    """Keep at most ``n`` rows per key, ranked by ``order_col`` (ties
    broken by ascending ``tie_col`` so the kept set is deterministic
    under any row order) — the per-source/domain quota cap.

    One hash(key) bucket shuffle, then each bucket ranks ALL its keys in
    a single lexsort + run-length pass (the repo's standard wide-reduce
    shape: ray.data's per-group aggregate dispatches Python per key).
    """
    from ..hashing import hash64

    def rank_filter(g: pd.DataFrame) -> pd.DataFrame:
        keys = g[key_col].to_numpy(dtype=object)
        _, codes = np.unique(keys, return_inverse=True)
        order = g[order_col].to_numpy()
        if descending:
            if order.dtype == object:
                raise TypeError("descending order_col must be numeric")
            if order.dtype == np.bool_ or np.issubdtype(order.dtype, np.unsignedinteger):
                order = order.max() - order  # negation would wrap mod 2^N
            else:
                order = -order
        pos = np.lexsort((g[tie_col].to_numpy(), order, codes))
        sc = codes[pos]
        run_start = np.zeros(len(sc), dtype=bool)
        run_start[0] = True
        run_start[1:] = sc[1:] != sc[:-1]
        run_idx = np.flatnonzero(run_start)
        rank = np.arange(len(sc)) - np.repeat(run_idx, np.diff(np.append(run_idx, len(sc))))
        keep = pos[rank < n]
        return g.iloc[np.sort(keep)]

    def prefilter_tag(g: pd.DataFrame) -> pd.DataFrame:
        # combiner: a key's global top-n is a subset of the union of its
        # per-batch top-n's, so each batch ships at most n rows per key
        # into the shuffle instead of all of them
        if g.empty:
            return g.assign(__bucket=pd.Series([], dtype="int64"))
        g = rank_filter(g)
        b = (hash64(g[key_col].to_numpy(dtype=object)) % np.uint64(num_buckets)).astype(np.int64)
        return g.assign(__bucket=b)

    def cap(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return g.drop(columns="__bucket")
        return rank_filter(g).drop(columns="__bucket")

    return (
        ds.map_batches(prefilter_tag, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(cap, batch_format="pandas")
    )


def pack_sequences(ds, id_col: str, weight_col: str, budget: int,
                   num_buckets: int = 64):
    """Pack documents into training sequences of total ``weight_col``
    (token count) ≤ ``budget`` — the example-packing step before LLM
    pretraining (greedy first-fit over a deterministic document order).

    Semantics: documents are assigned to pack bins greedily in ``(hash64
    (id), id)`` order within their hash bucket; a bin closes when the
    next document would overflow ``budget``; a single document heavier
    than ``budget`` gets a bin of its own (truncation is the consumer's
    call).  Output = every input row plus ``pack_id`` (globally unique
    int64), ``pack_pos`` (0-based position within the pack) and
    ``pack_tokens`` (the pack's total weight).

    Determinism/scale: the bucket is ``hash64(id) % num_buckets`` — a
    pure function of the data, so the SAME packs come out under any
    repartitioning, resume, or cluster size (the repo's partitioning
    rule).  ONE hash-bucket shuffle; each bucket packs ALL its docs in
    one sorted cumsum pass whose only loop is over PACKS (searchsorted
    per pack close — O(packs·log n), packs ≪ rows when budget ≫ mean
    doc weight).
    """
    from ..hashing import hash64

    def tag(t: pa.Table) -> pa.Table:
        h = hash64(t[id_col])
        b = (h % np.uint64(num_buckets)).astype(np.int64)
        return (t.append_column("__h", pa.array(h.astype(np.int64)))
                 .append_column("__bucket", pa.array(b)))

    def pack(g: pd.DataFrame) -> pd.DataFrame:
        bucket = int(g["__bucket"].iloc[0]) if len(g) else 0
        g = g.drop(columns="__bucket")
        if g.empty:
            out = g.drop(columns="__h").copy()
            out["pack_id"] = pd.Series([], dtype="int64")
            out["pack_pos"] = pd.Series([], dtype="int64")
            out["pack_tokens"] = pd.Series([], dtype="int64")
            return out
        pos = np.lexsort((g[id_col].to_numpy(), g["__h"].to_numpy()))
        w = g[weight_col].to_numpy()[pos].astype(np.int64)
        n = len(w)
        cs = np.cumsum(w)
        starts = [0]
        while True:
            s = starts[-1]
            base = cs[s - 1] if s > 0 else 0
            # last j with cs[j] - base <= budget, but at least one doc
            j = int(np.searchsorted(cs, base + budget, side="right"))
            j = max(j, s + 1)
            if j >= n:
                break
            starts.append(j)
        starts = np.asarray(starts, dtype=np.int64)
        ends = np.append(starts[1:], n)
        sizes = ends - starts
        local = np.repeat(np.arange(len(starts), dtype=np.int64), sizes)
        pack_id = (np.int64(bucket) << np.int64(40)) + local
        pack_pos = np.arange(n, dtype=np.int64) - np.repeat(starts, sizes)
        base = np.where(starts > 0, cs[starts - 1], 0)
        pack_tokens = np.repeat(cs[ends - 1] - base, sizes)
        out = g.iloc[pos].drop(columns="__h").copy()
        out["pack_id"] = pack_id
        out["pack_pos"] = pack_pos
        out["pack_tokens"] = pack_tokens
        return out

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(pack, batch_format="pandas")
    )


def budget_cap(ds, key_col: str, order_col: str, tie_col: str,
               weight_col: str, budget: int, descending: bool = True,
               out_col: str = "running_weight", num_buckets: int = 64):
    """Keep each key's best rows until a cumulative weight budget: SQL
    ``sum(w) OVER (PARTITION BY key ORDER BY order [DESC], tie ROWS
    UNBOUNDED PRECEDING) <= budget``.

    The token-budget curation step of a training-data pipeline: per
    language (or domain), take documents in quality order until the
    group's token allowance is spent.  Composes :func:`~hydra_ray.
    stages.rollup.grouped_cumsum` (ONE hash(key)-bucket shuffle, one
    vectorized cumsum per bucket) with a pure per-batch filter; rows at
    the budget boundary are kept iff their INCLUSIVE running sum still
    fits, so output is independent of partitioning and resumable.
    ``out_col`` is emitted as int64 when ``weight_col`` is an integer
    column (float64 cumsum of int64 weights is exact below 2^53).
    """
    import pyarrow.compute as pc

    from .rollup import grouped_cumsum

    work, ocol = ds, order_col
    if descending:
        def neg(t: pa.Table) -> pa.Table:
            return t.append_column("__neg_order", pc.negate(t[order_col]))

        work, ocol = ds.map_batches(neg, batch_format="pyarrow"), "__neg_order"

    out = grouped_cumsum(work, key_col, ocol, tie_col, weight_col,
                         out_col=out_col, num_buckets=num_buckets)
    sch = ds.schema()                 # Arrow or pandas block schema
    wt = dict(zip(sch.names, sch.types))[weight_col]
    int_weight = (pa.types.is_integer(wt) if isinstance(wt, pa.DataType)
                  else np.issubdtype(wt, np.integer))

    def trim(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t[out_col], pa.scalar(float(budget))))
        if descending:
            t = t.drop_columns(["__neg_order"])
        if int_weight:
            i = t.schema.get_field_index(out_col)
            t = t.set_column(i, out_col, pc.cast(t[out_col], pa.int64()))
        return t

    return out.map_batches(trim, batch_format="pyarrow")
