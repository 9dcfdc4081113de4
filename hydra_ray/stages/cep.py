"""CEP sequence-pattern operators: multi-step funnel detection.

The north-star rule calls the engine a structured-streaming/CEP engine;
windows + the symmetric stream-stream join cover the streaming side,
and this module adds the classic CEP batch primitive Ray Data has no
built-in for: ordered multi-step sequence matching per key ("did the
user do A, then B, then C, each strictly after the previous, within a
window?").  The reference has no analogue (its views are last-write-wins
compactions — `ingestors/kafka/src/main/scala/hydra/kafka/algebras/
ConsumerGroupsAlgebra.scala`); this follows the beyond-reference
ordered-window family conventions in `rollup.py`.

Semantics (earliest-completion chain — the standard funnel definition,
expressible in SQL as nested per-key MIN subqueries, which is exactly
what the DuckDB oracle runs):

    t1(key) = min order over rows with type == steps[0]
    t_i(key) = min order over rows with type == steps[i] and
               order > t_{i-1}(key)            (strictly after)
    match(key) iff every t_i exists and t_n - t1 <= within (if set).

Scale shape: ONE hash(key)-bucket shuffle, then each bucket resolves
ALL of its keys per step with one boolean mask + one ``np.minimum.at``
scatter — no Python dispatch per key, state per bucket is O(keys), and
the shuffle payload is only (key, order, type).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["funnel_match", "transition_counts"]

_I64MAX = np.iinfo(np.int64).max
_I64MIN = np.iinfo(np.int64).min


def funnel_chain(keys: np.ndarray, order: np.ndarray, typ: np.ndarray,
                 steps) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized earliest-completion chain over one partition's rows.

    Returns (unique_keys, t) where t is (n_keys, n_steps) int64 with
    _I64MAX marking "step never reached".  Shared by the batch operator
    and its tests."""
    uniq, codes = np.unique(keys, return_inverse=True)
    prev = np.full(len(uniq), _I64MIN, dtype=np.int64)
    cols = []
    for s in steps:
        cur = np.full(len(uniq), _I64MAX, dtype=np.int64)
        cand = (typ == s) & (order > prev[codes])
        np.minimum.at(cur, codes[cand], order[cand])
        cols.append(cur)
        prev = cur
    return uniq, np.stack(cols, axis=1)


def funnel_match(ds, key_col: str, order_col: str, type_col: str,
                 steps, within: int | None = None, num_buckets: int = 64):
    """Emit one row per key whose event stream contains the step types
    in order (strictly increasing ``order_col``), earliest-completion
    chain; columns ``key_col, t1 .. t<n>`` (int64 ``order_col`` units).

    ``within`` (same units as ``order_col``) bounds t_n − t1.
    """
    from ..hashing import hash64

    steps = list(steps)
    tcols = [f"t{i + 1}" for i in range(len(steps))]

    def tag(t: pa.Table) -> pa.Table:
        b = (hash64(t[key_col]) % np.uint64(num_buckets)).astype(np.int64)
        return t.append_column("__bucket", pa.array(b))

    def match(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__bucket")
        if g.empty:
            out = pd.DataFrame({key_col: g[key_col]})
            for c in tcols:
                out[c] = pd.Series([], dtype="int64")
            return out
        keys = g[key_col].to_numpy()
        order = g[order_col].to_numpy(dtype=np.int64)
        typ = g[type_col].to_numpy(dtype=object)
        uniq, t = funnel_chain(keys, order, typ, steps)
        done = t[:, -1] != _I64MAX
        if within is not None:
            done &= (t[:, -1] - t[:, 0]) <= within
        out = pd.DataFrame({key_col: uniq[done]})
        for i, c in enumerate(tcols):
            out[c] = t[done, i]
        return out

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(match, batch_format="pandas")
    )


def transition_counts(ds, key_col: str, order_col: str, tie_col: str,
                      type_col: str, prev_col: str = "prev_type",
                      next_col: str = "next_type", count_col: str = "cnt",
                      num_buckets: int = 64):
    """Markov transition matrix over per-key ordered event sequences:
    for every key, walk its events in ``(order, tie)`` order and count
    each adjacent ``(prev type, next type)`` pair — SQL ``LAG(type)
    OVER (PARTITION BY key ORDER BY order, tie)`` + GROUP BY pair.

    Reference analogue: its consumer-group state machine folds ordered
    per-key event streams (`ingestors/kafka/src/main/scala/hydra/kafka/
    algebras/ConsumerGroupsAlgebra.scala`); this generalizes the fold
    into the sequence-mining primitive (session-path bigram counts).

    Scale shape: ONE hash(key)-bucket shuffle (a key's rows must meet to
    be ordered), then each bucket resolves ALL keys in one lexsort +
    factorize pass and emits at most ``n_types²`` partial-count rows, so
    the final combine is a tiny grouped sum — output size is independent
    of row count.
    """
    from .windows import AggSpec, grouped_aggregate
    from ..hashing import hash64

    def tag(t: pa.Table) -> pa.Table:
        b = (hash64(t[key_col]) % np.uint64(num_buckets)).astype(np.int64)
        return t.append_column("__bucket", pa.array(b))

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            prev_col: pd.Series([], dtype=object),
            next_col: pd.Series([], dtype=object),
            count_col: pd.Series([], dtype=np.int64),
        })
        if g.empty:
            return empty
        keys = g[key_col].to_numpy(dtype=object)
        _, codes = np.unique(keys, return_inverse=True)
        pos = np.lexsort((g[tie_col].to_numpy(), g[order_col].to_numpy(),
                          codes))
        sc = codes[pos]
        tcodes, tvals = pd.factorize(g[type_col].to_numpy(dtype=object)[pos])
        within = sc[1:] == sc[:-1]          # adjacent rows of the SAME key
        if not within.any():
            return empty
        nt = len(tvals)
        pair = tcodes[:-1][within] * nt + tcodes[1:][within]
        cnt = np.bincount(pair, minlength=nt * nt)
        nz = np.flatnonzero(cnt)
        return pd.DataFrame({
            prev_col: tvals[nz // nt],
            next_col: tvals[nz % nt],
            count_col: cnt[nz].astype(np.int64),
        })

    partials = (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(pairs, batch_format="pandas")
    )
    return grouped_aggregate(
        partials, [prev_col, next_col],
        [AggSpec("sum", count_col, count_col)],
    )


def match_pattern(ds, key_col: str, order_col: str, tie_col: str,
                  symbol_col: str, pattern: str,
                  out_col: str = "n_matches", num_buckets: int = 64):
    """Regex CEP over per-key ordered symbol strings (MATCH_RECOGNIZE-lite).

    Each key's rows are ordered by ``(order_col, tie_col)`` and reduced
    to a string of one-character symbols (the first codepoint of
    ``symbol_col``); the result counts NON-OVERLAPPING leftmost matches
    of ``pattern`` per key — identical to SQL
    ``len(regexp_extract_all(string_agg(substr(sym,1,1), ''
    ORDER BY order, tie), pattern))``.  This is the general-pattern
    complement to :func:`funnel_match` (fixed step chain): Kleene stars,
    alternation and optional steps all come for free from the regex.

    Scale shape: :func:`~..rollup.collect_sorted`'s ONE hash(key)-bucket
    exchange builds each key's symbol string with a single Arrow
    ``binary_join`` per bucket, then the regex scan is one C-side pandas
    ``str.count`` pass per batch (the regex engine loops, not Python).
    Per-key strings are O(rows in the key) — cap pathological keys
    upstream (``per_key_topn``).  Keep patterns RE2-compatible (no
    backreferences) so the semantics match a Google-RE2-based oracle.
    """
    import pyarrow.compute as pc

    from .rollup import collect_sorted

    def symbolize(t: pa.Table) -> pa.Table:
        return pa.table({
            key_col: t[key_col],
            order_col: t[order_col],
            tie_col: t[tie_col],
            "__sym": pc.utf8_slice_codeunits(t[symbol_col], 0, 1),
        })

    seqs = collect_sorted(
        ds.map_batches(symbolize, batch_format="pyarrow"),
        key_col, order_col, tie_col, "__sym",
        sep="", out_col="__seq", num_buckets=num_buckets,
    )

    def count(g: pd.DataFrame) -> pd.DataFrame:
        n = g["__seq"].str.count(pattern).astype(np.int64)
        out = g[[key_col]].copy()
        out[out_col] = n
        return out

    return seqs.map_batches(count, batch_format="pandas")
