"""Substring-level exact duplicate detection (dup windows / dup spans).

Training-corpus substring dedup in the style of Lee et al. 2022
("Deduplicating Training Data Makes Language Models Better",
arXiv:2107.06499): a window of ``L`` consecutive bytes that occurs at
least twice ANYWHERE in the corpus (another document or elsewhere in
the same document) marks a duplicated region.  The published method
builds a corpus-global suffix array; the Ray-Data-first shape here is
the standard distributed equivalent at fixed match length:

1. per-batch map (no shuffle): ONE rolling polynomial hash pass over
   the batch's contiguous Arrow string buffer (`neardup._window_hashes`
   — k vectorized passes, no Python substrings) gathered at each doc's
   valid window offsets → ``(hash, doc, pos)`` rows;
2. ONE hash-bucket exchange (``groupby(hash % num_buckets)``), then a
   vectorized per-bucket run-length kernel over the sorted hashes marks
   every member of a multi-occurrence run — the only wide step;
3. optional per-doc span merge: a second TINY shuffle of the marked
   windows by ``hash(doc)`` and a vectorized gap-merge (fixed ``L``
   means window end offsets are monotone per doc, so a span break is
   simply ``pos > prev_pos + L``).

Scale notes.  Stage 2's exchange carries one row per window: at
``stride=1`` that is one row per corpus byte, the same asymptotic cost
as the suffix-array build it replaces; ``stride > 1`` divides the cost
and coarsens detection granularity to ``stride`` bytes (any duplicate
run ≥ L + stride − 1 bytes is still caught by a window at each
alignment).  ``num_buckets`` caps per-reduce group size — size it to
corpus_bytes / (stride · target_bucket_rows), not to the cluster.
Equal 64-bit window hashes are treated as equal windows (for 10^12
windows the expected collision count at 64 bits is ~0.03); the oracle
compares against exact-substring SQL, which doubles as the collision
check at test scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .neardup import _window_hashes

__all__ = ["window_hash_rows", "duplicate_windows", "duplicate_spans",
           "cut_duplicate_spans"]


def window_hash_rows(texts, ids, L: int, stride: int = 1):
    """``(hash, id, pos)`` arrays for every L-byte window of every doc.

    Windows are gathered at per-doc offsets (``pos`` 0-based, byte
    units, ``pos % stride == 0``), so boundary-crossing windows never
    exist; docs shorter than ``L`` emit nothing.
    """
    arr = pa.array(pd.Series(texts, dtype=object).fillna("").to_numpy(dtype=object),
                   pa.string())
    n = len(arr)
    if n == 0:
        return (np.empty(0, np.uint64), np.empty(0, np.int64),
                np.empty(0, np.int64))
    offsets = np.frombuffer(arr.buffers()[1], dtype=np.int32)[: n + 1].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)[: offsets[-1]]
    lengths = np.diff(offsets)
    counts = np.where(lengths >= L, (lengths - L) // stride + 1, 0)
    total = int(counts.sum())
    if total == 0 or len(data) < L:
        return (np.empty(0, np.uint64), np.empty(0, np.int64),
                np.empty(0, np.int64))
    h = _window_hashes(data, L)
    doc_rep = np.repeat(np.arange(n, dtype=np.int64), counts)
    run_starts = np.zeros(n, dtype=np.int64)
    np.cumsum(counts[:-1], out=run_starts[1:])
    pos = (np.arange(total, dtype=np.int64) - run_starts[doc_rep]) * stride
    hashes = h[offsets[doc_rep] + pos]
    id_vals = np.asarray(ids)[doc_rep]
    return hashes, id_vals, pos


def duplicate_windows(ds, text_col: str = "text", id_col: str = "doc_id",
                      L: int = 30, stride: int = 1, num_buckets: int = 64,
                      keep_first: bool = False):
    """All ``(id, pos)`` whose exact L-byte window occurs ≥ 2 times
    corpus-wide.  One wide exchange (hash-bucketed); every kernel is
    vectorized (see module docstring for the scale shape).

    With ``keep_first`` the CANONICAL occurrence of each duplicated
    window — the globally smallest ``(id, pos)`` — is exempted, which is
    the Lee et al. cleaning rule (cut every copy, keep one)."""

    def emit(t: pa.Table) -> pa.Table:
        hashes, id_vals, pos = window_hash_rows(
            t[text_col].to_pylist(), t[id_col].to_numpy(zero_copy_only=False),
            L, stride)
        return pa.table({
            "__h": hashes,
            id_col: id_vals,
            "pos": pos,
            "__bucket": (hashes % np.uint64(num_buckets)).astype(np.int64),
        })

    def mark(df: pd.DataFrame) -> pd.DataFrame:
        h = df["__h"].to_numpy()
        if keep_first:
            order = np.lexsort((df["pos"].to_numpy(), df[id_col].to_numpy(), h))
        else:
            order = np.argsort(h, kind="stable")
        hs = h[order]
        new_run = np.empty(len(hs), dtype=bool)
        new_run[0] = True
        np.not_equal(hs[1:], hs[:-1], out=new_run[1:])
        run_id = np.cumsum(new_run) - 1
        run_len = np.bincount(run_id)
        dup = run_len[run_id] >= 2
        if keep_first:
            dup &= ~new_run  # the (id, pos)-least row of each run survives
        keep = order[dup]
        return df.iloc[keep][[id_col, "pos"]]

    rows = ds.map_batches(emit, batch_format="pyarrow")
    return rows.groupby("__bucket").map_groups(mark, batch_format="pandas")


def duplicate_spans(ds, text_col: str = "text", id_col: str = "doc_id",
                    L: int = 30, stride: int = 1, num_buckets: int = 64,
                    keep_first: bool = False):
    """Merged duplicated byte ranges per doc: ``(id, start, length)``.

    Overlapping / adjacent duplicated windows coalesce (these are the
    ranges a cleaning pass would cut).  Fixed ``L`` makes window end
    offsets monotone within a doc, so after one lexsort the span break
    mask is pure arithmetic.
    """
    wins = duplicate_windows(ds, text_col, id_col, L, stride, num_buckets,
                             keep_first)

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(df[id_col], index=False).to_numpy()
        return df.assign(__bucket=(h % num_buckets).astype("int64"))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_col].to_numpy()
        pos = df["pos"].to_numpy()
        order = np.lexsort((pos, ids))
        ids, pos = ids[order], pos[order]
        brk = np.empty(len(ids), dtype=bool)
        brk[0] = True
        brk[1:] = (ids[1:] != ids[:-1]) | (pos[1:] > pos[:-1] + L)
        starts = np.flatnonzero(brk)
        span_start = pos[starts]
        last = np.r_[starts[1:] - 1, len(pos) - 1]
        return pd.DataFrame({
            id_col: ids[starts],
            "start": span_start,
            "length": pos[last] + L - span_start,
        })

    return wins.map_batches(bucket, batch_format="pandas") \
               .groupby("__bucket").map_groups(merge, batch_format="pandas")


def cut_duplicate_spans(ds, text_col: str = "text", id_col: str = "doc_id",
                        L: int = 30, stride: int = 1, num_buckets: int = 64):
    """Lee et al. 2022 cleaning pass: REMOVE every duplicated span except
    its canonical (globally first) occurrence and return the cleaned
    corpus — every input row, with ``text`` rewritten and
    ``n_cut_bytes`` recording how much was removed.

    Shape: ``duplicate_spans(keep_first=True)`` (one wide exchange) →
    ONE ``hash(id)``-bucket co-location of docs with their spans → a
    per-bucket cutting pass.  Cutting slices strings per FLAGGED doc
    (the minority by construction — a corpus that is mostly duplicated
    spans should be deduplicated at document level first); unflagged
    docs pass through untouched.
    """
    spans = duplicate_spans(ds, text_col, id_col, L, stride, num_buckets,
                            keep_first=True)

    def tag_docs(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(df[id_col], index=False).to_numpy()
        return df[[id_col, text_col]].assign(
            __bucket=(h % num_buckets).astype("int64"), start=-1, length=0)

    def tag_spans(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(df[id_col], index=False).to_numpy()
        out = df.assign(__bucket=(h % num_buckets).astype("int64"))
        out[text_col] = pd.Series([None] * len(out), dtype=object,
                                  index=out.index)
        return out[[id_col, text_col, "__bucket", "start", "length"]]

    def cut(g: pd.DataFrame) -> pd.DataFrame:
        docs = g[g["start"] < 0]
        sp = g[g["start"] >= 0]
        cuts: dict = {}
        for r in sp.itertuples():
            cuts.setdefault(getattr(r, id_col), []).append((r.start, r.length))
        ids = docs[id_col].to_numpy()
        texts = docs[text_col].to_numpy(dtype=object)
        removed = np.zeros(len(ids), dtype=np.int64)
        for i, did in enumerate(ids):
            ranges = cuts.get(did)
            if not ranges:
                continue
            b = texts[i].encode("utf-8")
            kept, prev = [], 0
            for s, ln in sorted(ranges):
                e = s + ln
                # stride-1 windows start at arbitrary BYTES; snap the cut
                # outward to codepoint boundaries (UTF-8 continuation
                # bytes are 0b10xxxxxx) so slicing never splits a
                # codepoint — the cut swallows any partially-covered
                # codepoint rather than leaving invalid bytes behind
                while s > 0 and (b[s] & 0xC0) == 0x80:
                    s -= 1
                while e < len(b) and (b[e] & 0xC0) == 0x80:
                    e += 1
                s = max(s, prev)       # snapping may touch the prior span
                kept.append(b[prev:s])
                prev = max(prev, e)
            kept.append(b[prev:])
            nb = b"".join(kept)
            removed[i] = len(b) - len(nb)
            texts[i] = nb.decode("utf-8")  # boundaries snapped: always valid
        return pd.DataFrame({
            id_col: ids, text_col: texts, "n_cut_bytes": removed,
        })

    both = ds.map_batches(tag_docs, batch_format="pandas").union(
        spans.map_batches(tag_spans, batch_format="pandas")
    )
    return both.groupby("__bucket").map_groups(cut, batch_format="pandas")
