"""Resumable partitioned batch output.

``write_partitioned`` writes a Dataset as one directory per key-hash
partition with a per-partition ``_DONE`` marker, committed stage→rename:
a crashed run leaves finished partitions adopted and unfinished ones
invisible, and the NEXT run skips every ``_DONE`` partition at the map
stage (their rows are filtered before any work or shuffle).  That makes
bulk output restartable at partition granularity — the batch-side
counterpart of the streaming sink's per-partition epochs
(`table/lancelite.py commit_epoch`), and the "never one giant file"
rule at 100 TB: partition count is chosen from the KEY SPACE, not the
cluster.

Layout::

    root/
      part=17/
        <ray write_parquet files>
        _DONE            # json: rows, run id
      _stage/<run>/      # in-flight run output (discarded on crash)
"""

from __future__ import annotations

import contextlib
import json
import os
import shutil
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .hashing import add_partition_column

__all__ = ["write_partitioned", "done_partitions", "sorted_write",
           "read_sorted", "ordered_execution"]

_PART_PREFIX = "part="


def done_partitions(root: str) -> set[int]:
    """Partitions already committed under ``root`` (by ``_DONE`` marker)."""
    if not os.path.isdir(root):
        return set()
    out = set()
    for name in os.listdir(root):
        if name.startswith(_PART_PREFIX) and os.path.exists(
            os.path.join(root, name, "_DONE")
        ):
            out.add(int(name[len(_PART_PREFIX):]))
    return out


def write_partitioned(ds, root: str, key_col: str | None = None,
                      num_partitions: int = 64,
                      partition_col: str | None = None):
    """Write ``ds`` under ``root`` as ``part=<hash(key) % P>/`` directories,
    skipping partitions already marked ``_DONE`` by a previous (possibly
    crashed) run.  Returns ``{partition: rows}`` for partitions committed
    BY THIS RUN (empty partitions commit too, so a resume never rescans
    them).

    Pass ``partition_col`` to partition on an EXISTING int column in
    ``[0, num_partitions)`` (e.g. an IVF list id) instead of hashing
    ``key_col``.

    One streaming pass: tag+filter in ``map_batches``, then Ray Data's
    partitioned ``write_parquet`` into a stage directory; the driver
    renames each partition into place and writes its marker (O(P) cheap
    metadata work).  A crash before a partition's rename leaves it in
    ``_stage`` — invisible to readers and re-done next run.
    """
    os.makedirs(root, exist_ok=True)
    # single-writer contract: stale stage dirs are crashed runs — discard
    shutil.rmtree(os.path.join(root, "_stage"), ignore_errors=True)
    done = done_partitions(root)
    run = uuid.uuid4().hex[:12]
    stage = os.path.join(root, "_stage", run)

    done_arr = np.array(sorted(done), dtype=np.int32)

    if (key_col is None) == (partition_col is None):
        raise ValueError("pass exactly one of key_col / partition_col")

    def tag_and_filter(t: pa.Table) -> pa.Table:
        if partition_col is None:
            # add_partition_column drops any pre-existing 'partition' column
            t = add_partition_column(t, key_col, num_partitions)
        else:
            part = t[partition_col].to_numpy(zero_copy_only=False).astype(np.int64)
            if len(part) and (part.min() < 0 or part.max() >= num_partitions):
                raise ValueError(
                    f"{partition_col} values outside [0, {num_partitions})"
                )
            if partition_col != "partition":
                if "partition" in t.column_names:
                    t = t.drop_columns(["partition"])
                t = t.append_column("partition", pa.array(part.astype(np.int32)))
        if len(done_arr):
            part = t["partition"].to_numpy(zero_copy_only=False)
            t = t.filter(pa.array(~np.isin(part, done_arr)))
        return t

    ds.map_batches(tag_and_filter, batch_format="pyarrow").write_parquet(
        stage, partition_cols=["partition"]
    )

    committed: dict[int, int] = {}
    staged = set()
    if os.path.isdir(stage):
        for name in os.listdir(stage):
            if not name.startswith("partition="):
                continue
            p = int(name.split("=", 1)[1])
            staged.add(p)
            src = os.path.join(stage, name)
            dest = os.path.join(root, f"{_PART_PREFIX}{p}")
            os.makedirs(dest, exist_ok=True)
            # a dest without _DONE may hold orphans from a run that
            # crashed mid-adoption: wipe them or the re-write duplicates
            for f in list(os.listdir(dest)):
                os.unlink(os.path.join(dest, f))
            rows = 0
            for f in sorted(os.listdir(src)):
                if f.endswith(".parquet"):
                    rows += pq.read_metadata(os.path.join(src, f)).num_rows
                    os.replace(os.path.join(src, f), os.path.join(dest, f))
            _mark_done(dest, rows, run)
            committed[p] = rows
    # empty partitions: commit a marker so a resume never re-waits on them
    for p in range(num_partitions):
        if p in done or p in staged:
            continue
        dest = os.path.join(root, f"{_PART_PREFIX}{p}")
        os.makedirs(dest, exist_ok=True)
        _mark_done(dest, 0, run)
        committed[p] = 0
    shutil.rmtree(os.path.join(root, "_stage", run), ignore_errors=True)
    return committed


def _mark_done(dest: str, rows: int, run: str) -> None:
    tmp = os.path.join(dest, f"_DONE.tmp.{run}")
    with open(tmp, "w") as f:
        json.dump({"rows": rows, "run": run}, f)
    os.replace(tmp, os.path.join(dest, "_DONE"))


def sorted_write(ds, value_col: str, root: str,
                 tiebreak_cols: tuple = (),
                 num_partitions: int = 64, sample_per_block: int = 32):
    """Globally SORTED partitioned output without an all-to-all
    ``ds.sort``: sample-sort range cutpoints (``stages.sort``) assign
    each row a range id, ONE ``groupby(range)`` exchange sorts each
    range with a single lexsort, and the resumable ``write_partitioned``
    commit lays ranges out as ``part=<i>/`` dirs in key order.
    ``read_sorted`` re-reads the whole tree in global order — the
    write-side counterpart of ``global_rank`` (§2.7).

    Range count is chosen from the KEY SPACE (cutpoint dedup may shrink
    it when the value distribution is discrete); each range must fit one
    worker's heap — the same contract as any range partitioner.
    """
    from .stages.sort import range_cutpoints

    cuts = range_cutpoints(ds, value_col, num_partitions, sample_per_block)
    if cuts is None:
        return write_partitioned(ds, root, key_col=value_col,
                                 num_partitions=1)
    nb = len(cuts) + 1

    def tag(t: pa.Table) -> pa.Table:
        v = t[value_col].to_numpy(zero_copy_only=False)
        part = np.searchsorted(cuts, v, side="left").astype(np.int32)
        if "partition" in t.column_names:
            t = t.drop_columns(["partition"])
        return t.append_column("partition", pa.array(part))

    def sort_range(g):
        keys = tuple(
            g[c].to_numpy() for c in reversed(tuple(tiebreak_cols))
        ) + (g[value_col].to_numpy(),)
        order = np.lexsort(keys)
        return g.iloc[order]

    ranged = (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("partition")
        .map_groups(sort_range, batch_format="pandas")
    )
    return write_partitioned(ranged, root, partition_col="partition",
                             num_partitions=nb)


@contextlib.contextmanager
def ordered_execution():
    """Scope in which Ray Data executions preserve block order.

    Ray's streaming executor does NOT preserve block order by default
    (tasks emit as they finish); ``preserve_order`` is the documented
    switch for order-sensitive consumption.  It lives on the
    process-global ``DataContext``, so flipping it permanently would
    silently cost every later unrelated pipeline its out-of-order
    pipelining — this restores the prior value on exit.  Consume any
    order-sensitive Dataset (``read_sorted``) inside this scope."""
    from ray.data import DataContext

    opts = DataContext.get_current().execution_options
    prev = opts.preserve_order
    opts.preserve_order = True
    try:
        yield
    finally:
        opts.preserve_order = prev


def read_sorted(root: str):
    """Lazy Dataset over a ``sorted_write`` tree in GLOBAL order: part
    dirs ascend by range id and each part's files/rows were written in
    sorted order, so path-ordered read tasks yield ordered blocks.

    The Dataset is lazy — order is only realized if it EXECUTES with
    ``preserve_order`` on; consume it inside ``ordered_execution()``:

        with ordered_execution():
            df = read_sorted(root).to_pandas()
    """
    import ray.data as rd

    paths = []
    for name in sorted(
        (n for n in os.listdir(root) if n.startswith(_PART_PREFIX)),
        key=lambda n: int(n.split("=", 1)[1]),
    ):
        d = os.path.join(root, name)
        paths.extend(
            os.path.join(d, f) for f in sorted(os.listdir(d))
            if f.endswith(".parquet")
        )
    if not paths:
        return rd.from_items([])
    return rd.read_parquet(paths)
