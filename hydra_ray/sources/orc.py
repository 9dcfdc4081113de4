"""ORC interchange edge: Dataset ↔ ORC files via pyarrow.orc.

Unlike the Avro edge (`avrolite.py` — a row-oriented pure-Python codec,
kept for registry/evolution semantics), ORC is handled entirely by the
Arrow-native reader/writer: batches never leave columnar form, so the
write is one zero-copy `orc.write_table` per batch task and the read is
one `ORCFile.read` per file task.  File granularity IS the resumable-
parallelism unit, the same rule as `sinks.write_partitioned` and
`avrolite.write_avro`.

ORC's stripe statistics give the same prune-at-read property as parquet
row groups; `read_orc(columns=...)` pushes column pruning into the
reader so only the needed columns leave storage.

Reference analogue: format-dispatched interchange at the ingest edge
(SURVEY §2.3 P10) — the analytical hot path stays parquet, ORC/Avro/CSV
/JSONL are the edges a replacement engine must read and write.
"""

from __future__ import annotations

import os

import pyarrow as pa

__all__ = ["write_orc", "read_orc"]


def write_orc(ds, out_dir: str, compression: str = "zstd") -> int:
    """Dataset → one ORC file per batch task under ``out_dir``.
    Returns total rows written."""
    os.makedirs(out_dir, exist_ok=True)

    def write_batch(t: pa.Table) -> pa.Table:
        import uuid

        import pyarrow.orc as orc

        path = os.path.join(out_dir, f"part-{uuid.uuid4().hex}.orc")
        orc.write_table(t, path, compression=compression)
        return pa.table({"path": [path],
                         "rows": pa.array([t.num_rows], pa.int64())})

    parts = ds.map_batches(write_batch, batch_format="pyarrow").to_pandas()
    return int(parts["rows"].sum())


def read_orc(paths, columns: list[str] | None = None):
    """ORC file(s) → Ray Dataset, one read task per file, column
    pruning pushed into the Arrow reader."""
    import ray.data as rd

    if isinstance(paths, str):
        if os.path.isdir(paths):
            paths = sorted(
                os.path.join(paths, p) for p in os.listdir(paths)
                if p.endswith(".orc")
            )
        else:
            paths = [paths]
    if not paths:
        raise ValueError("read_orc: no .orc files found")

    def load(t: pa.Table) -> pa.Table:
        import pyarrow.orc as orc

        tables = [
            orc.ORCFile(p).read(columns=columns)
            for p in t["path"].to_pylist()
        ]
        return pa.concat_tables(tables)

    return rd.from_items([{"path": p} for p in paths]).map_batches(
        load, batch_format="pyarrow", batch_size=1
    )
