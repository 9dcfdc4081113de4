"""Arrow IPC (Feather-v2) interchange edge: one IPC file per batch task
out, one decode task per file back in.

This is the zero-copy counterpart of the Avro edge (``avrolite.py``):
Avro covers the reference's row-oriented ingest/interchange contract
(`avro/src/main/java/com/pluralsight/hydra/avro/JsonConverter.java`),
while IPC is the columnar hand-off a Ray/Arrow deployment uses between
engines (nested types — ``list<float>`` embeddings, structs, timestamps
— survive bit-exactly with no row materialization).  The file
granularity is the resumable-parallelism unit, same rule as
``sinks.write_partitioned``.
"""

from __future__ import annotations

import os

import pyarrow as pa


def write_ipc(ds, out_dir: str, compression: str | None = "zstd") -> int:
    """Dataset → one Arrow IPC file per batch task under ``out_dir``.
    Returns total rows written.  ``compression`` is the IPC body-buffer
    codec (``zstd``/``lz4``/None) — decoded transparently on read."""
    os.makedirs(out_dir, exist_ok=True)

    def write_batch(t: pa.Table) -> pa.Table:
        import uuid

        # IpcWriteOptions holds C++ state and is not picklable —
        # construct it inside the task, not in the driver closure
        opts = pa.ipc.IpcWriteOptions(compression=compression)
        path = os.path.join(out_dir, f"part-{uuid.uuid4().hex}.arrow")
        with pa.OSFile(path, "wb") as f, pa.ipc.new_file(
            f, t.schema, options=opts
        ) as w:
            w.write_table(t)
        return pa.table({"path": [path],
                         "rows": pa.array([t.num_rows], pa.int64())})

    parts = ds.map_batches(write_batch, batch_format="pyarrow").to_pandas()
    return int(parts["rows"].sum())


def read_ipc(paths, columns: list[str] | None = None):
    """IPC file(s) → Ray Dataset, one decode task per file.  Reads are
    memory-mapped (zero-copy into the task's Arrow buffers); ``columns``
    prunes after the map (IPC files are column-chunked, so unselected
    columns are never touched beyond the footer)."""
    import ray.data as rd

    if isinstance(paths, str):
        if os.path.isdir(paths):
            paths = sorted(
                os.path.join(paths, p) for p in os.listdir(paths)
                if p.endswith(".arrow")
            )
        elif os.path.exists(paths):
            paths = [paths]
        else:
            raise ValueError(f"read_ipc: no such file or directory: {paths}")
    if not paths:
        raise ValueError("read_ipc: no .arrow files found")

    def load(t: pa.Table) -> pa.Table:
        tables = []
        for p in t["path"].to_pylist():
            with pa.memory_map(p, "rb") as m:
                tab = pa.ipc.open_file(m).read_all()
            if columns is not None:
                tab = tab.select(columns)
            tables.append(tab)
        return pa.concat_tables(tables, promote_options="default")

    return rd.from_items([{"path": p} for p in paths]).map_batches(
        load, batch_format="pyarrow", batch_size=1
    )
