"""CSV source with per-row DLQ routing and schema coercion.

Reference parity: the ingest edge accepts multiple wire formats and
routes undecodable records instead of failing the stream
(`KafkaClientAlgebra.scala:354-378` Either-routing; the JSON edge lives
in `sources/jsonl.py`, the Avro edge in `avrolite.py`).  CSV is the
third interchange format a replacement engine gets handed weekly.

Ray-Data-first shape: ``ray.data.read_text`` streams lines; the decoder
is a callable CLASS for ``map_batches``.  The fast path parses a WHOLE
batch of lines with pyarrow's C++ CSV reader in one call (quoted fields,
embedded delimiters, and — because the batch re-joins its lines —
quoted newlines that fall inside one batch).  Only a batch containing a
poison line (wrong column count, uncastable value) falls back to the
per-row path, where bad rows come out as DLQ rows (``error`` column,
same convention as the audio/JSONL decoders).

Documented limits (same as Spark's multiline=false default): a quoted
newline spanning a read_text block boundary cannot be re-joined; such
fragments surface as ColumnCount/quote errors in the DLQ rather than
corrupting neighbours.
"""

from __future__ import annotations

import csv
import io

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["CsvDecoder", "read_csv_records"]

_TRUE = {"true", "True", "TRUE", "1", "t", "T"}
_FALSE = {"false", "False", "FALSE", "0", "f", "F"}


class CsvDecoder:
    """map_batches callable: lines (``text`` column) → typed rows +
    ``error`` column (null = ok) + per-instance ConversionStats."""

    def __init__(self, schema: pa.Schema, delimiter: str = ",",
                 header: bool = True, text_col: str = "text"):
        from ..stages.validate import ConversionStats

        self.schema = schema
        self.delimiter = delimiter
        self.header = header
        self.text_col = text_col
        self.header_line = delimiter.join(schema.names)
        self.stats = ConversionStats()

    # ------------------------------------------------------------ internals
    def _parse_block(self, lines: list) -> pa.Table:
        from pyarrow import csv as pcsv

        buf = ("\n".join(lines)).encode()
        return pcsv.read_csv(
            io.BytesIO(buf),
            read_options=pcsv.ReadOptions(column_names=self.schema.names),
            parse_options=pcsv.ParseOptions(delimiter=self.delimiter),
            convert_options=pcsv.ConvertOptions(
                column_types=self.schema,
                strings_can_be_null=True,
                null_values=[""],
            ),
        )

    def _coerce_column(self, raw: list, typ: pa.DataType,
                       errors: np.ndarray, name: str):
        """Per-row string→type coercion; uncastable values null out and
        stamp the row error (first error wins, like the JSONL path)."""
        s = pd.Series(raw, dtype=object)
        blank = s.isna() | (s == "")
        if pa.types.is_string(typ) or pa.types.is_large_string(typ):
            out = s.where(~blank, None)
            return pa.array(out.tolist(), typ)
        if pa.types.is_boolean(typ):
            vals = [None if b else (True if v in _TRUE else
                                    False if v in _FALSE else "?")
                    for v, b in zip(s.tolist(), blank.tolist())]
            for i, v in enumerate(vals):
                if v == "?":
                    if errors[i] is None:
                        errors[i] = f"TypeCoercionError: {name}"
                    vals[i] = None
            return pa.array(vals, typ)
        if pa.types.is_timestamp(typ):
            parsed = pd.to_datetime(s.where(~blank, None), errors="coerce",
                                    format="ISO8601")
            bad = parsed.isna() & ~blank
        else:
            num = pd.to_numeric(s.where(~blank, None), errors="coerce")
            if pa.types.is_integer(typ):
                frac = num.notna() & (np.mod(num.astype("float64"),
                                             1.0) != 0)
                num = num.where(~frac)
                bad = (num.isna() & ~blank) | frac
            else:
                bad = num.isna() & ~blank
            parsed = num
        for i in np.flatnonzero(bad.to_numpy()):
            if errors[i] is None:
                errors[i] = f"TypeCoercionError: {name}"
        vv = parsed.tolist()
        if pa.types.is_integer(typ):
            vals = [None if pd.isna(v) else int(v) for v in vv]
        elif pa.types.is_timestamp(typ):
            vals = [None if pd.isna(v) else v for v in vv]
        else:
            vals = [None if pd.isna(v) else float(v) for v in vv]
        return pa.array(vals, typ)

    def __call__(self, batch: pa.Table) -> pa.Table:
        lines = batch[self.text_col].to_pylist()
        if self.header:
            # drop header occurrences ONLY at even quote parity, i.e.
            # standalone logical rows (repeated headers from concatenated
            # file blocks).  A physical line equal to the header text that
            # sits INSIDE a quoted multi-line field must survive, or the
            # fast-path rejoin silently corrupts that row (ADVICE r3).
            kept = []
            parity = 0
            for ln in lines:
                if parity == 0 and ln == self.header_line:
                    continue
                kept.append(ln)
                parity = (parity + ln.count('"')) % 2
            lines = kept
        try:
            # fast path keeps empty physical lines: they may be blank
            # lines INSIDE a quoted field (the batch join restores the
            # newlines and pyarrow's reader resolves the quoting);
            # standalone blank lines are ignored by ParseOptions
            parsed = self._parse_block(lines)
            err = pa.nulls(parsed.num_rows, pa.string())
            self.stats.rows_ok += parsed.num_rows
            return parsed.append_column("error", err)
        except Exception:
            pass
        # slow path: isolate poison rows, coerce per column with per-row
        # error capture.  Physical lines first re-join into LOGICAL rows
        # by quote parity (doubled "" escapes add 2, preserving parity),
        # so a poison row elsewhere in the batch cannot silently
        # TRUNCATE a quoted-newline row to its first line — only a
        # quote left dangling at the batch boundary still DLQs (the
        # documented boundary contract).  Standalone empty lines are
        # not rows.
        logical: list[str] = []
        open_parts: list[str] = []
        for ln in lines:
            if open_parts:
                open_parts.append(ln)
                if ln.count('"') % 2 == 1:
                    logical.append("\n".join(open_parts))
                    open_parts = []
            elif ln.count('"') % 2 == 1:
                open_parts = [ln]
            elif ln != "":
                logical.append(ln)
        dangling_idx = None
        if open_parts:                      # dangling open quote → DLQ row
            dangling_idx = len(logical)
            logical.append("\n".join(open_parts))
        lines = logical
        n = len(lines)
        errors = np.full(n, None, dtype=object)
        if dangling_idx is not None:        # csv.reader would silently
            errors[dangling_idx] = (        # truncate it — stamp first
                "CsvParseError: unterminated quoted field at batch "
                "boundary")
        want = len(self.schema.names)
        fields: list[list] = []
        for i, ln in enumerate(lines):
            if errors[i] is not None:
                fields.append([None] * want)
                continue
            try:
                rows = list(csv.reader([ln], delimiter=self.delimiter))
                f = rows[0] if rows else []
                if len(f) != want:
                    raise ValueError(
                        f"ColumnCountError: got {len(f)} want {want}")
                fields.append(f)
            except Exception as e:  # noqa: BLE001 — routed, not raised
                errors[i] = str(e) if str(e).startswith("ColumnCount") \
                    else f"CsvParseError: {e}"
                fields.append([None] * want)
        cols = {}
        for j, f in enumerate(self.schema):
            raw = [r[j] for r in fields]
            cols[f.name] = self._coerce_column(raw, f.type, errors, f.name)
        out = pa.table(cols)
        n_err = int(sum(e is not None for e in errors))
        self.stats.rows_error += n_err
        self.stats.rows_ok += n - n_err
        return out.append_column("error", pa.array(errors, pa.string()))


def read_csv_records(paths, schema: pa.Schema, delimiter: str = ",",
                     header: bool = True, **read_kwargs):
    """Lazy Dataset over CSV file(s), decoded against ``schema``; rows
    that fail parse/coercion carry an ``error`` column instead of
    failing the stream — filter with ``pc.is_null(t["error"])`` or the
    decode-module DLQ split convention."""
    import ray.data as rd

    ds = rd.read_text(paths, drop_empty_lines=False, **read_kwargs)
    return ds.map_batches(
        CsvDecoder(schema, delimiter=delimiter, header=header),
        batch_format="pyarrow",
    )
