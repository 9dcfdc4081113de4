"""JSONL source with the reference's JSON→schema conversion semantics.

Reference parity (P1, `avro/src/main/java/com/pluralsight/hydra/avro/
JsonConverter.java:120-231` + `ConversionStats.java`): parse JSON
records against a declared schema with per-field coercion (the Arrow
cast covers string→num / num→bool / widening), defaults filled from the
schema (`stages/validate.py fill_defaults` — the shared kernel), STRICT
mode rejecting unknown fields, and missing/unknown-field counters.

Ray-Data-first shape: `ray.data.read_text` streams lines; the decoder is
a callable CLASS for `map_batches` (actor-poolable; the schema/defaults
live in ``__init__``).  The fast path parses a WHOLE batch of lines with
pyarrow's C++ JSON reader in one call; only a batch containing a poison
line falls back to per-row parsing, and the bad rows come out as DLQ
rows (``error`` column, same convention as the audio decoder) instead of
failing the stream — the reference's per-record
``Either[Throwable, Record]`` routing.
"""

from __future__ import annotations

import io
import json

import numpy as np
import pyarrow as pa

__all__ = ["JsonlDecoder", "read_jsonl"]


class JsonlDecoder:
    """map_batches callable: lines (``text`` column) → typed rows +
    ``error`` column (null = ok) + per-instance ConversionStats."""

    def __init__(self, schema: pa.Schema, strict: bool = False,
                 defaults: dict | None = None, text_col: str = "text"):
        from ..stages.validate import ConversionStats

        self.schema = schema
        self.strict = strict
        self.defaults = defaults or {}
        self.text_col = text_col
        self.stats = ConversionStats()

    # ------------------------------------------------------------ internals
    def _coerce(self, parsed: pa.Table) -> tuple[pa.Table, list[str]]:
        """Project a parsed table onto the schema (defaults filled, casts
        applied); returns (table, unknown column names)."""
        from ..stages.validate import fill_defaults

        unknown = [c for c in parsed.column_names
                   if self.schema.get_field_index(c) < 0]
        out = fill_defaults(parsed, self.schema, self.defaults)
        return out, unknown

    def _parse_block(self, lines: list) -> pa.Table:
        from pyarrow import json as pj

        buf = ("\n".join(lines)).encode()
        return pj.read_json(
            io.BytesIO(buf),
            parse_options=pj.ParseOptions(
                # infer keeps unknown columns visible so strict mode can
                # count and reject them (the reference reports WHICH
                # fields were unexpected, not just that one was)
                unexpected_field_behavior="infer",
            ),
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        lines = batch[self.text_col].to_pylist()
        errors: list = [None] * n
        try:
            parsed = self._parse_block(lines)
            if parsed.num_rows != n:  # blank lines collapse: force slow path
                raise ValueError("row count mismatch (blank/poison lines)")
        except Exception:
            # slow path: isolate poison rows and coerce PER VALUE (the
            # JsonConverter.typeConvert semantics — a mixed-type column,
            # which the C++ block parser rejects outright, coerces row by
            # row here, and uncastable values become row errors)
            rows = []
            for i, ln in enumerate(lines):
                try:
                    obj = json.loads(ln)
                    if not isinstance(obj, dict):
                        raise TypeError("not a JSON object")
                    rows.append(obj)
                except Exception as e:  # noqa: BLE001 — routed, not raised
                    errors[i] = f"JsonParseError: {e}"
                    rows.append({})
            cols = {}
            for f in self.schema:
                vals = [r.get(f.name) for r in rows]
                try:
                    cols[f.name] = pa.array(vals, f.type)
                except Exception:
                    coerced = []
                    for i, v in enumerate(vals):
                        if v is None:
                            coerced.append(None)
                            continue
                        try:
                            coerced.append(pa.scalar(v).cast(f.type).as_py())
                        except Exception:
                            if errors[i] is None:
                                errors[i] = f"TypeCoercionError: {f.name}"
                            coerced.append(None)
                    cols[f.name] = pa.array(coerced, f.type)
            seen = set().union(*[r.keys() for r in rows]) if rows else set()
            parsed = pa.table(cols)
            for c in sorted(seen - set(self.schema.names)):
                parsed = parsed.append_column(c, pa.nulls(n, pa.null()))
        out, unknown = self._coerce(parsed)
        err = np.asarray(errors, dtype=object)
        if unknown:
            for c in unknown:
                self.stats.unknown_fields[c] = (
                    self.stats.unknown_fields.get(c, 0) + n
                )
            if self.strict:
                bad = err == None  # noqa: E711 — elementwise
                err = np.where(
                    bad, f"UndefinedFields: {sorted(unknown)}", err
                )
        for f in self.schema:
            if parsed.schema.get_field_index(f.name) < 0:
                self.stats.missing_fields[f.name] = (
                    self.stats.missing_fields.get(f.name, 0) + n
                )
        n_err = int((err != None).sum())  # noqa: E711
        self.stats.rows_error += n_err
        self.stats.rows_ok += n - n_err
        return out.append_column("error", pa.array(err, pa.string()))


def read_jsonl(paths, schema: pa.Schema, strict: bool = False,
               defaults: dict | None = None, **read_kwargs):
    """Lazy Dataset over JSONL file(s), decoded against ``schema``; pair
    with ``stages.decode.split_dlq`` to route the ``error`` rows."""
    import ray.data as rd

    ds = rd.read_text(paths, **read_kwargs)
    return ds.map_batches(
        JsonlDecoder(schema, strict=strict, defaults=defaults),
        batch_format="pyarrow",
    )
