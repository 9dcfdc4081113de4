"""Schema validation: strict/relaxed record checking + tombstone factory.

Reference parity (the conformance core of the ingest flow):

- Strict vs Relaxed validation
  (`core/.../transport/ValidationStrategy.scala:21-42`,
  `avro/.../convert/StringToGenericRecord.scala:28-51`): Strict rejects
  payload fields not present in the declared schema; Relaxed projects
  them away under standard rules.
- Required/missing fields + defaults
  (`avro/src/main/java/com/pluralsight/hydra/avro/JsonConverter.java:
  138-231`): missing non-nullable fields without defaults are errors;
  defaults are filled in.
- Logical types (`StringToGenericRecord.scala:58-85`): ``uuid`` strings
  must parse; ``timestamp-millis`` must be > 0 when the check is enabled
  (the reference enables it per topic for "new" topics —
  `IngestionFlowV2Spec.scala:185-221`).
- Key/value consistency (`services/IngestionFlowV2.scala:120-141`):
  fields present in both key and value schemas must agree.
- Tombstones (`core/.../ingest/HydraRequest.scala:13-14`): a null payload
  with a present key is a delete marker, not an error.
- Conversion stats (`avro/.../ConversionStats.java`): per-batch counts of
  missing/unknown fields.

The declared schema is a ``pyarrow.Schema`` with optional field metadata:
``required`` (b"true"), ``logical`` (b"uuid" | b"timestamp-millis").
Validation is a ``map_batches`` operator: per-batch vectorized checks,
errors into an error column (DLQ routing), never per-row exceptions.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.compute as pc

from .keys import validate_ts_millis, validate_uuid

__all__ = [
    "ValidationStrategy",
    "RecordValidator",
    "ConversionStats",
    "make_tombstones",
    "fill_defaults",
]


class ValidationStrategy:
    STRICT = "strict"
    RELAXED = "relaxed"


@dataclass
class ConversionStats:
    """Per-batch conversion counters (reference `ConversionStats.java`)."""

    missing_fields: dict = field(default_factory=dict)
    unknown_fields: dict = field(default_factory=dict)
    rows_ok: int = 0
    rows_error: int = 0

    def merge(self, other: "ConversionStats") -> "ConversionStats":
        for k, v in other.missing_fields.items():
            self.missing_fields[k] = self.missing_fields.get(k, 0) + v
        for k, v in other.unknown_fields.items():
            self.unknown_fields[k] = self.unknown_fields.get(k, 0) + v
        self.rows_ok += other.rows_ok
        self.rows_error += other.rows_error
        return self


class RecordValidator:
    """Callable batch validator for ``map_batches`` (actor-poolable).

    Appends ``validation_error`` (null = ok).  Tombstone rows (all value
    columns null, key column present) are valid and flagged
    ``is_tombstone``.
    """

    def __init__(
        self,
        schema: pa.Schema,
        key_cols: list[str],
        strategy: str = ValidationStrategy.RELAXED,
        check_ts_millis: bool = False,
    ):
        self.schema = schema
        self.key_cols = key_cols
        self.strategy = strategy
        self.check_ts_millis = check_ts_millis
        self.stats = ConversionStats()

    def _field_meta(self, f: pa.Field, key: str) -> str | None:
        if f.metadata and key.encode() in f.metadata:
            return f.metadata[key.encode()].decode()
        return None

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        err = pa.nulls(n, pa.string())
        declared = set(self.schema.names)
        value_cols = [c for c in self.schema.names if c not in self.key_cols]

        # tombstone = key present, every value column null
        tomb = None
        for c in self.key_cols:
            present = pc.is_valid(batch[c]) if c in batch.column_names else pa.array([False] * n)
            tomb = present if tomb is None else pc.and_(tomb, present)
        for c in value_cols:
            if c in batch.column_names:
                tomb = pc.and_(tomb, pc.is_null(batch[c]))
            # a column missing entirely counts as null for tombstone purposes
        tomb = pc.fill_null(tomb, False)

        # strict: unknown fields are errors (relaxed: projected away)
        unknown = [c for c in batch.column_names if c not in declared]
        if unknown:
            for c in unknown:
                self.stats.unknown_fields[c] = self.stats.unknown_fields.get(c, 0) + n
            if self.strategy == ValidationStrategy.STRICT:
                err = pc.coalesce(
                    err,
                    pa.array([f"ValidationExtraFieldsError: {sorted(unknown)}"] * n),
                )

        # required fields: missing column or null (non-tombstone rows)
        for f in self.schema:
            required = self._field_meta(f, "required") == "true"
            if not required:
                continue
            if f.name not in batch.column_names:
                self.stats.missing_fields[f.name] = (
                    self.stats.missing_fields.get(f.name, 0) + n
                )
                err = pc.coalesce(err, pa.array([f"missing required field {f.name!r}"] * n))
                continue
            missing = pc.and_(pc.is_null(batch[f.name]), pc.invert(tomb))
            if pc.any(missing).as_py():
                cnt = pc.sum(pc.cast(missing, pa.int64())).as_py()
                self.stats.missing_fields[f.name] = (
                    self.stats.missing_fields.get(f.name, 0) + cnt
                )
                err = pc.coalesce(
                    err,
                    pc.if_else(
                        missing,
                        pa.scalar(f"null required field {f.name!r}", pa.string()),
                        pa.scalar(None, pa.string()),
                    ),
                )

        # logical types
        for f in self.schema:
            if f.name not in batch.column_names:
                continue
            logical = self._field_meta(f, "logical")
            if logical == "uuid":
                ok = validate_uuid(batch[f.name])
                bad = pc.and_(pc.invert(ok), pc.is_valid(batch[f.name]))
                err = _mask_err(err, bad, f"invalid uuid in {f.name!r}")
            elif logical == "timestamp-millis" and self.check_ts_millis:
                ok = validate_ts_millis(batch[f.name])
                bad = pc.and_(
                    pc.fill_null(pc.invert(ok), False), pc.is_valid(batch[f.name])
                )
                err = _mask_err(err, bad, f"timestamp-millis must be > 0 in {f.name!r}")

        # key/value consistency: same-named fields with __key_ prefix must match
        for c in batch.column_names:
            if c.startswith("__key_") and c[6:] in batch.column_names:
                neq = pc.invert(
                    pc.fill_null(pc.equal(batch[c], batch[c[6:]]), False)
                )
                neq = pc.and_(neq, pc.is_valid(batch[c]))
                err = _mask_err(err, neq, f"key/value mismatch on {c[6:]!r}")

        ok_rows = err.null_count if hasattr(err, "null_count") else n
        self.stats.rows_ok += ok_rows
        self.stats.rows_error += n - ok_rows
        if self.strategy == ValidationStrategy.RELAXED and unknown:
            batch = batch.drop_columns(unknown)
        batch = batch.append_column("is_tombstone", tomb)
        return batch.append_column("validation_error", err)


def _mask_err(err, mask, label: str):
    mask = pc.fill_null(mask, False)
    if not pc.any(mask).as_py():
        return err
    return pc.coalesce(
        err, pc.if_else(mask, pa.scalar(label, pa.string()), pa.scalar(None, pa.string()))
    )


def make_tombstones(keys: pa.Table, value_schema: pa.Schema) -> pa.Table:
    """Delete-marker factory (`producer/KafkaRecordFactories.scala:38-47`):
    key columns + all-null value columns."""
    n = keys.num_rows
    out = keys
    for f in value_schema:
        if f.name not in keys.column_names:
            out = out.append_column(f.name, pa.nulls(n, f.type))
    return out


def fill_defaults(
    batch: pa.Table, schema: pa.Schema, defaults: dict | None = None
) -> pa.Table:
    """Simple-format normalization: project a loose batch onto ``schema``,
    adding missing columns and replacing nulls with declared defaults —
    the columnar analogue of the reference's simple-JSON default filling
    (`avro/.../convert/SimpleStringToGenericRecord.scala:23-119`,
    `JsonConverter.java:138-231`).

    Defaults come from ``defaults[name]`` or field metadata ``default``
    (utf-8, cast to the field type).  A missing column with no default
    stays null if nullable, else raises (required-missing is an error,
    matching the converter).  Extra columns are projected away (Relaxed
    semantics; pair with RecordValidator(STRICT) to reject them instead).
    """
    defaults = defaults or {}
    n = batch.num_rows
    cols = []
    for f in schema:
        dv = defaults.get(f.name)
        if dv is None and f.metadata and b"default" in f.metadata:
            dv = pa.scalar(f.metadata[b"default"].decode(), pa.string()).cast(f.type).as_py()
        if f.name in batch.column_names:
            col = pc.cast(batch[f.name], f.type)
            if dv is not None:
                col = pc.fill_null(col, pa.scalar(dv, f.type))
        elif dv is not None:
            col = pa.array([dv] * n, f.type)
        elif f.nullable:
            col = pa.nulls(n, f.type)
        else:
            raise ValueError(
                f"required column {f.name!r} missing and has no default"
            )
        cols.append(col)
    return pa.table(dict(zip(schema.names, cols)))
