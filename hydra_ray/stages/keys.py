"""Key extraction & scalar functions (reference §2.3/§2.9 parity).

- ``extract_json_key`` — JsonPath-lite ``{$.field}`` key extraction from a
  JSON payload column (`.../producer/JsonPathKeys.scala:9-29`,
  `KafkaRecordFactory.scala:70-126`), vectorized with a regex fast path
  for flat fields.
- ``base62`` encode/decode + ``correlation_id`` —
  (`core/.../ingest/CorrelationIdBuilder.scala:7-14`,
  `common/.../util/Base62.scala`).
- ``clean_name`` — Avro-safe field normalizer
  (`avro/.../util/AvroUtils.scala:33-52`).
- ``parse_iso_ts`` — multi-format ISO→UTC parse with EPOCH fallback
  (`avro/.../convert/ISODateConverter.scala:26-45`).
- ``validate_uuid`` / ``validate_ts_millis`` — logical-type validators
  (`avro/.../convert/StringToGenericRecord.scala:58-85`).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "extract_json_key",
    "base62_encode",
    "base62_decode",
    "correlation_ids",
    "clean_name",
    "parse_iso_ts",
    "validate_uuid",
    "validate_ts_millis",
]

_B62 = "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
_UUID_RE = re.compile(
    r"^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"
)


def extract_json_key(batch: pa.Table, json_col: str, field: str, out_col: str = "key") -> pa.Table:
    """``{$.field}`` extraction: regex fast path for scalar fields."""
    s = pd.Series(batch[json_col].to_numpy(zero_copy_only=False)).fillna("")
    pat = rf'"{re.escape(field)}"\s*:\s*("(?P<str>[^"]*)"|(?P<num>-?\d+(?:\.\d+)?)|(?P<lit>true|false|null))'
    m = s.str.extract(pat)
    key = m["str"].fillna(m["num"]).fillna(m["lit"])
    return batch.append_column(out_col, pa.array(key, pa.string()))


def base62_encode(n: int) -> str:
    if n == 0:
        return _B62[0]
    neg = n < 0
    n = abs(n)
    out = []
    while n:
        n, r = divmod(n, 62)
        out.append(_B62[r])
    return ("-" if neg else "") + "".join(reversed(out))


def base62_decode(s: str) -> int:
    neg = s.startswith("-")
    v = 0
    for c in s.lstrip("-"):
        v = v * 62 + _B62.index(c)
    return -v if neg else v


def correlation_ids(n: int, seed: int = 42) -> list[str]:
    """Deterministic batch of correlation ids (random long → Base62)."""
    rng = np.random.default_rng(seed)
    return [base62_encode(int(x)) for x in rng.integers(0, 1 << 62, n)]


def clean_name(name: str) -> str:
    """Invalid Avro leading char → '_', invalid body chars → '_'."""
    if not name:
        return "_"
    head = name[0] if (name[0].isalpha() or name[0] == "_") else "_"
    body = "".join(c if (c.isalnum() or c == "_") else "_" for c in name[1:])
    return head + body


_ISO_FORMATS = (
    "%Y-%m-%dT%H:%M:%S.%f%z",
    "%Y-%m-%dT%H:%M:%S%z",
    "%Y-%m-%dT%H:%M:%S.%f",
    "%Y-%m-%dT%H:%M:%S",
    "%Y-%m-%d",
)


def parse_iso_ts(col: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Fallback-chain ISO parse → timestamp[ms] UTC; unparseable → epoch 0."""
    s = pd.Series(col.to_numpy(zero_copy_only=False))
    out = pd.Series(pd.NaT, index=s.index, dtype="datetime64[ms]")
    remaining = s.notna()
    for fmt in _ISO_FORMATS:
        if not remaining.any():
            break
        parsed = pd.to_datetime(s[remaining], format=fmt, errors="coerce", utc=True)
        hit = parsed.notna()
        idx = parsed[hit].index
        out.loc[idx] = parsed[hit].dt.tz_localize(None).astype("datetime64[ms]")
        remaining.loc[idx] = False
    out = out.fillna(pd.Timestamp(0))
    return pa.Array.from_pandas(out, type=pa.timestamp("ms"))


def validate_uuid(col) -> pa.Array:
    s = pd.Series(col.to_numpy(zero_copy_only=False)).fillna("")
    return pa.array(s.str.match(_UUID_RE).to_numpy(), pa.bool_())


def validate_ts_millis(col) -> pa.Array:
    """timestamp-millis must be > 0 (reference rejects 0/-2 for new topics,
    `IngestionFlowV2Spec.scala:185-221`)."""
    return pc.greater(pc.cast(col, pa.int64()), pa.scalar(0, pa.int64()))
