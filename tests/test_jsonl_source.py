"""JSONL source (P1 JSON→schema conversion parity): round-trip against a
known table, coercion, defaults, strict unknown-field rejection, poison
rows → DLQ, ConversionStats counters."""

import json

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from hydra_ray.sources.jsonl import JsonlDecoder, read_jsonl

SCHEMA = pa.schema(
    [
        pa.field("event_id", pa.int64()),
        pa.field("user_id", pa.int64()),
        pa.field("value", pa.float64()),
        pa.field("kind", pa.string()),
    ]
)


def _write(tmp_path, lines, name="in.jsonl"):
    p = tmp_path / name
    p.write_text("\n".join(lines))
    return str(p)


def test_read_jsonl_roundtrip_and_coercion(tmp_path, ray_session):
    df = pd.DataFrame({
        "event_id": np.arange(50),
        "user_id": np.arange(50) % 7,
        "value": (np.arange(50) * 1.5).round(2),
        "kind": ["a", "b"] * 25,
    })
    lines = [json.dumps(r) for r in df.to_dict("records")]
    # string-typed numbers coerce (JsonConverter string→num semantics)
    lines[3] = json.dumps({"event_id": "3", "user_id": "3",
                           "value": "4.5", "kind": "b"})
    path = _write(tmp_path, lines)
    out = read_jsonl(path, SCHEMA).to_pandas().sort_values("event_id")
    assert out["error"].isna().all()
    got = out.drop(columns="error").reset_index(drop=True)
    want = df.copy()
    want.loc[3, "kind"] = "b"
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_jsonl_defaults_missing_and_stats(tmp_path, ray_session):
    lines = [json.dumps({"event_id": i, "user_id": i}) for i in range(10)]
    dec = JsonlDecoder(SCHEMA, defaults={"value": 0.0, "kind": "none"})
    out = dec(pa.table({"text": pa.array(lines)}))
    assert out["value"].to_pylist() == [0.0] * 10
    assert out["kind"].to_pylist() == ["none"] * 10
    assert dec.stats.missing_fields == {"value": 10, "kind": 10}
    assert dec.stats.rows_ok == 10 and dec.stats.rows_error == 0


def test_jsonl_strict_unknown_fields(tmp_path, ray_session):
    good = json.dumps({"event_id": 1, "user_id": 1, "value": 1.0, "kind": "a"})
    extra = json.dumps({"event_id": 2, "user_id": 2, "value": 2.0,
                        "kind": "b", "surprise": 1})
    relaxed = JsonlDecoder(SCHEMA, strict=False)
    out = relaxed(pa.table({"text": pa.array([good, extra])}))
    assert out["error"].to_pylist() == [None, None]       # projected away
    assert relaxed.stats.unknown_fields.get("surprise", 0) > 0
    strict = JsonlDecoder(SCHEMA, strict=True)
    out = strict(pa.table({"text": pa.array([good, extra])}))
    errs = out["error"].to_pylist()
    # pyarrow's block parse sees columns, not rows: strict rejection is
    # batch-granular, mirroring the schema-level UndefinedFields error
    assert all(e and "surprise" in e for e in errs)


def test_jsonl_poison_rows_routed_not_raised(tmp_path, ray_session):
    lines = [
        json.dumps({"event_id": 1, "user_id": 1, "value": 1.0, "kind": "a"}),
        "{not json at all",
        json.dumps({"event_id": 3, "user_id": 3, "value": 3.0, "kind": "c"}),
        "[1, 2, 3]",  # valid JSON, not an object
    ]
    path = _write(tmp_path, lines)
    df = read_jsonl(path, SCHEMA).to_pandas()
    ok = df[df["error"].isna()].sort_values("event_id")
    assert ok["event_id"].tolist() == [1, 3]
    bad = df[df["error"].notna()]
    assert len(bad) == 2
    assert bad["error"].str.contains("JsonParseError").all()


def test_jsonl_all_poison_batch_keeps_rows(ray_session):
    dec = JsonlDecoder(SCHEMA)
    out = dec(pa.table({"text": pa.array(["nope", "{", "}"])}))
    assert out.num_rows == 3
    assert all(e for e in out["error"].to_pylist())
    assert dec.stats.rows_error == 3
