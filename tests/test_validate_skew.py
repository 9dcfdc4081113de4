"""Validation (F3 conformance cases), skew salting, multimodal plumbing."""

import numpy as np
import pyarrow as pa
import pytest

from hydra_ray.stages.keys import (
    base62_decode,
    base62_encode,
    clean_name,
    correlation_ids,
    parse_iso_ts,
)
from hydra_ray.stages.multimodal import ImageDecoder, binary_stats
from hydra_ray.stages.skew import SaltedRouter, salted_partition_for
from hydra_ray.stages.validate import (
    RecordValidator,
    ValidationStrategy,
    make_tombstones,
)

KEY_SCHEMA = pa.schema([pa.field("id", pa.string(), metadata={"required": "true", "logical": "uuid"})])
VALUE_SCHEMA = pa.schema(
    [
        pa.field("id", pa.string(), metadata={"required": "true"}),
        pa.field("testField", pa.bool_()),
        pa.field("testTimestamp", pa.int64(), metadata={"logical": "timestamp-millis"}),
    ]
)


def test_strict_rejects_extra_fields():
    """F3: {"id":…, "random":…} → Strict rejects, Relaxed projects away
    (IngestionFlowV2Spec.scala:107-134 parity)."""
    batch = pa.table({"id": ["a"], "testField": [True], "random": ["x"]})
    strict = RecordValidator(VALUE_SCHEMA, ["id"], ValidationStrategy.STRICT)
    out = strict(batch)
    assert "ValidationExtraFieldsError" in out["validation_error"][0].as_py()
    relaxed = RecordValidator(VALUE_SCHEMA, ["id"], ValidationStrategy.RELAXED)
    out = relaxed(batch)
    assert out["validation_error"][0].as_py() is None
    assert "random" not in out.column_names


def test_timestamp_millis_cases():
    """F3: ts values 0 / -2 / 123 — reject 0 and -2 when checking enabled,
    accept when disabled (IngestionFlowV2Spec.scala:185-221 parity)."""
    batch = pa.table({"id": ["a", "b", "c"], "testField": [True] * 3, "testTimestamp": [0, -2, 123]})
    checking = RecordValidator(VALUE_SCHEMA, ["id"], check_ts_millis=True)
    errs = checking(batch)["validation_error"].to_pylist()
    assert errs[0] and "timestamp-millis" in errs[0]
    assert errs[1] and "timestamp-millis" in errs[1]
    assert errs[2] is None
    lenient = RecordValidator(VALUE_SCHEMA, ["id"], check_ts_millis=False)
    assert lenient(batch)["validation_error"].null_count == 3


def test_uuid_and_required():
    schema = pa.schema(
        [pa.field("id", pa.string(), metadata={"required": "true", "logical": "uuid"}),
         pa.field("v", pa.string())]
    )
    batch = pa.table(
        {"id": ["123e4567-e89b-12d3-a456-426614174000", "not-a-uuid", None],
         "v": ["x", "y", "z"]}
    )
    out = RecordValidator(schema, ["id"])(batch)
    errs = out["validation_error"].to_pylist()
    assert errs[0] is None
    assert "invalid uuid" in errs[1]
    assert "null required field" in errs[2]


def test_tombstones():
    keys = pa.table({"id": ["k1", "k2"]})
    t = make_tombstones(keys, VALUE_SCHEMA)
    assert t["testField"].null_count == 2
    v = RecordValidator(VALUE_SCHEMA, ["id"])(t)
    assert v["is_tombstone"].to_pylist() == [True, True]
    assert v["validation_error"].null_count == 2  # tombstones are valid


def test_conversion_stats_accumulate():
    v = RecordValidator(VALUE_SCHEMA, ["id"], ValidationStrategy.STRICT)
    v(pa.table({"id": ["a"], "testField": [True], "junk": [1]}))
    v(pa.table({"id": ["b"], "testField": [False], "junk": [2]}))
    assert v.stats.unknown_fields["junk"] == 2
    assert v.stats.rows_error == 2


def test_salted_partitioning_spreads_hot_keys():
    keys = np.array(["hot"] * 1000 + [f"cold-{i}" for i in range(1000)], dtype=object)
    offsets = np.arange(2000)
    P, S = 8, 4
    parts = salted_partition_for(keys, {"hot"}, P, S, offsets)
    hot_parts = set(parts[:1000].tolist())
    assert len(hot_parts) >= min(S, P) - 1  # spread over ~n_salts partitions
    # cold keys unchanged vs unsalted
    base = salted_partition_for(keys, set(), P, S, offsets)
    assert (parts[1000:] == base[1000:]).all()
    # deterministic on replay
    again = salted_partition_for(keys, {"hot"}, P, S, offsets)
    assert (parts == again).all()


def test_salted_router_batch():
    t = pa.table({"clip_id": ["h"] * 10 + ["c"] * 10, "seq": list(range(20))})
    out = SaltedRouter("clip_id", {"h"}, 8, 4)(t)
    assert "partition" in out.column_names
    assert len(set(out["partition"].to_pylist()[:10])) > 1


def test_image_stub_routing():
    """PIL-dependent formats are honest stubs routed to the error column;
    malformed payloads of real formats (jpeg is REAL since jpeglite)
    error the same way (DLQ contract).  Real-format decode is covered in
    tests/test_multimodal.py and tests/test_jpeglite.py."""
    batch = pa.table(
        {
            "image_id": ["a", "b", "c"],
            "bytes": pa.array([b"RIFF????WEBP", b"\xff\xd89", b"??"], pa.large_binary()),
            "format": ["webp", "jpeg", "bmp"],
        }
    )
    out = ImageDecoder()(batch)
    errs = out["decode_error"].to_pylist()
    assert "requires PIL" in errs[0]       # webp stays a declared stub
    assert errs[1] is not None             # truncated jpeg → real decode error
    assert "PIL" not in errs[1]
    assert errs[2] is not None             # malformed bmp
    assert len(out["thumbnail"][0].as_py()) == 64


def test_binary_stats():
    batch = pa.table({"bytes": pa.array([b"\x89PNG", b"", b"abc"], pa.large_binary())})
    out = binary_stats(batch)
    assert out["payload_bytes"].to_pylist() == [4, 0, 3]
    assert out["payload_magic"].to_pylist()[0] == b"\x89"


def test_scalar_functions():
    assert base62_decode(base62_encode(123456789)) == 123456789
    assert base62_encode(0) == "0"
    ids = correlation_ids(5)
    assert len(set(ids)) == 5 and ids == correlation_ids(5)
    assert clean_name("9bad-name!") == "_bad_name_"
    assert clean_name("good_name") == "good_name"
    ts = parse_iso_ts(pa.array(["2024-01-02T03:04:05.678", "2024-01-02", "garbage", None]))
    vals = ts.to_pylist()
    assert vals[0].year == 2024 and vals[0].microsecond == 678000
    assert vals[1].day == 2
    assert vals[2].timestamp() == 0  # EPOCH fallback (ISODateConverter parity)
