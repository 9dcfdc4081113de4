"""Avro binary codec + OCF vs the PUBLIC spec's own worked examples
(Avro 1.11 "Binary Encoding" section) and structural round-trips."""

import numpy as np
import pytest

from hydra_ray.avrolite import (
    AvroError,
    decode_record,
    encode_record,
    ocf_schema,
    parse_schema,
    read_ocf,
    write_ocf,
)

REC_AB = {"type": "record", "name": "test", "fields": [
    {"name": "a", "type": "long"}, {"name": "b", "type": "string"}]}


def test_spec_golden_record():
    """The spec's worked example: {"a": 27, "b": "foo"} → 36 06 66 6f 6f."""
    sch = parse_schema(REC_AB)
    b = encode_record(sch, {"a": 27, "b": "foo"})
    assert b == bytes.fromhex("3606666f6f")
    assert decode_record(sch, b) == {"a": 27, "b": "foo"}


def test_spec_golden_zigzag_and_array():
    lsch = parse_schema("long")
    for v, hx in [(0, "00"), (-1, "01"), (1, "02"), (-2, "03"), (2, "04"),
                  (-64, "7f"), (64, "8001"),
                  (-(1 << 63), "ffffffffffffffffff01"),
                  ((1 << 63) - 1, "feffffffffffffffff01")]:
        assert encode_record(lsch, v) == bytes.fromhex(hx), v
        assert decode_record(lsch, bytes.fromhex(hx)) == v, v
    arr = parse_schema({"type": "array", "items": "long"})
    assert encode_record(arr, [3, 27]) == bytes.fromhex("04063600")
    assert decode_record(arr, bytes.fromhex("04063600")) == [3, 27]


def test_complex_roundtrip_all_types():
    sch = parse_schema({"type": "record", "name": "r", "fields": [
        {"name": "u", "type": ["null", "string"]},
        {"name": "e", "type": {"type": "enum", "name": "col",
                               "symbols": ["RED", "GREEN"]}},
        {"name": "m", "type": {"type": "map", "values": "double"}},
        {"name": "fx", "type": {"type": "fixed", "name": "f4", "size": 4}},
        {"name": "nested", "type": {"type": "record", "name": "inner",
                                    "fields": [{"name": "xs", "type": {
                                        "type": "array", "items": "int"}}]}},
        {"name": "d", "type": "double"},
        {"name": "fl", "type": "float"},
        {"name": "bo", "type": "boolean"},
        {"name": "by", "type": "bytes"},
    ]})
    rec = {"u": None, "e": "GREEN", "m": {"pi": 3.25, "e": -1.5},
           "fx": b"\x01\x02\x03\x04", "nested": {"xs": [1, -2, 3]},
           "d": 2.5, "fl": 0.5, "bo": True, "by": b"\x00\xff"}
    assert decode_record(sch, encode_record(sch, rec)) == rec
    rec2 = dict(rec, u="hello")
    assert decode_record(sch, encode_record(sch, rec2)) == rec2
    # defaults fill missing fields; missing without default raises
    sch_d = parse_schema({"type": "record", "name": "d", "fields": [
        {"name": "a", "type": "long", "default": 7}]})
    assert decode_record(sch_d, encode_record(sch_d, {})) == {"a": 7}
    with pytest.raises(AvroError, match="missing field"):
        encode_record(parse_schema(REC_AB), {"a": 1})


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_ocf_roundtrip_and_corruption(tmp_path, codec):
    path = str(tmp_path / f"t_{codec}.avro")
    recs = [{"a": i * 7 - 3, "b": f"s{i}"} for i in range(5000)]
    assert write_ocf(path, REC_AB, recs, codec=codec,
                     block_records=512) == 5000
    assert list(read_ocf(path)) == recs
    assert ocf_schema(path)["name"] == "test"
    # flip a byte inside a block: the sync-marker check catches it when
    # lengths shift, or deflate fails; either way corruption never
    # yields silently-wrong records for a truncated file
    raw = bytearray(open(path, "rb").read())
    trunc = str(tmp_path / "trunc.avro")
    open(trunc, "wb").write(bytes(raw[: len(raw) // 2]))
    with pytest.raises((AvroError, Exception)):
        list(read_ocf(trunc))


def test_ray_surface_roundtrip(ray_session, tmp_path):
    """Dataset → write_avro (one OCF per batch) → read_avro → identical
    rows; the jsonl-source → Avro path is the reference's JSON→Avro
    converter realized on this engine."""
    import pandas as pd
    import ray.data as rd

    from hydra_ray.avrolite import read_avro, write_avro

    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "event_id": np.arange(500, dtype=np.int64),
        "user_id": rng.integers(0, 50, 500),
        "value": rng.normal(50, 10, 500).round(3),
        "event_type": rng.choice(["click", "view"], 500),
    })
    out = str(tmp_path / "avro")
    n = write_avro(rd.from_pandas(df).repartition(4), out)
    assert n == 500
    back = read_avro(out).to_pandas().sort_values("event_id") \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(back[df.columns.tolist()], df)


# ------------------------------------------------------ schema resolution
class TestSchemaResolution:
    W = {
        "type": "record", "name": "Rec", "fields": [
            {"name": "a", "type": "int"},
            {"name": "drop_me", "type": {"type": "array", "items": "string"}},
            {"name": "b", "type": "string"},
            {"name": "e", "type": {"type": "enum", "name": "E",
                                   "symbols": ["X", "Y", "Z"]}},
            {"name": "nest", "type": {"type": "record", "name": "N",
                                      "fields": [{"name": "x",
                                                  "type": "float"}]}},
            {"name": "u", "type": ["null", "int"]},
        ],
    }
    REC = {"a": 7, "drop_me": ["gone", "too"], "b": "hi",
           "e": "Y", "nest": {"x": 1.5}, "u": 3}

    def _roundtrip(self, reader):
        from hydra_ray.avrolite import (
            decode_record_resolved,
            encode_record,
            parse_schema,
        )

        data = encode_record(parse_schema(self.W), self.REC)
        return decode_record_resolved(self.W, reader, data)

    def test_reorder_skip_default_promote(self):
        reader = {
            "type": "record", "name": "Rec", "fields": [
                # reordered; drop_me gone (skipped, incl. its array);
                # a promoted int→long→double; new field with default;
                # b promoted string→bytes; nested x float→double
                {"name": "b", "type": "bytes"},
                {"name": "a", "type": "double"},
                {"name": "added", "type": "long", "default": 42},
                {"name": "added_bytes", "type": "bytes", "default": "AB"},
                {"name": "nest", "type": {
                    "type": "record", "name": "N",
                    "fields": [{"name": "x", "type": "double"}]}},
                {"name": "u", "type": ["null", "long"]},
            ],
        }
        out = self._roundtrip(reader)
        assert out == {"b": b"hi", "a": 7.0, "added": 42,
                       "added_bytes": b"AB", "nest": {"x": 1.5}, "u": 3}
        assert isinstance(out["a"], float)

    def test_enum_subset_uses_reader_default(self):
        reader = dict(self.W)
        reader = {
            "type": "record", "name": "Rec", "fields": [
                {"name": "a", "type": "int"},
                {"name": "drop_me", "type": {"type": "array",
                                             "items": "string"}},
                {"name": "b", "type": "string"},
                {"name": "e", "type": {"type": "enum", "name": "E",
                                       "symbols": ["X", "Z"],
                                       "default": "X"}},
                {"name": "nest", "type": {"type": "record", "name": "N",
                                          "fields": [{"name": "x",
                                                      "type": "float"}]}},
                {"name": "u", "type": ["null", "int"]},
            ],
        }
        out = self._roundtrip(reader)
        assert out["e"] == "X"  # writer "Y" absent → reader enum default

    def test_union_widening_and_narrowing(self):
        from hydra_ray.avrolite import (
            decode_record_resolved,
            encode_record,
            parse_schema,
        )

        w = {"type": "record", "name": "R",
             "fields": [{"name": "s", "type": "string"}]}
        r = {"type": "record", "name": "R",
             "fields": [{"name": "s", "type": ["null", "string"]}]}
        data = encode_record(parse_schema(w), {"s": "v"})
        assert decode_record_resolved(w, r, data) == {"s": "v"}
        # writer union → reader non-union branch
        w2 = {"type": "record", "name": "R",
              "fields": [{"name": "s", "type": ["null", "string"]}]}
        r2 = {"type": "record", "name": "R",
              "fields": [{"name": "s", "type": "string"}]}
        data2 = encode_record(parse_schema(w2), {"s": "v"})
        assert decode_record_resolved(w2, r2, data2) == {"s": "v"}

    def test_field_alias_matches_renamed_writer(self):
        from hydra_ray.avrolite import decode_record_resolved, \
            encode_record, parse_schema

        w = {"type": "record", "name": "R",
             "fields": [{"name": "old", "type": "int"}]}
        r = {"type": "record", "name": "R",
             "fields": [{"name": "new", "type": "int",
                         "aliases": ["old"]}]}
        data = encode_record(parse_schema(w), {"old": 5})
        assert decode_record_resolved(w, r, data) == {"new": 5}

    def test_errors(self):
        import pytest

        from hydra_ray.avrolite import AvroError, decode_record_resolved, \
            encode_record, parse_schema

        w = {"type": "record", "name": "R",
             "fields": [{"name": "a", "type": "int"}]}
        data = encode_record(parse_schema(w), {"a": 1})
        no_default = {"type": "record", "name": "R",
                      "fields": [{"name": "zz", "type": "int"}]}
        with pytest.raises(AvroError):
            decode_record_resolved(w, no_default, data)
        bad_promote = {"type": "record", "name": "R",
                       "fields": [{"name": "a", "type": "string"}]}
        with pytest.raises(AvroError):
            decode_record_resolved(w, bad_promote, data)

    def test_ocf_read_with_reader_schema(self, tmp_path):
        from hydra_ray.avrolite import read_ocf, write_ocf

        path = str(tmp_path / "r.avro")
        recs = [{"a": i, "drop_me": [], "b": f"s{i}", "e": "X",
                 "nest": {"x": float(i)}, "u": None} for i in range(50)]
        write_ocf(path, self.W, recs, codec="deflate")
        reader = {
            "type": "record", "name": "Rec", "fields": [
                {"name": "a", "type": "long"},
                {"name": "b", "type": "string"},
                {"name": "tag", "type": "string", "default": "v2"},
            ],
        }
        out = list(read_ocf(path, reader_schema=reader))
        assert out == [{"a": i, "b": f"s{i}", "tag": "v2"}
                       for i in range(50)]
