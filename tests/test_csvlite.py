"""csvlite: fast-path C++ parse, slow-path per-row DLQ routing, header
skip, quoting, and the Dataset-level reader."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from hydra_ray.sources.csvlite import CsvDecoder, read_csv_records

SCHEMA = pa.schema([
    ("id", pa.int64()), ("name", pa.string()), ("score", pa.float64()),
    ("ok", pa.bool_()), ("ts", pa.timestamp("us")),
])


def test_fast_path_quoting_and_nulls():
    dec = CsvDecoder(SCHEMA)
    lines = [
        "id,name,score,ok,ts",                        # header dropped
        '1,"alice, a.",3.5,true,2024-01-02T03:04:05',
        '3,"quo""ted",0.5,1,2024-01-01T00:00:00',
        "4,carol,,,",                                  # blanks -> nulls
    ]
    out = dec(pa.table({"text": pa.array(lines)}))
    assert out.num_rows == 3 and out["error"].null_count == 3
    df = out.to_pandas()
    assert df["name"].tolist() == ["alice, a.", 'quo"ted', "carol"]
    assert pd.isna(df["score"][2]) and df["ok"][1] == True  # noqa: E712
    assert dec.stats.rows_ok == 3 and dec.stats.rows_error == 0


def test_slow_path_routes_poison_rows():
    dec = CsvDecoder(SCHEMA)
    lines = [
        "5,dave,1.0,true,2024-01-01T00:00:00",
        "6,erin,notanum,true,2024-01-01T00:00:00",    # bad float
        "7,frank,1.0",                                 # column count
        "8,gail,2.5,maybe,2024-01-01T00:00:00",       # bad bool
        "9,hank,3.25,false,2024-13-45T00:00:00",      # bad timestamp
        "10,iris,7.5,true,2024-01-01T00:00:06",
        "11,jane,2.5,true,2024-01-01T00:00:00,extra", # too many cols
        "12,kim,9.75,false,",                          # blank ts ok
    ]
    out = dec(pa.table({"text": pa.array(lines)})).to_pandas()
    errs = out["error"].tolist()
    assert errs[0] is None and errs[5] is None and errs[7] is None
    assert "score" in errs[1]
    assert "ColumnCount" in errs[2] and "ColumnCount" in errs[6]
    assert "ok" in errs[3] and "ts" in errs[4]
    # good rows' values survive the slow path intact
    assert out["id"][0] == 5 and out["score"][7] == 9.75
    assert dec.stats.rows_error == 5 and dec.stats.rows_ok == 3
    # integer column rejects fractional values row-wise
    out2 = CsvDecoder(SCHEMA)(pa.table({"text": pa.array(
        ["13,lee,1.0,true,", "13.5,lee,1.0,notabool,"])}))
    errs2 = out2["error"].to_pylist()
    assert errs2[0] is None and "id" in errs2[1]


def test_dataset_reader_end_to_end(ray_session, tmp_path):
    import pyarrow.compute as pc

    df = pd.DataFrame({
        "id": np.arange(50, dtype=np.int64),
        "name": [f"n,{i}" if i % 7 == 0 else f"n{i}" for i in range(50)],
        "score": np.linspace(-2, 2, 50).round(3),
        "ok": [i % 3 == 0 for i in range(50)],
        "ts": pd.date_range("2024-01-01", periods=50, freq="h"),
    })
    p1, p2 = tmp_path / "a.csv", tmp_path / "b.csv"
    df.iloc[:30].to_csv(p1, index=False, date_format="%Y-%m-%dT%H:%M:%S")
    df.iloc[30:].to_csv(p2, index=False, date_format="%Y-%m-%dT%H:%M:%S")
    with open(p2, "a") as f:
        f.write("junk,row\n")                         # poison tail row
    ds = read_csv_records([str(p1), str(p2)], SCHEMA)
    out = ds.to_pandas()
    good = out[out["error"].isna()].sort_values("id").reset_index(drop=True)
    bad = out[out["error"].notna()]
    assert len(good) == 50 and len(bad) == 1
    assert "ColumnCount" in bad["error"].iloc[0]
    # the poison row's nulls widen pandas dtypes across the concat; cast back
    good = good.assign(id=good["id"].astype("int64"),
                       ok=good["ok"].astype(bool),
                       ts=good["ts"].astype("datetime64[ns]"))
    pd.testing.assert_frame_equal(
        good[["id", "name", "score", "ok", "ts"]], df.reset_index(drop=True)
    )


def test_quoted_newlines_survive_slow_path(ray_session, tmp_path):
    """A poison row forces the per-row slow path; quoted-newline rows
    in the SAME batch must still re-join (quote parity), not silently
    truncate to their first physical line (regression)."""
    import pandas as pd

    df = pd.DataFrame({
        "k": [1, 2, 3],
        "x": [0.5, -1.25, 3e12],
        "s": ["a\n\nb", "plain", 'q"uote,comma'],
    })
    p = str(tmp_path / "t.csv")
    df.to_csv(p, index=False)
    with open(p, "a") as f:
        f.write("9,notafloat,z\n")
    schema = pa.schema([("k", pa.int64()), ("x", pa.float64()),
                       ("s", pa.string())])
    out = read_csv_records(p, schema, override_num_blocks=1).to_pandas()
    good = out[out["error"].isna()]
    bad = out[out["error"].notna()]
    assert good["s"].tolist() == df["s"].tolist()
    assert good["x"].tolist() == df["x"].tolist()
    assert len(bad) == 1 and "TypeCoercion" in bad["error"].iloc[0]


def test_header_text_inside_quoted_field_survives():
    """The header filter drops ONLY standalone (even-quote-parity)
    occurrences: a physical line equal to the header text that sits
    inside a quoted multi-line field must survive the rejoin on both
    the fast and slow paths (ADVICE r3 regression)."""
    schema = pa.schema([("k", pa.int64()), ("s", pa.string())])
    hdr = "k,s"
    # fast path: quoted field whose middle line is exactly the header
    batch = pa.table({"text": pa.array(
        [hdr, '1,"a', hdr, 'b"', "2,plain"])})
    out = CsvDecoder(schema)(batch).to_pandas()
    assert out["error"].isna().all()
    assert out["s"].tolist() == [f"a\n{hdr}\nb", "plain"]
    # slow path (poison row in the same batch): same survival
    batch2 = pa.table({"text": pa.array(
        [hdr, '1,"a', hdr, 'b"', "notanint,oops", "2,plain"])})
    out2 = CsvDecoder(schema)(batch2).to_pandas()
    good = out2[out2["error"].isna()]
    assert good["s"].tolist() == [f"a\n{hdr}\nb", "plain"]
    # repeated standalone headers (concatenated file blocks) still drop
    batch3 = pa.table({"text": pa.array([hdr, "1,x", hdr, "2,y"])})
    out3 = CsvDecoder(schema)(batch3).to_pandas()
    assert out3["k"].tolist() == [1, 2]


def test_dangling_quote_at_batch_boundary_dlqs():
    """A quote left open at the end of a batch cannot re-join; it must
    DLQ explicitly, never silently truncate."""
    import pyarrow as pa_

    from hydra_ray.sources.csvlite import CsvDecoder

    schema = pa.schema([("k", pa.int64()), ("s", pa.string())])
    batch = pa_.table({"text": pa_.array(
        ["k,s", "1,ok", 'x,"bad', '2,"fine"'])})
    # 'x' poisons the fast path; '2,"fine"' is even-parity and fine;
    # 'x,"bad' dangles (odd parity, swallows the rest)
    out = CsvDecoder(schema)(batch).to_pandas()
    good = out[out["error"].isna()]
    assert good["s"].tolist() == ["ok"]
    assert any("unterminated" in str(e) or "CsvParse" in str(e)
               or "ColumnCount" in str(e) or "TypeCoercion" in str(e)
               for e in out["error"].dropna())
