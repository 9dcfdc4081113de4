"""Ray pipelines vs DuckDB oracles at sf0.001 — mimics the driver's
compare (row count + schema + order-insensitive value comparison)."""

import math
import os

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def _to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


ORACLED = sorted(entrymod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(name, con, ray_session):
    ray_res = _canon(_to_pandas(entrymod.queries()[name](SF_DIR)))
    sql_res = _canon(con.execute(entrymod.oracle_sql()[name]).df())
    assert list(ray_res.columns) == list(sql_res.columns), (
        f"{name}: columns {list(ray_res.columns)} != {list(sql_res.columns)}"
    )
    assert len(ray_res) == len(sql_res), f"{name}: {len(ray_res)} != {len(sql_res)} rows"
    for c in ray_res.columns:
        a, b = ray_res[c], sql_res[c]
        if pd.api.types.is_float_dtype(a):
            ok = ((a - b).abs() < 1e-6) | (a.isna() & b.isna())
        else:
            ok = (a == b) | (a.isna() & b.isna())
        bad = (~ok).sum()
        assert bad == 0, f"{name}.{c}: {bad} mismatches\n{ray_res[~ok].head()}\n{sql_res[~ok].head()}"


# every rows-only catalog entry runs at sf0.001, minus those with their
# own dedicated (and heavier) tests in this file or test_replicate.py
NO_ORACLE = sorted(
    set(entrymod.queries()) - set(entrymod.oracle_sql())
    - {"approx_distinct", "audio_features", "replicate_stream"}
)


def test_hll_accuracy(ray_session):
    """HLL estimate within 5% of the exact distinct count at sf0.001."""
    import __ray_entry__ as entrymod

    approx = _to_pandas(entrymod.queries()["approx_distinct"](SF_DIR))
    exact = _to_pandas(entrymod.queries()["distinct_users"](SF_DIR))
    m = approx.merge(exact, on="event_type")
    rel = (m["approx_distinct"] - m["n_distinct_users"]).abs() / m["n_distinct_users"]
    assert (rel < 0.05).all(), m


def test_audio_features_sane(ray_session):
    import numpy as np

    import __ray_entry__ as entrymod

    f = _to_pandas(entrymod.queries()["audio_features"](SF_DIR))
    assert len(f) == 600
    # synthesized tones: rms ≈ 0.8/1.1 * sqrt(1/2 + 0.01/2) ≈ 0.516, no clipping
    assert np.allclose(f["rms"], 0.516, atol=0.03)
    assert (f["clip_ratio"] == 0).all()
    # dominant frequency ≈ fundamental f = 220 + (seq % 64)*7
    expect = 220 + (f["seq"] % 64) * 7
    assert (np.abs(f["dom_freq_hz"] - expect) / expect < 0.25).mean() > 0.9


@pytest.mark.parametrize("name", NO_ORACLE)
def test_rows_only_queries_run(name, ray_session):
    res = _to_pandas(entrymod.queries()[name](SF_DIR))
    assert len(res) >= 0
    assert len(res.columns) > 0


def test_flac_roundtrip_all_lossless(ray_session):
    r = _to_pandas(entrymod.queries()["flac_roundtrip"](SF_DIR))
    assert r["n_seqs"].iloc[0] == 300
    assert r["n_lossless"].iloc[0] == 300


def test_entry_smoke(ray_session):
    res = _to_pandas(entrymod.entry())
    assert len(res) > 0
    assert "clip_id" in res.columns


def test_bench_covers_catalog():
    """bench.py QUERY_NAMES is hand-maintained — this pins it to the
    catalog so a new query can't silently skip the driver bench
    (replicate_stream is intentionally absent: it IS the headline)."""
    import bench

    assert set(bench.QUERY_NAMES) == set(entrymod.queries()) - {"replicate_stream"}
    assert len(bench.QUERY_NAMES) == len(set(bench.QUERY_NAMES))


def test_driver_window_all_oracled():
    """The driver oracle-checks only the FIRST 50 queries() entries;
    keep every one of those slots an oracled query (VERDICT r2 #1)."""
    qkeys = list(entrymod.queries())
    oracled = set(entrymod.oracle_sql())
    head = qkeys[: min(50, len(oracled))]
    assert all(k in oracled for k in head), [k for k in head if k not in oracled]


def test_correctness_ledger_current():
    """CORRECTNESS_LEDGER.md must be regenerated whenever the driver window
    or a CORRECTNESS_r*.json changes, and every oracled query must either
    already have a green driver row or sit inside the current first-50
    window — rotation debt can't silently re-accumulate (VERDICT r3 #8)."""
    import os
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(root, "tools"))
    try:
        import make_ledger
    finally:
        sys.path.pop(0)

    ledger_path = os.path.join(root, "CORRECTNESS_LEDGER.md")
    with open(ledger_path) as f:
        on_disk = f.read()
    current = make_ledger.render()
    if on_disk != current:
        # The driver drops CORRECTNESS_r{N}.json AFTER the session ends,
        # so the committed ledger is stale at every round start.
        # Self-heal ONLY for that case (a CORRECTNESS file newer than the
        # ledger); any other mismatch — a make_ledger regression, a hand
        # edit — must still FAIL the suite (review-restored guard).
        ledger_mtime = os.path.getmtime(ledger_path)
        import glob

        newer = [
            p for p in glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))
            if os.path.getmtime(p) > ledger_mtime
        ]
        assert newer, (
            "stale ledger without a newer CORRECTNESS file — run: "
            "python tools/make_ledger.py"
        )
        with open(ledger_path, "w") as f:
            f.write(current)

    rounds = make_ledger.collect_rounds()
    window = set(make_ledger.window_names())
    uncovered = [
        n for n in make_ledger.oracled_names()
        if n not in rounds and n not in window
    ]
    assert not uncovered, f"oracled but never driver-verified nor in window: {uncovered}"
