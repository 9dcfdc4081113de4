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


NO_ORACLE = [
    "minhash_neardup",
    "neardup_clusters",
    "simhash_neardup",
    "quality_scores",
    "langid",
    "fingerprint",
    "ann_topk",
    "ann_ivf",
]


@pytest.mark.parametrize("name", NO_ORACLE)
def test_rows_only_queries_run(name, ray_session):
    res = _to_pandas(entrymod.queries()[name](SF_DIR))
    assert len(res) >= 0
    assert len(res.columns) > 0


def test_entry_smoke(ray_session):
    res = _to_pandas(entrymod.entry())
    assert len(res) > 0
    assert "clip_id" in res.columns
