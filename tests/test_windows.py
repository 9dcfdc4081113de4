"""Window operators vs a pandas oracle over the events testdata table
(FIXTURES.md F4 window oracle)."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from hydra_ray.stages.windows import (
    AggSpec,
    assign_tumbling,
    explode_sliding,
    session_window,
    sessionize_sorted,
    sliding_window,
    tumbling_window,
)

EVENTS = "/root/testdata/sf0.001/events.parquet"
HOUR = 3_600_000


@pytest.fixture(scope="module")
def events_pdf():
    df = pq.read_table(EVENTS).to_pandas()
    df["ms"] = (df["ts"].astype("int64") // 1000).astype("int64")
    return df


def test_assign_kernels():
    ts = np.array([0, 999, 1000, 1001, -1, 2500])
    assert assign_tumbling(ts, 1000).tolist() == [0, 0, 1000, 1000, -1000, 2000]
    rows, starts = explode_sliding(np.array([2500]), 2000, 1000)
    assert rows.tolist() == [0, 0]
    assert sorted(starts.tolist()) == [1000, 2000]
    sid = sessionize_sorted(np.array([0, 10, 11, 100, 101, 300]), 50)
    assert sid.tolist() == [0, 0, 0, 1, 1, 2]


def test_tumbling_vs_pandas(ray_session, events_pdf):
    import ray.data as rd

    ds = rd.read_parquet(EVENTS, columns=["user_id", "ts", "value"])
    out = tumbling_window(
        ds,
        ["user_id"],
        "ts",
        HOUR,
        [
            AggSpec("count", None, "n_events"),
            AggSpec("sum", "value", "sum_value"),
            AggSpec("max", "value", "max_value"),
            AggSpec("mean", "value", "avg_value"),
        ],
    ).to_pandas()

    df = events_pdf.copy()
    df["window_start"] = (df["ms"] // HOUR) * HOUR
    ref = (
        df.groupby(["user_id", "window_start"])
        .agg(
            n_events=("value", "size"),
            sum_value=("value", "sum"),
            max_value=("value", "max"),
            avg_value=("value", "mean"),
        )
        .reset_index()
    )
    got = out.sort_values(["user_id", "window_start"]).reset_index(drop=True)
    ref = ref.sort_values(["user_id", "window_start"]).reset_index(drop=True)
    assert len(got) == len(ref)
    pd.testing.assert_frame_equal(
        got[ref.columns].astype({"n_events": "int64"}), ref, check_dtype=False, atol=1e-9
    )


def test_sliding_vs_pandas(ray_session, events_pdf):
    import ray.data as rd

    size, slide = 2 * HOUR, HOUR
    ds = rd.read_parquet(EVENTS, columns=["user_id", "ts", "value"])
    out = sliding_window(
        ds, ["user_id"], "ts", size, slide,
        [AggSpec("count", None, "n_events"), AggSpec("sum", "value", "sum_value")],
    ).to_pandas()

    df = events_pdf.copy()
    parts = []
    for j in range(size // slide):
        p = df.copy()
        p["window_start"] = (p["ms"] // slide) * slide - j * slide
        parts.append(p)
    ref = (
        pd.concat(parts)
        .groupby(["user_id", "window_start"])
        .agg(n_events=("value", "size"), sum_value=("value", "sum"))
        .reset_index()
    )
    got = out.sort_values(["user_id", "window_start"]).reset_index(drop=True)
    ref = ref.sort_values(["user_id", "window_start"]).reset_index(drop=True)
    assert len(got) == len(ref)
    pd.testing.assert_frame_equal(got[ref.columns], ref, check_dtype=False, atol=1e-9)


def test_session_vs_pandas(ray_session, events_pdf):
    import ray.data as rd

    gap = 30 * 60 * 1000
    ds = rd.read_parquet(EVENTS, columns=["user_id", "ts", "value"])
    out = session_window(
        ds, ["user_id"], "ts", gap,
        [AggSpec("count", None, "n_events"), AggSpec("sum", "value", "sum_value")],
    ).to_pandas()

    ref_rows = []
    for uid, g in events_pdf.groupby("user_id"):
        g = g.sort_values("ms")
        sid = sessionize_sorted(g["ms"].to_numpy(), gap)
        g = g.assign(sid=sid)
        for _, s in g.groupby("sid"):
            ref_rows.append(
                dict(
                    user_id=uid,
                    session_start=int(s["ms"].iloc[0]),
                    session_end=int(s["ms"].iloc[-1]),
                    n_events=len(s),
                    sum_value=s["value"].sum(),
                )
            )
    ref = pd.DataFrame(ref_rows)
    got = out.sort_values(["user_id", "session_start"]).reset_index(drop=True)
    ref = ref.sort_values(["user_id", "session_start"]).reset_index(drop=True)
    assert len(got) == len(ref)
    pd.testing.assert_frame_equal(got[ref.columns], ref, check_dtype=False, atol=1e-9)


def test_grouped_quantile_disc_convention(ray_session):
    """quantile_disc semantics: element at max(0, ceil(q*n)-1); NULLs
    ignored; multi-column groups; q=0/1 endpoints."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from hydra_ray.stages.windows import grouped_quantile

    df = pd.DataFrame({
        "a": ["x"] * 5 + ["x"] * 4 + ["y"] * 3,
        "b": [1] * 5 + [2] * 4 + [1] * 3,
        "v": [5.0, 1.0, 9.0, 3.0, 7.0,   4.0, None, 2.0, 8.0,   10.0, 30.0, 20.0],
    })
    out = (
        grouped_quantile(rd.from_pandas(df).repartition(4), ["a", "b"], "v",
                         {"q0": 0.0, "med": 0.5, "q1": 1.0})
        .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    )
    # (x,1): sorted [1,3,5,7,9] -> med idx ceil(2.5)-1=2 -> 5; q0=1, q1=9
    # (x,2): NULL dropped -> [2,4,8] -> med idx ceil(1.5)-1=1 -> 4
    # (y,1): [10,20,30] -> med 20
    assert out["med"].tolist() == [5.0, 4.0, 20.0]
    assert out["q0"].tolist() == [1.0, 2.0, 10.0]
    assert out["q1"].tolist() == [9.0, 8.0, 30.0]


def test_tumbling_var_std_vs_pandas(ray_session, events_pdf):
    import ray.data as rd

    ds = rd.read_parquet(EVENTS, columns=["user_id", "ts", "value"])
    out = (
        tumbling_window(
            ds, ["user_id"], "ts", HOUR,
            [
                AggSpec("count", None, "n"),
                AggSpec("var", "value", "v"),
                AggSpec("std", "value", "s"),
            ],
        )
        .to_pandas()
        .sort_values(["user_id", "window_start"])
        .reset_index(drop=True)
    )
    df = events_pdf.copy()
    df["window_start"] = (df["ms"] // HOUR) * HOUR
    ref = (
        df.groupby(["user_id", "window_start"])["value"]
        .agg(n="count", v="var", s="std")           # pandas default ddof=1
        .reset_index()
        .sort_values(["user_id", "window_start"])
        .reset_index(drop=True)
    )
    assert len(out) == len(ref)
    assert (out["n"].to_numpy() == ref["n"].to_numpy()).all()
    for c in ("v", "s"):
        a, b = out[c].to_numpy(), ref[c].to_numpy()
        both_nan = np.isnan(a) & np.isnan(b)
        assert (both_nan | (np.abs(a - b) < 1e-8)).all()


def test_rollup_aggregate_vs_pandas(ray_session, events_pdf):
    """ROLLUP levels = pandas groupbys at each prefix; grouping_id is the
    SQL GROUPING bitmask; mean/var survive the partial re-combine exactly
    (coarser levels are built from the finest partials, not the data)."""
    import ray.data as rd

    from hydra_ray.stages.windows import rollup_aggregate

    ds = rd.read_parquet(EVENTS, columns=["user_id", "event_type", "value"])
    out = (
        rollup_aggregate(
            ds, ["user_id", "event_type"],
            [
                AggSpec("count", None, "n"),
                AggSpec("sum", "value", "sv"),
                AggSpec("mean", "value", "mv"),
                AggSpec("var", "value", "vv"),
            ],
        )
        .to_pandas()
    )
    df = events_pdf

    def check(level_df, ref, gid):
        level_df = level_df.sort_values(
            [c for c in ("user_id", "event_type") if level_df[c].notna().any()]
            or ["n"]
        ).reset_index(drop=True)
        assert (level_df["grouping_id"] == gid).all()
        assert len(level_df) == len(ref)
        assert (level_df["n"].to_numpy() == ref["n"].to_numpy()).all()
        for c in ("sv", "mv", "vv"):
            a, b = level_df[c].to_numpy(), ref[c].to_numpy(dtype=float)
            nan = np.isnan(a) & np.isnan(b)
            assert (nan | (np.abs(a - b) < 1e-9)).all(), c

    fine = out[out["grouping_id"] == 0]
    ref0 = (df.groupby(["user_id", "event_type"])["value"]
            .agg(n="count", sv="sum", mv="mean", vv="var").reset_index()
            .sort_values(["user_id", "event_type"]).reset_index(drop=True))
    # count aggregates ROWS (count of group keys), pandas counts non-null
    ref0["n"] = df.groupby(["user_id", "event_type"]).size().sort_index().to_numpy()
    check(fine, ref0, 0)

    mid = out[out["grouping_id"] == 1]
    ref1 = (df.groupby(["user_id"])["value"]
            .agg(sv="sum", mv="mean", vv="var").reset_index()
            .sort_values(["user_id"]).reset_index(drop=True))
    ref1["n"] = df.groupby(["user_id"]).size().sort_index().to_numpy()
    check(mid, ref1, 1)

    top = out[out["grouping_id"] == 3]
    assert len(top) == 1
    assert int(top["n"].iloc[0]) == len(df)
    assert abs(top["sv"].iloc[0] - df["value"].sum()) < 1e-6
    assert top["user_id"].isna().all() and top["event_type"].isna().all()


def test_rollup_grouping_sets(ray_session, events_pdf):
    """Explicit GROUPING SETS: only the requested levels, including a
    non-prefix set (event_type alone — CUBE-style)."""
    import ray.data as rd

    from hydra_ray.stages.windows import rollup_aggregate

    ds = rd.read_parquet(EVENTS, columns=["user_id", "event_type", "value"])
    out = rollup_aggregate(
        ds, ["user_id", "event_type"], [AggSpec("count", None, "n")],
        sets=[["event_type"], []],
    ).to_pandas()
    df = events_pdf
    assert sorted(out["grouping_id"].unique().tolist()) == [2, 3]
    et = out[out["grouping_id"] == 2].sort_values("event_type")
    ref = df.groupby("event_type").size()
    assert et["event_type"].tolist() == list(ref.index)
    assert et["n"].tolist() == ref.tolist()
    assert et["user_id"].isna().all()
    assert int(out[out["grouping_id"] == 3]["n"].iloc[0]) == len(df)


def test_new_aggspecs_rollup_recombination(ray_session):
    """skew/kurt/pairwise/bool/product AggSpecs survive the rollup
    path's partial RE-combination at coarser key levels — exact DuckDB
    GROUPING SETS parity from one data pass."""
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from hydra_ray.stages.windows import AggSpec, rollup_aggregate

    rng = np.random.default_rng(8)
    n = 4000
    df = pd.DataFrame({
        "a": rng.integers(0, 4, n).astype(str),
        "b": rng.integers(0, 3, n),
        "x": rng.normal(0, 2, n),
        "flag": rng.random(n) < 0.9,
    })
    df["y"] = 1.7 * df["x"] + rng.normal(0, 1, n) + df["b"]
    got = rollup_aggregate(
        rd.from_pandas(df).repartition(6), ["a", "b"],
        [
            AggSpec("count", None, "n"),
            AggSpec("skew", "y", "sk"),
            AggSpec("kurt", "y", "ku"),
            AggSpec("corr", "y", "cr", col2="x"),
            AggSpec("regr_slope", "y", "rs", col2="x"),
            AggSpec("bool_and", "flag", "ba"),
            AggSpec("bool_or", "flag", "bo"),
        ],
    ).to_pandas()
    ref = duckdb.sql("""
        SELECT a, b, count(*) AS n, skewness(y) sk, kurtosis(y) ku,
               corr(y, x) cr, regr_slope(y, x) rs,
               bool_and(flag) ba, bool_or(flag) bo,
               GROUPING(a, b) AS grouping_id
        FROM df GROUP BY ROLLUP(a, b)
    """).df()
    key = ["a", "b", "grouping_id"]
    got = got.sort_values(key, na_position="last").reset_index(drop=True)
    ref = ref.sort_values(key, na_position="last").reset_index(drop=True)
    assert len(got) == len(ref)
    assert got["n"].tolist() == ref["n"].tolist()
    for c in ("sk", "ku", "cr", "rs"):
        assert np.allclose(got[c], ref[c], atol=1e-9, equal_nan=True), c
    assert got["ba"].tolist() == ref["ba"].tolist()
    assert got["bo"].tolist() == ref["bo"].tolist()


def test_arg_max_min_aggspecs(ray_session):
    """arg_max/arg_min AggSpecs: DuckDB parity (explicit tie-break SQL)
    at the finest level, pandas parity for every ROLLUP level (the
    binary argkey partial must survive re-combination), NULL semantics
    (either arg NULL → row ignored; empty group → NULL), and int /
    float / str payloads."""
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from hydra_ray.stages.windows import (AggSpec, grouped_aggregate,
                                          rollup_aggregate)

    rng = np.random.default_rng(11)
    n = 6000
    df = pd.DataFrame({
        "a": rng.integers(0, 4, n).astype(str),
        "b": rng.integers(0, 3, n),
        # few distinct x values → ties are COMMON, exercising the rule
        "x": rng.integers(0, 5, n).astype(float),
        "yi": rng.integers(-50, 50, n),
        "ys": [f"s{v:02d}" for v in rng.integers(0, 30, n)],
    })
    df.loc[rng.random(n) < 0.05, "x"] = np.nan
    df["yf"] = df["yi"] / 7.0
    df.loc[rng.random(n) < 0.05, "yi"] = pd.NA
    df["yi"] = df["yi"].astype("Int64")
    # one group whose x is ALL NULL → every arg output NULL there
    allnull = pd.DataFrame({"a": ["z"] * 3, "b": [0] * 3, "x": [np.nan] * 3,
                            "yi": pd.array([1, 2, 3], "Int64"),
                            "ys": ["t", "u", "v"]})
    allnull["yf"] = 0.5
    df = pd.concat([df, allnull], ignore_index=True)

    aggs = [
        AggSpec("count", None, "n"),
        AggSpec("arg_max", "yi", "am_i", col2="x", ytype="int"),
        AggSpec("arg_min", "yi", "an_i", col2="x", ytype="int"),
        AggSpec("arg_max", "yf", "am_f", col2="x", ytype="float"),
        AggSpec("arg_max", "ys", "am_s", col2="x", ytype="str"),
    ]
    import pyarrow as pa

    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(7)
    got = (
        grouped_aggregate(ds, ["a", "b"], aggs)
        .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    )
    ref = duckdb.sql("""
        WITH m AS (
            SELECT a, b, count(*) AS n,
                   max(x) FILTER (x IS NOT NULL AND yi IS NOT NULL) mxi,
                   min(x) FILTER (x IS NOT NULL AND yi IS NOT NULL) mni,
                   max(x) FILTER (x IS NOT NULL AND yf IS NOT NULL) mxf,
                   max(x) FILTER (x IS NOT NULL AND ys IS NOT NULL) mxs
            FROM df GROUP BY a, b
        )
        SELECT m.a, m.b, m.n,
               min(CASE WHEN d.x = m.mxi THEN d.yi END) AS am_i,
               min(CASE WHEN d.x = m.mni THEN d.yi END) AS an_i,
               min(CASE WHEN d.x = m.mxf THEN d.yf END) AS am_f,
               min(CASE WHEN d.x = m.mxs THEN d.ys END) AS am_s
        FROM df d JOIN m ON d.a = m.a AND d.b = m.b
        GROUP BY m.a, m.b, m.n
        ORDER BY m.a, m.b
    """).df()
    assert len(got) == len(ref)
    assert got["n"].astype(int).tolist() == ref["n"].astype(int).tolist()
    for c in ("am_i", "an_i", "am_f", "am_s"):
        g, r = got[c], ref[c]
        assert (g.isna() == r.isna()).all(), c
        assert (g.dropna() == r.dropna()).all(), c

    # rollup re-combination: pandas reference per level
    rolled = rollup_aggregate(
        rd.from_arrow(pa.Table.from_pandas(df)).repartition(7), ["a", "b"],
        [AggSpec("arg_max", "yi", "am_i", col2="x", ytype="int"),
         AggSpec("arg_max", "ys", "am_s", col2="x", ytype="str")],
    ).to_pandas()

    def ref_arg(gd, ycol):
        gd = gd.dropna(subset=["x", ycol])
        if gd.empty:
            return None
        return gd.loc[gd["x"] == gd["x"].max(), ycol].min()

    for keys, gid in ((["a", "b"], 0), (["a"], 1), ([], 3)):
        lvl = rolled[rolled["grouping_id"] == gid]
        groups = df.groupby(keys) if keys else [((), df)]
        exp = {}
        for k, gd in groups:
            kk = k if isinstance(k, tuple) else (k,)
            exp[kk] = (ref_arg(gd, "yi"), ref_arg(gd, "ys"))
        assert len(lvl) == len(exp)
        for _, row in lvl.iterrows():
            kk = tuple(row[c] for c in keys)
            ei, es = exp[kk]
            gi = None if pd.isna(row["am_i"]) else row["am_i"]
            gs = None if pd.isna(row["am_s"]) else row["am_s"]
            assert gi == ei and gs == es, (kk, gi, ei, gs, es)


def test_null_string_group_keys_merge_exactly(ray_session):
    """pyarrow's multi-key group_by opens a FRESH group for null string
    keys every 32-row accumulator batch (pyarrow 16.1) — the
    _null_string_key_guard must make grouped_aggregate / rollup exact
    for data whose key columns genuinely hold nulls."""
    import duckdb
    import ray.data as rd

    from hydra_ray.stages.windows import grouped_aggregate, rollup_aggregate

    rng = np.random.default_rng(11)
    n = 5_000
    df = pd.DataFrame({
        "a": np.where(rng.random(n) < 0.3, None,
                      rng.choice(list("xyz"), n)),
        "b": rng.integers(0, 4, n),
        "v": rng.random(n).round(6),
    })
    got = (
        grouped_aggregate(
            rd.from_pandas(df).repartition(8), ["a", "b"],
            [AggSpec("sum", "v", "s"), AggSpec("count", None, "n")])
        .to_pandas()
    )
    ref = duckdb.sql(
        "SELECT a, b, sum(v) AS s, count(*) AS n FROM df GROUP BY a, b"
    ).df()
    key = ["a", "b"]
    got = got.sort_values(key, na_position="last").reset_index(drop=True)
    ref = ref.sort_values(key, na_position="last").reset_index(drop=True)
    assert len(got) == len(ref)
    assert np.allclose(got["s"], ref["s"])
    assert got["n"].astype(int).tolist() == ref["n"].astype(int).tolist()

    # BINARY null keys hit the same pyarrow bug (verified repro) — the
    # guard must cover them too
    dfb = df.copy()
    dfb["a"] = dfb["a"].map(lambda x: None if x is None else x.encode())
    import pyarrow as pa_
    import ray.data as rd2
    tb = pa_.table({
        "a": pa_.array(dfb["a"], pa_.binary()),
        "b": pa_.array(dfb["b"], pa_.int64()),
        "v": pa_.array(dfb["v"], pa_.float64()),
    })
    gotb = (
        grouped_aggregate(
            rd2.from_arrow(tb).repartition(8), ["a", "b"],
            [AggSpec("sum", "v", "s"), AggSpec("count", None, "n")])
        .to_pandas()
    )
    assert len(gotb) == len(ref)   # same group structure as the string run

    # rollup over the same nullable key: every level exact
    roll = rollup_aggregate(
        rd.from_pandas(df).repartition(8), ["a", "b"],
        [AggSpec("sum", "v", "s")]).to_pandas()
    rref = duckdb.sql("""
        SELECT a, b, CAST(GROUPING(a, b) AS BIGINT) AS grouping_id,
               sum(v) AS s
        FROM df GROUP BY ROLLUP(a, b)
    """).df()
    k2 = ["grouping_id", "a", "b"]
    roll = roll.sort_values(k2, na_position="last").reset_index(drop=True)
    rref = rref.sort_values(k2, na_position="last").reset_index(drop=True)
    assert len(roll) == len(rref)
    assert np.allclose(roll["s"], rref["s"])
