"""pivot_wider + ordered-window operators vs brute-force pandas references."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from hydra_ray.stages.rollup import (
    grouped_cumsum,
    grouped_resample,
    grouped_rolling,
    grouped_shift,
    pivot_wider,
)


@pytest.fixture()
def rd(ray_session):
    import ray.data as rd

    return rd


def _events(n=4000, seed=3):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "user_id": rng.integers(0, 40, size=n),
        "event_id": np.arange(n),
        "ts": rng.integers(0, 10_000, size=n),
        "event_type": rng.choice(["click", "view", "purchase"], size=n),
        "value": rng.exponential(50.0, size=n).round(3),
    })


def test_pivot_wider_matches_pandas(rd):
    df = _events()
    out = (
        pivot_wider(
            rd.from_pandas(df).repartition(5), ["user_id"], "event_type",
            "value", names=["click", "purchase"], prefix="sum_",
        )
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    ref = (
        df.pivot_table(index="user_id", columns="event_type", values="value",
                       aggfunc="sum", fill_value=0.0)
        .reindex(columns=["click", "purchase"], fill_value=0.0)
        .reset_index()
    )
    assert out.columns.tolist() == ["user_id", "sum_click", "sum_purchase"]
    np.testing.assert_allclose(
        out[["sum_click", "sum_purchase"]].to_numpy(),
        ref[["click", "purchase"]].to_numpy(),
        rtol=1e-9,
    )


def test_grouped_rolling_matches_pandas(rd):
    df = _events(n=3000)
    w = 7
    out = (
        grouped_rolling(
            rd.from_pandas(df).repartition(4), "user_id", "ts", "event_id",
            "value", window_rows=w,
        )
        .to_pandas()
        .sort_values(["user_id", "ts", "event_id"])
        .reset_index(drop=True)
    )
    ref = df.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
    ref["rolling_mean"] = (
        ref.groupby("user_id")["value"]
        .rolling(w, min_periods=1).mean().reset_index(level=0, drop=True)
    )
    assert len(out) == len(ref)
    np.testing.assert_allclose(
        out["rolling_mean"].to_numpy(), ref["rolling_mean"].to_numpy(),
        rtol=1e-9,
    )
    # every input row comes back exactly once
    assert sorted(out["event_id"]) == sorted(df["event_id"])


@pytest.mark.parametrize("periods", [1, 2, -1])
def test_grouped_shift_matches_pandas(rd, periods):
    df = _events(n=2500, seed=11)
    out = (
        grouped_shift(
            rd.from_pandas(df).repartition(4), "user_id", "ts", "event_id",
            "value", periods=periods, out_col="shifted",
        )
        .to_pandas()
        .sort_values(["user_id", "ts", "event_id"])
        .reset_index(drop=True)
    )
    ref = df.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
    ref["shifted"] = ref.groupby("user_id")["value"].shift(periods)
    assert len(out) == len(ref)
    a, b = out["shifted"].to_numpy(), ref["shifted"].to_numpy()
    assert (np.isnan(a) == np.isnan(b)).all()
    np.testing.assert_allclose(a[~np.isnan(a)], b[~np.isnan(b)], rtol=1e-9)
    assert sorted(out["event_id"]) == sorted(df["event_id"])


def test_collect_sorted_matches_pandas(rd):
    from hydra_ray.stages.rollup import collect_sorted

    df = _events(n=2000, seed=13)
    out = (
        collect_sorted(
            rd.from_pandas(df).repartition(4), "user_id", "ts", "event_id",
            "event_type", sep="|", out_col="seq",
        )
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    ref = (
        df.sort_values(["user_id", "ts", "event_id"])
        .groupby("user_id")["event_type"]
        .agg(lambda s: "|".join(s))
        .reset_index(name="seq")
    )
    assert out["user_id"].tolist() == ref["user_id"].tolist()
    assert out["seq"].tolist() == ref["seq"].tolist()
    assert out["n_items"].sum() == len(df)


def test_grouped_cumsum_matches_pandas(rd):
    df = _events(n=2500, seed=12)
    out = (
        grouped_cumsum(
            rd.from_pandas(df).repartition(4), "user_id", "ts", "event_id",
            "value", out_col="running",
        )
        .to_pandas()
        .sort_values(["user_id", "ts", "event_id"])
        .reset_index(drop=True)
    )
    ref = df.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
    ref["running"] = ref.groupby("user_id")["value"].cumsum()
    np.testing.assert_allclose(
        out["running"].to_numpy(), ref["running"].to_numpy(), rtol=1e-9
    )


def _brute_funnel(df, steps, within=None):
    rows = []
    for uid, g in df.sort_values(["ts", "event_id"]).groupby("user_id"):
        ts = g["ts"].to_numpy()
        typ = g["event_type"].to_numpy()
        t_prev, chain = -1, []
        for s in steps:
            m = (typ == s) & (ts > t_prev)
            if not m.any():
                chain = None
                break
            t_prev = int(ts[m].min())
            chain.append(t_prev)
        if chain is not None and (within is None or chain[-1] - chain[0] <= within):
            rows.append([uid] + chain)
    cols = ["user_id"] + [f"t{i+1}" for i in range(len(steps))]
    return pd.DataFrame(rows, columns=cols).sort_values("user_id").reset_index(drop=True)


@pytest.mark.parametrize("within", [None, 2500])
def test_funnel_match_matches_bruteforce(rd, within):
    from hydra_ray.stages.cep import funnel_match

    df = _events(n=3000, seed=11)
    steps = ["view", "click", "purchase"]
    out = (
        funnel_match(rd.from_pandas(df).repartition(7), "user_id", "ts",
                     "event_type", steps, within=within, num_buckets=8)
        .to_pandas().sort_values("user_id").reset_index(drop=True)
    )
    ref = _brute_funnel(df, steps, within)
    assert len(out) == len(ref) > 0
    pd.testing.assert_frame_equal(out.astype("int64"), ref.astype("int64"))


def test_funnel_match_strictly_after_and_ties(rd):
    # equal timestamps do NOT chain (strict >); a later same-type event is
    # ignored once the earliest chain is fixed
    from hydra_ray.stages.cep import funnel_match

    df = pd.DataFrame({
        "user_id": [1, 1, 1, 2, 2, 3, 3, 3],
        "event_id": range(8),
        "ts":       [5, 5, 9, 1, 2, 1, 3, 2],
        "event_type": ["view", "click", "click",   # u1: click@5 not > view@5
                       "view", "click",            # u2: 2-step only
                       "view", "click", "click"],  # u3: earliest click@2
    })
    out = (
        funnel_match(rd.from_pandas(df), "user_id", "ts", "event_type",
                     ["view", "click"], num_buckets=4)
        .to_pandas().sort_values("user_id").reset_index(drop=True)
    )
    assert out["user_id"].tolist() == [1, 2, 3]
    assert out["t2"].tolist() == [9, 2, 2]


def test_grouped_rank_kinds_vs_pandas(ray_session):
    """All four rank kinds vs pandas: heavy ties within keys, single-row
    keys (percent_rank 0), row_number tie-broken deterministically."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from hydra_ray.stages.rollup import grouped_rank

    rng = np.random.default_rng(3)
    n = 2000
    df = pd.DataFrame({
        "k": np.r_[rng.integers(0, 37, n - 1), [999]],  # key 999: one row
        "v": rng.integers(0, 9, n),                      # heavy ties
        "tid": rng.permutation(n),
    })
    out = (
        grouped_rank(rd.from_pandas(df).repartition(5), "k", "v", "tid",
                     {"rn": "row_number", "rk": "rank",
                      "dr": "dense_rank", "pr": "percent_rank"},
                     num_buckets=8)
        .to_pandas().sort_values("tid").reset_index(drop=True)
    )
    ref = df.sort_values("tid").reset_index(drop=True)
    g = ref.groupby("k")["v"]
    ref["rk"] = g.rank(method="min").astype(np.int64)
    ref["dr"] = g.rank(method="dense").astype(np.int64)
    cnt = ref.groupby("k")["v"].transform("size")
    ref["pr"] = np.where(cnt > 1, (ref["rk"] - 1) / (cnt - 1), 0.0)
    ref["rn"] = (
        ref.sort_values(["k", "v", "tid"]).groupby("k").cumcount() + 1
    ).sort_index()
    for c in ("rn", "rk", "dr"):
        assert (out[c].to_numpy() == ref[c].to_numpy()).all(), c
    assert np.allclose(out["pr"].to_numpy(), ref["pr"].to_numpy(), atol=0)


def test_grouped_rank_guards(ray_session):
    import numpy as np
    import pandas as pd
    import pytest
    import ray.data as rd

    from hydra_ray.stages.rollup import grouped_rank

    df = pd.DataFrame({"k": [1, 1], "v": [1.0, np.nan], "tid": [0, 1]})
    with pytest.raises(ValueError, match="row_number needs tie_col"):
        grouped_rank(rd.from_pandas(df), "k", "v", None, {"rn": "row_number"})
    with pytest.raises(Exception, match="NULL"):
        grouped_rank(rd.from_pandas(df), "k", "v", "tid",
                     {"rk": "rank"}).count()


def test_grouped_rolling_range_matches_bruteforce(rd):
    import numpy as np

    from hydra_ray.stages.rollup import grouped_rolling_range

    rng = np.random.default_rng(9)
    n = 800
    df = pd.DataFrame({
        "k": rng.choice(["a", "b", "c", "d"], n),
        "ts": rng.integers(0, 5_000, n).astype("int64"),
        "v": rng.integers(-50, 100, n).astype("float64"),
    })
    # force ties in (k, ts): peer rows must share one frame
    df.loc[10:30, "ts"] = 1_000
    R = 700
    got = (
        grouped_rolling_range(rd.from_pandas(df).repartition(5),
                              "k", "ts", "v", range_span=R, num_buckets=4)
        .to_pandas()
    )
    # brute force: frame = same-key rows with ts in [row.ts - R, row.ts]
    ref_sum, ref_cnt = [], []
    for r in got.itertuples():
        m = (df["k"] == r.k) & (df["ts"] >= r.ts - R) & (df["ts"] <= r.ts)
        ref_sum.append(df.loc[m, "v"].sum())
        ref_cnt.append(int(m.sum()))
    assert got["range_sum"].tolist() == ref_sum
    assert got["range_cnt"].tolist() == ref_cnt
    assert np.allclose(got["range_mean"], np.array(ref_sum) / np.array(ref_cnt))
    assert len(got) == n


def test_grouped_bounds_ntile_semantics(rd):
    import numpy as np

    from hydra_ray.stages.rollup import grouped_bounds

    # one key with 10 rows -> NTILE(4) sizes 3,3,2,2; another with 3 rows
    # (fewer rows than tiles) -> tiles 1,2,3; singleton key
    df = pd.DataFrame({
        "k": ["a"] * 10 + ["b"] * 3 + ["c"],
        "ts": list(range(10)) + [5, 1, 9] + [0],
        "tie": range(14),
        "v": [float(x) for x in range(14)],
    })
    out = (
        grouped_bounds(rd.from_pandas(df).repartition(3), "k", "ts", "tie",
                       "v", ntile=4, num_buckets=2)
        .to_pandas()
    )
    a = out[out["k"] == "a"].sort_values("ts")
    assert a["tile"].tolist() == [1, 1, 1, 2, 2, 2, 3, 3, 4, 4]
    assert (a["first_value"] == 0.0).all() and (a["last_value"] == 9.0).all()
    b = out[out["k"] == "b"].sort_values("ts")   # ts order: 1, 5, 9
    assert b["tile"].tolist() == [1, 2, 3]
    assert (b["first_value"] == 11.0).all()       # v of ts=1
    assert (b["last_value"] == 12.0).all()        # v of ts=9
    c = out[out["k"] == "c"]
    assert c["tile"].tolist() == [1]
    assert c["first_value"].iloc[0] == c["last_value"].iloc[0] == 13.0


def test_grouped_resample_matches_pandas(rd):
    df = _events(n=3000)
    step = 500
    out = (
        grouped_resample(
            rd.from_pandas(df).repartition(5),
            "user_id", "ts", "event_id", "value", step=step,
        )
        .to_pandas()
        .sort_values(["user_id", "grid_ms"])
        .reset_index(drop=True)
    )
    rows = []
    for uid, g in df.sort_values(["ts", "event_id"]).groupby("user_id"):
        lo = -(-g["ts"].min() // step) * step
        hi = (g["ts"].max() // step) * step
        for gp in range(lo, hi + 1, step):
            at_or_before = g[g["ts"] <= gp]
            rows.append((uid, gp, at_or_before["value"].iloc[-1]))
    ref = pd.DataFrame(rows, columns=["user_id", "grid_ms", "value"])
    ref = ref.sort_values(["user_id", "grid_ms"]).reset_index(drop=True)
    assert len(out) == len(ref)
    assert out["user_id"].dtype == ref["user_id"].dtype
    np.testing.assert_array_equal(out["user_id"].to_numpy(), ref["user_id"].to_numpy())
    np.testing.assert_array_equal(out["grid_ms"].to_numpy(), ref["grid_ms"].to_numpy())
    np.testing.assert_allclose(out["value"].to_numpy(), ref["value"].to_numpy(), rtol=0)


def test_grouped_resample_bucket_invariance(rd):
    df = _events(n=1200, seed=9)
    outs = []
    for nb in (1, 8):
        outs.append(
            grouped_resample(
                rd.from_pandas(df).repartition(4),
                "user_id", "ts", "event_id", "value", step=700, num_buckets=nb,
            )
            .to_pandas()
            .sort_values(["user_id", "grid_ms"])
            .reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_transition_counts_matches_pandas(rd):
    from hydra_ray.stages.cep import transition_counts

    df = _events(n=3000, seed=5)
    out = (
        transition_counts(
            rd.from_pandas(df).repartition(5),
            "user_id", "ts", "event_id", "event_type",
        )
        .to_pandas()
        .sort_values(["prev_type", "next_type"])
        .reset_index(drop=True)
    )
    s = df.sort_values(["user_id", "ts", "event_id"])
    prev = s.groupby("user_id")["event_type"].shift(1)
    ref = (
        pd.DataFrame({"prev_type": prev, "next_type": s["event_type"]})
        .dropna()
        .value_counts()
        .rename("cnt")
        .reset_index()
        .sort_values(["prev_type", "next_type"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        out, ref[["prev_type", "next_type", "cnt"]], check_dtype=False
    )
    assert out["cnt"].sum() == len(df) - df["user_id"].nunique()


def test_sessionize_matches_pandas(rd):
    from hydra_ray.stages.rollup import sessionize

    df = _events(n=2500, seed=13)
    out = (
        sessionize(
            rd.from_pandas(df).repartition(5),
            "user_id", "ts", "event_id", gap=300,
        )
        .to_pandas()
        .sort_values(["user_id", "ts", "event_id"])
        .reset_index(drop=True)
    )
    s = df.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
    prev = s.groupby("user_id")["ts"].shift(1)
    start = prev.isna() | (s["ts"] - prev > 300)
    ref = start.groupby(s["user_id"]).cumsum().astype("int64")
    np.testing.assert_array_equal(out["session_id"].to_numpy(), ref.to_numpy())
    # every key's sessions start at 1 and are non-decreasing
    assert out.groupby("user_id")["session_id"].first().eq(1).all()


@pytest.mark.parametrize("alpha", [0.25, 0.9])
def test_grouped_ewma_matches_naive_fold(rd, alpha):
    """grouped_ewma == the literal per-key recurrence
    y_0 = x_0, y_i = (1-a)·y_{i-1} + a·x_i in (order, tie) order,
    invariant in bucket count (the routing exchange must not change
    the fold)."""
    from hydra_ray.stages.rollup import grouped_ewma

    df = _events(n=3000, seed=11)

    # naive reference fold
    want = {}
    for _, g in df.sort_values(["user_id", "ts", "event_id"]).groupby("user_id"):
        y = None
        for eid, x in zip(g["event_id"], g["value"]):
            y = x if y is None else (1 - alpha) * y + alpha * x
            want[eid] = y

    for nb in (1, 8):
        out = grouped_ewma(
            rd.from_pandas(df).repartition(6), "user_id", "ts", "event_id",
            "value", alpha=alpha, num_buckets=nb,
        ).to_pandas()
        assert len(out) == len(df)
        got = dict(zip(out["event_id"], out["ewma"]))
        err = max(abs(got[e] - want[e]) for e in want)
        assert err < 1e-9, (nb, err)


def test_grouped_ewma_rejects_bad_alpha(rd):
    from hydra_ray.stages.rollup import grouped_ewma

    ds = rd.from_pandas(_events(n=10))
    with pytest.raises(ValueError):
        grouped_ewma(ds, "user_id", "ts", "event_id", "value", alpha=0.0)
    with pytest.raises(ValueError):
        grouped_ewma(ds, "user_id", "ts", "event_id", "value", alpha=1.5)


def test_match_pattern_vs_python_re(rd):
    """match_pattern == per-key re.findall count over the ordered
    symbol string, under any partitioning / bucket count."""
    import re

    from hydra_ray.stages.cep import match_pattern

    rng = np.random.default_rng(7)
    n = 4000
    df = pd.DataFrame({
        "user_id": rng.integers(0, 80, n),
        "event_id": np.arange(n),
        "ts": rng.integers(0, 10_000, n),
        "event_type": rng.choice(
            ["view", "click", "purchase", "error"], n),
    })
    pat = "vc*p"
    out = (
        match_pattern(rd.from_pandas(df).repartition(9), "user_id", "ts",
                      "event_id", "event_type", pat, num_buckets=8)
        .to_pandas().sort_values("user_id").reset_index(drop=True)
    )
    ref_rows = []
    for uid, g in df.sort_values(["ts", "event_id"]).groupby("user_id"):
        seq = "".join(s[0] for s in g["event_type"])
        ref_rows.append((uid, len(re.findall(pat, seq))))
    ref = pd.DataFrame(ref_rows, columns=["user_id", "n_matches"])
    pd.testing.assert_frame_equal(out.astype("int64"), ref.astype("int64"))
    assert out["n_matches"].sum() > 0


def test_match_pattern_overlap_and_alternation(rd):
    # non-overlapping leftmost semantics: 'vpvp' has 2 'v.*?p'? no —
    # greedy 'vc*p' on 'vcpcp' matches once at 'vcp' then 'cp' has no v;
    # alternation and optional steps come free from the regex
    from hydra_ray.stages.cep import match_pattern

    df = pd.DataFrame({
        "user_id": [1] * 5 + [2] * 4,
        "event_id": range(9),
        "ts": list(range(5)) + list(range(4)),
        "event_type": ["view", "click", "purchase", "click", "purchase",
                       "view", "purchase", "view", "purchase"],
    })
    out = (
        match_pattern(rd.from_pandas(df), "user_id", "ts", "event_id",
                      "event_type", "v[ce]*p", num_buckets=4)
        .to_pandas().sort_values("user_id").reset_index(drop=True)
    )
    assert out["n_matches"].tolist() == [1, 2]
