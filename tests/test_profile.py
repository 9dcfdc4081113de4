"""Profiling operators vs brute-force pandas references."""

import numpy as np
import pandas as pd
import pytest

from hydra_ray.stages.profile import (
    grouped_corr,
    grouped_histogram,
    grouped_mode,
    grouped_outliers,
)


@pytest.fixture()
def rd(ray_session):
    import ray.data as rd

    return rd


def _df(n=5000, seed=5):
    rng = np.random.default_rng(seed)
    g = rng.choice(["a", "b", "c"], size=n)
    x = rng.exponential(40, size=n)
    return pd.DataFrame({
        "grp": g,
        "x": x,
        "y": x * 2 + rng.normal(0, 10, size=n),
        "cat": rng.integers(0, 12, size=n),
        "rid": np.arange(n),
    })


def test_grouped_histogram_matches_pandas(rd):
    df = _df()
    out = (
        grouped_histogram(rd.from_pandas(df).repartition(6), ["grp"], "x",
                          0.0, 100.0, 5)
        .to_pandas().sort_values(["grp", "bin"]).reset_index(drop=True)
    )
    ref = (
        df.assign(bin=np.clip(np.floor(df["x"] / 20.0), 0, 4).astype("int64"))
        .groupby(["grp", "bin"]).size().rename("n").reset_index()
    )
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)


def test_grouped_mode_tiebreak_smallest(rd):
    df = pd.DataFrame({
        "grp": ["a"] * 4 + ["b"] * 3,
        "v":   [7, 2, 7, 2,   9, 5, 5],   # a: tie 7/2 -> 2; b: 5
    })
    out = (
        grouped_mode(rd.from_pandas(df).repartition(3), ["grp"], "v",
                     num_buckets=4)
        .to_pandas().sort_values("grp").reset_index(drop=True)
    )
    assert out["mode_value"].tolist() == [2, 5]


def test_grouped_mode_matches_pandas(rd):
    df = _df()
    out = (
        grouped_mode(rd.from_pandas(df).repartition(6), ["grp"], "cat")
        .to_pandas().sort_values("grp").reset_index(drop=True)
    )

    def ref_mode(s):
        c = s.value_counts()
        top = c[c == c.max()].index.min()
        return top

    ref = df.groupby("grp")["cat"].apply(ref_mode).rename("mode_value").reset_index()
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)


def test_grouped_corr_matches_pandas(rd):
    df = _df()
    out = (
        grouped_corr(rd.from_pandas(df).repartition(6), ["grp"], "x", "y")
        .to_pandas().sort_values("grp").reset_index(drop=True)
    )
    ref = df.groupby("grp").apply(
        lambda g: g["x"].corr(g["y"]), include_groups=False
    ).rename("corr").reset_index()
    np.testing.assert_allclose(out["corr"], ref["corr"], rtol=1e-9)
    # degenerate groups -> NULL
    d2 = pd.DataFrame({"grp": ["z", "z", "w"], "x": [1.0, 1.0, 3.0],
                       "y": [2.0, 5.0, 1.0]})
    out2 = grouped_corr(rd.from_pandas(d2), ["grp"], "x", "y").to_pandas()
    assert out2["corr"].isna().all()  # zero variance / n==1


def test_grouped_outliers_matches_pandas(rd):
    df = _df()
    out = (
        grouped_outliers(rd.from_pandas(df).repartition(6), ["grp"], "x",
                         n_sigma=2.0)
        .to_pandas().sort_values("rid").reset_index(drop=True)
    )
    st = df.groupby("grp")["x"].agg(["mean", "std"])
    j = df.join(st, on="grp")
    ref = df[np.abs(j["x"] - j["mean"]) > 2.0 * j["std"]].reset_index(drop=True)
    assert out["rid"].tolist() == ref["rid"].tolist()


def test_profile_table_nulls_and_edges(rd):
    """profile_table vs pandas on nulls, an all-null numeric column,
    -0.0/0.0 merging and NaN-as-value — partition-count invariant."""
    from hydra_ray.stages.profile import profile_table

    df = pd.DataFrame({
        "i": pd.array([1, 2, 2, None, 5, 5, 5, None], dtype="Int64"),
        "f": [0.0, -0.0, 1.5, np.nan, np.nan, 2.5, 2.5, 0.1],
        "s": ["a", "a", None, "b", "b", "b", None, "c"],
        "dead": pd.array([None] * 8, dtype="Int64"),
    })
    out = profile_table(
        rd.from_pandas(df).repartition(5), ["i", "f", "s", "dead"],
        num_buckets=4,
    ).to_pandas().set_index("col")

    assert out.loc["i", "n_rows"] == 8
    assert out.loc["i", "n_nonnull"] == 6
    assert out.loc["i", "n_distinct"] == 3
    assert out.loc["i", "min_v"] == 1.0 and out.loc["i", "max_v"] == 5.0
    # NaN is a VALUE for arrow floats only when null; here np.nan → null
    # in from_pandas, so f has 6 non-null values, distinct {0.0,1.5,2.5,0.1}
    assert out.loc["f", "n_nonnull"] == 6
    assert out.loc["f", "n_distinct"] == 4      # -0.0 merges into 0.0
    assert out.loc["f", "min_v"] == 0.0 and out.loc["f", "max_v"] == 2.5
    assert out.loc["s", "n_nonnull"] == 6
    assert out.loc["s", "n_distinct"] == 3
    assert pd.isna(out.loc["s", "min_v"])
    assert out.loc["dead", "n_nonnull"] == 0
    assert out.loc["dead", "n_distinct"] == 0
    assert pd.isna(out.loc["dead", "min_v"])
