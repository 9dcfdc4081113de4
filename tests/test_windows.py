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
