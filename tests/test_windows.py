"""Windowed aggregates (tumbling + session) over event streams."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from rwcf import windows


@pytest.fixture(scope="module")
def events_table():
    rng = np.random.default_rng(8)
    n = 2000
    base = 1_700_000_000
    ts = base + np.sort(rng.integers(0, 3600 * 24, n))
    users = rng.integers(0, 20, n)
    vals = rng.normal(10, 3, n)
    return pa.table({
        "user_id": pa.array(users, pa.int64()),
        "ts": pa.array((ts * 1_000_000).astype("datetime64[us]")),
        "value": pa.array(vals, pa.float64()),
    })


def test_tumbling_window(ray_session, events_table):
    import ray.data as rd
    ds = rd.from_arrow(events_table).repartition(4)
    out = windows.tumbling_window_aggregate(ds, window_s=3600).to_pandas()
    df = events_table.to_pandas()
    df["win"] = df["ts"].to_numpy().astype("datetime64[s]").astype(np.int64) // 3600
    df["v1000"] = np.floor(df["value"] * 1000).astype(np.int64)
    expect = (df.groupby(["user_id", "win"])
              .agg(n=("value", "size"), v1000=("v1000", "sum")).reset_index())
    a = out.sort_values(["user_id", "win"]).reset_index(drop=True)
    b = expect.sort_values(["user_id", "win"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a[["user_id", "win", "n", "v1000"]],
                                  b[["user_id", "win", "n", "v1000"]],
                                  check_dtype=False)


def test_session_windows(ray_session, events_table):
    import ray.data as rd
    ds = rd.from_arrow(events_table.select(["user_id", "ts"])).repartition(4)
    out = windows.session_windows(ds, gap_s=1800).to_pandas()
    # sessions partition each user's events; totals must add up
    assert out["n_events"].sum() == events_table.num_rows
    # per user, session starts are >gap apart
    for _, g in out.groupby("user_id"):
        starts = np.sort(g["session_start"].to_numpy())
        assert (np.diff(starts) > 1800).all()


def test_tumbling_pre1970_floor(ray_session):
    """Pre-1970 sub-second timestamps must floor (not truncate toward zero):
    -0.5s lies in window -1, never window 0 (ADVICE round 1)."""
    import ray.data as rd
    t = pa.table({
        "user_id": pa.array([1, 1, 1], pa.int64()),
        "ts": pa.array(np.array([-500_000, 500_000, 3_700_000_000],
                                dtype="datetime64[us]")),
        "value": pa.array([1.0, 1.0, 1.0], pa.float64()),
    })
    out = (windows.tumbling_window_aggregate(rd.from_arrow(t), window_s=3600)
           .to_pandas().sort_values("win").reset_index(drop=True))
    assert out["win"].tolist() == [-1, 0, 1]
    assert out["n"].tolist() == [1, 1, 1]


def test_session_pre1970_floor(ray_session):
    import ray.data as rd
    t = pa.table({
        "user_id": pa.array([7, 7], pa.int64()),
        "ts": pa.array(np.array([-1_500_000, -500_000], dtype="datetime64[us]")),
    })
    out = windows.session_windows(rd.from_arrow(t), gap_s=1800).to_pandas()
    # both events floor to -2 and -1 seconds -> one session starting at -2
    assert len(out) == 1
    assert out["session_start"].iloc[0] == -2
    assert out["n_events"].iloc[0] == 2


def test_sliding_window(ray_session, events_table):
    """Sliding (hopping) windows vs a pandas expansion oracle: every event
    contributes to each window [k*hop, k*hop + width) containing it."""
    import ray.data as rd
    ds = rd.from_arrow(events_table).repartition(4)
    out = windows.sliding_window_aggregate(
        ds, window_s=3600, hop_s=900).to_pandas()
    df = events_table.to_pandas()
    e = df["ts"].to_numpy().astype("datetime64[s]").astype(np.int64)
    v1000 = np.floor(df["value"].to_numpy() * 1000).astype(np.int64)
    rows = []
    for ei, ui, vi in zip(e, df["user_id"].to_numpy(), v1000):
        k_lo = (ei - 3600) // 900 + 1
        k_hi = ei // 900
        for k in range(k_lo, k_hi + 1):
            rows.append((ui, k * 900, vi))
    exp = (pd.DataFrame(rows, columns=["user_id", "win_start", "v1000"])
           .groupby(["user_id", "win_start"])
           .agg(n=("v1000", "size"), v1000=("v1000", "sum")).reset_index())
    a = out.sort_values(["user_id", "win_start"]).reset_index(drop=True)
    b = exp.sort_values(["user_id", "win_start"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        a[["user_id", "win_start", "n", "v1000"]],
        b[["user_id", "win_start", "n", "v1000"]], check_dtype=False)
    # replication factor: width/hop = 4 member windows per event
    assert out["n"].sum() == 4 * events_table.num_rows


def test_windows_accept_plain_int64_epoch_seconds(ray_session):
    """A plain int64 epoch-seconds ts column must work (ADVICE round 2:
    _epoch_seconds_floor dereferenced .unit and raised AttributeError)."""
    import ray.data as rd
    t = pa.table({
        "user_id": pa.array([1, 1, 2], pa.int64()),
        "ts": pa.array([100, 4000, 100], pa.int64()),
        "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
    })
    out = windows.tumbling_window_aggregate(
        rd.from_arrow(t), window_s=3600).to_pandas()
    got = out.sort_values(["user_id", "win"]).reset_index(drop=True)
    assert got["win"].tolist() == [0, 1, 0]
    assert got["n"].tolist() == [1, 1, 1]
    s = windows.sliding_window_aggregate(
        rd.from_arrow(t), window_s=3600, hop_s=1800).to_pandas()
    assert s["n"].sum() == 2 * t.num_rows


def test_running_totals(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from rwcf.windows import running_totals

    rng = np.random.default_rng(3)
    n = 500
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 23, n),
        "ts": pd.to_datetime(rng.integers(0, 10_000, n), unit="s"),
        "value": np.round(rng.normal(0, 5, n), 3),
    })
    # duplicate timestamps inside a key to exercise the (ts, id) tie-break
    df.loc[1, ["user_id", "ts"]] = df.loc[0, ["user_id", "ts"]]
    out = running_totals(rd.from_pandas(df).repartition(5)) \
        .to_pandas().sort_values("event_id", ignore_index=True)
    ref = df.sort_values(["user_id", "ts", "event_id"]).copy()
    ref["v1000"] = np.floor(ref["value"] * 1000).astype(np.int64)
    ref["row_num"] = ref.groupby("user_id").cumcount() + 1
    ref["run_sum1000"] = ref.groupby("user_id")["v1000"].cumsum()
    ref = ref.sort_values("event_id", ignore_index=True)
    assert (out["row_num"].to_numpy() == ref["row_num"].to_numpy()).all()
    assert (out["run_sum1000"].to_numpy()
            == ref["run_sum1000"].to_numpy()).all()
    assert len(out) == n


def test_running_totals_null_values(ray_session):
    # SQL SUM-OVER semantics: a NULL/NaN value contributes 0 to the
    # running sum but the row still gets a row number. Regression: the
    # unmasked floor(NaN*1000) used to become INT64_MIN and corrupt every
    # subsequent run_sum1000 for the key.
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from rwcf.windows import running_totals

    df = pd.DataFrame({
        "event_id": np.arange(4, dtype=np.int64),
        "user_id": np.zeros(4, dtype=np.int64),
        "ts": pd.to_datetime([10, 20, 30, 40], unit="s"),
        "value": [1.5, np.nan, 2.0, np.nan],
    })
    out = running_totals(rd.from_pandas(df)) \
        .to_pandas().sort_values("event_id", ignore_index=True)
    assert out["row_num"].tolist() == [1, 2, 3, 4]
    assert out["run_sum1000"].tolist() == [1500, 1500, 3500, 3500]


def test_funnel_steps(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from rwcf.windows import funnel_steps

    def ev(uid, sec, typ):
        return {"user_id": uid, "ts": pd.Timestamp(sec * 1_000_000_000),
                "event_type": typ}

    rows = [
        # u1: full conversion inside windows
        ev(1, 0, "view"), ev(1, 50, "click"), ev(1, 120, "purchase"),
        # u2: click arrives AFTER the window -> stuck at step 1
        ev(2, 0, "view"), ev(2, 5000, "click"),
        # u3: click exactly at view time -> strict < excludes it
        ev(3, 10, "view"), ev(3, 10, "click"),
        # u4: purchase BEFORE click -> order matters, stuck at 2
        ev(4, 0, "view"), ev(4, 5, "purchase"), ev(4, 20, "click"),
        # u5: boundary: click at exactly view + W -> inclusive lower
        # bound (a >= t - W) counts it
        ev(5, 0, "view"), ev(5, 100, "click"),
        # u6: no view at all -> absent from output
        ev(6, 0, "click"), ev(6, 10, "purchase"),
    ]
    ds = rd.from_pandas(pd.DataFrame(rows)).repartition(3)
    out = funnel_steps(ds, steps=("view", "click", "purchase"),
                       window_s=100).to_pandas() \
        .sort_values("user_id", ignore_index=True)
    got = dict(zip(out["user_id"], out["n_steps"]))
    assert got == {1: 3, 2: 1, 3: 1, 4: 2, 5: 2}


def test_window_distinct_users(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from rwcf.windows import window_distinct_users

    rng = np.random.default_rng(2)
    n = 2000
    df = pd.DataFrame({
        "user_id": rng.integers(0, 37, n),
        "ts": pd.to_datetime(rng.integers(0, 4 * 3600, n), unit="s"),
    })
    out = window_distinct_users(rd.from_pandas(df).repartition(6),
                                window_s=3600) \
        .to_pandas().sort_values("win_start", ignore_index=True)
    epoch = df["ts"].astype("int64") // 10 ** 9
    ref = df.assign(w=(epoch // 3600) * 3600) \
        .groupby("w")["user_id"].nunique()
    assert out["win_start"].tolist() == ref.index.tolist()
    assert out["n_users"].tolist() == ref.tolist()


def test_cohort_retention(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from rwcf.windows import cohort_retention

    D = 86400
    rows = [
        # u1: first day 0, returns day 1 and day 3
        (1, 0), (1, int(0.5 * D)), (1, D + 5), (1, 3 * D),
        # u2: first day 1 only
        (2, D + 10),
        # u3: first day 0, returns day 20 (beyond max_offset=14 -> cut)
        (3, 100), (3, 20 * D),
    ]
    df = pd.DataFrame({"user_id": [u for u, _ in rows],
                       "ts": pd.to_datetime([t for _, t in rows],
                                            unit="s")})
    out = cohort_retention(rd.from_pandas(df).repartition(3),
                           max_offset=14).to_pandas() \
        .sort_values(["cohort_day", "offset"], ignore_index=True)
    got = {(r["cohort_day"], r["offset"]): r["n_users"]
           for _, r in out.iterrows()}
    # cohort day0: u1+u3 at offset 0; u1 at offsets 1 and 3
    # cohort day1: u2 at offset 0; u3's day-20 return is cut
    assert got == {(0, 0): 2, (0, 1): 1, (0, 3): 1, (D, 0): 1}


def test_moving_range_sum(ray_session):
    # trailing RANGE window vs an O(n^2) brute force, with duplicated
    # timestamps (peers must be in-frame regardless of tie order) and a
    # NaN value (adds 0 to sums, still counts toward n_win)
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from rwcf.windows import moving_range_sum

    rng = np.random.default_rng(11)
    n = 400
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 9, n),
        "ts": pd.to_datetime(rng.integers(0, 5_000, n), unit="s"),
        "value": np.round(rng.normal(0, 5, n), 3),
    })
    # same-second peers inside one key
    df.loc[1, ["user_id", "ts"]] = df.loc[0, ["user_id", "ts"]]
    df.loc[2, "value"] = np.nan
    R = 600
    out = moving_range_sum(rd.from_pandas(df).repartition(5), range_s=R) \
        .to_pandas().sort_values("event_id", ignore_index=True)
    sec = df["ts"].to_numpy().astype("datetime64[s]").astype(np.int64)
    v1000 = np.where(np.isnan(df["value"].to_numpy()), 0,
                     np.floor(df["value"].to_numpy() * 1000)).astype(np.int64)
    uid = df["user_id"].to_numpy()
    exp_n = np.empty(n, np.int64)
    exp_s = np.empty(n, np.int64)
    for i in range(n):
        m = (uid == uid[i]) & (sec >= sec[i] - R) & (sec <= sec[i])
        exp_n[i] = m.sum()
        exp_s[i] = v1000[m].sum()
    assert (out["n_win"].to_numpy() == exp_n).all()
    assert (out["win_sum1000"].to_numpy() == exp_s).all()
    assert len(out) == n


def test_moving_range_sum_zero_range(ray_session):
    # range_s=0: the frame is exactly the same-second peers of the row
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from rwcf.windows import moving_range_sum

    df = pd.DataFrame({
        "event_id": np.arange(5, dtype=np.int64),
        "user_id": np.array([1, 1, 1, 2, 2], dtype=np.int64),
        "ts": pd.to_datetime([10, 10, 40, 10, 11], unit="s"),
        "value": np.array([1.0, 2.0, 4.0, 8.0, 16.0]),
    })
    out = moving_range_sum(rd.from_pandas(df), range_s=0) \
        .to_pandas().sort_values("event_id", ignore_index=True)
    assert out["n_win"].tolist() == [2, 2, 1, 1, 1]
    assert out["win_sum1000"].tolist() == [3000, 3000, 4000, 8000, 16000]


def test_event_deltas(ray_session):
    # LAG gaps vs pandas groupby-diff, incl. duplicate timestamps and the
    # NULL-at-first-event rule
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from rwcf.windows import event_deltas

    rng = np.random.default_rng(13)
    n = 300
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 11, n),
        "ts": pd.to_datetime(rng.integers(0, 4_000, n), unit="s"),
    })
    df.loc[1, ["user_id", "ts"]] = df.loc[0, ["user_id", "ts"]]
    out = event_deltas(rd.from_pandas(df).repartition(4)) \
        .to_pandas().sort_values("event_id", ignore_index=True)
    ref = df.sort_values(["user_id", "ts", "event_id"]).copy()
    sec = ref["ts"].to_numpy().astype("datetime64[s]").astype(np.int64)
    ref["gap_s"] = pd.Series(sec, index=ref.index).groupby(
        ref["user_id"]).diff()
    ref = ref.sort_values("event_id", ignore_index=True)
    exp = ref["gap_s"].to_numpy()
    got = out["gap_s"].to_numpy(dtype=float, na_value=np.nan)
    assert np.isnan(got).tolist() == np.isnan(exp).tolist()
    m = ~np.isnan(exp)
    assert (got[m] == exp[m]).all()
    assert len(out) == n


def test_rows_window_sum(ray_session):
    # ROWS frame = exactly last N+1 rows of the (ts, id) order, ties NOT
    # peer-inclusive (unlike RANGE); vs pandas rolling on the sorted order
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from rwcf.windows import rows_window_sum

    rng = np.random.default_rng(17)
    n = 300
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 7, n),
        "ts": pd.to_datetime(rng.integers(0, 2_000, n), unit="s"),
        "value": np.round(rng.normal(0, 5, n), 3),
    })
    df.loc[1, ["user_id", "ts"]] = df.loc[0, ["user_id", "ts"]]
    P = 4
    out = rows_window_sum(rd.from_pandas(df).repartition(4), preceding=P) \
        .to_pandas().sort_values("event_id", ignore_index=True)
    ref = df.sort_values(["user_id", "ts", "event_id"]).copy()
    ref["v1000"] = np.floor(ref["value"].to_numpy() * 1000).astype(np.int64)
    g = ref.groupby("user_id")["v1000"]
    ref["win_sum1000"] = g.rolling(P + 1, min_periods=1).sum() \
        .reset_index(level=0, drop=True).astype(np.int64)
    ref["n_win"] = g.rolling(P + 1, min_periods=1).count() \
        .reset_index(level=0, drop=True).astype(np.int64)
    ref = ref.sort_values("event_id", ignore_index=True)
    assert out["n_win"].tolist() == ref["n_win"].tolist()
    assert out["win_sum1000"].tolist() == ref["win_sum1000"].tolist()


def test_latest_event_per_key(ray_session):
    # max by (raw ts, id) per key — incl. a same-second pair whose id
    # order disagrees with the sub-second ts order (the floored-seconds
    # trap), and a NaN value
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from rwcf.windows import latest_event_per_key

    rng = np.random.default_rng(41)
    n = 200
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 8, n),
        "ts": pd.to_datetime(rng.integers(0, 3_000_000_000, n), unit="us"),
        "value": np.round(rng.normal(0, 5, n), 3),
    })
    # same user, same floored second, LATER raw ts on the SMALLER id
    df.loc[0, ["user_id", "ts"]] = [0, pd.Timestamp(1_500_000_700, unit="us")]
    df.loc[1, ["user_id", "ts"]] = [0, pd.Timestamp(1_500_000_200, unit="us")]
    df.loc[2, "value"] = np.nan
    out = latest_event_per_key(rd.from_pandas(df).repartition(5)) \
        .to_pandas().sort_values("user_id", ignore_index=True)
    ref = df.sort_values(["user_id", "ts", "event_id"]) \
        .groupby("user_id").tail(1).sort_values("user_id",
                                                ignore_index=True)
    assert out["event_id"].tolist() == ref["event_id"].tolist()
    sec = ref["ts"].to_numpy().astype("datetime64[s]").astype(np.int64)
    assert out["last_ts_s"].tolist() == sec.tolist()
    v = ref["value"].to_numpy()
    exp_v = np.where(np.isnan(v), 0, np.floor(v * 1000)).astype(np.int64)
    assert out["v1000"].tolist() == exp_v.tolist()
    assert len(out) == df["user_id"].nunique()


def test_latest_event_ns_subsecond_ties(ray_session):
    # timestamp[ns] input: two events in the same MICROSECOND where the
    # later raw-ns event has the smaller id — the native-unit tick carry
    # must pick the later raw ts (a microsecond-floored carry would fall
    # back to the id tie-break and pick the wrong row)
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from rwcf.windows import latest_event_per_key

    ts = pd.to_datetime(
        np.array([1_000_000_900, 1_000_000_200, 500_000_000],
                 dtype=np.int64), unit="ns")
    df = pd.DataFrame({
        "event_id": np.array([3, 7, 9], dtype=np.int64),
        "user_id": np.array([1, 1, 1], dtype=np.int64),
        "ts": ts.astype("datetime64[ns]"),
        "value": np.array([1.0, 2.0, 3.0]),
    })
    out = latest_event_per_key(rd.from_pandas(df).repartition(3)) \
        .to_pandas()
    assert len(out) == 1
    assert out.iloc[0]["event_id"] == 3     # later ns tick wins over id 7
    assert out.iloc[0]["last_ts_s"] == 1
    assert out.iloc[0]["v1000"] == 1000


def test_window_sums_null_values(ray_session):
    # declared NULL rule across the window family: NULL/NaN adds 0 to
    # sums, the row still counts / gets a frame slot
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from rwcf.windows import (moving_range_sum, rows_window_sum,
                              tumbling_window_aggregate)

    df = pd.DataFrame({
        "event_id": np.arange(4, dtype=np.int64),
        "user_id": np.zeros(4, dtype=np.int64),
        "ts": pd.to_datetime([0, 10, 20, 5000], unit="s"),
        "value": [np.nan, 2.0, np.nan, np.nan],
    })
    ds = rd.from_pandas(df)
    mr = moving_range_sum(ds, range_s=3600).to_pandas() \
        .sort_values("event_id", ignore_index=True)
    assert mr["n_win"].tolist() == [1, 2, 3, 1]
    assert mr["win_sum1000"].tolist() == [0, 2000, 2000, 0]
    rw = rows_window_sum(ds, preceding=1).to_pandas() \
        .sort_values("event_id", ignore_index=True)
    assert rw["win_sum1000"].tolist() == [0, 2000, 2000, 0]
    tw = tumbling_window_aggregate(ds, window_s=3600).to_pandas() \
        .sort_values("win", ignore_index=True)
    assert tw["n"].tolist() == [3, 1]
    assert tw["v1000"].tolist() == [2000, 0]


def test_first_event_per_key(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from rwcf.windows import first_event_per_key

    ts = pd.to_datetime([10, 5, 5, 30, 20], unit="s", utc=False)
    df = pd.DataFrame({
        "event_id": np.array([1, 2, 3, 4, 5], dtype=np.int64),
        "user_id": np.array([7, 7, 7, 8, 8], dtype=np.int64),
        "ts": ts,
        "value": [1.0, 2.0, 3.0, np.nan, 4.0],
    })
    out = first_event_per_key(rd.from_pandas(df).repartition(3)) \
        .to_pandas().set_index("user_id").sort_index()
    # user 7: ts tie at 5s -> smaller event_id (2) wins
    assert out.loc[7, "event_id"] == 2
    assert out.loc[7, "first_ts_s"] == 5
    assert out.loc[7, "v1000"] == 2000
    # user 8: earliest is event 5 at 20s, value 4.0
    assert out.loc[8, "event_id"] == 5
    assert out.loc[8, "v1000"] == 4000


def test_event_transitions(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from rwcf.windows import event_transitions

    # user 1: a->b->a (ts tie at 20 broken by event_id); user 2: c->c
    df = pd.DataFrame({
        "event_id": np.array([1, 2, 3, 4, 5], dtype=np.int64),
        "user_id": np.array([1, 1, 1, 2, 2], dtype=np.int64),
        "ts": pd.to_datetime([10, 20, 20, 5, 9], unit="s"),
        "event_type": ["a", "b", "a", "c", "c"],
    })
    out = event_transitions(rd.from_pandas(df).repartition(3)) \
        .to_pandas()
    got = {(r.from_type, r.to_type): r.n for r in out.itertuples()}
    assert got == {("a", "b"): 1, ("b", "a"): 1, ("c", "c"): 1}


def test_time_since_event(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from rwcf.windows import time_since_event

    # user 1: purchase@10, view@25, purchase@30, click@30 (id order
    # puts the purchase row BEFORE the click at equal ts), view@50;
    # user 2: view@5 only (no prior purchase anywhere)
    df = pd.DataFrame({
        "event_id": np.array([1, 2, 3, 4, 5, 6], dtype=np.int64),
        "user_id": np.array([1, 1, 1, 1, 1, 2], dtype=np.int64),
        "ts": pd.to_datetime([10, 25, 30, 30, 50, 5], unit="s"),
        "event_type": ["purchase", "view", "purchase", "click",
                       "view", "view"],
    })
    out = time_since_event(rd.from_pandas(df).repartition(3),
                           match_type="purchase").to_pandas() \
        .set_index("event_id").sort_index()
    # event 1 (the first purchase) has no PRIOR purchase -> omitted
    # event 2: 25-10; event 3 (purchase): prior purchase@10 -> 20
    # event 4 (click@30, after purchase@30 in row order): 0
    # event 5: since purchase@30 -> 20; user 2 omitted entirely
    assert out.index.tolist() == [2, 3, 4, 5]
    assert out["secs_since"].tolist() == [15, 20, 0, 20]


def test_session_conversion_oracle(ray_session):
    import duckdb
    import ray.data as rd

    from rwcf.windows import session_conversion
    sf = "/root/testdata/sf0.001"
    ev = rd.read_parquet(f"{sf}/events.parquet",
                         columns=["user_id", "ts", "event_type"])
    out = session_conversion(ev, gap_s=1800, buckets=8).to_pandas() \
        .sort_values("user_id", ignore_index=True)
    exp = duckdb.sql(
        f"WITH x AS (SELECT user_id, event_type, ts, event_id, "
        f"CASE WHEN lag(ts) OVER w IS NULL OR "
        f"CAST(floor(epoch(ts)) AS BIGINT) - "
        f"CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800 "
        f"THEN 1 ELSE 0 END AS ns "
        f"FROM read_parquet('{sf}/events.parquet') "
        f"WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
        f"y AS (SELECT user_id, event_type, sum(ns) OVER "
        f"(PARTITION BY user_id ORDER BY ts, event_id "
        f"ROWS UNBOUNDED PRECEDING) AS sid FROM x), "
        f"z AS (SELECT user_id, sid, max(CASE WHEN "
        f"event_type = 'purchase' THEN 1 ELSE 0 END) AS conv "
        f"FROM y GROUP BY 1, 2) "
        f"SELECT user_id, count(*) AS ns, sum(conv) AS nc "
        f"FROM z GROUP BY 1 ORDER BY 1").df()
    assert out["user_id"].tolist() == exp["user_id"].astype("int64").tolist()
    assert out["n_sessions"].tolist() == exp["ns"].astype("int64").tolist()
    assert out["n_converted"].tolist() == exp["nc"].astype("int64").tolist()


def test_session_conversion_synthetic(ray_session):
    # two users; u1 has two sessions (one converted), u2 one session
    # with no conversion; gap boundary exactly AT the threshold stays
    # in-session (strict > splits)
    import pyarrow as pa
    import ray.data as rd

    from rwcf.windows import session_conversion
    base = 1_700_000_000
    t = pa.table({
        "user_id": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "ts": pa.array(
            [(base + s) * 1_000_000 for s in (0, 1800, 10_000, 0, 50)],
            pa.timestamp("us")),
        "event_type": pa.array(
            ["view", "purchase", "click", "view", "view"])})
    out = session_conversion(rd.from_arrow(t), gap_s=1800,
                             buckets=4).to_pandas() \
        .sort_values("user_id", ignore_index=True)
    assert out["user_id"].tolist() == [1, 2]
    assert out["n_sessions"].tolist() == [2, 1]
    assert out["n_converted"].tolist() == [1, 0]


def test_peak_concurrency_oracle(ray_session):
    import duckdb
    import ray.data as rd

    from rwcf.windows import peak_concurrency
    sf = "/root/testdata/sf0.001"
    ev = rd.read_parquet(f"{sf}/events.parquet",
                         columns=["user_id", "ts", "event_id"])
    out = peak_concurrency(ev, gap_s=1800, buckets=8)
    exp = duckdb.sql(
        f"WITH x AS (SELECT user_id, ts, event_id, "
        f"CASE WHEN lag(ts) OVER w IS NULL OR "
        f"CAST(floor(epoch(ts)) AS BIGINT) - "
        f"CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800 "
        f"THEN 1 ELSE 0 END AS ns "
        f"FROM read_parquet('{sf}/events.parquet') "
        f"WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
        f"y AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS es, "
        f"sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id "
        f"ROWS UNBOUNDED PRECEDING) AS sid FROM x), "
        f"s AS (SELECT user_id, sid, min(es) AS t0, max(es) AS t1 "
        f"FROM y GROUP BY 1, 2), "
        f"b AS (SELECT t0 AS t, 1 AS d FROM s "
        f"UNION ALL SELECT t1, -1 FROM s), "
        f"r AS (SELECT t, sum(d) OVER (ORDER BY t, d DESC "
        f"ROWS UNBOUNDED PRECEDING) AS c FROM b), "
        f"m AS (SELECT max(c) AS peak FROM r) "
        f"SELECT m.peak AS peak, min(r.t) AS at_ts FROM r, m "
        f"WHERE r.c = m.peak GROUP BY m.peak").df()
    assert out["peak"].tolist() == exp["peak"].astype("int64").tolist()
    assert out["at_ts"].tolist() == exp["at_ts"].astype("int64").tolist()


def test_peak_concurrency_synthetic(ray_session):
    # three users: u1 [0, 100], u2 [50, 150], u3 [150, 200] (each user's
    # events merge into one session at gap 1800). Sweep in (t, +1-first)
    # order: +1(0) +1(50) -1(100) +1(150) -1(150) -1(200) -> running
    # 1,2,1,2,1,0 -> peak 2, first reached at t=50.

    import pyarrow as pa
    import ray.data as rd

    from rwcf.windows import peak_concurrency
    base = 1_700_000_000
    rows = [(1, 0), (1, 100), (2, 50), (2, 150), (3, 150), (3, 200)]
    t = pa.table({
        "user_id": pa.array([u for u, _ in rows], pa.int64()),
        "ts": pa.array([(base + s) * 1_000_000 for _, s in rows],
                       pa.timestamp("us"))})
    out = peak_concurrency(rd.from_arrow(t), gap_s=1800, buckets=4)
    assert out["peak"].tolist() == [2]
    assert out["at_ts"].tolist() == [base + 50]


def test_windowed_pair_join_oracle(ray_session):
    import duckdb
    import ray.data as rd

    from rwcf.windows import windowed_pair_join
    sf = "/root/testdata/sf0.001"
    ev = rd.read_parquet(f"{sf}/events.parquet",
                         columns=["user_id", "ts", "event_type"])
    out = windowed_pair_join(ev, window_s=14400, buckets=8).to_pandas() \
        .sort_values("user_id", ignore_index=True)
    exp = duckdb.sql(
        f"SELECT a.user_id, count(*) AS n FROM "
        f"(SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ea "
        f"FROM read_parquet('{sf}/events.parquet') "
        f"WHERE event_type = 'purchase') a "
        f"JOIN (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS eb "
        f"FROM read_parquet('{sf}/events.parquet') "
        f"WHERE event_type = 'error') b "
        f"ON a.user_id = b.user_id AND b.eb > a.ea "
        f"AND b.eb - a.ea <= 14400 GROUP BY 1 ORDER BY 1").df()
    assert out["user_id"].tolist() == exp["user_id"].astype("int64").tolist()
    assert out["n_pairs"].tolist() == exp["n"].astype("int64").tolist()


def test_windowed_pair_join_boundaries(ray_session):
    # strictly-after (same-second pair does NOT count), inclusive at
    # exactly window_s, pairs multiply (2 froms x 1 to = 2)
    import pyarrow as pa
    import ray.data as rd

    from rwcf.windows import windowed_pair_join
    base = 1_700_000_000
    rows = [(1, 0, "purchase"), (1, 0, "error"),      # same second: no
            (1, 10, "purchase"), (1, 310, "error"),   # +300 inclusive
            (2, 0, "purchase"), (2, 5, "purchase"),
            (2, 100, "error"),                        # 2 pairs
            (3, 0, "error"), (3, 10, "purchase")]     # error first: no
    t = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([(base + r[1]) * 1_000_000 for r in rows],
                       pa.timestamp("us")),
        "event_type": pa.array([r[2] for r in rows])})
    out = windowed_pair_join(rd.from_arrow(t), window_s=300,
                             buckets=4).to_pandas() \
        .sort_values("user_id", ignore_index=True)
    assert out["user_id"].tolist() == [1, 2]
    assert out["n_pairs"].tolist() == [1, 2]


def test_top_event_paths_oracle(ray_session):
    import duckdb
    import ray.data as rd

    from rwcf.windows import top_event_paths
    sf = "/root/testdata/sf0.001"
    ev = rd.read_parquet(f"{sf}/events.parquet",
                         columns=["user_id", "ts", "event_type",
                                  "event_id"])
    out = top_event_paths(ev, n=3, k=10, buckets=8).to_pandas() \
        .sort_values("rank", ignore_index=True)
    exp = duckdb.sql(
        f"WITH g AS (SELECT lag(event_type, 2) OVER w AS p1, "
        f"lag(event_type, 1) OVER w AS p2, event_type AS p3, "
        f"lag(user_id, 2) OVER w AS u1 "
        f"FROM read_parquet('{sf}/events.parquet') "
        f"WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
        f"p AS (SELECT p1 || '>' || p2 || '>' || p3 AS path, "
        f"count(*) AS n FROM g WHERE u1 IS NOT NULL GROUP BY 1) "
        f"SELECT path, n FROM p ORDER BY n DESC, path LIMIT 10").df()
    assert out["path"].tolist() == exp["path"].tolist()
    assert out["n_occurrences"].tolist() == \
        exp["n"].astype("int64").tolist()


def test_median_gap_per_user_oracle(ray_session):
    import duckdb
    import ray.data as rd

    from rwcf.windows import median_gap_per_user
    sf = "/root/testdata/sf0.001"
    ev = rd.read_parquet(f"{sf}/events.parquet",
                         columns=["user_id", "ts"])
    out = median_gap_per_user(ev, buckets=8).to_pandas() \
        .sort_values("user_id", ignore_index=True)
    exp = duckdb.sql(
        f"WITH d AS (SELECT user_id, "
        f"CAST(floor(epoch(ts)) AS BIGINT) - "
        f"CAST(floor(epoch(lag(ts) OVER (PARTITION BY user_id "
        f"ORDER BY ts, event_id))) AS BIGINT) AS gap "
        f"FROM read_parquet('{sf}/events.parquet')), "
        f"r AS (SELECT user_id, gap, row_number() OVER "
        f"(PARTITION BY user_id ORDER BY gap) AS rn, "
        f"count(*) OVER (PARTITION BY user_id) AS n FROM d "
        f"WHERE gap IS NOT NULL) "
        f"SELECT user_id, n, gap FROM r "
        f"WHERE rn = greatest(1, CAST(ceil(0.5 * n) AS BIGINT)) "
        f"ORDER BY 1").df()
    assert out["user_id"].tolist() == exp["user_id"].astype("int64").tolist()
    assert out["n_gaps"].tolist() == exp["n"].astype("int64").tolist()
    assert out["median_gap_s"].tolist() == \
        exp["gap"].astype("int64").tolist()
