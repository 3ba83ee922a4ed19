"""Unit tests for the time-series operators (resample/rolling/EWMA).

The oracle-parity suite covers ts_resample_gapfill / ts_rolling_stats
end-to-end; these pin the primitives on hand-built fixtures, including
the EWMA recurrence (rows-only in the registry).
"""

from __future__ import annotations

import datetime as dt

import pytest


def _ts(minute):
    return dt.datetime(2024, 1, 1, 0, minute)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # user 1: events in hours 0 and 2 (hour 1 is a gap)
        (1, dt.datetime(2024, 1, 1, 0, 10), 1.0, 101),
        (1, dt.datetime(2024, 1, 1, 0, 50), 2.0, 102),
        (1, dt.datetime(2024, 1, 1, 2, 5), 3.0, 103),
        # user 2: single event
        (2, dt.datetime(2024, 1, 1, 5, 0), 10.0, 201),
    ]
    return spark.createDataFrame(rows, ["user_id", "ts", "value", "event_id"])


def test_resample_gapfill_zero_fills_missing_buckets(spark, events):
    from dask_obj_spark.operators.timeseries import resample_gapfill

    out = {
        (r.user_id, r.bucket_start): (r.n_events, r.sum_value)
        for r in resample_gapfill(events, "user_id", "ts", "value", 3600).collect()
    }
    base = int(dt.datetime(2024, 1, 1).replace(tzinfo=dt.timezone.utc).timestamp())
    # user 1 spans hours 0..2 -> exactly 3 rows, hour 1 zero-filled
    u1 = {k[1] - k[1] % 3600: v for k, v in out.items() if k[0] == 1}
    assert len(u1) == 3
    hours = sorted(k for (u, k) in out if u == 1)
    assert hours[1] - hours[0] == 3600 and hours[2] - hours[1] == 3600
    assert out[(1, hours[0])] == (2, 3.0)
    assert out[(1, hours[1])] == (0, 0.0)
    assert out[(1, hours[2])] == (1, 3.0)
    # user 2: single bucket, no gaps
    assert len([k for k in out if k[0] == 2]) == 1


def test_rolling_stats_trailing_frame(spark, events):
    from dask_obj_spark.operators.timeseries import rolling_stats

    rows = {
        r.event_id: r
        for r in rolling_stats(events, "user_id", "ts", "event_id", "value", n=2).collect()
    }
    assert rows[101].roll_avg == 1.0 and rows[101].roll_n == 1
    assert rows[102].roll_avg == 1.5 and rows[102].roll_n == 2
    assert rows[103].roll_avg == 2.5  # trailing 2 of (2.0, 3.0)
    assert rows[101].gap_secs is None
    assert rows[102].gap_secs == 40 * 60
    assert rows[103].gap_secs == 75 * 60


def test_ewma_matches_hand_recurrence(spark, events):
    from dask_obj_spark.operators.timeseries import ewma

    out = {
        r.event_id: r.ewma
        for r in ewma(events, "user_id", "ts", "event_id", "value", alpha=0.5).collect()
    }
    # s1 = 1.0; s2 = .5*2 + .5*1 = 1.5; s3 = .5*3 + .5*1.5 = 2.25
    assert out[101] == 1.0
    assert out[102] == 1.5
    assert out[103] == 2.25
    assert out[201] == 10.0


def test_resample_gapfill_preserves_totals_and_has_no_holes(spark, events):
    # property: zero-filling never changes per-key totals, and the
    # bucket sequence per key is contiguous
    from dask_obj_spark.operators.timeseries import resample_gapfill

    out = resample_gapfill(events, "user_id", "ts", "value", 3600).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r.user_id, []).append(r)
    src = {(1): (3, 6.0), (2): (1, 10.0)}
    for uid, rows in by_user.items():
        buckets = sorted(r.bucket_start for r in rows)
        assert all(b2 - b1 == 3600 for b1, b2 in zip(buckets, buckets[1:]))
        n = sum(r.n_events for r in rows)
        s = sum(r.sum_value for r in rows)
        assert (n, s) == src[uid]


def test_sessionize_islands_splits_on_gap(spark):
    import datetime as dt
    from dask_obj_spark.operators.timeseries import sessionize_islands

    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 0), 1),
        (1, dt.datetime(2024, 1, 1, 0, 10), 2),   # same session (10 min)
        (1, dt.datetime(2024, 1, 1, 1, 0), 3),    # 50-min gap -> new session
        (1, dt.datetime(2024, 1, 1, 1, 20), 4),   # same session
        (2, dt.datetime(2024, 1, 1, 0, 0), 5),    # other user
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id"])
    out = {
        r.event_id: r.session_no
        for r in sessionize_islands(df, "user_id", "ts", "event_id", 1800).collect()
    }
    assert out == {1: 1, 2: 1, 3: 2, 4: 2, 5: 1}


def test_holt_linear_matches_hand_computed(spark):
    """Level/trend/forecast must replay the recurrence exactly on a
    small trending series, per key, in (ts, tiebreak) order."""
    from dask_obj_spark.operators.timeseries import holt_linear

    xs = [10.0, 12.0, 14.0, 17.0]
    rows = [(1, i, float(i), x) for i, x in enumerate(xs)]
    rows += [(2, 0, 0.0, 5.0), (2, 1, 1.0, 5.0)]
    df = spark.createDataFrame(rows, ["k", "i", "ts", "x"])
    got = {
        (r.k, r.i): (r.level, r.trend, r.fc_next)
        for r in holt_linear(df, "k", "ts", "i", "x", alpha=0.3, beta=0.1).collect()
    }
    lvl, tr = 10.0, 0.0
    want = [(round(lvl, 6), 0.0, round(lvl, 6))]
    for x in xs[1:]:
        new = 0.3 * x + 0.7 * (lvl + tr)
        tr = 0.1 * (new - lvl) + 0.9 * tr
        lvl = new
        want.append((round(lvl, 6), round(tr, 6), round(lvl + tr, 6)))
    for i in range(4):
        assert got[(1, i)] == want[i], (i, got[(1, i)], want[i])
    # constant series: level sticks, trend stays 0
    assert got[(2, 1)] == (5.0, 0.0, 5.0)


def test_holt_fixed_grid_buckets_and_recurrence(spark):
    """The grid companion: every key gets exactly `steps` rows
    (zero-filled buckets), step 1 level = bucket-1 count, and the
    quantized outputs replay the same recurrence as the raw loop."""
    import datetime as dt
    import math

    from dask_obj_spark.operators.timeseries import holt_fixed_grid

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # user 1: 3 events in bucket 0, 1 event near the end (bucket 7)
    for i in range(3):
        rows.append((1, 100 + i, t0 + dt.timedelta(seconds=i), 0.0))
    rows.append((1, 103, t0 + dt.timedelta(seconds=7999), 0.0))
    # user 2: single event at t0 (defines tmin; bucket 0)
    rows.append((2, 200, t0, 0.0))
    df = spark.createDataFrame(rows, ["user_id", "event_id", "ts", "value"])
    got = {
        (r.user_id, r.step): (r.level_u, r.trend_u, r.fc_u)
        for r in holt_fixed_grid(df, "user_id", "ts", steps=8).collect()
    }
    assert len(got) == 16  # 2 users x 8 zero-filled steps
    # replay user 1: grid = [3,0,0,0,0,0,0,1] (span 8000s → 1000s buckets)
    lvl, tr = 3.0, 0.0
    want = [(3000000, 0, 3000000)]
    for x in [0, 0, 0, 0, 0, 0, 1]:
        new = 0.3 * x + 0.7 * (lvl + tr)
        tr = 0.1 * (new - lvl) + 0.9 * tr
        lvl = new
        want.append(
            (
                math.floor(lvl * 1e6),
                math.floor(tr * 1e6),
                math.floor((lvl + tr) * 1e6),
            )
        )
    for s in range(1, 9):
        assert got[(1, s)] == want[s - 1], (s, got[(1, s)], want[s - 1])
    # user 2: one event in bucket 0, zeros after — decays toward 0
    assert got[(2, 1)] == (1000000, 0, 1000000)
    assert got[(2, 8)][0] < 1000000


def test_markov_transitions_hand_computed(spark):
    """Counts and micro-unit probabilities match the closed form on a
    hand-built two-user sequence; rows per from-state sum to ~1."""
    import datetime as dt

    from dask_obj_spark.operators.timeseries import markov_transitions

    t0 = dt.datetime(2024, 1, 1)
    seq1 = ["view", "view", "click", "view", "purchase"]
    seq2 = ["view", "click", "click"]
    rows = [(1, i, t0 + dt.timedelta(minutes=i), s) for i, s in enumerate(seq1)]
    rows += [(2, 100 + i, t0 + dt.timedelta(minutes=i), s)
             for i, s in enumerate(seq2)]
    df = spark.createDataFrame(rows, ["user_id", "event_id", "ts", "event_type"])
    got = {(r.s_from, r.s_to): (r.n, r.p_x1m)
           for r in markov_transitions(df, "user_id", "ts", "event_id",
                                       "event_type").collect()}
    # from view: view->view 1, view->click 2, view->purchase 1 (4 total)
    assert got[("view", "view")] == (1, 250_000)
    assert got[("view", "click")] == (2, 500_000)
    assert got[("view", "purchase")] == (1, 250_000)
    # from click: click->view 1, click->click 1
    assert got[("click", "view")] == (1, 500_000)
    assert got[("click", "click")] == (1, 500_000)
    assert ("purchase", "view") not in got  # terminal in this fixture


def test_rfm_features_scores_and_code(spark):
    """Aggregates match hand math; quintiles are deterministic with
    the id tiebreak; the code folds r/f/m digits."""
    import datetime as dt

    from dask_obj_spark.operators.timeseries import rfm_features

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for u in range(5):
        for i in range(u + 1):  # user u has u+1 events
            rows.append((u, t0 + dt.timedelta(days=u, minutes=i), float(u)))
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    got = {r.user_id: r for r in rfm_features(df, "user_id", "ts", "value").collect()}
    assert got[4].frequency == 5 and got[0].frequency == 1
    assert got[4].monetary_u == 5 * 4_000_000 and got[0].monetary_u == 0
    # user 4 is most recent, most frequent, highest spend -> 111
    assert (got[4].r_score, got[4].f_score, got[4].m_score) == (1, 1, 1)
    assert got[4].rfm == 111
    assert got[0].rfm == 555  # oldest, least frequent, lowest spend
    assert all(1 <= got[u].r_score <= 5 for u in got)


def test_top_paths_order_and_truncation(spark):
    """Paths assemble in time order regardless of layout, truncate at
    depth, and count keys per distinct path."""
    import datetime as dt

    from dask_obj_spark.operators.timeseries import top_paths

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for u, seq in ((1, ["view", "click", "purchase", "view"]),
                   (2, ["view", "click", "purchase"]),
                   (3, ["view"])):
        for i, s in enumerate(seq):
            rows.append((u, 10 * u + i, t0 + dt.timedelta(minutes=i), s))
    df = spark.createDataFrame(
        rows, ["user_id", "event_id", "ts", "event_type"]
    ).repartition(5)
    got = {r.path: r.n_keys
           for r in top_paths(df, "user_id", "ts", "event_id",
                              "event_type", 3).collect()}
    assert got == {"view>click>purchase": 2, "view": 1}


def test_burst_variance_guard_double_cast_survives_int64_overflow(spark):
    """ts_burst_detection's variance guard compares sc2*n vs sc*sc as
    DOUBLES: at 100 TB per-user volumes a raw BIGINT product overflows
    int64 — under Spark 4's default ANSI mode that CRASHES the whole
    query with ARITHMETIC_OVERFLOW (with ansi off it silently wraps and
    misfires the guard); doubles are exact below 2^53 so bench-scale
    decisions and hashes are unchanged (r13 review finding)."""
    import pytest
    from pyspark.sql import functions as F

    sc = 3_200_000_000  # sc*sc ≈ 1.02e19 > 2^63: overflows int64
    sc2 = 4_000_000_000_000_000_000  # sc2*n ≈ 1.2e19 > sc*sc: variance > 0
    df = spark.createDataFrame([(3, sc, sc2)], "n long, sc long, sc2 long")
    with pytest.raises(Exception, match="ARITHMETIC_OVERFLOW|overflow"):
        df.filter(F.col("sc2") * F.col("n") > F.col("sc") * F.col("sc")).count()
    safe = df.filter(
        F.col("sc2").cast("double") * F.col("n")
        > F.col("sc").cast("double") * F.col("sc")
    ).count()
    assert safe == 1  # the genuinely-positive-variance row survives

    # ADVICE r14: the z-score's own sc*sc term needs the same double
    # cast — with the guard fixed but zs still BIGINT*BIGINT, the row
    # PASSES the guard then zs overflows (crash under ANSI, garbage
    # without).  The shipped expression mirrors the guard's cast.
    cnt = 1_400_000_000
    zs_fixed = (F.col("cnt") - F.col("sc") / F.col("n").cast("double")) / F.sqrt(
        (
            F.col("sc2")
            - F.col("sc").cast("double") * F.col("sc") / F.col("n").cast("double")
        )
        / (F.col("n") - 1)
    )
    zdf = spark.createDataFrame(
        [(3, sc, sc2, cnt)], "n long, sc long, sc2 long, cnt long"
    )
    zs_broken = (F.col("cnt") - F.col("sc") / F.col("n").cast("double")) / F.sqrt(
        (F.col("sc2") - F.col("sc") * F.col("sc") / F.col("n").cast("double"))
        / (F.col("n") - 1)
    )
    with pytest.raises(Exception, match="ARITHMETIC_OVERFLOW|overflow"):
        zdf.select(zs_broken.alias("zs")).collect()
    [row] = zdf.select(zs_fixed.alias("zs")).collect()
    import math

    assert math.isfinite(row.zs)
