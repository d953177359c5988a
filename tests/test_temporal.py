"""asof_join / range_join vs independent references (pandas.merge_asof
and a naive cross-filter) on seeded random data, plus semantics edges:
direction, inclusivity, tolerance, tiebreak, keyless bucket-carry, bounds.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from zdb_spark.operators.temporal import asof_enrich, asof_join, range_join


def _mk(spark, seed=7, n_left=400, n_right=300, n_keys=5):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame({
        "k": rng.integers(0, n_keys, n_left),
        "ts": rng.integers(0, 100_000, n_left),
        "lv": rng.normal(size=n_left).round(3),
    })
    right = pd.DataFrame({
        "k": rng.integers(0, n_keys, n_right),
        "ts": rng.integers(0, 100_000, n_right),
        "rv": rng.normal(size=n_right).round(3),
    })
    # merge_asof demands unique-ish ordering; drop (k, ts) dupes on the
    # right so "latest right row" is well-defined in both engines.
    right = right.drop_duplicates(["k", "ts"])
    return left, right


def _pandas_asof(left, right, by, direction, exact, tolerance=None):
    lp = left.sort_values("ts", kind="mergesort").reset_index(drop=True)
    rp = (right.sort_values("ts", kind="mergesort").reset_index(drop=True)
          .rename(columns={"ts": "r_ts", "rv": "r_rv"}))
    out = pd.merge_asof(
        lp, rp, left_on="ts", right_on="r_ts",
        by=by if by else None, direction=direction,
        allow_exact_matches=exact,
        tolerance=tolerance)
    return out


def _canon(pdf):
    cols = sorted(pdf.columns)
    return (pdf.reindex(cols, axis=1)
            .sort_values(cols, kind="mergesort", na_position="first")
            .reset_index(drop=True))


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("exact", [True, False])
def test_asof_keyed_matches_pandas(spark, direction, exact):
    left, right = _mk(spark)
    got = asof_join(spark.createDataFrame(left),
                    spark.createDataFrame(right),
                    on="ts", by="k", direction=direction,
                    allow_exact_matches=exact).toPandas()
    want = _pandas_asof(left, right, "k", direction, exact)
    pd.testing.assert_frame_equal(
        _canon(got), _canon(want), check_dtype=False, atol=1e-9)


def test_asof_tolerance_and_inner(spark):
    left, right = _mk(spark, seed=11)
    got = asof_join(spark.createDataFrame(left),
                    spark.createDataFrame(right),
                    on="ts", by="k", tolerance=500).toPandas()
    want = _pandas_asof(left, right, "k", "backward", True, tolerance=500)
    pd.testing.assert_frame_equal(
        _canon(got), _canon(want), check_dtype=False, atol=1e-9)

    inner = asof_join(spark.createDataFrame(left),
                      spark.createDataFrame(right),
                      on="ts", by="k", tolerance=500,
                      how="inner").toPandas()
    assert len(inner) == want["r_ts"].notna().sum()
    assert inner["r_ts"].notna().all()


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_global_bucket_carry(spark, direction):
    """Keyless path with a bucket far smaller than the span, so matches
    must cross many bucket boundaries (exercises the carry-in rows)."""
    left, right = _mk(spark, seed=23)
    left, right = left.drop(columns="k"), right.drop(columns="k")
    right = right.drop_duplicates(["ts"])
    got = asof_join(spark.createDataFrame(left),
                    spark.createDataFrame(right),
                    on="ts", direction=direction,
                    bucket=1000).toPandas()
    want = _pandas_asof(left, right, None, direction, True)
    pd.testing.assert_frame_equal(
        _canon(got), _canon(want), check_dtype=False, atol=1e-9)


def test_asof_global_sparse_buckets(spark):
    """Carry-in must survive LONG gaps: empty buckets between the only
    right row and the left rows."""
    left = pd.DataFrame({"ts": [10, 5_000_000, 9_999_999], "lv": [1., 2., 3.]})
    right = pd.DataFrame({"ts": [5], "rv": [42.0]})
    got = (asof_join(spark.createDataFrame(left),
                     spark.createDataFrame(right),
                     on="ts", bucket=100)
           .toPandas().sort_values("ts").reset_index(drop=True))
    assert got["r_rv"].tolist() == [42.0, 42.0, 42.0]
    assert got["r_ts"].tolist() == [5, 5, 5]


def test_asof_tiebreak_deterministic(spark):
    """Two right rows share (k, ts): the larger tiebreak column wins."""
    left = pd.DataFrame({"k": [1], "ts": [100], "lv": [0.0]})
    right = pd.DataFrame({"k": [1, 1], "ts": [90, 90], "rv": [1.0, 9.0]})
    got = asof_join(spark.createDataFrame(left),
                    spark.createDataFrame(right),
                    on="ts", by="k", tiebreak="rv").toPandas()
    assert got["r_rv"].tolist() == [9.0]


def test_asof_keyless_carry_honors_tiebreak(spark):
    """Keyless path, carried match: two right rows share the SAME ts in
    an earlier bucket; the cross-bucket carry must pick the larger
    tiebreak exactly like the in-bucket window does (review finding:
    the carry aggregate ranked on ts alone, nondeterministic)."""
    left = pd.DataFrame({"ts": [250], "lv": [0.0]})
    right = pd.DataFrame({"ts": [90, 90], "rv": [1.0, 9.0]})
    got = asof_join(spark.createDataFrame(left),
                    spark.createDataFrame(right),
                    on="ts", tiebreak="rv", bucket=100).toPandas()
    # left at bucket 2, right rows in bucket 0 -> pure carry-in match
    assert got["r_rv"].tolist() == [9.0]


def test_asof_null_right_payload_not_skipped(spark):
    """A right row whose PAYLOAD is null is still the match (struct-last,
    not per-column last)."""
    left = pd.DataFrame({"k": [1], "ts": [100], "lv": [0.0]})
    right = pd.DataFrame({"k": [1, 1], "ts": [50, 90],
                          "rv": [7.0, None]})
    got = asof_join(spark.createDataFrame(left),
                    spark.createDataFrame(right),
                    on="ts", by="k").toPandas()
    assert got["r_ts"].tolist() == [90]
    assert pd.isna(got["r_rv"]).all()


@pytest.mark.parametrize("exact", [True, False])
def test_asof_enrich_agrees_with_asof_join(spark, exact):
    """The broadcast-array formulation and the union+window formulation
    are independent implementations of the same semantics."""
    left, right = _mk(spark, seed=31)
    l, r = spark.createDataFrame(left), spark.createDataFrame(right)
    got = asof_enrich(l, r, on="ts", by="k",
                      allow_exact_matches=exact).toPandas()
    want = asof_join(l, r, on="ts", by="k",
                     allow_exact_matches=exact).toPandas()
    pd.testing.assert_frame_equal(
        _canon(got), _canon(want), check_dtype=False, atol=1e-9)


def test_asof_enrich_keyless(spark):
    left, right = _mk(spark, seed=37)
    left, right = left.drop(columns="k"), right.drop(columns="k").drop_duplicates(["ts"])
    l, r = spark.createDataFrame(left), spark.createDataFrame(right)
    got = asof_enrich(l, r, on="ts").toPandas()
    want = asof_join(l, r, on="ts", bucket=5000).toPandas()
    pd.testing.assert_frame_equal(
        _canon(got), _canon(want), check_dtype=False, atol=1e-9)


def test_asof_enrich_streaming(spark, tmp_path):
    """The SAME operator call runs on a readStream source (stateless
    stream-static broadcast join) and matches the batch result."""
    left, right = _mk(spark, seed=41, n_left=200)
    l, r = spark.createDataFrame(left), spark.createDataFrame(right)
    src = str(tmp_path / "src")
    l.write.parquet(src)
    stream = spark.readStream.schema(l.schema).parquet(src)
    out = str(tmp_path / "out")
    q = (asof_enrich(stream, r, on="ts", by="k")
         .writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    got = spark.read.parquet(out).toPandas()
    want = asof_enrich(l, r, on="ts", by="k").toPandas()
    pd.testing.assert_frame_equal(
        _canon(got), _canon(want), check_dtype=False, atol=1e-9)


def _mk_range(seed=5, n_points=500, n_iv=60, n_keys=4):
    rng = np.random.default_rng(seed)
    points = pd.DataFrame({
        "k": rng.integers(0, n_keys, n_points),
        "ts": rng.integers(0, 50_000, n_points),
        "pv": np.arange(n_points),
    })
    lo = rng.integers(0, 45_000, n_iv)
    intervals = pd.DataFrame({
        "k": rng.integers(0, n_keys, n_iv),
        "lo": lo,
        "hi": lo + rng.integers(0, 8_000, n_iv),
        "iv_id": np.arange(n_iv),
    })
    return points, intervals


def _naive_range(points, intervals, by, bounds):
    out = points.merge(intervals, on=by, how="inner") if by else \
        points.merge(intervals, how="cross")
    lo_ok = out.ts >= out.lo if bounds[0] == "[" else out.ts > out.lo
    hi_ok = out.ts <= out.hi if bounds[1] == "]" else out.ts < out.hi
    return out[lo_ok & hi_ok].reset_index(drop=True)


@pytest.mark.parametrize("bounds", ["[]", "[)", "(]", "()"])
def test_range_join_matches_naive(spark, bounds):
    points, intervals = _mk_range()
    got = range_join(spark.createDataFrame(points),
                     spark.createDataFrame(intervals),
                     on="ts", by="k", bucket=1000,
                     bounds=bounds).toPandas()
    want = _naive_range(points, intervals, ["k"], bounds)
    pd.testing.assert_frame_equal(
        _canon(got), _canon(want), check_dtype=False)


def test_range_join_keyless_and_left(spark):
    points, intervals = _mk_range(seed=9)
    points, intervals = points.drop(columns="k"), intervals.drop(columns="k")
    got = range_join(spark.createDataFrame(points),
                     spark.createDataFrame(intervals),
                     on="ts", bucket=700).toPandas()
    want = _naive_range(points, intervals, None, "[]")
    pd.testing.assert_frame_equal(
        _canon(got[want.columns]), _canon(want), check_dtype=False)

    left = range_join(spark.createDataFrame(points),
                      spark.createDataFrame(intervals),
                      on="ts", bucket=700, how="left").toPandas()
    # every point survives at least once; uncovered points carry nulls
    assert set(left["pv"]) == set(points["pv"])
    uncovered = set(points["pv"]) - set(want["pv"])
    assert set(left.loc[left["iv_id"].isna(), "pv"]) == uncovered


def test_asof_plan_no_join_single_exchange(spark):
    """The keyed as-of plan must contain NO join node and exactly one
    Exchange (the by-key hash partitioning) — the whole point of the
    union+window formulation."""
    left, right = _mk(spark)
    df = asof_join(spark.createDataFrame(left),
                   spark.createDataFrame(right), on="ts", by="k")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "CartesianProduct" not in plan
    assert plan.count("Exchange") == 1
    assert "Window" in plan


def test_range_join_no_cartesian_plan(spark):
    points, intervals = _mk_range()
    df = range_join(spark.createDataFrame(points),
                    spark.createDataFrame(intervals),
                    on="ts", by="k", bucket=1000)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


class TestFunnel:
    def test_three_step_hand_built(self, spark):
        from zdb_spark.operators.temporal import funnel

        rows = [
            # u1 full funnel inside windows
            (1, "view", 100), (1, "click", 150), (1, "purchase", 180),
            # u2 clicks too late after view (window 40)
            (2, "view", 100), (2, "click", 200), (2, "purchase", 210),
            # u3 purchase BEFORE click: order violated
            (3, "view", 100), (3, "purchase", 110), (3, "click", 120),
            # u4 most-recent-anchor: old view in window, NEWER view also
            # in window -> still qualifies via the newer anchor
            (4, "view", 100), (4, "view", 130), (4, "click", 160),
        ]
        df = spark.createDataFrame(rows, "user_id long, event_type string, ts long")
        out = {r["step"]: r for r in
               funnel(df, ["view", "click", "purchase"], "ts", "user_id",
                      within=40).collect()}
        assert out["view"]["n_users"] == 4 and out["view"]["n_events"] == 5
        # qualifying clicks: u1@150 (view@100 is 50 away? NO -> check),
        # window 40: u1 click 150 - view 100 = 50 > 40 -> u1 fails!
        # u4 click 160 - view 130 = 30 <= 40 qualifies; u3 click 120 - 100
        # = 20 qualifies
        assert out["click"]["n_users"] == 2          # u3, u4
        assert out["purchase"]["n_users"] == 0       # u3's purchase precedes
        out2 = {r["step"]: r for r in
                funnel(df, ["view", "click", "purchase"], "ts", "user_id",
                       within=60).collect()}
        # u2's click is 100 after its view — outside even the 60 window
        assert out2["click"]["n_users"] == 3
        assert out2["purchase"]["n_users"] == 1      # only u1 in order

    def test_single_event_shuffle_plan(self, spark):
        """Pin the one-shuffle window-stack plan (r18 optimization):
        every transition's most-recent-anchor lookup is a window over
        ONE ``hashpartitioning(user_id)`` exchange — N steps stack N-1
        Window operators on the same partitioning+ordering with no
        additional event shuffle (the only other exchanges belong to
        the final distinct-count aggregate and the tiny spine join)."""
        from zdb_spark.operators.temporal import funnel

        rows = [(u, t, ts) for u in range(20) for t, ts in
                [("a", u), ("b", u + 100), ("a", u + 200)]]
        df = spark.createDataFrame(
            rows, "user_id long, event_type string, ts long")
        out = funnel(df, ["a", "b", "a"], "ts", "user_id", within=1000)
        out.collect()
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan          # AQE finalized
        # the adaptive toString appends an "== Initial Plan ==" section
        # that duplicates every node — pin the FINAL plan only
        plan = plan.split("== Initial Plan ==")[0]
        # exactly ONE exchange keyed by the user column alone: the
        # window stack's; anchor windows never re-shuffle the events
        user_exchanges = [
            ln for ln in plan.splitlines()
            if "Exchange hashpartitioning(user_id" in ln
            and "ReusedExchange" not in ln]
        assert len(user_exchanges) == 1, plan
        # both transitions' anchor windows are present, stacked
        assert plan.count("windowspecdefinition(user_id") >= 2

    def test_validation_and_no_window(self, spark):
        from zdb_spark.operators.temporal import funnel

        df = spark.createDataFrame([(1, "a", 1)],
                                   "user_id long, event_type string, ts long")
        import pytest as _pytest
        with _pytest.raises(ValueError):
            funnel(df, [], "ts", "user_id")
        out = funnel(df, ["a", "b"], "ts", "user_id").collect()
        got = {r["step"]: r["n_events"] for r in out}
        assert got == {"a": 1, "b": 0}


class TestDecayedAvg:
    def test_hand_computed(self, spark):
        import math

        from zdb_spark.operators.temporal import decayed_avg

        hl, at = 10, 100
        rows = [("A", 100, 4.0),   # weight 1
                ("A", 90, 8.0),    # weight 0.5
                ("A", 80, 16.0),   # weight 0.25
                ("A", 110, 999.0),  # after `at` -> excluded
                ("B", 100, 7.0)]
        df = spark.createDataFrame(rows, "sym string, ts long, value double")
        got = {r["sym"]: r for r in
               decayed_avg(df, "ts", "sym", "value",
                           half_life=hl, at=at).collect()}
        # A: (4*1 + 8*.5 + 16*.25) / 1.75 = 12/1.75
        assert got["A"]["decayed_avg"] == round(12 / 1.75, 6)
        assert got["A"]["w_sum"] == 1.75 and got["A"]["n"] == 3
        assert got["B"]["decayed_avg"] == 7.0 and got["B"]["n"] == 1
        assert math.isclose(got["A"]["decayed_sum"], 12.0)

    def test_order_independent(self, spark):
        from zdb_spark.operators.temporal import decayed_avg

        rows = [("A", t, float(t % 7)) for t in range(0, 1000, 3)]
        df = spark.createDataFrame(rows, "sym string, ts long, value double")
        a = decayed_avg(df, "ts", "sym", "value",
                        half_life=100, at=999).collect()
        b = decayed_avg(df.orderBy("ts", ascending=False).repartition(7),
                        "ts", "sym", "value",
                        half_life=100, at=999).collect()
        assert a == b

    def test_validation_and_global(self, spark):
        from zdb_spark.operators.temporal import decayed_avg

        df = spark.createDataFrame([("A", 1, 2.0)],
                                   "sym string, ts long, value double")
        with pytest.raises(ValueError, match="half_life"):
            decayed_avg(df, "ts", "sym", "value", half_life=0, at=10)
        out = decayed_avg(df, "ts", None, "value",
                          half_life=10, at=1).collect()
        assert len(out) == 1 and out[0]["decayed_avg"] == 2.0


class TestRateAnomaly:
    def test_hand_computed_zscores(self, spark):
        import math

        from zdb_spark.operators.temporal import rate_anomaly

        counts = [8, 12, 9, 11, 10, 30]   # bucket b gets counts[b] events
        rows = [("A", b * 100 + i) for b, c in enumerate(counts)
                for i in range(c)]
        df = spark.createDataFrame(rows, "event_type string, ts long")
        out = {r["bucket"]: r for r in
               rate_anomaly(df, "ts", "event_type", bucket=100,
                            trailing=24, min_periods=4).collect()}
        assert [out[b]["n_events"] for b in range(6)] == counts
        # first 4 buckets: < min_periods trailing obs -> NULL z
        assert all(out[b]["zscore"] is None for b in range(4))
        m4, s4 = 10.0, math.sqrt((4 + 4 + 1 + 1) / 3)
        assert out[4]["baseline_mean"] == 10.0
        assert out[4]["zscore"] == round((10 - m4) / s4, 6)
        m5 = sum(counts[:5]) / 5
        s5 = math.sqrt(sum((c - m5) ** 2 for c in counts[:5]) / 4)
        assert out[5]["zscore"] == round((30 - m5) / s5, 6)

    def test_constant_rate_and_gaps(self, spark):
        from zdb_spark.operators.temporal import rate_anomaly

        # constant counts -> flat baseline -> z = 0.0 exactly (matching
        # the baseline is NOT the insufficient-history NULL); a spike
        # over that flat baseline reports the capped +-1e9 sentinel; a
        # bucket gap NARROWS the trailing sample (no silent slide-in)
        rows = [("A", b * 10 + i) for b in [0, 1, 2, 3, 4, 9]
                for i in range(5)]
        rows += [("B", b * 10 + i) for b in [0, 1, 2]
                 for i in range(5)]
        rows += [("B", 30 + i) for i in range(9)]   # 9-event spike, std=0
        df = spark.createDataFrame(rows, "event_type string, ts long")
        out = {(r["event_type"], r["bucket"]): r for r in
               rate_anomaly(df, "ts", "event_type", bucket=10,
                            trailing=3, min_periods=2).collect()}
        assert out[("A", 4)]["zscore"] == 0.0    # flat AND on-baseline
        assert out[("B", 3)]["zscore"] == 1e9    # flat baseline, spike
        # bucket 9's trailing 3 range [6,8] is empty -> no baseline
        assert out[("A", 9)]["baseline_mean"] is None
        assert out[("A", 9)]["zscore"] is None   # insufficient history
        with pytest.raises(ValueError, match="trailing"):
            rate_anomaly(df, "ts", "event_type", trailing=0)


class TestRetention:
    def test_hand_built_cohorts(self, spark):
        from zdb_spark.operators.temporal import retention

        P = 10  # tiny period for hand-checkable buckets
        rows = [
            (1, 5), (1, 12), (1, 25),   # cohort 0, offsets {0,1,2}
            (2, 15), (2, 17),           # cohort 1, offset {0} (same period)
            (3, 21), (3, 45),           # cohort 2, offsets {0,2}
        ]
        df = spark.createDataFrame(rows, "user_id long, ts long")
        got = {(r["cohort"], r["period_offset"]): r["n_active"]
               for r in retention(df, "ts", "user_id", period=P).collect()}
        assert got == {(0, 0): 1, (0, 1): 1, (0, 2): 1,
                       (1, 0): 1,
                       (2, 0): 1, (2, 2): 1}


class TestUserPaths:
    def test_paths_and_truncation(self, spark):
        from zdb_spark.operators.temporal import user_paths

        rows = [(1, "a", 1), (1, "b", 2), (1, "c", 3),
                (2, "a", 5), (2, "b", 9),
                (3, "a", 1), (3, "b", 2), (3, "c", 3), (3, "d", 4)]
        df = spark.createDataFrame(rows, "user_id long, event_type string, ts long")
        got = {r["path"]: r["n_users"] for r in
               user_paths(df, "ts", "user_id", "event_type",
                          max_len=3).collect()}
        # u3's 4th event truncates away -> same path as u1
        assert got == {"a>b>c": 2, "a>b": 1}

    def test_tie_break_deterministic(self, spark):
        from zdb_spark.operators.temporal import user_paths

        # two events at the SAME ts: step value orders them
        df = spark.createDataFrame([(1, "z", 5), (1, "a", 5)],
                                   "user_id long, event_type string, ts long")
        out = user_paths(df, "ts", "user_id", "event_type").collect()
        assert out[0]["path"] == "a>z"

    def test_plan_two_exchanges_and_group_limit(self, spark):
        """Pin the scale plan: ONE shuffle on user (shared by the window
        and the collect_list aggregate) + ONE on the path aggregate, and
        Spark's WindowGroupLimit enforcing max_len map-side BEFORE the
        shuffle — a hot user is bounded on the mapper, not after the
        network."""
        from zdb_spark.operators.temporal import user_paths

        df = spark.createDataFrame([(1, "a", 1), (1, "b", 2), (2, "a", 3)],
                                   "user_id long, event_type string, ts long")
        plan = (user_paths(df, "ts", "user_id", "event_type", max_len=3)
                ._jdf.queryExecution().executedPlan().toString())
        assert plan.count("Exchange hashpartitioning") == 2
        assert "WindowGroupLimit" in plan
        assert "TakeOrderedAndProject" in plan    # top-k, not global sort

    def test_hot_user_bounded(self, spark):
        from zdb_spark.operators.temporal import user_paths

        # One bot account with 100k events: the row_number pre-filter
        # must keep only max_len rows per user before any collect_list,
        # so no 100k-element aggregation buffer ever exists.  The first
        # three events (ts 0,1,2) are a,b,c; the 99,997-event tail is
        # noise that must not appear in the path.
        hot = (spark.range(100_000)
               .selectExpr("1 AS user_id",
                           "CASE id WHEN 0 THEN 'a' WHEN 1 THEN 'b' "
                           "WHEN 2 THEN 'c' ELSE 'noise' END AS event_type",
                           "id AS ts"))
        cold = spark.createDataFrame([(2, "a", 7)],
                                     "user_id long, event_type string, ts long")
        out = user_paths(hot.unionByName(cold), "ts", "user_id",
                         "event_type", max_len=3)
        got = {r["path"]: r["n_users"] for r in out.collect()}
        assert got == {"a>b>c": 1, "a": 1}
        # the plan must contain the bounding filter on the row number,
        # i.e. a Window node BELOW the aggregate, not a bare collect of
        # every event
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        assert "row_number" in plan
