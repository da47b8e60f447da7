"""Temporal join operators (operators/temporal.py): brute-force pandas
replicas of as-of join / banded range join / hypertable rollup /
group linkage on the sf0.001 events + synthetic fixtures, plus plan pins
proving the scale shapes (no nested-loop joins, single-window as-of)."""

import pandas as pd
import pyspark.sql.functions as F
import pytest

from bayesianrecordlinkage_jl_spark.operators import temporal as TP
from bayesianrecordlinkage_jl_spark.operators.fusion import group_linkage

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF}/events.parquet")


def _pd_events():
    return pd.read_parquet(f"{SF}/events.parquet")


def test_asof_join_matches_bruteforce(spark, events):
    out = TP.asof_join(
        events.where(F.col("event_type") == "error"),
        events.where(F.col("event_type") == "click"),
        key="user_id", ts_col="ts", id_col="event_id",
        carry_cols=["event_id", "value"],
    ).toPandas().sort_values("event_id", ignore_index=True)

    ev = _pd_events()
    errs = ev[ev.event_type == "error"]
    clicks = ev[ev.event_type == "click"]
    # all left rows appear exactly once, matched or not
    assert len(out) == len(errs)
    byid = out.set_index("event_id")
    n_null = 0
    for _, e in errs.iterrows():
        cand = clicks[(clicks.user_id == e.user_id) & (clicks.ts <= e.ts)]
        row = byid.loc[e.event_id]
        if len(cand) == 0:
            assert pd.isna(row.asof_event_id) and pd.isna(row.asof_gap_us)
            n_null += 1
        else:
            # most recent; ts ties resolve to the largest click event_id
            best = cand.sort_values(["ts", "event_id"]).iloc[-1]
            assert row.asof_event_id == best.event_id
            assert row.asof_value == best.value
            assert row.asof_gap_us == (
                (e.ts.value - best.ts.value) // 1000  # pandas ns -> us
            )
    assert n_null > 0  # fixture exercises the unmatched branch


def test_asof_join_plan_is_single_window_no_join(spark, events):
    out = TP.asof_join(
        events.where(F.col("event_type") == "error"),
        events.where(F.col("event_type") == "click"),
        key="user_id", ts_col="ts", id_col="event_id",
        carry_cols=["value"],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # carry-forward union, never a range join
    assert plan.count("Window") == 1


def test_asof_same_ts_right_row_is_visible(spark):
    # a click at EXACTLY the error's ts must be picked (<= semantics),
    # and among same-ts clicks the larger event_id wins
    rows = [
        (1, "2024-01-01 00:00:10", 100, "click", 1.0),
        (2, "2024-01-01 00:00:10", 100, "click", 2.0),
        (3, "2024-01-01 00:00:10", 100, "error", 0.0),
        (4, "2024-01-01 00:00:09", 100, "error", 0.0),
    ]
    from datetime import datetime

    df = spark.createDataFrame(
        [(i, datetime.fromisoformat(t), u, k, v) for i, t, u, k, v in rows],
        "event_id long, ts timestamp_ntz, user_id long, event_type string, value double",
    )
    out = TP.asof_join(
        df.where(F.col("event_type") == "error"),
        df.where(F.col("event_type") == "click"),
        key="user_id", ts_col="ts", id_col="event_id",
        carry_cols=["event_id"],
    ).toPandas().set_index("event_id")
    assert out.loc[3].asof_event_id == 2  # same-ts, larger id wins
    assert out.loc[3].asof_gap_us == 0
    assert pd.isna(out.loc[4].asof_event_id)  # strictly before any click


def test_range_join_matches_bruteforce(spark, events):
    delta = 7200
    out = TP.range_join(
        events.where(F.col("event_type") == "click"),
        events.where(F.col("event_type") == "error"),
        key="user_id", ts_col="ts", id_col="event_id", delta_s=delta,
    ).toPandas()
    ev = _pd_events()
    clicks = ev[ev.event_type == "click"]
    errs = ev[ev.event_type == "error"]
    exp = clicks.merge(errs, on="user_id", suffixes=("_l", "_r"))
    exp["gap_us"] = exp.ts_r.values.astype("datetime64[us]").astype(
        "int64"
    ) - exp.ts_l.values.astype("datetime64[us]").astype("int64")
    exp = exp[exp.gap_us.abs() <= delta * 1_000_000]
    a = set(map(tuple, out[["id_l", "id_r", "gap_us"]].itertuples(index=False)))
    b = set(map(tuple, exp[["event_id_l", "event_id_r", "gap_us"]].itertuples(index=False)))
    assert a == b and len(a) > 0
    # each qualifying pair emitted exactly once (bucket membership is unique)
    assert len(out) == len(exp)


def test_range_join_plan_is_equi_join(spark, events):
    out = TP.range_join(
        events.where(F.col("event_type") == "click"),
        events.where(F.col("event_type") == "error"),
        key="user_id", ts_col="ts", id_col="event_id", delta_s=7200,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_hypertable_rollup_matches_bruteforce(spark, events):
    out = TP.hypertable_rollup(events, "ts", "event_type", "value").toPandas()
    ev = _pd_events()
    ev["day"] = ev.ts.dt.floor("D")
    ev["_cents"] = (ev.value * 100 + 0.5).apply(lambda x: int(x // 1))
    fine = ev.groupby(["day", "event_type"], as_index=False).agg(
        n_events=("event_id", "size"), sum_value_cents=("_cents", "sum")
    )
    g0 = out[out.grain == 0]
    assert len(g0) == len(fine)
    m = g0.merge(fine, left_on=["day", "event_type"],
                 right_on=["day", "event_type"], suffixes=("", "_e"))
    assert (m.n_events == m.n_events_e).all()
    assert (m.sum_value_cents == m.sum_value_cents_e).all()
    # grain 1 = per-day totals, grain 2 = grand total; sums telescope
    g1, g2 = out[out.grain == 1], out[out.grain == 2]
    assert len(g1) == ev.day.nunique() and len(g2) == 1
    assert g1.n_events.sum() == len(ev) == int(g2.n_events.iloc[0])
    assert (
        g0.sum_value_cents.sum()
        == g1.sum_value_cents.sum()
        == int(g2.sum_value_cents.iloc[0])
        == ev._cents.sum()
    )


def test_group_linkage_bruteforce(spark):
    edges = spark.createDataFrame(
        [(1, 11), (2, 12), (3, 13), (1, 21), (11, 21)],
        "id_a long, id_b long",
    )
    members = spark.createDataFrame(
        [(i, "A") for i in (1, 2, 3)]
        + [(i, "B") for i in (11, 12, 13)]
        + [(21, "C")],
        "doc_id long, source string",
    )
    out = (
        group_linkage(edges, members, "doc_id", "source")
        .toPandas()
        .set_index(["group_a", "group_b"])
        .sort_index()
    )
    # A-B: 3 cross edges, min size 3 -> 10000; A-C: 1 edge / min 1 -> 10000;
    # B-C: 1 edge / min 1 -> 10000; no within-group rows
    assert set(out.index) == {("A", "B"), ("A", "C"), ("B", "C")}
    assert out.loc[("A", "B")].n_edges == 3
    assert out.loc[("A", "B")].score_bp == 10000
    assert out.loc[("A", "C")].n_docs_a == 3
    assert out.loc[("A", "C")].n_docs_b == 1


def _iv(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_id long, s_us long, e_us long"
    )


def test_interval_join_matches_bruteforce(spark, events):
    ev = _pd_events()
    ev["s_us"] = ev.ts.values.astype("datetime64[us]").astype("int64")
    ev["e_us"] = ev.s_us + (ev.value * 60).apply(lambda x: int(x // 1)) * 1_000_000

    def side(t):
        sub = ev[ev.event_type == t]
        return spark.createDataFrame(
            sub[["user_id", "event_id", "s_us", "e_us"]]
        )

    out = TP.interval_join(
        side("view"), side("purchase"),
        key="user_id", id_col="event_id",
        start_col="s_us", end_col="e_us", bucket_s=3600,
    ).toPandas()
    v = ev[ev.event_type == "view"]
    p = ev[ev.event_type == "purchase"]
    exp = v.merge(p, on="user_id", suffixes=("_l", "_r"))
    exp = exp[(exp.s_us_l < exp.e_us_r) & (exp.s_us_r < exp.e_us_l)]
    exp["overlap_us"] = exp[["e_us_l", "e_us_r"]].min(axis=1) - exp[
        ["s_us_l", "s_us_r"]
    ].max(axis=1)
    a = set(map(tuple, out[["id_l", "id_r", "overlap_us"]].itertuples(index=False)))
    b = set(map(tuple, exp[["event_id_l", "event_id_r", "overlap_us"]].itertuples(index=False)))
    assert a == b and len(a) > 0
    # exactly-once emit (first-shared-bucket filter, no dedup pass)
    assert len(out) == len(exp)


def test_interval_join_boundaries(spark):
    B = 10  # bucket_s=10 -> 10_000_000 us buckets
    left = _iv(spark, [
        (1, 1, 0, 25_000_000),          # spans buckets 0,1,2
        (1, 2, 5_000_000, 5_000_000),   # EMPTY interval: matches nothing
        (1, 3, 30_000_000, 40_000_000), # exactly bucket 3
    ])
    right = _iv(spark, [
        (1, 10, 24_999_999, 26_000_000),  # overlaps id 1 by 1us
        (1, 11, 25_000_000, 26_000_000),  # half-open: does NOT touch id 1
        (1, 12, 0, 50_000_000),           # overlaps 1 and 3, not empty 2
        (1, 13, 40_000_000, 41_000_000),  # end-boundary: not id 3
    ])
    out = TP.interval_join(
        left, right, key="user_id", id_col="event_id",
        start_col="s_us", end_col="e_us", bucket_s=B,
    ).toPandas()
    pairs = set(map(tuple, out[["id_l", "id_r"]].itertuples(index=False)))
    assert pairs == {(1, 10), (1, 12), (3, 12)}
    # each pair exactly once despite sharing several buckets with id 12
    assert len(out) == 3
    ov = out.set_index(["id_l", "id_r"]).overlap_us
    assert ov.loc[(1, 10)] == 1
    assert ov.loc[(1, 12)] == 25_000_000
    assert ov.loc[(3, 12)] == 10_000_000


def test_interval_join_plan_is_equi_join(spark):
    left = _iv(spark, [(1, 1, 0, 5)])
    right = _iv(spark, [(1, 2, 0, 5)])
    out = TP.interval_join(
        left, right, key="user_id", id_col="event_id",
        start_col="s_us", end_col="e_us", bucket_s=10,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_event_bursts_hand_series(spark):
    """Hand series: steady 2/hour baseline then a 10x spike; history
    gating (no flag before min_hist observed buckets) and gap semantics
    (empty buckets absent from the baseline)."""
    import datetime as dt

    from bayesianrecordlinkage_jl_spark.operators import temporal as TP

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # hours 0..4: 2 events each; hour 5: 20 events (burst);
    # hour 9 (after a 3h gap): 2 events (not a burst)
    for h, n in [(0, 2), (1, 2), (2, 2), (3, 2), (4, 2), (5, 20), (9, 2)]:
        for i in range(n):
            rows.append((eid, base + dt.timedelta(hours=h, minutes=i), "x"))
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string")
    got = {
        r["win_start"].hour: (r["base_n"], r["base_sum"], r["is_burst"])
        for r in TP.event_bursts(df).collect()
    }
    assert got[0] == (0, 0, 0)          # no history
    assert got[1] == (1, 2, 0)          # below min_hist
    assert got[2] == (2, 4, 0)
    assert got[3] == (3, 6, 0)          # enough history, not a burst
    assert got[5] == (5, 10, 1)         # 20 * 5 > 3 * 10 -> burst
    # hour 9: baseline is the previous OBSERVED buckets (gap skipped)
    assert got[9] == (6, 30, 0)


def test_event_bursts_determinism(spark):
    from bayesianrecordlinkage_jl_spark.operators import temporal as TP

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    a = TP.event_bursts(ev.repartition(3)).orderBy("event_type", "win_start").collect()
    b = TP.event_bursts(ev.repartition(13)).orderBy("event_type", "win_start").collect()
    assert a == b and len(a) > 0


def test_event_props_stats_null_and_malformed(spark):
    """Missing keys, malformed JSON and non-numeric values become NULL
    (counted in n_events but not n_with_key) instead of poisoning the
    integer stats."""
    from bayesianrecordlinkage_jl_spark.operators import temporal as TP

    rows = [
        (0, "a", '{"k": 5}'),
        (1, "a", '{"k": 7}'),
        (2, "a", '{"other": 1}'),    # missing key
        (3, "a", "not json"),        # malformed
        (4, "a", '{"k": "xx"}'),     # non-numeric
        (5, "b", '{"k": -3}'),
    ]
    df = spark.createDataFrame(rows, "event_id long, event_type string, props string")
    got = {
        r["event_type"]: (
            r["n_events"], r["n_with_key"], r["k_min"], r["k_max"],
            r["k_sum"], r["k_distinct"],
        )
        for r in TP.event_props_stats(df).collect()
    }
    assert got["a"] == (5, 2, 5, 7, 12, 2)
    assert got["b"] == (1, 1, -3, -3, -3, 1)
