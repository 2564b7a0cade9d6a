"""Temporal join operators Spark lacks as built-ins: as-of join and banded
range join.

Both are expressed as compositions of existing DataFrame ops (SURVEY.md §2
"custom operators" path (a)) rather than UDFs, so they stay inside
whole-stage codegen:

- **as-of join** — the union+last-ignoring-nulls rewrite: tag both inputs,
  union them, and carry the most recent right-side row forward with a
  running ``last(..., ignorenulls=True)`` window per key. One shuffle on
  the join key, sort within partitions — the plan you want at 100 TB,
  where the naive inequality join (``l.ts >= r.ts``) degenerates into a
  per-key cross product.
- **range join** — a tiny literal band dimension broadcast against the
  fact table (BroadcastNestedLoopJoin on the band predicate). With a
  broadcast side of a few rows this is a scan-speed map-side join; no
  shuffle of the fact table at all until the final partial aggregation.

Oracle twins use DuckDB's native ASOF JOIN / theta join, proving the
rewrites equivalent to the canonical semantics.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from hls_payer_mrf_sparkstreaming_spark.operators.suite import (
    load,
    query,
    scratch_persist,
)


def asof_join_frames(left, right, on, ts_col="ts_us", right_cols=()):
    """Generic as-of join: for each left row, attach the latest right row
    with ``right.ts_col <= left.ts_col`` per ``on`` key.

    ``left`` and ``right`` must share ``on`` and ``ts_col``; ``right_cols``
    are the right-side payload columns carried onto matches (null when no
    right row precedes the left row). Right side should be pre-deduplicated
    to one row per (key, ts) for deterministic results.
    """
    lcols = [c for c in left.columns if c not in (on, ts_col)]
    l_tagged = left.select(
        on,
        ts_col,
        *lcols,
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in right_cols],
        F.lit(1).alias("_side"),
    )
    r_tagged = right.select(
        on,
        ts_col,
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *right_cols,
        F.lit(0).alias("_side"),
    )
    u = r_tagged.unionByName(l_tagged)
    # right rows sort before left rows at equal ts (_side 0 < 1), making the
    # match inclusive (left.ts >= right.ts), same as DuckDB ASOF semantics
    w = (
        Window.partitionBy(on)
        .orderBy(ts_col, "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # ONE last() over a struct of (ts, payload): every carried field comes
    # from the SAME matched right row. Per-column last(ignorenulls) would
    # fill a NULL payload column from an EARLIER right row than the match,
    # silently mixing rows — a divergence from DuckDB ASOF semantics for
    # nullable right columns.
    payload = F.when(
        F.col("_side") == 0,
        F.struct(
            F.col(ts_col).alias("_ts"),
            *[F.col(c).alias(c) for c in right_cols],
        ),
    )
    carried = u.withColumn("_r", F.last(payload, ignorenulls=True).over(w))
    return carried.filter(F.col("_side") == 1).select(
        on,
        ts_col,
        *lcols,
        F.col("_r._ts").alias("matched_ts_us"),
        *[F.col(f"_r.{c}").alias(c) for c in right_cols],
    )


@query(
    "asof_join",
    oracle="""
        WITH pur AS (
            SELECT user_id, ts, max(value) AS purchase_value FROM events
            WHERE event_type = 'purchase' GROUP BY user_id, ts
        ),
        clk AS (
            SELECT event_id, user_id, ts, value AS click_value FROM events
            WHERE event_type = 'click'
        )
        SELECT c.user_id,
               epoch_us(c.ts) AS ts_us,
               c.event_id,
               c.click_value,
               epoch_us(p.ts) AS matched_ts_us,
               p.purchase_value
        FROM clk c ASOF LEFT JOIN pur p
          ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
    description="as-of join: each click matched to the user's most recent "
    "preceding purchase — union + running last() rewrite (one shuffle on "
    "user_id, no inequality-join blowup); oracle is DuckDB's native ASOF "
    "LEFT JOIN",
)
def asof_join(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    # parquet ts is TIMESTAMP_NTZ; cast under the fixed UTC session tz so
    # unix_micros matches DuckDB's epoch_us (same pattern as sessionize)
    ts_us = F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us")
    clk = e.filter(F.col("event_type") == "click").select(
        "user_id",
        ts_us,
        "event_id",
        F.col("value").alias("click_value"),
    )
    pur = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("purchase_value"))
        .select("user_id", ts_us, "purchase_value")
    )
    return asof_join_frames(
        clk, pur, on="user_id", right_cols=("purchase_value",)
    )


_BANDS = [
    ("p00_050", 0.0, 50.0),
    ("p050_100", 50.0, 100.0),
    ("p100_200", 100.0, 200.0),
    ("p200_350", 200.0, 350.0),
    ("p350_inf", 350.0, 1e9),
]


def _bands_values_sql() -> str:
    rows = ", ".join(f"('{b}', {lo}, {hi})" for b, lo, hi in _BANDS)
    return f"(VALUES {rows}) AS r(band, lo, hi)"


@query(
    "range_join",
    oracle=f"""
        SELECT r.band,
               count(*) AS n_events,
               sum(CAST(round(e.value * 100) AS BIGINT)) / 100.0 AS sum_value
        FROM events e
        JOIN {_bands_values_sql()}
          ON e.value >= r.lo AND e.value < r.hi
        GROUP BY r.band
    """,
    description="banded range join: fact rows matched to literal value "
    "bands via broadcast nested-loop join (map-side, zero fact shuffle "
    "before the partial agg) — the scale pattern for interval/band "
    "dimension joins",
)
def range_join(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    bands = spark.createDataFrame(_BANDS, ["band", "lo", "hi"])
    joined = e.join(
        F.broadcast(bands),
        (e.value >= bands.lo) & (e.value < bands.hi),
    )
    return joined.groupBy("band").agg(
        F.count("*").alias("n_events"),
        (F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0).alias(
            "sum_value"
        ),
    )


@query(
    "attribution_join",
    oracle="""
        SELECT c.user_id,
               c.event_id AS click_id,
               p.event_id AS purchase_id,
               CAST(date_diff('microsecond', c.ts, p.ts) AS BIGINT) AS lag_us,
               p.value AS purchase_value
        FROM (SELECT * FROM events WHERE event_type = 'click') c
        JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
          ON c.user_id = p.user_id
         AND p.ts >= c.ts
         AND p.ts <= c.ts + INTERVAL 30 MINUTE
    """,
    description="attribution interval join: each click matched to the same "
    "user's purchases within 30 minutes — equi-join on user_id with a "
    "bounded time band, so the shuffle is keyed (never a per-user cross "
    "product beyond the band). The streaming twin "
    "(streaming/events.py attribution_stream) runs the identical join "
    "stream-to-stream with watermarks bounding both sides' state; "
    "tests/test_streaming_ops.py proves stream == batch",
)
def attribution_join(spark, sf_dir):
    e = load(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
        F.col("value").alias("purchase_value"),
    )
    return (
        clicks.join(
            purchases,
            (F.col("c_user") == F.col("p_user"))
            & (F.col("p_ts") >= F.col("c_ts"))
            & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 30 MINUTES")),
        )
        .select(
            F.col("c_user").alias("user_id"),
            "click_id",
            "purchase_id",
            (F.unix_micros("p_ts") - F.unix_micros("c_ts")).alias("lag_us"),
            "purchase_value",
        )
    )


@query(
    "scd2_intervals",
    oracle="""
        WITH h AS (
            SELECT user_id,
                   CAST(epoch_us(ts) AS BIGINT) AS ts_us,
                   event_type,
                   CAST(round(value * 100) AS BIGINT) AS value_cents,
                   row_number() OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS version,
                   lead(CAST(epoch_us(ts) AS BIGINT)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS valid_to_us
            FROM events WHERE event_type = 'purchase'
        )
        SELECT user_id, version, ts_us AS valid_from_us,
               coalesce(valid_to_us, 253402300800000000) AS valid_to_us,
               CAST(valid_to_us IS NULL AS BOOLEAN) AS is_current,
               value_cents
        FROM h
    """,
    description="SCD Type-2 history build: each user's purchase events "
    "become versioned validity intervals — valid_from = event time, "
    "valid_to = next event's time via lead(), open intervals closed with "
    "a far-future sentinel, is_current flag on the last version. One "
    "window per user partition over skinny rows; the standard "
    "slowly-changing-dimension snapshot a warehouse derives from CDC "
    "feeds, exact in integer microseconds/cents",
)
def scd2_intervals(spark, sf_dir):
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    far_future = 253402300800000000  # year 10000 in epoch micros
    h = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
            F.round(F.col("value") * 100).cast("long").alias("value_cents"),
            F.row_number().over(w).alias("version"),
            F.lead(F.unix_micros(F.col("ts").cast("timestamp"))).over(w).alias("valid_to_raw"),
        )
    )
    return h.select(
        "user_id",
        "version",
        F.col("ts_us").alias("valid_from_us"),
        F.coalesce("valid_to_raw", F.lit(far_future)).alias("valid_to_us"),
        F.col("valid_to_raw").isNull().alias("is_current"),
        "value_cents",
    )


@query(
    "event_funnel",
    oracle="""
        WITH v AS (
            SELECT user_id, min(ts) AS v_ts FROM events
            WHERE event_type = 'view' GROUP BY 1
        ),
        c AS (
            SELECT e.user_id, min(e.ts) AS c_ts
            FROM events e JOIN v USING (user_id)
            WHERE e.event_type = 'click' AND e.ts > v.v_ts
            GROUP BY 1
        ),
        p AS (
            SELECT e.user_id, min(e.ts) AS p_ts
            FROM events e JOIN c USING (user_id)
            WHERE e.event_type = 'purchase' AND e.ts > c.c_ts
            GROUP BY 1
        )
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM v) AS n_view_users,
               (SELECT CAST(count(*) AS BIGINT) FROM c) AS n_click_users,
               (SELECT CAST(count(*) AS BIGINT) FROM p) AS n_purchase_users
    """,
    description="strict ordered conversion funnel view -> click -> "
    "purchase: stage N counts users whose first qualifying stage-N event "
    "is strictly after their stage-(N-1) anchor. Each stage is a "
    "filtered-subset groupBy joined back on user_id — every shuffle "
    "carries only that stage's event rows keyed by user, the stages "
    "reuse the same hash partitioning, and the three 1-row stage counts "
    "cross-join at the end. The standard product-analytics funnel, "
    "expressed so no stage ever materializes per-user event lists",
)
def event_funnel(spark, sf_dir):
    from pyspark.sql import Window

    # r13: the three stage groupBys chained by user_id joins plus three
    # crossJoined count aggregates replanned the earlier stages' subtrees
    # repeatedly (12 jobs, events subtree instantiated up to 6x in the
    # final plan); the strict-ordering recurrence instead runs as three
    # conditional MIN windows over ONE user-partitioned pass — each
    # stage's anchor is constant per partition, so `ts > anchor` inside
    # the next window reproduces the join-then-filter exactly, including
    # the NULL (user never reached the stage) propagation. One scan with
    # the stage-type In-filter pushed, one exchange, no joins.
    ev = (
        load(spark, sf_dir, "events")
        .select("user_id", "event_type", "ts")
        .filter(F.col("event_type").isin("view", "click", "purchase"))
    )
    w = Window.partitionBy("user_id")
    s = (
        ev.withColumn(
            "v_ts",
            F.min(
                F.when(F.col("event_type") == "view", F.col("ts"))
            ).over(w),
        )
        .withColumn(
            "c_ts",
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & (F.col("ts") > F.col("v_ts")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "p_ts",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") > F.col("c_ts")),
                    F.col("ts"),
                )
            ).over(w),
        )
    )
    per_user = s.groupBy("user_id").agg(
        F.max("v_ts").alias("v_ts"),
        F.max("c_ts").alias("c_ts"),
        F.max("p_ts").alias("p_ts"),
    )
    return per_user.agg(
        F.count("v_ts").cast("long").alias("n_view_users"),
        F.count("c_ts").cast("long").alias("n_click_users"),
        F.count("p_ts").cast("long").alias("n_purchase_users"),
    )


@query(
    "cdc_apply_changelog",
    oracle="""
        SELECT user_id,
               ts AS last_ts,
               event_type AS last_op,
               CAST(round(value * 100) AS BIGINT) AS last_value_cents
        FROM (
            SELECT user_id, ts, event_type, value,
                   row_number() OVER (
                       PARTITION BY user_id
                       ORDER BY ts DESC, event_id DESC
                   ) AS rn
            FROM events
        )
        WHERE rn = 1 AND event_type <> 'error'
    """,
    description="CDC changelog application: treat events as a change "
    "stream keyed by user_id — the latest change wins (ts, then event_id "
    "as the deterministic tiebreak, standard for same-timestamp commits) "
    "and a terminal 'error' op deletes the row. This is the "
    "lakehouse MERGE-INTO/upsert compaction as a pure DataFrame op: one "
    "shuffle on the key, a per-key window that keeps state bounded by "
    "the partition (never a driver-side collect), survivors emitted with "
    "their final state in exact integer cents. Complements "
    "dedup_survivors (positional keep-lowest) and scd2_intervals (full "
    "history) with latest-wins-plus-deletes semantics",
)
def cdc_apply_changelog(spark, sf_dir):
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        load(spark, sf_dir, "events")
        .select("user_id", "ts", "event_type", "event_id", "value")
        .withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("event_type") != "error"))
        .select(
            "user_id",
            F.col("ts").alias("last_ts"),
            F.col("event_type").alias("last_op"),
            F.round(F.col("value") * 100)
            .cast("long")
            .alias("last_value_cents"),
        )
    )


_ROLL_US = 7 * 86400 * 1_000_000  # 7-day window in microseconds


@query(
    "rolling_user_spend",
    oracle=f"""
        SELECT user_id, ts,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w
                    AS BIGINT) AS spend_7d_cents,
               CAST(count(*) OVER w AS BIGINT) AS n_events_7d
        FROM events
        WINDOW w AS (
            PARTITION BY user_id
            ORDER BY epoch_us(ts)
            RANGE BETWEEN {_ROLL_US - 1} PRECEDING AND CURRENT ROW
        )
    """,
    description="rolling 7-day per-user spend and event count — the "
    "standard temporal feature-engineering shape for activity features. "
    "A RANGE window frame over the microsecond epoch (both engines order "
    "and bound on the same integer, so sub-second event collisions can "
    "never skew the frame) with exact integer cents. One shuffle on "
    "user_id, per-key ordered frame state bounded by the window span — "
    "never a per-user collect or a self-join, which is what this "
    "replaces at 100 TB",
)
def rolling_user_spend(spark, sf_dir):
    # ts is TIMESTAMP_NTZ: diff against a naive epoch literal rather than
    # unix_micros (TZ-typed only) — identical to DuckDB's epoch_us on a
    # naive timestamp, no session-timezone dependence
    ts_us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(ts_us)
        .rangeBetween(-(_ROLL_US - 1), 0)
    )
    return load(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .over(w)
        .cast("long")
        .alias("spend_7d_cents"),
        F.count("*").over(w).cast("long").alias("n_events_7d"),
    )


@query(
    "lag_features",
    oracle="""
        SELECT event_id, user_id,
               CAST(epoch_us(ts) AS BIGINT)
                   - lag(CAST(epoch_us(ts) AS BIGINT)) OVER w AS gap_us,
               CAST(round(value * 100) AS BIGINT)
                   - lag(CAST(round(value * 100) AS BIGINT)) OVER w
                   AS value_delta_cents
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    """,
    description="per-user lag features: inter-event gap and value delta vs "
    "the previous event — the standard sequence-feature shape for "
    "behavioral models. LAG over (user_id, event-time) with the order key "
    "as (integer epoch, event_id) so sub-second ties can never flip "
    "neighbors between engines; deltas in exact integer cents. One "
    "shuffle on user_id and O(1) window state per row — at 100 TB this "
    "replaces the per-user collect_list or self-join a naive "
    "previous-event lookup would cost",
)
def lag_features(spark, sf_dir):
    # ts is TIMESTAMP_NTZ: diff against a naive epoch literal (identical
    # to DuckDB's epoch_us on a naive timestamp — same pattern as
    # rolling_user_spend above)
    ts_us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)"
    ).cast("long")
    cents = F.round(F.col("value") * 100).cast("long")
    w = Window.partitionBy("user_id").orderBy(ts_us, "event_id")
    return load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        (ts_us - F.lag(ts_us).over(w)).alias("gap_us"),
        (cents - F.lag(cents).over(w)).alias("value_delta_cents"),
    )


_WEEK_US = 7 * 86400 * 1_000_000
_TS_US_SQL = (
    "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)"
)


@query(
    "retention_cohorts",
    oracle=f"""
        WITH wk AS (
            SELECT user_id,
                   CAST(epoch_us(ts) // {_WEEK_US} AS BIGINT) AS week
            FROM events
        ),
        cohort AS (
            SELECT user_id, min(week) AS cohort_week FROM wk GROUP BY user_id
        ),
        act AS (SELECT DISTINCT user_id, week FROM wk)
        SELECT c.cohort_week,
               a.week - c.cohort_week AS week_offset,
               CAST(count(*) AS BIGINT) AS active_users
        FROM act a JOIN cohort c USING (user_id)
        GROUP BY 1, 2
    """,
    description="cohort retention matrix: users grouped by first-activity "
    "week, counted in each subsequent week they return — the standard "
    "growth-analytics triangle. Week = integer microsecond-epoch div "
    "(engine-neutral; no date truncation or timezone semantics to "
    "disagree on). Plan: one groupBy user for the cohort anchor, one "
    "(user, week) distinct, then an equi-join on user_id — both sides "
    "already hash-partitioned on the same key, so the join adds no third "
    "shuffle — and a final partial-agg groupBy of (cohort, offset) pairs. "
    "Every shuffled row is two longs; per-user event lists never "
    "materialize, so a billion-user corpus costs three skinny digest "
    "shuffles",
)
def retention_cohorts(spark, sf_dir):
    wk = load(spark, sf_dir, "events").select(
        "user_id", F.expr(f"({_TS_US_SQL}) div {_WEEK_US}").alias("week")
    )
    cohort = wk.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    act = wk.distinct()
    return (
        act.join(cohort, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.count("*").cast("long").alias("active_users"))
    )


_EWMA_DEPTH = 8  # last 8 events; weight 2^(depth-1-age), exact integers


@query(
    "ewma_user_value",
    oracle=f"""
        WITH r AS (
            SELECT user_id,
                   CAST(round(value * 100) AS BIGINT) AS cents,
                   row_number() OVER (
                       PARTITION BY user_id
                       ORDER BY epoch_us(ts) DESC, event_id DESC
                   ) AS age
            FROM events
        )
        SELECT user_id,
               CAST(sum(cents * (1 << ({_EWMA_DEPTH} - age))) AS BIGINT)
                   AS ewma_num,
               CAST(sum(1 << ({_EWMA_DEPTH} - age)) AS BIGINT) AS ewma_den,
               CAST(count(*) AS BIGINT) AS n_events_used
        FROM r WHERE age <= {_EWMA_DEPTH}
        GROUP BY user_id
    """,
    description="exponentially-weighted recent-value feature per user: the "
    f"last {_EWMA_DEPTH} events weighted by powers of two (newest heaviest), "
    "emitted as an exact integer numerator/denominator pair — the "
    "half-life recency feature behavioral models consume, with zero "
    "floating point anywhere so the hash-compared output is "
    "engine-identical by construction (a float alpha^k EWMA is not: its "
    "sum order drifts under parallelism). Plan: one shuffle on user_id, "
    "a row_number window (O(1) state per row), filter to the top-"
    f"{_EWMA_DEPTH}, partial-agg groupBy on the same key — the window and "
    "the aggregation reuse one hash partitioning, and no per-user list is "
    "ever collected",
)
def ewma_user_value(spark, sf_dir):
    ts_us = F.expr(_TS_US_SQL).cast("long")
    w = Window.partitionBy("user_id").orderBy(
        ts_us.desc(), F.col("event_id").desc()
    )
    # F.shiftleft takes a Python-int bit count; the per-row count needs expr
    weight = F.expr(f"cast(shiftleft(1, {_EWMA_DEPTH} - age) as long)")
    return (
        load(spark, sf_dir, "events")
        .select(
            "user_id",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
            F.row_number().over(w).alias("age"),
        )
        .filter(F.col("age") <= _EWMA_DEPTH)
        .groupBy("user_id")
        .agg(
            F.sum(F.col("cents") * weight).cast("long").alias("ewma_num"),
            F.sum(weight).cast("long").alias("ewma_den"),
            F.count("*").cast("long").alias("n_events_used"),
        )
    )


_IVL_LEN_US = 30 * 60 * 1_000_000  # each event opens a 30-min activity span


@query(
    "interval_union_length",
    oracle=f"""
        WITH iv AS (
            SELECT user_id,
                   CAST(epoch_us(ts) AS BIGINT) AS s,
                   CAST(epoch_us(ts) AS BIGINT) + {_IVL_LEN_US} AS e
            FROM events
        ),
        runs AS (
            SELECT user_id, s, e,
                   max(e) OVER (
                       PARTITION BY user_id ORDER BY s, e
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ) AS reach
            FROM iv
        ),
        islands AS (
            SELECT user_id, s, e,
                   sum(CASE WHEN reach IS NULL OR s > reach
                            THEN 1 ELSE 0 END) OVER (
                       PARTITION BY user_id ORDER BY s, e
                       ROWS UNBOUNDED PRECEDING
                   ) AS island
            FROM runs
        ),
        merged AS (
            SELECT user_id, island, min(s) AS ms, max(e) AS me
            FROM islands GROUP BY user_id, island
        )
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n_spans,
               CAST(sum(me - ms) AS BIGINT) AS active_us
        FROM merged GROUP BY user_id
    """,
    description="interval union length: total ACTIVE time per user when "
    "every event opens a 30-minute span and overlapping spans must count "
    "once — the classic merge-overlapping-intervals problem (billed "
    "machine-hours, user active-time, sensor uptime). Solved with the "
    "islands technique: a running max of span ends (O(1) window state) "
    "marks gap starts, a running sum of gap flags numbers the islands, "
    "and one groupBy merges each island — never a self-join of intervals "
    "(quadratic per user) and never a per-user collect. One shuffle on "
    "user_id; the two windows and the merge reuse the same partitioning; "
    "all arithmetic is integer microseconds",
)
def interval_union_length(spark, sf_dir):
    ts_us = F.expr(_TS_US_SQL).cast("long")
    iv = load(spark, sf_dir, "events").select(
        "user_id",
        ts_us.alias("s"),
        (ts_us + _IVL_LEN_US).alias("e"),
    )
    w = Window.partitionBy("user_id").orderBy("s", "e")
    reach = F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    gap = F.when(reach.isNull() | (F.col("s") > reach), 1).otherwise(0)
    islands = iv.select(
        "user_id",
        "s",
        "e",
        F.sum(gap)
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("island"),
    )
    merged = islands.groupBy("user_id", "island").agg(
        F.min("s").alias("ms"), F.max("e").alias("me")
    )
    return merged.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_spans"),
        F.sum(F.col("me") - F.col("ms")).cast("long").alias("active_us"),
    )


@query(
    "event_transition_matrix",
    oracle="""
        WITH seq AS (
            SELECT user_id, event_type,
                   lag(event_type) OVER (
                       PARTITION BY user_id
                       ORDER BY epoch_us(ts), event_id
                   ) AS prev_type
            FROM events
        ),
        trans AS (
            SELECT prev_type, event_type AS next_type,
                   CAST(count(*) AS BIGINT) AS n
            FROM seq WHERE prev_type IS NOT NULL
            GROUP BY 1, 2
        )
        SELECT prev_type, next_type, n,
               CAST(n * 1000000 // sum(n) OVER (PARTITION BY prev_type)
                    AS BIGINT) AS prob_ppm
        FROM trans
    """,
    description="first-order Markov transition matrix over per-user event "
    "sequences: LAG pairs each event with its predecessor ((epoch, "
    "event_id) order key so ties can't flip neighbors), one partial-agg "
    "groupBy counts each (prev, next) pair, and row probabilities are "
    "exact integer ppm via a window over the BOUNDED K x K transition "
    "domain. The sequence-model feature extractor (and funnel-sanity "
    "check) for behavioral data; at 100 TB the only event-scale shuffle "
    "is the user_id window — the transition relation itself is K^2 rows "
    "regardless of corpus size",
)
def event_transition_matrix(spark, sf_dir):
    ts_us = F.expr(_TS_US_SQL).cast("long")
    w = Window.partitionBy("user_id").orderBy(ts_us, "event_id")
    seq = load(spark, sf_dir, "events").select(
        F.lag("event_type").over(w).alias("prev_type"),
        F.col("event_type").alias("next_type"),
    )
    trans = (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count("*").cast("long").alias("n"))
    )
    wrow = Window.partitionBy("prev_type")
    return trans.select(
        "prev_type",
        "next_type",
        "n",
        (F.col("n") * 1000000 / F.sum("n").over(wrow))
        .cast("long")
        .alias("prob_ppm"),
    )


_CHURN_US = 3 * 86400 * 1_000_000  # churned = no purchase in the last 3 days


@query(
    "churn_labels",
    oracle=f"""
        WITH horizon AS (
            SELECT max(epoch_us(ts)) AS h FROM events
        ),
        per AS (
            SELECT user_id,
                   max(epoch_us(ts)) AS last_us,
                   max(CASE WHEN event_type = 'purchase'
                            THEN epoch_us(ts) END) AS last_buy_us,
                   CAST(count(*) AS BIGINT) AS n_events
            FROM events GROUP BY user_id
        )
        SELECT p.user_id,
               CAST(p.last_us AS BIGINT) AS last_seen_us,
               p.n_events,
               (p.last_buy_us IS NULL
                OR h.h - p.last_buy_us >= {_CHURN_US}) AS churned
        FROM per p CROSS JOIN horizon h
    """,
    description="churn labeling: a user is churned when they made no "
    "purchase in the final 3 days of the observation window (or never "
    "purchased) — the standard supervised label for retention models, "
    "anchored to the CORPUS horizon (max event time) rather than wall "
    "clock so the label set is reproducible, and purchase-based so both "
    "classes are non-vacuous on browsing-heavy data. One partial-agg "
    "groupBy per user (last-seen, last-purchase and event count in the "
    "same pass via a conditional max) plus the horizon as ONE broadcast "
    "scalar row — never a second full scan joined by shuffle; integer "
    "microsecond arithmetic throughout",
)
def churn_labels(spark, sf_dir):
    ts_us = F.expr(_TS_US_SQL).cast("long")
    e = load(spark, sf_dir, "events").select(
        "user_id", ts_us.alias("ts_us"), "event_type"
    )
    horizon = e.agg(F.max("ts_us").alias("h"))
    per = e.groupBy("user_id").agg(
        F.max("ts_us").alias("last_us"),
        F.max(
            F.when(F.col("event_type") == "purchase", F.col("ts_us"))
        ).alias("last_buy_us"),
        F.count("*").cast("long").alias("n_events"),
    )
    return per.crossJoin(F.broadcast(horizon)).select(
        "user_id",
        F.col("last_us").alias("last_seen_us"),
        "n_events",
        (
            F.col("last_buy_us").isNull()
            | (F.col("h") - F.col("last_buy_us") >= _CHURN_US)
        ).alias("churned"),
    )


@query(
    "seasonal_profile",
    oracle=f"""
        SELECT CAST(((epoch_us(ts) // 86400000000) + 4) % 7 AS BIGINT)
                   AS dow,
               CAST((epoch_us(ts) % 86400000000) // 3600000000 AS BIGINT)
                   AS hour,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS sum_cents
        FROM events GROUP BY 1, 2
    """,
    description="seasonality heatmap: event counts and value by "
    "(day-of-week, hour-of-day), with BOTH coordinates derived from "
    "integer microsecond-epoch arithmetic (1970-01-01 was a Thursday, "
    "hence the +4) — no date-part functions whose week/timezone "
    "conventions differ between engines. The load-profile table behind "
    "capacity planning and anomaly baselines. One map-side-combinable "
    "groupBy over the bounded 7 x 24 domain; at any corpus scale the "
    "shuffle carries at most 168 rows per task",
)
def seasonal_profile(spark, sf_dir):
    return (
        load(spark, sf_dir, "events")
        .select(
            F.expr(
                f"(({_TS_US_SQL}) div 86400000000 + 4) % 7"
            ).cast("long").alias("dow"),
            F.expr(
                f"(({_TS_US_SQL}) % 86400000000) div 3600000000"
            ).cast("long").alias("hour"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .groupBy("dow", "hour")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum("cents").cast("long").alias("sum_cents"),
        )
    )


# ---------------------------------------------------------------------------
# Gap-filling / resampling: project each user's irregular event series onto
# a regular grid with linear interpolation between the surrounding
# observations — the standard feature-store shape (models want aligned
# snapshots, events arrive whenever they arrive).
# ---------------------------------------------------------------------------

_GRID_S = 21_600  # 6-hour grid over the 30-day corpus


@query(
    "interpolate_missing",
    oracle=f"""
        WITH series AS (
            SELECT user_id,
                   epoch_us(ts) // 1000000 AS es,
                   CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                       AS cents
            FROM events GROUP BY 1, 2
        ),
        b AS (
            SELECT user_id, min(es) AS lo, max(es) AS hi
            FROM series GROUP BY 1
        ),
        grid AS (
            SELECT user_id,
                   unnest(range(((lo + {_GRID_S - 1}) // {_GRID_S})
                                * {_GRID_S},
                                hi + 1, {_GRID_S})) AS es
            FROM b
        ),
        u AS (
            SELECT user_id, es, cents, 1 AS is_obs FROM series
            UNION ALL
            SELECT user_id, es, NULL, 0 FROM grid
        ),
        w AS (
            SELECT user_id, es, is_obs,
                   last_value(CASE WHEN is_obs = 1 THEN es END
                              IGNORE NULLS) OVER wp AS pes,
                   last_value(CASE WHEN is_obs = 1 THEN cents END
                              IGNORE NULLS) OVER wp AS pcents,
                   first_value(CASE WHEN is_obs = 1 THEN es END
                               IGNORE NULLS) OVER wn AS nes,
                   first_value(CASE WHEN is_obs = 1 THEN cents END
                               IGNORE NULLS) OVER wn AS ncents
            FROM u
            WINDOW wp AS (PARTITION BY user_id ORDER BY es, is_obs
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW),
                   wn AS (PARTITION BY user_id ORDER BY es, is_obs
                          ROWS BETWEEN CURRENT ROW
                          AND UNBOUNDED FOLLOWING)
        )
        SELECT user_id, CAST(es AS BIGINT) AS grid_es,
               CAST(pcents
                    + CASE WHEN nes > pes
                           THEN floor(CAST((ncents - pcents) * (es - pes)
                                           AS DOUBLE) / (nes - pes))
                           ELSE 0 END AS BIGINT) AS interp_cents
        FROM w
        WHERE is_obs = 0 AND pes IS NOT NULL AND nes IS NOT NULL
    """,
    description="per-user gap-filling: each user's per-second spend "
    "series is resampled onto a regular 6-hour grid with linear "
    "interpolation between the surrounding observations (exact integer "
    "cents/seconds; the interpolation numerator stays under 2^53 so the "
    "floored double division is bit-identical across engines). "
    "Implemented WITHOUT any join: grid points and observations merge "
    "into one per-user ordered stream, and carry-forward/carry-backward "
    "window frames (last/first IGNORE NULLS) attach the bracketing "
    "observations — ONE shuffle on user_id total, the shape that "
    "replaces the grid-to-series as-of join at 100 TB",
)
def interpolate_missing(spark, sf_dir):
    es_expr = F.expr(
        "timestampdiff(SECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)"
    )
    # persist: the per-user series feeds BOTH the grid-bounds aggregate
    # and the union's observation branch — without it the scan + groupBy
    # runs twice (once per consumer).
    # r14 NEGATIVE RESULT, measured and kept as-is: a single-exchange
    # rework (bounds as whole-partition window MIN/MAX, grid rows
    # emitted by one struct-array explode on each user's first row, no
    # persist/union — 6 -> 3 jobs) LOST the interleaved A/B, 1.94 s ->
    # 2.50 s median: the per-row struct-array build + explode and the
    # second in-partition sort cost more than the branch-and-union shape
    # saves. Guide §1.1's warning in action — the fewer-exchanges
    # "ideal" plan is not automatically faster.
    series = scratch_persist(
        load(spark, sf_dir, "events")
        .select(
            "user_id",
            es_expr.alias("es"),
            F.round(F.col("value") * 100).cast("long").alias("c"),
        )
        .groupBy("user_id", "es")
        .agg(F.sum("c").cast("long").alias("cents"))
    )
    grid_start = (
        F.floor((F.col("lo") + _GRID_S - 1) / _GRID_S) * _GRID_S
    ).cast("long")
    grid = (
        series.groupBy("user_id")
        .agg(F.min("es").alias("lo"), F.max("es").alias("hi"))
        .select(
            "user_id",
            # a user whose whole series fits BETWEEN two grid points has
            # hi < the rounded-up start; Spark's sequence() throws on
            # start > stop with a positive step (DuckDB's generate_series
            # returns empty), so emit the empty grid explicitly
            F.explode(
                F.when(
                    grid_start <= F.col("hi"),
                    F.sequence(
                        grid_start,
                        F.col("hi"),
                        F.lit(_GRID_S).cast("long"),
                    ),
                ).otherwise(F.array().cast("array<long>"))
            ).alias("es"),
        )
    )
    u = series.select(
        "user_id", "es", "cents", F.lit(1).alias("is_obs")
    ).unionAll(
        grid.select(
            "user_id",
            "es",
            F.lit(None).cast("long").alias("cents"),
            F.lit(0).alias("is_obs"),
        )
    )
    obs_es = F.when(F.col("is_obs") == 1, F.col("es"))
    obs_cents = F.when(F.col("is_obs") == 1, F.col("cents"))
    wp = (
        Window.partitionBy("user_id")
        .orderBy("es", "is_obs")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = (
        Window.partitionBy("user_id")
        .orderBy("es", "is_obs")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    w = u.select(
        "user_id",
        "es",
        "is_obs",
        F.last(obs_es, ignorenulls=True).over(wp).alias("pes"),
        F.last(obs_cents, ignorenulls=True).over(wp).alias("pcents"),
        F.first(obs_es, ignorenulls=True).over(wn).alias("nes"),
        F.first(obs_cents, ignorenulls=True).over(wn).alias("ncents"),
    )
    interp = F.col("pcents") + F.when(
        F.col("nes") > F.col("pes"),
        F.floor(
            ((F.col("ncents") - F.col("pcents"))
             * (F.col("es") - F.col("pes"))).cast("double")
            / (F.col("nes") - F.col("pes"))
        ),
    ).otherwise(F.lit(0))
    return (
        w.filter(
            (F.col("is_obs") == 0)
            & F.col("pes").isNotNull()
            & F.col("nes").isNotNull()
        )
        .select(
            "user_id",
            F.col("es").cast("long").alias("grid_es"),
            interp.cast("long").alias("interp_cents"),
        )
    )


# ---------------------------------------------------------------------------
# Mergeable-state rollup: monthly stats produced by MERGING daily partial
# aggregates instead of re-scanning raw events — the incremental-pipeline
# contract (sum/count/min/max compose) that lets a 100 TB warehouse
# maintain coarse rollups from fine ones at partial-aggregate cost.
# ---------------------------------------------------------------------------


@query(
    "incremental_agg_merge",
    oracle="""
        SELECT CAST(date_trunc('month', ts) AS DATE) AS month,
               event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS sum_cents,
               CAST(min(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS min_cents,
               CAST(max(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS max_cents
        FROM events
        GROUP BY 1, 2
    """,
    description="incremental rollup via mergeable partial-aggregate "
    "state: daily (count, sum, min, max) partials per event_type are "
    "MERGED into monthly stats (count-sum -> sum, min -> min, ...) "
    "without touching raw rows again, and the oracle computes the "
    "monthly stats DIRECTLY from raw events — hash equality IS the "
    "proof that the state merge is lossless. This is the contract "
    "every incremental warehouse pipeline rests on; the daily tier is "
    "the only aggregation that sees raw data, so re-deriving coarser "
    "grains costs partial-rows, not a 100 TB re-scan",
)
def incremental_agg_merge(spark, sf_dir):
    cents = F.round(F.col("value") * 100).cast("long")
    daily = (
        load(spark, sf_dir, "events")
        .select(
            F.date_trunc("day", "ts").alias("day"),
            "event_type",
            cents.alias("cents"),
        )
        .groupBy("day", "event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("cents").cast("long").alias("s"),
            F.min("cents").cast("long").alias("lo"),
            F.max("cents").cast("long").alias("hi"),
        )
    )
    return (
        daily.groupBy(
            F.date_trunc("month", "day").cast("date").alias("month"),
            "event_type",
        )
        .agg(
            F.sum("n").cast("long").alias("n_events"),
            F.sum("s").cast("long").alias("sum_cents"),
            F.min("lo").cast("long").alias("min_cents"),
            F.max("hi").cast("long").alias("max_cents"),
        )
    )


# bin width 1024 cents = 2^10: division by a power of two is EXACT in
# double arithmetic, so floor(cents / 1024) can never straddle an ULP
# differently in the two engines
_QM_BIN_CENTS = 1024
_QM_MAX_BIN = 127


def qm_bin(value_col) -> F.Column:
    """Histogram bin of a monetary value column — shared by the batch
    operator and the streaming partial-state twin
    (streaming/events.py stream_quantile_partials)."""
    cents = F.round(value_col * 100).cast("long")
    return F.least(
        F.lit(_QM_MAX_BIN), F.floor(cents / float(_QM_BIN_CENTS))
    ).cast("long")


def qm_quantiles(merged) -> "DataFrame":
    """Approximate p50/p95 from merged (event_type, b, n) bin counts via
    the integer-exact cumulative crossing rule."""
    from pyspark.sql import Window

    w = Window.partitionBy("event_type").orderBy("b")
    wt = Window.partitionBy("event_type")
    cum = merged.select(
        "event_type",
        "b",
        F.sum("n").over(w).alias("cn"),
        F.sum("n").over(wt).alias("tot"),
    )
    p50 = F.min(F.when(F.col("cn") * 2 >= F.col("tot"), F.col("b")))
    p95 = F.min(F.when(F.col("cn") * 100 >= F.col("tot") * 95, F.col("b")))
    return cum.groupBy("event_type").agg(
        F.max("tot").cast("long").alias("n_events"),
        (p50 * _QM_BIN_CENTS).cast("long").alias("p50_floor_cents"),
        (p95 * _QM_BIN_CENTS).cast("long").alias("p95_floor_cents"),
    )


@query(
    "incremental_quantile_merge",
    oracle=f"""
        WITH c AS (
            SELECT event_type,
                   least({_QM_MAX_BIN}, CAST(floor(
                       CAST(round(value * 100) AS BIGINT) / {_QM_BIN_CENTS}.0)
                       AS BIGINT)) AS b
            FROM events
        ),
        g AS (SELECT event_type, b, count(*) AS n FROM c GROUP BY 1, 2),
        cum AS (
            SELECT event_type, b,
                   sum(n) OVER (PARTITION BY event_type ORDER BY b) AS cn,
                   sum(n) OVER (PARTITION BY event_type) AS tot
            FROM g
        )
        SELECT event_type,
               CAST(max(tot) AS BIGINT) AS n_events,
               CAST(min(CASE WHEN cn * 2 >= tot THEN b END)
                    * {_QM_BIN_CENTS} AS BIGINT) AS p50_floor_cents,
               CAST(min(CASE WHEN cn * 100 >= tot * 95 THEN b END)
                    * {_QM_BIN_CENTS} AS BIGINT) AS p95_floor_cents
        FROM cum GROUP BY 1
    """,
    description="mergeable quantile sketch: daily fixed-width histogram "
    f"partials ({_QM_MAX_BIN + 1} bins of {_QM_BIN_CENTS} cents) per "
    "event_type are MERGED (bin-count addition — the property t-digest/"
    "KLL engines rely on) into global approximate p50/p95 (lower bin "
    "edge at the cumulative crossing, integer-exact thresholds), while "
    "the oracle bins RAW events directly — hash equality proves the "
    "daily->global state merge is lossless, the quantile-sketch "
    "companion to incremental_agg_merge's sum/min/max. At 100 TB only "
    "the daily tier touches raw rows; the merge tier moves "
    "(event_type, bin, count) triples, bounded by 128 rows per group "
    "per day regardless of data size",
)
def incremental_quantile_merge(spark, sf_dir):
    daily = (
        load(spark, sf_dir, "events")
        .select(
            F.date_trunc("day", "ts").alias("day"),
            "event_type",
            qm_bin(F.col("value")).alias("b"),
        )
        .groupBy("day", "event_type", "b")
        .agg(F.count("*").cast("long").alias("n"))
    )
    merged = daily.groupBy("event_type", "b").agg(
        F.sum("n").cast("long").alias("n")
    )
    return qm_quantiles(merged)


@query(
    "activity_streaks",
    oracle="""
        WITH days AS (
            SELECT DISTINCT user_id,
                   CAST(date_trunc('day', ts) AS DATE) AS day
            FROM events
        ),
        numbered AS (
            SELECT user_id,
                   day - DATE '1970-01-01' AS d,
                   row_number() OVER (PARTITION BY user_id ORDER BY day)
                       AS rn
            FROM days
        ),
        islands AS (
            SELECT user_id, d - rn AS island,
                   CAST(count(*) AS BIGINT) AS streak_len
            FROM numbered GROUP BY user_id, d - rn
        )
        SELECT user_id,
               CAST(max(streak_len) AS BIGINT) AS longest_streak,
               CAST(sum(streak_len) AS BIGINT) AS n_active_days,
               CAST(count(*) AS BIGINT) AS n_streaks
        FROM islands GROUP BY user_id
    """,
    description="longest consecutive-day activity streak per user — the "
    "classic gaps-and-islands rewrite (day-number minus row_number is "
    "constant within a run) instead of a self-join on day+1, which "
    "degenerates into O(days^2) per user. Plan: one distinct (user, day) "
    "partial-agg, one shuffle on user_id shared by the window and both "
    "groupBys — days-per-user is bounded (~365/yr), so per-partition "
    "windows stay small at ANY event volume; 100 TB of events reduces "
    "to user x day rows before anything wide runs",
)
def activity_streaks(spark, sf_dir):
    days = (
        load(spark, sf_dir, "events")
        .select(
            "user_id",
            F.date_trunc("day", "ts").cast("date").alias("day"),
        )
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day")
    numbered = days.select(
        "user_id",
        F.datediff("day", F.lit("1970-01-01")).alias("d"),
        F.row_number().over(w).alias("rn"),
    )
    islands = numbered.groupBy(
        "user_id", (F.col("d") - F.col("rn")).alias("island")
    ).agg(F.count("*").cast("long").alias("streak_len"))
    return islands.groupBy("user_id").agg(
        F.max("streak_len").cast("long").alias("longest_streak"),
        F.sum("streak_len").cast("long").alias("n_active_days"),
        F.count("*").cast("long").alias("n_streaks"),
    )


@query(
    "twap_user_value",
    oracle="""
        WITH ordered AS (
            SELECT user_id,
                   CAST(round(value * 100) AS BIGINT) AS cents,
                   CAST(epoch_us(ts) AS BIGINT) AS ts_us,
                   lead(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                   ) AS next_us
            FROM events
        ),
        seg AS (
            SELECT user_id, cents,
                   (next_us - ts_us) // 1000000 AS dur_s
            FROM ordered WHERE next_us IS NOT NULL
        )
        SELECT user_id,
               CAST(sum(cents * dur_s) AS BIGINT) AS twap_num,
               CAST(sum(dur_s) AS BIGINT) AS twap_den,
               CAST(sum(cents * dur_s) // greatest(sum(dur_s), 1)
                    AS BIGINT) AS twap_cents
        FROM seg GROUP BY user_id
    """,
    description="time-weighted average value per user (TWAP — the "
    "time-series aggregate where each observation is weighted by how "
    "long it remained current, not by row count): lead() per user gives "
    "each segment's duration, weighted sums run in exact integer "
    "cents x whole seconds with ONE floor-division at the end, so "
    "parallel summation order can never produce a ULP diff vs DuckDB. "
    "Ties on ts break on event_id (duplicate timestamps contribute "
    "0-length segments deterministically). Plan: single shuffle on "
    "user_id shared by the window sort and the final partial-agg "
    "groupBy — the 100 TB shape, no re-shuffle between the two",
)
def twap_user_value(spark, sf_dir):
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy(ts_us, "event_id")
    ordered = load(spark, sf_dir, "events").select(
        "user_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        ts_us.alias("ts_us"),
        F.lead(ts_us).over(w).alias("next_us"),
    )
    seg = ordered.filter(F.col("next_us").isNotNull()).select(
        "user_id",
        "cents",
        F.expr("(next_us - ts_us) div 1000000").alias("dur_s"),
    )
    # integer `div` throughout (matches DuckDB `//` on BIGINTs): double
    # division near an integer boundary can round across it before the
    # floor/cast, which would flip the last digit vs the oracle
    return seg.groupBy("user_id").agg(
        F.sum(F.col("cents") * F.col("dur_s")).cast("long").alias(
            "twap_num"
        ),
        F.sum("dur_s").cast("long").alias("twap_den"),
        F.expr(
            "sum(cents * dur_s) div greatest(sum(dur_s), 1)"
        )
        .cast("long")
        .alias("twap_cents"),
    )


@query(
    "trend_slope_per_user",
    oracle="""
        WITH base AS (
            SELECT user_id,
                   CAST(round(value * 100) AS BIGINT) AS c,
                   (epoch_us(ts)
                    - min(epoch_us(ts)) OVER (PARTITION BY user_id))
                   // 3600000000 AS t
            FROM events
        ),
        s AS (
            SELECT user_id,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(t) AS BIGINT) AS st,
                   CAST(sum(c) AS BIGINT) AS sc,
                   CAST(sum(t * t) AS BIGINT) AS stt,
                   CAST(sum(t * c) AS BIGINT) AS stc
            FROM base GROUP BY user_id
        )
        SELECT user_id, n,
               CAST(n * stc - st * sc AS BIGINT) AS slope_num,
               CAST(n * stt - st * st AS BIGINT) AS slope_den,
               CAST(CASE WHEN n * stt - st * st = 0 THEN 0 ELSE
                    ((n * stc - st * sc) // (n * stt - st * st)) * 1000
                    + (((n * stc - st * sc) % (n * stt - st * st)) * 1000)
                      // (n * stt - st * st)
               END AS BIGINT) AS slope_milli
        FROM s
    """,
    description="per-user OLS trend slope of event value over time (the "
    "feature-engineering staple 'is this user's spend rising?'), in "
    "EXACT rational arithmetic: time is rebased to hours since the "
    "user's first event (keeps every sufficient statistic inside int64 "
    "— t^2 sums overflow at second granularity), the slope is the "
    "closed-form (n*Stc - St*Sc) / (n*Stt - St^2) kept as an integer "
    "num/den pair, and the reported milli-slope uses the two-step "
    "quotient+remainder expansion so no product ever exceeds int64 and "
    "no float division can round across a floor boundary. Plan: the "
    "rebasing min() window and the sufficient-statistic aggregate share "
    "ONE shuffle on user_id; OLS over any event volume reduces to five "
    "sums per user — the classic map-side-combinable regression",
)
def trend_slope_per_user(spark, sf_dir):
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    base = load(spark, sf_dir, "events").select(
        "user_id",
        F.round(F.col("value") * 100).cast("long").alias("c"),
        ts_us.alias("ts_us"),
    ).select(
        "user_id",
        "c",
        F.expr(
            "(ts_us - min(ts_us) OVER (PARTITION BY user_id))"
            " div 3600000000"
        ).alias("t"),
    )
    s = base.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("t").cast("long").alias("st"),
        F.sum("c").cast("long").alias("sc"),
        F.sum(F.col("t") * F.col("t")).cast("long").alias("stt"),
        F.sum(F.col("t") * F.col("c")).cast("long").alias("stc"),
    )
    num = F.col("n") * F.col("stc") - F.col("st") * F.col("sc")
    den = F.col("n") * F.col("stt") - F.col("st") * F.col("st")
    return s.select(
        "user_id",
        "n",
        num.cast("long").alias("slope_num"),
        den.cast("long").alias("slope_den"),
        F.when(den == 0, F.lit(0))
        .otherwise(
            F.expr(
                "((n * stc - st * sc) div (n * stt - st * st)) * 1000"
                " + (((n * stc - st * sc) % (n * stt - st * st)) * 1000)"
                "   div (n * stt - st * st)"
            )
        )
        .cast("long")
        .alias("slope_milli"),
    )


@query(
    "rolling_median_value",
    oracle="""
        SELECT event_id, user_id,
               median(CAST(round(value * 100) AS BIGINT)) OVER (
                   PARTITION BY user_id
                   ORDER BY epoch_us(ts), event_id
                   ROWS BETWEEN 8 PRECEDING AND CURRENT ROW
               ) AS roll_med_cents
        FROM events
    """,
    description="rolling 9-event median of value per user — the robust "
    "twin of a moving average (one fat-finger event cannot drag it), the "
    "denoiser behind per-entity anomaly baselines. Median of integer "
    "cents interpolates to at-worst .5 halves, which doubles represent "
    "exactly, so Spark's percentile(.., 0.5) over the frame and DuckDB's "
    "windowed median are bit-identical. Plan: one shuffle on user_id, "
    "sort within partitions, and the frame holds <= 9 values per row at "
    "ANY event volume — bounded per-row state, no per-user collect",
)
def rolling_median_value(spark, sf_dir):
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(ts_us, "event_id")
        .rowsBetween(-8, Window.currentRow)
    )
    return load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.expr("percentile(CAST(round(value * 100) AS BIGINT), 0.5)")
        .over(w)
        .alias("roll_med_cents"),
    )


# ---------------------------------------------------------------------------
# M4 time-series downsampling: min/max/first/last per pixel bucket
# ---------------------------------------------------------------------------

_M4_BUCKET_US = 6 * 3600 * 1_000_000  # 6-hour pixel columns


def m4_project(events):
    """(series, bucket, cents, ord_key) projection shared by the batch
    operator and the streaming partial accumulator
    (streaming/events.py:stream_m4_partials) — the two MUST bucket and
    order identically for the merge-equals-batch property to hold."""
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    ord_key = F.concat(
        F.lpad(ts_us.cast("string"), 20, "0"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    return events.select(
        "event_type",
        F.expr(
            f"unix_micros(CAST(ts AS TIMESTAMP)) div {_M4_BUCKET_US}"
        ).alias("bucket"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        ord_key.alias("ord_key"),
    )


@query(
    "m4_downsample",
    oracle=f"""
        WITH e AS (
            SELECT event_type,
                   CAST(epoch_us(ts) AS BIGINT) // {_M4_BUCKET_US} AS bucket,
                   CAST(round(value * 100) AS BIGINT) AS cents,
                   lpad(CAST(CAST(epoch_us(ts) AS BIGINT) AS VARCHAR),
                        20, '0')
                   || lpad(CAST(event_id AS VARCHAR), 12, '0') AS ord_key
            FROM events
        )
        SELECT event_type, bucket,
               CAST(count(*) AS BIGINT) AS n,
               min(cents) AS min_cents,
               max(cents) AS max_cents,
               arg_min(cents, ord_key) AS first_cents,
               arg_max(cents, ord_key) AS last_cents
        FROM e GROUP BY event_type, bucket
    """,
    description="M4 downsampling (Jugel et al., VLDB 2014): per series and "
    "fixed time bucket keep exactly the four value-bearing extremes — "
    "min, max, first, last — the lossless reduction for line-chart "
    "rendering and the standard pre-aggregation for dashboard serving. "
    "first/last are min_by/max_by over a zero-padded (epoch_us, event_id) "
    "string key, so ties are broken identically in any engine. ONE "
    "map-side-combinable groupBy; output is 5 longs per (series, pixel) "
    "regardless of input volume — the 100 TB chart renders from KB",
)
def m4_downsample(spark, sf_dir):
    e = m4_project(load(spark, sf_dir, "events"))
    return e.groupBy("event_type", "bucket").agg(
        F.count("*").cast("long").alias("n"),
        F.min("cents").alias("min_cents"),
        F.max("cents").alias("max_cents"),
        F.min_by("cents", F.col("ord_key")).alias("first_cents"),
        F.max_by("cents", F.col("ord_key")).alias("last_cents"),
    )


# ---------------------------------------------------------------------------
# Kaplan-Meier survival curve over per-user activity spans
# ---------------------------------------------------------------------------

_KM_CHURN_US = 7 * 24 * 3600 * 1_000_000  # silent >= 7 days at cutoff = churn
_NANO = 1_000_000_000


@query(
    "kaplan_meier_curve",
    oracle=f"""
        WITH u AS (
            SELECT user_id,
                   CAST((max(epoch_us(ts)) - min(epoch_us(ts)))
                        // 3600000000 AS BIGINT) AS dur_h,
                   CAST(max(epoch_us(ts)) AS BIGINT) AS last_us
            FROM events GROUP BY user_id
        ),
        g AS (SELECT CAST(max(last_us) AS BIGINT) AS gmax FROM u),
        lab AS (
            SELECT dur_h,
                   CASE WHEN last_us < gmax - {_KM_CHURN_US}
                        THEN 1 ELSE 0 END AS churn
            FROM u CROSS JOIN g
        ),
        d AS (
            SELECT dur_h,
                   CAST(count(*) AS BIGINT) AS leaving,
                   CAST(sum(churn) AS BIGINT) AS churned
            FROM lab GROUP BY dur_h
        ),
        k AS (
            SELECT dur_h, churned,
                   CAST(sum(leaving) OVER () - sum(leaving) OVER (
                       ORDER BY dur_h
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) + leaving AS BIGINT) AS at_risk
            FROM d
        ),
        t AS (
            SELECT dur_h, churned, at_risk,
                   CASE WHEN churned = 0 OR churned >= at_risk THEN 0
                        ELSE CAST(floor(ln(
                            CAST(at_risk - churned AS DOUBLE) / at_risk
                        ) * {_NANO}) AS BIGINT) END AS logt_nano,
                   CASE WHEN churned >= at_risk THEN 1 ELSE 0 END AS dead
            FROM k
        )
        SELECT dur_h, at_risk, churned,
               CASE WHEN max(dead) OVER (
                        ORDER BY dur_h
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                    ) = 1 THEN 0
                    ELSE CAST(floor(exp(CAST(sum(logt_nano) OVER (
                        ORDER BY dur_h
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                    ) AS DOUBLE) / {_NANO}) * {_NANO}) AS BIGINT)
               END AS survival_nano
        FROM t
    """,
    description="Kaplan-Meier survival estimator over per-user activity "
    "spans (event = churned before the corpus cutoff, censored "
    "otherwise): S(t) = prod(1 - d_i/n_i) over event times <= t. The "
    "at-risk counts come from an exact cumulative long sum; each factor's "
    "ln is floored to nano units so the running product is an "
    "order-insensitive integer cumsum, exponentiated once per output "
    "row. The unpartitioned windows run AFTER aggregation to one row per "
    "distinct duration — bounded state at any input scale (the raw-data "
    "stages are ordinary per-user shuffles)",
)
def kaplan_meier_curve(spark, sf_dir):
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    u = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.expr(
                "CAST((max(unix_micros(CAST(ts AS TIMESTAMP)))"
                " - min(unix_micros(CAST(ts AS TIMESTAMP))))"
                " div 3600000000 AS BIGINT)"
            ).alias("dur_h"),
            F.max(ts_us).cast("long").alias("last_us"),
        )
    )
    g = u.agg(F.max("last_us").cast("long").alias("gmax"))
    lab = u.crossJoin(F.broadcast(g)).select(
        "dur_h",
        F.when(
            F.col("last_us") < F.col("gmax") - _KM_CHURN_US, 1
        ).otherwise(0).alias("churn"),
    )
    d = lab.groupBy("dur_h").agg(
        F.count("*").cast("long").alias("leaving"),
        F.sum("churn").cast("long").alias("churned"),
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    wcum = Window.orderBy("dur_h").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    k = d.select(
        "dur_h",
        "churned",
        (
            F.sum("leaving").over(wall)
            - F.sum("leaving").over(wcum)
            + F.col("leaving")
        )
        .cast("long")
        .alias("at_risk"),
    )
    t = k.select(
        "dur_h",
        "churned",
        "at_risk",
        F.when(
            (F.col("churned") == 0) | (F.col("churned") >= F.col("at_risk")),
            F.lit(0).cast("long"),
        )
        .otherwise(
            F.floor(
                F.log(
                    (F.col("at_risk") - F.col("churned")).cast("double")
                    / F.col("at_risk")
                )
                * _NANO
            ).cast("long")
        )
        .alias("logt_nano"),
        F.when(F.col("churned") >= F.col("at_risk"), 1)
        .otherwise(0)
        .alias("dead"),
    )
    return t.select(
        "dur_h",
        "at_risk",
        "churned",
        F.when(F.max("dead").over(wcum) == 1, F.lit(0).cast("long"))
        .otherwise(
            F.floor(
                F.exp(
                    F.sum("logt_nano").over(wcum).cast("double") / _NANO
                )
                * _NANO
            ).cast("long")
        )
        .alias("survival_nano"),
    )


# ---------------------------------------------------------------------------
# Funnel latency: time-to-convert percentiles (exact, discrete)
# ---------------------------------------------------------------------------


@query(
    "funnel_time_percentiles",
    oracle=f"""
        WITH v AS (
            SELECT user_id, CAST(min(epoch_us(ts)) AS BIGINT) AS v_us
            FROM events WHERE event_type = 'view' GROUP BY user_id
        ),
        p AS (
            SELECT e.user_id,
                   CAST(min(epoch_us(e.ts)) AS BIGINT) AS p_us
            FROM events e JOIN v USING (user_id)
            WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > v.v_us
            GROUP BY e.user_id
        ),
        d AS (
            SELECT p.user_id,
                   CAST((p.p_us - v.v_us) // 1000000 AS BIGINT) AS dt_sec
            FROM p JOIN v USING (user_id)
        ),
        r AS (
            SELECT dt_sec,
                   row_number() OVER (ORDER BY dt_sec, user_id) AS rnk,
                   CAST(count(*) OVER () AS BIGINT) AS n,
                   CAST(sum(dt_sec) OVER () AS BIGINT) AS s
            FROM d
        )
        SELECT n AS n_converted,
               max(CASE WHEN rnk = (n + 1) // 2 THEN dt_sec END)
                   AS p50_sec,
               max(CASE WHEN rnk = (9 * n + 9) // 10 THEN dt_sec END)
                   AS p90_sec,
               CAST(floor(CAST(s AS DOUBLE) / n * {_NANO}) AS BIGINT)
                   AS mean_sec_nano
        FROM r GROUP BY n, s
    """,
    description="Time-to-convert distribution for the view -> purchase "
    "funnel: per user, seconds from first view to first later purchase; "
    "output is exact DISCRETE p50/p90 picked by integer rank arithmetic "
    "(ceil(p*n) = (p*num + den-1) div den) over a (dt, user_id)-ordered "
    "row_number — no engine-specific percentile interpolation anywhere. "
    "The raw stages are per-user shuffles; the global window runs on the "
    "converted-users relation (one row per user), bounded far below raw "
    "event volume. The latency twin of event_funnel's count metrics",
)
def funnel_time_percentiles(spark, sf_dir):
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    ev = load(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min(ts_us).cast("long").alias("v_us"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(ts_us > F.col("v_us"))
        .groupBy("user_id")
        .agg(F.min(ts_us).cast("long").alias("p_us"))
    )
    d = p.join(v, "user_id").select(
        "user_id",
        F.expr("(p_us - v_us) div 1000000").cast("long").alias("dt_sec"),
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    r = d.select(
        "dt_sec",
        F.row_number()
        .over(Window.orderBy("dt_sec", "user_id"))
        .alias("rnk"),
        F.count("*").over(wall).cast("long").alias("n"),
        F.sum("dt_sec").over(wall).cast("long").alias("s"),
    )
    return r.groupBy("n", "s").agg(
        F.max(
            F.when(
                F.col("rnk") == F.expr("(n + 1) div 2"), F.col("dt_sec")
            )
        ).alias("p50_sec"),
        F.max(
            F.when(
                F.col("rnk") == F.expr("(9 * n + 9) div 10"),
                F.col("dt_sec"),
            )
        ).alias("p90_sec"),
        F.expr(
            f"CAST(floor(CAST(s AS DOUBLE) / n * {_NANO}) AS BIGINT)"
        ).alias("mean_sec_nano"),
    ).select(
        F.col("n").alias("n_converted"), "p50_sec", "p90_sec",
        "mean_sec_nano",
    )


# ---------------------------------------------------------------------------
# Seasonal anomaly residuals: z-scores against the (series, hour) baseline
# ---------------------------------------------------------------------------

_SAR_TOPK = 20


@query(
    "seasonal_anomaly_residual",
    oracle=f"""
        WITH e AS (
            SELECT event_id, event_type,
                   CAST((epoch_us(ts) % 86400000000) // 3600000000
                        AS BIGINT) AS hour,
                   CAST(round(value * 100) AS BIGINT) AS cents
            FROM events
        ),
        b AS (
            SELECT event_type, hour,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(cents) AS BIGINT) AS s,
                   CAST(sum(cents * cents) AS BIGINT) AS ss
            FROM e GROUP BY event_type, hour
        ),
        z AS (
            SELECT e.event_id, e.event_type, e.hour, e.cents,
                   CAST(floor(
                       (CAST(e.cents AS DOUBLE) * n - s)
                       / sqrt((CAST(n AS DOUBLE) * ss - CAST(s AS DOUBLE)
                               * s) / n) * {_NANO}
                   ) AS BIGINT) AS z_nano
            FROM e JOIN b USING (event_type, hour)
            WHERE n > 1 AND CAST(n AS DOUBLE) * ss
                            - CAST(s AS DOUBLE) * s > 0
        )
        SELECT event_id, event_type, hour, cents, z_nano
        FROM z
        ORDER BY greatest(z_nano, -z_nano) DESC, event_id
        LIMIT {_SAR_TOPK}
    """,
    description="Top-{k} seasonal anomalies: each event's value is "
    "z-scored against its own (series, hour-of-day) baseline — the "
    "seasonal_profile heatmap turned into a residual detector, catching "
    "'normal for 3am, wild for 3pm' cases a global MAD misses. Baseline "
    "moments are exact integer sums per cell; the at-most "
    "series*24-row baseline broadcasts back onto the fact scan (no "
    "second fact shuffle), and the top-k is TakeOrderedAndProject with "
    "a deterministic (|z|, event_id) order".replace("{k}", str(_SAR_TOPK)),
)
def seasonal_anomaly_residual(spark, sf_dir):
    e = load(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.expr(
            "CAST((unix_micros(CAST(ts AS TIMESTAMP)) % 86400000000)"
            " div 3600000000 AS BIGINT)"
        ).alias("hour"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    b = e.groupBy("event_type", "hour").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
        F.sum(F.col("cents") * F.col("cents")).cast("long").alias("ss"),
    )
    nd, sd, ssd = (
        F.col("n").cast("double"),
        F.col("s").cast("double"),
        F.col("ss").cast("double"),
    )
    z = (
        e.join(F.broadcast(b), ["event_type", "hour"])
        .where((F.col("n") > 1) & (nd * F.col("ss") - sd * F.col("s") > 0))
        .select(
            "event_id",
            "event_type",
            "hour",
            "cents",
            F.floor(
                (F.col("cents").cast("double") * F.col("n") - F.col("s"))
                / F.sqrt((nd * F.col("ss") - sd * F.col("s")) / F.col("n"))
                * _NANO
            )
            .cast("long")
            .alias("z_nano"),
        )
    )
    return z.orderBy(
        F.greatest(F.col("z_nano"), -F.col("z_nano")).desc(), "event_id"
    ).limit(_SAR_TOPK)


# ---------------------------------------------------------------------------
# CUSUM changepoint over the daily event-count series (exact integers)
# ---------------------------------------------------------------------------


@query(
    "cusum_changepoint",
    oracle="""
        WITH d AS (
            SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
                   CAST(count(*) AS BIGINT) AS x
            FROM events GROUP BY day
        ),
        t AS (
            SELECT day, x,
                   CAST(count(*) OVER () AS BIGINT) AS nd,
                   CAST(sum(x) OVER () AS BIGINT) AS total,
                   CAST(sum(x) OVER (
                       ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS cum
            FROM d
        ),
        s AS (
            SELECT day, nd AS n_days, total,
                   cum * nd - CAST(sum(CAST(1 AS BIGINT)) OVER (
                       ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) * total AS s_scaled
            FROM t
        )
        SELECT day AS changepoint_day, s_scaled, n_days, total
        FROM s
        ORDER BY greatest(s_scaled, -s_scaled) DESC, day
        LIMIT 1
    """,
    description="CUSUM changepoint on the daily event-count series: the "
    "day k maximizing |sum_{d<=k}(x_d - mean)| — the classic level-shift "
    "detector for volume regressions and pipeline incidents. The running "
    "deviation is kept EXACT by scaling through the day count "
    "(S_k*D = D*cum_k - k*total: integers only, no mean division), so "
    "the argmax is engine-independent with a deterministic (|S|, day) "
    "tiebreak via TakeOrderedAndProject. Raw rows reduce to one row per "
    "day in a single partial agg; the unpartitioned windows only ever "
    "see the day-level series",
)
def cusum_changepoint(spark, sf_dir):
    d = (
        load(spark, sf_dir, "events")
        .groupBy(
            F.expr(
                "CAST(unix_micros(CAST(ts AS TIMESTAMP))"
                " div 86400000000 AS BIGINT)"
            ).alias("day")
        )
        .agg(F.count("*").cast("long").alias("x"))
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    wcum = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    t = d.select(
        "day",
        F.count("*").over(wall).cast("long").alias("nd"),
        F.sum("x").over(wall).cast("long").alias("total"),
        F.sum("x").over(wcum).cast("long").alias("cum"),
        F.row_number().over(Window.orderBy("day")).cast("long").alias("k"),
    )
    s = t.select(
        "day",
        F.col("nd").alias("n_days"),
        "total",
        (F.col("cum") * F.col("nd") - F.col("k") * F.col("total")).alias(
            "s_scaled"
        ),
    )
    return (
        s.orderBy(
            F.greatest(F.col("s_scaled"), -F.col("s_scaled")).desc(), "day"
        )
        .limit(1)
        .select(
            F.col("day").alias("changepoint_day"),
            "s_scaled",
            "n_days",
            "total",
        )
    )


# ---------------------------------------------------------------------------
# Forward as-of join: nearest FOLLOWING right row per key
# ---------------------------------------------------------------------------


def asof_join_frames_forward(left, right, on, ts_col="ts_us", right_cols=()):
    """Mirror of asof_join_frames: for each left row, attach the EARLIEST
    right row with ``right.ts_col >= left.ts_col`` per ``on`` key — the
    time-to-next-event direction (next purchase after a click, next error
    after a deploy). Same union + running-window rewrite, with a
    first-ignoring-nulls over the FOLLOWING frame."""
    lcols = [c for c in left.columns if c not in (on, ts_col)]
    l_tagged = left.select(
        on,
        ts_col,
        *lcols,
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(c)
            for c in right_cols
        ],
        F.lit(0).alias("_side"),
    )
    r_tagged = right.select(
        on,
        ts_col,
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        *right_cols,
        F.lit(1).alias("_side"),
    )
    u = l_tagged.unionByName(r_tagged)
    # left rows sort before right rows at equal ts (_side 0 < 1), so the
    # first following right row includes an equal-ts one — inclusive
    # (left.ts <= right.ts), matching DuckDB's forward ASOF
    w = (
        Window.partitionBy(on)
        .orderBy(ts_col, "_side")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    # ONE first() over a struct of (ts, payload) — same single-matched-row
    # discipline as the backward asof_join_frames (see comment there)
    payload = F.when(
        F.col("_side") == 1,
        F.struct(
            F.col(ts_col).alias("_ts"),
            *[F.col(c).alias(c) for c in right_cols],
        ),
    )
    carried = u.withColumn("_r", F.first(payload, ignorenulls=True).over(w))
    return carried.filter(F.col("_side") == 0).select(
        on,
        ts_col,
        *lcols,
        F.col("_r._ts").alias("matched_ts_us"),
        *[F.col(f"_r.{c}").alias(c) for c in right_cols],
    )


@query(
    "asof_join_forward",
    oracle="""
        WITH pur AS (
            SELECT user_id, ts, max(value) AS purchase_value FROM events
            WHERE event_type = 'purchase' GROUP BY user_id, ts
        ),
        clk AS (
            SELECT event_id, user_id, ts, value AS click_value FROM events
            WHERE event_type = 'click'
        )
        SELECT c.user_id,
               epoch_us(c.ts) AS ts_us,
               c.event_id,
               c.click_value,
               epoch_us(p.ts) AS matched_ts_us,
               p.purchase_value
        FROM clk c ASOF LEFT JOIN pur p
          ON c.user_id = p.user_id AND c.ts <= p.ts
    """,
    description="forward as-of join: each click matched to the user's "
    "NEXT purchase at-or-after it — the time-to-conversion direction "
    "asof_join's backward match cannot express. Same union + running "
    "window rewrite (one shuffle on user_id, no inequality-join blowup), "
    "with a first-ignoring-nulls over the following frame; oracle is "
    "DuckDB's native forward ASOF LEFT JOIN (ON c.ts <= p.ts)",
)
def asof_join_forward(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    ts_us = F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us")
    clk = e.filter(F.col("event_type") == "click").select(
        "user_id",
        ts_us,
        "event_id",
        F.col("value").alias("click_value"),
    )
    pur = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("purchase_value"))
        .select("user_id", ts_us, "purchase_value")
    )
    return asof_join_frames_forward(
        clk, pur, on="user_id", right_cols=("purchase_value",)
    )


# ---------------------------------------------------------------------------
# Autocorrelation of the per-series value sequence at small lags
# ---------------------------------------------------------------------------

_ACF_CORR = f"""CASE
    WHEN (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
         * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy) <= 0
    THEN NULL
    ELSE CAST(floor(
        (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
        / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
               * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
        * {_NANO}) AS BIGINT)
    END"""


@query(
    "acf_lags",
    oracle=f"""
        WITH e AS (
            SELECT event_type,
                   CAST(round(value * 100) AS BIGINT) AS x,
                   lag(CAST(round(value * 100) AS BIGINT), 1) OVER w AS l1,
                   lag(CAST(round(value * 100) AS BIGINT), 2) OVER w AS l2,
                   lag(CAST(round(value * 100) AS BIGINT), 3) OVER w AS l3
            FROM events
            WINDOW w AS (PARTITION BY event_type
                         ORDER BY epoch_us(ts), event_id)
        ),
        p AS (
            SELECT event_type, CAST(1 AS BIGINT) AS k, x, l1 AS y
            FROM e WHERE l1 IS NOT NULL
            UNION ALL
            SELECT event_type, CAST(2 AS BIGINT), x, l2
            FROM e WHERE l2 IS NOT NULL
            UNION ALL
            SELECT event_type, CAST(3 AS BIGINT), x, l3
            FROM e WHERE l3 IS NOT NULL
        ),
        m AS (
            SELECT event_type, k,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(x) AS BIGINT) AS sx,
                   CAST(sum(y) AS BIGINT) AS sy,
                   CAST(sum(x * y) AS BIGINT) AS sxy,
                   CAST(sum(x * x) AS BIGINT) AS sxx,
                   CAST(sum(y * y) AS BIGINT) AS syy
            FROM p GROUP BY event_type, k
        )
        SELECT event_type, k, n, {_ACF_CORR} AS acf_nano
        FROM m
    """,
    description="Autocorrelation of the per-series event-value sequence "
    "at lags 1-3 (Pearson between the series and its own lag over the "
    "overlap) — the memory/periodicity diagnostic behind forecasting and "
    "anomaly baselines. ONE window pass per series (ordered by ts with "
    "an event_id tiebreak) produces all three lag columns, stack() "
    "pivots them into (lag, pair) rows without a second shuffle, and "
    "six exact integer moments per (series, lag) feed the same shared "
    "correlation expression as corr_stats. The window partitions by "
    "series — no global ordering anywhere",
)
def acf_lags(spark, sf_dir):
    from pyspark.sql import Window

    cents = F.round(F.col("value") * 100).cast("long")
    w = Window.partitionBy("event_type").orderBy(
        F.unix_micros(F.col("ts").cast("timestamp")), "event_id"
    )
    e = load(spark, sf_dir, "events").select(
        "event_type",
        cents.alias("x"),
        F.lag(cents, 1).over(w).alias("l1"),
        F.lag(cents, 2).over(w).alias("l2"),
        F.lag(cents, 3).over(w).alias("l3"),
    )
    p = e.select(
        "event_type",
        F.expr(
            "stack(3, CAST(1 AS BIGINT), l1, CAST(2 AS BIGINT), l2,"
            " CAST(3 AS BIGINT), l3)"
        ).alias("k", "y"),
        "x",
    ).filter(F.col("y").isNotNull())
    m = p.groupBy("event_type", "k").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    return m.select(
        "event_type", "k", "n", F.expr(_ACF_CORR).alias("acf_nano")
    )


# ---------------------------------------------------------------------------
# Nearest-score matching (caliper matching on a 1-D score)
# ---------------------------------------------------------------------------

_MATCH_CALIPER = 500  # cents


@query(
    "nearest_score_match",
    oracle=f"""
        WITH trt AS (
            SELECT user_id, event_id AS trt_event_id,
                   CAST(round(value * 100) AS BIGINT) AS trt_cents
            FROM events WHERE event_type = 'purchase'
        ),
        ctl AS (
            SELECT user_id, CAST(round(value * 100) AS BIGINT) AS ctl_cents,
                   CAST(min(event_id) AS BIGINT) AS ctl_event_id
            FROM events WHERE event_type = 'click'
            GROUP BY user_id, CAST(round(value * 100) AS BIGINT)
        ),
        back AS (
            SELECT t.trt_event_id, c.ctl_event_id AS b_id,
                   c.ctl_cents AS b_cents
            FROM trt t ASOF LEFT JOIN ctl c
              ON t.user_id = c.user_id AND t.trt_cents >= c.ctl_cents
        ),
        fwd AS (
            SELECT t.trt_event_id, c.ctl_event_id AS f_id,
                   c.ctl_cents AS f_cents
            FROM trt t ASOF LEFT JOIN ctl c
              ON t.user_id = c.user_id AND t.trt_cents <= c.ctl_cents
        ),
        best AS (
            SELECT t.user_id, t.trt_event_id, t.trt_cents,
                   CASE
                       WHEN b_cents IS NULL THEN f_id
                       WHEN f_cents IS NULL THEN b_id
                       WHEN t.trt_cents - b_cents <= f_cents - t.trt_cents
                       THEN b_id ELSE f_id END AS ctl_event_id,
                   CASE
                       WHEN b_cents IS NULL THEN f_cents
                       WHEN f_cents IS NULL THEN b_cents
                       WHEN t.trt_cents - b_cents <= f_cents - t.trt_cents
                       THEN b_cents ELSE f_cents END AS ctl_cents
            FROM trt t
            JOIN back USING (trt_event_id) JOIN fwd USING (trt_event_id)
        )
        SELECT user_id, trt_event_id, trt_cents, ctl_event_id, ctl_cents,
               greatest(trt_cents - ctl_cents, ctl_cents - trt_cents)
                   AS dist
        FROM best
        WHERE ctl_cents IS NOT NULL
          AND greatest(trt_cents - ctl_cents, ctl_cents - trt_cents)
              <= {_MATCH_CALIPER}
    """,
    description="Caliper matching on a 1-D score: each treatment row "
    "(purchase) matched to the user's nearest control (click) by value, "
    "within {c} cents — the workhorse of observational causal inference "
    "and of hard-negative mining. Composed from the two as-of join "
    "directions (backward + forward union-window rewrites, one user_id "
    "shuffle each, no inequality join), then a closest-of-two pick with "
    "a deterministic ties-go-low rule. Controls are deduplicated per "
    "(user, score) first so the match is unique at any parallelism"
    .replace("{c}", str(_MATCH_CALIPER)),
)
def nearest_score_match(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    trt = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("trt_event_id"),
        cents.alias("score"),
    )
    ctl = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", cents.alias("score"))
        .agg(F.min("event_id").cast("long").alias("ctl_event_id"))
    )
    back = asof_join_frames(
        trt, ctl, on="user_id", ts_col="score",
        right_cols=("ctl_event_id",),
    ).select(
        "trt_event_id",
        F.col("ctl_event_id").alias("b_id"),
        F.col("matched_ts_us").alias("b_cents"),
    )
    fwd = asof_join_frames_forward(
        trt, ctl, on="user_id", ts_col="score",
        right_cols=("ctl_event_id",),
    ).select(
        "trt_event_id",
        F.col("ctl_event_id").alias("f_id"),
        F.col("matched_ts_us").alias("f_cents"),
    )
    nearer_back = (F.col("score") - F.col("b_cents")) <= (
        F.col("f_cents") - F.col("score")
    )
    best = (
        trt.join(back, "trt_event_id")
        .join(fwd, "trt_event_id")
        .select(
            "user_id",
            "trt_event_id",
            F.col("score").alias("trt_cents"),
            F.when(F.col("b_cents").isNull(), F.col("f_id"))
            .when(F.col("f_cents").isNull(), F.col("b_id"))
            .when(nearer_back, F.col("b_id"))
            .otherwise(F.col("f_id"))
            .alias("ctl_event_id"),
            F.when(F.col("b_cents").isNull(), F.col("f_cents"))
            .when(F.col("f_cents").isNull(), F.col("b_cents"))
            .when(nearer_back, F.col("b_cents"))
            .otherwise(F.col("f_cents"))
            .alias("ctl_cents"),
        )
    )
    dist = F.greatest(
        F.col("trt_cents") - F.col("ctl_cents"),
        F.col("ctl_cents") - F.col("trt_cents"),
    )
    return best.filter(
        F.col("ctl_cents").isNotNull() & (dist <= _MATCH_CALIPER)
    ).select(
        "user_id",
        "trt_event_id",
        "trt_cents",
        "ctl_event_id",
        F.col("ctl_cents").cast("long").alias("ctl_cents"),
        dist.cast("long").alias("dist"),
    )


# ---------------------------------------------------------------------------
# Session path log-likelihood under the corpus transition model
# ---------------------------------------------------------------------------


@query(
    "session_path_likelihood",
    oracle=f"""
        WITH s AS (
            SELECT user_id, event_type,
                   lead(event_type) OVER (
                       PARTITION BY user_id
                       ORDER BY epoch_us(ts), event_id) AS nxt
            FROM events
        ),
        steps AS (
            SELECT user_id, event_type AS src, nxt AS dst
            FROM s WHERE nxt IS NOT NULL
        ),
        tm AS (
            SELECT src, dst, CAST(count(*) AS BIGINT) AS c,
                   CAST(sum(count(*)) OVER (PARTITION BY src)
                        AS BIGINT) AS tot
            FROM steps GROUP BY src, dst
        ),
        scored AS (
            SELECT user_id,
                   CAST(floor(ln(CAST(c AS DOUBLE) / tot) * {_NANO})
                        AS BIGINT) AS step_ll
            FROM steps JOIN tm USING (src, dst)
        )
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n_steps,
               CAST(sum(step_ll) AS BIGINT) AS loglik_nano
        FROM scored GROUP BY user_id
    """,
    description="Per-user session log-likelihood under the corpus-level "
    "first-order Markov transition model — the sequence-anomaly score "
    "behind bot/fraud detection (an improbable path gets a very "
    "negative score) and the behavioral twin of unigram_logprob_score. "
    "Transition probabilities come from exact counts (a windowed sum "
    "per source state, no division until the shared ln step, floored "
    "per step so the per-user sum is an exact long). Two shuffles total: "
    "the per-user lead() window and the transition-count aggregate, "
    "which re-joins as a broadcast (state-space-sized, 25 rows)",
)
def session_path_likelihood(spark, sf_dir):
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(
        F.unix_micros(F.col("ts").cast("timestamp")), "event_id"
    )
    s = load(spark, sf_dir, "events").select(
        "user_id",
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    )
    steps = s.filter(F.col("dst").isNotNull())
    tm = (
        steps.groupBy("src", "dst")
        .agg(F.count("*").cast("long").alias("c"))
        .select(
            "src",
            "dst",
            "c",
            F.sum("c")
            .over(Window.partitionBy("src"))
            .cast("long")
            .alias("tot"),
        )
    )
    scored = steps.join(F.broadcast(tm), ["src", "dst"]).select(
        "user_id",
        F.floor(
            F.log(F.col("c").cast("double") / F.col("tot")) * _NANO
        )
        .cast("long")
        .alias("step_ll"),
    )
    return scored.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_steps"),
        F.sum("step_ll").cast("long").alias("loglik_nano"),
    )


# ---------------------------------------------------------------------------
# Theil-Sen robust trend: median of pairwise slopes over each user's last
# K events — the breakdown-resistant twin of trend_slope_per_user (one
# fat-finger event moves OLS arbitrarily far; Theil-Sen tolerates ~29%
# contamination). Bounding the window to K recent events bounds the
# quadratic pair count at K*(K-1)/2 per user at ANY event volume.
# ---------------------------------------------------------------------------

_TS_K = 9  # last K events per user -> <= 36 pairwise slopes

# pairwise slope in milli-cents-per-hour, one shared text both engines:
# dc cents / dt_us microseconds * 3.6e9 us/h * 1000 milli
_TS_SLOPE = (
    "CAST(floor(CAST(dc AS DOUBLE) * 3600000000 / dt_us * 1000)"
    " AS BIGINT)"
)


@query(
    "theil_sen_slope",
    oracle=f"""
        WITH r AS (
            SELECT user_id,
                   CAST(epoch_us(ts) AS BIGINT) AS ts_us,
                   CAST(round(value * 100) AS BIGINT) AS c,
                   row_number() OVER (
                       PARTITION BY user_id
                       ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
            FROM events
        ),
        k AS (SELECT * FROM r WHERE rn <= {_TS_K}),
        p AS (
            SELECT a.user_id,
                   a.c - b.c AS dc,
                   a.ts_us - b.ts_us AS dt_us
            FROM k a JOIN k b
              ON a.user_id = b.user_id AND a.rn < b.rn
            WHERE a.ts_us > b.ts_us
        ),
        s AS (SELECT user_id, {_TS_SLOPE} AS slope_milli FROM p)
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n_pairs,
               CAST(percentile_disc(0.5) WITHIN GROUP
                    (ORDER BY slope_milli) AS BIGINT) AS theil_sen_milli
        FROM s GROUP BY user_id
    """,
    description=f"Theil-Sen robust trend slope per user (milli-cents/hour): "
    f"median of all pairwise slopes over the user's last {_TS_K} events — "
    "the estimator that survives ~29% contaminated points where "
    "trend_slope_per_user's OLS breaks on one. The recency window caps "
    f"pairs at {_TS_K}*{_TS_K - 1}/2 per user, so the 'quadratic' join "
    "is O(1) per user at any history depth; same-timestamp pairs are "
    "excluded identically on both engines. The median is exact "
    "percentile_disc semantics via the cumulative-position trick "
    "(first sorted position with 2*pos >= n) on integer milli-slopes. "
    "Plan: one shuffle on user_id feeds the ranking window, the "
    "self-join reuses that partitioning, and the median window walks "
    "<= 36 rows per user",
)
def theil_sen_slope(spark, sf_dir):
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    r = load(spark, sf_dir, "events").select(
        "user_id",
        ts_us.alias("ts_us"),
        F.round(F.col("value") * 100).cast("long").alias("c"),
        F.row_number()
        .over(
            Window.partitionBy("user_id").orderBy(
                F.desc(ts_us), F.desc("event_id")
            )
        )
        .alias("rn"),
    ).filter(F.col("rn") <= _TS_K).transform(scratch_persist)
    # persisted: the pair self-join reads r on BOTH sides — without the
    # persist each branch re-scans events and re-runs the rank window
    a = r.select(
        "user_id",
        F.col("ts_us").alias("ts_a"),
        F.col("c").alias("c_a"),
        F.col("rn").alias("rn_a"),
    )
    b = r.select(
        "user_id",
        F.col("ts_us").alias("ts_b"),
        F.col("c").alias("c_b"),
        F.col("rn").alias("rn_b"),
    )
    p = (
        a.join(b, "user_id")
        .filter(
            (F.col("rn_a") < F.col("rn_b"))
            & (F.col("ts_a") > F.col("ts_b"))
        )
        .select(
            "user_id",
            (F.col("c_a") - F.col("c_b")).alias("dc"),
            (F.col("ts_a") - F.col("ts_b")).alias("dt_us"),
        )
    )
    s = p.select("user_id", F.expr(_TS_SLOPE).alias("slope_milli"))
    w_ord = Window.partitionBy("user_id").orderBy("slope_milli")
    w_all = Window.partitionBy("user_id")
    ranked = s.select(
        "user_id",
        "slope_milli",
        F.row_number().over(w_ord).alias("pos"),
        F.count("*").over(w_all).alias("np"),
    )
    return ranked.groupBy("user_id").agg(
        F.max("np").cast("long").alias("n_pairs"),
        F.min(
            F.when(
                F.col("pos") * 2 >= F.col("np"), F.col("slope_milli")
            )
        )
        .cast("long")
        .alias("theil_sen_milli"),
    )


# ---------------------------------------------------------------------------
# Time-series similarity search, PAA/SAX-style (Keogh et al.; cf. "Time
# Series Similarity Search for Streaming Data in Distributed Systems",
# EDBT 2019): every user's spend series is reduced to a fixed-length
# Piecewise Aggregate Approximation (segment means over the user's own time
# span), candidate pairs are generated ONLY within the same SAX-ish shape
# bucket (the above/below-mean bit pattern of the PAA vector), and exact
# centered-L2 distance ranks the survivors. The quadratic all-pairs join is
# replaced by a bucket self-join — the same banding discipline as the LSH
# dedup family, applied to time series.
# ---------------------------------------------------------------------------

_PAA_S = 8  # PAA segments per user series
_PAA_TOPK = 20


@query(
    "ts_paa_similarity_topk",
    oracle=f"""
        WITH e AS (
            SELECT user_id, epoch_us(ts) // 1000000 AS es,
                   CAST(round(value * 100) AS BIGINT) AS cents
            FROM events WHERE value IS NOT NULL
        ),
        bnd AS (
            SELECT user_id, min(es) AS lo, max(es) AS hi
            FROM e GROUP BY 1
        ),
        seg AS (
            SELECT e.user_id,
                   CAST(floor(CAST((e.es - bnd.lo) * {_PAA_S} AS DOUBLE)
                              / (bnd.hi - bnd.lo + 1)) AS BIGINT) AS s,
                   CAST(floor(CAST(sum(e.cents) AS DOUBLE) / count(*))
                        AS BIGINT) AS m
            FROM e JOIN bnd USING (user_id)
            GROUP BY 1, 2
        ),
        u AS (
            SELECT user_id, list(m ORDER BY s) AS ms
            FROM seg GROUP BY 1 HAVING count(*) = {_PAA_S}
        ),
        v AS (
            SELECT user_id,
                   list_transform(ms, m -> {_PAA_S} * m - list_sum(ms))
                       AS c
            FROM u
        ),
        sx AS (
            SELECT user_id, c,
                   array_to_string(list_transform(range(1, {_PAA_S // 2} + 1),
                       i -> CASE WHEN c[2 * i - 1] + c[2 * i] > 0
                            THEN '1' ELSE '0' END), '')
                       AS shape_code
            FROM v
        )
        SELECT a.user_id AS u1, b.user_id AS u2, a.shape_code AS shape_code,
               CAST(list_sum(list_transform(range(1, {_PAA_S} + 1),
                    i -> (a.c[i] - b.c[i]) * (a.c[i] - b.c[i])))
                    AS BIGINT) AS d2
        FROM sx a JOIN sx b
          ON a.shape_code = b.shape_code AND a.user_id < b.user_id
        ORDER BY d2, u1, u2 LIMIT {_PAA_TOPK}
    """,
    description=f"time-series similarity search: {_PAA_S}-segment PAA "
    "per user (exact integer segment means over the user's own span), "
    "SAX-ish shape bucketing (half-resolution above/below-mean bit "
    "pattern over segment pairs — the coarser word keeps recall at small "
    "corpora), exact "
    "centered-L2 ranking WITHIN buckets only, top-k pairs. Scale shape: "
    "candidates come from a bucket self-join on the shape code — never "
    "an all-pairs join — carrying only (user, 8-int PAA vector); the "
    "final ranking is a TakeOrderedAndProject. The same "
    "banding-before-distance discipline as the LSH dedup family, "
    "applied to series (EDBT 2019's streaming-similarity setting)",
)
def ts_paa_similarity_topk(spark, sf_dir):
    S = _PAA_S
    # NULL measurements are dropped on BOTH sides: Spark's F.aggregate
    # folds propagate a NULL element into the whole sum, where DuckDB's
    # list_sum skips it — filtering keeps the engines on the same series
    e = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "user_id",
            # unix_micros DIV 1e6 matches DuckDB's epoch_us // 1000000
            # (integer ops; timestamps are post-1970 so floor == trunc)
            F.expr("unix_micros(cast(ts as timestamp)) div 1000000").alias(
                "es"
            ),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    bnd = e.groupBy("user_id").agg(
        F.min("es").alias("lo"), F.max("es").alias("hi")
    )
    seg = (
        e.join(bnd, "user_id")
        .select(
            "user_id",
            F.floor(
                ((F.col("es") - F.col("lo")) * S).cast("double")
                / (F.col("hi") - F.col("lo") + 1)
            )
            .cast("long")
            .alias("s"),
            "cents",
        )
        .groupBy("user_id", "s")
        .agg(
            F.floor(F.sum("cents").cast("double") / F.count("*"))
            .cast("long")
            .alias("m")
        )
    )
    u = (
        seg.groupBy("user_id")
        .agg(
            F.sort_array(F.collect_list(F.struct("s", "m"))).alias("sm"),
            F.count("*").alias("nseg"),
        )
        .filter(F.col("nseg") == S)
        .select(
            "user_id", F.transform("sm", lambda x: x["m"]).alias("ms")
        )
    )
    msum = F.aggregate(
        "ms", F.lit(0).cast("long"), lambda a, x: a + x
    )
    v = u.select(
        "user_id",
        F.transform("ms", lambda m: S * m - msum).alias("c"),
    )
    half = F.transform(
        F.sequence(F.lit(1), F.lit(S // 2)),
        lambda i: F.when(
            F.element_at("c", 2 * i - 1) + F.element_at("c", 2 * i) > 0,
            "1",
        ).otherwise("0"),
    )
    sx = v.select("user_id", "c", F.array_join(half, "").alias("shape_code"))
    a = sx.select(
        F.col("user_id").alias("u1"),
        F.col("c").alias("ca"),
        "shape_code",
    )
    b = sx.select(
        F.col("user_id").alias("u2"),
        F.col("c").alias("cb"),
        F.col("shape_code").alias("code_b"),
    )
    d2 = F.aggregate(
        F.zip_with("ca", "cb", lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return (
        a.join(
            b,
            (F.col("shape_code") == F.col("code_b"))
            & (F.col("u1") < F.col("u2")),
        )
        .select("u1", "u2", "shape_code", d2.cast("long").alias("d2"))
        .orderBy("d2", "u1", "u2")
        .limit(_PAA_TOPK)
    )


# ---------------------------------------------------------------------------
# Seasonal-naive forecast backtest — the baseline every forecasting effort
# must beat (M-competition discipline): predict each hour's value with the
# value from the same hour one day earlier, and report exact-integer MAE
# and bias per series. The join-on-shifted-bucket form (not lag-over-rows)
# keeps the alignment TIME-exact under sparse series: a missing hour
# yields no forecast pair instead of silently pairing with the wrong hour.
# ---------------------------------------------------------------------------

_SNAIVE_LAG_H = 24


@query(
    "seasonal_naive_eval",
    oracle=f"""
        WITH h AS (
            SELECT event_type,
                   epoch_us(ts) // 3600000000 AS hb,
                   CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                       AS cents
            FROM events GROUP BY 1, 2
        ),
        j AS (
            SELECT a.event_type, a.cents AS actual, b.cents AS forecast
            FROM h a JOIN h b
              ON a.event_type = b.event_type
             AND b.hb = a.hb - {_SNAIVE_LAG_H}
        )
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_points,
               CAST(floor(CAST(sum(abs(actual - forecast)) * 1000
                               AS DOUBLE) / count(*)) AS BIGINT)
                   AS mae_milli_cents,
               CAST(floor(CAST(sum(actual - forecast) * 1000
                               AS DOUBLE) / count(*)) AS BIGINT)
                   AS bias_milli_cents
        FROM j GROUP BY event_type
    """,
    description=f"seasonal-naive forecast backtest: predict each hour "
    f"from the same hour {_SNAIVE_LAG_H} h earlier and report per-series "
    "MAE and bias in exact integer milli-cents (double-floor division, "
    "identical on both engines since the bias can be negative) — the "
    "baseline any forecasting model must beat. Plan: one partial-agg "
    "hourly rollup, then a self-join on (series, shifted bucket) — both "
    "sides hash-partitioned on the same key, so the alignment is one "
    "co-located shuffle and stays TIME-exact under sparse series (a "
    "missing hour yields no pair, never a misaligned one)",
)
def seasonal_naive_eval(spark, sf_dir):
    h = (
        load(spark, sf_dir, "events")
        .select(
            "event_type",
            F.expr("unix_micros(cast(ts as timestamp)) div 3600000000")
            .alias("hb"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .groupBy("event_type", "hb")
        .agg(F.sum("cents").cast("long").alias("cents"))
    )
    a = h.select("event_type", "hb", F.col("cents").alias("actual"))
    b = h.select(
        "event_type",
        (F.col("hb") + _SNAIVE_LAG_H).alias("hb"),
        F.col("cents").alias("forecast"),
    )
    j = a.join(b, ["event_type", "hb"])
    diff = F.col("actual") - F.col("forecast")
    return (
        j.select("event_type", diff.alias("d"))
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_points"),
            F.floor(
                (F.sum(F.abs(F.col("d"))) * 1000).cast("double")
                / F.count("*")
            )
            .cast("long")
            .alias("mae_milli_cents"),
            F.floor(
                (F.sum("d") * 1000).cast("double") / F.count("*")
            )
            .cast("long")
            .alias("bias_milli_cents"),
        )
    )
