"""Relational query surface (reference Tier-B operators, generalized).

Covers every query-shape the reference exercises on its bronze output
(SURVEY.md §2 Tier B: filter/project/substr/explode/nested-access/cross
join/multi-way equi-join/parameterized predicates/null filters/count/limit)
plus the general analytics the reference lacks (aggregation, windows,
rollup, set ops, semi/anti/outer joins, sessionization) — all stock
DataFrame API, so Catalyst supplies pushdown, pruning, broadcast joins, AQE.

Scale notes per query in docstrings; the common rules:
- dimension tables (region/nation/part/supplier) broadcast — no shuffle of
  the fact table for their joins;
- aggregates go through exact integer units (see suite.py);
- every top-k has a total tiebreak order so results are deterministic.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hls_payer_mrf_sparkstreaming_spark.operators.suite import (
    load,
    query,
    rebalance,
    scratch_persist,
)


def _cents(col) -> F.Column:
    return F.round(col * 100).cast("long")


def _bp(col) -> F.Column:
    """basis points: exact integer for 4-decimal rates (discount, tax)."""
    return F.round(col * 10000).cast("long")


def ranked_value_histogram(
    df,
    group_cols: list,
    value_col: str,
    extra_hist_aggs: tuple = (),
    bucket_bits: int = 13,
):
    """(group, value) histogram with each distinct value's exact global
    rank (cumulative count in value order) per group — the scale-bounded
    building block for exact percentile_disc statistics.

    percentile_disc(p) = the smallest value whose rank satisfies
    ``rank * 100 >= p * n`` — callers aggregate ``min(when(...))`` over
    the returned relation. The point of this shape (vs a single
    group-partitioned running-sum window, the r12 scale-audit max at
    2.1x): a low-cardinality group key turns that window into a handful
    of single-task sorts whose input grows with the number of distinct
    values. Here every window input is DOMAIN-bounded instead:

      1. one map-side-combined groupBy compresses the fact to a
         (group, value) histogram — the only pass over raw rows — which
         is scratch-persisted (its size is bounded by the value domain,
         never by row count);
      2. the histogram rolls up to coarse buckets (``value >>
         bucket_bits``); the per-group cumulative walk runs over the
         BUCKET table, O(domain / 2^bucket_bits) rows per group
         regardless of scale, and is broadcast back;
      3. the within-bucket cumulative walk partitions by (group,
         bucket): <= 2^bucket_bits distinct values per window partition
         — a constant — and thousands of partitions, so it parallelizes
         instead of serializing per group.

    Returns group_cols + [value_col, ``_c`` (count), ``_rank``,
    ``_n`` (group total)] + any ``extra_hist_aggs`` columns (aggregates
    evaluated per (group, value) cell, e.g. min/max of a carried
    column).
    """
    from pyspark.sql import Window

    hist = scratch_persist(
        df.groupBy(*group_cols, value_col)
        .agg(F.count("*").alias("_c"), *extra_hist_aggs)
        .withColumn("_b", F.shiftright(F.col(value_col), bucket_bits))
    )
    run_b = (
        Window.partitionBy(*group_cols)
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    whole = Window.partitionBy(*group_cols)
    buckets = (
        hist.groupBy(*group_cols, "_b")
        .agg(F.sum("_c").alias("_bc"))
        .withColumn("_prior", F.sum("_bc").over(run_b) - F.col("_bc"))
        .withColumn("_n", F.sum("_bc").over(whole))
        .drop("_bc")
    )
    run_v = (
        Window.partitionBy(*group_cols, "_b")
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        hist.withColumn("_cumw", F.sum("_c").over(run_v))
        .join(F.broadcast(buckets), [*group_cols, "_b"])
        .withColumn("_rank", F.col("_prior") + F.col("_cumw"))
        .drop("_b", "_cumw", "_prior")
    )


# ---------------------------------------------------------------------------
# Tier-B core shapes
# ---------------------------------------------------------------------------


@query(
    "filter_eq",
    oracle="""
        SELECT event_id, user_id, value
        FROM events WHERE event_type = 'click'
    """,
    description="string-equality filter + projection (ref q_filter_eq/q_project)",
)
def filter_eq(spark, sf_dir):
    return (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "click")
        .select("event_id", "user_id", "value")
    )


@query(
    "project_substr",
    oracle="""
        SELECT doc_id, substring(text, 1, 20) AS prefix, n_chars
        FROM documents
    """,
    description="substring projection (ref q_substr: substr(json_payload,1,20))",
)
def project_substr(spark, sf_dir):
    return load(spark, sf_dir, "documents").select(
        "doc_id",
        F.substring("text", 1, 20).alias("prefix"),
        "n_chars",
    )


@query(
    "explode_tokens",
    oracle="""
        SELECT token, count(*) AS cnt
        FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        GROUP BY token
    """,
    description="array unnest + aggregate (ref q_explode); generator stays "
    "narrow, the single shuffle is the token groupBy",
)
def explode_tokens(spark, sf_dir):
    return (
        load(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
    )


@query(
    "array_index",
    oracle="""
        SELECT string_split(text, ' ')[1] AS first_token, count(*) AS cnt
        FROM documents GROUP BY first_token
    """,
    description="array element access (ref q_array_index: json_payload[0])",
)
def array_index(spark, sf_dir):
    return (
        load(spark, sf_dir, "documents")
        .select(F.split("text", " ").getItem(0).alias("first_token"))
        .groupBy("first_token")
        .agg(F.count("*").alias("cnt"))
    )


@query(
    "nested_extract",
    oracle="""
        SELECT TRY_CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1)
                        AS BIGINT) AS k_val,
               count(*) AS cnt
        FROM events WHERE props IS NOT NULL
        GROUP BY k_val
    """,
    description="semi-structured field extraction + is-not-null filter "
    "(ref q_nested_access/q_is_not_null, JVM-side regexp, no UDF)",
)
def nested_extract(spark, sf_dir):
    return (
        load(spark, sf_dir, "events")
        .filter(F.col("props").isNotNull())
        .select(
            # try_cast: a props value without the key yields '' from
            # regexp_extract, which an ANSI cast would throw on; NULL
            # k_val is a legitimate group on both engines
            F.regexp_extract("props", r'"k":\s*(\d+)', 1)
            .try_cast("long")
            .alias("k_val")
        )
        .groupBy("k_val")
        .agg(F.count("*").alias("cnt"))
    )


@query(
    "cross_join",
    oracle="""
        SELECT r_name, n_name FROM region CROSS JOIN nation
    """,
    description="cross join of two broadcast-size dims (ref q_join_cross 'on 1=1')",
)
def cross_join(spark, sf_dir):
    return load(spark, sf_dir, "region").crossJoin(
        load(spark, sf_dir, "nation").select("n_name")
    ).select("r_name", "n_name")


@query(
    "surrogate_keys",
    oracle="""
        SELECT md5(concat(n_name, '|', r_name)) AS sk, n_name, r_name
        FROM nation JOIN region ON n_regionkey = r_regionkey
    """,
    description="deterministic content-derived surrogate key (replaces the "
    "reference's uuid(), 01_payer_mrf_demo.py:165,180 — retry-safe at scale)",
)
def surrogate_keys(spark, sf_dir):
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return n.join(r, n.n_regionkey == r.r_regionkey).select(
        F.md5(F.concat("n_name", F.lit("|"), "r_name")).alias("sk"),
        "n_name",
        "r_name",
    )


@query(
    "param_filter",
    oracle="""
        SELECT p.p_brand, strftime(l.l_shipdate, '%Y-%m-%d') AS ship_date,
               sum(CAST(ROUND(l.l_quantity * 100) AS BIGINT)) / 100.0 AS sum_qty
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE p.p_brand = 'Brand#13' AND l.l_shipdate >= TIMESTAMP '1997-01-01'
        GROUP BY p.p_brand, ship_date
    """,
    description="parameterized predicate + broadcast dim join (ref "
    "q_filter_nested getArgument pattern); filter pushed to part scan",
)
def param_filter(spark, sf_dir, brand: str = "Brand#13"):
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_brand") == brand)
    return (
        l.filter(F.col("l_shipdate") >= "1997-01-01")
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy(
            "p_brand", F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_date")
        )
        .agg((F.sum(_cents(F.col("l_quantity"))) / 100.0).alias("sum_qty"))
    )


@query(
    "limit_topk",
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 10
    """,
    description="global top-k with total order (ref q_limit; TakeOrderedAndProject "
    "— per-partition top-k then driver merge, no full sort at scale)",
)
def limit_topk(spark, sf_dir):
    return (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# General analytics (beyond the reference's surface)
# ---------------------------------------------------------------------------


@query(
    "pricing_summary",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               sum(CAST(ROUND(l_quantity * 100) AS BIGINT)) / 100.0 AS sum_qty,
               sum(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) / 100.0 AS sum_base_price,
               sum(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                   * (10000 - CAST(ROUND(l_discount * 10000) AS BIGINT))) / 1000000.0
                   AS sum_disc_price,
               sum(CAST(ROUND(l_quantity * 100) AS BIGINT))
                   / 100.0 / count(*) AS avg_qty,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    description="TPC-H Q1-shape aggregation; partial aggregation map-side, "
    "exact integer units so parallel sum order can't drift",
)
def pricing_summary(spark, sf_dir):
    l = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= "2000-09-02"
    )
    qty_c = _cents(F.col("l_quantity"))
    price_c = _cents(F.col("l_extendedprice"))
    disc_bp = _bp(F.col("l_discount"))
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        (F.sum(qty_c) / 100.0).alias("sum_qty"),
        (F.sum(price_c) / 100.0).alias("sum_base_price"),
        (F.sum(price_c * (10000 - disc_bp)) / 1000000.0).alias("sum_disc_price"),
        (F.sum(qty_c) / 100.0 / F.count("*")).alias("avg_qty"),
        F.count("*").alias("count_order"),
    )


@query(
    "star_join_revenue",
    oracle="""
        SELECT r_name, n_name,
               sum(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                   * (10000 - CAST(ROUND(l_discount * 10000) AS BIGINT))) / 1000000.0
                   AS revenue,
               count(*) AS n_items
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1998-01-01'
        GROUP BY r_name, n_name
    """,
    description="flagship 5-way star join (TPC-H Q5 shape; ref q_join_equi "
    "generalized). customer/nation/region broadcast; single fact shuffle "
    "on l_orderkey for the orders join",
)
def star_join_revenue(spark, sf_dir):
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1998-01-01")
    )
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    dim = F.broadcast(
        c.join(n, c.c_nationkey == n.n_nationkey).join(
            r, F.col("n_regionkey") == r.r_regionkey
        )
    )
    revenue_c = _cents(F.col("l_extendedprice")) * (
        10000 - _bp(F.col("l_discount"))
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(dim, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("r_name", "n_name")
        .agg(
            (F.sum(revenue_c) / 1000000.0).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "window_topk_per_group",
    oracle="""
        SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice
        FROM (
            SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
                   row_number() OVER (
                       PARTITION BY l_returnflag
                       ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
                   ) AS rn
            FROM lineitem
        ) WHERE rn <= 3
    """,
    description="window function top-k per group; rank shuffle partitions by "
    "group key only — no global sort",
)
def window_topk_per_group(spark, sf_dir):
    from pyspark.sql import Window

    w = (
        Window.partitionBy("l_returnflag")
        .orderBy(
            F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber"
        )
    )
    return (
        load(spark, sf_dir, "lineitem")
        .select(
            "l_returnflag",
            "l_orderkey",
            "l_linenumber",
            "l_extendedprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )


@query(
    "rollup_counts",
    oracle="""
        SELECT r_name, n_name, count(*) AS n_customers
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP(r_name, n_name)
    """,
    description="hierarchical rollup (grouping sets) over broadcast dims",
)
def rollup_counts(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(F.count("*").alias("n_customers"))
    )


@query(
    "skew_salted_join",
    oracle="""
        SELECT l_orderkey,
               count(*) AS n_lines,
               o_orderstatus,
               sum(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) / 100.0
                   AS sum_price
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY l_orderkey, o_orderstatus
    """,
    description="salted fact-dim join (hot keys spread over 8 salt "
    "buckets; dim exploded per salt) — result provably identical to the "
    "plain join via the oracle",
)
def skew_salted_join(spark, sf_dir):
    from hls_payer_mrf_sparkstreaming_spark.functions.skew import salted_join

    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus"
    )
    joined = salted_join(
        li, orders, on="l_orderkey", n_salt=8, salt_from="l_linenumber"
    )
    return joined.groupBy("l_orderkey", "o_orderstatus").agg(
        F.count("*").alias("n_lines"),
        (F.sum(_cents(F.col("l_extendedprice"))) / 100.0).alias("sum_price"),
    )


@query(
    "cube_counts",
    oracle="""
        SELECT event_type, user_id % 10 AS user_bucket, count(*) AS n_events
        FROM events
        GROUP BY CUBE(event_type, user_bucket)
    """,
    description="full cube over two low-cardinality dimensions (all four "
    "grouping sets in one pass, map-side partial aggregation)",
)
def cube_counts(spark, sf_dir):
    return (
        load(spark, sf_dir, "events")
        .withColumn("user_bucket", F.col("user_id") % 10)
        .cube("event_type", "user_bucket")
        .agg(F.count("*").alias("n_events"))
    )


@query(
    "approx_distinct_users",
    oracle="""
        SELECT event_type, TRUE AS within_bounds
        FROM events GROUP BY event_type
    """,
    description="approx_count_distinct (HyperLogLog++) per event_type — the "
    "sketch path for cardinality at 100 TB where exact distinct would "
    "shuffle every key; rsd=0.01. The sketch value itself is "
    "engine-specific, so the ORACLE-CHECKED output is the error-bound "
    "predicate: |approx - exact| / exact <= 5*rsd, computed inside the "
    "query. This registered entry is the VERIFICATION TWIN (it pays for "
    "the exact count on purpose, to judge the sketch); production reads "
    "approx_distinct_users_sketch below, which never computes the exact "
    "distinct. DuckDB's twin is the constant-TRUE relation, so a sketch "
    "drifting out of its published bound turns the driver row red",
)
def approx_distinct_users(spark, sf_dir):
    rsd = 0.01
    # The exact side is a TWO-LEVEL aggregate (distinct pairs, then count
    # per group), not count_distinct in a mixed agg: combining exact and
    # approx distincts in one agg forces an Expand (2 rows per input) and
    # an object-hash buffer holding every group's value set — the
    # two-level shape is partial-aggregable on both hops and measured
    # 1.9 s -> 0.8 s at sf0.1. Same discipline a 100 TB run needs: the
    # wide shuffle carries (event_type, user_id) pairs once, never an
    # expanded row stream.
    ev = load(spark, sf_dir, "events").select("event_type", "user_id")
    exact = (
        # NULL user_id would count as one distinct "user" in the two-level
        # shape but is excluded by approx_count_distinct — filter it so the
        # exact and approx sides count the same domain (the predicate can
        # flip near the 5*rsd boundary otherwise)
        ev.filter(F.col("user_id").isNotNull())
        .groupBy("event_type", "user_id")
        .agg(F.lit(1).alias("_x"))
        .groupBy("event_type")
        .agg(F.count("*").alias("exact_users"))
    )
    approx = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=rsd).alias("approx_users")
    )
    return approx.join(exact, "event_type").select(
        "event_type",
        (
            F.abs(F.col("approx_users") - F.col("exact_users"))
            / F.col("exact_users")
            <= 5 * rsd
        ).alias("within_bounds"),
    )


def approx_distinct_users_sketch(spark, sf_dir):
    """Production shape of approx_distinct_users: sketch only, no exact
    twin — one partial-agg shuffle carrying fixed-size HLL buffers instead
    of every distinct (event_type, user_id) pair. Accuracy is certified by
    the registered verification twin; this plan is pinned shuffle-light by
    tests/test_plans.py."""
    return (
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users")
        )
    )


@query(
    "set_ops",
    oracle="""
        SELECT c_custkey, 'both' AS tag FROM (
            SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
            INTERSECT
            SELECT o_custkey FROM orders
        )
        UNION ALL
        SELECT c_custkey, 'no_orders' AS tag FROM (
            SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
            EXCEPT
            SELECT o_custkey FROM orders
        )
    """,
    description="INTERSECT / EXCEPT / UNION ALL composition",
)
def set_ops(spark, sf_dir):
    seg = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    with_orders = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey")
    )
    both = seg.intersect(with_orders).withColumn("tag", F.lit("both"))
    none = seg.exceptAll(with_orders.distinct()).distinct().withColumn(
        "tag", F.lit("no_orders")
    )
    return both.unionAll(none)


@query(
    "semi_anti_join",
    oracle="""
        SELECT c_custkey, 'has_orders' AS tag FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        UNION ALL
        SELECT c_custkey, 'no_orders' AS tag FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    description="left-semi and left-anti joins (EXISTS / NOT EXISTS)",
)
def semi_anti_join(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    semi = (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey")
        .withColumn("tag", F.lit("has_orders"))
    )
    anti = (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey")
        .withColumn("tag", F.lit("no_orders"))
    )
    return semi.unionAll(anti)


@query(
    "outer_join_counts",
    oracle="""
        SELECT n_name, count(c_custkey) AS n_customers,
               coalesce(min(c_acctbal), 0.0) AS min_acctbal
        FROM nation LEFT JOIN customer ON n_nationkey = c_nationkey
        GROUP BY n_name
    """,
    description="left outer join with null-aware aggregates",
)
def outer_join_counts(spark, sf_dir):
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    return (
        n.join(c, n.n_nationkey == c.c_nationkey, "left")
        .groupBy("n_name")
        .agg(
            F.count("c_custkey").alias("n_customers"),
            F.coalesce(F.min("c_acctbal"), F.lit(0.0)).alias("min_acctbal"),
        )
    )


@query(
    "windowed_agg_events",
    oracle="""
        SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', ts)) AS BIGINT)
                   AS window_start_epoch,
               event_type,
               count(*) AS n_events,
               sum(CAST(ROUND(value * 100) AS BIGINT)) / 100.0 AS sum_value
        FROM events
        GROUP BY window_start_epoch, event_type
    """,
    description="tumbling-window aggregation (batch twin of the streaming "
    "pipeline in streaming/events.py; epoch output dodges tz-type skew)",
)
def windowed_agg_events(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.window("ts", "1 hour").alias("w"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            (F.sum(_cents(F.col("value"))) / 100.0).alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start_epoch"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@query(
    "sessionize",
    oracle="""
        WITH marked AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w)
                             <= 1800000000
                        THEN 0 ELSE 1 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT user_id,
               CAST(sum(new_session) AS BIGINT) AS n_sessions,
               count(*) AS n_events
        FROM marked GROUP BY user_id
    """,
    description="gap-based sessionization via lag window (batch twin of "
    "stateful streaming sessionization); microsecond-exact gap compare",
)
def sessionize(spark, sf_dir):
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = 30 * 60 * 1_000_000
    marked = load(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            (
                F.unix_micros(F.col("ts").cast("timestamp"))
                - F.unix_micros(F.lag(F.col("ts").cast("timestamp")).over(w))
            )
            <= gap_us,
            0,
        )
        .otherwise(1)
        .alias("new_session"),
    )
    return marked.groupBy("user_id").agg(
        F.sum("new_session").cast("long").alias("n_sessions"),
        F.count("*").alias("n_events"),
    )


@query(
    "distinct_agg",
    oracle="""
        SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
        FROM events GROUP BY event_type
    """,
    description="exact distinct aggregation (two-phase: partial distinct "
    "then merge)",
)
def distinct_agg(spark, sf_dir):
    return (
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count("*").alias("n_events"),
        )
    )


@query(
    "percentile_summary",
    oracle="""
        SELECT l_returnflag,
               count(*) AS n_items,
               percentile_disc(0.5) WITHIN GROUP (ORDER BY
                   CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0
                   AS median_price,
               percentile_disc(0.95) WITHIN GROUP (ORDER BY
                   CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0
                   AS p95_price,
               min(l_extendedprice) AS min_price,
               max(l_extendedprice) AS max_price
        FROM lineitem GROUP BY l_returnflag
    """,
    description="exact discrete percentiles (median / p95) per group — "
    "percentile_disc semantics (smallest value whose cumulative relative "
    "frequency reaches p, no interpolation) computed on integer cents so "
    "Spark and the oracle agree bit-for-bit. Plan (r13 rework — the old "
    "single running-sum window partitioned by the ~3-value group key was "
    "3 single-task sorts growing with distinct cents, the r12 10x scale "
    "max at 2.1x): ranked_value_histogram's bounded-bucket two-level "
    "walk — one map-side-combined (group, cents) histogram is the only "
    "pass over raw rows, the per-group cumulative runs over the COARSE "
    "BUCKET rollup (domain/8192 rows, data-size-independent) and "
    "broadcasts back, and the within-bucket walk partitions by (group, "
    "bucket) so each sort is <= 8192 distinct values and thousands of "
    "partitions run in parallel. Both percentiles come from the same "
    "exact integer rank (rank*2 >= n, rank*100 >= 95*n)",
)
def percentile_summary(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        _cents(F.col("l_extendedprice")).alias("price_cents"),
        "l_extendedprice",
    )
    r = ranked_value_histogram(
        li,
        ["l_returnflag"],
        "price_cents",
        extra_hist_aggs=(
            F.min("l_extendedprice").alias("mn"),
            F.max("l_extendedprice").alias("mx"),
        ),
    )
    return r.groupBy("l_returnflag").agg(
        F.max("_n").alias("n_items"),
        (
            F.min(
                F.when(F.col("_rank") * 2 >= F.col("_n"), F.col("price_cents"))
            )
            / 100.0
        ).alias("median_price"),
        (
            F.min(
                F.when(
                    F.col("_rank") * 100 >= 95 * F.col("_n"),
                    F.col("price_cents"),
                )
            )
            / 100.0
        ).alias("p95_price"),
        F.min("mn").alias("min_price"),
        F.max("mx").alias("max_price"),
    )


_PIVOT_PRIORITIES = [
    ("1-URGENT", "urgent"),
    ("2-HIGH", "high"),
    ("3-MEDIUM", "medium"),
    ("4-NOT SPECIFIED", "not_specified"),
    ("5-LOW", "low"),
]


@query(
    "pivot_counts",
    oracle="""
        SELECT o_orderstatus,
               count(*) FILTER (WHERE o_orderpriority = '1-URGENT')
                   AS urgent,
               count(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS high,
               count(*) FILTER (WHERE o_orderpriority = '3-MEDIUM')
                   AS medium,
               count(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED')
                   AS not_specified,
               count(*) FILTER (WHERE o_orderpriority = '5-LOW') AS low
        FROM orders GROUP BY o_orderstatus
    """,
    description="pivot: order priorities to columns, count per status — "
    "explicit pivot value list keeps it a single-pass partial aggregation "
    "(no value-discovery job); nulls for empty cells coalesced to 0 to "
    "match the FILTER-aggregate oracle",
)
def pivot_counts(spark, sf_dir):
    pivoted = (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .pivot("o_orderpriority", [v for v, _ in _PIVOT_PRIORITIES])
        .count()
    )
    return pivoted.select(
        "o_orderstatus",
        *[
            F.coalesce(F.col(f"`{v}`"), F.lit(0)).alias(alias)
            for v, alias in _PIVOT_PRIORITIES
        ],
    )


@query(
    "repartition_roundtrip",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               count(*) AS n_items,
               sum(CAST(round(l_quantity * 100) AS BIGINT)) / 100.0
                   AS sum_qty
        FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
    description="explicit repartition on the aggregation keys before the "
    "groupBy (reference q_repartition, README.md:85 .rdd.repartition(20)): "
    "Catalyst reuses the hash partitioning so only ONE exchange appears in "
    "the plan; results are partitioning-invariant, which the oracle proves",
)
def repartition_roundtrip(spark, sf_dir):
    return (
        load(spark, sf_dir, "lineitem")
        .repartition(32, "l_returnflag", "l_linestatus")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n_items"),
            (F.sum(_cents(F.col("l_quantity"))) / 100.0).alias("sum_qty"),
        )
    )


@query(
    "approx_percentile_summary",
    oracle="""
        SELECT l_returnflag, TRUE AS median_within_bounds,
               TRUE AS p95_within_bounds
        FROM lineitem GROUP BY l_returnflag
    """,
    description="approx_percentile (KLL-family sketch) of extended price "
    "per return flag — the sketch path for quantiles at 100 TB: mergeable "
    "per-partition sketches, one skinny shuffle, bounded rank error "
    "(accuracy=10000 -> ~0.01%), where the exact percentile_disc in "
    "percentile_summary needs a per-group sort. The sketch value is "
    "engine-specific, so the ORACLE-CHECKED output is the rank-error "
    "predicate: each approx quantile must land between the exact "
    "(p±0.005)-quantile values, computed in the same aggregation. This "
    "registered entry is the VERIFICATION TWIN (it pays for the exact "
    "percentiles on purpose); production reads "
    "approx_percentile_sketch below, which keeps sketch-only cost. "
    "DuckDB's twin is the constant-TRUE relation, so a sketch outside "
    "its rank-error bound turns the driver row red",
)
def approx_percentile_summary(spark, sf_dir):
    eps = 0.005  # >= 50x the configured ~0.0001 rank error
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.percentile_approx(
                "l_extendedprice", [0.5, 0.95], 10000
            ).alias("approx_p"),
            F.expr(
                "percentile_disc(array(0.495, 0.505, 0.945, 0.955)) "
                "WITHIN GROUP (ORDER BY l_extendedprice)"
            ).alias("exact_p"),
        )
        .select(
            "l_returnflag",
            F.col("approx_p")[0]
            .between(F.col("exact_p")[0], F.col("exact_p")[1])
            .alias("median_within_bounds"),
            F.col("approx_p")[1]
            .between(F.col("exact_p")[2], F.col("exact_p")[3])
            .alias("p95_within_bounds"),
        )
    )


def approx_percentile_sketch(spark, sf_dir):
    """Production shape of approx_percentile_summary: mergeable quantile
    sketch only — no exact percentile_disc, so no per-group value-count
    state. Accuracy is certified by the registered verification twin;
    plan pinned sort-free by tests/test_plans.py."""
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.percentile_approx(
                "l_extendedprice", [0.5, 0.95], 10000
            ).alias("approx_p")
        )
    )


@query(
    "grouping_sets_revenue",
    oracle="""
        SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
               COALESCE(l_linestatus, 'ALL') AS linestatus,
               CAST(count(*) AS BIGINT) AS n_items,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS revenue_cents
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), ())
    """,
    description="GROUPING SETS aggregation — detail, per-flag subtotal and "
    "grand total in ONE pass (vs three scans if issued separately); "
    "completes the rollup_counts/cube_counts family with the general "
    "grouping-set form. NULL grouping slots are COALESCEd to a sentinel "
    "so the hash-compared output is engine-neutral; revenue in exact "
    "integer cents. Catalyst expands the sets via a single Expand node "
    "feeding one partial-agg shuffle, so at 100 TB the fact table is "
    "read and shuffled once for all three granularities",
)
def grouping_sets_revenue(spark, sf_dir):
    return (
        load(spark, sf_dir, "lineitem")
        .groupingSets(
            [["l_returnflag", "l_linestatus"], ["l_returnflag"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            F.count("*").cast("long").alias("n_items"),
            F.sum(_cents(F.col("l_extendedprice")))
            .cast("long")
            .alias("revenue_cents"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n_items",
            "revenue_cents",
        )
    )


_Q3_CUT_US = 883_612_800_000_000  # 1998-01-01 00:00:00 UTC in microseconds


@query(
    "top_unshipped_orders",
    oracle=f"""
        SELECT l.l_orderkey,
               CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                        * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
                    AS BIGINT) AS revenue_u,
               CAST(epoch_us(o.o_orderdate) AS BIGINT) AS orderdate_us,
               o.o_orderpriority
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND epoch_us(o.o_orderdate) < {_Q3_CUT_US}
          AND epoch_us(l.l_shipdate) > {_Q3_CUT_US}
        GROUP BY l.l_orderkey, orderdate_us, o.o_orderpriority
        ORDER BY revenue_u DESC, l.l_orderkey
        LIMIT 10
    """,
    description="TPC-H Q3 shape: top-10 highest-revenue orders placed "
    "before the cutoff but not yet shipped, for one market segment — "
    "the classic join + aggregate + top-k reporting query. Revenue in "
    "exact integer price-cents x discount-basis-points units (no float "
    "sum to drift under parallelism); date predicates compare integer "
    "microsecond epochs so timestamp-type semantics can't diverge. "
    "Plan: both filters push to their scans, customer (filtered to one "
    "segment) broadcasts, the only fact shuffle is the partial-agg "
    "groupBy on l_orderkey, and the top-10 is TakeOrderedAndProject — "
    "never a global sort of the aggregate output",
)
def top_unshipped_orders(spark, sf_dir):
    ep = lambda c: F.expr(  # noqa: E731
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', {c})"
    ).cast("long")
    # date predicates compare the COLUMN to a timestamp literal (the
    # cutoff re-expressed from integer µs), not a timestampdiff() over it:
    # a filter on a derived expression never reaches the parquet scan
    # (guide §6 — PushedFilters stayed empty), while the literal compare
    # pushes down and lets row-group min/max stats skip data. Equivalent
    # predicate: timestampdiff(µs, epoch, col) < C  <=>  col < epoch + C.
    cut = "TIMESTAMP_NTZ'1998-01-01 00:00:00'"  # = _Q3_CUT_US µs
    cust = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = (
        load(spark, sf_dir, "orders")
        .filter(F.expr(f"o_orderdate < {cut}"))
        .select(
            "o_orderkey",
            "o_custkey",
            ep("o_orderdate").alias("orderdate_us"),
            "o_orderpriority",
        )
    )
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(F.expr(f"l_shipdate > {cut}"))
        .select(
            "l_orderkey",
            (
                F.round(F.col("l_extendedprice") * 100).cast("long")
                * (100 - F.round(F.col("l_discount") * 100).cast("long"))
            ).alias("rev_u"),
        )
    )
    # customer (one segment) broadcasts; orders-x-lineitem shuffles on the
    # order key — orders is a fact table at scale and must NOT broadcast
    qualifying = orders.join(
        F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"]
    ).select("o_orderkey", "orderdate_us", "o_orderpriority")
    return (
        li.join(qualifying, li["l_orderkey"] == F.col("o_orderkey"))
        .groupBy("l_orderkey", "orderdate_us", "o_orderpriority")
        .agg(F.sum("rev_u").cast("long").alias("revenue_u"))
        .select("l_orderkey", "revenue_u", "orderdate_us", "o_orderpriority")
        .orderBy(F.col("revenue_u").desc(), "l_orderkey")
        .limit(10)
    )


@query(
    "skyline_pareto",
    oracle="""
        WITH per AS (
            SELECT p_size,
                   min(CAST(round(p_retailprice * 100) AS BIGINT))
                       AS min_price_cents,
                   CAST(count(*) AS BIGINT) AS n_parts
            FROM part GROUP BY p_size
        ),
        runs AS (
            SELECT p_size, min_price_cents, n_parts,
                   min(min_price_cents) OVER (
                       ORDER BY p_size DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ) AS best_larger
            FROM per
        )
        SELECT p_size, min_price_cents, n_parts
        FROM runs
        WHERE best_larger IS NULL OR min_price_cents < best_larger
    """,
    description="skyline (Pareto frontier) query: the parts that are "
    "non-dominated on (maximize size, minimize price) — dominance "
    "removal, the classic multi-criteria shortlist operator. Computed "
    "WITHOUT any pairwise dominance join: one partial-agg groupBy "
    "collapses the corpus to per-size minima (prices in exact integer "
    "cents), then a running-min window over the BOUNDED size domain "
    "(~50 rows at any corpus scale, so the single-partition window is "
    "trivially safe) keeps exactly the rows cheaper than every larger "
    "size. The naive NOT-EXISTS self-join is quadratic in rows; this is "
    "one scan + a K-row window — the dimensionality-1 frontier trick "
    "that works whenever one criterion has a small value domain",
)
def skyline_pareto(spark, sf_dir):
    from pyspark.sql import Window

    per = (
        load(spark, sf_dir, "part")
        .groupBy("p_size")
        .agg(
            F.min(F.round(F.col("p_retailprice") * 100).cast("long")).alias(
                "min_price_cents"
            ),
            F.count("*").cast("long").alias("n_parts"),
        )
    )
    w = Window.orderBy(F.col("p_size").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    runs = per.withColumn(
        "best_larger", F.min("min_price_cents").over(w)
    )
    return runs.filter(
        F.col("best_larger").isNull()
        | (F.col("min_price_cents") < F.col("best_larger"))
    ).select("p_size", "min_price_cents", "n_parts")


@query(
    "mode_per_group",
    oracle="""
        WITH c AS (
            SELECT o_orderstatus, o_orderpriority,
                   CAST(count(*) AS BIGINT) AS n
            FROM orders GROUP BY 1, 2
        )
        SELECT o_orderstatus, o_orderpriority AS mode_priority, n
        FROM (
            SELECT o_orderstatus, o_orderpriority, n,
                   row_number() OVER (
                       PARTITION BY o_orderstatus
                       ORDER BY n DESC, o_orderpriority
                   ) AS rn
            FROM c
        ) WHERE rn = 1
    """,
    description="statistical mode per group with a DETERMINISTIC tie-break "
    "(highest count, then smallest value — built-in mode()/max_by() pick "
    "an arbitrary winner on ties, which breaks reproducibility across "
    "engines and even across runs): one map-side-combinable groupBy "
    "collapses the corpus to (group, value) counts, then a row_number "
    "window runs over the BOUNDED #groups x #values relation — the fact "
    "table shuffles once, the window never sees raw rows",
)
def mode_per_group(spark, sf_dir):
    from pyspark.sql import Window

    c = (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").cast("long").alias("n"))
    )
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("n").desc(), "o_orderpriority"
    )
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("mode_priority"),
            "n",
        )
    )


_SW_GAP_US = 30 * 60 * 1_000_000


@query(
    "sessionize_native",
    oracle=f"""
        WITH marked AS (
            SELECT user_id, ts,
                   CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w)
                             < {_SW_GAP_US}
                        THEN 0 ELSE 1 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ),
        sids AS (
            SELECT user_id, ts,
                   sum(new_session) OVER (
                       PARTITION BY user_id ORDER BY ts
                       ROWS UNBOUNDED PRECEDING
                   ) AS sid
            FROM marked
        )
        SELECT user_id,
               CAST(epoch_us(min(ts)) AS BIGINT) AS session_start_us,
               CAST(epoch_us(max(ts)) + {_SW_GAP_US} AS BIGINT)
                   AS session_end_us,
               count(*) AS n_events
        FROM sids GROUP BY user_id, sid
    """,
    description="per-session rows via Spark's NATIVE session_window "
    "operator (dynamic-gap session aggregation inside one groupBy — no "
    "lag/cumsum window chain), proved equivalent to the islands rewrite "
    "the oracle replays: sessions merge while consecutive events are "
    "strictly within the 30-min gap, window end = last event + gap. "
    "Complements sessionize (the lag composition) and sessionize_stream "
    "(applyInPandasWithState): three expressions of one semantic, "
    "cross-checked. Plan: session_window is a single partial-aggregable "
    "session merge keyed by user_id — one shuffle, state bounded per key",
)
def sessionize_native(spark, sf_dir):
    e = load(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    return (
        e.groupBy(
            F.session_window("ts", "30 minutes").alias("sw"), "user_id"
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_micros("sw.start").alias("session_start_us"),
            F.unix_micros("sw.end").alias("session_end_us"),
            "n_events",
        )
    )


_SLIDE_US = 30 * 60 * 1_000_000  # 30-min slide
_WIN_SLOTS = 2  # 1-hour window / 30-min slide


@query(
    "sliding_window_counts",
    oracle=f"""
        SELECT (epoch_us(ts) // {_SLIDE_US} - v.i) * {_SLIDE_US}
                   AS window_start_us,
               event_type,
               count(*) AS n_events
        FROM events
        CROSS JOIN (VALUES (0), (1)) v(i)
        GROUP BY 1, 2
    """,
    description="sliding-window aggregation via Spark's native "
    "window('1 hour', '30 minutes') — each event lands in "
    f"{_WIN_SLOTS} overlapping hourly slots; the oracle replays the slot "
    "assignment as integer epoch arithmetic (slot k = slide-aligned "
    "start k steps back), proving the built-in generator's slot math. "
    "Completes the window family: tumbling (windowed_agg_events), "
    "session (sessionize_native), sliding (here). Plan: the window "
    "expression EXPANDS rows map-side (narrow generator) and one "
    "partial-agg groupBy shuffles (slot, type) counts — state per key "
    "is one counter regardless of corpus size",
)
def sliding_window_counts(spark, sf_dir):
    e = load(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    return (
        e.groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type"
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            F.unix_micros("w.start").alias("window_start_us"),
            "event_type",
            "n_events",
        )
    )


@query(
    "pareto_share_curve",
    oracle="""
        WITH per AS (
            SELECT o_custkey,
                   sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
            FROM orders GROUP BY o_custkey
        ),
        ranked AS (
            SELECT o_custkey, cents,
                   row_number() OVER (ORDER BY cents DESC, o_custkey)
                       AS rnk,
                   sum(cents) OVER (ORDER BY cents DESC, o_custkey
                                    ROWS UNBOUNDED PRECEDING) AS cum,
                   sum(cents) OVER () AS total,
                   count(*) OVER () AS n
            FROM per
        )
        SELECT rnk * 100 // n AS cust_pctl,
               CAST(max(cum * 1000000 // total) AS BIGINT)
                   AS revenue_share_ppm
        FROM ranked GROUP BY 1
    """,
    description="Pareto concentration curve (the 80/20 audit): customers "
    "ranked by revenue, cumulative revenue share in exact integer ppm at "
    "each customer percentile — the inequality profile that decides "
    "whether a handful of keys dominate a corpus (and therefore whether "
    "skew mitigation is needed downstream). Plan: the corpus collapses "
    "to per-key totals in one partial-agg groupBy; the ranking windows "
    "run over the DISTINCT-KEY relation (not raw rows). The global-order "
    "window is the honest cost — at billion-key scale the same curve "
    "comes from a quantile-sketch of per-key totals; this exact form is "
    "the oracle anchor for that sketch",
)
def pareto_share_curve(spark, sf_dir):
    from pyspark.sql import Window

    per = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "cents"
            )
        )
    )
    word = Window.orderBy(F.col("cents").desc(), "o_custkey")
    wall = Window.partitionBy()
    ranked = per.select(
        F.row_number().over(word).alias("rnk"),
        F.sum("cents")
        .over(word.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum"),
        F.sum("cents").over(wall).alias("total"),
        F.count("*").over(wall).alias("n"),
    )
    return (
        ranked.groupBy(F.expr("rnk * 100 div n").alias("cust_pctl"))
        .agg(
            F.max(F.expr("cum * 1000000 div total"))
            .cast("long")
            .alias("revenue_share_ppm")
        )
    )


# ---------------------------------------------------------------------------
# Market-basket co-occurrence: "parts ordered together" — the self-join
# whose blow-up is bounded by basket size, the classic recommend/affinity
# primitive.
# ---------------------------------------------------------------------------

_COPURCHASE_TOPK = 20


@query(
    "copurchase_pairs",
    oracle=f"""
        WITH li AS (
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        ),
        pairs AS (
            SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
            FROM li a JOIN li b
              ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey < b.l_partkey
        )
        SELECT part_a, part_b, CAST(count(*) AS BIGINT) AS n_orders
        FROM pairs GROUP BY part_a, part_b
        ORDER BY n_orders DESC, part_a, part_b
        LIMIT {_COPURCHASE_TOPK}
    """,
    description="market-basket co-occurrence: top part pairs appearing in "
    "the same order — the affinity/recommendation primitive. The "
    "self-join is blocked on the order key, so the blow-up is bounded "
    "by basket size squared (TPC-H baskets are <= 7 items) — NEVER "
    "all-pairs over the catalog; pair counting is one "
    "partially-aggregated groupBy and the top-k is "
    "TakeOrderedAndProject. The same shape at 100 TB (pair explosion "
    "bounded per basket, shuffle carries (part_a, part_b) ids only)",
)
def copurchase_pairs(spark, sf_dir):
    # r13: the distinct + self-join needed three exchanges (the
    # (orderkey, partkey) distinct, the orderkey-keyed join, the pair
    # aggregation). Collapsing each basket to ONE sorted distinct-part
    # array (collect_set partial-aggregates map-side) and generating the
    # a<b pairs in-row cuts that to two exchanges and drops the join;
    # the fan-out stays bounded by basket size squared exactly as the
    # join was (TPC-H baskets <= 7 items), just materialized per row
    # instead of per join match.
    baskets = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("parts"))
    )
    pairs = baskets.select(
        F.explode(
            F.expr(
                "flatten(transform(parts, (x, i) -> "
                "transform(slice(parts, i + 2, size(parts)), "
                "y -> struct(x AS part_a, y AS part_b))))"
            )
        ).alias("pr")
    )
    return (
        pairs.select("pr.part_a", "pr.part_b")
        .groupBy("part_a", "part_b")
        .agg(F.count("*").cast("long").alias("n_orders"))
        .orderBy(F.desc("n_orders"), "part_a", "part_b")
        .limit(_COPURCHASE_TOPK)
    )


# ---------------------------------------------------------------------------
# Sequence mining lite: the most common session-opening paths — which first
# three actions do sessions start with? The product-analytics primitive
# behind onboarding funnels and bot detection.
# ---------------------------------------------------------------------------

_PATH_LEN = 3
_PATH_TOPK = 15


@query(
    "session_path_topk",
    oracle=f"""
        WITH marked AS (
            SELECT user_id, ts, event_id, event_type,
                   CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w)
                             <= 1800000000
                        THEN 0 ELSE 1 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sess AS (
            SELECT user_id, ts, event_id, event_type,
                   sum(new_session) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS session_id
            FROM marked
        ),
        numbered AS (
            SELECT user_id, session_id, event_type,
                   row_number() OVER (
                       PARTITION BY user_id, session_id
                       ORDER BY ts, event_id
                   ) AS rn
            FROM sess
        ),
        paths AS (
            SELECT user_id, session_id,
                   string_agg(event_type, '>' ORDER BY rn) AS path
            FROM numbered WHERE rn <= {_PATH_LEN}
            GROUP BY user_id, session_id
        )
        SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
        FROM paths GROUP BY path
        ORDER BY n_sessions DESC, path
        LIMIT {_PATH_TOPK}
    """,
    description="session-opening path mining: sessions (30-min gap rule, "
    "shared with sessionize) reduced to their first "
    f"{_PATH_LEN} ordered event types, counted, top-{_PATH_TOPK} — the "
    "sequence-mining primitive behind onboarding funnels and bot "
    "screens. All windows share ONE hash partitioning on user_id "
    "(session derivation, numbering), then paths partial-aggregate and "
    "the top-k is TakeOrderedAndProject. Deterministic tie-breaks "
    "(event_id within ts, path text at equal counts) keep the result "
    "hash-exact",
)
def session_path_topk(spark, sf_dir):
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = 30 * 60 * 1_000_000
    marked = load(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(
            (
                F.unix_micros(F.col("ts").cast("timestamp"))
                - F.unix_micros(
                    F.lag(F.col("ts").cast("timestamp")).over(w)
                )
            )
            <= gap_us,
            0,
        )
        .otherwise(1)
        .alias("new_session"),
    )
    sess = marked.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.sum("new_session")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("session_id"),
    )
    wn = Window.partitionBy("user_id", "session_id").orderBy(
        "ts", "event_id"
    )
    numbered = sess.select(
        "user_id",
        "session_id",
        "event_type",
        F.row_number().over(wn).alias("rn"),
    ).filter(F.col("rn") <= _PATH_LEN)
    paths = numbered.groupBy("user_id", "session_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                lambda s: s["event_type"],
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").cast("long").alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), "path")
        .limit(_PATH_TOPK)
    )
