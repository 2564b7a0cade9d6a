"""Feature-statistics operators computed from EXACT integer moments.

Pearson correlation / covariance / OLS slope are ratios of sums; summed
in floating point their value depends on Spark's partial-aggregation
order. Summing exact integer units (cents for ``value``, raw ints for
the prop) makes every moment bit-exact regardless of parallelism, and
the final double-precision combination of six identical integers is
identical on every engine — so even these "statistical" outputs
hash-match the oracle. Float outputs are floored into nano-units (Spark
and DuckDB round() disagree at decimal half boundaries; floor of an
identical double never does).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hls_payer_mrf_sparkstreaming_spark.operators.suite import (
    load,
    query,
    rebalance,
    scratch_persist,
)

_NANO = 1_000_000_000


@query(
    "corr_stats",
    oracle=f"""
        WITH e0 AS (
            SELECT event_type,
                   CAST(round(value * 100) AS BIGINT) AS x,
                   TRY_CAST(regexp_extract(props, '[0-9]+') AS BIGINT) AS y
            FROM events
        ),
        e AS (
            SELECT * FROM e0 WHERE x IS NOT NULL AND y IS NOT NULL
        ),
        m AS (
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(x) AS BIGINT) AS sx,
                   CAST(sum(y) AS BIGINT) AS sy,
                   CAST(sum(x * y) AS BIGINT) AS sxy,
                   CAST(sum(x * x) AS BIGINT) AS sxx,
                   CAST(sum(y * y) AS BIGINT) AS syy
            FROM e GROUP BY event_type
        )
        SELECT event_type, n,
               CAST(floor((CAST(n AS DOUBLE) * sxy
                           - CAST(sx AS DOUBLE) * sy)
                          / (CAST(n AS DOUBLE) * n) * {_NANO}) AS BIGINT)
                   AS covar_nano,
               CAST(CASE WHEN (CAST(n AS DOUBLE) * sxx
                               - CAST(sx AS DOUBLE) * sx)
                              * (CAST(n AS DOUBLE) * syy
                                 - CAST(sy AS DOUBLE) * sy) = 0 THEN NULL
                    ELSE floor((CAST(n AS DOUBLE) * sxy
                                - CAST(sx AS DOUBLE) * sy)
                               / sqrt((CAST(n AS DOUBLE) * sxx
                                       - CAST(sx AS DOUBLE) * sx)
                                      * (CAST(n AS DOUBLE) * syy
                                         - CAST(sy AS DOUBLE) * sy))
                               * {_NANO}) END AS BIGINT) AS corr_nano,
               CAST(CASE WHEN CAST(n AS DOUBLE) * sxx
                              - CAST(sx AS DOUBLE) * sx = 0 THEN NULL
                    ELSE floor((CAST(n AS DOUBLE) * sxy
                                - CAST(sx AS DOUBLE) * sy)
                               / (CAST(n AS DOUBLE) * sxx
                                  - CAST(sx AS DOUBLE) * sx)
                               * {_NANO}) END AS BIGINT) AS slope_nano
        FROM m
    """,
    description="Pearson correlation, population covariance and OLS slope "
    "of (event value in cents) vs (numeric prop) per event_type, from six "
    "exact integer moments in ONE map-side-combinable groupBy — the "
    "parallel-sum-order problem that makes corr()/covar_pop() "
    "nondeterministic at scale disappears because only integers are "
    "summed. At larger scales the moments would use DECIMAL(38,0); the "
    "plan shape (single partial agg, no shuffle of raw rows beyond the "
    "6-moment combine) is unchanged",
)
def corr_stats(spark, sf_dir):
    # try_cast + NULL-pair filter: digitless props is "no pair" (corr()
    # semantics), not an ANSI cast crash, and not a row whose count(*)
    # contributes while its sum(y) silently doesn't
    e = (
        load(spark, sf_dir, "events")
        .select(
            "event_type",
            F.round(F.col("value") * 100).cast("long").alias("x"),
            F.regexp_extract("props", "[0-9]+", 0)
            .try_cast("long")
            .alias("y"),
        )
        .filter(F.col("x").isNotNull() & F.col("y").isNotNull())
    )
    m = e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    cov_num = n * F.col("sxy") - sx * F.col("sy")
    var_x = n * F.col("sxx") - sx * F.col("sx")
    var_y = n * F.col("syy") - sy * F.col("sy")
    # zero-variance groups (a constant series) have no defined Pearson
    # correlation or OLS slope: emit NULL on both engines instead of an
    # ANSI divide-by-zero abort; covariance stays defined (n*n > 0)
    return m.select(
        "event_type",
        "n",
        F.floor(cov_num / (n * n) * _NANO).cast("long").alias("covar_nano"),
        F.when(
            var_x * var_y != 0,
            F.floor(cov_num / F.sqrt(var_x * var_y) * _NANO),
        )
        .cast("long")
        .alias("corr_nano"),
        F.when(var_x != 0, F.floor(cov_num / var_x * _NANO))
        .cast("long")
        .alias("slope_nano"),
    )


_HIST_BINS = 24
_HIST_LO = 90000  # l_extendedprice cents range at any TPC-H SF
_HIST_HI = 11000000


@query(
    "histogram_prices",
    oracle=f"""
        WITH c AS (
            SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
            FROM lineitem
        )
        SELECT CAST(least(greatest((cents - {_HIST_LO})
                                   * {_HIST_BINS}
                                   // ({_HIST_HI} - {_HIST_LO}), 0),
                          {_HIST_BINS - 1}) AS INT) AS bin,
               CAST(count(*) AS BIGINT) AS n,
               CAST(min(cents) AS BIGINT) AS lo_cents,
               CAST(max(cents) AS BIGINT) AS hi_cents
        FROM c GROUP BY 1
    """,
    description=f"fixed-range histogram of l_extendedprice into "
    f"{_HIST_BINS} bins with clamped integer bin math (cents, never "
    "floats) — one map-side-combinable groupBy over a single scanned "
    "column; the shuffle carries at most n_bins rows per task. The "
    "fixed [lo, hi) range makes it one-pass; a data-dependent range "
    "would chain a broadcast min/max scalar first, same shape",
)
def histogram_prices(spark, sf_dir):
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    width = _HIST_HI - _HIST_LO
    bin_ = F.least(
        F.greatest(
            ((cents - _HIST_LO) * _HIST_BINS - F.pmod(
                (cents - _HIST_LO) * _HIST_BINS, width
            )) / width,
            F.lit(0),
        ),
        F.lit(_HIST_BINS - 1),
    ).cast("int")
    return (
        load(spark, sf_dir, "lineitem")
        .select(cents.alias("cents"), bin_.alias("bin"))
        .groupBy("bin")
        .agg(
            F.count("*").alias("n"),
            F.min("cents").alias("lo_cents"),
            F.max("cents").alias("hi_cents"),
        )
    )


_PROFILE_COLS = ["o_custkey", "o_orderstatus", "o_orderpriority", "o_orderdate"]


@query(
    "profile_columns",
    oracle="\n        UNION ALL\n".join(
        f"""
        SELECT '{c}' AS column_name,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(*) - count({c}) AS BIGINT) AS n_nulls,
               CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
               CAST(min({c}) AS VARCHAR) AS min_value,
               CAST(max({c}) AS VARCHAR) AS max_value
        FROM orders
        """
        for c in _PROFILE_COLS
    ),
    description="data-profiling summary (row/null/distinct counts, "
    "min/max) for four orders columns in ONE pass: Spark evaluates all "
    "per-column aggregates in a single grouped aggregation (Catalyst "
    "Expand handles the distincts), then unpivots the scalar row "
    "driver-free with stack() — the pipeline-health check every "
    "ingestion run needs, shuffling only aggregate state",
)
def profile_columns(spark, sf_dir):
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.count("*").alias(f"{c}__rows"),
            (F.count("*") - F.count(c)).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    # rebalance: the multi-countDistinct agg EXPANDs each input row per
    # distinct-agg, and the one-row-group scan would run it single-core
    one = rebalance(load(spark, sf_dir, "orders")).agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__rows, {c}__nulls, {c}__distinct, {c}__min, {c}__max"
        for c in _PROFILE_COLS
    )
    return one.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {stack_args}) AS "
        "(column_name, n_rows, n_nulls, n_distinct, min_value, max_value)"
    )


def _zorder_oracle() -> str:
    from hls_payer_mrf_sparkstreaming_spark.functions.layout import (
        zorder_key_sql,
    )

    z = zorder_key_sql("x", "y")
    return f"""
        WITH p AS (
            SELECT event_id,
                   CAST(user_id & 65535 AS BIGINT) AS x,
                   CAST(CAST(round(value * 100) AS BIGINT) & 65535 AS BIGINT)
                       AS y
            FROM events
        ),
        z AS (SELECT event_id, x, y, CAST({z} AS BIGINT) AS zkey FROM p)
        SELECT CAST(zkey >> 20 AS BIGINT) AS tile,
               CAST(count(*) AS BIGINT) AS n,
               CAST(min(x) AS BIGINT) AS x_lo, CAST(max(x) AS BIGINT) AS x_hi,
               CAST(min(y) AS BIGINT) AS y_lo, CAST(max(y) AS BIGINT) AS y_hi
        FROM z GROUP BY 1
    """


@query(
    "zorder_tiles",
    oracle=_zorder_oracle(),
    description="Z-order (Morton) layout key: interleave two 16-bit "
    "dimensions into one sortable long, then aggregate per 2^20-key tile "
    "to expose each tile's (x, y) bounding box — the box areas are what "
    "parquet min/max stats prune on after a zorder-sorted write, giving "
    "data skipping on BOTH dimensions. The key is pure bit expressions "
    "in codegen; the tile rollup is one map-side-combinable groupBy. "
    "Pairs with functions/layout.py write_partitioned for the full "
    "cluster-then-write path",
)
def zorder_tiles(spark, sf_dir):
    from hls_payer_mrf_sparkstreaming_spark.functions.layout import zorder_key

    e = load(spark, sf_dir, "events").select(
        "event_id",
        (F.col("user_id").bitwiseAND(F.lit(65535))).alias("x"),
        (
            F.round(F.col("value") * 100)
            .cast("long")
            .bitwiseAND(F.lit(65535))
        ).alias("y"),
    )
    z = e.select("event_id", "x", "y", zorder_key("x", "y").alias("zkey"))
    return (
        z.select(F.shiftright("zkey", 20).alias("tile"), "x", "y")
        .groupBy("tile")
        .agg(
            F.count("*").alias("n"),
            F.min("x").alias("x_lo"),
            F.max("x").alias("x_hi"),
            F.min("y").alias("y_lo"),
            F.max("y").alias("y_hi"),
        )
    )


_KS_BIN = 100  # cents per bucket: bounds the CDF domain at any scale


@query(
    "drift_ks",
    oracle=f"""
        WITH tagged AS (
            SELECT CAST(round(value * 100) AS BIGINT) // {_KS_BIN} AS bucket,
                   CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS is_a
            FROM events
        ),
        per AS (
            SELECT bucket,
                   CAST(sum(is_a) AS BIGINT) AS na,
                   CAST(sum(1 - is_a) AS BIGINT) AS nb
            FROM tagged GROUP BY bucket
        ),
        cum AS (
            SELECT bucket,
                   sum(na) OVER (ORDER BY bucket
                                 ROWS UNBOUNDED PRECEDING) AS ca,
                   sum(nb) OVER (ORDER BY bucket
                                 ROWS UNBOUNDED PRECEDING) AS cb,
                   sum(na) OVER () AS ta, sum(nb) OVER () AS tb
            FROM per
        )
        SELECT CAST(max(abs(ca * tb - cb * ta)) AS BIGINT) AS ks_num,
               CAST(max(ta * tb) AS BIGINT) AS ks_den,
               CAST(floor(CAST(max(abs(ca * tb - cb * ta)) AS DOUBLE)
                          / max(ta * tb) * {_NANO}) AS BIGINT) AS ks_nano,
               CAST(count(*) AS BIGINT) AS n_buckets
        FROM cum
    """,
    description="two-sample Kolmogorov-Smirnov drift statistic between "
    "the even- and odd-user event-value distributions, in EXACT integer "
    "arithmetic: bucket counts (map-side combinable groupBy) -> "
    "cumulative counts -> KS numerator max|ca*tb - cb*ta| as integers, "
    "divided once at the end — no floating-point CDF accumulation to "
    "drift under parallelism. The cumsum window runs over the bounded "
    f"bucket domain (cents // {_KS_BIN}), a few thousand rows at ANY "
    "data scale, so the single-partition window is trivially safe — the "
    "standard train/serve distribution-shift monitor",
)
def drift_ks(spark, sf_dir):
    from pyspark.sql import Window

    tagged = load(spark, sf_dir, "events").select(
        F.expr(f"CAST(round(value * 100) AS BIGINT) div {_KS_BIN}").alias(
            "bucket"
        ),
        F.when(F.col("user_id") % 2 == 0, 1).otherwise(0).alias("is_a"),
    )
    per = tagged.groupBy("bucket").agg(
        F.sum("is_a").alias("na"),
        F.sum(1 - F.col("is_a")).alias("nb"),
    )
    w = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.partitionBy()
    cum = per.select(
        "bucket",
        F.sum("na").over(w).alias("ca"),
        F.sum("nb").over(w).alias("cb"),
        F.sum("na").over(wall).alias("ta"),
        F.sum("nb").over(wall).alias("tb"),
    )
    diff = F.abs(F.col("ca") * F.col("tb") - F.col("cb") * F.col("ta"))
    return cum.agg(
        F.max(diff).alias("ks_num"),
        F.max(F.col("ta") * F.col("tb")).alias("ks_den"),
        F.floor(
            F.max(diff).cast("double")
            / F.max(F.col("ta") * F.col("tb"))
            * _NANO
        )
        .cast("long")
        .alias("ks_nano"),
        F.count("*").alias("n_buckets"),
    )


@query(
    "anomaly_mad",
    oracle="""
        WITH c AS (
            SELECT l_returnflag,
                   CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
            FROM lineitem
        ),
        med AS (
            SELECT l_returnflag,
                   percentile_disc(0.5) WITHIN GROUP (ORDER BY cents) AS med
            FROM c GROUP BY 1
        ),
        dev AS (
            SELECT c.l_returnflag, c.cents, med.med,
                   abs(c.cents - med.med) AS d
            FROM c JOIN med USING (l_returnflag)
        ),
        mad AS (
            SELECT l_returnflag,
                   percentile_disc(0.5) WITHIN GROUP (ORDER BY d) AS mad
            FROM dev GROUP BY 1
        )
        SELECT dev.l_returnflag AS l_returnflag,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(min(dev.med) AS BIGINT) AS median_cents,
               CAST(min(mad.mad) AS BIGINT) AS mad_cents,
               CAST(count(*) FILTER (WHERE dev.d > 3 * mad.mad) AS BIGINT)
                   AS n_outliers
        FROM dev JOIN mad USING (l_returnflag)
        GROUP BY 1
    """,
    description="robust outlier detection per group via median absolute "
    "deviation: price in exact integer cents, per-group median and MAD "
    "from percentile_disc (order-insensitive discrete statistics, so the "
    "parallel aggregation is hash-exact), outliers = rows deviating more "
    "than 3 MADs. Quality gates built on mean/stddev collapse when the "
    "contamination IS the outliers; MAD is the standard robust gate for "
    "pretraining-corpus filtering. Plan: the fact compresses to a "
    "(group, cents) histogram with ONE map-side-combined shuffle — the "
    "only pass over raw rows — and every later statistic (median via "
    "the cumulative 2*cum >= n walk, the deviation distribution, MAD, "
    "the outlier count) is integer arithmetic over distinct-value "
    "counts. Unlike percentile_disc's ObjectHashAggregate buffer, which "
    "holds every group value in memory, the histogram survives groups "
    "with billions of rows; med, MAD and the outlier rollup all ride ONE "
    "group-partitioned window chain (resort by deviation inside the same "
    "exchange), so the whole statistic is one lineage — no persists, no "
    "joins, two shuffles total, cold-run cost identical to warm",
)
def anomaly_mad(spark, sf_dir):
    from pyspark.sql import Window

    # percentile_disc(0.5) over a histogram = the smallest value whose
    # cumulative count reaches half the total. Both medians (cents, then
    # |cents - med|) are computed in ONE window chain over the same
    # l_returnflag partitioning: the second ordering is a partition-local
    # re-sort, not a new exchange, and the whole-partition min(when(...))
    # windows broadcast each median back to every row without a join.
    # (The earlier persist-hist / broadcast-join formulation rebuilt two
    # caches and four window jobs from cold on every bench run — 7.8 s
    # driver-cold vs ~1.5 s for this fused lineage, same result hash.)
    run_c = (
        Window.partitionBy("l_returnflag")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run_d = (
        Window.partitionBy("l_returnflag")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    whole = Window.partitionBy("l_returnflag")
    return (
        load(spark, sf_dir, "lineitem")
        .select(
            "l_returnflag",
            F.round(F.col("l_extendedprice") * 100)
            .cast("long")
            .alias("cents"),
        )
        .groupBy("l_returnflag", "cents")
        .agg(F.count("*").alias("cnt"))
        .withColumn("cum_c", F.sum("cnt").over(run_c))
        .withColumn("tot", F.sum("cnt").over(whole))
        .withColumn(
            "med",
            F.min(
                F.when(F.col("cum_c") * 2 >= F.col("tot"), F.col("cents"))
            ).over(whole),
        )
        .withColumn("d", F.abs(F.col("cents") - F.col("med")))
        .withColumn("cum_d", F.sum("cnt").over(run_d))
        .withColumn(
            "mad",
            F.min(
                F.when(F.col("cum_d") * 2 >= F.col("tot"), F.col("d"))
            ).over(whole),
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum("cnt").cast("long").alias("n_rows"),
            F.min("med").cast("long").alias("median_cents"),
            F.min("mad").cast("long").alias("mad_cents"),
            F.sum(
                F.when(F.col("d") > 3 * F.col("mad"), F.col("cnt")).otherwise(
                    F.lit(0)
                )
            )
            .cast("long")
            .alias("n_outliers"),
        )
    )


@query(
    "auc_score",
    oracle=f"""
        WITH tagged AS (
            SELECT CAST(round(value * 100) AS BIGINT) AS s,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                       AS is_pos
            FROM events
        ),
        per AS (
            SELECT s,
                   CAST(sum(is_pos) AS BIGINT) AS np_at,
                   CAST(sum(1 - is_pos) AS BIGINT) AS nn_at
            FROM tagged GROUP BY s
        ),
        cum AS (
            SELECT s, np_at, nn_at,
                   sum(nn_at) OVER (ORDER BY s ROWS UNBOUNDED PRECEDING)
                       - nn_at AS nn_below,
                   sum(np_at) OVER () AS tp, sum(nn_at) OVER () AS tn
            FROM per
        )
        SELECT CAST(sum(2 * nn_below * np_at + nn_at * np_at) AS BIGINT)
                   AS auc_num,
               CAST(max(2 * tp * tn) AS BIGINT) AS auc_den,
               CAST(CASE WHEN max(2 * tp * tn) = 0 THEN NULL
                    ELSE floor(CAST(sum(2 * nn_below * np_at
                                        + nn_at * np_at) AS DOUBLE)
                               / max(2 * tp * tn) * {1_000_000_000})
                    END AS BIGINT) AS auc_nano,
               CAST(max(tp) AS BIGINT) AS n_pos,
               CAST(max(tn) AS BIGINT) AS n_neg
        FROM cum
    """,
    description="exact ROC AUC of the event value as a purchase predictor "
    "— the rank-sum (Mann-Whitney) formulation with tie-aware halves, "
    "entirely in integer arithmetic: per-score-value positive/negative "
    "counts (one map-side-combinable groupBy), a cumulative window over "
    "the BOUNDED distinct-score domain (cents — thousands of rows at any "
    "corpus scale, so the single-partition window is trivially safe), "
    "and AUC emitted as an exact numerator/denominator pair plus a "
    "floored-nano view. The standard model-eval metric computed without "
    "a global row-rank sort — ranking 100 TB of scores needs only the "
    "score-domain histogram",
)
def auc_score(spark, sf_dir):
    from pyspark.sql import Window

    tagged = load(spark, sf_dir, "events").select(
        F.round(F.col("value") * 100).cast("long").alias("s"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias(
            "is_pos"
        ),
    )
    per = tagged.groupBy("s").agg(
        F.sum("is_pos").cast("long").alias("np_at"),
        F.sum(1 - F.col("is_pos")).cast("long").alias("nn_at"),
    )
    w = Window.orderBy("s").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.partitionBy()
    cum = per.select(
        "np_at",
        "nn_at",
        (F.sum("nn_at").over(w) - F.col("nn_at")).alias("nn_below"),
        F.sum("np_at").over(wall).alias("tp"),
        F.sum("nn_at").over(wall).alias("tn"),
    )
    num = F.sum(
        2 * F.col("nn_below") * F.col("np_at")
        + F.col("nn_at") * F.col("np_at")
    )
    den = F.max(2 * F.col("tp") * F.col("tn"))
    # a single-class dataset (no positives or no negatives) has no ROC:
    # auc_nano is NULL on both engines (num/den stay visible), never an
    # ANSI divide-by-zero abort
    return cum.agg(
        num.cast("long").alias("auc_num"),
        den.cast("long").alias("auc_den"),
        F.when(den != 0, F.floor(num.cast("double") / den * _NANO))
        .cast("long")
        .alias("auc_nano"),
        F.max("tp").cast("long").alias("n_pos"),
        F.max("tn").cast("long").alias("n_neg"),
    )


@query(
    "snapshot_diff",
    oracle="""
        WITH a AS (
            SELECT o_orderkey AS k,
                   CAST(round(o_totalprice * 100) AS BIGINT) AS v
            FROM orders WHERE o_orderkey % 4 <> 0
        ),
        b AS (
            SELECT o_orderkey AS k,
                   CAST(round(o_totalprice * 100) AS BIGINT)
                       + CASE WHEN o_orderkey % 5 = 0 THEN 100 ELSE 0 END AS v
            FROM orders WHERE o_orderkey % 4 <> 1
        ),
        j AS (
            SELECT a.k AS ka, b.k AS kb, a.v AS va, b.v AS vb
            FROM a FULL OUTER JOIN b ON a.k = b.k
        )
        SELECT CAST(count(*) FILTER (ka IS NULL) AS BIGINT) AS n_added,
               CAST(count(*) FILTER (kb IS NULL) AS BIGINT) AS n_removed,
               CAST(count(*) FILTER (ka IS NOT NULL AND kb IS NOT NULL
                                     AND va <> vb) AS BIGINT) AS n_changed,
               CAST(count(*) FILTER (ka IS NOT NULL AND kb IS NOT NULL
                                     AND va = vb) AS BIGINT) AS n_unchanged
        FROM j
    """,
    description="snapshot reconciliation: FULL OUTER join of two table "
    "versions on the primary key, classifying every key as "
    "added / removed / changed / unchanged — the data-diff audit run "
    "before replacing a corpus version (here: two deterministic "
    "key-striped views of orders with a planted +1.00 update on every "
    "5th key, so all four classes are non-vacuous at every SF). Values "
    "compare in exact integer cents. Plan: ONE shuffle of each side on "
    "the key, classification entirely in the join projection, then a "
    "partial-agg count — no driver-side set math, no second scan; at "
    "100 TB the wire carries (key, cents) pairs only",
)
def snapshot_diff(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    a = orders.filter(F.col("o_orderkey") % 4 != 0).select(
        F.col("o_orderkey").alias("ka"), cents.alias("va")
    )
    b = orders.filter(F.col("o_orderkey") % 4 != 1).select(
        F.col("o_orderkey").alias("kb"),
        (
            cents
            + F.when(F.col("o_orderkey") % 5 == 0, 100).otherwise(0)
        ).alias("vb"),
    )
    j = a.join(b, a["ka"] == b["kb"], "full_outer")
    both = F.col("ka").isNotNull() & F.col("kb").isNotNull()
    return j.agg(
        F.count_if(F.col("ka").isNull()).cast("long").alias("n_added"),
        F.count_if(F.col("kb").isNull()).cast("long").alias("n_removed"),
        F.count_if(both & (F.col("va") != F.col("vb")))
        .cast("long")
        .alias("n_changed"),
        F.count_if(both & (F.col("va") == F.col("vb")))
        .cast("long")
        .alias("n_unchanged"),
    )


_COMPACT_TARGET = 16384  # target compacted "file" size in chars


@query(
    "compaction_bins",
    oracle=f"""
        WITH runs AS (
            SELECT source, doc_id, n_chars,
                   coalesce(sum(n_chars) OVER (
                       PARTITION BY source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS before
            FROM documents
        )
        SELECT source,
               CAST(before // {_COMPACT_TARGET} AS BIGINT) AS bin,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM runs GROUP BY source, bin
    """,
    description="small-file compaction planner (the lakehouse OPTIMIZE "
    "bin-packing step): within each source partition, documents pack "
    "sequentially into target-size bins by prefix-sum — bin = running "
    f"size BEFORE the doc div {_COMPACT_TARGET}, the deterministic "
    "first-fit plan a compactor would execute. Plan: one shuffle on "
    "source, a running-sum window with O(1) state, and a groupBy on the "
    "SAME key so the window's partitioning is reused — the standard "
    "maintenance query over a file manifest, which at 100 TB is "
    "millions of rows, not the data itself",
)
def compaction_bins(spark, sf_dir):
    from pyspark.sql import Window

    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    runs = load(spark, sf_dir, "documents").select(
        "source",
        "n_chars",
        F.coalesce(F.sum("n_chars").over(w), F.lit(0)).alias("before"),
    )
    return (
        runs.groupBy(
            "source",
            F.expr(f"before div {_COMPACT_TARGET}").alias("bin"),
        )
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
    )


_CALIB_BIN_CENTS = 2000  # 20-dollar-wide score bins


@query(
    "calibration_bins",
    oracle=f"""
        SELECT CAST(round(value * 100) AS BIGINT) // {_CALIB_BIN_CENTS}
                   AS score_bin,
               CAST(count(*) AS BIGINT) AS n,
               CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT)
                   AS n_pos,
               CAST(count(*) FILTER (event_type = 'purchase') * 1000000
                    // count(*) AS BIGINT) AS pos_rate_ppm
        FROM events GROUP BY score_bin
    """,
    description="calibration / reliability table for the value-as-"
    "predictor score judged by auc_score: per fixed-width score bin, "
    "the empirical positive rate in exact integer ppm — the table a "
    "reliability diagram or a per-bin threshold policy is read from. "
    "One map-side-combinable groupBy over the bounded bin domain; "
    "integer bin math and integer rate division, so the hash-compared "
    "output is engine-identical",
)
def calibration_bins(spark, sf_dir):
    is_pos = (F.col("event_type") == "purchase").cast("long")
    return (
        load(spark, sf_dir, "events")
        .select(
            F.expr(
                f"CAST(round(value * 100) AS BIGINT) div {_CALIB_BIN_CENTS}"
            ).alias("score_bin"),
            is_pos.alias("p"),
        )
        .groupBy("score_bin")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("p").cast("long").alias("n_pos"),
            F.expr("sum(p) * 1000000 div count(*)")
            .cast("long")
            .alias("pos_rate_ppm"),
        )
    )


@query(
    "key_skew_report",
    oracle="""
        WITH per AS (
            SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n
            FROM lineitem GROUP BY l_orderkey
        ),
        hist AS (
            SELECT CAST(floor(log2(n)) AS BIGINT) AS bucket_log2,
                   CAST(count(*) AS BIGINT) AS n_keys,
                   CAST(sum(n) AS BIGINT) AS n_rows,
                   CAST(max(n) AS BIGINT) AS max_rows_per_key
            FROM per GROUP BY 1
        )
        SELECT bucket_log2, n_keys, n_rows, max_rows_per_key
        FROM hist
    """,
    description="join-key skew audit: the rows-per-key distribution of "
    "lineitem's order key as a power-of-two histogram (keys per bucket, "
    "rows per bucket, heaviest key per bucket) — the diagnostic that "
    "decides whether a join needs salting or AQE skew handling BEFORE it "
    "runs. Two chained partial-agg groupBys; the per-key relation "
    "shuffles (key, count) longs and the histogram is a few dozen rows "
    "at any scale. log2 on exact integer counts is engine-safe: both "
    "engines see identical integers, and floor(log2) changes only at "
    "exact powers of two where log2 is exact in IEEE double",
)
def key_skew_report(spark, sf_dir):
    per = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.count("*").cast("long").alias("n"))
    )
    return (
        per.groupBy(
            F.floor(F.log2("n")).cast("long").alias("bucket_log2")
        )
        .agg(
            F.count("*").cast("long").alias("n_keys"),
            F.sum("n").cast("long").alias("n_rows"),
            F.max("n").cast("long").alias("max_rows_per_key"),
        )
    )


@query(
    "join_size_estimate",
    oracle="""
        WITH a AS (
            SELECT o_custkey AS k, CAST(count(*) AS BIGINT) AS na
            FROM orders GROUP BY 1
        ),
        b AS (
            SELECT user_id % 1000 AS k, CAST(count(*) AS BIGINT) AS nb
            FROM events GROUP BY 1
        ),
        j AS (SELECT a.k, a.na, b.nb FROM a JOIN b USING (k))
        SELECT CAST((SELECT count(*) FROM a) AS BIGINT) AS n_keys_a,
               CAST((SELECT count(*) FROM b) AS BIGINT) AS n_keys_b,
               CAST(count(*) AS BIGINT) AS n_shared_keys,
               CAST(coalesce(sum(na * nb), 0) AS BIGINT) AS predicted_rows,
               CAST(coalesce(max(na * nb), 0) AS BIGINT) AS max_key_rows
        FROM j
    """,
    description="equi-join size estimation from key histograms: "
    "|A JOIN B| = sum over shared keys of na*nb, computed from two "
    "partial-agg key-count relations and a count-only join — the "
    "planner-style diagnostic that prices a join (total output AND the "
    "worst single key's contribution, the skew hotspot) WITHOUT ever "
    "executing the wide join or moving payload columns. Pairs with "
    "key_skew_report: that profiles one table, this prices the join of "
    "two. Every shuffled row is (key, count); at 100 TB this costs two "
    "digest-weight aggregations where the real join would cost the "
    "full payload shuffle",
)
def join_size_estimate(spark, sf_dir):
    a = (
        load(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count("*").cast("long").alias("na"))
    )
    b = (
        load(spark, sf_dir, "events")
        .groupBy((F.col("user_id") % 1000).alias("k"))
        .agg(F.count("*").cast("long").alias("nb"))
    )
    # r13: n_keys_a / n_keys_b used to re-aggregate each fact into two
    # extra broadcast-build jobs; a FULL OUTER join of the (unique-key)
    # count relations yields every statistic from ONE aggregate — per
    # side count = non-null side rows, shared = both present, and the
    # na*nb product is NULL unless both sides match, exactly the inner
    # join's term set. Each fact is aggregated once.
    j = a.join(b, "k", "full_outer").select(
        "na", "nb", (F.col("na") * F.col("nb")).alias("prod")
    )
    return j.agg(
        F.count("na").cast("long").alias("n_keys_a"),
        F.count("nb").cast("long").alias("n_keys_b"),
        F.count("prod").cast("long").alias("n_shared_keys"),
        F.coalesce(F.sum("prod"), F.lit(0))
        .cast("long")
        .alias("predicted_rows"),
        F.coalesce(F.max("prod"), F.lit(0))
        .cast("long")
        .alias("max_key_rows"),
    )


# ---------------------------------------------------------------------------
# Column entropy profiling: Shannon entropy of each low-cardinality column's
# value distribution — the screening stat for corpus curation (a source
# column collapsing to one value, a language mix drifting toward a single
# lang) and for choosing partition/bucket keys (low-entropy keys skew).
# ---------------------------------------------------------------------------


def _entropy_sql(table: str, col: str) -> str:
    return f"""
        SELECT '{table}.{col}' AS column_name,
               CAST(floor(-(CAST(c AS DOUBLE) / n)
                          * ln(CAST(c AS DOUBLE) / n) * {_NANO})
                    AS BIGINT) AS term
        FROM (SELECT count(*) AS c FROM {table} GROUP BY {col}),
             (SELECT count(*) AS n FROM {table})
    """


@query(
    "column_entropy",
    oracle=f"""
        SELECT column_name,
               CAST(count(*) AS BIGINT) AS n_categories,
               CAST(sum(term) AS BIGINT) AS entropy_nano
        FROM ({_entropy_sql('documents', 'lang')}
              UNION ALL {_entropy_sql('documents', 'source')}
              UNION ALL {_entropy_sql('events', 'event_type')})
        GROUP BY column_name
    """,
    description="Shannon entropy (nano-nats) of each categorical column's "
    "value distribution across documents.lang / documents.source / "
    "events.event_type — the curation screening stat (is the corpus mix "
    "degenerate?) and the bucket-key skew predictor. Per-category terms "
    "-(p ln p) are floored into integer nano-units BEFORE summing, so "
    "the K-row sum is exact under any aggregation order. Plan per "
    "column: one partially-aggregated groupBy to K category rows plus a "
    "broadcast single-row total — the fact tables never shuffle, and at "
    "100 TB each branch is a map-side count",
)
def column_entropy(spark, sf_dir):
    from pyspark.sql import Window

    # r13: each branch used to scan its fact twice (category counts +
    # the broadcast single-row total, 6 scans across the union); both
    # documents columns now ride ONE scan as an exploded (column, value)
    # stream that partial-aggregates immediately, and the per-column
    # total attaches as a window sum over the K-category relation (the
    # mutual_information/chi_square shape) — 2 scans, no joins. The
    # floored term is the same expression over the same operands, so the
    # driver hash is unchanged.
    docs = load(spark, sf_dir, "documents")
    ev = load(spark, sf_dir, "events")
    d2 = docs.selectExpr(
        "explode(array("
        "struct('documents.lang' AS column_name, lang AS v), "
        "struct('documents.source' AS column_name, source AS v)"
        ")) AS a"
    ).select("a.*")
    e1 = ev.selectExpr(
        "'events.event_type' AS column_name", "event_type AS v"
    )
    counts = (
        d2.unionAll(e1)
        .groupBy("column_name", "v")
        .agg(F.count("*").alias("c"))
    )
    cw = counts.select(
        "column_name",
        "c",
        F.sum("c").over(Window.partitionBy("column_name")).alias("n"),
    )
    p = F.col("c").cast("double") / F.col("n")
    return (
        cw.select(
            "column_name",
            F.floor(-p * F.log(p) * _NANO).cast("long").alias("term"),
        )
        .groupBy("column_name")
        .agg(
            F.count("*").cast("long").alias("n_categories"),
            F.sum("term").cast("long").alias("entropy_nano"),
        )
    )


# ---------------------------------------------------------------------------
# Leave-one-out target encoding: the standard high-cardinality categorical
# feature for tabular models — each row's category becomes the mean target
# of all OTHER rows in that category, so the feature never leaks the row's
# own label.
# ---------------------------------------------------------------------------


@query(
    "target_encoding_loo",
    oracle="""
        WITH e AS (
            SELECT event_id, event_type,
                   CAST(round(value * 100) AS BIGINT) AS cents
            FROM events
        ),
        g AS (
            SELECT event_type,
                   CAST(sum(cents) AS BIGINT) AS s,
                   CAST(count(*) AS BIGINT) AS n
            FROM e GROUP BY event_type
        )
        SELECT e.event_id, e.event_type,
               CAST(CASE WHEN g.n > 1
                         THEN floor(CAST(g.s - e.cents AS DOUBLE) / (g.n - 1))
                         ELSE 0 END AS BIGINT) AS loo_mean_cents
        FROM e JOIN g USING (event_type)
    """,
    description="leave-one-out target encoding of event_type against the "
    "event value (exact integer cents): each row gets the mean of every "
    "OTHER row in its category — the leakage-safe form of mean encoding "
    "for high-cardinality categoricals. Plan: one partially-aggregated "
    "groupBy reduces the fact table to K (sum, count) rows which "
    "broadcast back; the encode itself is a map-side projection, so the "
    "fact table is scanned twice but NEVER shuffled — at 100 TB the "
    "category stats are kilobytes regardless of corpus size",
)
def target_encoding_loo(spark, sf_dir):
    e = load(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    g = e.groupBy("event_type").agg(
        F.sum("cents").cast("long").alias("s"),
        F.count("*").cast("long").alias("n"),
    )
    loo = F.when(
        F.col("n") > 1,
        F.floor(
            (F.col("s") - F.col("cents")).cast("double") / (F.col("n") - 1)
        ),
    ).otherwise(F.lit(0))
    return e.join(F.broadcast(g), "event_type").select(
        "event_id",
        "event_type",
        loo.cast("long").alias("loo_mean_cents"),
    )


@query(
    "winsorize_clip",
    oracle="""
        WITH c AS (
            SELECT event_type,
                   CAST(round(value * 100) AS BIGINT) AS cents
            FROM events
        ),
        b AS (
            SELECT event_type,
                   CAST(percentile_disc(0.05) WITHIN GROUP (ORDER BY cents)
                        AS BIGINT) AS lo,
                   CAST(percentile_disc(0.95) WITHIN GROUP (ORDER BY cents)
                        AS BIGINT) AS hi
            FROM c GROUP BY 1
        )
        SELECT c.event_type AS event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(count(*) FILTER (WHERE cents < lo) AS BIGINT)
                   AS n_clip_low,
               CAST(count(*) FILTER (WHERE cents > hi) AS BIGINT)
                   AS n_clip_high,
               CAST(sum(least(greatest(cents, lo), hi)) AS BIGINT)
                   AS sum_winsorized_cents
        FROM c JOIN b USING (event_type)
        GROUP BY 1
    """,
    description="per-group winsorization — the outlier-robust feature "
    "scaling step: clamp each event's value to its group's exact "
    "[p05, p95] (percentile_disc in integer cents, order-insensitive "
    "so hash-exact) and report clip counts plus the winsorized sum. "
    "Plan: the per-group bounds relation is a handful of rows and is "
    "BROADCAST back onto the fact scan (anomaly_mad's stats-broadcast "
    "pattern — the fact table never re-shuffles); the two fact passes "
    "(bounds, then clamp) are the honest cost of EXACT percentiles — "
    "at 100 TB swap pass one for the mergeable histogram sketch "
    "(incremental_quantile_merge) and keep this clamp pass unchanged",
)
def winsorize_clip(spark, sf_dir):
    c = load(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    b = c.groupBy("event_type").agg(
        F.expr("percentile_disc(0.05) WITHIN GROUP (ORDER BY cents)")
        .cast("long")
        .alias("lo"),
        F.expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY cents)")
        .cast("long")
        .alias("hi"),
    )
    j = c.join(F.broadcast(b), "event_type")
    clamped = F.least(F.greatest(F.col("cents"), F.col("lo")), F.col("hi"))
    return j.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum(F.when(F.col("cents") < F.col("lo"), 1).otherwise(0))
        .cast("long")
        .alias("n_clip_low"),
        F.sum(F.when(F.col("cents") > F.col("hi"), 1).otherwise(0))
        .cast("long")
        .alias("n_clip_high"),
        F.sum(clamped).cast("long").alias("sum_winsorized_cents"),
    )


# Benford first-digit probabilities log10(1 + 1/d) as EXACT nano-scaled
# integer literals, precomputed once — identical constants are inlined
# into both the Spark plan and the oracle SQL, so no engine ever
# evaluates a log at query time (cross-engine transcendental rounding
# is the classic hash-breaking source)
_BENFORD_NANO = {
    1: 301029996,
    2: 176091259,
    3: 124938737,
    4: 96910013,
    5: 79181246,
    6: 66946790,
    7: 57991947,
    8: 51152522,
    9: 45757491,
}
_BENFORD_SQL_CASE = "CASE digit " + " ".join(
    f"WHEN {d} THEN {p}" for d, p in _BENFORD_NANO.items()
) + " END"


@query(
    "benford_digit_test",
    oracle=f"""
        WITH c AS (
            SELECT CAST(substr(CAST(
                       CAST(round(l_extendedprice * 100) AS BIGINT)
                       AS VARCHAR), 1, 1) AS BIGINT) AS digit
            FROM lineitem
            WHERE l_extendedprice > 0
        ),
        obs AS (
            SELECT digit, CAST(count(*) AS BIGINT) AS n_obs,
                   sum(count(*)) OVER () AS total
            FROM c GROUP BY digit
        )
        SELECT digit,
               n_obs,
               CAST(n_obs * 1000000000 // total AS BIGINT) AS obs_nano,
               CAST({_BENFORD_SQL_CASE} AS BIGINT) AS exp_nano,
               CAST(abs(n_obs * 1000000000 // total
                        - {_BENFORD_SQL_CASE}) AS BIGINT) AS dev_nano
        FROM obs
    """,
    description="Benford first-significant-digit conformance test over "
    "extended prices — the standard forensic screen for fabricated "
    "numeric data (real multiplicative processes follow "
    "P(d)=log10(1+1/d); synthetic/tampered ones usually don't). "
    "Expected probabilities are precomputed nano-integer literals "
    "shared verbatim by both engines; observed shares use one integer "
    "division per digit. Plan: the digit extraction is codegen string "
    "ops on a pruned single-column scan, the groupBy partial-aggregates "
    "to <=9 rows per partition map-side, and the share window runs over "
    "9 rows — nothing wide ever exceeds 9 rows at ANY scale",
)
def benford_digit_test(spark, sf_dir):
    from pyspark.sql import Window

    digit = (
        F.substring(
            F.round(F.col("l_extendedprice") * 100)
            .cast("long")
            .cast("string"),
            1,
            1,
        )
        .cast("long")
        .alias("digit")
    )
    obs = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_extendedprice") > 0)
        .select(digit)
        .groupBy("digit")
        .agg(F.count("*").cast("long").alias("n_obs"))
        .withColumn("total", F.sum("n_obs").over(Window.partitionBy()))
    )
    exp_nano = F.element_at(
        F.create_map(
            *[
                F.lit(x)
                for d, p in _BENFORD_NANO.items()
                for x in (d, p)
            ]
        ),
        F.col("digit").cast("int"),
    ).cast("long")
    obs_nano = F.expr("n_obs * 1000000000 div total")
    return obs.select(
        "digit",
        "n_obs",
        obs_nano.cast("long").alias("obs_nano"),
        exp_nano.alias("exp_nano"),
        F.abs(obs_nano - exp_nano).cast("long").alias("dev_nano"),
    )


@query(
    "gini_by_segment",
    oracle="""
        WITH v AS (
            SELECT o_orderpriority AS segment,
                   CAST(round(o_totalprice) AS BIGINT) AS d,
                   row_number() OVER (
                       PARTITION BY o_orderpriority
                       ORDER BY CAST(round(o_totalprice) AS BIGINT),
                                o_orderkey
                   ) AS i
            FROM orders
        ),
        s AS (
            SELECT segment,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(d) AS BIGINT) AS t,
                   CAST(sum(i * d) AS BIGINT) AS s
            FROM v GROUP BY segment
        )
        SELECT segment, n, t AS total_dollars,
               CAST(2 * s - (n + 1) * t AS BIGINT) AS gini_num,
               CAST(n * t AS BIGINT) AS gini_den,
               CAST(((2 * s - (n + 1) * t) * 1000) // (n * t) AS BIGINT)
                   AS gini_permille
        FROM s
    """,
    description="Gini concentration of order value per order priority — "
    "the inequality measure behind 'is revenue concentrated in a few "
    "orders?', via the rank-sum identity G = (2*sum(i*x_i) "
    "- (n+1)*sum(x)) / (n*sum(x)) over ascending ranks: one window for "
    "the rank, one aggregate for the three sufficient statistics, all "
    "in exact integer dollars (ties rank arbitrarily but contribute "
    "identically to sum(i*x), so the result is order-independent). "
    "gini_permille stays inside int64 through sf0.1 (num <= den ~1e15; "
    "x1000 < 2^63); at larger scales report num/den and divide in "
    "decimal. Plan: ONE shuffle on segment shared by the rank window "
    "and the groupBy — the same single-exchange shape as twap",
)
def gini_by_segment(spark, sf_dir):
    from pyspark.sql import Window

    d = F.round(F.col("o_totalprice")).cast("long")
    # alias to `segment` BEFORE the window: ranking over the aliased
    # attribute lets the downstream groupBy("segment") reuse the window's
    # hash partitioning (ranking over o_orderpriority and grouping over
    # its alias are different attributes to Catalyst — that costs a
    # second exchange)
    base = load(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("segment"),
        d.alias("d"),
        "o_orderkey",
    )
    w = Window.partitionBy("segment").orderBy("d", "o_orderkey")
    v = base.select(
        "segment", "d", F.row_number().over(w).alias("i")
    )
    s = v.groupBy("segment").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("d").cast("long").alias("t"),
        F.sum(F.col("i") * F.col("d")).cast("long").alias("s"),
    )
    num = F.lit(2) * F.col("s") - (F.col("n") + 1) * F.col("t")
    den = F.col("n") * F.col("t")
    return s.select(
        "segment",
        "n",
        F.col("t").alias("total_dollars"),
        num.cast("long").alias("gini_num"),
        den.cast("long").alias("gini_den"),
        F.expr("((2 * s - (n + 1) * t) * 1000) div (n * t)")
        .cast("long")
        .alias("gini_permille"),
    )


# ---------------------------------------------------------------------------
# Categorical association: chi-squared independence + Cramér's V
# ---------------------------------------------------------------------------


@query(
    "chi_square_independence",
    oracle=f"""
        WITH cells AS (
            SELECT lang, source, CAST(count(*) AS BIGINT) AS o
            FROM documents GROUP BY lang, source
        ),
        rr AS (
            SELECT lang, CAST(sum(o) AS BIGINT) AS r
            FROM cells GROUP BY lang
        ),
        cc AS (
            SELECT source, CAST(sum(o) AS BIGINT) AS c
            FROM cells GROUP BY source
        ),
        tot AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
        dims AS (
            SELECT (SELECT CAST(count(*) AS BIGINT) FROM rr) AS nr,
                   (SELECT CAST(count(*) AS BIGINT) FROM cc) AS nc
        ),
        terms AS (
            SELECT CAST(floor(
                       (CAST(o AS DOUBLE) * n - CAST(r AS DOUBLE) * c)
                       * (CAST(o AS DOUBLE) * n - CAST(r AS DOUBLE) * c)
                       / (CAST(n AS DOUBLE) * r * c) * {_NANO}
                   ) AS BIGINT) AS term_nano
            FROM cells
            JOIN rr USING (lang) JOIN cc USING (source) CROSS JOIN tot
        ),
        agg AS (
            SELECT CAST(sum(term_nano) AS BIGINT) AS chi2_nano FROM terms
        )
        SELECT n,
               (nr - 1) * (nc - 1) AS dof,
               chi2_nano,
               CAST(floor(sqrt(
                   CAST(chi2_nano AS DOUBLE) / {_NANO}
                   / (CAST(n AS DOUBLE) * least(nr - 1, nc - 1))
               ) * {_NANO}) AS BIGINT) AS cramers_v_nano
        FROM agg CROSS JOIN tot CROSS JOIN dims
    """,
    description="Chi-squared test of independence between two categorical "
    "columns (documents.lang x documents.source) plus Cramér's V effect "
    "size. Observed/expected counts come from exact integer group-bys; "
    "each cell's (o*n - r*c)^2/(n*r*c) contribution is floored to nano "
    "units BEFORE the final sum, so the aggregate is an order-insensitive "
    "long sum — parallel reduction order cannot shift the statistic. "
    "Plan: one partial-agg shuffle over the (lang, source) contingency "
    "cells, then broadcast joins of the tiny marginal tables back onto "
    "them; raw rows are touched exactly once regardless of scale",
)
def chi_square_independence(spark, sf_dir):
    from pyspark.sql import Window

    # r13 (the mutual_information shape, 24 -> 2 jobs): the marginal
    # tables, total and dims used to branch off a persisted contingency
    # aggregate as five broadcast-build jobs joined back onto it; they
    # now attach as window sums over the SAME K-cell relation (partition
    # lang / partition source / whole-relation — all K-row inputs), and
    # nr/nc fold into the final aggregate as distinct counts. Every
    # floored double term is computed by the same expression over the
    # same operands, so the driver hash is unchanged. One lineage, no
    # joins, no persist.
    cells = (
        load(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(F.count("*").cast("long").alias("o"))
    )
    cellsw = cells.select(
        "lang",
        "source",
        "o",
        F.sum("o").over(Window.partitionBy("lang")).alias("r"),
        F.sum("o").over(Window.partitionBy("source")).alias("c"),
        F.sum("o").over(Window.partitionBy()).alias("n"),
    )
    # NULL-key semantics must match the oracle's joins exactly (r14, ADVICE):
    # the oracle's JOIN ... USING (lang/source) drops NULL-keyed cells from
    # the chi2 terms (NULL never equi-joins), while its dims CTE counts the
    # NULL marginal GROUP in nr/nc (count(*) over the GROUP BY result). So
    # the window formulation (where NULL forms a real partition) gates the
    # term on both keys being non-NULL, and nr/nc count distinct STRUCTS —
    # struct(NULL) is itself non-null, so the NULL group is counted like
    # the oracle's, and an empty input still yields 0 (not NULL).
    term = (
        F.when(
            F.col("lang").isNotNull() & F.col("source").isNotNull(),
            F.floor(
                (F.col("o").cast("double") * F.col("n")
                 - F.col("r").cast("double") * F.col("c"))
                * (F.col("o").cast("double") * F.col("n")
                   - F.col("r").cast("double") * F.col("c"))
                / (F.col("n").cast("double") * F.col("r") * F.col("c"))
                * _NANO
            ).cast("long"),
        )
        .alias("term_nano")
    )
    agg = cellsw.select("lang", "source", "n", term).agg(
        F.max("n").cast("long").alias("n"),
        F.count_distinct(F.struct("lang")).cast("long").alias("nr"),
        F.count_distinct(F.struct("source")).cast("long").alias("nc"),
        F.sum("term_nano").cast("long").alias("chi2_nano"),
    )
    return agg.select(
        "n",
        ((F.col("nr") - 1) * (F.col("nc") - 1)).alias("dof"),
        "chi2_nano",
        F.floor(
            F.sqrt(
                F.col("chi2_nano").cast("double") / _NANO
                / (F.col("n").cast("double")
                   * F.least(F.col("nr") - 1, F.col("nc") - 1))
            )
            * _NANO
        )
        .cast("long")
        .alias("cramers_v_nano"),
    )


# ---------------------------------------------------------------------------
# A/B test: two-proportion z-test from deterministic hash assignment
# ---------------------------------------------------------------------------

# the z-statistic as ONE expression over four exact longs — the identical
# text is parsed by both Spark SQL and DuckDB, so the double arithmetic
# (and its floor) is bit-identical
_ZTEST_EXPR = f"""CASE
    WHEN n_a = 0 OR n_b = 0
         OR conv_a + conv_b = 0 OR conv_a + conv_b = n_a + n_b
    THEN NULL
    ELSE CAST(floor(
        (CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b)
        / sqrt(
            (CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
            * (1 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
            * (1.0 / n_a + 1.0 / n_b)
        ) * {_NANO}) AS BIGINT)
    END"""


@query(
    "ab_test_ztest",
    oracle=f"""
        WITH u AS (
            SELECT user_id % 2 AS arm,
                   max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                       AS conv
            FROM events GROUP BY user_id
        ),
        a AS (
            SELECT
                CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
                    AS n_a,
                CAST(sum(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT)
                    AS conv_a,
                CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
                    AS n_b,
                CAST(sum(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT)
                    AS conv_b
            FROM u
        )
        SELECT n_a, conv_a, n_b, conv_b,
               CASE WHEN n_a = 0 THEN NULL ELSE
                   CAST(floor(CAST(conv_a AS DOUBLE) / n_a * {_NANO})
                        AS BIGINT) END AS p_a_nano,
               CASE WHEN n_b = 0 THEN NULL ELSE
                   CAST(floor(CAST(conv_b AS DOUBLE) / n_b * {_NANO})
                        AS BIGINT) END AS p_b_nano,
               {_ZTEST_EXPR} AS z_nano
        FROM a
    """,
    description="Two-proportion z-test between deterministic experiment "
    "arms (user_id parity) on purchase conversion. Per-user conversion is "
    "a max-flag aggregate (one shuffle on user_id, map-side combinable); "
    "arm totals collapse to FOUR exact longs, and the z statistic is one "
    "shared expression over them — the same text DuckDB parses, so even "
    "the floating-point step hash-matches. The per-user shuffle is the "
    "only data-sized stage at any scale",
)
def ab_test_ztest(spark, sf_dir):
    u = (
        load(spark, sf_dir, "events")
        .groupBy((F.col("user_id") % 2).alias("arm"), "user_id")
        .agg(
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("conv")
        )
    )
    a = u.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_a"),
        F.sum(F.when(F.col("arm") == 0, F.col("conv")).otherwise(0))
        .cast("long")
        .alias("conv_a"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_b"),
        F.sum(F.when(F.col("arm") == 1, F.col("conv")).otherwise(0))
        .cast("long")
        .alias("conv_b"),
    )
    return a.select(
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        F.expr(
            f"CASE WHEN n_a = 0 THEN NULL ELSE "
            f"CAST(floor(CAST(conv_a AS DOUBLE) / n_a * {_NANO}) "
            f"AS BIGINT) END"
        ).alias("p_a_nano"),
        F.expr(
            f"CASE WHEN n_b = 0 THEN NULL ELSE "
            f"CAST(floor(CAST(conv_b AS DOUBLE) / n_b * {_NANO}) "
            f"AS BIGINT) END"
        ).alias("p_b_nano"),
        F.expr(_ZTEST_EXPR).alias("z_nano"),
    )


# ---------------------------------------------------------------------------
# Per-group multiple regression: 2 features + intercept via normal equations
# ---------------------------------------------------------------------------


def _det3(m: list[str]) -> str:
    """Expansion-by-first-row determinant of a 3x3 of column names, every
    entry promoted to DOUBLE — one fixed expression tree, identical text
    for Spark SQL and DuckDB."""
    c = [f"CAST({x} AS DOUBLE)" for x in m]
    return (
        f"({c[0]} * ({c[4]} * {c[8]} - {c[5]} * {c[7]})"
        f" - {c[1]} * ({c[3]} * {c[8]} - {c[5]} * {c[6]})"
        f" + {c[2]} * ({c[3]} * {c[7]} - {c[4]} * {c[6]}))"
    )


# A = [[n,s1,s2],[s1,s11,s12],[s2,s12,s22]], v = [sy,s1y,s2y]; Cramer's rule
_OLS_DET = _det3(["n", "s1", "s2", "s1", "s11", "s12", "s2", "s12", "s22"])
_OLS_D0 = _det3(["sy", "s1", "s2", "s1y", "s11", "s12", "s2y", "s12", "s22"])
_OLS_D1 = _det3(["n", "sy", "s2", "s1", "s1y", "s12", "s2", "s2y", "s22"])
_OLS_D2 = _det3(["n", "s1", "sy", "s1", "s11", "s1y", "s2", "s12", "s2y"])


def _ols_beta(d: str) -> str:
    """One Cramer beta, singular-safe: a group whose design matrix is
    rank-deficient (DET = 0 — e.g. too few observations, or a feature
    constant within the group) yields NULL instead of an ANSI
    divide-by-zero abort. Shared textually between both engines."""
    return (
        f"CAST(CASE WHEN {_OLS_DET} = 0 THEN NULL "
        f"ELSE floor({d} / {_OLS_DET} * {_NANO}) END AS BIGINT)"
    )


@query(
    "ols_two_feature",
    oracle=f"""
        WITH e0 AS (
            SELECT event_type,
                   CAST(round(value * 100) AS BIGINT) AS y,
                   TRY_CAST(regexp_extract(props, '[0-9]+') AS BIGINT)
                       AS x1,
                   (CAST(epoch_us(ts) AS BIGINT) // 3600000000) % 24 AS x2
            FROM events
        ),
        e AS (
            SELECT * FROM e0 WHERE x1 IS NOT NULL
        ),
        m AS (
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(x1) AS BIGINT) AS s1,
                   CAST(sum(x2) AS BIGINT) AS s2,
                   CAST(sum(y) AS BIGINT) AS sy,
                   CAST(sum(x1 * x1) AS BIGINT) AS s11,
                   CAST(sum(x1 * x2) AS BIGINT) AS s12,
                   CAST(sum(x2 * x2) AS BIGINT) AS s22,
                   CAST(sum(x1 * y) AS BIGINT) AS s1y,
                   CAST(sum(x2 * y) AS BIGINT) AS s2y
            FROM e GROUP BY event_type
        )
        SELECT event_type, n,
               {_ols_beta(_OLS_D0)} AS b0_nano,
               {_ols_beta(_OLS_D1)} AS b1_nano,
               {_ols_beta(_OLS_D2)} AS b2_nano
        FROM m
    """,
    description="Per-group multiple linear regression (cents ~ numeric "
    "prop + hour-of-day + intercept) solved in closed form: nine exact "
    "integer moments per group from ONE map-side-combinable groupBy, then "
    "Cramér's-rule 3x3 determinants as a fixed double expression shared "
    "textually with the oracle. No iteration, no driver-side math, no "
    "matrix library — the entire fit is a single aggregate at any scale. "
    "At 100 TB the moments would widen to DECIMAL(38,0); the plan (one "
    "partial agg, 10 longs per group) is unchanged",
)
def ols_two_feature(spark, sf_dir):
    # try_cast + NULL-x1 filter: digitless props excludes the observation
    # (regression over present features), never an ANSI cast crash
    e = (
        load(spark, sf_dir, "events")
        .select(
            "event_type",
            F.round(F.col("value") * 100).cast("long").alias("y"),
            F.regexp_extract("props", "[0-9]+", 0)
            .try_cast("long")
            .alias("x1"),
            F.expr(
                "(unix_micros(CAST(ts AS TIMESTAMP)) div 3600000000) % 24"
            ).alias("x2"),
        )
        .filter(F.col("x1").isNotNull())
    )
    m = e.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x1").cast("long").alias("s1"),
        F.sum("x2").cast("long").alias("s2"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x1") * F.col("x1")).cast("long").alias("s11"),
        F.sum(F.col("x1") * F.col("x2")).cast("long").alias("s12"),
        F.sum(F.col("x2") * F.col("x2")).cast("long").alias("s22"),
        F.sum(F.col("x1") * F.col("y")).cast("long").alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).cast("long").alias("s2y"),
    )
    return m.select(
        "event_type",
        "n",
        F.expr(_ols_beta(_OLS_D0)).alias("b0_nano"),
        F.expr(_ols_beta(_OLS_D1)).alias("b1_nano"),
        F.expr(_ols_beta(_OLS_D2)).alias("b2_nano"),
    )


# ---------------------------------------------------------------------------
# Inter-rater agreement: Cohen's kappa between two rule annotators
# ---------------------------------------------------------------------------

# kappa as ONE expression over the four exact agreement counts — shared
# textually with the oracle so the double math is bit-identical
_KAPPA_EXPR = f"""CASE
    WHEN (n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)
         = (n11 + n10 + n01 + n00) * (n11 + n10 + n01 + n00)
    THEN NULL
    ELSE CAST(floor(
        (CAST(n11 + n00 AS DOUBLE) * (n11 + n10 + n01 + n00)
         - (CAST(n11 + n10 AS DOUBLE) * (n11 + n01)
            + CAST(n01 + n00 AS DOUBLE) * (n10 + n00)))
        / (CAST(n11 + n10 + n01 + n00 AS DOUBLE)
           * (n11 + n10 + n01 + n00)
           - (CAST(n11 + n10 AS DOUBLE) * (n11 + n01)
              + CAST(n01 + n00 AS DOUBLE) * (n10 + n00)))
        * {_NANO}) AS BIGINT)
    END"""


@query(
    "cohens_kappa",
    oracle=f"""
        WITH lab AS (
            SELECT CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS a,
                   CASE WHEN len(string_split(text, ' ')) >= 50
                        THEN 1 ELSE 0 END AS b
            FROM documents
        ),
        c AS (
            SELECT
                CAST(sum(a * b) AS BIGINT) AS n11,
                CAST(sum(a * (1 - b)) AS BIGINT) AS n10,
                CAST(sum((1 - a) * b) AS BIGINT) AS n01,
                CAST(sum((1 - a) * (1 - b)) AS BIGINT) AS n00
            FROM lab
        )
        SELECT n11, n10, n01, n00, {_KAPPA_EXPR} AS kappa_nano
        FROM c
    """,
    description="Cohen's kappa agreement between two deterministic "
    "labeling rules (char-length gate vs token-count gate) — the "
    "chance-corrected agreement metric behind every annotation-quality "
    "and silver-label audit. The 2x2 agreement table is four exact long "
    "sums from ONE map-side-combinable aggregate over a single corpus "
    "scan; kappa = (po - pe)/(1 - pe) is algebraically cleared of "
    "divisions into one shared numerator/denominator expression over "
    "those longs. Swap either rule for a model's labels and the plan is "
    "unchanged at any scale",
)
def cohens_kappa(spark, sf_dir):
    lab = load(spark, sf_dir, "documents").select(
        F.when(F.col("n_chars") >= 300, 1).otherwise(0).alias("a"),
        F.when(F.size(F.split(F.col("text"), " ")) >= 50, 1)
        .otherwise(0)
        .alias("b"),
    )
    c = lab.agg(
        F.sum(F.col("a") * F.col("b")).cast("long").alias("n11"),
        F.sum(F.col("a") * (1 - F.col("b"))).cast("long").alias("n10"),
        F.sum((1 - F.col("a")) * F.col("b")).cast("long").alias("n01"),
        F.sum((1 - F.col("a")) * (1 - F.col("b")))
        .cast("long")
        .alias("n00"),
    )
    return c.select(
        "n11", "n10", "n01", "n00", F.expr(_KAPPA_EXPR).alias("kappa_nano")
    )


# ---------------------------------------------------------------------------
# Nonparametric two-sample test: Mann-Whitney U (rank-sum), aggregated form
# ---------------------------------------------------------------------------

# z-statistic with tie-corrected variance as ONE expression over exact
# longs (u2 = 2*U to keep half-ranks integral; tie term sum(t^3 - t))
_MWU_Z = f"""CASE
    WHEN n_a = 0 OR n_b = 0 OR CAST(n_a + n_b AS DOUBLE) *
         ((CAST(n_a AS DOUBLE) * n_b / 12)
          * ((n_a + n_b + 1)
             - CAST(tie3 AS DOUBLE) / ((n_a + n_b) * (n_a + n_b - 1))))
         = 0
    THEN NULL
    ELSE CAST(floor(
        (CAST(u2 AS DOUBLE) / 2 - CAST(n_a AS DOUBLE) * n_b / 2)
        / sqrt((CAST(n_a AS DOUBLE) * n_b / 12)
               * ((n_a + n_b + 1)
                  - CAST(tie3 AS DOUBLE)
                    / ((n_a + n_b) * (n_a + n_b - 1))))
        * {_NANO}) AS BIGINT)
    END"""


@query(
    "mann_whitney_u",
    oracle=f"""
        WITH v AS (
            SELECT CAST(round(value * 100) AS BIGINT) AS cents,
                   CAST(sum(CASE WHEN event_type = 'purchase'
                            THEN 1 ELSE 0 END) AS BIGINT) AS na,
                   CAST(sum(CASE WHEN event_type = 'click'
                            THEN 1 ELSE 0 END) AS BIGINT) AS nb
            FROM events
            WHERE event_type IN ('purchase', 'click')
            GROUP BY cents
        ),
        r AS (
            SELECT cents, na, nb, na + nb AS t,
                   CAST(sum(na + nb) OVER (
                       ORDER BY cents
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS cum
            FROM v
        ),
        m AS (
            SELECT CAST(sum(na) AS BIGINT) AS n_a,
                   CAST(sum(nb) AS BIGINT) AS n_b,
                   CAST(sum(na * (2 * cum - t + 1)) AS BIGINT) AS r2_a,
                   CAST(sum(t * t * t - t) AS BIGINT) AS tie3
            FROM r
        )
        SELECT n_a, n_b,
               r2_a - n_a * (n_a + 1) AS u2,
               tie3,
               {_MWU_Z} AS z_nano
        FROM m
    """,
    description="Mann-Whitney U rank-sum test (purchase vs click event "
    "values) in the AGGREGATED formulation: raw rows reduce to one row "
    "per distinct integer-cents value (bounded by the value range, not "
    "volume), average ranks come from a cumulative count window over "
    "those rows, and doubled rank sums keep tie half-ranks integral — "
    "U, the tie correction and the z statistic are all exact longs "
    "until one shared final expression. The nonparametric complement to "
    "drift_ks for distribution-shift gates: no normality assumption, "
    "robust to outliers that sink a t-test",
)
def mann_whitney_u(spark, sf_dir):
    # expression-text construction (r13): identical functions/literals to
    # the original Column fold, so plan and hash are unchanged; build
    # 0.41 -> 0.08 s (interleaved A/B)
    v = (
        load(spark, sf_dir, "events")
        .where("event_type IN ('purchase', 'click')")
        .groupBy(
            F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents")
        )
        .agg(
            F.expr(
                "CAST(sum(CASE WHEN event_type = 'purchase'"
                " THEN 1 ELSE 0 END) AS BIGINT) AS na"
            ),
            F.expr(
                "CAST(sum(CASE WHEN event_type = 'click'"
                " THEN 1 ELSE 0 END) AS BIGINT) AS nb"
            ),
        )
    )
    r = v.selectExpr(
        "cents",
        "na",
        "nb",
        "(na + nb) AS t",
        "CAST(sum(na + nb) OVER (ORDER BY cents ROWS BETWEEN UNBOUNDED"
        " PRECEDING AND CURRENT ROW) AS BIGINT) AS cum",
    )
    m = r.agg(
        F.expr("CAST(sum(na) AS BIGINT) AS n_a"),
        F.expr("CAST(sum(nb) AS BIGINT) AS n_b"),
        F.expr("CAST(sum(na * (2 * cum - t + 1)) AS BIGINT) AS r2_a"),
        F.expr("CAST(sum(t * t * t - t) AS BIGINT) AS tie3"),
    )
    return m.selectExpr(
        "n_a",
        "n_b",
        "(r2_a - n_a * (n_a + 1)) AS u2",
        "tie3",
        f"{_MWU_Z} AS z_nano",
    )


# ---------------------------------------------------------------------------
# Welch's t-test between two groups, from exact integer moments
# ---------------------------------------------------------------------------

_WELCH_T = f"""CASE
    WHEN n_a < 2 OR n_b < 2 OR
         ((CAST(ss_a AS DOUBLE) * n_a - CAST(s_a AS DOUBLE) * s_a)
          / (CAST(n_a AS DOUBLE) * n_a * (n_a - 1))
          + (CAST(ss_b AS DOUBLE) * n_b - CAST(s_b AS DOUBLE) * s_b)
            / (CAST(n_b AS DOUBLE) * n_b * (n_b - 1))) <= 0
    THEN NULL
    ELSE CAST(floor(
        (CAST(s_a AS DOUBLE) / n_a - CAST(s_b AS DOUBLE) / n_b)
        / sqrt((CAST(ss_a AS DOUBLE) * n_a - CAST(s_a AS DOUBLE) * s_a)
               / (CAST(n_a AS DOUBLE) * n_a * (n_a - 1))
               + (CAST(ss_b AS DOUBLE) * n_b - CAST(s_b AS DOUBLE) * s_b)
                 / (CAST(n_b AS DOUBLE) * n_b * (n_b - 1)))
        * {_NANO}) AS BIGINT)
    END"""


@query(
    "welch_ttest",
    oracle=f"""
        WITH m AS (
            SELECT
                CAST(sum(CASE WHEN event_type = 'purchase'
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
                CAST(sum(CASE WHEN event_type = 'purchase'
                         THEN CAST(round(value * 100) AS BIGINT)
                         ELSE 0 END) AS BIGINT) AS s_a,
                CAST(sum(CASE WHEN event_type = 'purchase'
                         THEN CAST(round(value * 100) AS BIGINT)
                              * CAST(round(value * 100) AS BIGINT)
                         ELSE 0 END) AS BIGINT) AS ss_a,
                CAST(sum(CASE WHEN event_type = 'click'
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
                CAST(sum(CASE WHEN event_type = 'click'
                         THEN CAST(round(value * 100) AS BIGINT)
                         ELSE 0 END) AS BIGINT) AS s_b,
                CAST(sum(CASE WHEN event_type = 'click'
                         THEN CAST(round(value * 100) AS BIGINT)
                              * CAST(round(value * 100) AS BIGINT)
                         ELSE 0 END) AS BIGINT) AS ss_b
            FROM events WHERE event_type IN ('purchase', 'click')
        )
        SELECT n_a, s_a, n_b, s_b, {_WELCH_T} AS t_nano
        FROM m
    """,
    description="Welch's unequal-variance t-test (purchase vs click event "
    "values): six exact integer moments from ONE map-side-combinable "
    "aggregate over a single scan, then the t statistic as one shared "
    "double expression — the parametric fast path next to "
    "mann_whitney_u's rank-based robustness. The standard significance "
    "gate for A/B value metrics where conversion z-tests (ab_test_ztest) "
    "cover rates",
)
def welch_ttest(spark, sf_dir):
    cents = F.round(F.col("value") * 100).cast("long")
    m = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("purchase", "click"))
        .agg(
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("long")
            .alias("n_a"),
            F.sum(
                F.when(F.col("event_type") == "purchase", cents).otherwise(0)
            )
            .cast("long")
            .alias("s_a"),
            F.sum(
                F.when(
                    F.col("event_type") == "purchase", cents * cents
                ).otherwise(0)
            )
            .cast("long")
            .alias("ss_a"),
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
            .cast("long")
            .alias("n_b"),
            F.sum(
                F.when(F.col("event_type") == "click", cents).otherwise(0)
            )
            .cast("long")
            .alias("s_b"),
            F.sum(
                F.when(
                    F.col("event_type") == "click", cents * cents
                ).otherwise(0)
            )
            .cast("long")
            .alias("ss_b"),
        )
    )
    return m.select("n_a", "s_a", "n_b", "s_b", F.expr(_WELCH_T).alias("t_nano"))


# ---------------------------------------------------------------------------
# Market concentration: Herfindahl-Hirschman index per segment
# ---------------------------------------------------------------------------


@query(
    "hhi_concentration",
    oracle=f"""
        WITH s AS (
            SELECT c_mktsegment AS segment, o_custkey,
                   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                        // 100 AS BIGINT) AS cust_dollars
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment, o_custkey
        ),
        m AS (
            SELECT segment,
                   CAST(count(*) AS BIGINT) AS n_customers,
                   CAST(sum(cust_dollars) AS BIGINT) AS total_dollars,
                   CAST(sum(cust_dollars * cust_dollars) AS BIGINT)
                       AS sumsq
            FROM s GROUP BY segment
        )
        SELECT segment, n_customers, total_dollars,
               CASE WHEN total_dollars = 0 THEN NULL ELSE
                   CAST(floor(CAST(sumsq AS DOUBLE)
                        / (CAST(total_dollars AS DOUBLE) * total_dollars)
                        * {_NANO}) AS BIGINT) END AS hhi_nano
        FROM m
    """,
    description="Herfindahl-Hirschman concentration of order revenue "
    "across customers, per market segment: HHI = sum(share^2) = "
    "sum(x^2)/(sum(x))^2, so the whole index reduces to TWO exact "
    "integer sums per segment over the per-customer rollup — no "
    "per-entity share division anywhere. Per-customer spend is rounded "
    "to whole dollars BEFORE squaring so sum(x^2) stays inside int64 at "
    "bench scale (cents-squared overflowed at sf0.1; beyond ~1e6 "
    "entities per group the moments widen to DECIMAL(38,0), plan "
    "unchanged). The dominance/concentration gate for corpus sources "
    "(is one domain eating the training mix?) as much as for revenue. "
    "Two map-side-combinable aggregates; the (custkey, segment) dim "
    "projection joins WITHOUT a forced broadcast hint — customer grows "
    "linearly with SF (150k x SF rows, not a fixed dimension), so the "
    "planner/AQE picks broadcast only while the projection fits "
    "autoBroadcastJoinThreshold and falls back to a shuffle join beyond, "
    "instead of the hint bypassing that safety valve at 100 TB",
)
def hhi_concentration(spark, sf_dir):
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_mktsegment").alias("segment")
    )
    s = (
        load(spark, sf_dir, "orders")
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("segment", "o_custkey")
        .agg(
            F.expr(
                "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))"
                " div 100 AS BIGINT)"
            ).alias("cust_dollars")
        )
    )
    m = s.groupBy("segment").agg(
        F.count("*").cast("long").alias("n_customers"),
        F.sum("cust_dollars").cast("long").alias("total_dollars"),
        F.sum(F.col("cust_dollars") * F.col("cust_dollars"))
        .cast("long")
        .alias("sumsq"),
    )
    return m.select(
        "segment",
        "n_customers",
        "total_dollars",
        F.when(F.col("total_dollars") == 0, F.lit(None).cast("long"))
        .otherwise(
            F.floor(
                F.col("sumsq").cast("double")
                / (
                    F.col("total_dollars").cast("double")
                    * F.col("total_dollars")
                )
                * _NANO
            ).cast("long")
        )
        .alias("hhi_nano"),
    )


# ---------------------------------------------------------------------------
# Jackknife variance of the mean: leave-one-block-out from exact totals
# ---------------------------------------------------------------------------

_JK_BLOCKS = 32

# per-block squared deviation of the leave-one-out mean, as ONE expression
# over exact longs (dkk = kk*theta_nano - S is an exact integer; the final
# square is the only double step and is shared textually). Units:
# nano-cents^2 / NANO = nano * cents^2
_JK_DEV2 = """CAST(floor(
    (CAST(dkk AS DOUBLE) / kk) * (CAST(dkk AS DOUBLE) / kk)
    / 1000000000) AS BIGINT)"""


@query(
    "jackknife_variance",
    oracle=f"""
        WITH r AS (
            SELECT CAST(round(value * 100) AS BIGINT) AS cents,
                   CAST(event_id % {_JK_BLOCKS} AS BIGINT) AS blk
            FROM events
        ),
        b AS (
            SELECT blk, CAST(count(*) AS BIGINT) AS n_b,
                   CAST(sum(cents) AS BIGINT) AS s_b
            FROM r GROUP BY blk
        ),
        tot AS (
            SELECT CAST(sum(n_b) AS BIGINT) AS n,
                   CAST(sum(s_b) AS BIGINT) AS s,
                   CAST(count(*) AS BIGINT) AS kk
            FROM b
        ),
        th AS (
            SELECT ((s - s_b) * 1000000000) // (n - n_b) AS theta_nano,
                   kk, n, s
            FROM b CROSS JOIN tot
        ),
        st AS (
            SELECT kk, n, s,
                   CAST(sum(theta_nano) AS BIGINT) AS sum_theta
            FROM th GROUP BY kk, n, s
        ),
        d AS (
            SELECT th.kk, th.n, th.s,
                   th.kk * theta_nano - st.sum_theta AS dkk
            FROM th JOIN st ON th.kk = st.kk
        ),
        agg AS (
            SELECT kk, n, s,
                   CAST(sum({_JK_DEV2}) AS BIGINT) AS dev2
            FROM d GROUP BY kk, n, s
        )
        SELECT n, kk AS n_blocks,
               (s * 1000000000) // n AS mean_cents_nano,
               ((kk - 1) * dev2) // kk AS jk_var_nano
        FROM agg
    """,
    description="Delete-a-block jackknife variance of the mean event "
    "value: rows hash into {k} blocks, each leave-one-out mean comes "
    "from EXACT global-minus-block integer totals (no second data pass "
    "per replicate — the classic distributed jackknife). Every "
    "intermediate is an exact long (integer-division thetas, integer "
    "deviations kk*theta - sum_theta); the single double step is one "
    "shared per-block square, floored before the final exact sum. The "
    "uncertainty estimate any metric pipeline ships next to its point "
    "estimate, for one map-side-combinable aggregate plus arithmetic on "
    "{k} rows".replace("{k}", str(_JK_BLOCKS)),
)
def jackknife_variance(spark, sf_dir):
    # expression-text construction (r13): identical functions/literals to
    # the original Column fold, so plan and hash are unchanged; build
    # 0.36 -> 0.09 s (interleaved A/B)
    wall = "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING"
    r = load(spark, sf_dir, "events").selectExpr(
        "CAST(round(value * 100) AS BIGINT) AS cents",
        f"CAST(event_id % {_JK_BLOCKS} AS BIGINT) AS blk",
    )
    b = r.groupBy("blk").agg(
        F.expr("CAST(count(*) AS BIGINT) AS n_b"),
        F.expr("CAST(sum(cents) AS BIGINT) AS s_b"),
    )
    # every global quantity comes from unpartitioned windows over the
    # K-row block relation — ONE lineage, so raw rows are scanned once
    # (a separate agg + crossJoin would re-derive the block relation per
    # reference: 4 parquet scans, caught by the plan test)
    th = b.selectExpr(
        "n_b",
        "s_b",
        f"CAST(sum(n_b) OVER ({wall}) AS BIGINT) AS n",
        f"CAST(sum(s_b) OVER ({wall}) AS BIGINT) AS s",
        f"CAST(count(*) OVER ({wall}) AS BIGINT) AS kk",
    ).selectExpr(
        "kk",
        "n",
        "s",
        "((s - s_b) * 1000000000) div (n - n_b) AS theta_nano",
    )
    d = th.selectExpr(
        "kk",
        "n",
        "s",
        f"(kk * theta_nano"
        f" - CAST(sum(theta_nano) OVER ({wall}) AS BIGINT)) AS dkk",
    )
    agg = d.groupBy("kk", "n", "s").agg(
        F.expr(f"CAST(sum({_JK_DEV2}) AS BIGINT) AS dev2")
    )
    return agg.selectExpr(
        "n",
        "kk AS n_blocks",
        "(s * 1000000000) div n AS mean_cents_nano",
        "((kk - 1) * dev2) div kk AS jk_var_nano",
    )


# ---------------------------------------------------------------------------
# Poisson bootstrap CI of the mean — deterministic hash-derived resamples
# ---------------------------------------------------------------------------

_BOOT_B = 32  # resamples; weights ~ Binomial(4, 1/4), mean 1 (Poisson approx)
# one 60-bit hash carries 7 resamples' worth of 2-bit trials (7 slots x 4
# trials = 28 of its 30 bit-pairs), so the md5 count per row is B/7, not B
_BOOT_SLOTS = 7
_BOOT_CHUNKS = -(-_BOOT_B // _BOOT_SLOTS)  # ceil

from hls_payer_mrf_sparkstreaming_spark.functions.hashing import (  # noqa: E402
    md5u60_sql,
)


def _boot_w_sql(h: str) -> str:
    """Resample multiplicity from 8 hash bits: four 2-bit trials, each a
    success with p=1/4 — identical text for Spark SQL and DuckDB. ``h``
    is a 60-bit hash already shifted so the slot's byte is at bit 0."""
    return " + ".join(
        f"(CASE WHEN (({h} >> {2 * t}) & 3) = 0 THEN 1 ELSE 0 END)"
        for t in range(4)
    )


@query(
    "poisson_bootstrap_ci",
    oracle=f"""
        WITH x AS (
            SELECT event_id, CAST(round(value * 100) AS BIGINT) AS cents
            FROM events
        ),
        w AS (
            SELECT c.chunk * {_BOOT_SLOTS} + s.slot AS b, cents,
                   {_boot_w_sql(
                       "(" + md5u60_sql(
                           "CAST(event_id AS VARCHAR) || '-' || "
                           "CAST(c.chunk AS VARCHAR)"
                       ) + " >> (8 * s.slot))"
                   )} AS m
            FROM x, range({_BOOT_CHUNKS}) c(chunk),
                 range({_BOOT_SLOTS}) s(slot)
            WHERE c.chunk * {_BOOT_SLOTS} + s.slot < {_BOOT_B}
        ),
        t AS (
            SELECT b, CAST(sum(m) AS BIGINT) AS n_b,
                   CAST(sum(m * cents) AS BIGINT) AS s_b
            FROM w GROUP BY b
        ),
        th AS (
            SELECT (s_b * 1000000000) // n_b AS theta_nano,
                   row_number() OVER (
                       ORDER BY (s_b * 1000000000) // n_b, b) AS rnk
            FROM t WHERE n_b > 0
        ),
        g AS (
            SELECT CAST(count(*) AS BIGINT) AS bb,
                   CAST(sum(theta_nano) AS BIGINT) AS st
            FROM th
        )
        SELECT bb AS n_resamples,
               st // bb AS boot_mean_nano,
               (SELECT max(CASE WHEN rnk = (5 * bb + 99) // 100
                           THEN theta_nano END) FROM th) AS lo_nano,
               (SELECT max(CASE WHEN rnk = (95 * bb + 99) // 100
                           THEN theta_nano END) FROM th) AS hi_nano
        FROM g
    """,
    description="Poisson bootstrap 90% CI of the mean event value "
    "(Chamandy et al., the bootstrap that works on data too big to "
    "resample by index): each row's multiplicity in resample b is a "
    "Binomial(4, 1/4) draw derived from the shared md5-60 hash of "
    "(event_id, b) — fully deterministic, so even the CI endpoints "
    "hash-match the oracle. One scan fans out x{c} hash chunks (each "
    "60-bit hash feeds 7 resamples' trial bits, so the md5 cost per row "
    "is B/7, not B), explodes to x{b} weighted rows, reduces map-side "
    "to {b} (weight-sum, weighted-sum) pairs, and the discrete p5/p95 "
    "come from exact integer rank arithmetic over {b} rows".replace(
        "{b}", str(_BOOT_B)
    ).replace("{c}", str(_BOOT_CHUNKS)),
)
def poisson_bootstrap_ci(spark, sf_dir):
    from pyspark.sql import Window

    from hls_payer_mrf_sparkstreaming_spark.functions.hashing import md5u60

    x = load(spark, sf_dir, "events").select(
        "event_id", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    w = (
        x.select(
            "cents",
            F.explode(
                F.sequence(F.lit(0), F.lit(_BOOT_CHUNKS - 1))
            ).alias("chunk"),
            "event_id",
        )
        .select(
            "cents",
            "chunk",
            # ONE md5 per (row, chunk) materialized here; the slot explode
            # below only slices its bits
            F.expr(
                "CAST(conv(substring(md5(CAST(event_id AS STRING) || '-' "
                "|| CAST(chunk AS STRING)), 1, 15), 16, 10) AS BIGINT)"
            ).alias("h"),
        )
        .select(
            "cents",
            "h",
            F.explode(
                F.sequence(F.lit(0), F.lit(_BOOT_SLOTS - 1))
            ).alias("slot"),
            "chunk",
        )
        .filter(
            F.col("chunk") * _BOOT_SLOTS + F.col("slot") < _BOOT_B
        )
        .select(
            (F.col("chunk") * _BOOT_SLOTS + F.col("slot")).alias("b"),
            "cents",
            F.expr(_boot_w_sql("(h >> (8 * slot))")).alias("m"),
        )
    )
    t = w.groupBy("b").agg(
        F.sum("m").cast("long").alias("n_b"),
        F.sum(F.col("m") * F.col("cents")).cast("long").alias("s_b"),
    )
    th = (
        t.filter(F.col("n_b") > 0)
        .select(
            F.expr("(s_b * 1000000000) div n_b").alias("theta_nano"), "b"
        )
        .select(
            "theta_nano",
            F.row_number()
            .over(Window.orderBy("theta_nano", "b"))
            .alias("rnk"),
        )
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    r = th.select(
        "theta_nano",
        "rnk",
        F.count("*").over(wall).cast("long").alias("bb"),
        F.sum("theta_nano").over(wall).cast("long").alias("st"),
    )
    return r.groupBy("bb", "st").agg(
        F.max(
            F.when(
                F.col("rnk") == F.expr("(5 * bb + 99) div 100"),
                F.col("theta_nano"),
            )
        ).alias("lo_nano"),
        F.max(
            F.when(
                F.col("rnk") == F.expr("(95 * bb + 99) div 100"),
                F.col("theta_nano"),
            )
        ).alias("hi_nano"),
    ).select(
        F.col("bb").alias("n_resamples"),
        F.expr("st div bb").alias("boot_mean_nano"),
        "lo_nano",
        "hi_nano",
    )


# ---------------------------------------------------------------------------
# Population Stability Index between two time halves
# ---------------------------------------------------------------------------

_PSI_BINS = 10
_PSI_LO = 0  # event value cents range at any SF
_PSI_HI = 10000

# per-bin PSI contribution over exact counts, shared textually; the
# +1 smoothing keeps empty bins finite, identically on both engines
_PSI_TERM = f"""CAST(floor(
    ((CAST(a + 1 AS DOUBLE) / (na + {_PSI_BINS}))
     - (CAST(e + 1 AS DOUBLE) / (ne + {_PSI_BINS})))
    * ln((CAST(a + 1 AS DOUBLE) / (na + {_PSI_BINS}))
         / (CAST(e + 1 AS DOUBLE) / (ne + {_PSI_BINS})))
    * {_NANO}) AS BIGINT)"""


@query(
    "psi_stability_index",
    oracle=f"""
        WITH r AS (
            SELECT CAST(round(value * 100) AS BIGINT) AS cents,
                   CAST(epoch_us(ts) AS BIGINT) AS us
            FROM events
        ),
        g AS (SELECT CAST(min(us) AS BIGINT) AS lo_us,
                     CAST(max(us) AS BIGINT) AS hi_us FROM r),
        lab AS (
            SELECT least(greatest((cents - {_PSI_LO}) * {_PSI_BINS}
                       // ({_PSI_HI} - {_PSI_LO}), 0), {_PSI_BINS - 1})
                       AS bin,
                   CASE WHEN us * 2 < lo_us + hi_us THEN 0 ELSE 1 END
                       AS half
            FROM r CROSS JOIN g
        ),
        c AS (
            SELECT bin,
                   CAST(sum(CASE WHEN half = 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS e,
                   CAST(sum(CASE WHEN half = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS a
            FROM lab GROUP BY bin
        ),
        t AS (
            SELECT bin, e, a,
                   CAST(sum(e) OVER () AS BIGINT) AS ne,
                   CAST(sum(a) OVER () AS BIGINT) AS na
            FROM c
        )
        SELECT CAST(sum({_PSI_TERM}) AS BIGINT) AS psi_nano,
               max(ne) AS n_expected, max(na) AS n_actual
        FROM t
    """,
    description="Population Stability Index of the event-value "
    "distribution, first time-half (expected) vs second (actual) — THE "
    "model-monitoring drift gate (<0.1 stable, >0.25 shifted) "
    "complementing drift_ks's supremum and mann_whitney_u's rank test. "
    "Fixed integer bins, Laplace-smoothed exact counts, each bin's "
    "(a%-e%)ln(a%/e%) floored to nano BEFORE the final order-insensitive "
    "long sum. One partial agg to {b} bins; the windows see bins only"
    .replace("{b}", str(_PSI_BINS)),
)
def psi_stability_index(spark, sf_dir):
    from pyspark.sql import Window

    r = load(spark, sf_dir, "events").select(
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    g = r.agg(
        F.min("us").cast("long").alias("lo_us"),
        F.max("us").cast("long").alias("hi_us"),
    )
    lab = r.crossJoin(F.broadcast(g)).select(
        F.least(
            F.greatest(
                F.expr(
                    f"(cents - {_PSI_LO}) * {_PSI_BINS}"
                    f" div ({_PSI_HI} - {_PSI_LO})"
                ),
                F.lit(0).cast("long"),
            ),
            F.lit(_PSI_BINS - 1).cast("long"),
        ).alias("bin"),
        F.when(
            F.col("us") * 2 < F.col("lo_us") + F.col("hi_us"), 0
        ).otherwise(1).alias("half"),
    )
    c = lab.groupBy("bin").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0))
        .cast("long")
        .alias("e"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0))
        .cast("long")
        .alias("a"),
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    t = c.select(
        "bin",
        "e",
        "a",
        F.sum("e").over(wall).cast("long").alias("ne"),
        F.sum("a").over(wall).cast("long").alias("na"),
    )
    return t.agg(
        F.sum(F.expr(_PSI_TERM)).cast("long").alias("psi_nano"),
        F.max("ne").alias("n_expected"),
        F.max("na").alias("n_actual"),
    )


# ---------------------------------------------------------------------------
# Split-conformal prediction interval per series
# ---------------------------------------------------------------------------


@query(
    "conformal_interval",
    oracle=f"""
        WITH e AS (
            SELECT event_type,
                   CAST(round(value * 100) AS BIGINT) AS cents,
                   CAST(user_id % 2 AS BIGINT) AS half
            FROM events
        ),
        fit AS (
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n_fit,
                   CAST(sum(cents) AS BIGINT) AS s_fit
            FROM e WHERE half = 0 GROUP BY event_type
        ),
        res AS (
            SELECT e.event_type,
                   greatest(cents * n_fit - s_fit, s_fit - cents * n_fit)
                       AS r_scaled,
                   n_fit, s_fit
            FROM e JOIN fit ON e.event_type = fit.event_type
            WHERE half = 1
        ),
        rk AS (
            SELECT event_type, r_scaled, n_fit, s_fit,
                   row_number() OVER (
                       PARTITION BY event_type
                       ORDER BY r_scaled, s_fit) AS rnk,
                   CAST(count(*) OVER (PARTITION BY event_type)
                        AS BIGINT) AS n_cal
            FROM res
        )
        SELECT event_type, n_cal,
               (s_fit * 1000000000) // n_fit AS pred_nano,
               CAST(max(CASE WHEN rnk = (9 * (n_cal + 1) + 9) // 10
                        THEN (r_scaled * 1000000000) // n_fit END)
                    AS BIGINT) AS qhat_nano
        FROM rk GROUP BY event_type, n_cal, s_fit, n_fit
    """,
    description="Split-conformal 90% prediction interval per series: fit "
    "half (user parity 0) supplies the point prediction (the series "
    "mean), calibration half supplies q_hat = the ceil(0.9(n+1))-th "
    "smallest absolute residual — distribution-free finite-sample "
    "coverage (Vovk; Angelopoulos-Bates). Residuals stay EXACT by "
    "comparing cents*n_fit against s_fit (no mean division until the "
    "final nano projection), and the quantile is discrete integer rank "
    "arithmetic, not interpolation. One scan, one join of a broadcast "
    "per-series fit table, one per-series rank window over calibration "
    "rows",
)
def conformal_interval(spark, sf_dir):
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        (F.col("user_id") % 2).cast("long").alias("half"),
    )
    fit = (
        e.filter(F.col("half") == 0)
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_fit"),
            F.sum("cents").cast("long").alias("s_fit"),
        )
    )
    res = (
        e.filter(F.col("half") == 1)
        .join(F.broadcast(fit), "event_type")
        .select(
            "event_type",
            F.greatest(
                F.col("cents") * F.col("n_fit") - F.col("s_fit"),
                F.col("s_fit") - F.col("cents") * F.col("n_fit"),
            ).alias("r_scaled"),
            "n_fit",
            "s_fit",
        )
    )
    wp = Window.partitionBy("event_type")
    rk = res.select(
        "event_type",
        "r_scaled",
        "n_fit",
        "s_fit",
        F.row_number()
        .over(wp.orderBy("r_scaled", "s_fit"))
        .alias("rnk"),
        F.count("*")
        .over(wp.rowsBetween(Window.unboundedPreceding,
                             Window.unboundedFollowing))
        .cast("long")
        .alias("n_cal"),
    )
    return rk.groupBy("event_type", "n_cal", "s_fit", "n_fit").agg(
        F.max(
            F.when(
                F.col("rnk") == F.expr("(9 * (n_cal + 1) + 9) div 10"),
                F.expr("(r_scaled * 1000000000) div n_fit"),
            )
        )
        .cast("long")
        .alias("qhat_nano")
    ).select(
        "event_type",
        "n_cal",
        F.expr("(s_fit * 1000000000) div n_fit").alias("pred_nano"),
        "qhat_nano",
    )


# ---------------------------------------------------------------------------
# Hill estimator of the distribution tail index
# ---------------------------------------------------------------------------

_HILL_K = 100  # top-k order statistics used for the tail fit


@query(
    "hill_tail_index",
    oracle=f"""
        WITH v AS (
            SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents
            FROM orders WHERE o_totalprice > 0
        ),
        top AS (
            SELECT cents,
                   row_number() OVER (ORDER BY cents DESC) AS rnk
            FROM v ORDER BY cents DESC LIMIT {_HILL_K + 1}
        ),
        xk AS (
            SELECT CAST(max(CASE WHEN rnk = {_HILL_K + 1}
                        THEN cents END) AS BIGINT) AS x_k
            FROM top
        ),
        terms AS (
            SELECT CAST(floor(ln(CAST(cents AS DOUBLE) / x_k)
                        * {_NANO}) AS BIGINT) AS t
            FROM top CROSS JOIN xk WHERE rnk <= {_HILL_K}
        )
        SELECT CAST({_HILL_K} AS BIGINT) AS k,
               (SELECT x_k FROM xk) AS x_k_cents,
               CAST(sum(t) AS BIGINT) // {_HILL_K} AS hill_gamma_nano
        FROM terms
    """,
    description="Hill estimator of the tail index over the top-{k} order "
    "statistics of order totals: gamma = mean ln(x_i/x_k) — the standard "
    "heavy-tail diagnostic (gamma near 1 means Zipf-like, variance may "
    "not exist; small gamma means thin tails), guiding whether "
    "mean-based metrics are even meaningful. The order statistics come "
    "from TakeOrderedAndProject (never a global sort); each log term is "
    "floored to nano so the average is exact integer arithmetic"
    .replace("{k}", str(_HILL_K)),
)
def hill_tail_index(spark, sf_dir):
    from pyspark.sql import Window

    v = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 0)
        .select(
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents")
        )
    )
    top = (
        v.orderBy(F.desc("cents"))
        .limit(_HILL_K + 1)
        .select(
            "cents",
            F.row_number()
            .over(Window.orderBy(F.desc("cents")))
            .alias("rnk"),
        )
    )
    xk = top.agg(
        F.max(
            F.when(F.col("rnk") == _HILL_K + 1, F.col("cents"))
        )
        .cast("long")
        .alias("x_k")
    )
    terms = (
        top.filter(F.col("rnk") <= _HILL_K)
        .crossJoin(F.broadcast(xk))
        .select(
            F.floor(
                F.log(F.col("cents").cast("double") / F.col("x_k")) * _NANO
            )
            .cast("long")
            .alias("t"),
            "x_k",
        )
    )
    return terms.groupBy("x_k").agg(
        F.sum("t").cast("long").alias("sum_t")
    ).select(
        F.lit(_HILL_K).cast("long").alias("k"),
        F.col("x_k").alias("x_k_cents"),
        F.expr(f"sum_t div {_HILL_K}").alias("hill_gamma_nano"),
    )


# ---------------------------------------------------------------------------
# Spearman rank correlation: the robust twin of corr_stats — Pearson on
# average ranks, immune to monotone transforms and outliers. The classic
# screening stat for "is this quality score actually monotone in that
# heuristic?" across corpus-curation signals.
# ---------------------------------------------------------------------------

# doubled average rank: 2*rank() + (# ties at this value) - 1 is an exact
# integer equal to twice the tie-averaged rank, so the rank moments stay
# integers (the /2 scale factor cancels inside the correlation ratio).
# The tie count comes from a peers-only RANGE frame over the SAME sort as
# rank(), so each axis costs one exchange+sort, not two.
_SPEAR_RANK = (
    "2 * rank() OVER (PARTITION BY event_type ORDER BY {v}) "
    "+ count(*) OVER (PARTITION BY event_type ORDER BY {v} "
    "RANGE BETWEEN CURRENT ROW AND CURRENT ROW) - 1"
)

# local twin of _SPEAR_RANK, scoped to one value-range bucket: because
# equal values always land in the same bucket, rank-within-bucket plus
# twice the count of rows in earlier buckets IS the global doubled rank
_SPEAR_RANK_LOCAL = (
    "2 * rank() OVER (PARTITION BY event_type, {b} ORDER BY {v}) "
    "+ count(*) OVER (PARTITION BY event_type, {b} ORDER BY {v} "
    "RANGE BETWEEN CURRENT ROW AND CURRENT ROW) - 1"
)

_SPEAR_BUCKETS = 1024


def _spear_ranked(e):
    """Exact tie-averaged doubled ranks rx, ry within event_type, computed
    WITHOUT a per-group total-order sort (the 100 TB limiter: a single
    window task per event_type serializes the whole axis).

    Rows are bucketed by value range on each axis (per-group min/max for
    BOTH axes from one cheap partial agg, broadcast back; integer ``div``
    arithmetic so no double rounding at int64 extremes), ranked locally
    per (event_type, bucket) — sort parallelism #groups x #buckets — and
    shifted by 2x the prefix-sum of earlier buckets' row counts (a
    groups x buckets relation, broadcast). Equal values share a bucket,
    so tie groups never straddle an offset boundary and the result equals
    the single-sort ``_SPEAR_RANK`` bit-for-bit. All bucket metadata
    (min/max, per-bucket counts for both axes) derives from the
    PRE-window relation, so the two rank windows chain over the main
    relation exactly once each — no axis recomputes the other's sort."""
    from pyspark.sql import Window

    g = e.groupBy("event_type").agg(
        F.min("x").alias("_mnx"),
        F.max("x").alias("_mxx"),
        F.min("y").alias("_mny"),
        F.max("y").alias("_mxy"),
    )
    # bucket arithmetic in DOUBLE on purpose: int64 '(max - min)' overflows
    # (ANSI ArithmeticException) when a group's range spans the type, and
    # bucket BOUNDARIES need no exactness — correctness only needs the
    # mapping monotone (IEEE subtract/divide/floor by a positive constant
    # are monotone) and equal-values-same-bucket (deterministic fn of x),
    # both of which doubles give at any range; the exact rank comes from
    # the in-bucket sort + exact integer offset counts, never from where
    # the boundaries fall
    g = g.select(
        "event_type",
        "_mnx",
        "_mny",
        F.greatest(
            F.lit(1.0),
            (
                F.col("_mxx").cast("double") - F.col("_mnx").cast("double")
            )
            / _SPEAR_BUCKETS,
        ).alias("_wx"),
        F.greatest(
            F.lit(1.0),
            (
                F.col("_mxy").cast("double") - F.col("_mny").cast("double")
            )
            / _SPEAR_BUCKETS,
        ).alias("_wy"),
    )
    b = e.join(F.broadcast(g), "event_type").select(
        "event_type",
        "x",
        "y",
        F.floor(
            (F.col("x").cast("double") - F.col("_mnx").cast("double"))
            / F.col("_wx")
        ).alias("_bx"),
        F.floor(
            (F.col("y").cast("double") - F.col("_mny").cast("double"))
            / F.col("_wy")
        ).alias("_by"),
    )

    # both axes' per-bucket counts in ONE pass over the rows: explode an
    # (axis, bucket) pair per row, partial-agg locally (<= 2*_SPEAR_BUCKETS
    # per group survives the map side), then one tiny prefix-sum window
    # per (group, axis) over the count relation
    cnt = (
        b.select(
            "event_type",
            F.explode(
                F.array(
                    F.struct(
                        F.lit("x").alias("ax"), F.col("_bx").alias("bk")
                    ),
                    F.struct(
                        F.lit("y").alias("ax"), F.col("_by").alias("bk")
                    ),
                )
            ).alias("a"),
        )
        .select("event_type", "a.ax", "a.bk")
        .groupBy("event_type", "ax", "bk")
        .agg(F.count("*").alias("_c"))
    )
    # scratch-persist: both axes' broadcast sides read this relation, and
    # without materialization each would re-run the whole counting scan
    off = scratch_persist(
        cnt.select(
            "event_type",
            "ax",
            "bk",
            (
                F.sum("_c").over(
                    Window.partitionBy("event_type", "ax").orderBy("bk")
                )
                - F.col("_c")
            ).alias("_off"),
        )
    )

    def offsets(ax, bcol):
        return off.filter(F.col("ax") == ax).select(
            "event_type",
            F.col("bk").alias(bcol),
            F.col("_off").alias(f"_off{bcol}"),
        )

    return (
        b.join(F.broadcast(offsets("x", "_bx")), ["event_type", "_bx"])
        .join(F.broadcast(offsets("y", "_by")), ["event_type", "_by"])
        .withColumn(
            "rx",
            (
                F.expr(_SPEAR_RANK_LOCAL.format(v="x", b="_bx"))
                + 2 * F.col("_off_bx")
            ).cast("long"),
        )
        .withColumn(
            "ry",
            (
                F.expr(_SPEAR_RANK_LOCAL.format(v="y", b="_by"))
                + 2 * F.col("_off_by")
            ).cast("long"),
        )
    )


@query(
    "spearman_corr",
    # NULL pairs are EXCLUDED on both engines (the standard corr()
    # semantics): a digitless props yields NULL y, and ranking NULLs is
    # engine-divergent (Spark windows sort NULLS FIRST, DuckDB NULLS
    # LAST) — correlation over present pairs is the only cross-engine
    # stable definition
    oracle=f"""
        WITH e0 AS (
            SELECT event_type,
                   CAST(round(value * 100) AS BIGINT) AS x,
                   TRY_CAST(regexp_extract(props, '[0-9]+') AS BIGINT) AS y
            FROM events
        ),
        e AS (
            SELECT * FROM e0 WHERE x IS NOT NULL AND y IS NOT NULL
        ),
        r AS (
            SELECT event_type,
                   CAST({_SPEAR_RANK.format(v='x')} AS BIGINT) AS rx,
                   CAST({_SPEAR_RANK.format(v='y')} AS BIGINT) AS ry
            FROM e
        ),
        m AS (
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(rx) AS BIGINT) AS sx,
                   CAST(sum(ry) AS BIGINT) AS sy,
                   CAST(sum(rx * ry) AS BIGINT) AS sxy,
                   CAST(sum(rx * rx) AS BIGINT) AS sxx,
                   CAST(sum(ry * ry) AS BIGINT) AS syy
            FROM r GROUP BY event_type
        )
        SELECT event_type, n,
               CAST(CASE WHEN (CAST(n AS DOUBLE) * sxx
                               - CAST(sx AS DOUBLE) * sx)
                              * (CAST(n AS DOUBLE) * syy
                                 - CAST(sy AS DOUBLE) * sy) = 0 THEN NULL
                    ELSE floor((CAST(n AS DOUBLE) * sxy
                                - CAST(sx AS DOUBLE) * sy)
                               / sqrt((CAST(n AS DOUBLE) * sxx
                                       - CAST(sx AS DOUBLE) * sx)
                                      * (CAST(n AS DOUBLE) * syy
                                         - CAST(sy AS DOUBLE) * sy))
                               * {_NANO}) END AS BIGINT) AS spearman_nano
        FROM m
    """,
    description="Spearman rank correlation of (event value in cents) vs "
    "(numeric prop) per event_type — Pearson on tie-averaged ranks, the "
    "robust monotone-association twin of corr_stats. Doubled average "
    "ranks (2*rank + ties - 1) are exact integers, so all six rank "
    "moments sum exactly under any parallelism. Ranking is TWO-PHASE "
    "(r10, cut the 10x-data wall ratio): a per-group sort would put each "
    "event_type's whole axis in ONE window task, so rows are bucketed by "
    "value range (equal values share a bucket, so tie groups never span "
    "buckets), ranked locally per (group, bucket) — parallel across "
    "buckets — and shifted by broadcast prefix-sum bucket offsets; the "
    "result is bit-identical to the single-sort rank. Rank moments "
    "reach ~4n^3 per group, inside int64 up to ~10^6 rows per group; "
    "beyond that the moments widen to DECIMAL(38,0), plan unchanged",
)
def spearman_corr(spark, sf_dir):
    e = (
        load(spark, sf_dir, "events")
        .select(
            "event_type",
            F.round(F.col("value") * 100).cast("long").alias("x"),
            # try_cast: regexp_extract returns '' on no match, and under
            # ANSI mode a plain cast THROWS on '' instead of yielding
            # NULL (both engines) — digitless props must mean "no pair",
            # not a crashed job
            F.regexp_extract("props", "[0-9]+", 0)
            .try_cast("long")
            .alias("y"),
        )
        # NULL pairs excluded on both engines (see oracle note): without
        # this, a NULL bucket key would silently DROP the row from the
        # inner offsets join — worse than either engine's NULL ranking
        .filter(F.col("x").isNotNull() & F.col("y").isNotNull())
    )
    r = _spear_ranked(e)
    m = r.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("rx").alias("sx"),
        F.sum("ry").alias("sy"),
        F.sum(F.col("rx") * F.col("ry")).alias("sxy"),
        F.sum(F.col("rx") * F.col("rx")).alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    num = n * F.col("sxy") - sx * F.col("sy")
    var_x = n * F.col("sxx") - sx * F.col("sx")
    var_y = n * F.col("syy") - sy * F.col("sy")
    # an all-tied axis has zero rank variance: Spearman is undefined —
    # NULL on both engines, not an ANSI divide-by-zero abort
    return m.select(
        "event_type",
        "n",
        F.when(
            var_x * var_y != 0,
            F.floor(num / F.sqrt(var_x * var_y) * _NANO),
        )
        .cast("long")
        .alias("spearman_nano"),
    )


# ---------------------------------------------------------------------------
# Mutual information between categorical column pairs: the dependence
# screening stat that chi-square significance doesn't give (MI is the
# effect size in nats) — "does source determine lang?" for corpus mixes,
# "is priority redundant given status?" for schema pruning. Normalized
# MI (MI / sqrt(H(X) H(Y))) lands in [0, 1] for cross-pair comparison.
# ---------------------------------------------------------------------------

# shared per-cell expression text (Spark SQL and DuckDB parse identically;
# floor-to-nano BEFORE summing keeps the K-cell sums exact longs). MI
# terms can be negative (cells under independence), floor is still
# deterministic there.
_MI_TERM = (
    "CAST(floor((CAST(c AS DOUBLE) / n) "
    "* ln((CAST(c AS DOUBLE) * n) / (CAST(cx AS DOUBLE) * cy)) "
    "* 1000000000) AS BIGINT)"
)
_MARG_ENT_TERM = (
    "CAST(floor(-(CAST(cm AS DOUBLE) / n) "
    "* ln(CAST(cm AS DOUBLE) / n) * 1000000000) AS BIGINT)"
)
_NMI_EXPR = (
    "CASE WHEN hx_nano <= 0 OR hy_nano <= 0 THEN NULL ELSE "
    "CAST(floor(CAST(mi_nano AS DOUBLE) "
    "/ sqrt(CAST(hx_nano AS DOUBLE) * hy_nano) * 1000000000) AS BIGINT) "
    "END"
)


def _mi_pair_sql(table: str, xc: str, yc: str) -> str:
    return f"""
        SELECT '{table}.{xc}|{table}.{yc}' AS column_pair,
               cells.n_cells, cells.mi_nano, hx.hx_nano, hy.hy_nano,
               {_NMI_EXPR} AS nmi_nano
        FROM (
            SELECT CAST(count(*) AS BIGINT) AS n_cells,
                   CAST(sum({_MI_TERM}) AS BIGINT) AS mi_nano
            FROM (SELECT {xc} AS xv, {yc} AS yv,
                         CAST(count(*) AS BIGINT) AS c
                  FROM {table} GROUP BY 1, 2) j
            JOIN (SELECT {xc} AS xv, CAST(count(*) AS BIGINT) AS cx
                  FROM {table} GROUP BY 1) mx USING (xv)
            JOIN (SELECT {yc} AS yv, CAST(count(*) AS BIGINT) AS cy
                  FROM {table} GROUP BY 1) my USING (yv)
            CROSS JOIN (SELECT CAST(count(*) AS BIGINT) AS n
                        FROM {table}) t
        ) cells
        CROSS JOIN (
            SELECT CAST(sum({_MARG_ENT_TERM}) AS BIGINT) AS hx_nano
            FROM (SELECT CAST(count(*) AS BIGINT) AS cm
                  FROM {table} GROUP BY {xc}) mx
            CROSS JOIN (SELECT CAST(count(*) AS BIGINT) AS n
                        FROM {table}) t
        ) hx
        CROSS JOIN (
            SELECT CAST(sum({_MARG_ENT_TERM}) AS BIGINT) AS hy_nano
            FROM (SELECT CAST(count(*) AS BIGINT) AS cm
                  FROM {table} GROUP BY {yc}) my
            CROSS JOIN (SELECT CAST(count(*) AS BIGINT) AS n
                        FROM {table}) t
        ) hy
    """


@query(
    "mutual_information",
    oracle=f"""
        {_mi_pair_sql('documents', 'lang', 'source')}
        UNION ALL
        {_mi_pair_sql('orders', 'o_orderstatus', 'o_orderpriority')}
    """,
    description="mutual information and normalized MI (nano-nats) between "
    "categorical column pairs (documents.lang|source, "
    "orders.status|priority) — the dependence effect-size that completes "
    "chi_square_independence (significance) and column_entropy "
    "(marginals). Per-cell terms (p_xy ln(p_xy n/(c_x c_y)) and -p ln p) "
    "are floored to integer nano-units BEFORE summing so the K-cell sums "
    "are exact under any aggregation order; NMI divides the two floored "
    "sums, identical on both engines. Plan per pair: ONE "
    "map-side-combinable joint groupBy persisted at K-cell size, "
    "marginals and the total derived from those K rows (the fact table "
    "is scanned once per pair, never re-shuffled), then broadcast joins "
    "over K-row inputs. At 100 TB the joint fits a single executor for "
    "any real categorical pair; a high-cardinality pair would bucket the "
    "join instead, same term math",
)
def mutual_information(spark, sf_dir):
    from pyspark.sql import Window

    def pair(df, xc: str, yc: str, label: str):
        # ONE lineage over the K-cell joint table (r13 rework): marginals
        # and the total attach as window sums over the K rows instead of
        # five separate broadcast-join branches — the old shape launched
        # ~26 jobs per pair (each broadcast is its own job and each
        # branch re-read the persisted joint), measured as 53 serial jobs
        # for the two pairs at sf0.1. Windows over K rows cost the same
        # K-row exchanges the marginal groupBys already paid, and the
        # marginal-entropy terms sum over exactly one row per distinct
        # marginal value (row_number()=1), so every floored integer term
        # is numerically IDENTICAL to the joined formulation.
        j = df.groupBy(
            F.col(xc).alias("xv"), F.col(yc).alias("yv")
        ).agg(F.count("*").cast("long").alias("c"))
        wx = Window.partitionBy("xv").orderBy("yv")
        wy = Window.partitionBy("yv").orderBy("xv")
        cells = (
            j.withColumn(
                "cx",
                F.sum("c").over(
                    Window.partitionBy("xv")
                    .orderBy("yv")
                    .rowsBetween(
                        Window.unboundedPreceding, Window.unboundedFollowing
                    )
                ),
            )
            .withColumn("rnx", F.row_number().over(wx))
            .withColumn(
                "cy",
                F.sum("c").over(
                    Window.partitionBy("yv")
                    .orderBy("xv")
                    .rowsBetween(
                        Window.unboundedPreceding, Window.unboundedFollowing
                    )
                ),
            )
            .withColumn("rny", F.row_number().over(wy))
            .withColumn(
                "n",
                F.sum("c").over(
                    Window.partitionBy().rowsBetween(
                        Window.unboundedPreceding, Window.unboundedFollowing
                    )
                ),
            )
        )
        term_x = _MARG_ENT_TERM.replace("cm", "cx")
        term_y = _MARG_ENT_TERM.replace("cm", "cy")
        # NULL-key semantics must match the oracle (r14, ADVICE): the
        # oracle's j JOIN mx USING (xv) JOIN my USING (yv) drops NULL-keyed
        # joint cells from n_cells and mi_nano (NULL never equi-joins),
        # while hx/hy DO include the NULL marginal group (plain GROUP BY).
        # The window cx/cy values already match mx/my for non-NULL keys
        # (the partition sums include cells whose OTHER key is NULL, just
        # like the single-column GROUP BY), so only the cell filter below
        # is needed; count(when(...)) keeps the empty-input value at 0
        # like the oracle's count(*) over an empty join.
        both = F.col("xv").isNotNull() & F.col("yv").isNotNull()
        return (
            cells.agg(
                F.count(F.when(both, F.lit(1)))
                .cast("long")
                .alias("n_cells"),
                F.sum(F.when(both, F.expr(_MI_TERM)))
                .cast("long")
                .alias("mi_nano"),
                F.sum(F.when(F.col("rnx") == 1, F.expr(term_x)))
                .cast("long")
                .alias("hx_nano"),
                F.sum(F.when(F.col("rny") == 1, F.expr(term_y)))
                .cast("long")
                .alias("hy_nano"),
            )
            .select(
                F.lit(label).alias("column_pair"),
                "n_cells",
                "mi_nano",
                "hx_nano",
                "hy_nano",
                F.expr(_NMI_EXPR).alias("nmi_nano"),
            )
        )

    docs = load(spark, sf_dir, "documents")
    orders = load(spark, sf_dir, "orders")
    return pair(docs, "lang", "source", "documents.lang|documents.source").unionAll(
        pair(
            orders,
            "o_orderstatus",
            "o_orderpriority",
            "orders.o_orderstatus|orders.o_orderpriority",
        )
    )


# ---------------------------------------------------------------------------
# k-anonymity audit — the re-identification risk check a corpus release
# runs before publication (Sweeney 2002): every combination of
# quasi-identifier attributes whose equivalence class is smaller than k is
# a linkage-attack surface and must be suppressed or generalized. Output is
# the violating tail only, so the result scales with the quasi-identifier
# key space, never with the row count.
# ---------------------------------------------------------------------------

_KANON_K = 5


@query(
    "k_anonymity_audit",
    oracle=f"""
        SELECT CAST(c_nationkey AS INT) AS nationkey,
               c_mktsegment AS mktsegment,
               CAST(c_acctbal < 0 AS INT) AS neg_bal,
               CAST(count(*) AS BIGINT) AS group_size
        FROM customer
        GROUP BY 1, 2, 3
        HAVING count(*) < {_KANON_K}
    """,
    description=f"k-anonymity audit (k={_KANON_K}): equivalence-class "
    "sizes over the quasi-identifier tuple (nation, market segment, "
    "balance sign), reporting only classes below k — the linkage-attack "
    "surface a dataset release must suppress or generalize. One "
    "partially-aggregated groupBy at scan speed; the HAVING tail bounds "
    "the result by the quasi-identifier key space, independent of row "
    "count at 100 TB",
)
def k_anonymity_audit(spark, sf_dir):
    return (
        load(spark, sf_dir, "customer")
        .groupBy(
            F.col("c_nationkey").cast("int").alias("nationkey"),
            F.col("c_mktsegment").alias("mktsegment"),
            (F.col("c_acctbal") < 0).cast("int").alias("neg_bal"),
        )
        .agg(F.count("*").cast("long").alias("group_size"))
        .filter(F.col("group_size") < _KANON_K)
    )


_LDIV_L = 3


@query(
    "l_diversity_audit",
    oracle=f"""
        SELECT CAST(c_nationkey AS INT) AS nationkey,
               c_mktsegment AS mktsegment,
               CAST(c_acctbal < 0 AS INT) AS neg_bal,
               CAST(count(DISTINCT o_orderpriority) AS BIGINT)
                   AS n_sensitive,
               CAST(count(*) AS BIGINT) AS n_rows
        FROM customer c JOIN orders o ON c_custkey = o_custkey
        GROUP BY 1, 2, 3
        HAVING count(DISTINCT o_orderpriority) < {_LDIV_L}
    """,
    description=f"l-diversity audit (l={_LDIV_L}), the attribute-"
    "disclosure companion to k_anonymity_audit (Machanavajjhala et al. "
    "2007): an equivalence class can be large enough for k-anonymity yet "
    "leak its sensitive attribute if every member shares it — report "
    "classes whose sensitive attribute (order priority) takes fewer than "
    "l distinct values. Plan: the fact join shuffles on the key once, "
    "the distinct-count aggregate is two-level partial, and the HAVING "
    "tail is bounded by the quasi-identifier key space",
)
def l_diversity_audit(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .groupBy(
            F.col("c_nationkey").cast("int").alias("nationkey"),
            F.col("c_mktsegment").alias("mktsegment"),
            (F.col("c_acctbal") < 0).cast("int").alias("neg_bal"),
        )
        .agg(
            F.count_distinct("o_orderpriority")
            .cast("long")
            .alias("n_sensitive"),
            F.count("*").cast("long").alias("n_rows"),
        )
        .filter(F.col("n_sensitive") < _LDIV_L)
    )


# ---------------------------------------------------------------------------
# Referential-integrity audit — the data-quality gate a warehouse load runs
# before anything downstream trusts the keys: per declared FK relationship,
# how many child rows have no parent. The degenerate-corpus sweep ships
# broken FK edges on purpose; this operator is what surfaces them in
# production instead of a wrong join silently dropping rows.
# ---------------------------------------------------------------------------

_RI_RELATIONSHIPS = [
    ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
    (
        "lineitem->supplier",
        "lineitem",
        "l_suppkey",
        "supplier",
        "s_suppkey",
    ),
    ("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
]


def _ri_oracle() -> str:
    parts = []
    for name, child, ck, parent, pk in _RI_RELATIONSHIPS:
        parts.append(f"""
        SELECT '{name}' AS relationship,
               CAST((SELECT count(*) FROM {child}) AS BIGINT)
                   AS n_child_rows,
               CAST((SELECT count(*) FROM {child} c
                     WHERE c.{ck} IS NOT NULL
                       AND NOT EXISTS (SELECT 1 FROM {parent} p
                                       WHERE p.{pk} = c.{ck})) AS BIGINT)
                   AS n_orphans,
               CAST((SELECT count(*) FROM {child} WHERE {ck} IS NULL)
                   AS BIGINT) AS n_null_keys""")
    return " UNION ALL ".join(parts)


@query(
    "referential_integrity_audit",
    oracle=_ri_oracle(),
    description="referential-integrity audit over the star schema's five "
    "FK relationships: child rows, orphans (non-null key with no parent), "
    "and NULL keys per relationship — the load-time data-quality gate "
    "that surfaces broken edges before an inner join silently drops "
    "them. Each check is one LEFT ANTI join on the key (co-partitioned "
    "hash shuffle; at scale the small parent side broadcasts, and a "
    "bloom_prefilter twin cuts the shuffle for selective parents); the "
    "report is five rows regardless of corpus size",
)
def referential_integrity_audit(spark, sf_dir):
    # r13: the three separate aggregates per relationship (child count,
    # anti-join orphan count, null-key count) scanned the child table
    # three times and crossJoined three single-row relations; one LEFT
    # join against the parent's DISTINCT keys preserves child cardinality
    # even under duplicate parent keys (the degenerate sweep ships them),
    # so all three counts come from ONE conditional aggregate over one
    # child scan. The whole 5-branch union is one parameterized spark.sql
    # call — the Column-API loop cost ~300 py4j round trips per build.
    parts = []
    tables = {}
    for name, child, ck, parent, pk in _RI_RELATIONSHIPS:
        tables[child] = load(spark, sf_dir, child)
        tables[parent] = load(spark, sf_dir, parent)
        parts.append(
            f"SELECT '{name}' AS relationship,"
            " CAST(count(*) AS BIGINT) AS n_child_rows,"
            f" CAST(count_if(c.{ck} IS NOT NULL AND p.__pk IS NULL)"
            " AS BIGINT) AS n_orphans,"
            f" CAST(count_if(c.{ck} IS NULL) AS BIGINT) AS n_null_keys"
            f" FROM {{{child}}} c LEFT JOIN"
            f" (SELECT DISTINCT {pk} AS __pk FROM {{{parent}}}) p"
            f" ON c.{ck} = p.__pk"
        )
    return spark.sql(" UNION ALL ".join(parts), **tables)


# ---------------------------------------------------------------------------
# Primary-key uniqueness audit — the third leg of the data-quality gate
# (referential_integrity_audit: edges; k/l-anonymity: disclosure; this:
# key identity). Duplicate keys upstream silently multiply every
# downstream join; the audit reports the excess row count and the worst
# multiplicity per declared key.
# ---------------------------------------------------------------------------

_PK_KEYS = [
    ("orders", ["o_orderkey"]),
    ("customer", ["c_custkey"]),
    ("part", ["p_partkey"]),
    ("supplier", ["s_suppkey"]),
    ("lineitem", ["l_orderkey", "l_linenumber"]),
    ("events", ["event_id"]),
    ("documents", ["doc_id"]),
    ("embeddings", ["vec_id"]),
]


def _pk_oracle() -> str:
    parts = []
    for t, keys in _PK_KEYS:
        kexpr = ", ".join(keys)
        parts.append(f"""
        SELECT '{t}' AS tbl,
               CAST((SELECT count(*) FROM {t}) AS BIGINT) AS n_rows,
               CAST((SELECT count(*) FROM {t})
                    - (SELECT count(*) FROM
                       (SELECT DISTINCT {kexpr} FROM {t})) AS BIGINT)
                   AS n_excess_rows,
               CAST((SELECT max(c) FROM
                     (SELECT count(*) AS c FROM {t} GROUP BY {kexpr}))
                    AS BIGINT) AS max_multiplicity""")
    return " UNION ALL ".join(parts)


@query(
    "pk_uniqueness_audit",
    oracle=_pk_oracle(),
    description="primary-key uniqueness audit over every declared key "
    "(composite keys included): excess rows beyond distinct keys and the "
    "worst per-key multiplicity, per table — duplicate keys multiply "
    "every downstream join silently, so this is the first gate a load "
    "runs. Per table: one partially-aggregated groupBy on the key "
    "producing per-key counts, reduced to two scalars — the report is "
    "eight rows at any corpus size",
)
def pk_uniqueness_audit(spark, sf_dir):
    # coalesce the sums so an EMPTY table reports 0/0 like the oracle's
    # count(*)-based form (max_multiplicity stays NULL on both engines)
    # — ungrouped sum over zero rows is NULL in Spark. The whole 8-branch
    # union is ONE parameterized spark.sql call ({t} template args bind
    # the cached reader plans): the Column-API loop cost ~350 py4j round
    # trips per construction (profiled ~0.3-0.9 s of driver wall), the
    # single parse costs one
    parts = []
    for t, keys in _PK_KEYS:
        kexpr = ", ".join(keys)
        parts.append(
            f"SELECT '{t}' AS tbl,"
            " CAST(coalesce(sum(c), 0) AS BIGINT) AS n_rows,"
            " CAST(coalesce(sum(c) - count(*), 0) AS BIGINT)"
            " AS n_excess_rows,"
            " CAST(max(c) AS BIGINT) AS max_multiplicity"
            f" FROM (SELECT count(*) AS c FROM {{{t}}}"
            f" GROUP BY {kexpr}) {t}_per_key"
        )
    return spark.sql(
        " UNION ALL ".join(parts),
        **{t: load(spark, sf_dir, t) for t, _ in _PK_KEYS},
    )
