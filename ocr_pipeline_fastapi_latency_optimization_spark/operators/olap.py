"""General OLAP patterns over the test star schema — the query surface a
user of the engine expects beyond the extraction core: sessionization,
grouped top-k, rollup, as-of joins, multi-way dimension joins, classic
TPC-H-style aggregates.

All pure Catalyst plans. Float aggregates are quantized
(``floor(x · 100)`` cents) so oracle hashes cannot be flipped by
summation-order noise; distinct counts are exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

SESSION_GAP_S = 1800


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via lag + cumulative gap count: a new session
    starts when the same user's inter-event gap exceeds 30 min. Returns
    per-user session stats."""
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    sessioned = ev.withColumn(
        "new_session",
        (
            F.coalesce(
                F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w)),
                F.lit(SESSION_GAP_S + 1),
            )
            > SESSION_GAP_S
        ).cast("int"),
    ).withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, 0)),
    )
    return (
        sessioned.groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min(F.unix_timestamp("ts")).alias("start_epoch"),
            F.max(F.unix_timestamp("ts")).alias("end_epoch"),
        )
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_sessions"),
            F.max("n_events").alias("max_session_events"),
            F.sum(F.col("end_epoch") - F.col("start_epoch")).alias("total_session_sec"),
        )
        .orderBy("user_id")
    )


def top_k_per_group(spark: SparkSession, sf_dir: str, k: int = 3) -> DataFrame:
    """Grouped top-k (window + row_number ≤ k): highest-value events per
    user, deterministic tie-break on event_id."""
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("value").desc(), F.col("event_id").asc())
    return (
        ev.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            "user_id",
            "rnk",
            "event_id",
            F.floor(F.col("value") * 100).cast("long").alias("value_cents"),
        )
        .orderBy("user_id", "rnk")
    )


def rollup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (event_type, weekday): subtotal + grand-total rows,
    the grouping-set shape (none existed in the reference — a pure
    widening of the query surface)."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type", F.dayofweek("ts").alias("weekday"), "value"
    )
    return (
        ev.rollup("event_type", "weekday")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.floor(F.col("value") * 100)).cast("long").alias("value_cents"),
        )
        .select(
            F.coalesce("event_type", F.lit("(all)")).alias("event_type"),
            F.coalesce("weekday", F.lit(-1)).cast("int").alias("weekday"),
            "n",
            "value_cents",
        )
        .orderBy("event_type", "weekday")
    )


def cube_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (event_type, weekday): all grouping-set combinations,
    null keys coalesced to sentinels (completes the grouping-sets family
    next to ROLLUP)."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type", F.dayofweek("ts").alias("weekday"), "value"
    )
    return (
        ev.cube("event_type", "weekday")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.floor(F.col("value") * 100)).cast("long").alias("value_cents"),
        )
        .select(
            F.coalesce("event_type", F.lit("(all)")).alias("event_type"),
            F.coalesce("weekday", F.lit(-1)).cast("int").alias("weekday"),
            "n",
            "value_cents",
        )
        .orderBy("event_type", "weekday")
    )


def asof_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (Spark lacks a native one): for every purchase event,
    the most recent preceding click by the same user — expressed as
    ``last(CASE WHEN click THEN ts END) IGNORE NULLS`` over an
    unbounded-preceding window, the shuffle-once alternative to a range
    join."""
    ev = _t(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    last_click = F.last(
        F.when(F.col("event_type") == "click", F.unix_timestamp("ts")),
        ignorenulls=True,
    ).over(w)
    return (
        ev.withColumn("last_click_epoch", last_click)
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            F.unix_timestamp("ts").alias("ts_epoch"),
            F.coalesce("last_click_epoch", F.lit(-1)).alias("last_click_epoch"),
        )
        .orderBy("event_id")
    )


def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way star join (region ⋈ nation ⋈ customer ⋈ orders ⋈
    lineitem) with broadcast dimensions — the canonical dimensional
    rollup; revenue in integer cents."""
    region = _t(spark, sf_dir, "region")
    nation = _t(spark, sf_dir, "nation")
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem")
    # hint only the FIXED-cardinality dims (nation=25, region=5 rows);
    # customer grows with scale factor, so its joined frame carries no
    # broadcast hint — AQE broadcasts it while it fits and falls back to
    # a shuffled join at sizes where a hint would have been a
    # scale-killer (the round-2 verdict #3 bug class)
    dims = (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "n_name", "r_name")
    )
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(dims, orders.o_custkey == dims.c_custkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(
                F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
            )
            .cast("long")
            .alias("revenue_cents"),
        )
        .orderBy("r_name", "n_name")
    )


def window_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ranking/navigation window family over one partition spec:
    rank, dense_rank, ntile, lag/lead, cume_dist (quantized) — one
    shuffle on user_id serves all six."""
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("value").asc(), F.col("event_id").asc())
    return ev.select(
        "user_id",
        "event_id",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.coalesce(F.lag("event_type").over(w), F.lit("(none)")).alias("prev_type"),
        F.coalesce(F.lead("event_type").over(w), F.lit("(none)")).alias("next_type"),
        F.floor(F.cume_dist().over(w) * 1000000).cast("long").alias("cume_e6"),
    ).orderBy("user_id", "event_id")


def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT over user-id sets (purchasers vs
    erroring users), folded into one tagged result."""
    ev = _t(spark, sf_dir, "events")
    buyers = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    errors = ev.filter(F.col("event_type") == "error").select("user_id").distinct()
    both = buyers.intersect(errors).withColumn("tag", F.lit("both"))
    only_buy = buyers.exceptAll(errors.distinct()).withColumn("tag", F.lit("buy_only"))
    any_of = buyers.union(errors).distinct().withColumn("tag", F.lit("any"))
    return (
        both.unionByName(only_buy)
        .unionByName(any_of)
        .groupBy("tag")
        .agg(F.count("*").alias("n_users"))
        .orderBy("tag")
    )


def semi_anti_joins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS / NOT EXISTS as left-semi and left-anti joins: customers
    with and without orders, aggregated per market segment."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    with_orders = cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_mktsegment", F.lit("with_orders").alias("tag"))
    without = cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_mktsegment", F.lit("no_orders").alias("tag"))
    return (
        with_orders.unionByName(without)
        .groupBy("c_mktsegment", "tag")
        .agg(F.count("*").alias("n"))
        .orderBy("c_mktsegment", "tag")
    )


def time_buckets(spark: SparkSession, sf_dir: str, bucket_s: int = 21600) -> DataFrame:
    """Time-series rollup: fixed 6-hour epoch buckets per event type —
    the time-bucketed aggregation shape (hypertable-rollup analog)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.select(
            F.floor(F.unix_timestamp("ts") / bucket_s).cast("long").alias("bucket"),
            "event_type",
            "value",
        )
        .groupBy("bucket", "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.floor(F.col("value") * 100)).cast("long").alias("value_cents"),
        )
        .orderBy("bucket", "event_type")
    )


def sql_api_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same star join as ``revenue_by_nation`` expressed through the
    SQL front-end (temp views + ``spark.sql``) — Catalyst plans both the
    same way; this entry proves the engine's SQL surface end-to-end."""
    for t in ("region", "nation", "customer", "orders", "lineitem"):
        _t(spark, sf_dir, t).createOrReplaceTempView(f"v_{t}")
    return spark.sql(
        """
        SELECT r_name, n_name, count(*) AS n_items,
               CAST(sum(floor(l_extendedprice * (1 - l_discount) * 100)) AS BIGINT)
                 AS revenue_cents
        FROM v_lineitem l
        JOIN v_orders o ON l.l_orderkey = o.o_orderkey
        JOIN v_customer c ON o.o_custkey = c.c_custkey
        JOIN v_nation n ON c.c_nationkey = n.n_nationkey
        JOIN v_region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r_name, n_name ORDER BY r_name, n_name
        """
    )


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: groupBy two flags, several
    aggregates, quantized; exact distinct order count."""
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02")
    )
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            # per-row quantization BEFORE the sum: integer aggregation is
            # order-independent, so engine summation order can't flip a hash
            F.sum(F.floor("l_quantity")).cast("long").alias("sum_qty"),
            F.sum(F.floor(F.col("l_extendedprice") * 100)).cast("long").alias("sum_base_cents"),
            F.sum(
                F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
            ).cast("long").alias("sum_disc_cents"),
            F.count("*").alias("count_order"),
            F.countDistinct("l_orderkey").alias("n_orders"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
