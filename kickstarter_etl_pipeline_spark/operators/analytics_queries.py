"""Product-analytics / join-shape query wrappers (funnels, cohorts, anomaly scoring, skew and null-safe join shapes). Moved verbatim from queries.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from kickstarter_etl_pipeline_spark.operators import events as EV
from kickstarter_etl_pipeline_spark.operators import text as TX
from kickstarter_etl_pipeline_spark.operators.dedup import (
    exact_dedup_groups,
    minhash_dedup_pairs,
    ngram_jaccard_pairs,
    simhash_candidates,
)
from kickstarter_etl_pipeline_spark.operators.dims import build_dim_date
from kickstarter_etl_pipeline_spark.operators.multimodal import documents_as_media, extract_features
from kickstarter_etl_pipeline_spark.operators.rounding import round_det
from kickstarter_etl_pipeline_spark.operators.similarity import brute_force_topk, lsh_topk
from kickstarter_etl_pipeline_spark.operators.transform import fractional_days
from kickstarter_etl_pipeline_spark.plans.star import (
    tpch_dim_category,
    tpch_dim_state,
    tpch_fact,
    tpch_star,
)
from kickstarter_etl_pipeline_spark.session import ensure_runtime_confs
from kickstarter_etl_pipeline_spark.sources.readers import load_table
from kickstarter_etl_pipeline_spark.streaming.events_stream import streaming_tumbling_counts



def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered, time-bounded funnel analysis (view → click within 1 h →
    purchase within 1 h): per-stage surviving user counts plus
    conversion from the top of the funnel — the product-analytics
    sequential-pattern query. Each stage is one filtered min-aggregate
    joined to the prior stage's frame; time stays in integer
    microseconds (rule 4) so the window bounds are exact, and
    conversion derives from exact counts in one IEEE division."""
    hour_us = 3_600_000_000
    events = EV.with_unix_micros(load_table(spark, sf_dir, "events"), out="us")
    e = events.select("user_id", "event_type", "us")
    v = e.filter(F.col("event_type") == "view").groupBy("user_id").agg(F.min("us").alias("t1"))
    c = (
        e.join(v, on="user_id")
        .filter(
            (F.col("event_type") == "click")
            & (F.col("us") >= F.col("t1"))
            & (F.col("us") <= F.col("t1") + hour_us)
        )
        .groupBy("user_id")
        .agg(F.min("us").alias("t2"))
    )
    p = (
        e.join(c, on="user_id")
        .filter(
            (F.col("event_type") == "purchase")
            & (F.col("us") >= F.col("t2"))
            & (F.col("us") <= F.col("t2") + hour_us)
        )
        .groupBy("user_id")
        .agg(F.min("us").alias("t3"))
    )
    counts = (
        e.agg(F.count_distinct("user_id").alias("n_users"))
        .crossJoin(F.broadcast(v.agg(F.count("*").alias("n_viewed"))))
        .crossJoin(F.broadcast(c.agg(F.count("*").alias("n_clicked"))))
        .crossJoin(F.broadcast(p.agg(F.count("*").alias("n_purchased"))))
    )
    return counts.select(
        "n_users",
        "n_viewed",
        "n_clicked",
        "n_purchased",
        round_det(F.col("n_clicked") / F.col("n_viewed"), 6).alias("view_to_click"),
        round_det(F.col("n_purchased") / F.col("n_viewed"), 6).alias("view_to_purchase"),
    )


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by the week of their first
    'signup' event; for each (cohort_week, weeks_since) cell, how many
    cohort members were active that week and the retention rate vs the
    cohort size. Weeks are integer microsecond arithmetic from a fixed
    epoch (rule 4 — no date-truncation timezone traps); rates derive
    from exact counts in one IEEE division. Two uniform-key shuffles
    (first-signup per user, cell distinct) — linear at any scale."""
    wk_us = 7 * 24 * 3_600_000_000
    events = EV.with_unix_micros(load_table(spark, sf_dir, "events"), out="us")
    e = events.select("user_id", "event_type", (F.col("us") / wk_us).cast("long").alias("wk"))
    cohorts = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("wk").alias("cohort_wk"))
    )
    sizes = cohorts.groupBy("cohort_wk").agg(F.count("*").alias("cohort_size"))
    active = (
        e.join(cohorts, on="user_id")
        .filter(F.col("wk") >= F.col("cohort_wk"))
        .select("user_id", "cohort_wk", (F.col("wk") - F.col("cohort_wk")).alias("weeks_since"))
        .distinct()
        .groupBy("cohort_wk", "weeks_since")
        .agg(F.count("*").alias("n_active"))
    )
    return (
        active.join(F.broadcast(sizes), on="cohort_wk")
        .select(
            "cohort_wk",
            "weeks_since",
            "n_active",
            "cohort_size",
            round_det(F.col("n_active") / F.col("cohort_size"), 6).alias("retention"),
        )
    )


def q_events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly detection: hourly event counts per type, z-scored
    against that type's own hourly distribution, flagged at |z| > 2.
    The mean/stddev come from exact integer sufficient statistics
    (counts of counts — rule 5), so the z-score is one IEEE expression;
    sqrt of an exact ratio is bit-identical across engines. Output is
    only the anomalous buckets — the alerting shape, not a full dump."""
    events = load_table(spark, sf_dir, "events")
    hourly = (
        events.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("bucket_start"),
            "event_type",
        )
        .agg(F.count("*").alias("n_events"))
    )
    stats = hourly.groupBy("event_type").agg(
        F.count("*").alias("_n"),
        F.sum("n_events").alias("_s1"),
        F.sum(F.col("n_events") * F.col("n_events")).alias("_s2"),
    )
    # (x − mean) and stddev_samp from exact integers; z is then a fixed
    # tree of correctly-rounded IEEE ops mirrored verbatim in the oracle.
    num = (F.col("n_events") * F.col("_n") - F.col("_s1")).cast("double") / F.col("_n")
    den = F.sqrt(
        (F.col("_n") * F.col("_s2") - F.col("_s1") * F.col("_s1")).cast("double")
        / (F.col("_n") * (F.col("_n") - 1)).cast("double")
    )
    z = num / den
    return (
        hourly.join(F.broadcast(stats), on="event_type")
        .filter(F.col("_n") > 1)
        .withColumn("zscore", round_det(z, 4))
        .filter(F.abs(F.col("zscore")) > 2.0)
        .select("event_type", "bucket_start", "n_events", "zscore")
    )


def _ntile_exact(rank_col, n_col, k: int):
    """``ntile(k)`` reproduced arithmetically from a global rank and the
    row count: the SQL-standard tile rule gives the FIRST ``n % k``
    buckets ``floor(n/k)+1`` rows and the rest ``floor(n/k)`` — NOT the
    equal-width ``1 + floor(k*(rank-1)/n)`` formula, which spreads the
    remainder across the range (they diverge whenever n % k ∉ {0, k-1};
    e.g. n=6, k=4 puts rank 4 in tile 2 vs tile 3). All operands are
    exact longs below 2^53, so the double divisions inside floor are
    exact; both engines agree bit-for-bit."""
    base = F.floor(n_col / F.lit(k)).cast("long")
    rem = (n_col % F.lit(k)).cast("long")
    cut = (base + F.lit(1)) * rem
    big = F.lit(1) + F.floor((rank_col - F.lit(1)) / (base + F.lit(1)))
    # greatest() guards the n < k corner (base = 0): the branch is never
    # taken there (cut = n bounds every rank), but keeps the unevaluated
    # expression finite.
    small = rem + F.lit(1) + F.floor(
        (rank_col - F.lit(1) - cut) / F.greatest(base, F.lit(1))
    )
    return F.when(rank_col <= cut, big).otherwise(small).cast("int")


def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: per customer the last-order date
    (recency), order count (frequency), and exact-decimal spend
    (monetary), each quartiled over a fully deterministic order
    (metric, then custkey — unique tie-break, so bucket boundaries
    can't flip between engines), plus the concatenated segment code.

    Scale path (r7 verdict's `weak`): the straightforward three global
    ``ntile(4)`` windows funnel the whole per-customer aggregate — at
    100 TB hundreds of millions of rows — through ONE task, three
    times. Instead each metric's global rank comes from
    :func:`~kickstarter_etl_pipeline_spark.operators.lm_queries.two_phase_rank`
    (range-partition, rank locally, add broadcast per-partition
    offsets — no task ever holds more than its range), and the
    quartile is recovered arithmetically from (rank, n) by
    :func:`_ntile_exact`, bit-identical to the oracle's ``ntile(4)``.
    n rides a one-row broadcast (max rank of the already-checkpointed
    first pass — no second scan of orders). One shuffle for the
    per-customer aggregate + three balanced range exchanges."""
    from kickstarter_etl_pipeline_spark.operators.lm_queries import two_phase_rank

    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.max(F.date_format("o_orderdate", "yyyy-MM-dd")).alias("last_order_date"),
        F.count("*").alias("frequency"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2)
        .cast("double")
        .alias("monetary"),
    )
    ranked = two_phase_rank(
        per_cust, [F.desc("last_order_date"), F.asc("o_custkey")]
    ).withColumnRenamed("rank", "_r_rank")
    n_row = F.broadcast(ranked.agg(F.max("_r_rank").alias("_n_cust")))
    ranked = two_phase_rank(
        ranked, [F.desc("frequency"), F.asc("o_custkey")]
    ).withColumnRenamed("rank", "_f_rank")
    ranked = two_phase_rank(
        ranked, [F.desc("monetary"), F.asc("o_custkey")]
    ).withColumnRenamed("rank", "_m_rank")
    return (
        ranked.crossJoin(n_row)
        .select(
            "o_custkey",
            "last_order_date",
            "frequency",
            "monetary",
            _ntile_exact(F.col("_r_rank"), F.col("_n_cust"), 4).alias("r_quartile"),
            _ntile_exact(F.col("_f_rank"), F.col("_n_cust"), 4).alias("f_quartile"),
            _ntile_exact(F.col("_m_rank"), F.col("_n_cust"), 4).alias("m_quartile"),
        )
        .withColumn(
            "segment",
            F.concat(
                F.col("r_quartile").cast("string"),
                F.col("f_quartile").cast("string"),
                F.col("m_quartile").cast("string"),
            ),
        )
    )


def q_event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order behavior model input: counts of consecutive
    (prev_type → next_type) transitions within each user's event
    sequence (lag over the per-user microsecond order), with the
    per-prev-type transition probability from exact counts — the
    Markov-chain estimation query. One window shuffle on user_id, one
    count aggregate."""
    ev = EV.with_unix_micros(load_table(spark, sf_dir, "events"), out="us")
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    pairs = (
        ev.select("user_id", "event_id", "us", "event_type")
        .withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
    )
    counts = pairs.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count("*").alias("n_transitions")
    )
    totals = counts.groupBy("prev_type").agg(F.sum("n_transitions").alias("_row_total"))
    return counts.join(F.broadcast(totals), on="prev_type").select(
        "prev_type",
        "next_type",
        "n_transitions",
        round_det(F.col("n_transitions") / F.col("_row_total"), 6).alias("p_next"),
    )


def q_error_blast_radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval self-join at scale: for every error event, how many of
    the SAME user's events fall within ±5 minutes. The naive form is a
    quadratic per-user theta join; the scalable shape banding-buckets
    time into 5-minute cells and equi-joins on (user, cell) with each
    error probing its own and both neighbor cells (exploded) — shuffle
    volume O(events × 3), never user² — then applies the exact ±5 min
    predicate as a residual filter. Same trick as LSH banding, applied
    to time. Counts are exact integers."""
    win_us = 300_000_000
    ev = EV.with_unix_micros(load_table(spark, sf_dir, "events"), out="us").select(
        "event_id", "user_id", "event_type", "us"
    )
    others = ev.select(
        "user_id",
        F.col("event_id").alias("other_id"),
        F.col("us").alias("other_us"),
        (F.col("us") / win_us).cast("long").alias("cell"),
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id",
        "user_id",
        "us",
        F.explode(
            F.array(
                (F.col("us") / win_us).cast("long") - 1,
                (F.col("us") / win_us).cast("long"),
                (F.col("us") / win_us).cast("long") + 1,
            )
        ).alias("cell"),
    )
    near = errors.join(others, on=["user_id", "cell"]).filter(
        (F.col("other_id") != F.col("event_id"))
        & (F.abs(F.col("other_us") - F.col("us")) <= win_us)
    )
    # distinct: an other-event in an overlapping neighbor cell can match twice
    return (
        near.select("event_id", "user_id", "other_id")
        .distinct()
        .groupBy("event_id", "user_id")
        .agg(F.count("*").alias("n_nearby"))
    )


def q_priority_mode_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group mode (most frequent order priority per status) with a
    deterministic tie-break (count desc, then priority asc) — the
    argmax-of-count aggregation shape, resolved with one count
    aggregate plus a row_number window over the (small) group×value
    lattice, never a collect."""
    orders = load_table(spark, sf_dir, "orders")
    counts = orders.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n")
    )
    w = Window.partitionBy("o_orderstatus").orderBy(F.desc("n"), F.asc("o_orderpriority"))
    return (
        counts.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("mode_priority"),
            F.col("n").alias("mode_count"),
        )
    )


def q_nation_share_of_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-parent rollup: each nation's customer-balance total as
    a share of its region's total — the two-level BI ratio shape, done
    as one aggregate plus a window SUM over the (tiny) nation-level
    result; the share is one IEEE division over exact decimal sums cast
    down at the same 2-dp boundary on both engines."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    per_nation = (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.sum(F.col("c_acctbal").cast("decimal(18,2)")).alias("_bal"))
    )
    region_total = F.sum("_bal").over(Window.partitionBy("r_name"))
    return per_nation.select(
        "r_name",
        "n_name",
        F.round(F.col("_bal"), 2).cast("double").alias("nation_balance"),
        round_det(
            F.col("_bal").cast("double") * 100.0 / region_total.cast("double"), 6
        ).alias("pct_of_region"),
    )


def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join, date predicates, grouped revenue top-k."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    cutoff = F.lit("1998-06-30 00:00:00").cast("timestamp_ntz")
    joined = (
        customer.filter(F.col("c_mktsegment") == "BUILDING")
        .join(orders, customer.c_custkey == orders.o_custkey)
        .filter(F.col("o_orderdate") < cutoff)
        .join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .filter(F.col("l_shipdate") > cutoff)
    )
    return (
        joined.groupBy(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_orderpriority",
        )
        .agg(
            F.round(
                F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join through the region hierarchy; revenue
    from lineitems where supplier and customer share a nation."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    joined = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(supplier, lineitem.l_suppkey == supplier.s_suppkey)
        .filter(customer.c_nationkey == supplier.s_nationkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .filter(F.col("r_name") == "ASIA")
    )
    return (
        joined.groupBy("n_name")
        .agg(
            F.round(
                F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")),
                2,
            )
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


def q_above_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-subquery shape: orders above their customer's average.

    Expressed as a window (the decorrelated form Catalyst produces for
    the equivalent correlated subquery). The per-customer average is
    derived from the ROUNDED sum so row membership at the comparison
    boundary is engine-independent.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    avg_spend = F.round(F.sum("o_totalprice").over(w), 2) / F.count("*").over(w)
    # floor(x·10^4 + 0.5)/10^4 instead of round(x, 4): exact rationals like
    # sum/16 produce representational ties where Spark's string-based
    # HALF_UP and a numeric rounding disagree; floor-of-identical-doubles
    # is bit-deterministic across engines.
    display = F.floor(F.col("_avg") * 10000 + 0.5) / F.lit(10000.0)
    return (
        orders.withColumn("_avg", avg_spend)
        .filter(F.col("o_totalprice") > F.col("_avg"))
        .select("o_orderkey", "o_custkey", "o_totalprice", display.alias("cust_avg_price"))
    )


def q_yoy_customer_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join (the one join type the registry lacked):
    year-over-year customer activity with retained/churned/new
    classification. Both sides aggregate BEFORE joining (two shuffles
    on o_custkey over pre-shrunk per-customer rows, then one full-outer
    merge — never a fact×fact join), so the shape scales as two
    groupBys, and at 100 TB AQE plans the outer merge on the already
    co-partitioned aggregates."""
    orders = load_table(spark, sf_dir, "orders")

    def year_counts(year: int, alias: str) -> DataFrame:
        return (
            orders.filter(F.year("o_orderdate") == year)
            .groupBy("o_custkey")
            .agg(F.count("*").alias(alias))
        )

    j = year_counts(1996, "n_1996").join(
        year_counts(1997, "n_1997"), on="o_custkey", how="full_outer"
    )
    status = (
        F.when(F.col("n_1996").isNotNull() & F.col("n_1997").isNotNull(), "retained")
        .when(F.col("n_1996").isNotNull(), "churned")
        .otherwise("new")
    )
    return (
        j.select(status.alias("status"), "n_1996", "n_1997")
        .groupBy("status")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum(F.coalesce("n_1996", F.lit(0))).alias("orders_1996"),
            F.sum(F.coalesce("n_1997", F.lit(0))).alias("orders_1997"),
        )
    )


def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (the S4 idempotent-insert primitive)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return customer.join(
        orders.select(F.col("o_custkey").alias("c_custkey")), on="c_custkey", how="left_anti"
    ).select("c_custkey", "c_name")


def q_customers_with_orders_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join + count."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(orders.select(F.col("o_custkey").alias("c_custkey")), on="c_custkey", how="left_semi")
        .agg(F.count("*").alias("n_customers"))
    )


def q_custkeys_1998_not_1999(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set op: EXCEPT (distinct)."""
    orders = load_table(spark, sf_dir, "orders")
    y98 = orders.filter(F.year("o_orderdate") == 1998).select("o_custkey")
    y99 = orders.filter(F.year("o_orderdate") == 1999).select("o_custkey")
    return y98.subtract(y99)


def q_custkeys_both_years(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set op: INTERSECT (distinct)."""
    orders = load_table(spark, sf_dir, "orders")
    y98 = orders.filter(F.year("o_orderdate") == 1998).select("o_custkey")
    y99 = orders.filter(F.year("o_orderdate") == 1999).select("o_custkey")
    return y98.intersect(y99)


def q_price_stats_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: exact interpolated percentiles + stddev.

    stddev is computed from exact-decimal sufficient statistics, not
    ``stddev_samp``: a streaming double variance is summation-order-
    dependent, so its low bits differ run-to-run and engine-to-engine.
    o_totalprice is a 2-dp quantity — sum(x) and sum(x^2) are exact in
    decimal, and sqrt((n*s2 - s1^2) / (n*(n-1))) is then a single
    deterministic IEEE expression on identical inputs in both engines.
    """
    orders = load_table(spark, sf_dir, "orders")
    x = F.col("o_totalprice").cast("decimal(18,2)")
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("p50"),
            F.round(F.percentile("o_totalprice", F.lit(0.9)), 4).alias("p90"),
            F.count("*").alias("_n"),
            F.sum(x).alias("_s1"),
            F.sum(x * x).alias("_s2"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
        .withColumn(
            "price_stddev",
            F.round(
                F.sqrt(
                    (F.col("_n") * F.col("_s2") - F.col("_s1") * F.col("_s1")).cast("double")
                    / (F.col("_n") * (F.col("_n") - F.lit(1))).cast("double")
                ),
                4,
            ),
        )
        .select("o_orderstatus", "p50", "p90", "price_stddev", "min_price", "max_price")
    )


_PRICE_BANDS = [
    ("A_budget", 0.0, 50_000.0),
    ("B_mid", 50_000.0, 150_000.0),
    ("C_high", 150_000.0, 300_000.0),
    ("D_jumbo", 300_000.0, 1e12),
]


def q_range_join_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (non-equi interval) join: orders banded by a tiny broadcast
    band table on lo <= price < hi. At scale the band side is constant-
    size, so BroadcastNestedLoopJoin costs one pass over the fact with a
    4-entry probe — no shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    bands = spark.createDataFrame(_PRICE_BANDS, "band string, lo double, hi double")
    return (
        orders.join(
            F.broadcast(bands),
            (orders.o_totalprice >= bands.lo) & (orders.o_totalprice < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count("*").alias("n_orders"),
            # 2-dp prices summed exactly in decimal → cast of the same
            # rational to double is identical in both engines
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
    )


def q_skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigating salted join, demonstrated on a deliberately skewed
    key: 90% of lineitem rows collapse onto skew_key=0. Unsalted, that
    key's entire volume lands on ONE reducer — the classic 100 TB
    stall; salting spreads it across 16 buckets while staying
    row-identical to the plain join (asserted in tests/test_scale_paths)."""
    from kickstarter_etl_pipeline_spark.operators.joins import salted_join

    li = load_table(spark, sf_dir, "lineitem")
    skew_key = F.when(F.col("l_orderkey") % 10 != 0, F.lit(0)).otherwise(F.col("l_orderkey"))
    large = li.withColumn("skew_key", skew_key.cast("long"))
    small = (
        large.select("skew_key")
        .distinct()
        .withColumn("key_class", F.when(F.col("skew_key") == 0, F.lit("hot")).otherwise(F.lit("cold")))
    )
    joined = salted_join(large, small, on=["skew_key"], how="inner", salt_buckets=16)
    return joined.groupBy("key_class").agg(
        F.count("*").alias("n_items"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("total_price"),
    )


def q_null_safe_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): customer
    nation keys are deterministically nulled (custkey ≡0 mod 9) and a
    matching NULL-keyed row is added to the dim side, so NULL keys MATCH
    each other — the semantic a plain equi join silently drops. Grouped
    counts + balance sums prove both the null-bucket join and the
    non-null passthrough."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    cust = customer.select(
        "c_custkey",
        "c_acctbal",
        F.when(F.col("c_custkey") % 9 == 0, F.lit(None).cast("bigint"))
        .otherwise(F.col("c_nationkey"))
        .alias("nk"),
    )
    dim = nation.select(
        F.col("n_nationkey").alias("nk"), F.col("n_name").alias("nation_name")
    ).unionByName(
        nation.sparkSession.createDataFrame(
            [(None, "UNKNOWN")], "nk bigint, nation_name string"
        )
    )
    joined = cust.join(F.broadcast(dim), cust.nk.eqNullSafe(dim.nk), "left").select(
        "c_custkey", "c_acctbal", "nation_name"
    )
    return joined.groupBy("nation_name").agg(
        F.count("*").alias("n_customers"),
        F.round(F.sum(F.col("c_acctbal").cast("decimal(18,2)")), 2)
        .cast("double")
        .alias("balance_sum"),
    )


def q_grouping_sets_status_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (beyond rollup/cube) + grouping() flags."""
    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderstatus",
        F.year("o_orderdate").cast("int").alias("order_year"),
        "o_totalprice",
    )
    return (
        base.groupingSets([["o_orderstatus"], ["order_year"], []], "o_orderstatus", "order_year")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total_price"),
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping("order_year").cast("int").alias("g_year"),
        )
    )


def q_cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets over orders."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )


def q_pivot_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: order counts per priority × status."""
    orders = load_table(spark, sf_dir, "orders")
    pivoted = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return pivoted.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).cast("long").alias("n_f"),
        F.coalesce(F.col("O"), F.lit(0)).cast("long").alias("n_o"),
        F.coalesce(F.col("P"), F.lit(0)).cast("long").alias("n_p"),
    )


# ---------------------------------------------------------------------------
# Events: windows, sessions, JSON
# ---------------------------------------------------------------------------


def q_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide→long melt) + per-metric aggregate — the inverse of
    the pivot operator, exact decimal totals."""
    li = load_table(spark, sf_dir, "lineitem")
    wide = li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").alias("quantity"),
        F.col("l_extendedprice").alias("extendedprice"),
        F.col("l_discount").alias("discount"),
    )
    long = wide.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["quantity", "extendedprice", "discount"],
        "metric",
        "value",
    )
    return long.groupBy("metric").agg(
        F.count("*").alias("n_values"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total"),
    )


def q_corr_price_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation from exact-decimal sufficient statistics (the
    same engine-independence technique as price_stats_by_status: a
    streaming double corr is summation-order-dependent; exact decimal
    sums cast to double feed ONE deterministic IEEE expression)."""
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("decimal(15,2)")
    y = F.col("l_extendedprice").cast("decimal(15,2)")
    agg = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(x).alias("_sx"),
        F.sum(y).alias("_sy"),
        F.sum(x * x).alias("_sxx"),
        F.sum(y * y).alias("_syy"),
        F.sum(x * y).alias("_sxy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("_sx").cast("double"), F.col("_sy").cast("double")
    sxx, syy, sxy = (
        F.col("_sxx").cast("double"),
        F.col("_syy").cast("double"),
        F.col("_sxy").cast("double"),
    )
    corr = (n * sxy - sx * sy) / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    return agg.select("l_returnflag", "n", round_det(corr, 6).alias("corr_qty_price"))


def q_histogram_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram via bucket arithmetic (no window, one
    shuffle): 25k-wide price buckets with per-bucket count and range."""
    orders = load_table(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice") / 25_000).cast("long")
    return (
        orders.groupBy(bucket.alias("price_bucket"))
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
    )


def q_except_all_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset set op: EXCEPT ALL keeps multiplicity (1998 priorities
    minus 1999 priorities, bag semantics) — complements the distinct
    EXCEPT/INTERSECT pair."""
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.year("o_orderdate") == 1998).select("o_orderpriority")
    b = orders.filter(F.year("o_orderdate") == 1999).select("o_orderpriority")
    return a.exceptAll(b)


def q_part_string_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function surface: case, substring, length, LIKE, concat."""
    part = load_table(spark, sf_dir, "part")
    return (
        part.filter(F.col("p_name").like("%widget%"))
        .select(
            "p_partkey",
            F.upper("p_name").alias("name_upper"),
            F.substring("p_name", 1, 3).alias("name_prefix"),
            F.length("p_name").cast("int").alias("name_len"),
            F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        )
    )


def q_topk_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4: top-k by aggregate, deterministic tie-break, + broadcast join.

    The limit(10) runs BEFORE the customer name join (TakeOrdered on the
    aggregate, then enrich): the joined frame is 10 rows, so the name
    lookup broadcasts the k-bounded side at ANY scale. The old shape
    broadcast the full customer projection — linear in sf, an executor
    OOM at the 100-TB posture."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    top = (
        orders.groupBy("o_custkey")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("total_spend"), F.count("*").alias("n_orders"))
        .orderBy(F.desc("total_spend"), "o_custkey")
        .limit(10)
    )
    return (
        F.broadcast(top)
        .join(customer.select("c_custkey", "c_name"), top.o_custkey == F.col("c_custkey"))
        .select("c_custkey", "c_name", "total_spend", "n_orders")
        .orderBy(F.desc("total_spend"), "c_custkey")
    )


def q_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users (weekly DAU/WAU): for every calendar
    day with events, the count of DISTINCT users active in [d−6, d],
    next to that day's own distinct actives.

    Distinct-over-a-sliding-window does NOT decompose into a window
    frame over daily aggregates (users repeat across days), so the
    correct distributed shape is: distinct (day, user) pairs, a
    bounded range self-join onto the day grid (fan-out ≤ 7 — an
    equi-join on the derived grid day would also work via explode), and
    a distinct count per grid day. Shuffles are keyed by day —
    uniform. The sketch path at extreme scale is HLL partials per day
    merged over the window (distinct_users_rollup shows that merge).
    """
    ev = EV.with_unix_micros(load_table(spark, sf_dir, "events"))
    day_user = (
        ev.select(F.floor(F.col("_us") / 86_400_000_000).alias("day"), "user_id")
        .distinct()
        .localCheckpoint(eager=True)
    )
    days = day_user.select("day").distinct()
    window_hits = days.alias("g").join(
        day_user.alias("a"),
        (F.col("a.day") <= F.col("g.day")) & (F.col("a.day") >= F.col("g.day") - 6),
    )
    rolling = window_hits.groupBy(F.col("g.day").alias("day")).agg(
        F.countDistinct("a.user_id").cast("long").alias("active_7d")
    )
    daily = day_user.groupBy("day").agg(
        F.countDistinct("user_id").cast("long").alias("active_1d")
    )
    return (
        rolling.join(daily, on="day")
        .select(
            F.col("day").cast("long").alias("day_idx"),
            "active_1d",
            "active_7d",
        )
    )


def q_events_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OHLC bars over the event value series, per event type: the
    time-series candlestick aggregation (open = first value in event
    order, high/low = extremes, close = last, volume = count).

    first/last are defined on the exact-µs (ts, event_id) total order —
    engine-deterministic — and computed with max_by/min_by rather than
    a window sort, so the whole bar table is ONE map-side-combining
    aggregate keyed by (day, type): no per-group sort, no row_number,
    one uniform shuffle. The order key is a zero-padded string (µs then
    event_id) because DuckDB's arg_min/arg_max lack struct-key
    overloads — string order == numeric order under the padding.
    """
    ev = EV.with_unix_micros(load_table(spark, sf_dir, "events"))
    key = F.concat_ws(
        ":",
        F.lpad(F.col("_us").cast("string"), 20, "0"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    return (
        ev.select(
            F.floor(F.col("_us") / 86_400_000_000).cast("long").alias("day_idx"),
            "event_type",
            "value",
            key.alias("_k"),
        )
        .groupBy("day_idx", "event_type")
        .agg(
            F.min_by("value", F.col("_k")).alias("open"),
            F.round(F.max("value"), 4).alias("high"),
            F.round(F.min("value"), 4).alias("low"),
            F.max_by("value", F.col("_k")).alias("close"),
            F.count("*").cast("long").alias("volume"),
        )
        .select(
            "day_idx",
            "event_type",
            F.round("open", 4).alias("open"),
            "high",
            "low",
            F.round("close", 4).alias("close"),
            "volume",
        )
    )


def q_events_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value (TWAP) per (event_type, day): each
    observation is weighted by its holding interval — the exact-µs gap
    to the NEXT event of the same type that day (the day's last
    observation carries no interval). The financial/TS aggregation that
    a plain avg() silently gets wrong when sampling is irregular.

    Weights are exact integer microseconds (lead over the (us,
    event_id) total order); the weighted sum is rounded to 4 dp, the
    same engine-tolerance discipline as every sum(value) oracle in the
    registry. One window partitioned by (type, day) + one aggregate —
    both keyed uniformly.
    """
    ev = EV.with_unix_micros(load_table(spark, sf_dir, "events"))
    day = F.floor(F.col("_us") / 86_400_000_000).cast("long")
    w = Window.partitionBy("event_type", "_day").orderBy("_us", "event_id")
    staged = (
        ev.withColumn("_day", day)
        .withColumn("_dt", (F.lead("_us").over(w) - F.col("_us")).cast("long"))
        .filter(F.col("_dt").isNotNull())
    )
    return staged.groupBy(F.col("_day").alias("day_idx"), "event_type").agg(
        F.count("*").cast("long").alias("n_intervals"),
        F.sum("_dt").cast("long").alias("total_us"),
        F.round(F.sum(F.col("value") * F.col("_dt")) / F.sum("_dt"), 4).alias("twap"),
    )


def q_gini_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of order value per status — the inequality /
    concentration metric (0 = equal spend, →1 = one order dominates):
    ``G = 2·Σ(i·xᵢ) / (n·Σxᵢ) − (n+1)/n`` over ascending-sorted values
    (orderkey tie-break; ties in x make the rank choice irrelevant to
    the sum). One per-group rank window + one aggregate; round 6 on the
    final fixed expression tree.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    ranked = orders.select(
        "o_orderstatus",
        "o_totalprice",
        F.row_number().over(w).cast("long").alias("_i"),
    )
    return ranked.groupBy("o_orderstatus").agg(
        F.count("*").cast("long").alias("n_orders"),
        F.round(
            2 * F.sum(F.col("_i") * F.col("o_totalprice"))
            / (F.count("*") * F.sum("o_totalprice"))
            - (F.count("*") + 1) / F.count("*"),
            6,
        ).alias("gini"),
    )


def q_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 session entry paths: the first three event types of every
    user session (30-min gap rule, same lag+cumsum construction as
    sessionize), joined with '>' — the product-analytics "how do
    sessions start" path-mining table.

    The per-session path builds inside one aggregate via
    array_sort(collect_list(struct)) over the exact (µs, event_id)
    order — no second window pass; top-k is a TakeOrdered on the
    unique (count, path) order.
    """
    sess = EV.with_session_ids(load_table(spark, sf_dir, "events"))
    paths = sess.groupBy("user_id", "session_id").agg(
        F.array_join(
            F.slice(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_us", "event_id", "event_type"))),
                    lambda s: s.event_type,
                ),
                1,
                3,
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").cast("long").alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(20)
    )


def q_ab_experiment_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experimentation readout: users deterministically bucketed by
    the last md5 hex digit of user_id (0-7 → A, 8-f → B), then per
    (bucket, event_type): distinct users, events, value sum and
    events-per-user — the reproducible traffic-split + guardrail table
    (same assignment on every engine/run/cluster, no RNG).
    """
    ev = load_table(spark, sf_dir, "events")
    bucket = F.when(
        F.substring(F.md5(F.col("user_id").cast("string")), 32, 1) < "8", "A"
    ).otherwise("B")
    return (
        ev.withColumn("bucket", bucket)
        .groupBy("bucket", "event_type")
        .agg(
            F.countDistinct("user_id").cast("long").alias("n_users"),
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .withColumn(
            "events_per_user", round_det(F.col("n_events") / F.col("n_users"), 6)
        )
    )


def q_chi2_type_by_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence table for event_type × day-of-week:
    observed counts, expected counts under independence
    (row_total·col_total/N) and each cell's χ² contribution
    ((o−e)²/e) — the guardrail test behind "is traffic mix shifting by
    weekday". All inputs are exact integer counts; expected and the
    contribution are one fixed IEEE expression tree each (round 6), so
    the whole table is engine-deterministic. Σ contribution = the χ²
    statistic (34 df here), left to the reader so every graded cell is
    raw.

    One (type, dow) aggregate plus two broadcast marginal joins — the
    contingency table is tiny at any corpus scale.
    """
    ev = EV.with_unix_micros(load_table(spark, sf_dir, "events"))
    cells = (
        ev.select(
            "event_type",
            # epoch day 0 = 1970-01-01 (Thursday = dow 4 under ISO-ish
            # numbering below); derive dow purely from the integer day
            # index so no timezone/calendar function is involved.
            ((F.floor(F.col("_us") / 86_400_000_000) + 4) % 7).cast("int").alias("dow"),
        )
        .groupBy("event_type", "dow")
        .agg(F.count("*").cast("long").alias("observed"))
    )
    row_tot = cells.groupBy("event_type").agg(F.sum("observed").alias("_rt"))
    col_tot = cells.groupBy("dow").agg(F.sum("observed").alias("_ct"))
    n = cells.agg(F.sum("observed").alias("_n"))
    expected = F.col("_rt") * F.col("_ct") / F.col("_n")
    return (
        cells.join(F.broadcast(row_tot), "event_type")
        .join(F.broadcast(col_tot), "dow")
        .crossJoin(F.broadcast(n))
        .select(
            "event_type",
            "dow",
            "observed",
            F.round(expected, 6).alias("expected"),
            F.round((F.col("observed") - expected) * (F.col("observed") - expected) / expected, 6).alias(
                "chi2_contrib"
            ),
        )
    )


def q_exact_quartiles_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distributed quartiles per order status under the
    NEAREST-RANK convention (p_q = value at rank ceil(q·n) in ascending
    order, orderkey tie-break) — no interpolation, so the result is a
    member of the data and engine-deterministic by construction.
    Complements q_exact_median_by_group (which uses the averaged-middle
    convention) and approx_aggregates (the sketch path at scale).
    """
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    ranked = orders.select(
        "o_orderstatus",
        "o_totalprice",
        F.row_number().over(w).cast("long").alias("_rn"),
        F.count("*").over(Window.partitionBy("o_orderstatus")).cast("long").alias("_n"),
    )
    picks = [("p25", 0.25), ("p50", 0.50), ("p75", 0.75)]
    conds = [
        F.max(
            F.when(F.col("_rn") == F.ceil(F.lit(q) * F.col("_n")), F.col("o_totalprice"))
        ).alias(name)
        for name, q in picks
    ]
    return (
        ranked.groupBy("o_orderstatus")
        .agg(F.max("_n").alias("n_orders"), *conds)
        .select(
            "o_orderstatus",
            "n_orders",
            "p25",
            "p50",
            "p75",
            F.round(F.col("p75") - F.col("p25"), 2).alias("iqr"),
        )
    )


def q_session_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket lift between event types at SESSION granularity:
    for each unordered type pair, P(both in one session) /
    (P(a)·P(b)) — "users who view also purchase?" expressed exactly
    like retail basket analysis, over the 30-min-gap sessions.

    Counts are exact integers (sessions containing a type / a pair);
    lift is one fixed division tree on them (round 6); the session
    total rides a one-row broadcast, never a driver-side count. The pair
    generation explodes each session's DISTINCT type set (≤ 5 types →
    ≤ 10 pairs per session — bounded fan-out, no self-join).
    """
    ev = EV.with_unix_micros(load_table(spark, sf_dir, "events"))
    w = Window.partitionBy("user_id").orderBy("_us", "event_id")
    gap_us = 1800 * 1_000_000
    new_session = F.when(
        F.lag("_us").over(w).isNull() | ((F.col("_us") - F.lag("_us").over(w)) > gap_us), 1
    ).otherwise(0)
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess_types = (
        ev.withColumn("_new", new_session)
        .withColumn("_sid", F.sum("_new").over(cum).cast("long"))
        .select("user_id", "_sid", "event_type")
        .distinct()
        .localCheckpoint(eager=True)
    )
    totals = F.broadcast(
        sess_types.select("user_id", "_sid").distinct().agg(
            F.count("*").cast("long").alias("_ns")
        )
    )
    type_counts = sess_types.groupBy("event_type").agg(
        F.count("*").cast("long").alias("_tn")
    )
    per_session = sess_types.groupBy("user_id", "_sid").agg(
        F.array_sort(F.collect_list("event_type")).alias("_types")
    )
    pairs = per_session.select(
        F.explode(
            F.expr(
                "flatten(transform(_types, (a, i) -> "
                "transform(slice(_types, i + 2, size(_types)), b -> "
                "named_struct('type_a', a, 'type_b', b))))"
            )
        ).alias("_p")
    ).select("_p.type_a", "_p.type_b")
    pair_counts = pairs.groupBy("type_a", "type_b").agg(
        F.count("*").cast("long").alias("n_both")
    )
    return (
        pair_counts.join(
            F.broadcast(type_counts.select(F.col("event_type").alias("type_a"), F.col("_tn").alias("n_a"))),
            "type_a",
        )
        .join(
            F.broadcast(type_counts.select(F.col("event_type").alias("type_b"), F.col("_tn").alias("n_b"))),
            "type_b",
        )
        .crossJoin(totals)
        .select(
            "type_a",
            "type_b",
            "n_both",
            "n_a",
            "n_b",
            round_det(
                (F.col("n_both") / F.col("_ns"))
                / ((F.col("n_a") / F.col("_ns")) * (F.col("n_b") / F.col("_ns"))),
                6,
            ).alias("lift"),
        )
    )


def q_knn_label_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN classification eval over the embeddings: every vector with
    vec_id < 50 is classified by the majority label of its 5 exact
    cosine nearest neighbors (vote ties broken by smaller label), next
    to its true label and a hit flag — the standard embedding-quality
    probe (a good space ⇒ high leave-one-out kNN accuracy).

    Composes the oracle'd brute-force top-k with a label join; the
    vote is one (query, label) count + a row_number over the (count
    desc, label asc) total order.
    """
    from kickstarter_etl_pipeline_spark.operators.similarity import brute_force_topk

    emb = load_table(spark, sf_dir, "embeddings")
    # The label table is the FULL corpus (linear in sf) — never hint
    # it. The broadcastable side is the kNN result: n_queries × k rows
    # (here 50 × 5), k-bounded at any scale, so IT carries the hint
    # and the label lookups stay shuffle-free without risking an OOM.
    labels = emb.select("vec_id", "label")
    nn = brute_force_topk(emb, emb.filter(F.col("vec_id") < 50), k=5)
    votes = (
        F.broadcast(nn)
        .join(labels.withColumnRenamed("vec_id", "neighbor_id"), "neighbor_id")
        .groupBy("query_id", "label")
        .agg(F.count("*").cast("long").alias("n_votes"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("n_votes"), F.asc("label"))
    pred = (
        votes.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .select("query_id", F.col("label").alias("pred_label"), "n_votes")
    )
    return (
        F.broadcast(pred)
        .join(
            labels.select(F.col("vec_id").alias("query_id"), F.col("label").alias("true_label")),
            "query_id",
        )
        .select(
            "query_id",
            "true_label",
            "pred_label",
            "n_votes",
            (F.col("pred_label") == F.col("true_label")).cast("int").alias("is_correct"),
        )
    )


def q_ann_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the LSH ANN tier against exact brute force, PER
    QUERY — the index-quality report a retrieval deployment watches.
    Both pipelines are individually oracle'd (ann_lsh_topk,
    embedding_topk), so their composition is too: the oracle joins the
    two verified SQL pipelines and computes the identical hit ratio.
    """
    from kickstarter_etl_pipeline_spark.operators.similarity import brute_force_topk, lsh_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    exact = brute_force_topk(emb, queries, k=5).select("query_id", "neighbor_id")
    approx = lsh_topk(
        emb, queries, dim=64, k=5, num_planes=3, num_tables=6, n_probe=2
    ).select("query_id", "neighbor_id", F.lit(1).alias("_hit"))
    return (
        exact.join(approx, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(F.count("_hit").cast("long").alias("n_hits"))
        .select(
            "query_id",
            "n_hits",
            round_det(F.col("n_hits") / 5.0, 6).alias("recall_at_5"),
        )
    )


def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-iteration PageRank over the error co-occurrence graph —
    ITERATIVE yet fully oracle'd: the rank vector is rounded to a 1e-9
    grid after every iteration (see operators.graph.pagerank), so the
    DuckDB twin replays the literal unrolled recurrence bit-for-bit."""
    from kickstarter_etl_pipeline_spark.operators.graph import cooccurrence_edges, pagerank

    ev = EV.with_unix_micros(load_table(spark, sf_dir, "events"))
    edges = cooccurrence_edges(ev, event_type="error", bucket_seconds=1800)
    return pagerank(edges, iterations=10).select(
        F.col("id").alias("user_id"), "pr_permille"
    )


def q_graph_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-round synchronous label-propagation communities over the error
    co-occurrence graph — iterative, integer-exact, fully oracle'd
    (see operators.graph.label_propagation)."""
    from kickstarter_etl_pipeline_spark.operators.graph import (
        cooccurrence_edges,
        label_propagation,
    )

    ev = EV.with_unix_micros(load_table(spark, sf_dir, "events"))
    edges = cooccurrence_edges(ev, event_type="error", bucket_seconds=1800)
    return label_propagation(edges, iterations=5).select(
        F.col("id").alias("user_id"), "community", "n_members"
    )


def q_events_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially-weighted moving average of the event
    value stream (α = 0.25) — the streaming-flavored smoother, computed
    as a SEQUENTIAL fold over each user's exact (µs, event_id)-ordered
    values. Oracle-able by the same deterministic-by-rounding device as
    PageRank: every fold step lands on a 1e-9 grid, so engine-side
    fold implementations (Spark `aggregate`, DuckDB `list_reduce`)
    produce bit-identical results.

    One shuffle (the per-user collect); the fold is per-row JVM
    expression work. At extreme per-user history lengths the collected
    list is the bound — window the stream (EWMA over the last N days)
    before folding.
    """
    ev = EV.with_unix_micros(load_table(spark, sf_dir, "events"))
    grouped = ev.groupBy("user_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("_us", "event_id", "value"))),
            lambda s: s.value.cast("double"),
        ).alias("_vals")
    )
    step = lambda acc, x: F.floor((acc * 0.75 + x * 0.25) * 1_000_000_000 + 0.5) / F.lit(
        1_000_000_000.0
    )
    ewma = F.aggregate(
        F.expr("slice(_vals, 2, size(_vals) - 1)"),
        F.element_at(F.col("_vals"), 1),
        step,
    )
    return grouped.select(
        "user_id",
        F.size("_vals").cast("long").alias("n_events"),
        round_det(ewma, 6).alias("ewma_value"),
    )


def q_traffic_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Traffic seasonality heatmap: event counts per (day-of-week,
    hour-of-day) cell with each cell's share of total traffic — the
    capacity-planning profile. dow/hour derived from integer epoch
    arithmetic (no calendar functions), exact counts, one fixed
    division tree."""
    ev = EV.with_unix_micros(load_table(spark, sf_dir, "events"))
    cells = (
        ev.select(
            ((F.floor(F.col("_us") / 86_400_000_000) + 4) % 7).cast("int").alias("dow"),
            (F.floor(F.col("_us") / 3_600_000_000) % 24).cast("int").alias("hour"),
        )
        .groupBy("dow", "hour")
        .agg(F.count("*").cast("long").alias("n_events"))
    )
    total = F.broadcast(cells.agg(F.sum("n_events").alias("_t")))
    return cells.crossJoin(total).select(
        "dow", "hour", "n_events", round_det(F.col("n_events") / F.col("_t"), 6).alias("share")
    )


def q_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier concentration per nation: the Herfindahl-Hirschman
    index over suppliers' revenue shares (HHI = Σ shareᵢ², share in
    percent → 0..10000), plus the top-supplier share — the market-
    concentration metric, computed from exact decimal revenue sums
    with a fixed squared-share tree."""
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    rev = (
        li.groupBy("l_suppkey")
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("_rev"))
        .join(supplier.select("s_suppkey", "s_nationkey"), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation.select("n_nationkey", "n_name")), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("n_name", F.col("_rev").cast("double").alias("rev"))
    )
    nat_tot = rev.groupBy("n_name").agg(F.sum("rev").alias("_nt"))
    shares = rev.join(nat_tot, "n_name").select(
        "n_name", (F.col("rev") / F.col("_nt") * 100).alias("_sh")
    )
    return shares.groupBy("n_name").agg(
        F.count("*").cast("long").alias("n_suppliers"),
        round_det(F.sum(F.col("_sh") * F.col("_sh")), 4).alias("hhi"),
        round_det(F.max("_sh"), 4).alias("top_share_pct"),
    )


def q_graph_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs/authorities over the bipartite customer→supplier
    graph (distinct (o_custkey, l_suppkey) pairs through lineitem):
    hub customers buy from many authoritative suppliers, authoritative
    suppliers serve many hub customers — the mutually-recursive
    centrality pair. 4 exact-integer-spine iterations; see graph.hits
    for the determinism contract and _hits_oracle_sql for the unrolled
    SQL twin."""
    from kickstarter_etl_pipeline_spark.operators.graph import hits

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = orders.join(li, orders.o_orderkey == li.l_orderkey).select(
        F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s")
    )
    return hits(edges, iterations=4)


def q_graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition (k=4, 6 peel rounds) of the error
    co-occurrence graph (users connected iff both errored within the
    same 10-minute bucket — a sparser graph than the triangle tier's
    30-minute one, so the peel actually removes vertices at fixture
    scale). The k-core is THE standard dense-subgraph screen for bot
    rings / correlated-failure cohorts; see graph.kcore for the
    fixed-round contract and scale posture. Pure integer arithmetic —
    the DuckDB twin is the literal unrolled peel."""
    from kickstarter_etl_pipeline_spark.operators.graph import (
        cooccurrence_edges,
        kcore,
    )

    ev = EV.with_unix_micros(load_table(spark, sf_dir, "events"))
    edges = cooccurrence_edges(ev, event_type="error", bucket_seconds=600)
    return kcore(edges, k=4, rounds=6).select(
        F.col("id").alias("user_id"), "core_degree"
    )


def q_part_hierarchy_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchy (recursive-CTE) rollup — the classic OLAP capability
    the registry lacked: derive a 4-ary part taxonomy (child k → parent
    (k−1) DIV 4, node 0 the root — a deterministic function of the key,
    so both engines build the identical tree from the raw table), take
    its ancestor-descendant transitive closure, and report, per part:
    its depth and its SUBTREE rollup (descendant count and total retail
    value including itself) — the BOM-explosion / org-chart aggregate
    that needs WITH RECURSIVE in SQL.

    Spark side: path-doubling closure (operators/graph.py
    transitive_closure — ⌈log2 depth⌉ shuffles, not depth); 5 rounds
    covers depth ≤ 2^5 = 32, i.e. every 4-ary tree below 4^32 ≈ 1.8e19
    nodes — an arithmetic bound, not fixture luck. DuckDB twin: a
    genuine WITH RECURSIVE walk of the same parent function (linear —
    the recursive CTE is referenced once per step, the kcore
    MATERIALIZED lesson does not bite).

    Exactness: depth and counts are pure integers; money rolls up as
    floor(p_retailprice·100 + 0.5) cents — identical IEEE snap on both
    engines — and is emitted as an exact BIGINT cents sum (no float
    aggregation anywhere).

    Scale: closure size is Σ depth(v) ≈ N·log4 N rows; every exchange
    is keyed by part id (uniform — keys are dense integers); the
    rollup is one groupBy over the closure. No driver data, no global
    sort; output is one row per part."""
    from kickstarter_etl_pipeline_spark.operators.graph import transitive_closure

    part = load_table(spark, sf_dir, "part")
    nodes = part.select(
        F.col("p_partkey").cast("long").alias("id"),
        F.floor(F.col("p_retailprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("_cents"),
    )
    edges = part.filter(F.col("p_partkey") >= 1).select(
        F.expr("CAST((p_partkey - 1) DIV 4 AS BIGINT)").alias("anc"),
        F.col("p_partkey").cast("long").alias("des"),
    )
    clo = transitive_closure(edges, rounds=5)
    depth = clo.groupBy(F.col("des").alias("id")).agg(
        F.count("*").cast("long").alias("_depth")
    )
    sub = (
        clo.join(nodes.withColumnRenamed("id", "des"), "des")
        .groupBy(F.col("anc").alias("id"))
        .agg(
            F.count("*").cast("long").alias("_ndesc"),
            F.sum("_cents").cast("long").alias("_dcents"),
        )
    )
    return (
        nodes.join(depth, "id", "left")
        .join(sub, "id", "left")
        .select(
            F.col("id").alias("p_partkey"),
            F.coalesce(F.col("_depth"), F.lit(0)).cast("long").alias("depth"),
            (F.coalesce(F.col("_ndesc"), F.lit(0)) + 1)
            .cast("long")
            .alias("subtree_count"),
            (F.coalesce(F.col("_dcents"), F.lit(0)) + F.col("_cents"))
            .cast("long")
            .alias("subtree_value_cents"),
        )
    )


def q_intersect_all_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset set-op surface completion: INTERSECT ALL keeps
    multiplicity (each 1998 priority row pairs off against one 1999
    row, bag semantics) — the missing member next to EXCEPT ALL
    (q_except_all_priorities) and the distinct INTERSECT
    (q_custkeys_both_years)."""
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.year("o_orderdate") == 1998).select("o_orderpriority")
    b = orders.filter(F.year("o_orderdate") == 1999).select("o_orderpriority")
    return a.intersectAll(b)


def q_graph_bfs_depths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source BFS shortest-path depths (8 fixed rounds) from the
    minimum user id over the 10-minute error co-occurrence graph — the
    distance/reachability view completing the graph tier next to
    pagerank/HITS (centrality), k-core (density), components
    (partition), and the closure (ancestry). Pure integer end to end
    (depths are loop counters); the DuckDB twin is the literal
    unrolled frontier replay with MATERIALIZED per-round CTEs (the
    visited set is referenced twice per round — device 7)."""
    from kickstarter_etl_pipeline_spark.operators.graph import (
        bfs_depths,
        cooccurrence_edges,
    )

    ev = EV.with_unix_micros(load_table(spark, sf_dir, "events"))
    edges = cooccurrence_edges(ev, event_type="error", bucket_seconds=600)
    return bfs_depths(edges, rounds=8).select(
        F.col("id").alias("user_id"), "depth"
    )


def q_bootstrap_ci_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap confidence intervals for the mean order value
    per priority class — THE bootstrap for data that doesn't fit on one
    machine (Chamandy et al., "Estimating Uncertainty for Massive Data
    Streams", Google 2012): instead of drawing B resamples (B full
    shuffles of the fact table), each row independently receives a
    Poisson(1) multiplicity per replicate, so all 32 replicates ride
    ONE scan + ONE tiny aggregate (partial map-side combine collapses
    to priorities×32 groups per partition before the exchange).

    Determinism (no RNG anywhere): replicate b's weight for an order is
    the Poisson(1) inverse CDF evaluated at u = first 15 md5 hex digits
    of "orderkey:b" — a pure function of the data, reproducible across
    engines, runs, and cluster sizes. The CDF thresholds are HARDCODED
    integer literals on the 2^60 grid (floor(CDF(k)·16^15), k=0..5,
    weights capped at 6 — P(W>6|u) < 6e-4); deriving them at runtime
    on each engine would be a cross-libm bet (the mmr derived-constant
    lesson), so the literals themselves are the contract.

    Exactness: replicate means are decided by exact integer floor
    division — mean6 = (Σw·cents · 10000) DIV Σw on decimal(38,0)
    (cents = floor(price·100+0.5), the IEEE-exact 2-dp snap) — and the
    CI bounds are the rank-2 / rank-31 replicate means (percentile
    method, ≈[3.1%, 96.9%] with B=32), ranked on (mean6, b): integers
    end to end, no float ever decides a bound. The per-priority rank
    window orders 32 rows per group — control-sized, not data-sized."""
    # floor(CDF_Poisson(1)(k) * 16^15), k = 0..5 — identical literals in
    # the DuckDB twin (oracles_analytics.py).
    T = [
        424136118829305344,
        848272237658610688,
        1060340297073263360,
        1131029650211480960,
        1148701988496035328,
        1152236456152946176,
    ]
    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderkey",
        F.col("o_orderpriority").alias("priority"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long").alias("_cents"),
    )
    rep = base.withColumn("b", F.explode(F.sequence(F.lit(0), F.lit(31))))
    u = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":", F.col("o_orderkey").cast("string"), F.col("b").cast("string")
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    w = (
        F.when(u < T[0], 0)
        .when(u < T[1], 1)
        .when(u < T[2], 2)
        .when(u < T[3], 3)
        .when(u < T[4], 4)
        .when(u < T[5], 5)
        .otherwise(6)
    ).cast("long")
    reps = (
        rep.withColumn("_w", w)
        .groupBy("priority", "b")
        .agg(
            F.sum(F.col("_w") * F.col("_cents")).cast("decimal(38,0)").alias("_s"),
            F.sum("_w").cast("long").alias("_wsum"),
        )
    )
    # exact integer floor division: subtract the remainder first, so the
    # decimal divide is of an exactly-divisible numerator (no rounding
    # mode in play). _wsum = 0 has probability e^-n (never at any real
    # n) but must not ERROR under ANSI mode -> NULL via the when-guard.
    wsafe = F.when(F.col("_wsum") > 0, F.col("_wsum"))
    s10k = F.col("_s") * 10000
    mean6 = ((s10k - s10k % wsafe) / wsafe).cast("long")
    ranked = reps.select("priority", "b", mean6.alias("_m6")).withColumn(
        "_rk",
        F.row_number().over(Window.partitionBy("priority").orderBy("_m6", "b")),
    )
    ci = ranked.groupBy("priority").agg(
        F.max(F.when(F.col("_rk") == 2, F.col("_m6"))).alias("_lo6"),
        F.max(F.when(F.col("_rk") == 31, F.col("_m6"))).alias("_hi6"),
    )
    pt = base.groupBy("priority").agg(
        F.count("*").cast("long").alias("n_orders"),
        F.sum("_cents").cast("decimal(38,0)").alias("_sc"),
    )
    p10k = F.col("_sc") * 10000
    point6 = ((p10k - p10k % F.col("n_orders")) / F.col("n_orders")).cast("long")
    return (
        pt.join(ci, "priority")
        .select(
            F.col("priority").alias("o_orderpriority"),
            "n_orders",
            (point6 / F.lit(1e6)).alias("point_mean"),
            (F.col("_lo6") / F.lit(1e6)).alias("ci_lo"),
            (F.col("_hi6") / F.lit(1e6)).alias("ci_hi"),
        )
    )


def q_pareto_frontier_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline / Pareto frontier of the part catalog — the points where
    no other part is simultaneously cheaper AND larger (minimize
    p_retailprice, maximize p_size): the classic multi-objective
    dominance operator (Börzsönyi et al., "The Skyline Operator",
    ICDE 2001).

    Scale path: the naive formulation is a quadratic NOT-EXISTS
    anti-join (which is exactly what the DuckDB twin runs — the grade
    proves the reduction). Spark instead (1) collapses to one candidate
    per distinct price (only the max size can survive), then (2) runs
    the EXCLUSIVE prefix max of size in price order through
    two_phase_rank's range-exchange device (``max_col``) — a point is
    on the frontier iff no strictly-cheaper point reaches its size.
    O(n log n) by sort, no single-partition window, no pair blow-up.

    Exactness: prices ride the floor(·100+0.5) cents snap; everything
    downstream is integer comparison. ``price`` is emitted as
    cents/100.0 — an exact IEEE division by a power-of-two-free
    constant of an integer < 2^53, identical on both engines."""
    from kickstarter_etl_pipeline_spark.operators.lm_queries import two_phase_rank

    part = load_table(spark, sf_dir, "part")
    cents = F.floor(F.col("p_retailprice") * 100 + F.lit(0.5)).cast("long")
    pts = (
        part.select(cents.alias("_price_c"), F.col("p_size").cast("long").alias("p_size"))
        .groupBy("_price_c")
        .agg(F.max("p_size").alias("_best"))
    )
    r = two_phase_rank(pts, ["_price_c"], max_col="_best")
    frontier = r.filter(
        F.col("cum_max_excl").isNull() | (F.col("_best") > F.col("cum_max_excl"))
    ).select("_price_c", F.col("_best").alias("p_size"))
    counts = part.groupBy(
        cents.alias("_price_c"), F.col("p_size").cast("long").alias("p_size")
    ).agg(F.count("*").cast("long").alias("n_parts"))
    return (
        frontier.join(counts, ["_price_c", "p_size"])
        .select(
            (F.col("_price_c") / F.lit(100.0)).alias("price"),
            "p_size",
            "n_parts",
        )
    )


def q_kaplan_meier_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve for time-to-first-purchase: each
    user enters at their first 'view' event; the event is their first
    subsequent 'purchase'; users with no purchase are right-censored at
    the global observation end — the canonical censored
    time-to-conversion analysis (Kaplan & Meier 1958).

    Exactness: durations are exact integer day counts; at each event
    day the risk set n and event count d are exact longs; the curve is
    carried in LOG space — ln S(t) = Σ ln((n_i−d_i)/n_i) with each term
    ln of an exact integer ratio snapped to the nano-nat grid BEFORE
    the prefix sum (the JSD device), so the cumulative is an exact
    integer sum and no float summation order exists. S itself would
    need exp (the perplexity_proxy rows-only lesson), so the emitted
    column IS the log-survival. A day where d = n sends the true curve
    to 0 (ln → −inf): from that day on log_survival is NULL by an
    integer flag both engines compute identically.

    Scale: two keyed aggregates over users, then a day-grid table —
    the prefix windows run over distinct DAYS, a calendar-bounded
    frame (thousands of rows at any corpus size), not a data-sized
    exchange."""
    ev = EV.with_unix_micros(load_table(spark, sf_dir, "events"))
    day_us = 86400000000
    entry = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("_us").alias("_t0"))
    )
    purch = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("_us").alias("_tp_raw"))
        .join(entry, "user_id")
        .filter(F.col("_tp_raw") >= F.col("_t0"))
        .groupBy("user_id")
        .agg(F.min("_tp_raw").alias("_tp"))
    )
    tend = F.broadcast(ev.agg(F.max("_us").alias("_te")))
    subj = (
        entry.join(purch, "user_id", "left")
        .crossJoin(tend)
        .select(
            F.floor(
                (F.coalesce("_tp", "_te") - F.col("_t0")) / F.lit(day_us)
            ).cast("long").alias("_day"),
            F.col("_tp").isNotNull().cast("long").alias("_is_event"),
        )
    )
    days = subj.groupBy("_day").agg(
        F.sum("_is_event").cast("long").alias("n_events"),
        F.count("*").cast("long").alias("_c_all"),
    )
    total = F.broadcast(subj.agg(F.count("*").cast("long").alias("_n_total")))
    w_excl = Window.orderBy("_day").rowsBetween(Window.unboundedPreceding, -1)
    at_risk = (
        days.crossJoin(total)
        .withColumn(
            "n_at_risk",
            F.col("_n_total") - F.coalesce(F.sum("_c_all").over(w_excl), F.lit(0)),
        )
    )
    evd = at_risk.filter(F.col("n_events") > 0)
    term9 = F.when(
        F.col("n_events") < F.col("n_at_risk"),
        F.floor(
            F.log(
                (F.col("n_at_risk") - F.col("n_events")) / F.col("n_at_risk")
            )
            * 1e9
            + F.lit(0.5)
        ).cast("long"),
    )
    w_incl = Window.orderBy("_day").rowsBetween(Window.unboundedPreceding, 0)
    curve = (
        evd.withColumn("_term9", term9)
        .withColumn(
            "_hit0",
            F.max((F.col("n_events") >= F.col("n_at_risk")).cast("int")).over(w_incl),
        )
        .withColumn("_ln9", F.sum("_term9").over(w_incl))
    )
    return curve.select(
        F.col("_day").alias("event_day"),
        "n_at_risk",
        "n_events",
        F.when(
            F.col("_hit0") == 0,
            F.floor(F.col("_ln9") / F.lit(1e9) * 1e6 + F.lit(0.5)) / F.lit(1e6),
        ).alias("log_survival"),
    )


def q_multitouch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based (U-shaped) multi-touch attribution — the
    generalization of the last-touch view (events_asof_next_purchase):
    every purchase distributes 10000 basis points of credit across the
    user's touchpoints (click/view/signup) in the 7 days strictly
    before it: 40% to the first touch, 40% to the last, 20% split
    across the middles. Credit is summed per touch event_type.

    Exactness: NO floats anywhere — the split is integer basis points
    with the front-loaded remainder rule (the _ntile_exact device):
    n=1 → 10000; n=2 → 5000/5000; n≥3 → first/last 4000 each, middles
    get 2000 DIV (n−2) with the remainder going to the EARLIEST
    middles, so every conversion's credits sum to exactly 10000 and
    both engines agree bit for bit by integer arithmetic alone.

    Scale: the purchase⋈touch range join is keyed by user_id (uniform;
    the 7-day window bounds the per-purchase fan-out) and the position
    windows partition by purchase — per-conversion groups, never a
    global exchange."""
    ev = EV.with_unix_micros(load_table(spark, sf_dir, "events"))
    week_us = 7 * 86400000000
    purch = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("_u"),
        F.col("event_id").alias("_pid"),
        F.col("_us").alias("_pts"),
    )
    touch = ev.filter(F.col("event_type").isin("click", "view", "signup")).select(
        F.col("user_id").alias("_u"),
        F.col("event_id").alias("_tid"),
        F.col("event_type").alias("touch_type"),
        F.col("_us").alias("_tts"),
    )
    j = purch.join(touch, "_u").filter(
        (F.col("_tts") < F.col("_pts")) & (F.col("_tts") >= F.col("_pts") - week_us)
    )
    w_asc = Window.partitionBy("_pid").orderBy("_tts", "_tid")
    w_cnt = Window.partitionBy("_pid")
    pos = (
        j.withColumn("_r", F.row_number().over(w_asc))
        .withColumn("_n", F.count("*").over(w_cnt))
    )
    n, r = F.col("_n"), F.col("_r")
    mid_n = n - 2
    # middle share: 2000 DIV (n-2) each, remainder 2000 MOD (n-2) goes
    # +1 to the earliest middles (positions 2 .. 1+rem)
    mid_q = (F.lit(2000) - (F.lit(2000) % mid_n)) / mid_n
    mid_rem = F.lit(2000) % mid_n
    credit = (
        F.when(n == 1, F.lit(10000))
        .when(n == 2, F.lit(5000))
        .when((r == 1) | (r == n), F.lit(4000))
        .otherwise(
            mid_q.cast("long") + F.when(r - 1 <= mid_rem, 1).otherwise(0)
        )
    ).cast("long")
    return (
        pos.select("touch_type", credit.alias("_credit"), "_pid")
        .groupBy("touch_type")
        .agg(
            F.sum("_credit").cast("long").alias("credit_bp"),
            F.countDistinct("_pid").cast("long").alias("n_conversions_touched"),
            F.count("*").cast("long").alias("n_touches"),
        )
    )


def q_graph_spectral_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spectral bipartition coordinate (8 fixed rounds of centered,
    grid-snapped power iteration on the random-walk matrix) over the
    10-minute error co-occurrence graph — the embedding/clustering view
    completing the graph tier next to centrality (pagerank/HITS),
    density (k-core), reachability (BFS), partition (components) and
    ancestry (closure). The NOTES round-8 lead ("power-iteration
    spectral embedding, needs a grid-safe normalization design") —
    the design landed on ∞-norm scaling, whose max-of-grid-values is
    exact on any engine. See graph.spectral_coordinate for the full
    determinism contract."""
    from kickstarter_etl_pipeline_spark.operators.graph import (
        cooccurrence_edges,
        spectral_coordinate,
    )

    ev = EV.with_unix_micros(load_table(spark, sf_dir, "events"))
    edges = cooccurrence_edges(ev, event_type="error", bucket_seconds=600)
    return spectral_coordinate(edges, rounds=8).select(
        F.col("id").alias("user_id"), "spectral_x", "side"
    )


def q_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance fuzzy matching over the part-name vocabulary — the
    EDIT-distance member of the similarity family (set overlap =
    Jaccard tiers, bitwise = SimHash, vector = cosine tiers; this adds
    the typo/variant matcher every entity-resolution stack carries).
    Pairs of distinct names sharing their final token (the blocking
    key) within Levenshtein distance 5, with each name's part count.

    Exactness: levenshtein() is a pure integer DP with one standard
    definition (unit insert/delete/substitute) — Spark and DuckDB agree
    exactly, no grid needed; everything else is counts.

    Scale: the name VOCABULARY (not the part table) is the pair space —
    names dedupe first, then block on the last token, so the quadratic
    term is per-block vocabulary density, not data size. The length
    filter |len_a − len_b| ≤ 5 (a Levenshtein lower bound) prunes
    before the DP runs. Hot blocks are the standard ER mitigation
    point (swap the blocking key for a q-gram prefix if a token runs
    hot)."""
    part = load_table(spark, sf_dir, "part")
    names = (
        part.groupBy("p_name")
        .agg(F.count("*").cast("long").alias("_n_parts"))
        .withColumn("_block", F.element_at(F.split("p_name", " "), -1))
        .withColumn("_len", F.length("p_name"))
    )
    a = names.select(
        F.col("p_name").alias("name_a"),
        F.col("_n_parts").alias("n_parts_a"),
        "_block",
        F.col("_len").alias("_la"),
    )
    b = names.select(
        F.col("p_name").alias("name_b"),
        F.col("_n_parts").alias("n_parts_b"),
        "_block",
        F.col("_len").alias("_lb"),
    )
    return (
        a.join(b, "_block")
        .filter(F.col("name_a") < F.col("name_b"))
        .filter(F.abs(F.col("_la") - F.col("_lb")) <= 5)
        .withColumn("lev_dist", F.levenshtein("name_a", "name_b").cast("long"))
        .filter(F.col("lev_dist") <= 5)
        .select("name_a", "name_b", "lev_dist", "n_parts_a", "n_parts_b")
    )


def q_item_cooccurrence_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item co-occurrence over the ORDER basket (the
    collaborative-filtering neighbor table: parts bought together),
    top-50 pairs by support — the item-granularity sibling of
    q_session_basket_lift (which works on the 5 event types). Support,
    each item's order frequency, and lift n_ab·N/(n_a·n_b).

    Exactness: counts are exact longs; lift is one fixed IEEE division
    tree over exact integers (decimal products against 2^53 growth),
    snapped to 6dp; the top-50 cut orders by (support desc, id_a,
    id_b) — a total order, so the LIMIT boundary is deterministic.

    Scale: the pair explode is a self-join keyed by order with
    per-order fan-out bounded by basket size (≤ 7 lines in TPC-H shape
    — lines², not orders²); the aggregate is keyed by part pair
    (uniform); the top-50 is a TakeOrdered, not a global sort."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).distinct()
    a = li.select(F.col("l_orderkey"), F.col("l_partkey").alias("id_a"))
    b = li.select(F.col("l_orderkey"), F.col("l_partkey").alias("id_b"))
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").cast("long").alias("n_both"))
    )
    freq = li.groupBy(F.col("l_partkey")).agg(
        F.count("*").cast("long").alias("_n")
    )
    n_orders = F.broadcast(
        li.select("l_orderkey").distinct().agg(F.count("*").cast("long").alias("_N"))
    )
    # per-part frequency tables grow linearly with sf — no hint; the
    # pair-keyed equi-joins are uniform and AQE picks the strategy.
    fa = freq.select(F.col("l_partkey").alias("id_a"), F.col("_n").alias("n_a"))
    fb = freq.select(F.col("l_partkey").alias("id_b"), F.col("_n").alias("n_b"))
    lift = (
        F.col("n_both").cast("decimal(38,0)") * F.col("_N")
    ).cast("double") / (
        F.col("n_a").cast("decimal(38,0)") * F.col("n_b")
    ).cast("double")
    return (
        pairs.join(fa, "id_a")
        .join(fb, "id_b")
        .crossJoin(n_orders)
        .select(
            "id_a",
            "id_b",
            "n_both",
            "n_a",
            "n_b",
            round_det(lift, 6).alias("lift"),
        )
        .orderBy(F.desc("n_both"), F.asc("id_a"), F.asc("id_b"))
        .limit(50)
    )


def q_scd2_customer_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-Changing-Dimension Type 2 build from history: each
    customer's order-priority timeline collapses into validity episodes
    (valid_from / valid_to / is_current), one row per consecutive run
    of the same priority in (order date, order key) order — the
    classic warehouse dimension-versioning pattern, built set-based
    from the raw history (no per-row MERGE loop; the CDC sibling is
    cdc_apply_agg).

    Exactness: pure integer/date column logic — a run boundary is
    lag(priority) ≠ priority (null-safe), episode ids are a cumulative
    sum of boundary flags, and the episode rollup takes min/max dates
    and count. valid_to is the NEXT episode's valid_from (half-open
    intervals, the standard SCD2 convention); NULL marks the current
    row.

    Scale: two customer-keyed windows + one keyed aggregate — per-
    customer frames, never global."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.col("o_orderdate").cast("date").alias("_d"),
        "o_orderkey",
        F.col("o_orderpriority").alias("priority"),
    )
    w = Window.partitionBy("o_custkey").orderBy("_d", "o_orderkey")
    flagged = orders.withColumn(
        "_new",
        F.when(
            F.lag("priority").over(w).isNull()
            | (F.lag("priority").over(w) != F.col("priority")),
            1,
        ).otherwise(0),
    ).withColumn(
        "_ep",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
    )
    eps = flagged.groupBy("o_custkey", "_ep").agg(
        F.max("priority").alias("priority"),
        F.min("_d").alias("valid_from"),
        F.count("*").cast("long").alias("n_orders"),
    )
    w_ep = Window.partitionBy("o_custkey").orderBy("_ep")
    # dates emitted as formatted strings (engine-neutral comparison —
    # the tumbling_agg convention)
    return eps.select(
        "o_custkey",
        F.col("_ep").alias("version"),
        "priority",
        F.date_format("valid_from", "yyyy-MM-dd").alias("valid_from"),
        F.date_format(F.lead("valid_from").over(w_ep), "yyyy-MM-dd").alias("valid_to"),
        F.lead("valid_from").over(w_ep).isNull().alias("is_current"),
        "n_orders",
    )


def q_capped_running_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running balance floored at zero — the inventory /
    prepaid-credit recurrence b_t = max(0, b_{t-1} + δ_t) (purchases
    SPEND value, every other event earns it). The floor makes the fold
    NON-associative, so no window or prefix-sum can express it — this
    is the canonical case for the sequential-fold device the EWMA query
    introduced, here in PURE INTEGERS (micro-unit deltas; no rounding
    grid needed at all, stronger than the ewma contract). The fold also
    carries the running MAX through a struct accumulator, proving the
    device extends beyond scalar state.

    Scale: one user-keyed collect + per-row JVM expression fold (same
    posture and caveat as events_ewma: window the stream before
    folding at extreme per-user lengths)."""
    ev = EV.with_unix_micros(load_table(spark, sf_dir, "events"))
    delta = F.when(
        F.col("event_type") == "purchase",
        -F.floor(F.col("value") * 1e6 + F.lit(0.5)).cast("long"),
    ).otherwise(F.floor(F.col("value") * 1e6 + F.lit(0.5)).cast("long"))
    grouped = ev.select("user_id", "_us", "event_id", delta.alias("_d")).groupBy(
        "user_id"
    ).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("_us", "event_id", "_d"))),
            lambda s: s._d,
        ).alias("_deltas")
    )
    zero = F.struct(
        F.lit(0).cast("long").alias("b"), F.lit(0).cast("long").alias("m")
    )

    def step(acc, x):
        nb = F.greatest(F.lit(0).cast("long"), acc.b + x)
        return F.struct(nb.alias("b"), F.greatest(acc.m, nb).alias("m"))

    folded = F.aggregate(F.col("_deltas"), zero, step)
    return grouped.select(
        "user_id",
        F.size("_deltas").cast("long").alias("n_events"),
        (folded.b / F.lit(1e6)).alias("final_balance"),
        (folded.m / F.lit(1e6)).alias("max_balance"),
    )


def q_did_estimate_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences estimate of mean order value —
    treatment = odd customer keys, post-period = orders from 1997-01-01
    — the classic quasi-experimental estimator, ENTIRELY in exact
    integers: the four cell means come from the exact floor-division
    device (cents·10000 DIV n), and DiD = (T_post − T_pre) −
    (C_post − C_pre) is integer subtraction of those exact means (no
    float decides anything; the only doubles are the /1e6 display
    casts).

    Scale: one scan, four partial-aggregated cells."""
    orders = load_table(spark, sf_dir, "orders")
    cells = orders.select(
        (F.col("o_custkey") % 2 == 1).alias("treat"),
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("date")).alias("post"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long").alias("_c"),
    ).groupBy("treat", "post").agg(
        F.count("*").cast("long").alias("_n"),
        F.sum(F.col("_c").cast("decimal(38,0)")).alias("_s"),
    )
    s10k = F.col("_s") * 10000
    m6 = ((s10k - s10k % F.col("_n")) / F.col("_n")).cast("long")
    w = cells.select("treat", "post", F.col("_n").alias("n_orders"), m6.alias("_m6"))

    def cell(tr, po, name):
        return F.max(
            F.when((F.col("treat") == tr) & (F.col("post") == po), F.col("_m6"))
        ).alias(name)

    g = w.agg(
        F.sum("n_orders").cast("long").alias("n_orders"),
        cell(True, True, "_tp"),
        cell(True, False, "_tb"),
        cell(False, True, "_cp"),
        cell(False, False, "_cb"),
    )
    return g.select(
        "n_orders",
        (F.col("_tb") / F.lit(1e6)).alias("treat_pre_mean"),
        (F.col("_tp") / F.lit(1e6)).alias("treat_post_mean"),
        (F.col("_cb") / F.lit(1e6)).alias("control_pre_mean"),
        (F.col("_cp") / F.lit(1e6)).alias("control_post_mean"),
        (
            ((F.col("_tp") - F.col("_tb")) - (F.col("_cp") - F.col("_cb")))
            / F.lit(1e6)
        ).alias("did_estimate"),
    )


def q_rolling_wau_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / rolling 7-day WAU / stickiness per day — the product-
    analytics staple. Exact distinct counts (no sketch): each active
    (user, day) pair is exploded into the 7 window-end days it
    supports, then one distinct + one count per (window-end) day —
    turning the sliding DISTINCT (which no window function computes)
    into two uniform aggregates. Only days with any activity are
    emitted, and windows are clipped to the observed span on both
    engines.

    Exactness: pure integer day arithmetic and counts; stickiness =
    one IEEE division snapped at 6dp.

    Scale: the ×7 explode rides above a distinct whose keys are
    (user, day) — uniform; at 100 TB the explode factor is the window
    length, the standard cost of exact sliding distincts (the sketchy
    alternative is the HLL tier)."""
    ev = EV.with_unix_micros(load_table(spark, sf_dir, "events"))
    ud = ev.select(
        "user_id", F.floor(F.col("_us") / F.lit(86400000000)).cast("long").alias("_day")
    ).distinct()
    dau = ud.groupBy("_day").agg(F.countDistinct("user_id").cast("long").alias("dau"))
    span = F.broadcast(ud.agg(F.max("_day").alias("_dmax")))
    expl = (
        ud.crossJoin(span)
        .select(
            "user_id",
            F.explode(
                F.sequence(
                    F.col("_day"), F.least(F.col("_day") + 6, F.col("_dmax"))
                )
            ).alias("_wend"),
        )
        .distinct()
    )
    wau = expl.groupBy(F.col("_wend").alias("_day")).agg(
        F.count("*").cast("long").alias("wau")
    )
    return (
        dau.join(wau, "_day")
        .select(
            F.col("_day").alias("epoch_day"),
            "dau",
            "wau",
            round_det(F.col("dau") / F.col("wau"), 6).alias("stickiness"),
        )
    )


def q_cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curve: users grouped by first-activity
    week, cumulative event value per cohort as the cohort ages (in
    weeks) — the revenue companion to q_cohort_retention's activity
    view; the table behind every LTV-payback chart.

    Exactness: value snaps to micro-unit longs; weekly cells are exact
    integer sums; the cumulative ride is a prefix sum over the
    calendar-bounded (cohort × age) grid; cum LTV per active user =
    exact integer floor division.

    Scale: one user-keyed first-week aggregate, one (cohort, age)
    cell aggregate, prefix windows over the week grid (bounded)."""
    ev = EV.with_unix_micros(load_table(spark, sf_dir, "events"))
    wk = F.floor(F.col("_us") / F.lit(604800000000)).cast("long")
    base = ev.select("user_id", wk.alias("_wk"),
                     F.floor(F.col("value") * 1e6 + F.lit(0.5)).cast("long").alias("_vm"))
    first = base.groupBy("user_id").agg(F.min("_wk").alias("_cohort"))
    cells = (
        base.join(first, "user_id")
        .groupBy("_cohort", (F.col("_wk") - F.col("_cohort")).alias("age_weeks"))
        .agg(
            F.sum("_vm").cast("decimal(38,0)").alias("_v"),
            F.countDistinct("user_id").cast("long").alias("n_active_users"),
        )
    )
    sizes = F.broadcast(
        first.groupBy(F.col("_cohort")).agg(
            F.count("*").cast("long").alias("cohort_size")
        )
    )
    w = Window.partitionBy("_cohort").orderBy("age_weeks").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = cells.withColumn("_cum", F.sum("_v").over(w).cast("decimal(38,0)"))
    # per-user LTV in exact micro-units: floor(_cum / size), then one
    # display division
    per_user_micro = (
        (F.col("_cum") - F.col("_cum") % F.col("cohort_size")) / F.col("cohort_size")
    ).cast("long")
    return cum.join(sizes, "_cohort").select(
        F.col("_cohort").alias("cohort_week"),
        "age_weeks",
        "cohort_size",
        "n_active_users",
        (F.col("_cum").cast("double") / F.lit(1e6)).alias("cum_value"),
        (per_user_micro / F.lit(1e6)).alias("cum_value_per_user"),
    )


def q_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto inventory classification of parts by revenue: rank
    parts by revenue descending, classify A while the cumulative share
    is ≤ 80%, B ≤ 95%, C otherwise — the classification twin of the
    Lorenz-curve view (lorenz_curve_events plots the curve; this
    assigns the classes).

    Exactness: revenue is exact cents; rank AND the cumulative sum
    ride two_phase_rank's range exchange (never a single-partition
    window); the class boundaries are decided on integers —
    5·cum ≤ 4·total and 20·cum ≤ 19·total — so no float places a part.

    Scale: one uniform part-keyed aggregate + the two-phase global
    rank; the grand total is a one-row broadcast."""
    from kickstarter_etl_pipeline_spark.operators.lm_queries import two_phase_rank

    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long"))
        .cast("long")
        .alias("_r")
    )
    ranked = two_phase_rank(rev, [F.desc("_r"), "l_partkey"], cum_col="_r")
    total = F.broadcast(rev.agg(F.sum("_r").cast("long").alias("_tot")))
    j = ranked.crossJoin(total)
    abc = (
        F.when(F.col("cum") * 5 <= F.col("_tot") * 4, F.lit("A"))
        .when(F.col("cum") * 20 <= F.col("_tot") * 19, F.lit("B"))
        .otherwise(F.lit("C"))
    )
    return j.select(
        F.col("l_partkey").alias("p_partkey"),
        (F.col("_r") / F.lit(100.0)).alias("revenue"),
        F.col("rank"),
        abc.alias("abc_class"),
    )


def q_graph_weighted_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source WEIGHTED shortest-path distances (6 fixed
    Bellman-Ford relaxations) over the 10-minute error co-occurrence
    graph, edge weight = max(1, 10000 DIV shared-bucket-count) — the
    more often two users co-err, the closer they sit. Completes the
    graph tier's distance view next to BFS hop counts: pure integer
    min-plus end to end, no rounding device anywhere (the
    kcore-strength contract). The twin is the literal unrolled
    relaxation with MATERIALIZED per-round CTEs (the distance vector
    is referenced twice per round — device 7)."""
    from kickstarter_etl_pipeline_spark.operators.graph import bellman_ford_distances

    ev = EV.with_unix_micros(load_table(spark, sf_dir, "events"))
    nodes = (
        ev.filter(F.col("event_type") == "error")
        .select(
            F.floor(F.col("_us") / F.lit(600000000)).cast("long").alias("_b"),
            "user_id",
        )
        .distinct()
    )
    a = nodes.select("_b", F.col("user_id").alias("u"))
    b = nodes.select("_b", F.col("user_id").alias("v"))
    pairs = (
        a.join(b, "_b")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count("*").cast("long").alias("_cnt"))
    )
    wexpr = F.greatest(
        F.lit(1).cast("long"),
        ((F.lit(10000) - F.lit(10000) % F.col("_cnt")) / F.col("_cnt")).cast("long"),
    )
    wedges = pairs.select("u", "v", wexpr.alias("w"))
    return bellman_ford_distances(wedges, rounds=6).select(
        F.col("id").alias("user_id"), "dist"
    )


def q_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's NATIVE session_window() aggregation (the built-in the
    hand-rolled gaps-and-islands construction replaces at 100 TB
    streaming scale), graded against a gaps-and-islands SQL replay —
    the grade is an equivalence proof between the built-in operator
    and the manual construction, with one documented boundary
    difference: the native window closes when the next event is >= gap
    away (the lag-based rule in events.with_session_ids uses > gap), so
    the twin replays the NATIVE >= rule.

    Output: per (user, session) start time, event count, value sum —
    session start is the window's min event time on both sides."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "user_id",
            F.session_window(F.col("ts").cast("timestamp"), "30 minutes").alias("_w"),
        )
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            "user_id",
            F.date_format("_w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


def q_interpurchase_gap_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p50 / p90 / p99 of the time between a user's consecutive
    purchases — the purchase-latency distribution behind replenishment
    and re-engagement models. percentile_disc semantics: the gap at
    rank ⌈q·n⌉ in ascending (gap, user, ts) order — a total order, so
    the selected element is deterministic; gaps are exact integer
    seconds.

    Scale: gaps come from one user-keyed lag window; the global rank
    rides two_phase_rank's range exchange; each percentile is one
    rank-equality pick against a broadcast count — no global sort ever
    lands on a single task."""
    from kickstarter_etl_pipeline_spark.operators.lm_queries import two_phase_rank

    ev = EV.with_unix_micros(load_table(spark, sf_dir, "events"))
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "_us", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("_us", "event_id")
    gaps = (
        p.withColumn("_prev", F.lag("_us").over(w))
        .filter(F.col("_prev").isNotNull())
        .select(
            F.floor((F.col("_us") - F.col("_prev")) / F.lit(1000000)).cast("long").alias("_gap_s"),
            "user_id",
            "_us",
        )
    )
    ranked = two_phase_rank(gaps, ["_gap_s", "user_id", "_us"])
    n_df = F.broadcast(gaps.agg(F.count("*").cast("long").alias("_n")))
    j = ranked.crossJoin(n_df)
    picks = None
    for label, num, den in (("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100)):
        # rank == ceil(q*n) = (num*n + den - 1) DIV den, exact integers
        target = F.floor((F.col("_n") * num + (den - 1)) / den).cast("long")
        row = j.filter(F.col("rank") == target).select(
            F.lit(label).alias("quantile"),
            F.col("_n").alias("n_gaps"),
            F.col("_gap_s").alias("gap_seconds"),
        )
        picks = row if picks is None else picks.unionByName(row)
    return picks
