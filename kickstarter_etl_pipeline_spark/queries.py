"""Driver contract: named queries + DuckDB oracle SQL twins.

Every implemented operator from SURVEY.md §2 (plus the scale extensions)
is exposed as a named query callable ``(spark, sf_dir) -> DataFrame``
with, where SQL-expressible, an ANSI-SQL twin that DuckDB runs on the
same parquet tables. Aliases and types are kept IDENTICAL on both sides
(the driver hash-compares values column-name-sorted), and every float
produced by arithmetic is rounded the same way in both engines.

Determinism rules used throughout:
- time arithmetic in integer microseconds (exact);
- double aggregates rounded (2-6 dp) in BOTH engines;
- rankings ordered by (rounded value, id) so ties break identically.
"""

from __future__ import annotations

from collections.abc import Callable

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
from kickstarter_etl_pipeline_spark.oracles_ext import ORACLES_EXT
from kickstarter_etl_pipeline_spark.session import ensure_runtime_confs
from kickstarter_etl_pipeline_spark.sources.readers import load_table
from kickstarter_etl_pipeline_spark.streaming.events_stream import streaming_tumbling_counts

from kickstarter_etl_pipeline_spark.plans.tpch_queries import (  # noqa: F401 — registry surface
    q_q1_pricing_summary,
    q_q1_pricing_summary_sql,
    q_q4_order_priority,
    q_q18_large_orders,
    q_q7_nation_volume,
    q_q14_promo_revenue,
    q_q19_or_predicates,
    q_q22_idle_balances,
    q_q2_min_cost_supplier,
    q_q6_forecast_revenue,
    q_q9_product_profit,
    q_q11_important_values,
    q_q12_priority_class,
    q_q15_top_supplier,
    q_q16_supplier_part_counts,
    q_q17_small_qty_revenue,
    q_q20_promo_part_suppliers,
    q_q21_waiting_suppliers,
    q_q8_market_share,
    q_q10_returned_items,
    q_q13_order_count_distribution,
)

from kickstarter_etl_pipeline_spark.operators.analytics_queries import (  # noqa: F401 — registry surface
    q_events_funnel,
    q_cohort_retention,
    q_events_anomaly_zscore,
    q_rfm_segments,
    q_event_transition_matrix,
    q_error_blast_radius,
    q_priority_mode_by_status,
    q_nation_share_of_region,
    q_shipping_priority,
    q_local_supplier_volume,
    q_above_avg_orders,
    q_customers_without_orders,
    q_yoy_customer_activity,
    q_customers_with_orders_count,
    q_custkeys_1998_not_1999,
    q_custkeys_both_years,
    q_price_stats_by_status,
    q_range_join_price_bands,
    q_skew_salted_join,
    q_null_safe_join_agg,
    q_grouping_sets_status_year,
    q_cube_status_priority,
    q_pivot_status_priority,
    q_unpivot_metrics,
    q_corr_price_quantity,
    q_histogram_price,
    q_except_all_priorities,
    q_part_string_ops,
    q_topk_customers,    q_rolling_active_users,
    q_events_ohlc_bars,
    q_events_twap,
    q_gini_by_status,
    q_session_paths,
    q_ab_experiment_report,
    q_chi2_type_by_dow,
    q_exact_quartiles_by_status,
    q_session_basket_lift,
    q_knn_label_vote,
    q_ann_recall_report,
    q_graph_pagerank,
    q_graph_communities,
    q_events_ewma,
    q_traffic_seasonality,
    q_supplier_hhi,
)

from kickstarter_etl_pipeline_spark.plans.warehouse_queries import (  # noqa: F401 — registry surface
    q_cdc_apply_agg,
    q_zorder_layout_report,
    q_pit_priority_revenue,
    q_time_travel_agg,
    q_scd1_merge_agg,
    q_scd2_priority_history,
    q_compaction_roundtrip_agg,
    q_partitioned_prune_agg,
    q_incremental_rollup_agg,
    q_idempotent_append_agg,
    q_dq_star_report,
    q_dq_quarantine_report,
    q_csv_roundtrip_agg,
    q_json_roundtrip_agg,
    q_jsonl_pyds_roundtrip_agg,
    q_range_clustered_prune_agg,
    q_orc_roundtrip_agg,
)

from kickstarter_etl_pipeline_spark.operators.corpus_queries import (  # noqa: F401 — registry surface
    q_source_quota,
    q_length_filter_funnel,
    q_domain_mix_report,
    q_train_val_test_split,
    q_stratified_sample,
    q_hash_sample,
    q_decontaminate_overlap,
    q_token_frequency,
    q_tfidf_top_terms,
    q_repetition_stats,
    q_clean_corpus,
    q_pii_scrub,
    q_oov_rate,
    q_perplexity_proxy,
    q_bpe_token_counts,
    q_doc_fingerprints,
    q_lang_id,
    q_quality_scores,
    q_text_stats,
    q_levenshtein_pairs,
    q_char_jaccard_pairs,
    q_containment_pairs,
    q_semantic_dedup,
    q_bigram_collocations,
    q_seq_length_histogram,
    q_inverted_index,
    q_source_overlap_report,
    q_skipgram_cooccurrence,
    q_curation_decision,
    q_lang_confusion_matrix,
    q_k_anonymity_report,
    q_vocab_growth_curve,
)

QueryFn = Callable[[SparkSession, str], DataFrame]

# ---------------------------------------------------------------------------
# Star schema over the fixtures (FIXTURES.md §B mapping)
# ---------------------------------------------------------------------------

_DIM_STATE_SQL = """
  SELECT CAST(row_number() OVER (ORDER BY state_name) AS INTEGER) AS state_key,
         state_name,
         CAST(CASE WHEN state_name = 'F' THEN 1 ELSE 0 END AS INTEGER) AS is_finished
  FROM (SELECT DISTINCT o_orderstatus AS state_name FROM orders)
"""

_DIM_CATEGORY_SQL = """
  SELECT CAST(row_number() OVER (ORDER BY main_category_name, sub_category_name) AS INTEGER) AS category_key,
         main_category_name, sub_category_name
  FROM (SELECT DISTINCT p_brand AS main_category_name, p_type AS sub_category_name FROM part)
"""

_FACT_SQL = f"""
  WITH dim_state AS ({_DIM_STATE_SQL}),
       dim_category AS ({_DIM_CATEGORY_SQL})
  SELECT l.l_orderkey, l.l_linenumber,
         round(l.l_extendedprice * (1 - l.l_discount), 4) AS revenue,
         round((epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate)) / 86400000000.0, 6) AS ship_delay_days,
         s.state_key, c.category_key,
         CAST(strftime(o.o_orderdate, '%Y%m%d') AS INTEGER) AS order_date_key
  FROM lineitem l
  LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
  LEFT JOIN part p ON l.l_partkey = p.p_partkey
  LEFT JOIN dim_state s ON s.state_name = o.o_orderstatus
  LEFT JOIN dim_category c
         ON c.main_category_name = p.p_brand AND c.sub_category_name = p.p_type
"""


def q_dim_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 + F4-F9: distinct dates with derived attributes (Dim_Date)."""
    return build_dim_date(load_table(spark, sf_dir, "orders"), "o_orderdate")


def q_dim_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 + O1 + A6: distinct → sort → dense surrogate keys (Dim_State)."""
    return tpch_dim_state(load_table(spark, sf_dir, "orders"))


def q_dim_category(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 + O2 + A6: composite-key dimension (Dim_Category)."""
    return tpch_dim_category(load_table(spark, sf_dir, "part"))


def q_fact_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1-J3 + F2 + F9: fully-keyed fact table (Fact_Campaigns analog)."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    return tpch_fact(lineitem, orders, part, tpch_dim_state(orders), tpch_dim_category(part))


def q_star_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: full star build + analytical rollup by state × year."""
    star = tpch_star(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "part"),
    )
    return (
        star.fact.groupBy(
            "state_key",
            F.expr("CAST(order_date_key DIV 10000 AS INT)").alias("order_year"),
        )
        .agg(
            F.count("*").alias("n_items"),
            # revenue is 4-dp-rounded per row → exact as decimal(18,4);
            # exact sum makes the 2-dp rounding engine-independent even
            # when the true total lands on a .005 boundary
            F.round(F.sum(F.col("revenue").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("total_revenue"),
            round_det(F.avg("ship_delay_days"), 4).alias("avg_ship_delay_days"),
        )
        .join(F.broadcast(star.dim_state.select("state_key", "state_name")), "state_key")
        .select("state_name", "order_year", "n_items", "total_revenue", "avg_ship_delay_days")
    )


# ---------------------------------------------------------------------------
# Classic relational operators
# ---------------------------------------------------------------------------


def q_group_count_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: value_counts() — group-count, descending (reference :78)."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n_orders"))
        .orderBy(F.desc("n_orders"), "o_orderstatus")
    )


def q_project_rename_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 + P2 + predicate filter: projection, rename, comparison filter."""
    return (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000)
        .select(
            "c_custkey",
            F.col("c_name").alias("customer_name"),
            F.col("c_mktsegment").alias("segment"),
            "c_acctbal",
        )
    )


def q_conditional_flag_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3: when/otherwise flag (success_flag analog) + aggregate."""
    orders = load_table(spark, sf_dir, "orders")
    flag = F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).cast("int")
    return orders.groupBy(flag.alias("is_finished")).agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )


def q_ship_delay_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 via join: fractional-day difference aggregated per priority."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    delay = F.round(fractional_days("l_shipdate", "o_orderdate"), 6)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey, "inner")
        .select("o_orderpriority", delay.alias("_delay"))
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            round_det(F.avg("_delay"), 6).alias("avg_delay_days"),
            F.round(F.max("_delay"), 6).alias("max_delay_days"),
        )
    )


def q_window_rank_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window row_number: top-3 orders per customer by price."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        orders.withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


def q_window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window running aggregate: cumulative spend per customer over time."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
    )


def q_region_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way broadcast join + ROLLUP grouping sets."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = customer.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    return joined.rollup("r_name", "n_name").agg(
        F.count("*").alias("n_customers"),
        F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
    )


def q_events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    return EV.tumbling_agg(load_table(spark, sf_dir, "events"))


def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return EV.sessionize(load_table(spark, sf_dir, "events"))


def q_events_json_kv(spark: SparkSession, sf_dir: str) -> DataFrame:
    return EV.json_field_agg(load_table(spark, sf_dir, "events"))


def q_events_variant_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props via VariantType (Spark 4): parse_json keeps
    the open-schema payload in the binary variant encoding (no
    schema-on-write like from_json) and variant_get does typed path
    extraction at query time. At 100 TB this is the shredding-free
    ingestion path for heterogeneous event payloads — parse once,
    extract lazily, columnar the whole way. try_variant_get covers the
    absent-path case (NULL, not error)."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.withColumn("_v", F.parse_json("props"))
    return (
        v.select(
            F.variant_get("_v", "$.k", "int").alias("k"),
            F.try_variant_get("_v", "$.missing", "int").alias("missing"),
            "value",
        )
        .groupBy((F.col("k") % 10).alias("k_mod"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.count("missing").alias("n_missing_path"),
        )
    )


def q_events_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming twin of q_events_tumbling (AvailableNow)."""
    return streaming_tumbling_counts(spark, sf_dir)


def q_events_stream_hourly_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHAINED stateful streaming: hourly windowed agg feeding a daily
    windowed agg in ONE query (multiple-stateful-operator support,
    window_time hand-off, append mode). The oracle replays the
    append-mode emission rule: a day row exists iff the day's window
    end is at or below the global watermark (ms-truncated max event
    time − 2 h), so the final partial day stays withheld."""
    from kickstarter_etl_pipeline_spark.streaming.events_stream import (
        streaming_hourly_daily_rollup,
    )

    return streaming_hourly_daily_rollup(spark, sf_dir)


def q_pystream_replay_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom STREAMING connector end-to-end (Python Data Source
    streaming API, sources/python_datasource.py): the events log
    replays through `pyeventlog` in 5 offset-tracked micro-batches
    (initialOffset → latestOffset admission control → row-range
    partitions read executor-side), aggregated in complete mode. Over
    the finite fixture the final table must equal the batch aggregate,
    so any dropped/duplicated micro-batch or mis-sliced partition
    flips the oracle hash."""
    import uuid as _uuid

    from kickstarter_etl_pipeline_spark.scratch import run_scratch_dir
    from kickstarter_etl_pipeline_spark.sources.python_datasource import register

    ensure_runtime_confs(spark)
    register(spark)
    stream = (
        spark.readStream.format("pyeventlog")
        .schema("event_id bigint, user_id bigint, event_type string, value double")
        .option("batches", "5")
        .load(f"{sf_dir}/events.parquet")
    )
    agg = stream.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )
    name = f"pystream_{_uuid.uuid4().hex[:8]}"
    query = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", run_scratch_dir("pyds_stream_ckpt_"))
        .start()
    )
    query.processAllAvailable()
    query.stop()
    return spark.table(name)


def q_events_stream_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming materialized-view maintenance: the update-mode tumbling
    aggregation MERGEd into a warehouse table per micro-batch
    (foreachBatch + merge_upsert) — the rollup always holds the current
    value of every window. Over the finite fixture the final table must
    equal the batch tumbling aggregate, so it shares q_events_tumbling's
    oracle; the multi-batch refine/late-drop contract is covered in
    tests/test_streaming_append_and_jdbc.py."""
    from kickstarter_etl_pipeline_spark.scratch import run_scratch_dir
    from kickstarter_etl_pipeline_spark.streaming.events_stream import stream_upsert_rollup

    root = run_scratch_dir("stream_upsert_")
    rollup = stream_upsert_rollup(
        spark,
        sf_dir,
        root + "/rollup",
        root + "/ckpt",
        path_glob="events.parquet",
    )
    return rollup.select(
        "bucket_start",
        "event_type",
        "n_events",
        "sum_value",
        round_det(F.col("sum_value") / F.col("n_events"), 6).alias("avg_value"),
    )


def q_events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    return EV.sliding_window_agg(load_table(spark, sf_dir, "events"))


def q_events_distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return EV.distinct_user_event_pairs(load_table(spark, sf_dir, "events"))


def q_exact_median_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distributed median of o_totalprice per order status, via
    explicit middle-rank selection — rank rows by value per group, keep
    positions floor((n+1)/2) and floor((n+2)/2), median = (min+max)/2
    of those one-or-two rows. No percentile interpolation semantics to
    disagree on across engines: every step is rank arithmetic plus one
    fixed IEEE expression, so the oracle is exact.

    Scale note: the per-group rank is a groupwise sort — the exact
    tier. At 100 TB the scale path is approx_percentile
    (q_approx_aggregates); this operator is what you verify it
    against."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    ranked = orders.select(
        "o_orderstatus",
        "o_totalprice",
        F.row_number().over(w).alias("_rn"),
        F.count("*").over(Window.partitionBy("o_orderstatus")).alias("_n"),
    )
    mid = ranked.filter(
        (F.col("_rn") == F.floor((F.col("_n") + 1) / 2))
        | (F.col("_rn") == F.floor((F.col("_n") + 2) / 2))
    )
    return mid.groupBy("o_orderstatus").agg(
        F.max("_n").cast("long").alias("n_orders"),
        ((F.min("o_totalprice") + F.max("o_totalprice")) / 2).alias("median_price"),
    )


def q_user_clustering_coeffs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficients over the same error co-occurrence
    graph as q_user_triangle_counts: cc = 2T/(d(d-1)) per user with
    degree >= 2, triangle-free vertices reported as 0.0."""
    from kickstarter_etl_pipeline_spark.operators.graph import (
        clustering_coefficients,
        cooccurrence_edges,
    )

    ev = EV.with_unix_micros(load_table(spark, sf_dir, "events"))
    edges = cooccurrence_edges(ev, event_type="error", bucket_seconds=1800)
    return clustering_coefficients(edges).select(
        F.col("id").alias("user_id"), "degree", "n_triangles", "clustering_coeff"
    )


def q_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 retrieval: int8-quantized scan (exact integer dot products)
    shortlists 20 candidates per query on rounded approximate cosine,
    then exact float rescore re-ranks to top-5 — the production
    scalar-quantization + rescoring pattern, fully oracle'd because the
    quantization grid and both rank orders are engine-deterministic."""
    from kickstarter_etl_pipeline_spark.operators.similarity import quantized_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return quantized_topk(emb, emb.filter(F.col("vec_id") < 20), k=5, shortlist=20)


def q_user_triangle_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed triangle counting (degree-ordered orientation — see
    operators.graph) over the error co-occurrence graph: users
    connected iff they both errored within the same 30-minute bucket.
    Per-user triangle participation + degree; bot-ring / correlated-
    failure detection shape."""
    from kickstarter_etl_pipeline_spark.operators.graph import (
        cooccurrence_edges,
        triangle_counts,
    )

    ev = EV.with_unix_micros(load_table(spark, sf_dir, "events"))
    edges = cooccurrence_edges(ev, event_type="error", bucket_seconds=1800)
    return triangle_counts(edges).select(
        F.col("id").alias("user_id"), "degree", "n_triangles"
    )


def q_events_asof_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's latest prior click."""
    from kickstarter_etl_pipeline_spark.operators.joins import asof_join_backward

    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase")
    clicks = events.filter(F.col("event_type") == "click")
    res = asof_join_backward(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_value_cols=["value"],
        left_id="event_id",
        right_id="event_id",
    )
    return res.select(
        "user_id",
        F.col("event_id").alias("purchase_event_id"),
        F.col("asof_right_id").alias("click_event_id"),
        (F.col("left_ts_us") - F.col("asof_ts_us")).alias("gap_us"),
        F.round("asof_value", 4).alias("click_value"),
    )


def q_events_stateful_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState): gap
    sessionizer with per-key state. With the finite AvailableNow replay
    its emitted sessions equal the batch sessionizer's, so it gets a full
    SQL oracle (closed = every session but the user's last)."""
    from kickstarter_etl_pipeline_spark.streaming.stateful import stateful_sessionize

    return stateful_sessionize(spark, sf_dir)


def q_events_stateful_timeout_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EventTimeTimeout sessionizer (production eviction path) under a
    FULL SQL oracle. With the finite AvailableNow replay the emitted
    rows are exactly: every gap-split session (closed_by_timeout=False)
    plus each user's final session iff the end-of-replay watermark
    (max event-time ms − the 1-minute delay) strictly passed its
    last_event_ms + 30-min gap timer (closed_by_timeout=True); final
    sessions still inside the gap window stay in state, unemitted —
    the bounded-state contract an unbounded 100 TB stream relies on.
    The oracle replays that timer arithmetic in SQL (ms truncation and
    strict <, matching Spark's watermark bookkeeping)."""
    from kickstarter_etl_pipeline_spark.streaming.stateful import (
        stateful_sessionize_with_timeout,
    )

    return stateful_sessionize_with_timeout(spark, sf_dir)


def q_events_stream_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream LEFT OUTER interval join (attribution
    with unattributed conversions) under a FULL SQL oracle. Matched
    pairs equal the batch interval join; a purchase with no in-window
    click emits once with NULL click_id after the global watermark
    passes its event time. The oracle replays Spark's watermark
    bookkeeping: per watermarked column, max event-time ms (truncated)
    minus the 2h delay; GLOBAL watermark = min over both columns (the
    default multipleWatermarkPolicy) — purchases newer than that stay
    buffered at end-of-replay, unemitted."""
    from kickstarter_etl_pipeline_spark.streaming.events_stream import (
        streaming_purchase_click_join,
    )

    return streaming_purchase_click_join(spark, sf_dir, how="left_outer")


def q_events_stream_full_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream FULL OUTER interval join: matched
    attribution pairs, plus unattributed purchases (NULL click) once
    the global watermark passes the purchase's event time, plus
    orphaned clicks (NULL purchase) once it passes the END of the
    click's forward match window (c_ts + lookback) — each side's
    eviction point is where no future match can exist, and the oracle
    replays both."""
    from kickstarter_etl_pipeline_spark.streaming.events_stream import (
        streaming_purchase_click_join,
    )

    return streaming_purchase_click_join(spark, sf_dir, how="full_outer")


def q_events_stream_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session_window streaming aggregation.

    Oracled: complete mode + AvailableNow means the one batch sees every
    event (nothing is ever late against the epoch-initialized watermark
    and complete mode never evicts state), so the final table equals
    batch gaps-and-islands sessionization — the DuckDB twin replays the
    strictly-greater-than-gap split rule Spark's session merge uses."""
    from kickstarter_etl_pipeline_spark.streaming.events_stream import streaming_session_windows

    return streaming_session_windows(spark, sf_dir)


def q_events_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming twin of q_events_sliding (AvailableNow)."""
    from kickstarter_etl_pipeline_spark.streaming.events_stream import streaming_sliding_counts

    return streaming_sliding_counts(spark, sf_dir)


def q_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregates (single + multi column)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.agg(
        F.countDistinct("o_custkey").alias("n_custkeys"),
        F.countDistinct("o_orderstatus", "o_orderpriority").alias("n_status_priority"),
        F.count("*").alias("n_rows"),
    )


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_dedup_groups(load_table(spark, sf_dir, "documents"))


def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ngram_jaccard_pairs(load_table(spark, sf_dir, "documents"), threshold=0.8)


def q_minhash_dedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidates verified with exact Jaccard (scale path).

    Graded against the FULL exact oracle (same SQL as
    ngram_jaccard_pairs, minus n_common): because every candidate is
    exact-verified, the output equals the exact ≥0.8 pair set whenever
    banding recall is 1 — and with b=16 bands of r=4 rows the S-curve
    puts P(miss) ≤ (1-0.8^4)^16 ≈ 2.4e-4 per pair even at the 0.8
    threshold boundary (far lower for the higher-Jaccard pairs the
    fixture contains). Verified equal to the exact tier at sf0.001,
    0.01 and 0.1; the equality invariant is also pinned in pytest."""
    return minhash_dedup_pairs(load_table(spark, sf_dir, "documents"), threshold=0.8)


def q_simhash_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash banding candidates over xxhash64 token hashes (rows-only:
    xxhash64 has no DuckDB twin). The fully-oracle'd sibling is
    q_simhash_md5_candidates."""
    return simhash_candidates(load_table(spark, sf_dir, "documents"))


def q_simhash_md5_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash banding candidates over engine-portable 60-bit md5 token
    hashes — FULLY oracle'd: the whole pipeline (tokenize → md5 hash →
    per-bit ±1 sums → sign pack → 4×15-bit band blocking → Hamming
    distance) is deterministic integer arithmetic any engine replays
    bit-for-bit; see _ORACLES['simhash_md5_candidates']. xxhash64
    (q_simhash_candidates) stays the production tier — JVM-native and
    4 more bits — this twin proves the construction itself right."""
    from kickstarter_etl_pipeline_spark.operators.dedup import md5_token_hash

    return simhash_candidates(
        load_table(spark, sf_dir, "documents"), hash_fn=md5_token_hash, bits=60
    )


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-split sequence packing into 128-token context windows,
    sharded by source (operators.corpus.pack_sequences)."""
    from kickstarter_etl_pipeline_spark.operators.corpus import pack_sequences

    return pack_sequences(load_table(spark, sf_dir, "documents"), context_tokens=128)


def q_source_mixing_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based (sqrt) source-mixing probabilities + expected
    epochs under a 1M-token budget (operators.corpus.source_mixing_weights)."""
    from kickstarter_etl_pipeline_spark.operators.corpus import source_mixing_weights

    return source_mixing_weights(load_table(spark, sf_dir, "documents"))


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking (64-token windows, stride 48) with
    first/last-token witnesses (operators.corpus.chunk_documents)."""
    from kickstarter_etl_pipeline_spark.operators.corpus import chunk_documents

    return chunk_documents(load_table(spark, sf_dir, "documents"))


def q_boilerplate_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document boilerplate share per doc: trigrams appearing in
    ≥5 distinct documents count as boilerplate
    (operators.corpus.boilerplate_stats)."""
    from kickstarter_etl_pipeline_spark.operators.corpus import boilerplate_stats

    return boilerplate_stats(
        load_table(spark, sf_dir, "documents"), n=3, min_doc_freq=5
    )


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload plumbing: mapInPandas feature extraction."""
    return extract_features(documents_as_media(load_table(spark, sf_dir, "documents")))


# ---------------------------------------------------------------------------
# Embeddings: similarity search
# ---------------------------------------------------------------------------


def q_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return brute_force_topk(emb, emb.filter(F.col("vec_id") < 20), k=5)


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-k — FULLY oracle'd: every stage
    (md5-constant hyperplanes, sign bucketing, lowest-|margin|
    multi-probe, exact rounded-cosine re-rank) is deterministic, so
    _ann_lsh_oracle_sql replays the identical pipeline in DuckDB.

    Production recall config: 6 independent 3-plane tables with 2-probe
    multi-probe — measured recall 0.98 vs brute force on the fixture
    (tests/test_scale_paths.py asserts ≥ 0.8). Additional invariants in
    tests/test_ann_partial_oracle.py: emitted pairs ⊆ exact top-2k,
    exact-rescored bit-equal, recall ≥ 0.8 vs exact top-k."""
    emb = load_table(spark, sf_dir, "embeddings")
    return lsh_topk(
        emb, emb.filter(F.col("vec_id") < 20), dim=64, k=5,
        num_planes=3, num_tables=6, n_probe=2,
    )


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (k-means cells + n_probe) approximate top-k (rows-only).
    Partial DuckDB oracle in tests/test_ann_partial_oracle.py: emitted
    pairs ⊆ exact top-2k, exact-rescored bit-equal, recall ≥ 0.5."""
    from kickstarter_etl_pipeline_spark.operators.similarity import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_topk(emb, emb.filter(F.col("vec_id") < 20), k=5, n_clusters=8, n_probe=4)


def q_ann_ivf_anchor_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic anchor-IVF approximate top-k — FULLY oracle'd: the
    index build (anchors = n_cells corpus vectors with smallest
    md5(id)), the nearest-cell assignment, the n_probe cell fan-out and
    the exact rounded-cosine re-rank are all deterministic, so
    _ann_ivf_anchor_oracle_sql replays the identical pipeline in
    DuckDB. The trained (k-means) variant is q_ann_ivf_topk."""
    from kickstarter_etl_pipeline_spark.operators.similarity import ivf_anchor_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_anchor_topk(
        emb, emb.filter(F.col("vec_id") < 20), k=5, n_cells=16, n_probe=4
    )


def q_embedding_near_dup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs (id_a < id_b, sim ≥ 0.9).

    The correctness-tier twin of the LSH-bucketed variant: full pair scan,
    oracle-checkable. The LSH variant is the 100 TB path."""
    from kickstarter_etl_pipeline_spark.operators.partitioning import ensure_min_partitions
    from kickstarter_etl_pipeline_spark.operators.similarity import dot, norm

    emb = load_table(spark, sf_dir, "embeddings")
    a = ensure_min_partitions(
        emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("_va"))
    ).withColumn("_na", norm(F.col("_va")))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("_vb")).withColumn(
        "_nb", norm(F.col("_vb"))
    )
    return (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(
                F.try_divide(dot(F.col("_va"), F.col("_vb")), F.col("_na") * F.col("_nb")), 6
            ).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= 0.9)
    )


def q_approx_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates (HLL distinct, approx quantiles) — rows-only:
    sketch implementations are engine-specific by nature."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.agg(
        F.approx_count_distinct("o_custkey").alias("approx_custkeys"),
        F.round(F.percentile_approx("o_totalprice", F.lit(0.5)), 2).alias("approx_p50"),
    )


def q_events_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead window functions: per-user previous/next event and the
    gap to the previous one in exact integer microseconds."""
    ev = EV.with_unix_micros(load_table(spark, sf_dir, "events"))
    w = Window.partitionBy("user_id").orderBy("_us", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
        (F.col("_us") - F.lag("_us").over(w)).alias("gap_from_prev_us"),
    )


def q_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions on the embedding column: per-vector
    L2 norm via F.aggregate fold — JVM-side, no UDF."""
    emb = load_table(spark, sf_dir, "embeddings")
    sq = F.aggregate(
        F.col("embedding"),
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    return emb.select(
        "vec_id",
        "label",
        F.size("embedding").cast("int").alias("dim"),
        round_det(F.sqrt(sq), 6).alias("l2_norm"),
    )


def q_events_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill: dense hour × event_type grid (sequence +
    explode + broadcast cross join) left-joined to hourly aggregates,
    missing buckets zero-filled. The grid is O(hours × types) regardless
    of event volume, so the pattern holds at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    hours = (
        ev.agg(
            F.date_trunc("hour", F.min("ts")).alias("h0"),
            F.date_trunc("hour", F.max("ts")).alias("h1"),
        )
        .select(F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("bucket"))
    )
    types = ev.select("event_type").distinct()
    grid = hours.crossJoin(types)
    counts = ev.groupBy(F.date_trunc("hour", "ts").alias("bucket"), "event_type").agg(
        F.count("*").alias("_n"), F.round(F.sum("value"), 4).alias("_s")
    )
    return (
        F.broadcast(grid)
        .join(counts, ["bucket", "event_type"], "left")
        .select(
            F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket_start"),
            "event_type",
            F.coalesce("_n", F.lit(0)).cast("long").alias("n_events"),
            F.coalesce("_s", F.lit(0.0)).alias("sum_value"),
        )
    )


def q_window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding ROWS frame: 3-order moving average of spend per customer.
    The frame sum is exact decimal so the average is engine-independent
    regardless of the engines' sliding-accumulation strategies."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, Window.currentRow)
    )
    mov_sum = F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.count("*").over(w).alias("n_in_frame"),
        round_det(mov_sum.cast("double") / F.count("*").over(w), 4).alias("moving_avg_price"),
    )


def q_window_ntile_percent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-distribution windows: ntile/percent_rank/cume_dist per
    order year (partitioned ranking — no single-reducer global sort)."""
    orders = load_table(spark, sf_dir, "orders")
    year = F.year("o_orderdate").cast("int").alias("order_year")
    base = orders.select("o_orderkey", year, "o_totalprice")
    w = Window.partitionBy("order_year").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return base.select(
        "o_orderkey",
        "order_year",
        F.ntile(4).over(w).cast("int").alias("price_quartile"),
        round_det(F.percent_rank().over(w), 6).alias("pct_rank"),
        round_det(F.cume_dist().over(w), 6).alias("cume_dist"),
    )


def q_embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension statistics across the embedding corpus via
    posexplode — the feature-distribution profile (drift/normalization
    check) of an embedding pipeline. Sums are exact integer micro-units
    so the averages are engine-independent."""
    emb = load_table(spark, sf_dir, "embeddings")
    exploded = emb.select(F.posexplode("embedding").alias("_pos", "_val")).select(
        (F.col("_pos") + 1).cast("int").alias("dim_idx"),
        F.col("_val").cast("double").alias("_v"),
    )
    units = F.floor(F.col("_v") * 1_000_000 + 0.5).cast("long")
    return (
        exploded.groupBy("dim_idx")
        .agg(
            F.count("*").alias("n_values"),
            F.sum(units).alias("_sum_units"),
            round_det(F.min("_v"), 6).alias("min_value"),
            round_det(F.max("_v"), 6).alias("max_value"),
        )
        .select(
            "dim_idx",
            "n_values",
            round_det(F.col("_sum_units") / 1_000_000.0 / F.col("n_values"), 6).alias("avg_value"),
            "min_value",
            "max_value",
        )
    )


def q_window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth_value over an unbounded frame: each order row
    carries its customer's first, latest, and second order price (raw
    column values — no float arithmetic, fully deterministic)."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w).alias("latest_price"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
    )


def q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-group resolution: near-dup candidate pairs (word-3-gram
    Jaccard ≥ 0.5) clustered into connected components by iterative
    min-label propagation — the step that turns pairwise similarity
    into keep/drop decisions. Singletons keep their own id."""
    from kickstarter_etl_pipeline_spark.operators.dedup import connected_components

    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=0.5)
    comp = connected_components(
        docs.select("doc_id"),
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")),
        id_col="doc_id",
    )
    sizes = comp.groupBy("component_id").agg(F.count("*").alias("n_members"))
    return comp.join(sizes, on="component_id").select("doc_id", "component_id", "n_members")


def q_dedup_components_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-group resolution on the SAME candidate graph as
    `dedup_components`, but via alternating large-star/small-star edge
    rewriting — O(log n) rounds vs diameter rounds, the variant for
    similarity graphs with long transitive chains. Must produce
    byte-identical groups (same recursive-CTE oracle)."""
    from kickstarter_etl_pipeline_spark.operators.dedup import connected_components_star

    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=0.5)
    comp = connected_components_star(
        docs.select("doc_id"),
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")),
        id_col="doc_id",
    )
    sizes = comp.groupBy("component_id").agg(F.count("*").alias("n_members"))
    return comp.join(sizes, on="component_id").select("doc_id", "component_id", "n_members")


def q_label_centroid_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-separation analytics: per-label embedding centroids and
    the pairwise L2 distance matrix between them — the check you run on
    labeled embeddings before trusting them for retrieval.

    Two order-dependence traps are closed with the quantized-integer
    trick (NOTES.md rule 5 family): per-dimension centroid sums run
    over exact 1e-6-quantized integers (a raw double sum would vary
    with aggregation order), and the across-dimension sum of squared
    centroid deltas is 1e-12-quantized the same way — so both engines
    sqrt the identical exact ratio. Shuffles: one posexplode aggregate
    keyed by (label, dim); the 10×10 centroid matrix is driver-scale."""
    emb = load_table(spark, sf_dir, "embeddings")
    dims = emb.select(
        "label", F.posexplode(F.col("embedding").cast("array<double>")).alias("dim_idx", "v")
    )
    cent = dims.groupBy("label", "dim_idx").agg(
        (
            F.sum(F.floor(F.col("v") * 1_000_000 + 0.5).cast("long")) / 1_000_000.0
            / F.count("*")
        ).alias("c")
    )
    a = cent.select(F.col("label").alias("label_a"), "dim_idx", F.col("c").alias("ca"))
    b = cent.select(F.col("label").alias("label_b"), "dim_idx", F.col("c").alias("cb"))
    sq = F.floor(
        (F.col("ca") - F.col("cb")) * (F.col("ca") - F.col("cb")) * 1e12 + 0.5
    ).cast("long")
    return (
        a.join(b, on="dim_idx")
        .filter(F.col("label_a") < F.col("label_b"))
        .groupBy("label_a", "label_b")
        .agg(round_det(F.sqrt(F.sum(sq).cast("double") / 1e12), 6).alias("l2_dist"))
    )


def q_dedup_canonical_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup OUTPUT artifact: per near-dup component (same candidate
    graph as `dedup_components`), the canonical survivor — longest
    document, doc_id ascending on ties — with how many near-dups it
    absorbs. The left-anti of the corpus against these survivors is the
    drop list; `clean_corpus` composes the equivalent filter inline."""
    from kickstarter_etl_pipeline_spark.operators.dedup import connected_components

    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=0.5)
    comp = connected_components(
        docs.select("doc_id"),
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")),
        id_col="doc_id",
    )
    sized = comp.join(docs.select("doc_id", "n_chars"), on="doc_id")
    w = Window.partitionBy("component_id").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (
        sized.withColumn("_rn", F.row_number().over(w))
        .withColumn("n_members", F.count("*").over(Window.partitionBy("component_id")))
        .filter(F.col("_rn") == 1)
        .select(
            "component_id",
            F.col("doc_id").alias("canonical_doc_id"),
            F.col("n_chars").cast("long").alias("canonical_n_chars"),
            F.col("n_members").cast("long").alias("n_members"),
            (F.col("n_members") - 1).cast("long").alias("n_absorbed"),
        )
    )


def q_distinct_users_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained distinct-user counts per event type:
    three batch folds of mergeable HLL sketch partials
    (sources.sinks.incremental_distinct_rollup) read off as estimates.
    ROWS-ONLY by design: the estimate is DataSketches-specific (DuckDB's
    HLL differs); exact merge-order invariance and a 2% accuracy bound
    are asserted in tests/test_sinks_and_dedup.py."""
    from kickstarter_etl_pipeline_spark.scratch import run_scratch_dir
    from kickstarter_etl_pipeline_spark.sources.sinks import (
        distinct_rollup_estimates,
        incremental_distinct_rollup,
    )

    events = load_table(spark, sf_dir, "events")
    path = run_scratch_dir("hll_rollup_") + "/t"
    for i in range(3):
        rollup = incremental_distinct_rollup(
            spark,
            path,
            events.filter(F.col("event_id") % 3 == i),
            keys=["event_type"],
            distinct_col="user_id",
        )
    return distinct_rollup_estimates(rollup)


def q_embedding_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector int8 quantization profile: scale, quantized checksum,
    max reconstruction error (see operators.similarity.quantization_profile)."""
    from kickstarter_etl_pipeline_spark.operators.similarity import quantization_profile

    emb = load_table(spark, sf_dir, "embeddings")
    return quantization_profile(emb)


# ---------------------------------------------------------------------------
# Contract surface
# ---------------------------------------------------------------------------

# Ordering contract: the grading driver sweeps the FIRST 50 entries of
# this dict. Round-6 rotation: (a) the four entries added late in round
# 5 that have never been driver-graded, (b) the 43 stalest entries
# (last green in round 2, never re-graded since), (c) three round-3
# entries to fill the window. Everything below the fold holds a green
# driver grade from r03/r04/r05 or is declared rows-only. New queries
# added mid-round MUST be inserted at the head of the window (they are
# never-graded) — test_grading_window_invariants enforces this.
_QUERIES: dict[str, QueryFn] = {
    # --- round-6 window: first-grade (never driver-graded with an oracle) ---
    "perplexity_proxy": q_perplexity_proxy,  # FULL oracle as of r6 (was rows-only)
    "k_anonymity_report": q_k_anonymity_report,
    "traffic_seasonality": q_traffic_seasonality,
    "supplier_hhi": q_supplier_hhi,
    "vocab_growth_curve": q_vocab_growth_curve,
    # --- round-6 window: stalest re-grades (last green r02) ---
    "fact_star": q_fact_star,
    "events_stream_tumbling": q_events_stream_tumbling,
    "custkeys_1998_not_1999": q_custkeys_1998_not_1999,
    "pivot_status_priority": q_pivot_status_priority,
    "events_sessionize": q_events_sessionize,
    "events_json_kv": q_events_json_kv,
    "events_sliding": q_events_sliding,
    "events_distinct_pairs": q_events_distinct_pairs,
    "events_asof_purchase_click": q_events_asof_purchase_click,
    "char_jaccard_pairs": q_char_jaccard_pairs,
    "distinct_counts": q_distinct_counts,
    "events_stream_sliding": q_events_stream_sliding,
    "embedding_topk": q_embedding_topk,
    "text_stats": q_text_stats,
    "dim_state": q_dim_state,
    "dim_date": q_dim_date,
    "dim_category": q_dim_category,
    "region_rollup": q_region_rollup,
    "topk_customers": q_topk_customers,
    "shipping_priority": q_shipping_priority,
    "events_tumbling": q_events_tumbling,
    "window_running_sum": q_window_running_sum,
    "local_supplier_volume": q_local_supplier_volume,
    "above_avg_orders": q_above_avg_orders,
    "group_count_ordered": q_group_count_ordered,
    "conditional_flag_agg": q_conditional_flag_agg,
    "ship_delay_by_priority": q_ship_delay_by_priority,
    "window_rank_topn": q_window_rank_topn,
    "cube_status_priority": q_cube_status_priority,
    "price_stats_by_status": q_price_stats_by_status,
    "part_string_ops": q_part_string_ops,
    "csv_roundtrip_agg": q_csv_roundtrip_agg,
    "clean_corpus": q_clean_corpus,
    "q1_pricing_summary_sql": q_q1_pricing_summary_sql,
    "doc_fingerprints": q_doc_fingerprints,
    "lang_id": q_lang_id,
    "quality_scores": q_quality_scores,
    "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
    "multimodal_features": q_multimodal_features,
    "customers_without_orders": q_customers_without_orders,
    "customers_with_orders_count": q_customers_with_orders_count,
    "custkeys_both_years": q_custkeys_both_years,
    "project_rename_filter": q_project_rename_filter,
    # --- round-6 window: r03 re-grades (window fill) ---
    "dedup_components_star": q_dedup_components_star,
    "decontaminate_overlap": q_decontaminate_overlap,
    # ---------------- below the fold: every entry here holds a green
    # driver grade (r03-r05) or is declared rows-only ----------------
    # --- last green r03 ---
    "scd1_merge_agg": q_scd1_merge_agg,
    "idempotent_append_agg": q_idempotent_append_agg,
    "token_frequency": q_token_frequency,
    "stratified_sample": q_stratified_sample,
    "tfidf_top_terms": q_tfidf_top_terms,
    "source_quota": q_source_quota,
    "repetition_stats": q_repetition_stats,
    "embedding_quantization": q_embedding_quantization,
    "skew_salted_join": q_skew_salted_join,
    "q7_nation_volume": q_q7_nation_volume,
    "q14_promo_revenue": q_q14_promo_revenue,
    "q19_or_predicates": q_q19_or_predicates,
    "q22_idle_balances": q_q22_idle_balances,
    "window_moving_avg": q_window_moving_avg,
    "window_ntile_percent": q_window_ntile_percent,
    "unpivot_metrics": q_unpivot_metrics,
    "corr_price_quantity": q_corr_price_quantity,
    "histogram_price": q_histogram_price,
    "except_all_priorities": q_except_all_priorities,
    "bpe_token_counts": q_bpe_token_counts,
    "scd2_priority_history": q_scd2_priority_history,
    "hash_sample": q_hash_sample,
    "levenshtein_pairs": q_levenshtein_pairs,
    "embedding_dim_stats": q_embedding_dim_stats,
    "dedup_components": q_dedup_components,
    "window_first_last": q_window_first_last,
    "json_roundtrip_agg": q_json_roundtrip_agg,
    "orc_roundtrip_agg": q_orc_roundtrip_agg,
    "q8_market_share": q_q8_market_share,
    "q10_returned_items": q_q10_returned_items,
    "q13_order_count_distribution": q_q13_order_count_distribution,
    "dq_star_report": q_dq_star_report,
    # --- last green r04 ---
    "star_flagship": q_star_flagship,
    "q1_pricing_summary": q_q1_pricing_summary,
    "dedup_exact": q_dedup_exact,
    "q2_min_cost_supplier": q_q2_min_cost_supplier,
    "q6_forecast_revenue": q_q6_forecast_revenue,
    "q9_product_profit": q_q9_product_profit,
    "q11_important_values": q_q11_important_values,
    "q12_priority_class": q_q12_priority_class,
    "q15_top_supplier": q_q15_top_supplier,
    "q16_supplier_part_counts": q_q16_supplier_part_counts,
    "q17_small_qty_revenue": q_q17_small_qty_revenue,
    "q20_promo_part_suppliers": q_q20_promo_part_suppliers,
    "q21_waiting_suppliers": q_q21_waiting_suppliers,
    "pii_scrub": q_pii_scrub,
    "oov_rate": q_oov_rate,
    "domain_mix_report": q_domain_mix_report,
    "length_filter_funnel": q_length_filter_funnel,
    "compaction_roundtrip_agg": q_compaction_roundtrip_agg,
    "partitioned_prune_agg": q_partitioned_prune_agg,
    "dq_quarantine_report": q_dq_quarantine_report,
    "incremental_rollup_agg": q_incremental_rollup_agg,
    "events_funnel": q_events_funnel,
    "cohort_retention": q_cohort_retention,
    "priority_mode_by_status": q_priority_mode_by_status,
    "cdc_apply_agg": q_cdc_apply_agg,
    "dedup_canonical_docs": q_dedup_canonical_docs,
    "events_anomaly_zscore": q_events_anomaly_zscore,
    "rfm_segments": q_rfm_segments,
    "train_val_test_split": q_train_val_test_split,
    "event_transition_matrix": q_event_transition_matrix,
    "null_safe_join_agg": q_null_safe_join_agg,
    "nation_share_of_region": q_nation_share_of_region,
    "error_blast_radius": q_error_blast_radius,
    "label_centroid_distances": q_label_centroid_distances,
    "embedding_near_dup_exact": q_embedding_near_dup_exact,
    "range_join_price_bands": q_range_join_price_bands,
    "grouping_sets_status_year": q_grouping_sets_status_year,
    "events_lag_lead": q_events_lag_lead,
    "q4_order_priority": q_q4_order_priority,
    "q18_large_orders": q_q18_large_orders,
    "embedding_norms": q_embedding_norms,
    "events_gap_fill": q_events_gap_fill,
    # --- last green r05 ---
    "events_stateful_sessions": q_events_stateful_sessions,
    "minhash_dedup_pairs": q_minhash_dedup_pairs,
    "events_stateful_timeout_sessions": q_events_stateful_timeout_sessions,
    "events_stream_upsert": q_events_stream_upsert,
    "events_stream_hourly_daily": q_events_stream_hourly_daily,
    "events_stream_left_join": q_events_stream_left_join,
    "events_stream_full_join": q_events_stream_full_join,
    "events_stream_sessions": q_events_stream_sessions,
    "pack_sequences": q_pack_sequences,
    "source_mixing_weights": q_source_mixing_weights,
    "chunk_documents": q_chunk_documents,
    "boilerplate_stats": q_boilerplate_stats,
    "events_variant_stats": q_events_variant_stats,
    "jsonl_pyds_roundtrip_agg": q_jsonl_pyds_roundtrip_agg,
    "pystream_replay_agg": q_pystream_replay_agg,
    "range_clustered_prune_agg": q_range_clustered_prune_agg,
    "yoy_customer_activity": q_yoy_customer_activity,
    "containment_pairs": q_containment_pairs,
    "semantic_dedup": q_semantic_dedup,
    "bigram_collocations": q_bigram_collocations,
    "seq_length_histogram": q_seq_length_histogram,
    "user_triangle_counts": q_user_triangle_counts,
    "inverted_index": q_inverted_index,
    "source_overlap_report": q_source_overlap_report,
    "user_clustering_coeffs": q_user_clustering_coeffs,
    "quantized_topk": q_quantized_topk,
    "zorder_layout_report": q_zorder_layout_report,
    "skipgram_cooccurrence": q_skipgram_cooccurrence,
    "exact_median_by_group": q_exact_median_by_group,
    "rolling_active_users": q_rolling_active_users,
    "events_ohlc_bars": q_events_ohlc_bars,
    "events_twap": q_events_twap,
    "gini_by_status": q_gini_by_status,
    "session_paths": q_session_paths,
    "ab_experiment_report": q_ab_experiment_report,
    "chi2_type_by_dow": q_chi2_type_by_dow,
    "curation_decision": q_curation_decision,
    "exact_quartiles_by_status": q_exact_quartiles_by_status,
    "session_basket_lift": q_session_basket_lift,
    "knn_label_vote": q_knn_label_vote,
    "lang_confusion_matrix": q_lang_confusion_matrix,
    "ann_recall_report": q_ann_recall_report,
    "graph_pagerank": q_graph_pagerank,
    "graph_communities": q_graph_communities,
    "pit_priority_revenue": q_pit_priority_revenue,
    "time_travel_agg": q_time_travel_agg,
    "events_ewma": q_events_ewma,
    "ann_lsh_topk": q_ann_lsh_topk,
    "ann_ivf_anchor_topk": q_ann_ivf_anchor_topk,
    "simhash_md5_candidates": q_simhash_md5_candidates,
    # --- rows-only (no DuckDB oracle; driver records rows-only check) ---
    "simhash_candidates": q_simhash_candidates,
    "distinct_users_rollup": q_distinct_users_rollup,
    "ann_ivf_topk": q_ann_ivf_topk,
    "approx_aggregates": q_approx_aggregates,
}


def queries() -> dict[str, QueryFn]:
    return dict(_QUERIES)


_EN_STOP = "['the','a','of','and','to','is']"
_TOKS = "string_split_regex(lower(trim(text)), '\\s+')"
_NORM = "lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))"

_ORACLES: dict[str, str] = {
    "dim_date": """
        SELECT CAST(strftime(d, '%Y%m%d') AS INTEGER) AS date_key,
               strftime(d, '%Y-%m-%d') AS full_date,
               CAST(year(d) AS INTEGER) AS year,
               CAST(quarter(d) AS INTEGER) AS quarter,
               CAST(month(d) AS INTEGER) AS month,
               CAST(day(d) AS INTEGER) AS day,
               dayname(d) AS day_of_week,
               CAST(CASE WHEN isodow(d) >= 6 THEN 1 ELSE 0 END AS INTEGER) AS is_weekend
        FROM (SELECT DISTINCT CAST(o_orderdate AS DATE) AS d FROM orders)
    """,
    "dim_state": _DIM_STATE_SQL,
    "dim_category": _DIM_CATEGORY_SQL,
    "fact_star": _FACT_SQL,
    "star_flagship": f"""
        WITH dim_state AS ({_DIM_STATE_SQL}), fact AS ({_FACT_SQL})
        SELECT s.state_name,
               CAST(f.order_date_key // 10000 AS INTEGER) AS order_year,
               count(*) AS n_items,
               CAST(round(sum(CAST(f.revenue AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_revenue,
               floor(avg(f.ship_delay_days) * 10000 + 0.5) / 10000.0 AS avg_ship_delay_days
        FROM fact f JOIN dim_state s USING (state_key)
        GROUP BY 1, 2
    """,
    "q1_pricing_summary": """
        SELECT l_returnflag, l_linestatus, sum_qty, sum_base_price, sum_disc_price,
               sum_charge,
               floor(sum_qty / count_order * 1000000 + 0.5) / 1000000.0 AS avg_qty,
               floor(sum_base_price / count_order * 1000000 + 0.5) / 1000000.0 AS avg_price,
               floor(sum_disc / count_order * 1000000 + 0.5) / 1000000.0 AS avg_disc,
               count_order
        FROM (
          SELECT l_returnflag, l_linestatus,
                 round(sum(l_quantity), 4) AS sum_qty,
                 round(sum(l_extendedprice), 2) AS sum_base_price,
                 CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_disc_price,
                 CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_charge,
                 round(sum(l_discount), 4) AS sum_disc,
                 count(*) AS count_order
          FROM lineitem
          WHERE l_shipdate <= TIMESTAMP '2000-06-30 00:00:00'
          GROUP BY l_returnflag, l_linestatus
        )
    """,
    "shipping_priority": """
        SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date, o_orderpriority,
               CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-06-30 00:00:00'
          AND l_shipdate > TIMESTAMP '1998-06-30 00:00:00'
        GROUP BY 1, 2, 3
        ORDER BY revenue DESC, o_orderkey LIMIT 10
    """,
    "local_supplier_volume": """
        SELECT n_name,
               CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
               count(*) AS n_items
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE c_nationkey = s_nationkey AND r_name = 'ASIA'
        GROUP BY n_name
    """,
    "above_avg_orders": """
        SELECT o_orderkey, o_custkey, o_totalprice,
               floor(a * 10000 + 0.5) / 10000.0 AS cust_avg_price
        FROM (
          SELECT o_orderkey, o_custkey, o_totalprice,
                 round(sum(o_totalprice) OVER (PARTITION BY o_custkey), 2)
                   / count(*) OVER (PARTITION BY o_custkey) AS a
          FROM orders
        ) WHERE o_totalprice > a
    """,
    "group_count_ordered": """
        SELECT o_orderstatus, count(*) AS n_orders
        FROM orders GROUP BY o_orderstatus
        ORDER BY n_orders DESC, o_orderstatus
    """,
    "project_rename_filter": """
        SELECT c_custkey, c_name AS customer_name, c_mktsegment AS segment, c_acctbal
        FROM customer WHERE c_acctbal > 5000
    """,
    "conditional_flag_agg": """
        SELECT CAST(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS INTEGER) AS is_finished,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS total_price
        FROM orders GROUP BY 1
    """,
    "ship_delay_by_priority": """
        SELECT o_orderpriority,
               count(*) AS n_items,
               floor(avg(d) * 1000000 + 0.5) / 1000000.0 AS avg_delay_days,
               round(max(d), 6) AS max_delay_days
        FROM (
          SELECT o_orderpriority,
                 round((epoch_us(l_shipdate) - epoch_us(o_orderdate)) / 86400000000.0, 6) AS d
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        ) GROUP BY o_orderpriority
    """,
    "topk_customers": """
        SELECT c_custkey, c_name, total_spend, n_orders
        FROM (
          SELECT o_custkey, round(sum(o_totalprice), 2) AS total_spend, count(*) AS n_orders
          FROM orders GROUP BY o_custkey
        ) JOIN customer ON o_custkey = c_custkey
        ORDER BY total_spend DESC, c_custkey LIMIT 10
    """,
    "window_rank_topn": """
        SELECT o_custkey, o_orderkey, o_totalprice, rn
        FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
          FROM orders
        ) WHERE rn <= 3
    """,
    "window_running_sum": """
        SELECT o_custkey, o_orderkey,
               round(sum(o_totalprice) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend
        FROM orders
    """,
    "customers_without_orders": """
        SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    "customers_with_orders_count": """
        SELECT count(*) AS n_customers FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    "custkeys_1998_not_1999": """
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1998
        EXCEPT
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1999
    """,
    "custkeys_both_years": """
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1998
        INTERSECT
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1999
    """,
    "region_rollup": """
        SELECT r_name, n_name, count(*) AS n_customers, round(sum(c_acctbal), 2) AS total_acctbal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP (r_name, n_name)
    """,
    "pivot_status_priority": """
        SELECT o_orderpriority,
               count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
               count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
               count(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
        FROM orders GROUP BY o_orderpriority
    """,
    "events_tumbling": """
        SELECT bucket_start, event_type, n_events, sum_value,
               floor(sum_value / n_events * 1000000 + 0.5) / 1000000.0 AS avg_value
        FROM (
          SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket_start,
                 event_type, count(*) AS n_events, round(sum(value), 4) AS sum_value
          FROM events GROUP BY 1, 2
        )
    """,
    "events_stateful_sessions": """
        WITH e AS (SELECT user_id, event_id, value, epoch_us(ts) AS us FROM events),
        lagd AS (SELECT *, lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev FROM e),
        flagged AS (SELECT *, CASE WHEN prev IS NULL OR us - prev > 1800000000 THEN 1 ELSE 0 END AS new_s FROM lagd),
        sess AS (SELECT *, CAST(sum(new_s) OVER (
                   PARTITION BY user_id ORDER BY us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id FROM flagged),
        agg AS (SELECT user_id, session_id, count(*) AS n_events,
                       round(sum(value), 4) AS sum_value,
                       max(us) - min(us) AS duration_us
                FROM sess GROUP BY user_id, session_id)
        SELECT user_id, n_events, sum_value, duration_us,
               session_id <> max(session_id) OVER (PARTITION BY user_id) AS closed
        FROM agg
    """,
    # Watermark bookkeeping mirrors Spark: per watermarked column the
    # tracked max event time is ms-TRUNCATED minus the delay; the global
    # watermark is the MIN over both columns; an unmatched left row
    # emits iff its event ms is strictly below that global watermark.
    "events_stream_left_join": """
        WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
        wm AS (SELECT least(
                 (SELECT CAST(floor(max(us) / 1000) AS BIGINT) FROM e WHERE event_type = 'purchase'),
                 (SELECT CAST(floor(max(us) / 1000) AS BIGINT) FROM e WHERE event_type = 'click')
               ) - 7200000 AS wm_ms),
        p AS (SELECT user_id, event_id AS purchase_id, us AS p_us FROM e WHERE event_type = 'purchase'),
        c AS (SELECT user_id AS c_user_id, event_id AS click_id, us AS c_us FROM e WHERE event_type = 'click'),
        m AS (SELECT p.user_id, p.purchase_id, c.click_id, p.p_us
              FROM p LEFT JOIN c ON c.c_user_id = p.user_id
                AND c.c_us <= p.p_us AND c.c_us >= p.p_us - 3600000000)
        SELECT user_id, purchase_id, click_id FROM m
        WHERE click_id IS NOT NULL
           OR CAST(floor(p_us / 1000) AS BIGINT) < (SELECT wm_ms FROM wm)
    """,
    # Full-outer adds the click side: an orphaned click emits iff the
    # watermark passed the END of its forward match window
    # (c_us + lookback) — after that no purchase can ever match it.
    "events_stream_full_join": """
        WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
        wm AS (SELECT least(
                 (SELECT CAST(floor(max(us) / 1000) AS BIGINT) FROM e WHERE event_type = 'purchase'),
                 (SELECT CAST(floor(max(us) / 1000) AS BIGINT) FROM e WHERE event_type = 'click')
               ) - 7200000 AS wm_ms),
        p AS (SELECT user_id, event_id AS purchase_id, us AS p_us FROM e WHERE event_type = 'purchase'),
        c AS (SELECT user_id AS c_user_id, event_id AS click_id, us AS c_us FROM e WHERE event_type = 'click'),
        m AS (SELECT p.user_id, p.purchase_id, c.click_id, p.p_us
              FROM p LEFT JOIN c ON c.c_user_id = p.user_id
                AND c.c_us <= p.p_us AND c.c_us >= p.p_us - 3600000000),
        lefts AS (
          SELECT user_id, purchase_id, click_id FROM m
          WHERE click_id IS NOT NULL
             OR CAST(floor(p_us / 1000) AS BIGINT) < (SELECT wm_ms FROM wm)),
        orphans AS (
          SELECT c.c_user_id AS user_id, CAST(NULL AS BIGINT) AS purchase_id, c.click_id
          FROM c
          WHERE NOT EXISTS (SELECT 1 FROM p
                            WHERE p.user_id = c.c_user_id
                              AND c.c_us <= p.p_us AND c.c_us >= p.p_us - 3600000000)
            AND CAST(floor((c.c_us + 3600000000) / 1000) AS BIGINT) < (SELECT wm_ms FROM wm))
        SELECT * FROM lefts UNION ALL SELECT * FROM orphans
    """,
    # Timer arithmetic mirrors Spark: watermark tracks max event time in
    # TRUNCATED ms minus the 1-min delay; a timer fires iff its
    # last_event_ms + gap_ms is STRICTLY below that watermark.
    "events_stateful_timeout_sessions": """
        WITH e AS (SELECT user_id, event_id, value, epoch_us(ts) AS us FROM events),
        wm AS (SELECT CAST(floor(max(us) / 1000) AS BIGINT) - 60000 AS wm_ms FROM e),
        lagd AS (SELECT *, lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev FROM e),
        flagged AS (SELECT *, CASE WHEN prev IS NULL OR us - prev > 1800000000 THEN 1 ELSE 0 END AS new_s FROM lagd),
        sess AS (SELECT *, CAST(sum(new_s) OVER (
                   PARTITION BY user_id ORDER BY us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id FROM flagged),
        agg AS (SELECT user_id, session_id, count(*) AS n_events,
                       round(sum(value), 4) AS sum_value, max(us) AS last_us
                FROM sess GROUP BY user_id, session_id),
        marked AS (SELECT *, session_id = max(session_id) OVER (PARTITION BY user_id) AS is_last FROM agg)
        SELECT user_id, n_events, sum_value, FALSE AS closed_by_timeout FROM marked WHERE NOT is_last
        UNION ALL
        SELECT user_id, n_events, sum_value, TRUE AS closed_by_timeout
        FROM marked, wm WHERE is_last AND CAST(floor(last_us / 1000) AS BIGINT) + 1800000 < wm_ms
    """,
    "events_sessionize": """
        WITH e AS (SELECT user_id, event_id, value, epoch_us(ts) AS us FROM events),
        lagd AS (SELECT *, lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev FROM e),
        flagged AS (SELECT *, CASE WHEN prev IS NULL OR us - prev > 1800000000 THEN 1 ELSE 0 END AS new_s FROM lagd),
        sess AS (SELECT *, CAST(sum(new_s) OVER (
                   PARTITION BY user_id ORDER BY us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id FROM flagged)
        SELECT user_id, session_id, count(*) AS n_events,
               max(us) - min(us) AS duration_us,
               round(sum(value), 4) AS sum_value
        FROM sess GROUP BY user_id, session_id
    """,
    "events_json_kv": """
        SELECT k, n_events, floor(s / n_events * 1000000 + 0.5) / 1000000.0 AS avg_value
        FROM (
          SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
                 count(*) AS n_events, round(sum(value), 4) AS s
          FROM events GROUP BY 1
        )
    """,
    # Chained stateful streaming (hourly → daily): append-mode emission
    # = a day row exists iff day_end <= global watermark (ms-truncated
    # max event time − 2 h). The final partial day is withheld; every
    # hour of an emitted day is necessarily closed, so the daily rollup
    # aggregates the plain batch hourly table.
    "events_stream_hourly_daily": """
        WITH e AS (SELECT event_type, value, epoch_us(ts) AS us FROM events),
        wm AS (SELECT CAST(floor(max(us) / 1000) AS BIGINT) - 7200000 AS wm_ms FROM e),
        hourly AS (
          SELECT date_trunc('hour', make_timestamp(us)) AS h, event_type,
                 count(*) AS n_events, round(sum(value), 4) AS sum_value
          FROM e GROUP BY 1, 2),
        daily AS (
          SELECT date_trunc('day', h) AS d0, event_type,
                 max(n_events) AS max_hourly_events,
                 CAST(count(*) AS BIGINT) AS n_hours,
                 CAST(sum(n_events) AS BIGINT) AS total_events,
                 round(sum(sum_value), 4) AS total_value
          FROM hourly GROUP BY 1, 2)
        SELECT strftime(d0, '%Y-%m-%d') AS day, event_type,
               max_hourly_events, n_hours, total_events, total_value
        FROM daily, wm
        WHERE epoch_ms(d0 + INTERVAL 1 DAY) <= wm_ms
    """,
    "events_stream_tumbling": """
        SELECT bucket_start, event_type, n_events, sum_value,
               floor(sum_value / n_events * 1000000 + 0.5) / 1000000.0 AS avg_value
        FROM (
          SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket_start,
                 event_type, count(*) AS n_events, round(sum(value), 4) AS sum_value
          FROM events GROUP BY 1, 2
        )
    """,
    "yoy_customer_activity": """
        WITH y96 AS (
          SELECT o_custkey, count(*) AS n_1996 FROM orders
          WHERE EXTRACT(year FROM o_orderdate) = 1996 GROUP BY o_custkey
        ),
        y97 AS (
          SELECT o_custkey, count(*) AS n_1997 FROM orders
          WHERE EXTRACT(year FROM o_orderdate) = 1997 GROUP BY o_custkey
        ),
        j AS (
          SELECT CASE WHEN n_1996 IS NOT NULL AND n_1997 IS NOT NULL THEN 'retained'
                      WHEN n_1996 IS NOT NULL THEN 'churned'
                      ELSE 'new' END AS status,
                 n_1996, n_1997
          FROM y96 FULL OUTER JOIN y97 USING (o_custkey)
        )
        SELECT status, count(*) AS n_customers,
               CAST(sum(coalesce(n_1996, 0)) AS BIGINT) AS orders_1996,
               CAST(sum(coalesce(n_1997, 0)) AS BIGINT) AS orders_1997
        FROM j GROUP BY status
    """,
    "range_clustered_prune_agg": """
        SELECT o_orderstatus, count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS total_price
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
        GROUP BY o_orderstatus
    """,
    "pystream_replay_agg": """
        SELECT event_type, count(*) AS n_events,
               round(sum(value), 4) AS sum_value
        FROM events GROUP BY event_type
    """,
    "events_variant_stats": """
        SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS k_mod,
               count(*) AS n_events,
               round(sum(value), 4) AS sum_value,
               count(CASE WHEN json_extract_string(props, '$.missing') IS NOT NULL THEN 1 END) AS n_missing_path
        FROM events GROUP BY 1
    """,
    # Native session_window, complete mode, AvailableNow: the single
    # batch sees every event (watermark starts at epoch, nothing is
    # late; complete mode never evicts), so the final table equals full
    # batch gaps-and-islands sessionization. Merge rule verified against
    # Spark: events exactly `gap` apart MERGE — a new session starts
    # only when the gap is STRICTLY exceeded (hence `> 1800000000`).
    # window.start = first event ts, window.end = last event ts + gap.
    "events_stream_sessions": """
        WITH e AS (SELECT user_id, event_id, value, epoch_us(ts) AS us FROM events),
        lagd AS (SELECT *, lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev FROM e),
        flagged AS (SELECT *, CASE WHEN prev IS NULL OR us - prev > 1800000000 THEN 1 ELSE 0 END AS new_s FROM lagd),
        sess AS (SELECT *, CAST(sum(new_s) OVER (
                   PARTITION BY user_id ORDER BY us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id FROM flagged)
        SELECT user_id,
               strftime(make_timestamp(min(us)), '%Y-%m-%d %H:%M:%S') AS session_start,
               strftime(make_timestamp(max(us) + 1800000000), '%Y-%m-%d %H:%M:%S') AS session_end,
               count(*) AS n_events,
               round(sum(value), 4) AS sum_value
        FROM sess GROUP BY user_id, session_id
    """,
    "events_sliding": """
        SELECT strftime(make_timestamp(ws), '%Y-%m-%d %H:%M:%S') AS window_start,
               event_type, count(*) AS n_events, round(sum(value), 4) AS sum_value
        FROM (
          SELECT unnest([(epoch_us(ts) // 1800000000) * 1800000000,
                         (epoch_us(ts) // 1800000000) * 1800000000 - 1800000000]) AS ws,
                 event_type, value
          FROM events
        ) GROUP BY 1, 2
    """,
    "events_distinct_pairs": """
        SELECT DISTINCT user_id, event_type FROM events
    """,
    "events_asof_purchase_click": """
        WITH tagged AS (
          SELECT user_id, epoch_us(ts) AS us, 0 AS tag, event_id AS rid,
                 value AS rvalue, NULL::BIGINT AS lid
          FROM events WHERE event_type = 'click'
          UNION ALL
          SELECT user_id, epoch_us(ts), 1, NULL, NULL, event_id
          FROM events WHERE event_type = 'purchase'
        ),
        carried AS (
          SELECT user_id, us, tag, lid,
                 last_value(rid IGNORE NULLS) OVER w AS click_event_id,
                 last_value(CASE WHEN tag = 0 THEN us END IGNORE NULLS) OVER w AS click_us,
                 last_value(rvalue IGNORE NULLS) OVER w AS click_raw
          FROM tagged
          WINDOW w AS (PARTITION BY user_id ORDER BY us, tag, coalesce(rid, lid)
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        )
        SELECT user_id, lid AS purchase_event_id, click_event_id,
               us - click_us AS gap_us, round(click_raw, 4) AS click_value
        FROM carried WHERE tag = 1
    """,
    "distinct_counts": """
        SELECT (SELECT count(DISTINCT o_custkey) FROM orders) AS n_custkeys,
               (SELECT count(*) FROM (SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders)) AS n_status_priority,
               (SELECT count(*) FROM orders) AS n_rows
    """,
    "cube_status_priority": """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS total_price
        FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    "price_stats_by_status": """
        SELECT o_orderstatus, p50, p90,
               round(sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE)
                          / CAST(n * (n - 1) AS DOUBLE)), 4) AS price_stddev,
               min_price, max_price
        FROM (
          SELECT o_orderstatus,
                 round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
                 round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
                 count(*) AS n,
                 sum(CAST(o_totalprice AS DECIMAL(18,2))) AS s1,
                 sum(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(o_totalprice AS DECIMAL(18,2))) AS s2,
                 round(min(o_totalprice), 2) AS min_price,
                 round(max(o_totalprice), 2) AS max_price
          FROM orders GROUP BY o_orderstatus
        )
    """,
    "part_string_ops": """
        SELECT p_partkey, upper(p_name) AS name_upper,
               substring(p_name, 1, 3) AS name_prefix,
               CAST(length(p_name) AS INTEGER) AS name_len,
               concat_ws('/', p_brand, p_type) AS brand_type
        FROM part WHERE p_name LIKE '%widget%'
    """,
    "csv_roundtrip_agg": """
        SELECT o_orderstatus, count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS total_price
        FROM orders GROUP BY o_orderstatus
    """,
    "dedup_exact": f"""
        SELECT md5({_NORM}) AS fingerprint,
               count(*) AS n_copies,
               min(doc_id) AS keeper_id
        FROM documents GROUP BY 1
    """,
    "doc_fingerprints": f"""
        SELECT doc_id, md5({_NORM}) AS fingerprint,
               CASE WHEN length(text) = 0 THEN 0 ELSE
                 list_reduce(
                   list_prepend(0::BIGINT,
                     list_transform(string_split(text, ''), c -> ord(c)::BIGINT)),
                   (a, b) -> (a * 31 + b) % 1000000007)
               END AS rolling_hash
        FROM documents
    """,
    "text_stats": f"""
        SELECT doc_id,
               CAST(length(text) AS BIGINT) AS n_chars_calc,
               CAST(len(toks) AS BIGINT) AS n_tokens,
               CAST(len(list_distinct(toks)) AS BIGINT) AS n_unique_tokens,
               floor(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) / nullif(length(text), 0) * 1000000 + 0.5) / 1000000.0 AS punct_ratio,
               floor(len(list_filter(toks, t -> list_contains({_EN_STOP}, t))) / nullif(len(toks), 0) * 1000000 + 0.5) / 1000000.0 AS stopword_ratio
        FROM (SELECT doc_id, text, {_TOKS} AS toks FROM documents)
    """,
    "lang_id": f"""
        WITH scored AS (
          SELECT doc_id, lang, text,
                 len(list_filter(toks, t -> list_contains(['der','die','das','und','ist','ein'], t))) AS s_de,
                 len(list_filter(toks, t -> list_contains({_EN_STOP}, t))) AS s_en,
                 len(list_filter(toks, t -> list_contains(['el','la','los','de','que','es'], t))) AS s_es,
                 len(list_filter(toks, t -> list_contains(['le','la','les','et','est','une'], t))) AS s_fr
          FROM (SELECT doc_id, lang, text, {_TOKS} AS toks FROM documents)
        )
        SELECT doc_id, lang,
               CASE WHEN length(regexp_replace(text, '[^\\x{{4e00}}-\\x{{9fff}}]', '', 'g')) > 0 THEN 'zh'
                    WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
                    WHEN s_de = greatest(s_de, s_en, s_es, s_fr) THEN 'de'
                    WHEN s_en = greatest(s_de, s_en, s_es, s_fr) THEN 'en'
                    WHEN s_es = greatest(s_de, s_en, s_es, s_fr) THEN 'es'
                    ELSE 'fr' END AS lang_pred
        FROM scored
    """,
    "quality_scores": f"""
        SELECT doc_id,
               floor((
                 (CASE WHEN length(text) >= 100 AND length(text) <= 10000 THEN 1.0 ELSE 0.5 END)
                 * (0.5 + 0.5 * (len(list_distinct(toks)) / nullif(len(toks), 0)))
                 - least(length(regexp_replace(text, '[^.,;:!?]', '', 'g'))
                         / greatest(length(text), 1) * 5, 0.5)
               ) * 1000000 + 0.5) / 1000000.0 AS quality
        FROM (SELECT doc_id, text, {_TOKS} AS toks FROM documents)
    """,
    "ngram_jaccard_pairs": f"""
        WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
        sh AS (SELECT DISTINCT doc_id, s FROM (
                 SELECT doc_id,
                        unnest(list_transform(range(1, len(t) - 1),
                               i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS s
                 FROM toks)),
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
                  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                  GROUP BY 1, 2)
        SELECT id_a, id_b, n_common,
               floor(n_common / (sa.n + sb.n - n_common) * 1000000 + 0.5) / 1000000.0 AS jaccard
        FROM pairs
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE floor(n_common / (sa.n + sb.n - n_common) * 1000000 + 0.5) / 1000000.0 >= 0.8
    """,
    "boilerplate_stats": f"""
        WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
        shl AS (SELECT doc_id, list_distinct(list_transform(range(1, len(t) - 1),
                      i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS sl FROM toks),
        sh AS (SELECT doc_id, unnest(sl) AS s FROM shl),
        dfreq AS (SELECT s, count(*) AS df FROM sh GROUP BY s),
        boiler AS (SELECT doc_id, count(*) AS nb
                   FROM sh JOIN dfreq USING (s) WHERE df >= 5 GROUP BY doc_id)
        SELECT shl.doc_id, CAST(len(sl) AS BIGINT) AS n_shingles,
               CAST(coalesce(nb, 0) AS BIGINT) AS n_boilerplate,
               floor(coalesce(nb, 0) / nullif(len(sl), 0) * 1000000 + 0.5) / 1000000.0
                 AS boilerplate_ratio
        FROM shl LEFT JOIN boiler USING (doc_id)
    """,
    "pack_sequences": f"""
        WITH t AS (SELECT doc_id, source, CAST(len({_TOKS}) AS BIGINT) AS n_tokens FROM documents),
        c AS (SELECT *, sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM t)
        SELECT doc_id, source, n_tokens,
               CAST(floor((cum - n_tokens) / 128) AS BIGINT) AS bin_id,
               CAST((cum - n_tokens) % 128 AS BIGINT) AS bin_offset,
               floor((cum - 1) / 128) > floor((cum - n_tokens) / 128) AS spans_boundary
        FROM c
    """,
    "source_mixing_weights": f"""
        WITH s AS (SELECT source, count(*) AS n_docs,
                          CAST(sum(len({_TOKS})) AS BIGINT) AS n_tokens
                   FROM documents GROUP BY source),
        t AS (SELECT sum(n_tokens) AS tot_tokens, sum(sqrt(n_tokens)) AS tot_weight FROM s)
        SELECT source, n_docs, n_tokens,
               floor(n_tokens / tot_tokens * 1000000 + 0.5) / 1000000.0 AS p_uniform,
               floor(sqrt(n_tokens) / tot_weight * 1000000 + 0.5) / 1000000.0 AS p_sample,
               floor(sqrt(n_tokens) / tot_weight * 1000000 / n_tokens * 1000000 + 0.5) / 1000000.0 AS expected_epochs
        FROM s, t
    """,
    "chunk_documents": f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        n AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n FROM t),
        x AS (SELECT doc_id, toks, n,
                     CASE WHEN n <= 64 THEN 1 ELSE 1 + (n - 64 + 47) // 48 END AS n_chunks FROM n),
        e AS (SELECT doc_id, toks, n, unnest(range(0, n_chunks)) AS chunk_id FROM x)
        SELECT doc_id, chunk_id,
               chunk_id * 48 AS start_tok,
               least(CAST(64 AS BIGINT), n - chunk_id * 48) AS chunk_len,
               toks[chunk_id * 48 + 1] AS first_token,
               toks[chunk_id * 48 + least(CAST(64 AS BIGINT), n - chunk_id * 48)] AS last_token
        FROM e
    """,
    # Exact-verified LSH == the exact pair set when banding recall is 1
    # (see q_minhash_dedup_pairs docstring for the S-curve bound), so the
    # oracle is the exact-tier SQL projected to the minhash output columns.
    "minhash_dedup_pairs": f"""
        WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
        sh AS (SELECT DISTINCT doc_id, s FROM (
                 SELECT doc_id,
                        unnest(list_transform(range(1, len(t) - 1),
                               i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS s
                 FROM toks)),
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
                  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                  GROUP BY 1, 2)
        SELECT id_a, id_b,
               floor(n_common / (sa.n + sb.n - n_common) * 1000000 + 0.5) / 1000000.0 AS jaccard
        FROM pairs
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE floor(n_common / (sa.n + sb.n - n_common) * 1000000 + 0.5) / 1000000.0 >= 0.8
    """,
    "clean_corpus": f"""
        WITH scored AS (
          SELECT doc_id, lang, text, n_chars, toks,
                 len(list_filter(toks, t -> list_contains(['der','die','das','und','ist','ein'], t))) AS s_de,
                 len(list_filter(toks, t -> list_contains({_EN_STOP}, t))) AS s_en,
                 len(list_filter(toks, t -> list_contains(['el','la','los','de','que','es'], t))) AS s_es,
                 len(list_filter(toks, t -> list_contains(['le','la','les','et','est','une'], t))) AS s_fr
          FROM (SELECT doc_id, lang, text, n_chars, {_TOKS} AS toks FROM documents)
        ),
        labeled AS (
          SELECT *,
                 CASE WHEN length(regexp_replace(text, '[^\\x{{4e00}}-\\x{{9fff}}]', '', 'g')) > 0 THEN 'zh'
                      WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
                      WHEN s_de = greatest(s_de, s_en, s_es, s_fr) THEN 'de'
                      WHEN s_en = greatest(s_de, s_en, s_es, s_fr) THEN 'en'
                      WHEN s_es = greatest(s_de, s_en, s_es, s_fr) THEN 'es'
                      ELSE 'fr' END AS lang_pred,
                 floor((
                   (CASE WHEN length(text) >= 100 AND length(text) <= 10000 THEN 1.0 ELSE 0.5 END)
                   * (0.5 + 0.5 * (len(list_distinct(toks)) / nullif(len(toks), 0)))
                   - least(length(regexp_replace(text, '[^.,;:!?]', '', 'g'))
                           / greatest(length(text), 1) * 5, 0.5)
                 ) * 1000000 + 0.5) / 1000000.0 AS quality
          FROM scored
        ),
        filtered AS (SELECT * FROM labeled WHERE lang_pred = 'en' AND quality >= 0.5),
        keepers AS (SELECT min(doc_id) AS doc_id FROM filtered GROUP BY md5({_NORM}))
        SELECT doc_id, lang, quality, n_chars
        FROM filtered WHERE doc_id IN (SELECT doc_id FROM keepers)
    """,
    # identical semantics to q1_pricing_summary — shared below, after the
    # dict literal (the SQL-API variant must hash-match the same oracle)
    "char_jaccard_pairs": f"""
        WITH t AS (SELECT doc_id, {_NORM} AS nt FROM documents),
        sh AS (SELECT DISTINCT doc_id, s FROM (
                 SELECT doc_id,
                        unnest(list_transform(range(1, length(nt) - 3),
                               i -> substring(nt, i, 5))) AS s
                 FROM t WHERE length(nt) >= 5)),
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
                  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                  GROUP BY 1, 2)
        SELECT id_a, id_b, n_common,
               floor(n_common / (sa.n + sb.n - n_common) * 1000000 + 0.5) / 1000000.0 AS jaccard
        FROM pairs
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE floor(n_common / (sa.n + sb.n - n_common) * 1000000 + 0.5) / 1000000.0 >= 0.8
    """,
    "multimodal_features": """
        SELECT doc_id AS media_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               md5(text) AS payload_md5
        FROM documents
    """,
    "embedding_near_dup_exact": """
        WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round(list_cosine_similarity(a.e, b.e), 6) AS cosine_sim
        FROM v a JOIN v b ON a.vec_id < b.vec_id
        WHERE round(list_cosine_similarity(a.e, b.e), 6) >= 0.9
    """,
    "embedding_topk": """
        WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
                   FROM embeddings WHERE vec_id < 20),
        c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
        scored AS (SELECT query_id, neighbor_id,
                          round(list_cosine_similarity(qv, cv), 6) AS cosine_sim
                   FROM q, c WHERE neighbor_id <> query_id),
        ranked AS (SELECT *, CAST(row_number() OVER (
                     PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id) AS INTEGER) AS rank
                   FROM scored)
        SELECT query_id, neighbor_id, cosine_sim, rank FROM ranked WHERE rank <= 5
    """,
    "range_join_price_bands": """
        SELECT band, count(*) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        FROM orders
        JOIN (VALUES ('A_budget', 0.0, 50000.0),
                     ('B_mid', 50000.0, 150000.0),
                     ('C_high', 150000.0, 300000.0),
                     ('D_jumbo', 300000.0, 1e12)) bands(band, lo, hi)
          ON o_totalprice >= lo AND o_totalprice < hi
        GROUP BY band
    """,
    "grouping_sets_status_year": """
        SELECT o_orderstatus, order_year, count(*) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
               CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
               CAST(GROUPING(order_year) AS INTEGER) AS g_year
        FROM (SELECT o_orderstatus, CAST(year(o_orderdate) AS INTEGER) AS order_year,
                     o_totalprice
              FROM orders)
        GROUP BY GROUPING SETS ((o_orderstatus), (order_year), ())
    """,
    "events_lag_lead": """
        SELECT user_id, event_id, event_type,
               lag(event_type) OVER w AS prev_type,
               lead(event_type) OVER w AS next_type,
               epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_from_prev_us
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    """,
    "q4_order_priority": """
        SELECT o_orderpriority, count(*) AS n_orders
        FROM orders o
        WHERE EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        GROUP BY o_orderpriority
    """,
    "q18_large_orders": """
        WITH big AS (
          SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS qty
          FROM lineitem GROUP BY l_orderkey HAVING qty > 250
        )
        SELECT c_custkey, c_name, o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS order_date,
               o_totalprice, CAST(qty AS DOUBLE) AS sum_qty
        FROM big
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
    """,
    "embedding_norms": """
        SELECT vec_id, label, CAST(len(embedding) AS INTEGER) AS dim,
               floor(sqrt(list_reduce(
                       list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                       (a, b) -> a + b)) * 1000000 + 0.5) / 1000000.0 AS l2_norm
        FROM embeddings
    """,
    "events_gap_fill": """
        WITH bounds AS (SELECT date_trunc('hour', min(ts)) AS h0,
                               date_trunc('hour', max(ts)) AS h1 FROM events),
        grid AS (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS bucket FROM bounds),
        types AS (SELECT DISTINCT event_type FROM events),
        counts AS (SELECT date_trunc('hour', ts) AS bucket, event_type,
                          count(*) AS n, round(sum(value), 4) AS s
                   FROM events GROUP BY 1, 2)
        SELECT strftime(g.bucket, '%Y-%m-%d %H:%M:%S') AS bucket_start, t.event_type,
               coalesce(n, 0) AS n_events, coalesce(s, 0.0) AS sum_value
        FROM grid g
        CROSS JOIN types t
        LEFT JOIN counts c ON c.bucket = g.bucket AND c.event_type = t.event_type
    """,
    "skew_salted_join": """
        WITH tagged AS (
          SELECT CASE WHEN l_orderkey % 10 <> 0 THEN 0 ELSE l_orderkey END AS skew_key,
                 l_extendedprice
          FROM lineitem
        ),
        dim AS (SELECT DISTINCT skew_key,
                       CASE WHEN skew_key = 0 THEN 'hot' ELSE 'cold' END AS key_class
                FROM tagged)
        SELECT key_class, count(*) AS n_items,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        FROM tagged JOIN dim USING (skew_key)
        GROUP BY key_class
    """,
    "q7_nation_volume": """
        SELECT n2.n_name AS supp_nation, n1.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INTEGER) AS l_year,
               CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
               count(*) AS n_items
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE n1.n_name <> n2.n_name
        GROUP BY 1, 2, 3
    """,
    "pii_scrub": """
        WITH salted AS (
          SELECT doc_id,
                 text || ' contact user' || CAST(doc_id AS VARCHAR) || '@mail-' || source || '.com or https://'
                      || source || '.example.org/d/' || CAST(doc_id AS VARCHAR)
                      || CASE WHEN doc_id % 2 = 0
                              THEN ' tel 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                              ELSE '' END AS t0
          FROM documents),
        staged AS (
          SELECT doc_id, t0,
                 regexp_replace(t0, 'https?://[^\\s]+', '<URL>', 'g') AS t1
          FROM salted),
        staged2 AS (
          SELECT doc_id, t0, t1,
                 regexp_replace(t1, '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}', '<EMAIL>', 'g') AS t2
          FROM staged)
        SELECT doc_id,
               CAST(len(regexp_extract_all(t0, 'https?://[^\\s]+')) AS BIGINT) AS n_urls,
               CAST(len(regexp_extract_all(t1, '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}')) AS BIGINT) AS n_emails,
               CAST(len(regexp_extract_all(t2, '555-[0-9]{4}')) AS BIGINT) AS n_phones,
               md5(regexp_replace(t2, '555-[0-9]{4}', '<PHONE>', 'g')) AS scrubbed_md5,
               CAST(length(regexp_replace(t2, '555-[0-9]{4}', '<PHONE>', 'g')) AS BIGINT) AS scrubbed_len
        FROM staged2
    """,
    "oov_rate": f"""
        WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS token FROM documents),
        vocab AS (SELECT token FROM (
            SELECT token, count(*) AS c FROM tok GROUP BY 1
            ORDER BY c DESC, token LIMIT 100)),
        m AS (SELECT t.doc_id,
                     CASE WHEN v.token IS NULL THEN 1 ELSE 0 END AS oov
              FROM tok t LEFT JOIN vocab v USING (token))
        SELECT doc_id, count(*) AS n_tokens,
               CAST(sum(oov) AS BIGINT) AS n_oov,
               floor(CAST(sum(oov) AS BIGINT) / count(*) * 1000000 + 0.5) / 1000000.0 AS oov_ratio
        FROM m GROUP BY 1
    """,
    "domain_mix_report": """
        WITH t AS (SELECT count(*) AS total FROM documents)
        SELECT source, lang, count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS chars_sum,
               floor(count(*) * 100.0 / (SELECT total FROM t) * 1000000 + 0.5) / 1000000.0 AS doc_share_pct
        FROM documents
        GROUP BY 1, 2
    """,
    "length_filter_funnel": """
        SELECT 0 AS stage_idx, 'all_documents' AS stage_name, count(*) AS n_docs,
               CAST(coalesce(sum(n_chars), 0) AS BIGINT) AS chars_sum
        FROM documents
        UNION ALL
        SELECT 1, 'min_100_chars', count(*), CAST(coalesce(sum(n_chars), 0) AS BIGINT)
        FROM documents WHERE n_chars >= 100
        UNION ALL
        SELECT 2, 'latin_lang', count(*), CAST(coalesce(sum(n_chars), 0) AS BIGINT)
        FROM documents WHERE n_chars >= 100 AND lang IN ('en', 'de', 'es', 'fr')
        UNION ALL
        SELECT 3, 'max_500_chars', count(*), CAST(coalesce(sum(n_chars), 0) AS BIGINT)
        FROM documents WHERE n_chars >= 100 AND lang IN ('en', 'de', 'es', 'fr') AND n_chars <= 500
    """,
    "q2_min_cost_supplier": """
        WITH uc AS (SELECT l_partkey, l_suppkey,
                           l_extendedprice / l_quantity AS _uc
                    FROM lineitem),
        ps AS (SELECT l_partkey, l_suppkey, min(_uc) AS supp_cost
               FROM uc GROUP BY 1, 2),
        pm AS (SELECT l_partkey, min(supp_cost) AS best FROM ps GROUP BY 1),
        es AS (SELECT s_suppkey, s_name, n_name
               FROM supplier
               JOIN nation ON s_nationkey = n_nationkey
               JOIN region ON n_regionkey = r_regionkey
               WHERE r_name = 'EUROPE')
        SELECT p_partkey, p_name, s_name, n_name AS supp_nation,
               floor(supp_cost * 1000000 + 0.5) / 1000000.0 AS min_unit_cost
        FROM ps
        JOIN pm USING (l_partkey)
        JOIN part ON l_partkey = p_partkey
        JOIN es ON l_suppkey = s_suppkey
        WHERE supp_cost = best AND p_size <= 10
    """,
    "q6_forecast_revenue": """
        SELECT CAST(round(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
               count(*) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1999-01-01 00:00:00'
          AND l_discount >= 0.02 AND l_discount <= 0.06
          AND l_quantity < 24
    """,
    "q9_product_profit": """
        SELECT n_name AS nation, CAST(year(l_shipdate) AS INTEGER) AS o_year,
               CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                                   - p_retailprice * l_quantity * 0.1 AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_profit,
               count(*) AS n_items
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%widget%'
        GROUP BY 1, 2
    """,
    "q11_important_values": """
        WITH pp AS (SELECT l_partkey, sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS val
                    FROM lineitem GROUP BY 1),
        s AS (SELECT sum(val) AS total, count(*) AS nparts FROM pp)
        SELECT l_partkey AS p_partkey, CAST(round(val, 2) AS DOUBLE) AS part_value
        FROM pp CROSS JOIN s
        WHERE CAST(val AS DOUBLE) > CAST(total AS DOUBLE) * 1.3 / nparts
    """,
    "q12_priority_class": """
        SELECT l_linestatus,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1999-01-01 00:00:00'
        GROUP BY 1
    """,
    "q15_top_supplier": """
        WITH rev AS (SELECT l_suppkey,
                            sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS r
                     FROM lineitem
                     WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
                       AND l_shipdate <  TIMESTAMP '1998-07-01 00:00:00'
                     GROUP BY 1),
        m AS (SELECT max(r) AS mr FROM rev)
        SELECT s_suppkey, s_name, CAST(round(r, 2) AS DOUBLE) AS total_revenue
        FROM rev CROSS JOIN m
        JOIN supplier ON l_suppkey = s_suppkey
        WHERE r = mr
    """,
    "q16_supplier_part_counts": """
        SELECT p_brand, p_type, p_size,
               count(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#15' AND p_type <> 'PROMO'
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY 1, 2, 3
    """,
    "q17_small_qty_revenue": """
        WITH th AS (SELECT l_partkey,
                           0.2 * CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS t
                    FROM lineitem GROUP BY 1)
        SELECT floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 * 10000 + 0.5) / 10000.0 AS avg_yearly,
               count(*) AS n_items
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN th USING (l_partkey)
        WHERE p_brand = 'Brand#3' AND l_quantity < t
    """,
    "q20_promo_part_suppliers": """
        WITH pq AS (SELECT l_suppkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS q
                    FROM lineitem JOIN part ON l_partkey = p_partkey
                    WHERE p_type = 'PROMO'
                      AND l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
                      AND l_shipdate <  TIMESTAMP '1999-01-01 00:00:00'
                    GROUP BY 1),
        s AS (SELECT sum(q) AS total, count(*) AS nsupp FROM pq)
        SELECT s_suppkey, s_name, n_name AS supp_nation,
               CAST(round(q, 2) AS DOUBLE) AS promo_qty
        FROM pq CROSS JOIN s
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE CAST(q AS DOUBLE) > CAST(total AS DOUBLE) * 0.5 / nsupp
    """,
    "q21_waiting_suppliers": """
        WITH po AS (SELECT l_orderkey, l_suppkey,
                           max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS has_ret
                    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                    WHERE o_orderstatus = 'F'
                    GROUP BY 1, 2),
        oo AS (SELECT l_orderkey, count(*) AS n_supp, sum(has_ret) AS n_ret
               FROM po GROUP BY 1)
        SELECT s_suppkey, s_name, count(*) AS numwait
        FROM po
        JOIN oo USING (l_orderkey)
        JOIN supplier ON l_suppkey = s_suppkey
        WHERE has_ret = 1 AND n_supp >= 2 AND n_ret = 1
        GROUP BY 1, 2
    """,
    "q14_promo_revenue": """
        SELECT floor(CAST(promo AS DOUBLE) * 100.0 / CAST(total AS DOUBLE) * 1000000 + 0.5) / 1000000.0 AS promo_revenue_pct,
               CAST(round(total, 2) AS DOUBLE) AS total_revenue,
               n_items
        FROM (
          SELECT sum(CASE WHEN p_type = 'PROMO'
                          THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))
                          ELSE CAST(0 AS DECIMAL(18,6)) END) AS promo,
                 sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS total,
                 count(*) AS n_items
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
            AND l_shipdate <  TIMESTAMP '1998-07-01 00:00:00'
        )
    """,
    "q19_or_predicates": """
        SELECT CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
               count(*) AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#12' AND l_quantity BETWEEN 1 AND 11 AND p_size BETWEEN 1 AND 5)
           OR (p_brand = 'Brand#15' AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 10)
           OR (p_brand = 'Brand#17' AND l_quantity BETWEEN 20 AND 30 AND p_size BETWEEN 1 AND 15)
    """,
    "q22_idle_balances": """
        WITH avg_bal AS (
          SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS a
          FROM customer WHERE c_acctbal > 0
        )
        SELECT c_mktsegment, count(*) AS n_customers,
               CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_balance
        FROM customer, avg_bal
        WHERE c_acctbal > a
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND year(o_orderdate) = 1999)
        GROUP BY c_mktsegment
    """,
    "window_moving_avg": """
        SELECT o_custkey, o_orderkey,
               count(*) OVER w AS n_in_frame,
               floor(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
                     / count(*) OVER w * 10000 + 0.5) / 10000.0 AS moving_avg_price
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
    "window_ntile_percent": """
        SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS order_year,
               CAST(ntile(4) OVER w AS INTEGER) AS price_quartile,
               floor(percent_rank() OVER w * 1000000 + 0.5) / 1000000.0 AS pct_rank,
               floor(cume_dist() OVER w * 1000000 + 0.5) / 1000000.0 AS cume_dist
        FROM orders
        WINDOW w AS (PARTITION BY year(o_orderdate) ORDER BY o_totalprice DESC, o_orderkey)
    """,
    "unpivot_metrics": """
        WITH long AS (
          SELECT 'quantity' AS metric, l_quantity AS value FROM lineitem
          UNION ALL SELECT 'extendedprice', l_extendedprice FROM lineitem
          UNION ALL SELECT 'discount', l_discount FROM lineitem
        )
        SELECT metric, count(*) AS n_values,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM long GROUP BY metric
    """,
    "corr_price_quantity": """
        SELECT l_returnflag, n,
               floor((n * sxy - sx * sy)
                     / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
                     * 1000000 + 0.5) / 1000000.0 AS corr_qty_price
        FROM (
          SELECT l_returnflag, count(*) AS n,
                 CAST(sum(CAST(l_quantity AS DECIMAL(15,2))) AS DOUBLE) AS sx,
                 CAST(sum(CAST(l_extendedprice AS DECIMAL(15,2))) AS DOUBLE) AS sy,
                 CAST(sum(CAST(l_quantity AS DECIMAL(15,2)) * CAST(l_quantity AS DECIMAL(15,2))) AS DOUBLE) AS sxx,
                 CAST(sum(CAST(l_extendedprice AS DECIMAL(15,2)) * CAST(l_extendedprice AS DECIMAL(15,2))) AS DOUBLE) AS syy,
                 CAST(sum(CAST(l_quantity AS DECIMAL(15,2)) * CAST(l_extendedprice AS DECIMAL(15,2))) AS DOUBLE) AS sxy
          FROM lineitem GROUP BY l_returnflag
        )
    """,
    "histogram_price": """
        SELECT CAST(floor(o_totalprice / 25000) AS BIGINT) AS price_bucket,
               count(*) AS n_orders,
               round(min(o_totalprice), 2) AS min_price,
               round(max(o_totalprice), 2) AS max_price
        FROM orders GROUP BY 1
    """,
    "except_all_priorities": """
        SELECT o_orderpriority FROM orders WHERE year(o_orderdate) = 1998
        EXCEPT ALL
        SELECT o_orderpriority FROM orders WHERE year(o_orderdate) = 1999
    """,
    "bpe_token_counts": f"""
        SELECT doc_id,
               CAST(len({_TOKS}) AS BIGINT) AS n_ws_tokens,
               CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_bpeish_tokens
        FROM documents
    """,
    "scd2_priority_history": """
        SELECT o_custkey, o_orderkey, o_orderpriority, o_totalprice,
               strftime(o_orderdate, '%Y-%m-%d') AS effective_from,
               strftime(lead(o_orderdate) OVER w, '%Y-%m-%d') AS effective_to,
               CAST(row_number() OVER w AS INTEGER) AS version,
               CAST(CASE WHEN lead(o_orderdate) OVER w IS NULL THEN 1 ELSE 0 END AS INTEGER) AS is_current
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    "hash_sample": """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        WHERE substring(md5(CAST(o_orderkey AS VARCHAR)), 32, 1) IN ('0','1','2','3')
    """,
    "levenshtein_pairs": f"""
        WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
        sh AS (SELECT DISTINCT doc_id, s FROM (
                 SELECT doc_id,
                        unnest(list_transform(range(1, len(t) - 1),
                               i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS s
                 FROM toks)),
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
                  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                  GROUP BY 1, 2),
        cands AS (
          SELECT id_a, id_b,
                 floor(n_common / (sa.n + sb.n - n_common) * 1000000 + 0.5) / 1000000.0 AS jaccard
          FROM pairs
          JOIN sizes sa ON sa.doc_id = id_a
          JOIN sizes sb ON sb.doc_id = id_b
          WHERE floor(n_common / (sa.n + sb.n - n_common) * 1000000 + 0.5) / 1000000.0 >= 0.5
        )
        SELECT id_a, id_b, jaccard,
               CAST(levenshtein(da.text, db.text) AS BIGINT) AS edit_distance,
               floor((1 - levenshtein(da.text, db.text)
                          / greatest(length(da.text), length(db.text))) * 1000000 + 0.5) / 1000000.0 AS edit_similarity
        FROM cands
        JOIN documents da ON da.doc_id = id_a
        JOIN documents db ON db.doc_id = id_b
    """,
    "dq_star_report": f"""
        WITH dim_state AS ({_DIM_STATE_SQL}),
             dim_category AS ({_DIM_CATEGORY_SQL}),
             fact AS ({_FACT_SQL})
        SELECT
          (SELECT count(*) FROM fact) AS n_fact,
          (SELECT CAST(sum(CASE WHEN state_key IS NULL THEN 1 ELSE 0 END
                         + CASE WHEN category_key IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             FROM fact) AS n_null_fks,
          (SELECT CAST(count(*) - (SELECT count(*) FROM (SELECT DISTINCT l_orderkey, l_linenumber FROM fact)) AS BIGINT)
             FROM fact) AS n_dup_fact_keys,
          (SELECT CAST(count(*) - count(DISTINCT state_name) AS BIGINT) FROM dim_state) AS n_dup_state_names,
          (SELECT CAST(count(*) AS BIGINT) FROM fact
            WHERE state_key IS NOT NULL
              AND state_key NOT IN (SELECT state_key FROM dim_state)) AS n_orphan_state_keys,
          (SELECT CAST(count(*) AS BIGINT) FROM fact
            WHERE category_key IS NOT NULL
              AND category_key NOT IN (SELECT category_key FROM dim_category)) AS n_orphan_category_keys
    """,
    "q8_market_share": """
        SELECT o_year,
               floor(CAST(n5 AS DOUBLE) / CAST(total AS DOUBLE) * 1000000 + 0.5) / 1000000.0 AS mkt_share,
               CAST(round(total, 2) AS DOUBLE) AS region_revenue
        FROM (
          SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
                 sum(CASE WHEN n2.n_name = 'NATION_5'
                          THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))
                          ELSE CAST(0 AS DECIMAL(18,6)) END) AS n5,
                 sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS total
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation n1 ON c_nationkey = n1.n_nationkey
          JOIN nation n2 ON s_nationkey = n2.n_nationkey
          JOIN region ON n1.n_regionkey = r_regionkey
          WHERE r_name = 'ASIA'
          GROUP BY 1
        )
    """,
    "q10_returned_items": """
        SELECT c_custkey, c_name, c_mktsegment,
               CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS lost_revenue,
               count(*) AS n_items
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE l_returnflag = 'R'
        GROUP BY 1, 2, 3
        ORDER BY lost_revenue DESC, c_custkey LIMIT 20
    """,
    "q13_order_count_distribution": """
        SELECT n_orders, count(*) AS n_customers
        FROM (
          SELECT c_custkey, count(o_orderkey) AS n_orders
          FROM customer LEFT JOIN orders ON c_custkey = o_custkey
          GROUP BY c_custkey
        )
        GROUP BY n_orders
    """,
    "window_first_last": """
        SELECT o_custkey, o_orderkey,
               first_value(o_totalprice) OVER w AS first_price,
               last_value(o_totalprice) OVER w AS latest_price,
               nth_value(o_totalprice, 2) OVER w AS second_price
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    "dedup_components": f"""
        WITH RECURSIVE
        toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
        sh AS (SELECT DISTINCT doc_id, s FROM (
                 SELECT doc_id,
                        unnest(list_transform(range(1, len(t) - 1),
                               i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS s
                 FROM toks)),
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        prs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
                FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY 1, 2),
        cands AS (
          SELECT id_a, id_b
          FROM prs
          JOIN sizes sa ON sa.doc_id = id_a
          JOIN sizes sb ON sb.doc_id = id_b
          WHERE floor(n_common / (sa.n + sb.n - n_common) * 1000000 + 0.5) / 1000000.0 >= 0.5
        ),
        edges AS (SELECT id_a AS a, id_b AS b FROM cands
                  UNION ALL SELECT id_b, id_a FROM cands),
        reach(id, comp) AS (
          SELECT doc_id, doc_id FROM documents
          UNION
          SELECT e.a, r.comp FROM edges e JOIN reach r ON e.b = r.id
        ),
        comp AS (SELECT id AS doc_id, min(comp) AS component_id FROM reach GROUP BY id),
        szs AS (SELECT component_id, count(*) AS n_members FROM comp GROUP BY component_id)
        SELECT doc_id, component_id, n_members FROM comp JOIN szs USING (component_id)
    """,
    "label_centroid_distances": """
        WITH dims AS (
          SELECT label,
                 CAST(generate_subscripts(embedding, 1) - 1 AS INTEGER) AS dim_idx,
                 CAST(unnest(embedding) AS DOUBLE) AS v
          FROM embeddings),
        cent AS (
          SELECT label, dim_idx,
                 sum(CAST(floor(v * 1000000 + 0.5) AS BIGINT)) / 1000000.0 / count(*) AS c
          FROM dims GROUP BY 1, 2)
        SELECT a.label AS label_a, b.label AS label_b,
               floor(sqrt(CAST(sum(CAST(floor((a.c - b.c) * (a.c - b.c) * 1e12 + 0.5) AS BIGINT)) AS DOUBLE) / 1e12)
                     * 1000000 + 0.5) / 1000000.0 AS l2_dist
        FROM cent a JOIN cent b ON a.dim_idx = b.dim_idx AND a.label < b.label
        GROUP BY 1, 2
    """,
    "error_blast_radius": """
        WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS us FROM events)
        SELECT a.event_id, a.user_id, count(*) AS n_nearby
        FROM e a JOIN e b
          ON a.user_id = b.user_id
         AND b.event_id <> a.event_id
         AND abs(b.us - a.us) <= 300000000
        WHERE a.event_type = 'error'
        GROUP BY 1, 2
    """,
    "nation_share_of_region": """
        WITH per_nation AS (
          SELECT r_name, n_name, sum(CAST(c_acctbal AS DECIMAL(18,2))) AS bal
          FROM customer
          JOIN nation ON c_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          GROUP BY 1, 2)
        SELECT r_name, n_name,
               CAST(round(bal, 2) AS DOUBLE) AS nation_balance,
               floor(CAST(bal AS DOUBLE) * 100.0
                     / CAST(sum(bal) OVER (PARTITION BY r_name) AS DOUBLE)
                     * 1000000 + 0.5) / 1000000.0 AS pct_of_region
        FROM per_nation
    """,
    "null_safe_join_agg": """
        WITH cust AS (
          SELECT c_custkey, c_acctbal,
                 CASE WHEN c_custkey % 9 = 0 THEN NULL ELSE c_nationkey END AS nk
          FROM customer),
        dim AS (
          SELECT n_nationkey AS nk, n_name AS nation_name FROM nation
          UNION ALL SELECT NULL, 'UNKNOWN')
        SELECT nation_name, count(*) AS n_customers,
               CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE) AS balance_sum
        FROM cust LEFT JOIN dim ON cust.nk IS NOT DISTINCT FROM dim.nk
        GROUP BY 1
    """,
    "train_val_test_split": """
        SELECT doc_id, source,
               CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 31, 2) < 'cc' THEN 'train'
                    WHEN substring(md5(CAST(doc_id AS VARCHAR)), 31, 2) < 'e6' THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    """,
    "event_transition_matrix": """
        WITH seq AS (
          SELECT user_id, event_type,
                 lag(event_type) OVER (PARTITION BY user_id
                                       ORDER BY epoch_us(ts), event_id) AS prev_type
          FROM events),
        counts AS (
          SELECT prev_type, event_type AS next_type, count(*) AS n_transitions
          FROM seq WHERE prev_type IS NOT NULL
          GROUP BY 1, 2),
        totals AS (SELECT prev_type, sum(n_transitions) AS row_total FROM counts GROUP BY 1)
        SELECT prev_type, next_type, n_transitions,
               floor(CAST(n_transitions AS BIGINT) / row_total * 1000000 + 0.5) / 1000000.0 AS p_next
        FROM counts JOIN totals USING (prev_type)
    """,
    "rfm_segments": """
        WITH per_cust AS (
          SELECT o_custkey,
                 max(strftime(o_orderdate, '%Y-%m-%d')) AS last_order_date,
                 count(*) AS frequency,
                 CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS monetary
          FROM orders GROUP BY 1),
        q AS (
          SELECT *,
                 CAST(ntile(4) OVER (ORDER BY last_order_date DESC, o_custkey) AS INTEGER) AS r_quartile,
                 CAST(ntile(4) OVER (ORDER BY frequency DESC, o_custkey) AS INTEGER) AS f_quartile,
                 CAST(ntile(4) OVER (ORDER BY monetary DESC, o_custkey) AS INTEGER) AS m_quartile
          FROM per_cust)
        SELECT o_custkey, last_order_date, frequency, monetary,
               r_quartile, f_quartile, m_quartile,
               CAST(r_quartile AS VARCHAR) || CAST(f_quartile AS VARCHAR) || CAST(m_quartile AS VARCHAR) AS segment
        FROM q
    """,
    "events_anomaly_zscore": """
        WITH hourly AS (
          SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket_start,
                 event_type, count(*) AS n_events
          FROM events GROUP BY 1, 2),
        stats AS (
          SELECT event_type, count(*) AS n, sum(n_events) AS s1,
                 sum(n_events * n_events) AS s2
          FROM hourly GROUP BY 1)
        SELECT event_type, bucket_start, n_events,
               floor((CAST(n_events * n - s1 AS DOUBLE) / n)
                     / sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE))
                     * 10000 + 0.5) / 10000.0 AS zscore
        FROM hourly JOIN stats USING (event_type)
        WHERE n > 1
          AND abs(floor((CAST(n_events * n - s1 AS DOUBLE) / n)
                        / sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE))
                        * 10000 + 0.5) / 10000.0) > 2.0
    """,
    "dedup_canonical_docs": f"""
        WITH RECURSIVE
        toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
        sh AS (SELECT DISTINCT doc_id, s FROM (
                 SELECT doc_id,
                        unnest(list_transform(range(1, len(t) - 1),
                               i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS s
                 FROM toks)),
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        prs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
                FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY 1, 2),
        cands AS (
          SELECT id_a, id_b
          FROM prs
          JOIN sizes sa ON sa.doc_id = id_a
          JOIN sizes sb ON sb.doc_id = id_b
          WHERE floor(n_common / (sa.n + sb.n - n_common) * 1000000 + 0.5) / 1000000.0 >= 0.5
        ),
        edges AS (SELECT id_a AS a, id_b AS b FROM cands
                  UNION ALL SELECT id_b, id_a FROM cands),
        reach(id, comp) AS (
          SELECT doc_id, doc_id FROM documents
          UNION
          SELECT e.a, r.comp FROM edges e JOIN reach r ON e.b = r.id
        ),
        comp AS (SELECT id AS doc_id, min(comp) AS component_id FROM reach GROUP BY id),
        ranked AS (
          SELECT component_id, c.doc_id, n_chars,
                 row_number() OVER (PARTITION BY component_id
                                    ORDER BY n_chars DESC, c.doc_id) AS rn,
                 count(*) OVER (PARTITION BY component_id) AS n_members
          FROM comp c JOIN documents d ON c.doc_id = d.doc_id)
        SELECT component_id, doc_id AS canonical_doc_id,
               CAST(n_chars AS BIGINT) AS canonical_n_chars,
               CAST(n_members AS BIGINT) AS n_members,
               CAST(n_members - 1 AS BIGINT) AS n_absorbed
        FROM ranked WHERE rn = 1
    """,
    "embedding_dim_stats": """
        SELECT dim_idx, count(*) AS n_values,
               floor(sum(CAST(floor(v * 1000000 + 0.5) AS BIGINT)) / 1000000.0
                     / count(*) * 1000000 + 0.5) / 1000000.0 AS avg_value,
               floor(min(v) * 1000000 + 0.5) / 1000000.0 AS min_value,
               floor(max(v) * 1000000 + 0.5) / 1000000.0 AS max_value
        FROM (
          SELECT CAST(generate_subscripts(embedding, 1) AS INTEGER) AS dim_idx,
                 CAST(unnest(embedding) AS DOUBLE) AS v
          FROM embeddings
        )
        GROUP BY dim_idx
    """,
    "token_frequency": f"""
        SELECT token, count(*) AS n_occurrences, count(DISTINCT doc_id) AS n_docs
        FROM (SELECT doc_id, unnest({_TOKS}) AS token FROM documents)
        GROUP BY token
        ORDER BY n_occurrences DESC, token
        LIMIT 100
    """,
    "tfidf_top_terms": f"""
        WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS term FROM documents),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        dfr AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        n AS (SELECT count(DISTINCT doc_id) AS n_corpus FROM documents),
        scored AS (
          SELECT tf.doc_id, tf.term, tf.tf AS tf, dfr.df AS df,
                 floor(tf.tf * n.n_corpus / dfr.df * 1000000 + 0.5) / 1000000.0 AS tfidf
          FROM tf JOIN dfr USING (term) CROSS JOIN n
        )
        SELECT doc_id, term, tf, df, tfidf, term_rank
        FROM (
          SELECT *, CAST(row_number() OVER (
                   PARTITION BY doc_id ORDER BY tfidf DESC, term) AS INTEGER) AS term_rank
          FROM scored
        )
        WHERE term_rank <= 3
    """,
    "repetition_stats": f"""
        WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS token FROM documents),
        pt AS (SELECT doc_id, token, count(*) AS tc FROM tok GROUP BY 1, 2)
        SELECT doc_id,
               CAST(sum(tc) AS BIGINT) AS n_tokens,
               count(*) AS n_unique_tokens,
               CAST(max(tc) AS BIGINT) AS top_token_count,
               floor(CAST(max(tc) AS BIGINT) / CAST(sum(tc) AS BIGINT) * 1000000 + 0.5)
                 / 1000000.0 AS top_token_ratio,
               floor((1.0 - count(*) / CAST(sum(tc) AS BIGINT)) * 1000000 + 0.5)
                 / 1000000.0 AS repetition_ratio
        FROM pt
        GROUP BY doc_id
    """,
    "stratified_sample": """
        SELECT doc_id, source, n_chars
        FROM documents
        WHERE (source IN ('src0','src1','src2','src3','src4')
               AND substring(md5(CAST(doc_id AS VARCHAR)), 32, 1)
                   IN ('0','1','2','3','4','5','6','7'))
           OR (source NOT IN ('src0','src1','src2','src3','src4')
               AND substring(md5(CAST(doc_id AS VARCHAR)), 32, 1) IN ('0','1','2','3'))
    """,
    "source_quota": """
        SELECT doc_id, source, sample_rank
        FROM (
          SELECT doc_id, source,
                 CAST(row_number() OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INTEGER) AS sample_rank
          FROM documents
        )
        WHERE sample_rank <= 5
    """,
    "decontaminate_overlap": f"""
        WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
        sh AS (SELECT DISTINCT doc_id, s FROM (
                 SELECT doc_id,
                        unnest(list_transform(range(1, len(t) - 3),
                               i -> concat_ws(' ', t[i], t[i+1], t[i+2], t[i+3], t[i+4]))) AS s
                 FROM toks))
        SELECT c.doc_id,
               count(DISTINCT c.s) AS n_shared_shingles,
               count(DISTINCT b.doc_id) AS n_bench_docs
        FROM (SELECT * FROM sh WHERE doc_id % 10 != 0) c
        JOIN (SELECT * FROM sh WHERE doc_id % 10 = 0) b ON c.s = b.s
        GROUP BY c.doc_id
    """,
    "cdc_apply_agg": """
        WITH final AS (
          -- carries: even, not updated (mod 4), not deleted (mod 8)
          SELECT o_orderkey, o_totalprice FROM orders
          WHERE o_orderkey % 2 = 0 AND o_orderkey % 4 <> 0
          UNION ALL
          -- updates that survived (mod 4 but the mod-8 delete wins)
          SELECT o_orderkey, o_totalprice + 500.0 FROM orders
          WHERE o_orderkey % 4 = 0 AND o_orderkey % 8 <> 0
          UNION ALL
          -- inserts
          SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 4 = 1
        )
        SELECT count(*) AS n_rows,
               CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_price
        FROM final
    """,
    "priority_mode_by_status": """
        SELECT o_orderstatus, o_orderpriority AS mode_priority, n AS mode_count
        FROM (
          SELECT o_orderstatus, o_orderpriority, count(*) AS n,
                 row_number() OVER (PARTITION BY o_orderstatus
                                    ORDER BY count(*) DESC, o_orderpriority) AS rn
          FROM orders GROUP BY 1, 2)
        WHERE rn = 1
    """,
    "cohort_retention": """
        WITH e AS (SELECT user_id, event_type,
                          CAST(floor(epoch_us(ts) / 604800000000) AS BIGINT) AS wk
                   FROM events),
        cohorts AS (SELECT user_id, min(wk) AS cohort_wk FROM e
                    WHERE event_type = 'signup' GROUP BY 1),
        sizes AS (SELECT cohort_wk, count(*) AS cohort_size FROM cohorts GROUP BY 1),
        active AS (
          SELECT cohort_wk, weeks_since, count(*) AS n_active FROM (
            SELECT DISTINCT e.user_id, cohort_wk, wk - cohort_wk AS weeks_since
            FROM e JOIN cohorts USING (user_id)
            WHERE wk >= cohort_wk)
          GROUP BY 1, 2)
        SELECT cohort_wk, weeks_since, n_active, cohort_size,
               floor(CAST(n_active AS BIGINT) / cohort_size * 1000000 + 0.5) / 1000000.0 AS retention
        FROM active JOIN sizes USING (cohort_wk)
    """,
    "events_funnel": """
        WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        v AS (SELECT user_id, min(us) AS t1 FROM e WHERE event_type = 'view' GROUP BY 1),
        c AS (SELECT e.user_id, min(us) AS t2 FROM e JOIN v USING (user_id)
              WHERE event_type = 'click' AND us >= t1 AND us <= t1 + 3600000000 GROUP BY 1),
        p AS (SELECT e.user_id, min(us) AS t3 FROM e JOIN c USING (user_id)
              WHERE event_type = 'purchase' AND us >= t2 AND us <= t2 + 3600000000 GROUP BY 1)
        SELECT (SELECT count(DISTINCT user_id) FROM e) AS n_users,
               (SELECT count(*) FROM v) AS n_viewed,
               (SELECT count(*) FROM c) AS n_clicked,
               (SELECT count(*) FROM p) AS n_purchased,
               floor(CAST((SELECT count(*) FROM c) AS BIGINT) / (SELECT count(*) FROM v)
                     * 1000000 + 0.5) / 1000000.0 AS view_to_click,
               floor(CAST((SELECT count(*) FROM p) AS BIGINT) / (SELECT count(*) FROM v)
                     * 1000000 + 0.5) / 1000000.0 AS view_to_purchase
    """,
    "dq_quarantine_report": """
        WITH corrupted AS (
          SELECT o_orderkey,
                 CASE WHEN o_orderkey % 7 = 0 THEN -o_totalprice ELSE o_totalprice END AS price,
                 CASE WHEN o_orderkey % 11 = 0 THEN 'X' ELSE o_orderstatus END AS status,
                 CASE WHEN o_orderkey % 13 = 0 THEN NULL ELSE o_orderpriority END AS prio
          FROM orders),
        gated AS (
          SELECT *,
                 CASE WHEN coalesce(price > 0, FALSE) THEN 0 ELSE 1 END AS v_price,
                 CASE WHEN coalesce(status IN ('F','P','O'), FALSE) THEN 0 ELSE 1 END AS v_status,
                 CASE WHEN prio IS NOT NULL THEN 0 ELSE 1 END AS v_prio
          FROM corrupted)
        SELECT count(*) AS n_input,
               CAST(sum(CASE WHEN v_price + v_status + v_prio = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_clean,
               CAST(sum(CASE WHEN v_price + v_status + v_prio > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_quarantined,
               CAST(sum(v_price) AS BIGINT) AS n_viol_price_positive,
               CAST(sum(v_status) AS BIGINT) AS n_viol_status_valid,
               CAST(sum(v_prio) AS BIGINT) AS n_viol_priority_not_null,
               CAST(round(sum(CASE WHEN v_price + v_status + v_prio = 0
                                   THEN CAST(price AS DECIMAL(18,2)) END), 2) AS DOUBLE) AS clean_price_sum
        FROM gated
    """,
    "incremental_rollup_agg": """
        SELECT o_orderpriority, count(*) AS n_orders,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(28,4))), 2) AS DOUBLE) AS total_price,
               floor(CAST(round(sum(CAST(o_totalprice AS DECIMAL(28,4))), 2) AS DOUBLE) / count(*)
                     * 1000000 + 0.5) / 1000000.0 AS avg_price
        FROM orders
        GROUP BY 1
    """,
    "partitioned_prune_agg": """
        SELECT o_orderpriority, count(*) AS n_orders,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_price
        FROM orders
        WHERE year(o_orderdate) = 1998
        GROUP BY 1
    """,
    "idempotent_append_agg": """
        SELECT source, count(*) AS n_docs,
               CAST(sum(doc_id) AS BIGINT) AS id_sum,
               CAST(sum(n_chars) AS BIGINT) AS chars_sum
        FROM documents
        GROUP BY source
    """,
    "scd1_merge_agg": """
        WITH merged AS (
          SELECT o_orderkey, o_totalprice FROM orders
          WHERE o_orderkey % 2 = 0 AND o_orderkey % 4 > 1
          UNION ALL
          SELECT o_orderkey, o_totalprice + 1000.0 FROM orders
          WHERE o_orderkey % 4 <= 1
        )
        SELECT count(*) AS n_rows,
               CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_price
        FROM merged
    """,
    "embedding_quantization": """
        WITH v AS (SELECT vec_id,
                          list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
                   FROM embeddings),
        s AS (SELECT vec_id, vec,
                     list_max(list_transform(vec, x -> abs(x))) AS scale
              FROM v),
        q AS (SELECT vec_id, vec, scale,
                     CASE WHEN scale = 0
                          THEN list_transform(vec, x -> CAST(0 AS BIGINT))
                          ELSE list_transform(vec, x -> CAST(floor(x / scale * 127 + 0.5) AS BIGINT))
                     END AS qv
              FROM s)
        SELECT vec_id,
               floor(scale * 1000000 + 0.5) / 1000000.0 AS scale_q,
               CAST(list_sum(qv) AS BIGINT) AS q_sum,
               CASE WHEN scale = 0 THEN 0.0
                    ELSE floor(list_max(list_transform(range(1, len(qv) + 1),
                               i -> abs(qv[i] * scale / 127 - vec[i]))) * 1000000 + 0.5)
                         / 1000000.0
               END AS max_abs_err
        FROM q
    """,
}


_ORACLES["q1_pricing_summary_sql"] = _ORACLES["q1_pricing_summary"]
# Star-rewriting CC must produce the exact same groups as min-label CC.
_ORACLES["dedup_components_star"] = _ORACLES["dedup_components"]
_ORACLES["events_stream_sliding"] = _ORACLES["events_sliding"]
# The finite-fixture upsert rollup must equal the batch tumbling agg.
_ORACLES["events_stream_upsert"] = _ORACLES["events_tumbling"]
# Compaction must preserve the data exactly — same oracle as the
# idempotent-append round-trip (a plain aggregate over documents).
_ORACLES["compaction_roundtrip_agg"] = _ORACLES["idempotent_append_agg"]
# Format round-trips must reproduce the parquet-sourced aggregate exactly.
_ORACLES["json_roundtrip_agg"] = _ORACLES["csv_roundtrip_agg"]
_ORACLES["orc_roundtrip_agg"] = _ORACLES["csv_roundtrip_agg"]
# Custom Python Data Source connector round-trip: same contract, over
# the documents table.
_ORACLES["jsonl_pyds_roundtrip_agg"] = """
    SELECT source, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(sum(length(text)) AS BIGINT) AS total_text_len,
           count(DISTINCT lang) AS n_langs,
           min(doc_id) AS min_doc_id,
           max(doc_id) AS max_doc_id
    FROM documents GROUP BY source
"""


def _ann_lsh_oracle_sql(dim: int = 64, k: int = 5, num_planes: int = 3, num_tables: int = 6) -> str:
    """FULL DuckDB twin of q_ann_lsh_topk — possible because every stage
    of the LSH pipeline is deterministic: the hyperplanes are md5-derived
    constants (similarity._plane_component), bucketing is pure sign
    arithmetic, multi-probe flips the single lowest-|margin| plane with a
    plane-index tie-break, and the re-scoring is exact rounded cosine.
    The plane matrix is inlined as DOUBLE[] literals (Python float repr
    round-trips exactly), so DuckDB replays the identical bucket → probe
    → candidate → score → rank computation. n_probe is fixed at 2 (one
    bit-flip probe), matching the query wrapper."""
    from kickstarter_etl_pipeline_spark.operators.similarity import _plane_component

    rows = []
    for g in range(num_tables * num_planes):
        comps = ", ".join(repr(_plane_component(g, j)) for j in range(dim))
        rows.append(f"({g // num_planes}, {g % num_planes}, [{comps}]::DOUBLE[])")
    values = ",\n".join(rows)
    kp = num_planes
    return f"""
        WITH planes(tbl, p, pl) AS (VALUES {values}),
        c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
        q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
              FROM embeddings WHERE vec_id < 20),
        cdots AS (SELECT neighbor_id, tbl, p, list_dot_product(cv, pl) AS d
                  FROM c CROSS JOIN planes),
        cbuck AS (SELECT neighbor_id, tbl,
                         CAST(sum(CASE WHEN d >= 0 THEN 1 ELSE 0 END
                                  * (1 << ({kp - 1} - p))) AS BIGINT) AS bucket
                  FROM cdots GROUP BY 1, 2),
        qdots AS (SELECT query_id, tbl, p, list_dot_product(qv, pl) AS d
                  FROM q CROSS JOIN planes),
        qmain AS (SELECT query_id, tbl,
                         CAST(sum(CASE WHEN d >= 0 THEN 1 ELSE 0 END
                                  * (1 << ({kp - 1} - p))) AS BIGINT) AS bucket
                  FROM qdots GROUP BY 1, 2),
        qflip AS (SELECT query_id, tbl, p AS flip_p,
                         row_number() OVER (PARTITION BY query_id, tbl
                                            ORDER BY abs(d), p) AS rn
                  FROM qdots),
        qprobes AS (
            SELECT query_id, tbl, bucket FROM qmain
            UNION ALL
            SELECT m.query_id, m.tbl,
                   CAST(xor(m.bucket, CAST(1 << ({kp - 1} - f.flip_p) AS BIGINT)) AS BIGINT)
            FROM qmain m JOIN qflip f
              ON m.query_id = f.query_id AND m.tbl = f.tbl AND f.rn = 1),
        cand AS (SELECT DISTINCT pr.query_id, cb.neighbor_id
                 FROM qprobes pr JOIN cbuck cb
                   ON pr.tbl = cb.tbl AND pr.bucket = cb.bucket
                 WHERE cb.neighbor_id <> pr.query_id),
        scored AS (SELECT cand.query_id, cand.neighbor_id,
                          round(list_cosine_similarity(q.qv, c.cv), 6) AS cosine_sim
                   FROM cand JOIN q ON cand.query_id = q.query_id
                             JOIN c ON cand.neighbor_id = c.neighbor_id),
        ranked AS (SELECT *, CAST(row_number() OVER (
                     PARTITION BY query_id
                     ORDER BY cosine_sim DESC, neighbor_id) AS INTEGER) AS rank
                   FROM scored)
        SELECT query_id, neighbor_id, cosine_sim, rank FROM ranked WHERE rank <= {k}
    """


_ORACLES["ann_lsh_topk"] = _ann_lsh_oracle_sql()


def _ann_ivf_anchor_oracle_sql(k: int = 5, n_cells: int = 16, n_probe: int = 4) -> str:
    """FULL DuckDB twin of q_ann_ivf_anchor_topk (see
    similarity.ivf_anchor_topk): anchors are the n_cells corpus vectors
    with the lexically-smallest md5(cast(id as string)) (id tie-break),
    cell index = that ordering's rank; corpus rows join their nearest
    cell, queries probe the n_probe nearest (distance then cell-index
    tie-break) on the SAME BIGINT nano-grid squared-L2 Spark uses
    (floor(d2*1e9+0.5) via a sequential list_reduce fold — round
    BEFORE the argmin, ADVICE r5); candidates re-ranked by exact
    rounded cosine."""
    return f"""
        WITH anchors AS (
          SELECT av, rn - 1 AS ci FROM (
            SELECT CAST(embedding AS DOUBLE[]) AS av,
                   row_number() OVER (
                     ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
            FROM embeddings)
          WHERE rn <= {n_cells}),
        c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
        q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
              FROM embeddings WHERE vec_id < 20),
        cass AS (
          SELECT neighbor_id, cv, ci AS cell FROM (
            SELECT c.neighbor_id, c.cv, a.ci,
                   row_number() OVER (PARTITION BY c.neighbor_id
                                      ORDER BY CAST(floor(list_reduce(list_transform(range(1, len(c.cv) + 1), i -> (c.cv[i] - a.av[i]) * (c.cv[i] - a.av[i])), (acc, x) -> acc + x) * 1000000000 + 0.5) AS BIGINT),
                                      a.ci) AS rn
            FROM c CROSS JOIN anchors a)
          WHERE rn = 1),
        qprobe AS (
          SELECT query_id, qv, ci AS cell FROM (
            SELECT q.query_id, q.qv, a.ci,
                   row_number() OVER (PARTITION BY q.query_id
                                      ORDER BY CAST(floor(list_reduce(list_transform(range(1, len(q.qv) + 1), i -> (q.qv[i] - a.av[i]) * (q.qv[i] - a.av[i])), (acc, x) -> acc + x) * 1000000000 + 0.5) AS BIGINT),
                                      a.ci) AS rn
            FROM q CROSS JOIN anchors a)
          WHERE rn <= {n_probe}),
        scored AS (
          SELECT qp.query_id, ca.neighbor_id,
                 round(list_cosine_similarity(qp.qv, ca.cv), 6) AS cosine_sim
          FROM qprobe qp JOIN cass ca ON qp.cell = ca.cell
          WHERE ca.neighbor_id <> qp.query_id),
        ranked AS (SELECT *, CAST(row_number() OVER (
                     PARTITION BY query_id
                     ORDER BY cosine_sim DESC, neighbor_id) AS INTEGER) AS rank
                   FROM scored)
        SELECT query_id, neighbor_id, cosine_sim, rank FROM ranked WHERE rank <= {k}
    """


_ORACLES["ann_ivf_anchor_topk"] = _ann_ivf_anchor_oracle_sql()

# FULL twin of q_simhash_md5_candidates (dedup.with_simhash with
# md5_token_hash/60 bits): token hash = first 15 md5 hex chars as a
# 60-bit integer, per-bit ±1 sums over every token occurrence, sign
# pack, 4×15-bit band blocking, exact Hamming on colliding pairs.
_ORACLES["simhash_md5_candidates"] = r"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
      FROM documents),
    th AS (SELECT doc_id,
                  CAST(concat('0x', substr(md5(tok), 1, 15)) AS BIGINT) AS h
           FROM toks),
    bitsum AS (
      SELECT doc_id, i, sum(CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END) AS s
      FROM th CROSS JOIN (SELECT unnest(range(0, 60)) AS i)
      GROUP BY 1, 2),
    sig AS (
      SELECT doc_id,
             CAST(sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << i) ELSE 0 END)
                  AS BIGINT) AS simhash
      FROM bitsum GROUP BY doc_id),
    banded AS (
      SELECT doc_id, simhash, band, (simhash >> (band * 15)) & 32767 AS chunk
      FROM sig CROSS JOIN (SELECT unnest(range(0, 4)) AS band)),
    pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                      a.simhash AS sa, b.simhash AS sb
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.chunk = b.chunk AND a.doc_id < b.doc_id)
    SELECT id_a, id_b, CAST(bit_count(xor(sa, sb)) AS INTEGER) AS hamming
    FROM pairs
"""


# Round-5 curation/graph/layout oracle twins live in oracles_ext.py
# (VERDICT r04 #8: registry module stays lean); merged here so the
# driver contract is unchanged.
_ORACLES.update(ORACLES_EXT)

# FULL twin of q_ann_recall_report: the two verified pipelines
# (embedding_topk exact, ann_lsh_topk approximate — identical query
# set and k) composed; recall@5 = hits / 5 per query.
_ORACLES["ann_recall_report"] = f"""
    SELECT ex.query_id,
           CAST(count(l.neighbor_id) AS BIGINT) AS n_hits,
           floor(count(l.neighbor_id) / 5.0 * 1000000 + 0.5) / 1000000.0 AS recall_at_5
    FROM ({_ORACLES['embedding_topk']}) ex
    LEFT JOIN ({_ORACLES['ann_lsh_topk']}) l
      ON ex.query_id = l.query_id AND ex.neighbor_id = l.neighbor_id
    GROUP BY ex.query_id
"""




def _pagerank_oracle_sql(iterations: int = 10) -> str:
    """Unrolled 10-iteration PageRank recurrence — possible because the
    Spark side rounds the rank vector to a 1e-9 grid each iteration
    (graph.pagerank), so contribution-sum order noise (~1e-17) never
    reaches the grid and both engines hold bit-identical iterates."""
    rd9 = "floor(({expr}) * 1000000000 + 0.5) / 1000000000.0"
    head = """
    WITH nodes AS (SELECT DISTINCT CAST(floor(epoch_us(ts) / 1800000000) AS BIGINT) AS b, user_id
                   FROM events WHERE event_type = 'error'),
    edges AS (SELECT DISTINCT a.user_id AS u, c.user_id AS v
              FROM nodes a JOIN nodes c ON a.b = c.b AND a.user_id < c.user_id),
    dedges AS (SELECT u AS src, v AS dst FROM edges UNION ALL SELECT v, u FROM edges),
    deg AS (SELECT src, CAST(count(*) AS BIGINT) AS d FROM dedges GROUP BY src),
    n AS (SELECT CAST(count(DISTINCT src) AS BIGINT) AS n FROM dedges),
    pr0 AS (SELECT s.src AS id, """ + rd9.format(expr="1.0 / n.n") + """ AS pr
            FROM (SELECT DISTINCT src FROM dedges) s CROSS JOIN n)"""
    steps = []
    for k in range(iterations):
        steps.append(
            f""",
    pr{k + 1} AS (
      SELECT dedges.dst AS id, """
            + rd9.format(expr=f"(1.0 - 0.85) / n.n + 0.85 * sum(p.pr / deg.d)")
            + f""" AS pr
      FROM dedges JOIN pr{k} p ON p.id = dedges.src
                  JOIN deg ON deg.src = dedges.src
                  CROSS JOIN n
      GROUP BY dedges.dst, n.n)"""
        )
    tail = f"""
    SELECT id AS user_id,
           floor((pr * 1000) * 1000000 + 0.5) / 1000000.0 AS pr_permille
    FROM pr{iterations}
    """
    return head + "".join(steps) + tail


_ORACLES["graph_pagerank"] = _pagerank_oracle_sql()


def _lpa_oracle_sql(iterations: int = 5) -> str:
    """Unrolled synchronous label propagation — integer votes with a
    (count desc, label asc) argmax; replayable because every step is
    exact and the schedule is fixed."""
    head = """
    WITH nodes AS (SELECT DISTINCT CAST(floor(epoch_us(ts) / 1800000000) AS BIGINT) AS b, user_id
                   FROM events WHERE event_type = 'error'),
    edges AS (SELECT DISTINCT a.user_id AS u, c.user_id AS v
              FROM nodes a JOIN nodes c ON a.b = c.b AND a.user_id < c.user_id),
    dedges AS (SELECT u AS src, v AS dst FROM edges UNION ALL SELECT v, u FROM edges),
    lp0 AS (SELECT DISTINCT src AS id, src AS community FROM dedges)"""
    steps = []
    for k in range(iterations):
        steps.append(
            f""",
    lp{k + 1} AS (
      SELECT id, community FROM (
        SELECT dedges.dst AS id, p.community,
               row_number() OVER (PARTITION BY dedges.dst
                                  ORDER BY count(*) DESC, p.community) AS r
        FROM dedges JOIN lp{k} p ON p.id = dedges.src
        GROUP BY dedges.dst, p.community)
      WHERE r = 1)"""
        )
    tail = f""",
    sizes AS (SELECT community, CAST(count(*) AS BIGINT) AS n_members
              FROM lp{iterations} GROUP BY community)
    SELECT l.id AS user_id, l.community, s.n_members
    FROM lp{iterations} l JOIN sizes s USING (community)
    """
    return head + "".join(steps) + tail


_ORACLES["graph_communities"] = _lpa_oracle_sql()



def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every SQL-expressible query.

    Omitted (rows-only check, by design): simhash_candidates
    (Spark-native xxhash64 DuckDB can't reproduce; partial oracle in
    tests/), ann_ivf_topk (seeded pyspark.ml k-means index build —
    iterative training SQL can't replay; partial oracle in tests/),
    approx_aggregates and distinct_users_rollup (sketch-specific
    estimates). ann_lsh_topk and perplexity_proxy are FULLY oracle'd
    (deterministic md5 planes / nano-nat surprisal grid).
    """
    return dict(_ORACLES)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full star-schema build + rollup at sf0.001."""
    ensure_runtime_confs(spark)
    return q_star_flagship(spark, "/root/testdata/sf0.001")
