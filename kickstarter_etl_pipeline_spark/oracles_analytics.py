"""DuckDB oracle SQL, part 2: TPC-H shapes, analytics, warehouse,
text/corpus statistics. Split out of queries.py in round 6.
"""

from kickstarter_etl_pipeline_spark.oracles_core import (  # noqa: F401
    _DIM_CATEGORY_SQL,
    _DIM_STATE_SQL,
    _EN_STOP,
    _FACT_SQL,
    _NORM,
    _TOKS,
)

ORACLES_ANALYTICS: dict[str, str] = {
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
    "intersect_all_priorities": """
        SELECT o_orderpriority FROM orders WHERE year(o_orderdate) = 1998
        INTERSECT ALL
        SELECT o_orderpriority FROM orders WHERE year(o_orderdate) = 1999
    """,
    "window_cume_dist": """
        SELECT o_orderkey, o_orderpriority,
               CAST(month(o_orderdate) AS INTEGER) AS order_month,
               floor(percent_rank() OVER w * 1000000 + 0.5) / 1000000.0
                 AS pct_rank,
               floor(cume_dist() OVER w * 1000000 + 0.5) / 1000000.0
                 AS cum_dist,
               nth_value(o_totalprice, 3) OVER (
                 PARTITION BY o_orderpriority, month(o_orderdate)
                 ORDER BY o_totalprice, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                 AS third_lowest_price
        FROM orders
        WINDOW w AS (PARTITION BY o_orderpriority, month(o_orderdate)
                     ORDER BY o_totalprice, o_orderkey)
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

# FULL twin of q_part_hierarchy_rollup (round 9, continued): a genuine
# WITH RECURSIVE ancestor walk of the derived 4-ary taxonomy (child
# k → parent (k-1)//4, root 0). Linear recursion — the recursive CTE
# is referenced exactly once per step, so the kcore MATERIALIZED
# lesson (device 7) does not apply. Depth/counts are pure integers;
# money is the floor(price*100 + 0.5) cents snap emitted as an exact
# BIGINT sum — no float aggregation on either engine.
ORACLES_ANALYTICS["part_hierarchy_rollup"] = """
    WITH RECURSIVE up AS (
      SELECT p_partkey AS des, (p_partkey - 1) // 4 AS anc
      FROM part WHERE p_partkey >= 1
      UNION
      SELECT des, (anc - 1) // 4 FROM up WHERE anc >= 1
    ),
    vals AS (SELECT p_partkey AS id,
                    CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS cents
             FROM part),
    dep AS (SELECT des AS id, CAST(count(*) AS BIGINT) AS depth
            FROM up GROUP BY des),
    sub AS (SELECT anc AS id, CAST(count(*) AS BIGINT) AS ndesc,
                   CAST(sum(v.cents) AS BIGINT) AS dcents
            FROM up JOIN vals v ON v.id = up.des GROUP BY anc)
    SELECT v.id AS p_partkey,
           CAST(coalesce(dep.depth, 0) AS BIGINT) AS depth,
           CAST(coalesce(sub.ndesc, 0) + 1 AS BIGINT) AS subtree_count,
           CAST(coalesce(sub.dcents, 0) + v.cents AS BIGINT)
             AS subtree_value_cents
    FROM vals v
    LEFT JOIN dep ON dep.id = v.id
    LEFT JOIN sub ON sub.id = v.id
"""

# FULL twin of q_bootstrap_ci_report: Poisson(1) weights from the same
# hardcoded 2^60-grid CDF thresholds over md5("orderkey:b"); replicate
# means by exact HUGEINT floor division; CI = rank-2/rank-31 replicate
# means ranked on (mean6, b).
ORACLES_ANALYTICS["bootstrap_ci_report"] = """
    WITH base AS (SELECT o_orderkey, o_orderpriority AS priority,
                         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
                  FROM orders),
    rep AS (SELECT o_orderkey, priority, cents, unnest(range(0, 32)) AS b FROM base),
    wt AS (SELECT priority, b, cents,
                  CAST(concat('0x', substr(md5(concat(CAST(o_orderkey AS VARCHAR), ':',
                                                      CAST(b AS VARCHAR))), 1, 15))
                       AS BIGINT) AS u
           FROM rep),
    ww AS (SELECT priority, b, cents,
                  CASE WHEN u < 424136118829305344 THEN 0
                       WHEN u < 848272237658610688 THEN 1
                       WHEN u < 1060340297073263360 THEN 2
                       WHEN u < 1131029650211480960 THEN 3
                       WHEN u < 1148701988496035328 THEN 4
                       WHEN u < 1152236456152946176 THEN 5
                       ELSE 6 END AS w
           FROM wt),
    reps AS (SELECT priority, b,
                    CAST(sum(CAST(w AS HUGEINT) * cents) AS HUGEINT) AS s,
                    CAST(sum(w) AS BIGINT) AS wsum
             FROM ww GROUP BY 1, 2),
    m AS (SELECT priority, b,
                 CAST((s * 10000) // nullif(wsum, 0) AS BIGINT) AS m6,
                 row_number() OVER (PARTITION BY priority
                     ORDER BY CAST((s * 10000) // nullif(wsum, 0) AS BIGINT), b) AS rk
          FROM reps),
    ci AS (SELECT priority,
                  max(CASE WHEN rk = 2 THEN m6 END) AS lo6,
                  max(CASE WHEN rk = 31 THEN m6 END) AS hi6
           FROM m GROUP BY priority),
    pt AS (SELECT priority, CAST(count(*) AS BIGINT) AS n_orders,
                  CAST((CAST(sum(cents) AS HUGEINT) * 10000) // count(*) AS BIGINT) AS p6
           FROM base GROUP BY priority)
    SELECT pt.priority AS o_orderpriority, n_orders,
           p6 / 1000000.0 AS point_mean,
           lo6 / 1000000.0 AS ci_lo,
           hi6 / 1000000.0 AS ci_hi
    FROM pt JOIN ci USING (priority)
"""

# FULL twin of q_pareto_frontier_parts: the LITERAL quadratic dominance
# definition (NOT EXISTS a strictly-better point) — Spark's prefix-max
# reduction must reproduce it exactly, so the grade proves the skyline
# reduction, not just the arithmetic.
ORACLES_ANALYTICS["pareto_frontier_parts"] = """
    WITH pts AS (SELECT CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS price_c,
                        CAST(max(p_size) AS BIGINT) AS best
                 FROM part GROUP BY 1),
    sky AS (SELECT price_c, best FROM pts x
            WHERE NOT EXISTS (SELECT 1 FROM pts o
                              WHERE o.price_c < x.price_c AND o.best >= x.best)),
    counts AS (SELECT CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS price_c,
                      CAST(p_size AS BIGINT) AS p_size,
                      CAST(count(*) AS BIGINT) AS n_parts
               FROM part GROUP BY 1, 2)
    SELECT sky.price_c / 100.0 AS price, sky.best AS p_size, n_parts
    FROM sky JOIN counts ON counts.price_c = sky.price_c AND counts.p_size = sky.best
"""

# FULL twin of q_kaplan_meier_survival: same cohort rules (entry =
# first view, event = first subsequent purchase, censor at global max
# event time), day-grid risk sets by exclusive prefix subtraction,
# per-event-day ln((n-d)/n) snapped to the nano-nat grid before the
# prefix sum; d = n poisons the curve to NULL from that day on.
ORACLES_ANALYTICS["kaplan_meier_survival"] = """
    WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
    entry AS (SELECT user_id, min(us) AS t0 FROM ev
              WHERE event_type = 'view' GROUP BY user_id),
    purch AS (SELECT e.user_id, min(us) AS tp
              FROM ev e JOIN entry USING (user_id)
              WHERE event_type = 'purchase' AND us >= t0
              GROUP BY e.user_id),
    tend AS (SELECT max(us) AS te FROM ev),
    subj AS (SELECT CAST(floor((coalesce(tp, te) - t0) / 86400000000.0) AS BIGINT) AS day,
                    CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS is_event
             FROM entry LEFT JOIN purch USING (user_id), tend),
    days AS (SELECT day, CAST(sum(is_event) AS BIGINT) AS n_events,
                    CAST(count(*) AS BIGINT) AS c_all
             FROM subj GROUP BY day),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM subj),
    risk AS (SELECT day, n_events,
                    CAST(n_total - coalesce(sum(c_all) OVER (ORDER BY day
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                         AS BIGINT) AS n_at_risk
             FROM days, tot),
    evd AS (SELECT day, n_events, n_at_risk,
                   CASE WHEN n_events < n_at_risk
                        THEN CAST(floor(ln((n_at_risk - n_events) / CAST(n_at_risk AS DOUBLE))
                                        * 1000000000 + 0.5) AS BIGINT)
                   END AS term9
            FROM risk WHERE n_events > 0),
    curve AS (SELECT day, n_at_risk, n_events,
                     max(CASE WHEN n_events >= n_at_risk THEN 1 ELSE 0 END)
                       OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hit0,
                     sum(term9) OVER (ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ln9
              FROM evd)
    SELECT day AS event_day, n_at_risk, n_events,
           CASE WHEN hit0 = 0
                THEN floor(ln9 / 1000000000.0 * 1000000 + 0.5) / 1000000.0
           END AS log_survival
    FROM curve
"""

# FULL twin of q_multitouch_attribution: same 7-day strict-before
# window, same integer U-shaped split (front-loaded middle remainder);
# no float exists on either side.
ORACLES_ANALYTICS["multitouch_attribution"] = """
    WITH ev AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS us FROM events),
    p AS (SELECT user_id AS u, event_id AS pid, us AS pts FROM ev
          WHERE event_type = 'purchase'),
    t AS (SELECT user_id AS u, event_id AS tid, event_type AS touch_type, us AS tts
          FROM ev WHERE event_type IN ('click', 'view', 'signup')),
    j AS (SELECT pid, tid, touch_type, tts
          FROM p JOIN t USING (u)
          WHERE tts < pts AND tts >= pts - 604800000000),
    pos AS (SELECT pid, touch_type,
                   row_number() OVER (PARTITION BY pid ORDER BY tts, tid) AS r,
                   count(*) OVER (PARTITION BY pid) AS n
            FROM j),
    c AS (SELECT pid, touch_type,
                 CASE WHEN n = 1 THEN 10000
                      WHEN n = 2 THEN 5000
                      WHEN r = 1 OR r = n THEN 4000
                      ELSE 2000 // (n - 2)
                           + CASE WHEN r - 1 <= 2000 % (n - 2) THEN 1 ELSE 0 END
                 END AS credit
          FROM pos)
    SELECT touch_type, CAST(sum(credit) AS BIGINT) AS credit_bp,
           CAST(count(DISTINCT pid) AS BIGINT) AS n_conversions_touched,
           CAST(count(*) AS BIGINT) AS n_touches
    FROM c GROUP BY touch_type
"""

# FULL twin of q_fuzzy_name_pairs: levenshtein() is the same integer DP
# on both engines — no rounding device needed anywhere.
ORACLES_ANALYTICS["fuzzy_name_pairs"] = """
    WITH names AS (SELECT p_name, CAST(count(*) AS BIGINT) AS n_parts,
                          split_part(p_name, ' ', -1) AS block,
                          length(p_name) AS len
                   FROM part GROUP BY p_name)
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS lev_dist,
           a.n_parts AS n_parts_a, b.n_parts AS n_parts_b
    FROM names a JOIN names b
      ON a.block = b.block AND a.p_name < b.p_name
    WHERE abs(a.len - b.len) <= 5
      AND levenshtein(a.p_name, b.p_name) <= 5
"""

# FULL twin of q_item_cooccurrence_topk: exact counts, HUGEINT lift
# products, total-order LIMIT boundary.
ORACLES_ANALYTICS["item_cooccurrence_topk"] = """
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pairs AS (SELECT a.l_partkey AS id_a, b.l_partkey AS id_b,
                     CAST(count(*) AS BIGINT) AS n_both
              FROM li a JOIN li b
                ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
              GROUP BY 1, 2),
    freq AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS n FROM li GROUP BY 1),
    tot AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_ord FROM li)
    SELECT id_a, id_b, n_both, fa.n AS n_a, fb.n AS n_b,
           floor(CAST(CAST(n_both AS HUGEINT) * n_ord AS DOUBLE)
                 / CAST(CAST(fa.n AS HUGEINT) * fb.n AS DOUBLE)
                 * 1000000 + 0.5) / 1000000.0 AS lift
    FROM pairs
    JOIN freq fa ON fa.l_partkey = id_a
    JOIN freq fb ON fb.l_partkey = id_b, tot
    ORDER BY n_both DESC, id_a, id_b
    LIMIT 50
"""

# FULL twin of q_scd2_customer_priority: identical gaps-and-islands
# episode construction and half-open validity intervals.
ORACLES_ANALYTICS["scd2_customer_priority"] = """
    WITH o AS (SELECT o_custkey, CAST(o_orderdate AS DATE) AS d, o_orderkey,
                      o_orderpriority AS priority
               FROM orders),
    flagged AS (SELECT *,
                       CASE WHEN lag(priority) OVER w IS NULL
                             OR lag(priority) OVER w <> priority
                            THEN 1 ELSE 0 END AS new_ep
                FROM o WINDOW w AS (PARTITION BY o_custkey ORDER BY d, o_orderkey)),
    eps0 AS (SELECT *, CAST(sum(new_ep) OVER (PARTITION BY o_custkey ORDER BY d, o_orderkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS ep
             FROM flagged),
    eps AS (SELECT o_custkey, ep AS version, max(priority) AS priority,
                   min(d) AS valid_from, CAST(count(*) AS BIGINT) AS n_orders
            FROM eps0 GROUP BY 1, 2)
    SELECT o_custkey, version, priority,
           strftime(valid_from, '%Y-%m-%d') AS valid_from,
           strftime(lead(valid_from) OVER w2, '%Y-%m-%d') AS valid_to,
           lead(valid_from) OVER w2 IS NULL AS is_current,
           n_orders
    FROM eps WINDOW w2 AS (PARTITION BY o_custkey ORDER BY version)
"""

# FULL twin of q_capped_running_balance: the same pure-integer
# non-associative fold, with the (balance, max) pair PACKED into one
# HUGEINT accumulator (acc = m*2^62 + b). DuckDB 1.0's struct_pack
# inside a list_reduce lambda mis-evaluates a field that references a
# subexpression shared with an earlier field (observed live: m picked
# up the post-update balance), so the struct-accumulator formulation
# is NOT usable here — the packed scalar sidesteps it and stays exact
# (b, m < 2^62 micro-units by construction).
ORACLES_ANALYTICS["capped_running_balance"] = """
    WITH ev AS (SELECT user_id, epoch_us(ts) AS uss, event_id AS eid,
                       CASE WHEN event_type = 'purchase'
                            THEN -CAST(floor(value * 1000000 + 0.5) AS BIGINT)
                            ELSE CAST(floor(value * 1000000 + 0.5) AS BIGINT)
                       END AS dd
                FROM events),
    g AS (SELECT user_id,
                 list_transform(list_sort(list(struct_pack(us := uss, event_id := eid, d := dd))),
                                s -> s.d) AS deltas
          FROM ev GROUP BY user_id),
    f AS (SELECT user_id, CAST(len(deltas) AS BIGINT) AS n_events,
                 list_reduce(
                   list_prepend(CAST(0 AS HUGEINT), deltas::HUGEINT[]),
                   (acc, x) -> greatest(acc // 4611686018427387904,
                                        greatest(CAST(0 AS HUGEINT),
                                                 acc % 4611686018427387904 + x))
                               * 4611686018427387904
                               + greatest(CAST(0 AS HUGEINT),
                                          acc % 4611686018427387904 + x)
                 ) AS st
          FROM g)
    SELECT user_id, n_events,
           CAST(st % 4611686018427387904 AS BIGINT) / 1000000.0 AS final_balance,
           CAST(st // 4611686018427387904 AS BIGINT) / 1000000.0 AS max_balance
    FROM f
"""

# FULL twin of q_did_estimate_report: four exact floor-division cell
# means, integer DiD.
ORACLES_ANALYTICS["did_estimate_report"] = """
    WITH cells AS (SELECT (o_custkey % 2 = 1) AS treat,
                          (CAST(o_orderdate AS DATE) >= DATE '1997-01-01') AS post,
                          CAST(count(*) AS BIGINT) AS n,
                          CAST((CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS HUGEINT)
                                * 10000) // count(*) AS BIGINT) AS m6
                   FROM orders GROUP BY 1, 2),
    g AS (SELECT CAST(sum(n) AS BIGINT) AS n_orders,
                 max(CASE WHEN treat AND post THEN m6 END) AS tp,
                 max(CASE WHEN treat AND NOT post THEN m6 END) AS tb,
                 max(CASE WHEN NOT treat AND post THEN m6 END) AS cp,
                 max(CASE WHEN NOT treat AND NOT post THEN m6 END) AS cb
          FROM cells)
    SELECT n_orders,
           tb / 1000000.0 AS treat_pre_mean,
           tp / 1000000.0 AS treat_post_mean,
           cb / 1000000.0 AS control_pre_mean,
           cp / 1000000.0 AS control_post_mean,
           ((tp - tb) - (cp - cb)) / 1000000.0 AS did_estimate
    FROM g
"""

# FULL twin of q_rolling_wau_report: identical explode-to-window-end
# construction; only observed-activity days emitted.
ORACLES_ANALYTICS["rolling_wau_report"] = """
    WITH ud AS (SELECT DISTINCT user_id,
                       CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS day
                FROM events),
    dau AS (SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS dau
            FROM ud GROUP BY day),
    span AS (SELECT max(day) AS dmax FROM ud),
    expl AS (SELECT DISTINCT user_id, wend FROM (
               SELECT user_id, unnest(range(day, least(day + 6, dmax) + 1)) AS wend
               FROM ud, span)),
    wau AS (SELECT wend AS day, CAST(count(*) AS BIGINT) AS wau
            FROM expl GROUP BY wend)
    SELECT dau.day AS epoch_day, dau.dau, wau.wau,
           floor(dau.dau / CAST(wau.wau AS DOUBLE) * 1000000 + 0.5) / 1000000.0
             AS stickiness
    FROM dau JOIN wau ON wau.day = dau.day
"""

# FULL twin of q_cohort_ltv_curve: exact micro-unit cells, prefix sums
# over the (cohort x age) week grid, exact floor-division per-user LTV.
ORACLES_ANALYTICS["cohort_ltv_curve"] = """
    WITH base AS (SELECT user_id,
                         CAST(floor(epoch_us(ts) / 604800000000.0) AS BIGINT) AS wk,
                         CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS vm
                  FROM events),
    first AS (SELECT user_id, min(wk) AS cohort FROM base GROUP BY user_id),
    cells AS (SELECT cohort, wk - cohort AS age_weeks,
                     CAST(sum(vm) AS HUGEINT) AS v,
                     CAST(count(DISTINCT base.user_id) AS BIGINT) AS n_active_users
              FROM base JOIN first USING (user_id)
              GROUP BY 1, 2),
    sizes AS (SELECT cohort, CAST(count(*) AS BIGINT) AS cohort_size
              FROM first GROUP BY cohort),
    cum AS (SELECT cohort, age_weeks, n_active_users,
                   CAST(sum(v) OVER (PARTITION BY cohort ORDER BY age_weeks
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS HUGEINT) AS c
            FROM cells)
    SELECT cohort AS cohort_week, age_weeks, cohort_size, n_active_users,
           CAST(c AS DOUBLE) / 1000000.0 AS cum_value,
           CAST(c // cohort_size AS BIGINT) / 1000000.0 AS cum_value_per_user
    FROM cum JOIN sizes USING (cohort)
"""

# FULL twin of q_abc_classification: exact cents, window rank + cum,
# integer class boundaries.
ORACLES_ANALYTICS["abc_classification"] = """
    WITH rev AS (SELECT l_partkey,
                        CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS r
                 FROM lineitem GROUP BY 1),
    tot AS (SELECT CAST(sum(r) AS BIGINT) AS t FROM rev),
    ranked AS (SELECT l_partkey, r,
                      CAST(row_number() OVER (ORDER BY r DESC, l_partkey) AS BIGINT) AS rank,
                      CAST(sum(r) OVER (ORDER BY r DESC, l_partkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
               FROM rev)
    SELECT l_partkey AS p_partkey,
           r / 100.0 AS revenue,
           rank,
           CASE WHEN cum * 5 <= t * 4 THEN 'A'
                WHEN cum * 20 <= t * 19 THEN 'B'
                ELSE 'C' END AS abc_class
    FROM ranked, tot
"""

# FULL twin of q_session_window_native: gaps-and-islands replay of the
# NATIVE session_window semantics (a new session when the gap is >= 30
# minutes — note >=, the built-in's rule; the repo's lag-based
# sessionizer uses strict >).
ORACLES_ANALYTICS["session_window_native"] = """
    WITH e AS (SELECT user_id, event_id, value, ts, epoch_us(ts) AS us FROM events),
    lagd AS (SELECT *, lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev
             FROM e),
    flagged AS (SELECT *, CASE WHEN prev IS NULL OR us - prev >= 1800000000
                               THEN 1 ELSE 0 END AS new_s
                FROM lagd),
    sess AS (SELECT *, CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
             FROM flagged)
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 4) AS sum_value
    FROM sess GROUP BY user_id, sid
"""

# FULL twin of q_interpurchase_gap_percentiles: same total order and
# ceil-rank percentile_disc picks.
ORACLES_ANALYTICS["interpurchase_gap_percentiles"] = """
    WITH p AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events
               WHERE event_type = 'purchase'),
    gaps AS (SELECT CAST(floor((us - prev) / 1000000.0) AS BIGINT) AS gap_s,
                    user_id, us
             FROM (SELECT *, lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev
                   FROM p)
             WHERE prev IS NOT NULL),
    ranked AS (SELECT gap_s, CAST(row_number() OVER (ORDER BY gap_s, user_id, us) AS BIGINT) AS r
               FROM gaps),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM gaps)
    SELECT 'p50' AS quantile, n AS n_gaps, gap_s AS gap_seconds
    FROM ranked, n WHERE r = (n * 1 + 1) // 2
    UNION ALL
    SELECT 'p90', n, gap_s FROM ranked, n WHERE r = (n * 9 + 9) // 10
    UNION ALL
    SELECT 'p99', n, gap_s FROM ranked, n WHERE r = (n * 99 + 99) // 100
"""
