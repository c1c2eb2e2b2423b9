"""DuckDB oracle SQL, part 5 (round 9): evaluation / monitoring tier —
classifier AUC & calibration, KS drift, robust trend — plus the
round's LM/embedding additions (Good-Turing, weighted median,
Matryoshka recall). Values stay bit-comparable with the Spark twins:
exact integer spines, one fixed IEEE tree per float output.

(The blocking-quality oracle lives in oracles_builders — it composes
the simhash_md5_candidates twin defined there.)
"""

from kickstarter_etl_pipeline_spark.oracles_core import _TOKS  # noqa: F401

# (doc_id, lang, source, q) with q = the 6-dp quality score — the same
# expression the verified quality_scores oracle uses, carried with the
# label/source columns the eval tier needs.
_QUAL = f"""
  SELECT doc_id, lang, source,
         floor((
           (CASE WHEN length(text) >= 100 AND length(text) <= 10000 THEN 1.0 ELSE 0.5 END)
           * (0.5 + 0.5 * (len(list_distinct(toks)) / nullif(len(toks), 0)))
           - least(length(regexp_replace(text, '[^.,;:!?]', '', 'g'))
                   / greatest(length(text), 1) * 5, 0.5)
         ) * 1000000 + 0.5) / 1000000.0 AS q
  FROM (SELECT doc_id, lang, source, text, {_TOKS} AS toks FROM documents)
"""

ORACLES_EVAL: dict[str, str] = {
    "quality_auc_report": f"""
        WITH s AS ({_QUAL}),
        f AS (SELECT q, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
              FROM s WHERE q IS NOT NULL),
        per AS (SELECT q, CAST(sum(pos) AS BIGINT) AS p,
                       CAST(sum(1 - pos) AS BIGINT) AS n
                FROM f GROUP BY q),
        cumt AS (SELECT p, n,
                        CAST(coalesce(sum(n) OVER (ORDER BY q
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                          AS BIGINT) AS cneg
                 FROM per),
        agg AS (SELECT CAST(sum(p * (2 * cneg + n)) AS BIGINT) AS u2,
                       CAST(sum(p) AS BIGINT) AS n_pos,
                       CAST(sum(n) AS BIGINT) AS n_neg
                FROM cumt),
        a AS (SELECT n_pos, n_neg,
                     floor(u2 / (2.0 * n_pos * n_neg) * 1000000 + 0.5) / 1000000.0 AS auc
              FROM agg)
        SELECT n_pos, n_neg, auc,
               floor((2 * auc - 1) * 1000000 + 0.5) / 1000000.0 AS gini
        FROM a
    """,
    "quality_calibration_report": f"""
        WITH s AS ({_QUAL}),
        f AS (SELECT CAST(least(greatest(floor(q * 10), -5), 9) AS INTEGER) AS bin,
                     CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos,
                     CAST(floor(q * 1000000.0 + 0.5) AS BIGINT) AS q_micro
              FROM s WHERE q IS NOT NULL)
        SELECT bin,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(pos) AS BIGINT) AS n_pos,
               floor(sum(pos) / count(*) * 1000000 + 0.5) / 1000000.0 AS frac_pos,
               floor(sum(q_micro) / count(*) / 1000000.0 * 1000000 + 0.5) / 1000000.0
                 AS mean_quality
        FROM f GROUP BY bin
    """,
    "source_ks_drift": f"""
        WITH s AS ({_QUAL}),
        f AS (SELECT source, q FROM s WHERE q IS NOT NULL),
        per_sq AS (SELECT source, q, CAST(count(*) AS BIGINT) AS c
                   FROM f GROUP BY 1, 2),
        per_q AS (SELECT q, CAST(count(*) AS BIGINT) AS c_all FROM f GROUP BY 1),
        totals AS (SELECT source, CAST(count(*) AS BIGINT) AS n_s
                   FROM f GROUP BY 1),
        tot AS (SELECT CAST(count(*) AS BIGINT) AS n_tot FROM f),
        grid AS (SELECT t.source, p.q FROM totals t CROSS JOIN per_q p),
        cum_all AS (SELECT q, CAST(sum(c_all) OVER (ORDER BY q
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS BIGINT) AS cum_all
                    FROM per_q),
        cums AS (SELECT g.source, g.q,
                        CAST(sum(coalesce(ps.c, 0)) OVER (PARTITION BY g.source
                          ORDER BY g.q
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                          AS BIGINT) AS cum_s
                 FROM grid g
                 LEFT JOIN per_sq ps ON ps.source = g.source AND ps.q = g.q),
        sweep AS (SELECT c.source, c.q, t.n_s, x.n_tot,
                         abs(CAST(c.cum_s AS HUGEINT) * (x.n_tot - t.n_s)
                             - CAST(a.cum_all - c.cum_s AS HUGEINT) * t.n_s)
                           AS d_num
                  FROM cums c
                  JOIN cum_all a USING (q)
                  JOIN totals t USING (source)
                  CROSS JOIN tot x),
        best AS (SELECT *, row_number() OVER (PARTITION BY source
                   ORDER BY d_num DESC, q ASC) AS rn
                 FROM sweep)
        SELECT source, n_s AS n_docs,
               floor(CAST(d_num AS DOUBLE)
                     / (CAST(n_s AS DOUBLE) * CAST(n_tot - n_s AS DOUBLE))
                     * 1000000 + 0.5) / 1000000.0 AS ks_stat,
               q AS at_quality
        FROM best WHERE rn = 1
    """,
    "theil_sen_daily_trend": """
        WITH daily AS (SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
                              CAST(count(*) AS BIGINT) AS c
                       FROM events GROUP BY 1),
        pairs AS (SELECT a.d AS da, b.d AS db,
                         floor((b.c - a.c) / (b.d - a.d) * 1000000 + 0.5) / 1000000.0
                           AS slope
                  FROM daily a JOIN daily b ON a.d < b.d),
        nd AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM daily),
        np AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs FROM pairs),
        ranked AS (SELECT slope, row_number() OVER (ORDER BY slope, da, db) AS rn
                   FROM pairs),
        mids AS (SELECT r.slope, p.n_pairs
                 FROM ranked r CROSS JOIN np p
                 WHERE r.rn = floor((p.n_pairs + 1) / 2)
                    OR r.rn = floor(p.n_pairs / 2) + 1),
        med AS (SELECT n_pairs,
                       floor(sum(slope) / count(*) * 1000000 + 0.5) / 1000000.0
                         AS ts_slope
                FROM mids GROUP BY n_pairs)
        SELECT n_days, n_pairs, ts_slope FROM nd CROSS JOIN med
    """,
    "good_turing_unigrams": f"""
        WITH toks AS (SELECT unnest({_TOKS}) AS token FROM documents),
        freq AS (SELECT token, CAST(count(*) AS BIGINT) AS r FROM toks GROUP BY token),
        cc AS (SELECT r, CAST(count(*) AS BIGINT) AS n_r FROM freq GROUP BY r),
        gt AS (SELECT c1.r, c1.n_r,
                      CASE WHEN c2.n_r IS NOT NULL THEN
                        floor((c1.r + 1) * c2.n_r / c1.n_r * 1000000 + 0.5) / 1000000.0
                      END AS r_star,
                      row_number() OVER (ORDER BY c1.r) AS hr
               FROM cc c1 LEFT JOIN cc c2 ON c2.r = c1.r + 1)
        SELECT r, n_r, r_star FROM gt WHERE hr <= 30
    """,
    "trimmed_mean_by_group": """
        WITH t AS (SELECT l_returnflag, l_extendedprice, l_orderkey, l_linenumber
                   FROM lineitem),
        r AS (SELECT l_returnflag, l_extendedprice,
                     row_number() OVER (PARTITION BY l_returnflag
                       ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn,
                     count(*) OVER (PARTITION BY l_returnflag) AS n_g
              FROM t),
        b AS (SELECT *, CAST(floor(n_g / 10) AS BIGINT) AS k FROM r)
        SELECT l_returnflag,
               CAST(max(n_g) AS BIGINT) AS n_total,
               CAST(max(k) AS BIGINT) AS n_trimmed_each_side,
               CAST(count(*) AS BIGINT) AS n_kept,
               floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                     / count(*) * 1000000 + 0.5) / 1000000.0 AS trimmed_mean_price
        FROM b WHERE rn > k AND rn <= n_g - k
        GROUP BY l_returnflag
    """,
    "weighted_median_by_group": """
        WITH t AS (SELECT l_returnflag, l_extendedprice, l_orderkey, l_linenumber,
                          CAST(l_quantity AS BIGINT) AS wt
                   FROM lineitem),
        c AS (SELECT l_returnflag, l_extendedprice,
                     sum(wt) OVER (PARTITION BY l_returnflag
                       ORDER BY l_extendedprice, l_orderkey, l_linenumber
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS gc,
                     sum(wt) OVER (PARTITION BY l_returnflag) AS w
              FROM t)
        SELECT l_returnflag,
               CAST(min(w) AS BIGINT) AS total_weight,
               min(l_extendedprice) AS weighted_median_price
        FROM c WHERE 2 * gc >= w
        GROUP BY l_returnflag
    """,
    "bm25_topk": f"""
        WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
        tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
               FROM (SELECT doc_id, unnest(t) AS term FROM toks) GROUP BY 1, 2),
        dl AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM toks),
        n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
        tt AS (SELECT CAST(sum(dl) AS BIGINT) AS t FROM dl),
        dfr AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
        q AS (SELECT term FROM (SELECT term, sum(tf) AS cnt FROM tf
                                GROUP BY term ORDER BY cnt DESC, term LIMIT 5)),
        qi AS (SELECT q.term, dfr.df,
                      CAST(floor(ln((n.n - dfr.df + 0.5) / (dfr.df + 0.5) + 1.0)
                                 * 1000000000 + 0.5) AS BIGINT) AS idf9
               FROM q JOIN dfr USING (term) CROSS JOIN n),
        sc AS (SELECT tf.doc_id,
                      CAST(floor((qi.idf9 / 1000000000.0)
                           * (tf.tf * 2.2)
                           / (tf.tf + 1.2 * (0.25 + 0.75 * (dl.dl * n.n / tt.t)))
                           * 1000000000 + 0.5) AS BIGINT) AS s9
               FROM tf JOIN qi USING (term) JOIN dl USING (doc_id)
               CROSS JOIN n CROSS JOIN tt),
        pd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms_matched,
                      CAST(sum(s9) AS BIGINT) AS sum9
               FROM sc GROUP BY doc_id),
        ranked AS (SELECT *, CAST(row_number() OVER (ORDER BY sum9 DESC, doc_id)
                     AS INTEGER) AS rank
                   FROM pd)
        SELECT rank, doc_id, n_terms_matched,
               floor(sum9 / 1000000000.0 * 1000000 + 0.5) / 1000000.0 AS bm25_score
        FROM ranked WHERE rank <= 10
    """,
    "ndcg_report": f"""
        WITH s AS ({_QUAL}),
        base AS (
          SELECT s.doc_id, s.q,
                 CAST(CASE WHEN d.n_chars >= 400 THEN 7
                           WHEN d.n_chars >= 250 THEN 3
                           WHEN d.n_chars >= 120 THEN 1
                           ELSE 0 END AS BIGINT) AS gain
          FROM s JOIN documents d USING (doc_id) WHERE s.q IS NOT NULL),
        w AS (SELECT [1000000000, 630929754, 500000000, 430676558, 386852807,
                      356207187, 333333333, 315464877, 301029996, 289064826] AS ws),
        dtop AS (SELECT gain, row_number() OVER (ORDER BY q DESC, doc_id) AS pos
                 FROM base ORDER BY q DESC, doc_id LIMIT 10),
        itop AS (SELECT gain, row_number() OVER (ORDER BY gain DESC, doc_id) AS pos
                 FROM base ORDER BY gain DESC, doc_id LIMIT 10),
        d9 AS (SELECT CAST(sum(gain * ws[pos]) AS BIGINT) AS d FROM dtop CROSS JOIN w),
        i9 AS (SELECT CAST(sum(gain * ws[pos]) AS BIGINT) AS i FROM itop CROSS JOIN w),
        n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM base)
        SELECT n_docs,
               floor(d / 1000000000.0 * 1000000 + 0.5) / 1000000.0 AS dcg_at_10,
               floor(i / 1000000000.0 * 1000000 + 0.5) / 1000000.0 AS idcg_at_10,
               floor(CAST(d AS DOUBLE) / nullif(i, 0) * 1000000 + 0.5) / 1000000.0
                 AS ndcg_at_10
        FROM n CROSS JOIN d9 CROSS JOIN i9
    """,
    "rrf_fusion_topk": f"""
        WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
        tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
               FROM (SELECT doc_id, unnest(t) AS term FROM toks) GROUP BY 1, 2),
        dl AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM toks),
        n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
        tt AS (SELECT CAST(sum(dl) AS BIGINT) AS t FROM dl),
        dfr AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
        q AS (SELECT term FROM (SELECT term, sum(tf) AS cnt FROM tf
                                GROUP BY term ORDER BY cnt DESC, term LIMIT 5)),
        qi AS (SELECT q.term,
                      CAST(floor(ln((n.n - dfr.df + 0.5) / (dfr.df + 0.5) + 1.0)
                                 * 1000000000 + 0.5) AS BIGINT) AS idf9
               FROM q JOIN dfr USING (term) CROSS JOIN n),
        sc AS (SELECT tf.doc_id, tf.tf,
                      CAST(floor((qi.idf9 / 1000000000.0)
                           * (tf.tf * 2.2)
                           / (tf.tf + 1.2 * (0.25 + 0.75 * (dl.dl * n.n / tt.t)))
                           * 1000000000 + 0.5) AS BIGINT) AS s9
               FROM tf JOIN qi USING (term) JOIN dl USING (doc_id)
               CROSS JOIN n CROSS JOIN tt),
        pd AS (SELECT doc_id, CAST(sum(s9) AS BIGINT) AS sum9,
                      CAST(sum(tf) AS BIGINT) AS tfsum
               FROM sc GROUP BY doc_id),
        ra AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY sum9 DESC, doc_id)
                 AS INTEGER) AS rank_bm25 FROM pd),
        rb AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY tfsum DESC, doc_id)
                 AS INTEGER) AS rank_tf FROM pd),
        fused AS (SELECT ra.doc_id, rank_bm25, rank_tf,
                         CAST(floor(1000000000.0 / (60 + rank_bm25) + 0.5)
                              + floor(1000000000.0 / (60 + rank_tf) + 0.5)
                              AS BIGINT) AS rrf9
                  FROM ra JOIN rb USING (doc_id)),
        ranked AS (SELECT *, CAST(row_number() OVER (ORDER BY rrf9 DESC, doc_id)
                     AS INTEGER) AS rank
                   FROM fused)
        SELECT rank, doc_id, rank_bm25, rank_tf,
               floor(rrf9 / 1000000000.0 * 1000000 + 0.5) / 1000000.0 AS rrf_score
        FROM ranked WHERE rank <= 10
    """,
    "rank_correlation_report": f"""
        WITH s AS ({_QUAL}),
        j AS (SELECT CAST(d.n_chars AS BIGINT) AS x,
                     CAST(floor(s.q * 1000000.0 + 0.5) AS BIGINT) AS y
              FROM s JOIN documents d USING (doc_id) WHERE s.q IS NOT NULL),
        rx AS (SELECT x, CAST(2 * coalesce(sum(c) OVER (ORDER BY x
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + c + 1
                 AS BIGINT) AS r2x
               FROM (SELECT x, CAST(count(*) AS BIGINT) AS c FROM j GROUP BY x)),
        ry AS (SELECT y, CAST(2 * coalesce(sum(c) OVER (ORDER BY y
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + c + 1
                 AS BIGINT) AS r2y
               FROM (SELECT y, CAST(count(*) AS BIGINT) AS c FROM j GROUP BY y)),
        r AS (SELECT j.x, j.y, rx.r2x, ry.r2y
              FROM j JOIN rx USING (x) JOIN ry USING (y)),
        agg AS (SELECT CAST(count(*) AS HUGEINT) AS n,
                       sum(CAST(x AS HUGEINT)) AS sx,
                       sum(CAST(y AS HUGEINT)) AS sy,
                       sum(CAST(x AS HUGEINT) * y) AS sxy,
                       sum(CAST(x AS HUGEINT) * x) AS sxx,
                       sum(CAST(y AS HUGEINT) * y) AS syy,
                       sum(CAST(r2x AS HUGEINT)) AS srx,
                       sum(CAST(r2y AS HUGEINT)) AS sry,
                       sum(CAST(r2x AS HUGEINT) * r2y) AS srxy,
                       sum(CAST(r2x AS HUGEINT) * r2x) AS srxx,
                       sum(CAST(r2y AS HUGEINT) * r2y) AS sryy
                FROM r)
        SELECT CAST(n AS BIGINT) AS n_docs,
               floor(CAST(n * sxy - sx * sy AS DOUBLE)
                     / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                            * CAST(n * syy - sy * sy AS DOUBLE))
                     * 1000000 + 0.5) / 1000000.0 AS pearson_r,
               floor(CAST(n * srxy - srx * sry AS DOUBLE)
                     / sqrt(CAST(n * srxx - srx * srx AS DOUBLE)
                            * CAST(n * sryy - sry * sry AS DOUBLE))
                     * 1000000 + 0.5) / 1000000.0 AS spearman_rho
        FROM agg
    """,
    "matryoshka_recall_report": """
        WITH qf AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
                    FROM embeddings WHERE vec_id < 20),
        cf AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
               FROM embeddings),
        sf AS (SELECT query_id, neighbor_id,
                      round(list_cosine_similarity(qv, cv), 6) AS cosine_sim
               FROM qf, cf WHERE neighbor_id <> query_id),
        exact AS (SELECT query_id, neighbor_id FROM (
                    SELECT *, row_number() OVER (PARTITION BY query_id
                      ORDER BY cosine_sim DESC, neighbor_id) AS rank
                    FROM sf)
                  WHERE rank <= 5),
        q16 AS (SELECT vec_id AS query_id, (CAST(embedding AS DOUBLE[]))[1:16] AS qv
                FROM embeddings WHERE vec_id < 20),
        c16 AS (SELECT vec_id AS neighbor_id, (CAST(embedding AS DOUBLE[]))[1:16] AS cv
                FROM embeddings),
        s16 AS (SELECT query_id, neighbor_id,
                       round(list_cosine_similarity(qv, cv), 6) AS cosine_sim
                FROM q16, c16 WHERE neighbor_id <> query_id),
        trunc AS (SELECT query_id, neighbor_id FROM (
                    SELECT *, row_number() OVER (PARTITION BY query_id
                      ORDER BY cosine_sim DESC, neighbor_id) AS rank
                    FROM s16)
                  WHERE rank <= 5)
        SELECT ex.query_id,
               CAST(count(t.neighbor_id) AS BIGINT) AS n_hits,
               floor(count(t.neighbor_id) / 5.0 * 1000000 + 0.5) / 1000000.0
                 AS recall_at_5
        FROM exact ex
        LEFT JOIN trunc t
          ON ex.query_id = t.query_id AND ex.neighbor_id = t.neighbor_id
        GROUP BY ex.query_id
    """,
}

# FULL twin of q_welch_ttest_report: exact integer sufficient stats
# (n, sum cents, sum cents^2 — HUGEINT), then ONE fixed IEEE tree of
# +,-,x,/,sqrt mirrored token for token from the Spark side (correctly
# rounded IEEE ops on identical inputs are engine-identical, no grid).
ORACLES_EVAL["welch_ttest_report"] = """
    WITH g AS (SELECT year(o_orderdate) AS y, CAST(count(*) AS BIGINT) AS n,
                      CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS HUGEINT) AS s,
                      sum(CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS HUGEINT)
                          * CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS q
               FROM orders WHERE year(o_orderdate) IN (1997, 1998) GROUP BY 1),
    a AS (SELECT n AS n_a, s AS sa, q AS qa FROM g WHERE y = 1997),
    b AS (SELECT n AS n_b, s AS sb, q AS qb FROM g WHERE y = 1998),
    t AS (SELECT n_a, n_b, sa, sb,
                 (CAST(qa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE) / n_a)
                   / (n_a - 1) AS va,
                 (CAST(qb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE) / n_b)
                   / (n_b - 1) AS vb
          FROM a, b)
    SELECT n_a, n_b,
           CAST((sa * 10000) // n_a AS BIGINT) / 1000000.0 AS mean_a,
           CAST((sb * 10000) // n_b AS BIGINT) / 1000000.0 AS mean_b,
           floor((CAST(sa AS DOUBLE) / n_a - CAST(sb AS DOUBLE) / n_b)
                 / sqrt(va / n_a + vb / n_b) * 1000000 + 0.5) / 1000000.0 AS t_stat,
           floor(((va / n_a + vb / n_b) * (va / n_a + vb / n_b))
                 / ((va / n_a) * (va / n_a) / (n_a - 1)
                    + (vb / n_b) * (vb / n_b) / (n_b - 1))
                 * 1000000 + 0.5) / 1000000.0 AS welch_df
    FROM t
"""

# FULL twin of q_ols_daily_trend: exact HUGEINT sufficient statistics,
# then the identical IEEE +,-,x,/ tree (the welch_ttest device).
ORACLES_EVAL["ols_daily_trend"] = """
    WITH daily AS (SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS x,
                          CAST(count(*) AS BIGINT) AS y
                   FROM events GROUP BY 1),
    g AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(x) AS HUGEINT) AS sx,
                 CAST(sum(y) AS HUGEINT) AS sy,
                 sum(CAST(x AS HUGEINT) * y) AS sxy,
                 sum(CAST(x AS HUGEINT) * x) AS sxx,
                 sum(CAST(y AS HUGEINT) * y) AS syy
          FROM daily)
    SELECT n,
           floor((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                 * 1000000 + 0.5) / 1000000.0 AS slope_per_day,
           floor(((CAST(sy AS DOUBLE)
                   - (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                     * CAST(sx AS DOUBLE)) / n)
                 * 1000000 + 0.5) / 1000000.0 AS intercept,
           floor(((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                  * (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
                 / ((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
                 * 1000000 + 0.5) / 1000000.0 AS r_squared
    FROM g
"""

# FULL twin of q_time_weighted_value: micro-unit values, exact integer
# durations, HUGEINT numerator, exact floor division.
ORACLES_EVAL["time_weighted_value"] = """
    WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS us,
                       CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS vm
                FROM events),
    seg AS (SELECT user_id, vm,
                   lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) - us AS dur
            FROM ev),
    g AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
                 CAST(sum(CAST(vm AS HUGEINT) * dur) AS HUGEINT) AS num,
                 CAST(sum(dur) AS BIGINT) AS den
          FROM seg GROUP BY user_id)
    SELECT user_id, n_events,
           CAST(num // den AS BIGINT) / 1000000.0 AS twa_value
    FROM g WHERE den > 0
"""

# FULL twin of q_conversion_wilson_ci: exact k/n, the identical Wilson
# IEEE tree with the hardcoded z = 1.96 / z^2 = 3.8416 literals.
ORACLES_EVAL["conversion_wilson_ci"] = """
    WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
    ft AS (SELECT user_id, event_type, min(us) AS t0 FROM ev
           WHERE event_type IN ('click', 'view', 'signup')
           GROUP BY 1, 2),
    lp AS (SELECT user_id, max(us) AS tp_last FROM ev
           WHERE event_type = 'purchase' GROUP BY 1),
    per AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_users,
                   CAST(sum(CASE WHEN tp_last >= t0 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_converted
            FROM ft LEFT JOIN lp USING (user_id)
            GROUP BY event_type)
    SELECT event_type AS touch_type, n_users, n_converted,
           floor(n_converted / CAST(n_users AS DOUBLE) * 1000000 + 0.5) / 1000000.0 AS p_hat,
           floor(((n_converted / CAST(n_users AS DOUBLE) + 3.8416 / (2 * n_users)
                   - 1.96 * sqrt(n_converted / CAST(n_users AS DOUBLE)
                                 * (1 - n_converted / CAST(n_users AS DOUBLE)) / n_users
                                 + 3.8416 / (4 * n_users * n_users)))
                  / (1 + 3.8416 / n_users)) * 1000000 + 0.5) / 1000000.0 AS wilson_lo,
           floor(((n_converted / CAST(n_users AS DOUBLE) + 3.8416 / (2 * n_users)
                   + 1.96 * sqrt(n_converted / CAST(n_users AS DOUBLE)
                                 * (1 - n_converted / CAST(n_users AS DOUBLE)) / n_users
                                 + 3.8416 / (4 * n_users * n_users)))
                  / (1 + 3.8416 / n_users)) * 1000000 + 0.5) / 1000000.0 AS wilson_hi
    FROM per
"""

# FULL twin of q_fd_violation_report: pure integer FD profiling.
ORACLES_EVAL["fd_violation_report"] = """
    WITH a AS (SELECT 'p_name->p_size' AS fd,
                      CAST(count(*) AS BIGINT) AS n_lhs_groups,
                      CAST(sum(CASE WHEN d > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating,
                      CAST(max(d) AS BIGINT) AS max_distinct_rhs
               FROM (SELECT p_name, count(DISTINCT p_size) AS d FROM part GROUP BY 1)),
    b AS (SELECT 'p_name->price_cents',
                 CAST(count(*) AS BIGINT),
                 CAST(sum(CASE WHEN d > 1 THEN 1 ELSE 0 END) AS BIGINT),
                 CAST(max(d) AS BIGINT)
          FROM (SELECT p_name,
                       count(DISTINCT CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT)) AS d
                FROM part GROUP BY 1)),
    c AS (SELECT 'brand_type->p_size',
                 CAST(count(*) AS BIGINT),
                 CAST(sum(CASE WHEN d > 1 THEN 1 ELSE 0 END) AS BIGINT),
                 CAST(max(d) AS BIGINT)
          FROM (SELECT concat_ws('|', p_brand, p_type), count(DISTINCT p_size) AS d
                FROM part GROUP BY 1))
    SELECT * FROM a UNION ALL SELECT * FROM b UNION ALL SELECT * FROM c
"""

# FULL twin of q_correlation_matrix: exact integer sufficient stats in
# one pass, the identical IEEE tree per pair.
ORACLES_EVAL["correlation_matrix"] = """
    WITH base AS (SELECT CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS qty,
                         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS pc,
                         CAST(floor(l_discount * 10000 + 0.5) AS BIGINT) AS db
                  FROM lineitem),
    g AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(qty) AS HUGEINT) AS s_q, sum(CAST(qty AS HUGEINT) * qty) AS q_q,
                 CAST(sum(pc) AS HUGEINT) AS s_p, sum(CAST(pc AS HUGEINT) * pc) AS q_p,
                 CAST(sum(db) AS HUGEINT) AS s_d, sum(CAST(db AS HUGEINT) * db) AS q_d,
                 sum(CAST(qty AS HUGEINT) * pc) AS x_qp,
                 sum(CAST(qty AS HUGEINT) * db) AS x_qd,
                 sum(CAST(pc AS HUGEINT) * db) AS x_pd
          FROM base)
    SELECT 'quantity' AS col_a, 'price_cents' AS col_b, n,
           floor((n * CAST(x_qp AS DOUBLE) - CAST(s_q AS DOUBLE) * CAST(s_p AS DOUBLE))
                 / sqrt((n * CAST(q_q AS DOUBLE) - CAST(s_q AS DOUBLE) * CAST(s_q AS DOUBLE))
                        * (n * CAST(q_p AS DOUBLE) - CAST(s_p AS DOUBLE) * CAST(s_p AS DOUBLE)))
                 * 1000000 + 0.5) / 1000000.0 AS pearson_r
    FROM g
    UNION ALL
    SELECT 'quantity', 'discount_bp', n,
           floor((n * CAST(x_qd AS DOUBLE) - CAST(s_q AS DOUBLE) * CAST(s_d AS DOUBLE))
                 / sqrt((n * CAST(q_q AS DOUBLE) - CAST(s_q AS DOUBLE) * CAST(s_q AS DOUBLE))
                        * (n * CAST(q_d AS DOUBLE) - CAST(s_d AS DOUBLE) * CAST(s_d AS DOUBLE)))
                 * 1000000 + 0.5) / 1000000.0
    FROM g
    UNION ALL
    SELECT 'price_cents', 'discount_bp', n,
           floor((n * CAST(x_pd AS DOUBLE) - CAST(s_p AS DOUBLE) * CAST(s_d AS DOUBLE))
                 / sqrt((n * CAST(q_p AS DOUBLE) - CAST(s_p AS DOUBLE) * CAST(s_p AS DOUBLE))
                        * (n * CAST(q_d AS DOUBLE) - CAST(s_d AS DOUBLE) * CAST(s_d AS DOUBLE)))
                 * 1000000 + 0.5) / 1000000.0
    FROM g
"""

# FULL twin of q_cramers_v_status_priority: nano-snapped chi-square
# cell terms from HUGEINT products, one fixed tree for V.
ORACLES_EVAL["cramers_v_status_priority"] = """
    WITH cells AS (SELECT o_orderstatus AS s, o_orderpriority AS p,
                          CAST(count(*) AS BIGINT) AS o
                   FROM orders GROUP BY 1, 2),
    rs AS (SELECT s, CAST(sum(o) AS BIGINT) AS r FROM cells GROUP BY s),
    cs AS (SELECT p, CAST(sum(o) AS BIGINT) AS c FROM cells GROUP BY p),
    tot AS (SELECT CAST(sum(o) AS BIGINT) AS n,
                   CAST(count(DISTINCT s) AS BIGINT) AS nr,
                   CAST(count(DISTINCT p) AS BIGINT) AS nc
            FROM cells),
    terms AS (SELECT CAST(floor(
                CAST((CAST(o AS HUGEINT) * n - CAST(r AS HUGEINT) * c)
                     * (CAST(o AS HUGEINT) * n - CAST(r AS HUGEINT) * c) AS DOUBLE)
                / CAST(CAST(r AS HUGEINT) * c * n AS DOUBLE)
                * 1000000000 + 0.5) AS BIGINT) AS t9,
                     n, nr, nc
              FROM cells JOIN rs USING (s) JOIN cs USING (p), tot),
    g AS (SELECT CAST(sum(t9) AS BIGINT) AS chi9, max(n) AS n,
                 max(least(nr - 1, nc - 1)) AS k
          FROM terms)
    SELECT n,
           floor(chi9 / 1000000000.0 * 1000000 + 0.5) / 1000000.0 AS chi_square,
           floor(sqrt(chi9 / 1000000000.0 / n / k) * 1000000 + 0.5) / 1000000.0 AS cramers_v
    FROM g
"""
