"""DuckDB oracle twins for the round-11 query additions.

Same contract as the sibling ledgers: byte-identical aliases and the
identical expression tree over exact operands, with derived doubles
snapped via the shared floor(x·10^k + 0.5)/10^k rule where needed.
"""

from __future__ import annotations

from kickstarter_etl_pipeline_spark.oracles_graph_common import cooccurrence_edge_ctes

ORACLES_R11: dict[str, str] = {}

# FULL twin of q_price_quartiles_by_brand: nearest-rank quantiles
# (rank == ceil(q*n)) over the identical (price, orderkey, linenumber)
# per-brand total order; the oracle uses a window rank (correctness
# only — the Spark side uses the composite-key range exchange).
ORACLES_R11["price_quartiles_by_brand"] = """
    WITH j AS (SELECT p.p_brand, l.l_extendedprice, l.l_orderkey, l.l_linenumber
               FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
    ranked AS (
      SELECT p_brand, l_extendedprice,
             CAST(row_number() OVER (PARTITION BY p_brand
                    ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS BIGINT) AS rn,
             CAST(count(*) OVER (PARTITION BY p_brand) AS BIGINT) AS n
      FROM j)
    SELECT p_brand, max(n) AS n_items,
           max(CASE WHEN rn = ceil(0.25 * n) THEN l_extendedprice END) AS p25,
           max(CASE WHEN rn = ceil(0.5 * n) THEN l_extendedprice END) AS p50,
           max(CASE WHEN rn = ceil(0.75 * n) THEN l_extendedprice END) AS p75,
           floor((max(CASE WHEN rn = ceil(0.75 * n) THEN l_extendedprice END)
                  - max(CASE WHEN rn = ceil(0.25 * n) THEN l_extendedprice END))
                 * 100 + 0.5) / 100.0 AS iqr
    FROM ranked GROUP BY p_brand
"""

# FULL twin of q_degree_histogram: the shared occupancy-capped
# 30-minute co-occurrence edge CTEs, vertex degrees, log2 buckets
# (floor(log2(int)) moves only at exact powers of two, where IEEE
# log2 is exact on both engines).
ORACLES_R11["degree_histogram"] = f"""
    WITH {cooccurrence_edge_ctes(1800000000)},
    deg AS (SELECT id, CAST(count(*) AS BIGINT) AS degree FROM (
              SELECT u AS id FROM edges UNION ALL SELECT v FROM edges) GROUP BY id)
    SELECT CAST(floor(log2(CAST(degree AS DOUBLE))) AS BIGINT) AS log2_bucket,
           CAST(count(*) AS BIGINT) AS n_vertices,
           CAST(min(degree) AS BIGINT) AS min_degree,
           CAST(max(degree) AS BIGINT) AS max_degree
    FROM deg GROUP BY 1
"""

# FULL twin of q_token_length_quartiles_by_source: identical
# whitespace tokenization (_TOKS convention), nearest-rank picks
# (rank == ceil(q*n)) over the same (n_tokens, doc_id) per-source
# total order; all outputs exact BIGINTs.
ORACLES_R11["token_length_quartiles_by_source"] = """
    WITH t AS (SELECT source, doc_id,
                      CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS BIGINT) AS nt
               FROM documents),
    ranked AS (
      SELECT source, nt,
             CAST(row_number() OVER (PARTITION BY source ORDER BY nt, doc_id) AS BIGINT) AS rn,
             CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n
      FROM t)
    SELECT source, max(n) AS n_docs,
           CAST(max(CASE WHEN rn = ceil(0.25 * n) THEN nt END) AS BIGINT) AS p25_tokens,
           CAST(max(CASE WHEN rn = ceil(0.5 * n) THEN nt END) AS BIGINT) AS p50_tokens,
           CAST(max(CASE WHEN rn = ceil(0.75 * n) THEN nt END) AS BIGINT) AS p75_tokens,
           CAST(max(CASE WHEN rn = ceil(0.75 * n) THEN nt END)
                - max(CASE WHEN rn = ceil(0.25 * n) THEN nt END) AS BIGINT) AS iqr_tokens
    FROM ranked GROUP BY source
"""
