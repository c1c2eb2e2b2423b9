"""Round-12 DuckDB oracle twins.

Same contract as every other ledger: each entry is the ANSI-SQL twin
of the identically-named ``queries()`` entry, producing IDENTICAL
column names and bit-identical values under the driver normalization
(columns sorted by name, rows sorted, floats repr'd post-rounding).
"""

from __future__ import annotations

from kickstarter_etl_pipeline_spark.oracles_graph_common import OCCUPANCY_CAP

ORACLES_R12: dict[str, str] = {}

# FULL twin of q_cooccurrence_cap_report: identical distinct
# (bucket, user) node set (epoch_us / 1800000000 buckets over error
# events), per-bucket occupancy, and the same integer pair arithmetic
# — a bucket of occupancy n emits (n // cap)·C(cap,2) + C(n % cap, 2)
# pairs under the cap vs C(n,2) unsalted; k·(k−1) // 2 is exact.
_CAP = OCCUPANCY_CAP
_FULL_SUB_PAIRS = _CAP * (_CAP - 1) // 2
ORACLES_R12["cooccurrence_cap_report"] = f"""
    WITH nodes AS (
      SELECT DISTINCT CAST(floor(epoch_us(ts) / 1800000000) AS BIGINT) AS b,
                      user_id
      FROM events WHERE event_type = 'error'),
    pb AS (SELECT b, CAST(count(*) AS BIGINT) AS occ FROM nodes GROUP BY b)
    SELECT CAST(count(*) AS BIGINT) AS n_buckets,
           CAST(sum(CASE WHEN occ > {_CAP} THEN 1 ELSE 0 END) AS BIGINT)
             AS capped_buckets,
           CAST(max(occ) AS BIGINT) AS max_occupancy,
           CAST(sum(occ) AS BIGINT) AS total_nodes,
           CAST(sum((occ // {_CAP}) * {_FULL_SUB_PAIRS}
                    + ((occ % {_CAP}) * (occ % {_CAP} - 1)) // 2) AS BIGINT)
             AS emitted_pairs,
           CAST(sum((occ * (occ - 1)) // 2) AS BIGINT) AS unsalted_pairs
    FROM pb
"""
