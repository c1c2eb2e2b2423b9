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

# FULL twin of q_events_stream_conversions: for each purchase, the
# user's latest preceding click in the same (us, event_id) total order
# the stateful fold processes — last_value(... IGNORE NULLS) over rows
# UNBOUNDED PRECEDING..1 PRECEDING replays the "last-observation
# register" state exactly; the 10-minute window literal must stay in
# lockstep with streaming.stateful.CONVERSION_WINDOW_US (2 h).
ORACLES_R12["events_stream_conversions"] = """
    WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us
               FROM events WHERE event_type IN ('click', 'purchase')),
    reg AS (SELECT user_id, event_type, us,
                   last_value(CASE WHEN event_type = 'click' THEN us END IGNORE NULLS)
                     OVER (PARTITION BY user_id ORDER BY us, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                     AS click_us
            FROM e)
    SELECT user_id, CAST(click_us AS BIGINT) AS click_us,
           CAST(us AS BIGINT) AS purchase_us,
           CAST(us - click_us AS BIGINT) AS latency_us
    FROM reg
    WHERE event_type = 'purchase' AND click_us IS NOT NULL
      AND us - click_us <= 7200000000
"""
