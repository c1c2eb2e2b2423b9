"""Round-14 DuckDB oracle twins.

Same contract as every other ledger: each entry is the ANSI-SQL twin
of the identically-named ``queries()`` entry, producing IDENTICAL
column names and bit-identical values under the driver normalization
(columns sorted by name, rows sorted, floats repr'd post-rounding).
"""

from __future__ import annotations

ORACLES_R14: dict[str, str] = {}


# FULL twin of q_events_tws_restart_totals (streaming/tws_recovery.py):
# the two-phase stop/resume replay folds per-user (count, value-sum)
# across a RocksDB-checkpoint restart, so phase 2 emits — for every
# user with events AFTER the integer-µs midpoint cut — the totals over
# ALL their events. Exactly-once: if half A were re-read on resume the
# counts would inflate; if state were lost they would undercount;
# either fails this hash. `(min+max) // 2` is DuckDB's integer
# division, matching the Python `//` the operator uses on the same
# unix_micros values; round(·, 4) is the shared 2dp-value sum snap
# (the events_tws_sessions precedent).
ORACLES_R14["events_tws_restart_totals"] = """
    WITH e AS (SELECT user_id, value, epoch_us(ts) AS us FROM events),
    c AS (SELECT (min(us) + max(us)) // 2 AS cut FROM e)
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_total,
           round(sum(value), 4) AS sum_value
    FROM e, c
    GROUP BY user_id
    HAVING max(CASE WHEN us > cut THEN 1 ELSE 0 END) = 1
"""


# FULL twin of q_events_tws_ttl_counts: two otherwise-identical
# per-user counters, one with a 500 ms TTLConfig. Between the replay's
# phases (a full query teardown + restart, reliably seconds) the TTL'd
# state expires, so for every user active in half B: n_keep = count
# over BOTH halves (no-TTL state survived the restart), n_ttl = count
# over half B alone (TTL'd state evicted). A broken TTL makes
# n_ttl == n_keep and fails this hash; a broken restart breaks n_keep.
ORACLES_R14["events_tws_ttl_counts"] = """
    WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
    c AS (SELECT (min(us) + max(us)) // 2 AS cut FROM e)
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_keep,
           CAST(sum(CASE WHEN us > cut THEN 1 ELSE 0 END) AS BIGINT) AS n_ttl
    FROM e, c
    GROUP BY user_id
    HAVING sum(CASE WHEN us > cut THEN 1 ELSE 0 END) > 0
"""
