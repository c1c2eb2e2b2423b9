"""Shared DuckDB twin fragment for the co-occurrence graph device.

operators.graph.cooccurrence_nodes (round 11) applies a hard
per-join-key occupancy bound to the error co-occurrence self-join:
within each time bucket, users are ranked by ``(md5(user_id),
user_id)`` — deterministic and engine-portable — and split into
sub-buckets of at most OCCUPANCY_CAP members; pair joins are keyed by
``(bucket, sub_bucket)``. This module emits the byte-for-byte DuckDB
replay of that ranking so every graph-tier twin (pagerank, label
propagation, k-core, BFS, spectral, Bellman-Ford, triangles,
clustering coefficients, assortativity, Adamic-Adar, link prediction)
builds the identical edge set at every scale — including above the
cap, where sub-bucketing actually engages.

Determinism notes: DuckDB ``md5(CAST(user_id AS VARCHAR))`` equals
Spark ``F.md5(F.col("user_id").cast("string"))`` (same decimal string
rendering of BIGINT, same lowercase-hex digest, same byte-lexicographic
string order); ``(rank - 1) // cap`` on BIGINT equals Spark's
``floor((row_number - 1) / cap)`` for any rank below 2^53. The md5
hash is injective per bucket (users are distinct), but user_id stays
as an explicit tie-break on both engines anyway.

This module must import nothing from the package (every oracles_*
ledger imports it, so any package import here risks a cycle).
"""

from __future__ import annotations

# Must stay in lockstep with operators.graph.OCCUPANCY_CAP /
# WEDGE_DEGREE_CAP (asserted equal in tests/test_graph_scale.py).
OCCUPANCY_CAP = 64
WEDGE_DEGREE_CAP = 256


def ranked_cooccurrence_nodes(
    width_us: int, name: str = "n", cap: int = OCCUPANCY_CAP
) -> str:
    """One CTE body: distinct (b, sb, user_id) error-event nodes with
    the hash-ordered sub-bucket column. Splice as
    ``WITH {ranked_cooccurrence_nodes(...)}, edges AS (...)`` and join
    pairs ``ON a.b = c.b AND a.sb = c.sb AND a.user_id < c.user_id``.
    """
    return f"""{name} AS (
      SELECT b, user_id,
             (row_number() OVER (PARTITION BY b
                                 ORDER BY md5(CAST(user_id AS VARCHAR)), user_id)
              - 1) // {cap} AS sb
      FROM (SELECT DISTINCT CAST(floor(epoch_us(ts) / {width_us}) AS BIGINT) AS b,
                            user_id
            FROM events WHERE event_type = 'error'))"""


def cooccurrence_edge_ctes(
    width_us: int,
    nodes: str = "n",
    edges: str = "edges",
    cap: int = OCCUPANCY_CAP,
    materialized: bool = False,
) -> str:
    """The full node + distinct-edge CTE pair most graph twins need."""
    mat = " MATERIALIZED" if materialized else ""
    return f"""{ranked_cooccurrence_nodes(width_us, nodes, cap)},
    {edges} AS{mat} (
      SELECT DISTINCT a.user_id AS u, c.user_id AS v
      FROM {nodes} a JOIN {nodes} c
        ON a.b = c.b AND a.sb = c.sb AND a.user_id < c.user_id)"""
