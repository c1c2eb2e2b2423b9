"""Interleaved in-session A/B for graph-loop variants (r15).

Variants probed (NEW implemented inline; OLD = the current tree):
  hits:  per-half-round norm as an in-plan broadcast scalar over the
         CHECKPOINT (1 action/half-round) vs the r14 bounded collect
         (2 actions/half-round).
  btw:   backward/BFS loop_frame exchange replaced by a narrow
         coalesce (checkpoint width still pinned, one less exchange
         per round).

Usage: python3 plans/r15/ab_graph.py [reps] [hits|btw ...]
Also checks result equality (sorted rows) once per variant.
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, _REPO)

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from kickstarter_etl_pipeline_spark.session import get_spark  # noqa: E402
from kickstarter_etl_pipeline_spark.sources.readers import load_table  # noqa: E402
from kickstarter_etl_pipeline_spark.operators import events as EV  # noqa: E402
from kickstarter_etl_pipeline_spark.operators import graph as G  # noqa: E402
from kickstarter_etl_pipeline_spark.operators.partitioning import loop_frame  # noqa: E402
from kickstarter_etl_pipeline_spark.operators.rounding import round_det  # noqa: E402

NANO = 1_000_000_000


def hits_new(edges: DataFrame, iterations: int = 4, loop_partitions: int = 8) -> DataFrame:
    e = (
        edges.select(F.col("c").cast("long").alias("_c"), F.col("s").cast("long").alias("_s"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def _normalize(raw: DataFrame, key: str, out: str) -> DataFrame:
        raw = loop_frame(raw, loop_partitions, key)
        s2 = raw.agg(
            F.sum(F.col("_raw").cast("decimal(38,0)") * F.col("_raw")).alias("_s2")
        )
        return raw.crossJoin(F.broadcast(s2)).select(
            key,
            F.floor(
                F.col("_raw").cast("double")
                / F.sqrt(F.col("_s2").cast("double"))
                * F.lit(float(NANO))
                + F.lit(0.5)
            )
            .cast("long")
            .alias(out),
        )

    h = loop_frame(
        e.select("_c").distinct().select("_c", F.lit(NANO).cast("long").alias("_hn")),
        loop_partitions,
        "_c",
    )
    a = None
    for _ in range(iterations):
        a_raw = e.join(h, "_c").groupBy("_s").agg(F.sum("_hn").cast("long").alias("_raw"))
        a = _normalize(a_raw, "_s", "_an")
        h_raw = e.join(a, "_s").groupBy("_c").agg(F.sum("_an").cast("long").alias("_raw"))
        h = _normalize(h_raw, "_c", "_hn")
    hubs = h.select(
        F.lit("hub").alias("role"), F.col("_c").alias("id"),
        round_det(F.col("_hn") / F.lit(float(NANO)), 6).alias("score"),
    )
    auths = a.select(
        F.lit("authority").alias("role"), F.col("_s").alias("id"),
        round_det(F.col("_an") / F.lit(float(NANO)), 6).alias("score"),
    )
    return hubs.unionByName(auths)


def _coalesce_frame(df: DataFrame, n: int) -> DataFrame:
    return df.coalesce(n).localCheckpoint(eager=True)


def betweenness_new(edges: DataFrame, pivots: int = 8, rounds: int = 6,
                    loop_partitions: int = 8) -> DataFrame:
    """Copy of graph.betweenness_sampled with loop_frame -> coalesce in
    BOTH the BFS rounds and the backward levels."""
    sym = (
        edges.select(F.col("u").cast("long").alias("_u"), F.col("v").cast("long").alias("_v"))
        .unionByName(
            edges.select(F.col("v").cast("long").alias("_u"), F.col("u").cast("long").alias("_v"))
        )
        .filter(F.col("_u") != F.col("_v"))
        .distinct()
    )
    sym = loop_frame(sym, loop_partitions, "_u")
    piv = (
        sym.select(F.col("_u").alias("_p")).distinct()
        .orderBy(F.md5(F.col("_p").cast("string")), F.col("_p")).limit(pivots)
    )
    lvl0 = piv.select(
        "_p", F.col("_p").alias("_id"),
        F.lit(0).cast("long").alias("depth"), F.lit(1).cast("long").alias("sigma"),
    ).localCheckpoint(eager=True)
    visited = lvl0
    for t in range(1, rounds + 1):
        nxt = (
            visited.filter(F.col("depth") == t - 1)
            .select("_p", F.col("_id").alias("_u"), "sigma")
            .join(sym, "_u")
            .select("_p", F.col("_v").alias("_id"), "sigma")
            .groupBy("_p", "_id")
            .agg(F.sum("sigma").cast("long").alias("sigma"))
            .join(visited.select("_p", "_id"), ["_p", "_id"], "left_anti")
            .select("_p", "_id", F.lit(t).cast("long").alias("depth"), "sigma")
        )
        visited = _coalesce_frame(visited.unionByName(nxt), loop_partitions)
    _max_sigma, _n_reached = visited.agg(
        F.max("sigma").cast("long"), F.count("*").cast("long")
    ).first()
    G._guard_betweenness_bound(_max_sigma or 0, _n_reached or 0)
    sig_lvls = [
        visited.filter(F.col("depth") == t).select("_p", "_id", "sigma")
        for t in range(rounds + 1)
    ]
    full_delta = {
        rounds: sig_lvls[rounds].select(
            "_p", "_id", "sigma", F.lit(0).cast("long").alias("dnano")
        ).localCheckpoint(eager=True)
    }
    for t in range(rounds - 1, -1, -1):
        succ = full_delta[t + 1].select(
            "_p", "_id", F.col("sigma").alias("_sw"), F.col("dnano").alias("_dw"),
        )
        terms = (
            sig_lvls[t]
            .select("_p", F.col("_id").alias("_u"), F.col("sigma").alias("_sv"))
            .join(sym, "_u")
            .select("_p", "_u", F.col("_v").alias("_id"), "_sv")
            .join(succ, ["_p", "_id"])
            .select("_p", F.col("_u").alias("_id"),
                    F.expr("(_sv * (1000000000 + _dw)) DIV _sw").alias("_term"))
            .groupBy("_p", "_id")
            .agg(F.sum("_term").cast("long").alias("_dn"))
        )
        full_delta[t] = _coalesce_frame(
            sig_lvls[t].join(terms, ["_p", "_id"], "left")
            .select("_p", "_id", "sigma",
                    F.coalesce(F.col("_dn"), F.lit(0).cast("long")).alias("dnano")),
            loop_partitions,
        )
    acc = full_delta[1]
    for t in range(2, rounds + 1):
        acc = acc.unionByName(full_delta[t])
    return acc.groupBy(F.col("_id").alias("id")).agg(
        F.sum("sigma").cast("long").alias("sigma_total"),
        (F.sum("dnano").cast("double") / F.lit(1_000_000_000.0)).alias("_betweenness_raw"),
    )


def force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def _hits_edges(spark, sf):
    orders = load_table(spark, sf, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    return orders.join(li, orders.o_orderkey == li.l_orderkey).select(
        F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s")
    )


def _btw_edges(spark, sf):
    ev = EV.with_unix_micros(load_table(spark, sf, "events"))
    return G.cooccurrence_edges(ev, event_type="error", bucket_seconds=600)


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    names = sys.argv[2:] or ["hits", "btw"]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("r15-ab-graph")
    spark.sparkContext.setLogLevel("ERROR")

    def build(name, mode, sf):
        if name == "hits":
            edges = _hits_edges(spark, sf)
            return G.hits(edges, iterations=4) if mode == "old" else hits_new(edges)
        if name == "btw":
            edges = _btw_edges(spark, sf)
            bc = (G.betweenness_sampled(edges, pivots=8, rounds=6) if mode == "old"
                  else betweenness_new(edges))
            return bc.select(
                F.col("id"), "sigma_total", round_det(F.col("_betweenness_raw"), 6).alias("b")
            )
        raise ValueError(name)

    # equality check once at sf0.01
    for name in names:
        o = sorted(map(tuple, build(name, "old", "/root/testdata/sf0.01").collect()))
        n = sorted(map(tuple, build(name, "new", "/root/testdata/sf0.01").collect()))
        print(f"{name}: equal={o == n} rows={len(o)}")
    # warm at sf0.001 + sf0.01 done above; interleave timed runs
    for name in names:
        olds, news = [], []
        for _ in range(reps):
            t0 = time.perf_counter(); force(build(name, "old", sf_dir)); olds.append(round(time.perf_counter() - t0, 3))
            t0 = time.perf_counter(); force(build(name, "new", sf_dir)); news.append(round(time.perf_counter() - t0, 3))
        print(f"{name}: old {olds} min {min(olds):.3f} | new {news} min {min(news):.3f}")
    print("loadavg", os.getloadavg())


if __name__ == "__main__":
    main()
