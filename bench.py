"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "total_wall_sec", "value": N, "unit": "sec",
   "queries": {"q1": sec, ...}, "sf": 0.1}

Per normal bench practice, JVM/session startup is excluded (the session
is built and warmed before timing). Each query is forced end-to-end with
the noop sink so every output column is actually computed (a bare
count() would let Catalyst prune the expensive expressions away).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kickstarter_etl_pipeline_spark.session import get_spark
from kickstarter_etl_pipeline_spark import queries as Q

#: Headline set: the reference-parity pipeline (star build + rollup),
#: the classic analytics shapes, and one of each extension family at
#: its scale-path variant (LSH, not the quadratic exact ops).
BENCH_QUERIES = [
    "star_flagship",
    "fact_star",
    "q1_pricing_summary",
    "topk_customers",
    "window_running_sum",
    "region_rollup",
    "events_tumbling",
    "events_sessionize",
    "dedup_exact",
    "text_stats",
    "minhash_dedup_pairs",
    "embedding_topk",
    # round 2: skew-mitigated join, 6-way join shape, multi-table ANN
    "skew_salted_join",
    "q7_nation_volume",
    "ann_lsh_topk",
    # round 3: pushdown canary, broadcast-heavy profit rollup, regex
    # scrub throughput (the new-surface representatives)
    "q6_forecast_revenue",
    "q9_product_profit",
    "pii_scrub",
    # round 7 breadth (VERDICT r6 task 5): one representative per tier
    # added in rounds 5-6 so a perf regression in the newest families
    # shows up in BENCH deltas — iterative graph, embedding-cell dedup,
    # multi-granularity streaming rollup, exploded-gram span stats,
    # greedy re-rank, Merkle-bucket diff.
    "graph_pagerank",
    "semantic_dedup",
    "events_stream_hourly_daily",
    "duplicate_ngram_spans",
    "mmr_diversified_topk",
    "table_diff_report",
    # round 8: the de-ceilinged two-phase quantile path (rfm was the r7
    # verdict's one `weak` — its cost is now a regression canary), the
    # ntile(100) banding built on the same machinery, and the forward
    # as-of window shape.
    "rfm_segments",
    "price_percentile_bands",
    "events_asof_next_purchase",
    # round 9 (r8 verdict task 8): the three heaviest iterative tiers.
    # r8 had left them out on the argument that graph_pagerank already
    # represents the control-loop regime, but these are the most
    # expensive queries in the registry — a regression in the Lloyd
    # trainer, the power iteration, or the SimHash CC composition is
    # exactly the kind min-of-5 exists to catch, and iteration-count ×
    # scheduling overhead IS their production cost model.
    "ann_ivf_topk",
    "embedding_pca_top",
    "simhash_near_dup_clusters",
    # round 9, third session: the three new queries all land in the
    # heavier tier at sf0.1 (2.7-4.1 s min-of-3 on first measurement) —
    # DSIR's corpus explode, the path-doubling closure's iterative
    # regime, and SNM's two-sort + exact-truth composition each get a
    # regression canary from day one.
    "dsir_selection_report",
    "part_hierarchy_rollup",
    "snm_blocking_report",
    # round 9, fourth session: the heaviest of the late round-9
    # additions at sf0.1 (min-of-2 probe: graph_hits 4.23 s,
    # rrf_fusion_topk 3.52 s, graph_bfs_depths 1.83 s). HITS is the
    # exact-integer-spine iterative regime, RRF runs two full
    # two_phase_rank rankings, BFS is the frontier-expansion loop —
    # three distinct cost models, each worth its own canary. The
    # remaining unbenched round-9 queries all probe under 1.8 s and
    # share cost models with benched entries (kcore ≈ bfs's per-round
    # frontier joins, window_cume_dist ≈ window_running_sum's single
    # exchange).
    "graph_hits",
    "rrf_fusion_topk",
    "graph_bfs_depths",
    # round 9, fourth session (cont.): the heaviest of the nine new
    # queries at sf0.1 (idle min-of-3: jaccard_prefix_join 4.71 s,
    # bootstrap_ci_report 4.29 s, graph_spectral_partition 3.88 s) —
    # the prefix-filter join pipeline, the 32-replicate one-pass
    # bootstrap, and a third iterative-graph cost model.
    "jaccard_prefix_join",
    "bootstrap_ci_report",
    "graph_spectral_partition",
    # the only data-proportional self-join of the late round-9 batch
    # (3.18 s idle min-of-2 at sf0.1; everything else in that batch
    # probes under 1.8 s and shares benched cost models).
    "item_cooccurrence_topk",
    # round 10: all thirteen additions probe ≤ 1.8 s at sf0.1 (idle
    # min-of-3); two get canaries for cost models the bench doesn't
    # already watch — the 8-round driver-looped integer power
    # iteration (distinct from pagerank/hits: per-round frames are
    # CONSTANT-size, so its cost is pure scheduling round-trip), and
    # the per-document sliding-window-over-grams shape (distinct from
    # duplicate_ngram_spans' flat gram explode). The other eleven
    # share benched models (two_phase_rank picks, one-row moment
    # reduces, bounded self-joins).
    "markov_stationary",
    "winnowing_fingerprints",
    # round 12 (VERDICT r11 task 7): the multimodal decode path gets a
    # bench-scale canary — media_frame_stats drives the Arrow-batched
    # mapInPandas frame sampler over the binary payload column (the
    # only cost model in the registry that crosses the Python boundary
    # per batch; 0.8-2.3 s min-of-3 probe at sf0.1), and the new
    # stateful pattern detector rides the applyInPandasWithState state
    # store, which events_stream_hourly_daily (JVM-side windowed aggs)
    # does not exercise.
    "media_frame_stats",
    "events_stream_conversions",
    # round 12, continuation session: three new cost models. The
    # sampled Brandes betweenness is the heaviest new query (~6-8 s
    # probe at sf0.1) and the only 3-phase level-synchronous loop;
    # greedy max-coverage is the only iterative corpus-scale anti-join
    # (its 36→8 s pair-build funnel fix is exactly what this canary
    # guards); Holt-Winters is the first bench entry for the
    # collect+JVM-sequential-fold family (events_ewma/holt share the
    # model). graph_harmonic_centrality and graph_rotor_walks share
    # graph_bfs_depths' frontier-loop model and probe under 4 s — no
    # separate canary.
    "graph_betweenness",
    "coverage_selection_report",
    "holt_winters_forecast",
    # k-truss is the registry's heaviest query even after the
    # fixed-point early exit (16 -> ~5 s at sf0.1): repeated triangle
    # enumeration is its own cost model (support peeling), and the
    # early-exit count probes are part of what this canary watches.
    # graph_ppr (~4 s) shares pagerank's benched model; the other
    # continuation additions probe under 4 s on benched models.
    "graph_ktruss",
    # round 13: the REAL image-decode path (PPM payload build → pure-
    # Python byte parse + numpy channel sums inside mapInPandas) is a
    # distinct cost model from media_frame_stats' 1→N chunker — the
    # decode canary guards the per-payload Python parse cost staying
    # linear; the composed curation pack manifest is the heaviest
    # multi-stage corpus plan (clean → shingle decontamination join →
    # packing window → mix rollup in ONE plan) and watches for lost
    # exchange reuse across its shared clean-corpus subtree.
    "image_decode_stats",
    "curation_pack_manifest",
    # the transformWithState sessionizer is the one cost model no other
    # entry watches: per-key JVM↔Python state-protocol round-trips
    # (protobuf wire messages through the vendored runtime) against the
    # RocksDB store — ~5 s warm at sf0.1, ~1.5 s of it fixed streaming
    # setup. events_tws_user_profile shares the model (not benched).
    "events_tws_sessions",
    # round 14: the model-based curation family's composed unit. Its
    # cost model is new to the bench: a driver-looped fit whose every
    # epoch re-aggregates the FULL checkpointed feature frame (8
    # corpus-sized map-side-combined scans + 1-row broadcasts — unlike
    # markov_stationary's constant-size iterate frames), then a
    # two_phase_rank global order for the calibrated selection.
    # ~2.5 s min-of-3 probe at sf0.1 under loadavg ~2.3.
    "classifier_curation_manifest",
    # round 15: the BPE trainer is a new driver-looped cost model —
    # each of its 8 rounds runs a bounded-key pair aggregate over the
    # word-frequency table + a 1-row argmax collect + a per-row string
    # fold re-checkpoint, so its cost is rounds × (tiny-agg scheduling
    # + vocab map), distinct from the classifier's corpus-sized epoch
    # re-scans. The recursive CTE is the first UnionLoop plan in the
    # registry (per-level frontier joins inside ONE query — engine-
    # managed iteration vs the driver-managed loops above). Probes at
    # sf0.1 (warm min-of-2): bpe 5.7 s (8 rounds x ~0.6 s of
    # scheduling + the one corpus-sized v0 groupBy), recursive 2.4 s.
    "bpe_train_merges",
    "recursive_cte_ancestor_paths",
]


def force(df) -> None:
    """Execute the full plan, computing every output column, no disk IO."""
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    match = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(match.group(1)) if match else None
    # min-of-5 default (r7; was 3, was 2): the min over N samples is the
    # reproducible plan cost on a host with unrelated tenant load
    # (loadavg recorded below) — with too few samples, contended runs
    # leak into the min (r4→r5 saw 2× swings on identical code) and C2
    # JIT is still deepening (q7 decays 2.09 → 1.21 s across six runs);
    # five samples land within a few percent of steady state. Policy is
    # recorded in the output.
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))

    load_start = os.getloadavg()
    spark = get_spark("kickstarter-etl-bench")
    registry = Q.queries()

    # Warm the JVM outside the timed region, JMH-style: run every bench
    # query once at the smallest fixture so whole-stage codegen classes
    # compile and C2 JIT kicks in on the same expression shapes that get
    # timed. Data volume is ~100× smaller than the timed SF, so this
    # warms code paths, not caches of the benchmarked data. First-run
    # codegen cost was dominating min-of-N otherwise (observed 14.6 s
    # first / 3.0 s steady on the LSH plan).
    # Two-stage warm (round-7 q7 bisect): the sf0.001 pass compiles the
    # whole-stage-codegen classes, but C2 JIT compiles the generated hot
    # loops only after enough invocations — which tiny data doesn't
    # provide. Measured on an idle host, q7_nation_volume's sf0.1 cost
    # decays 2.09 → 1.21 s over six runs after an sf0.001-only warm; a
    # second warm pass at sf0.01 moves min-of-3 from ~1.45 to ~1.29 s.
    # The residual r5→r6 "regression" was warmup depth + host variance,
    # not a plan change (session.py and tpch_queries.py byte-identical).
    warm_dir = os.environ.get("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    warm2_dir = os.environ.get("SPARK_GRAFT_WARM2_DIR", "/root/testdata/sf0.01")
    if not os.path.isdir(warm2_dir):
        warm2_dir = warm_dir
    registry["group_count_ordered"](spark, warm_dir).collect()
    for name in BENCH_QUERIES:
        force(registry[name](spark, warm_dir))
    for name in BENCH_QUERIES:
        force(registry[name](spark, warm2_dir))

    # min-of-N per query: transient machine contention (other tenants of
    # the bench host) shows up as a one-run outlier; the min is the
    # reproducible cost of the plan. Checkpoint blocks from finished
    # queries are reclaimed by the ContextCleaner as frames go out of
    # scope — no explicit unpersist between queries (an unpersist of a
    # locally-checkpointed RDD both spews WARNs and risks freeing blocks
    # a still-referenced frame needs).
    timings: dict[str, float] = {}
    all_runs: dict[str, list[float]] = {}
    for name in BENCH_QUERIES:
        samples = []
        for _ in range(runs):
            start = time.perf_counter()
            force(registry[name](spark, sf_dir))
            samples.append(round(time.perf_counter() - start, 3))
        all_runs[name] = samples
        timings[name] = min(samples)

    # Round-8 capture fix (VERDICT r7 finding 2): the r7 stdout blob
    # (per-query min-of-5 `runs` lists) overflowed the driver's capture
    # window and BENCH_r07 recorded `parsed: null`. stdout now carries
    # ONLY the compact contract line (per-query min + total); the full
    # sample lists and loadavg go to BENCH_DETAIL.json next to this
    # script for human/judge inspection.
    detail = {
        "policy": f"min_of_{runs}",
        "runs": all_runs,
        "loadavg_start": [round(x, 2) for x in load_start],
        "loadavg_end": [round(x, 2) for x in os.getloadavg()],
    }
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    try:
        with open(detail_path, "w") as fh:
            json.dump(detail, fh, indent=1, sort_keys=True)
    except OSError:
        pass  # detail file is best-effort; the contract line below is not
    print(
        json.dumps(
            {
                "metric": "total_wall_sec",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "policy": f"min_of_{runs}",
            }
        )
    )


if __name__ == "__main__":
    main()
