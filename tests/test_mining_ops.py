"""Unit tests for the round-6 mining operators (query-level oracle
parity is covered by test_oracle_parity's automatic parametrization)."""

from pyspark.sql import functions as F


def test_bloom_prefilter_superset_and_transparency(spark):
    """The prefilter output must contain EVERY true match (no false
    negatives — the correctness half of a bloom filter) and the exact
    join over the prefiltered fact must equal the plain join."""
    from kickstarter_etl_pipeline_spark.operators.joins import bloom_prefilter

    fact = spark.range(0, 5000).select(F.col("id").alias("k"), (F.col("id") % 97).alias("v"))
    keys = spark.range(0, 5000, 13).select(F.col("id").alias("k"))  # every 13th key
    pre = bloom_prefilter(fact, keys, "k", "k", n_bits=4096)
    true_matches = fact.join(keys, "k", "left_semi")
    # no false negatives: every true match survives the prefilter
    assert true_matches.join(pre, "k", "left_anti").count() == 0
    # transparency: exact join after prefilter == plain join
    a = sorted(pre.join(keys, "k").select("k", "v").collect())
    b = sorted(fact.join(keys, "k").select("k", "v").collect())
    assert a == b
    # and it actually prunes (FPR ~ 385/4096 ≈ 9%, far below 100%)
    assert pre.count() < fact.count() * 0.5


def test_duplicate_ngram_spans_edges(spark):
    """Short docs (<n tokens) report 0 positions / NULL ratio; a doc
    repeating another's text has every position duplicated."""
    from kickstarter_etl_pipeline_spark.operators.dedup import duplicate_ngram_span_stats

    base = "a b c d e f g h i j"  # 10 tokens -> 3 positions of 8-grams
    docs = spark.createDataFrame(
        [(1, base), (2, base), (3, "too short"), (4, "u v w x y z q r s t")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in duplicate_ngram_span_stats(docs, n=8).collect()}
    assert out[1]["n_positions"] == 3 and out[1]["n_dup_positions"] == 3
    assert out[1]["dup_ratio"] == 1.0 and out[2]["dup_ratio"] == 1.0
    assert out[3]["n_positions"] == 0 and out[3]["dup_ratio"] is None
    assert out[4]["n_positions"] == 3 and out[4]["n_dup_positions"] == 0


def test_link_prediction_square_graph(spark):
    """On a 4-cycle a-b-c-d-a, the two diagonals (a,c) and (b,d) are the
    only non-adjacent pairs, each with 2 common neighbors and
    Jaccard = 2/(2+2-2) = 1.0."""
    from kickstarter_etl_pipeline_spark.operators.graph import (
        common_neighbor_link_prediction,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 4)], "u long, v long"
    )
    rows = {(r["u"], r["v"]): r for r in common_neighbor_link_prediction(edges).collect()}
    assert set(rows) == {(1, 3), (2, 4)}
    for r in rows.values():
        assert r["n_common"] == 2 and r["jaccard_score"] == 1.0


def test_minhash_estimate_identical_docs(spark):
    """Identical documents must estimate Jaccard 1.0 with zero error."""
    from kickstarter_etl_pipeline_spark.operators.dedup import (
        minhash_md5_estimate_vs_exact,
    )

    text = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame([(1, text), (2, text)], "doc_id long, text string")
    rows = minhash_md5_estimate_vs_exact(docs, num_hashes=16, candidate_threshold=0.3).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["exact_jaccard"] == 1.0 and r["est_jaccard"] == 1.0 and r["abs_err"] == 0.0
