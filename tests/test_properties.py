"""Property-based tests (hypothesis): operators vs independent reference
implementations on randomized inputs.

Few examples, large strategy space — each example is a Spark round-trip,
so the budget goes to input diversity, not repetition.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

from kickstarter_etl_pipeline_spark.operators.dedup import minhash_dedup_pairs, ngram_jaccard_pairs
from kickstarter_etl_pipeline_spark.operators.dims import dim_from_distinct
from kickstarter_etl_pipeline_spark.operators.joins import asof_join_backward, salted_join
from kickstarter_etl_pipeline_spark.operators.text import rolling_hash

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from kickstarter_etl_pipeline_spark.session import get_spark

        _spark = get_spark("property-tests", master="local[8]")
    return _spark


@SETTINGS
@given(
    events=st.lists(
        st.tuples(
            st.integers(0, 3),          # user/key
            st.integers(0, 10_000),     # ts seconds
            st.sampled_from(["l", "r"]),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_asof_join_matches_bruteforce(events):
    spark = _get_spark()
    rows = [
        (i, key, ts, side) for i, (key, ts, side) in enumerate(events)
    ]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "sec", "side"]).withColumn(
        "ts", F.timestamp_seconds(F.col("sec"))
    ).withColumn("value", F.col("event_id") * 1.0)
    left = df.filter(F.col("side") == "l")
    right = df.filter(F.col("side") == "r")
    got = {
        (r["user_id"], r["event_id"]): r["asof_right_id"]
        for r in asof_join_backward(
            left, right, on="user_id", left_ts="ts", right_ts="ts",
            right_value_cols=["value"], left_id="event_id", right_id="event_id",
        ).collect()
    }
    # Brute force in Python: latest right with ts <= left ts; tie → max id at that ts
    rights = [(k, t, i) for i, (k, t, s) in enumerate(events) if s == "r"]
    for i, (k, t, s) in enumerate(events):
        if s != "l":
            continue
        candidates = [(rt, ri) for rk, rt, ri in rights if rk == k and rt <= t]
        expected = max(candidates)[1] if candidates else None
        assert got[(k, i)] == expected, (i, k, t, candidates)


@SETTINGS
@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcdefg"), min_size=3, max_size=12).map(" ".join),
        min_size=2,
        max_size=12,
    )
)
def test_minhash_pairs_subset_of_exact(docs):
    spark = _get_spark()
    df = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "text"])
    exact = {(r["id_a"], r["id_b"]) for r in ngram_jaccard_pairs(df, threshold=0.8).collect()}
    lsh = {(r["id_a"], r["id_b"]) for r in minhash_dedup_pairs(df, threshold=0.8).collect()}
    assert lsh <= exact
    # identical docs are always caught (every band collides)
    identical = {
        (a, b)
        for a, ta in enumerate(docs)
        for b, tb in enumerate(docs)
        if a < b and ta == tb and len(ta.split()) >= 3
    }
    assert identical <= lsh


@SETTINGS
@given(names=st.sets(st.text(alphabet="abcdef", min_size=1, max_size=6), min_size=1, max_size=20))
def test_dim_keys_dense_and_sorted(names):
    spark = _get_spark()
    df = spark.createDataFrame([(n,) for n in names] * 2, ["state_name"]).repartition(4)
    dim = dim_from_distinct(df, ["state_name"], key_col="state_key").collect()
    by_key = sorted((r["state_key"], r["state_name"]) for r in dim)
    assert [k for k, _ in by_key] == list(range(1, len(names) + 1))
    assert [n for _, n in by_key] == sorted(names)


@SETTINGS
@given(text=st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=60))
def test_rolling_hash_matches_python(text):
    spark = _get_spark()
    df = spark.createDataFrame([(text,)], ["t"])
    got = df.select(rolling_hash("t").alias("h")).collect()[0]["h"]
    expected = 0
    for ch in text:
        expected = (expected * 31 + ord(ch)) % 1_000_000_007
    assert got == expected


def test_salted_join_equals_plain_join():
    spark = _get_spark()
    # skewed: 90% of rows share one key
    large = spark.createDataFrame(
        [(1 if i % 10 else i, i) for i in range(1000)], ["k", "payload"]
    )
    small = spark.createDataFrame([(i, f"v{i}") for i in range(0, 100)], ["k", "v"])
    plain = {tuple(r) for r in large.join(small, on=["k"]).collect()}
    salted = {tuple(r) for r in salted_join(large, small, on=["k"]).collect()}
    assert salted == plain
