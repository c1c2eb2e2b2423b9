"""Reference-parity semantics for the Kickstarter transform operators.

Encodes the reference's golden invariants (SURVEY.md §5.1) on synthesized
raw rows: fractional duration (src/etl_pipeline.py:95), the weekend
off-by-one trap (:186), success flag (:109), name-null drop (:113), the
13-column projection (:123-137), and the star-schema decomposition with
dense sorted surrogate keys (:222-254).
"""

from __future__ import annotations

import pytest

from pyspark.sql import Row, functions as F

from kickstarter_etl_pipeline_spark.operators import transform as X
from kickstarter_etl_pipeline_spark.plans.star import kickstarter_star


def raw_rows(spark):
    rows = [
        # ID, name, category, main_category, currency, deadline, goal,
        # launched, pledged, state, backers, country, usd pledged, usd_pledged_real, usd_goal_real
        Row(ID=1, name="A", category="Rock", main_category="Music", currency="USD",
            deadline="2016-02-01", goal=100.0, launched="2016-01-02 00:00:00", pledged=50.0,
            state="successful", backers=3, country="US", **{"usd pledged": 50.0},
            usd_pledged_real=50.0, usd_goal_real=100.0),
        Row(ID=2, name="B", category="Indie", main_category="Music", currency="USD",
            deadline="2016-02-01", goal=200.0, launched="2016-01-02 12:00:00", pledged=10.0,
            state="failed", backers=1, country="GB", **{"usd pledged": 10.0},
            usd_pledged_real=10.0, usd_goal_real=200.0),
        Row(ID=3, name=None, category="Indie", main_category="Music", currency="USD",
            deadline="2016-03-01", goal=300.0, launched="2016-01-03 00:00:00", pledged=0.0,
            state="canceled", backers=0, country="US", **{"usd pledged": 0.0},
            usd_pledged_real=0.0, usd_goal_real=300.0),
        Row(ID=4, name="D", category="Shorts", main_category="Film", currency="USD",
            deadline="2016-02-10", goal=400.0, launched="2016-01-09 00:00:00", pledged=999.0,
            state="successful", backers=9, country="DE", **{"usd pledged": 999.0},
            usd_pledged_real=999.0, usd_goal_real=400.0),
    ]
    return spark.createDataFrame(rows)


def test_transform_full(spark):
    out = X.transform_kickstarter(raw_rows(spark))
    assert out.columns == X.FINAL_COLUMNS  # P1 fixed order
    data = {r["ID"]: r for r in out.collect()}
    # P3: null-name row dropped (reference removed 4 of 378,661)
    assert set(data) == {1, 2, 4}
    # F2: fractional days — 2016-01-02 12:00 → 2016-02-01 00:00 = 29.5 days
    assert data[2]["duration_days"] == pytest.approx(29.5)
    assert data[1]["duration_days"] == pytest.approx(30.0)
    # F3: success flag 1 iff state='successful'
    assert [data[i]["success_flag"] for i in (1, 2, 4)] == [1, 0, 1]
    # P2: monetary rename
    assert data[4]["pledged_usd"] == 999.0 and data[4]["goal_usd"] == 400.0


def test_weekend_flag_semantics(spark):
    """F8: pandas weekday()>=5 ⇔ Sat/Sun must map to dayofweek ∈ {1,7}."""
    df = spark.createDataFrame(
        [("2016-01-08",), ("2016-01-09",), ("2016-01-10",), ("2016-01-11",)], ["d"]
    )  # Fri, Sat, Sun, Mon
    flags = (
        df.select(
            F.when(F.dayofweek(F.to_date("d")).isin(1, 7), 1).otherwise(0).alias("w"),
            F.date_format(F.to_date("d"), "EEEE").alias("name"),
        )
        .orderBy("d")
        .collect()
    )
    assert [(r["name"], r["w"]) for r in flags] == [
        ("Friday", 0), ("Saturday", 1), ("Sunday", 1), ("Monday", 0),
    ]


def test_star_decomposition(spark):
    star = kickstarter_star(raw_rows(spark))
    # A6: dense keys 1..N in state_name sort order (AUTOINCREMENT-after-sort)
    dim_state = star.dim_state.orderBy("state_key").collect()
    assert [(r["state_key"], r["state_name"], r["is_successful"]) for r in dim_state] == [
        (1, "failed", 0), (2, "successful", 1),
    ]
    dim_cat = star.dim_category.orderBy("category_key").collect()
    assert [(r["category_key"], r["main_category_name"], r["sub_category_name"]) for r in dim_cat] == [
        (1, "Film", "Shorts"), (2, "Music", "Indie"), (3, "Music", "Rock"),
    ]
    # Dim_Date: derived attributes, YYYYMMDD key
    dates = {r["date_key"]: r for r in star.dim_date.collect()}
    assert set(dates) == {20160102, 20160109}
    assert dates[20160109]["day_of_week"] == "Saturday"
    assert dates[20160109]["is_weekend"] == 1
    assert dates[20160102]["is_weekend"] == 1  # 2016-01-02 was a Saturday
    assert dates[20160102]["quarter"] == 1
    # Fact: J1-J3 keys resolved, 9 columns, one row per surviving campaign
    fact = {r["campaign_id"]: r for r in star.fact.collect()}
    assert set(fact) == {1, 2, 4}
    assert fact[1]["state_key"] == 2  # successful
    assert fact[2]["state_key"] == 1  # failed
    assert fact[4]["category_key"] == 1  # Film/Shorts
    assert fact[2]["launched_date_key"] == 20160102
    assert len(star.fact.columns) == 9


def test_state_distribution_and_null_count(spark):
    """A1/A5: inspection operators (reference :78, :300)."""
    raw = raw_rows(spark)
    dist = {r[0]: r["count"] for r in X.state_distribution(raw).collect()}
    assert dist == {"successful": 2, "failed": 1, "canceled": 1}
    assert X.null_count(raw, "name") == 1
