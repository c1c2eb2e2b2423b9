"""Data-quality checks — the engine's analog of the reference's
warehouse constraints.

The reference relies on SQLite to enforce integrity: PK/UNIQUE on the
dimensions, NOT NULL on the fact name, FKs from fact to dims
(``/root/reference/sql/create_tables.sql:3-4,11,16-17,28-29,40-42``).
Spark enforces none of these, so the engine makes them *checkable*: each
check is one aggregate/anti-join returning a violation count, composable
into a single-pass report. All checks are plain DataFrame ops — at
100 TB each is one scan/shuffle, and the report runs as ONE job when the
counts are combined into a single select.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def count_nulls(df: DataFrame, cols: list[str]) -> Column:
    """Total NULLs across ``cols`` (NOT NULL constraint check)."""
    return sum(
        (F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)) for c in cols),
        F.lit(0),
    ).cast("long")


def duplicate_key_count(df: DataFrame, keys: list[str]) -> DataFrame:
    """Rows beyond the first per key (PK/UNIQUE violation count):
    count(*) − count(distinct keys), computed without a self-join."""
    return df.agg(
        (F.count(F.lit(1)) - F.countDistinct(*[F.col(k) for k in keys]))
        .cast("long")
        .alias("n_duplicate_keys")
    )


def orphan_count(fact: DataFrame, dim: DataFrame, fact_key: str, dim_key: str) -> DataFrame:
    """Fact rows whose FK has no dim match (referential integrity):
    left-anti join, counted. NULL FKs are not orphans (SQL FK
    semantics: NULL passes the constraint)."""
    orphans = (
        fact.filter(F.col(fact_key).isNotNull())
        .join(dim.select(F.col(dim_key).alias(fact_key)), on=fact_key, how="left_anti")
    )
    return orphans.agg(F.count(F.lit(1)).cast("long").alias("n_orphans"))


def quarantine_split(df: DataFrame, rules: dict[str, Column]) -> tuple[DataFrame, DataFrame]:
    """Expectations-style row quarantine: split ``df`` into (clean,
    quarantined) by a dict of named PASS-conditions, tagging each
    quarantined row with the array of rule names it violated — the
    operator behind every "route bad rows to a side table, load the
    rest" pipeline stage.

    One pass, pure codegen: the violation array is built with
    ``when``/``array_compact``, then a size filter splits the stream —
    no join, no shuffle, each side keeps the scan's partitioning.

    Rules must be null-safe (wrap nullable comparisons in
    ``coalesce(cond, lit(False))``): a rule evaluating to NULL would
    silently pass the row, which is never what a quality gate means.
    """
    viol = F.array_compact(
        F.array(*[F.when(~cond, F.lit(name)) for name, cond in rules.items()])
    )
    tagged = df.withColumn("violated_rules", viol)
    clean = tagged.filter(F.size("violated_rules") == 0).drop("violated_rules")
    quarantined = tagged.filter(F.size("violated_rules") > 0)
    return clean, quarantined


def observe_quality(
    df: DataFrame, cols: list[str], name: str = "dq"
):
    """Attach data-quality metrics that ride the EXISTING job — no
    second scan. Every other check in this module (count_nulls,
    duplicate_key_count, orphan_count) is its own aggregate, i.e. its
    own pass over the data; at 100 TB a pipeline cannot afford a
    verification re-read, so production DQ hangs metrics on the write
    job itself. This is Spark's ``Observation`` / ``Dataset.observe``
    device: accumulator-backed aggregates collected as a side effect
    of whatever action the caller runs.

    Returns ``(df_with_observation, observation)``; after ANY action
    on the returned frame (count, write, collect), ``observation.get``
    yields {n_rows, <col>_nulls, <col>_min, <col>_max per metric col}.
    Only accumulator-safe aggregates belong here (count/min/max/sum —
    NOT distinct counts, which need a shuffle of their own).
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        metrics.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}_nulls")
        )
        metrics.append(F.min(c).alias(f"{c}_min"))
        metrics.append(F.max(c).alias(f"{c}_max"))
    return df.observe(obs, *metrics), obs
