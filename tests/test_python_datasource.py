"""Python Data Source API connector (sources/python_datasource.py).

The oracle-level proof is ``jsonl_pyds_roundtrip_agg`` (driver-graded);
these tests pin the connector's mechanical contracts: per-file partition
planning, schema pruning/reorder, and the absent-key→NULL evolution rule.
"""

from __future__ import annotations

import json
import os

import pytest

from kickstarter_etl_pipeline_spark.scratch import run_scratch_dir
from kickstarter_etl_pipeline_spark.sources.python_datasource import (
    JsonLinesDataSource,
    register,
)


@pytest.fixture(scope="module")
def jsonl_dir() -> str:
    path = run_scratch_dir("pyds_unit_")
    rows = [
        {"doc_id": 1, "text": "a\nb", "extra": "ignored"},
        {"doc_id": 2, "text": "c"},
        {"doc_id": 3},  # absent text -> NULL
    ]
    # Three files so the planner must emit three partitions.
    for i, row in enumerate(rows):
        with open(os.path.join(path, f"part-{i}.json"), "w") as f:
            f.write(json.dumps(row) + "\n")
    return path


def test_per_file_partitions_and_rows(spark, jsonl_dir):
    register(spark)
    df = spark.read.format("pyjsonl").schema("doc_id bigint, text string").load(jsonl_dir)
    assert df.rdd.getNumPartitions() == 3
    rows = {r.doc_id: r.text for r in df.collect()}
    # JSON-escaped newline survives; absent key is NULL, extra key pruned.
    assert rows == {1: "a\nb", 2: "c", 3: None}
    assert df.columns == ["doc_id", "text"]


def test_missing_declared_column_is_null(spark, jsonl_dir):
    register(spark)
    df = (
        spark.read.format("pyjsonl")
        .schema("doc_id bigint, nonexistent string")
        .load(jsonl_dir)
    )
    assert [r.nonexistent for r in df.collect()] == [None, None, None]


def test_default_schema_matches_documents_layout(spark, jsonl_dir):
    register(spark)
    df = spark.read.format("pyjsonl").load(jsonl_dir)
    assert df.columns == ["doc_id", "text", "lang", "source", "n_chars"]


def test_source_name():
    assert JsonLinesDataSource.name() == "pyjsonl"
