"""UDTF chunker (functions/udtf_chunker.py) must be row-identical to
the native chunk_documents operator — the escape hatch and the fast
path are pinned together so they can't drift."""

from __future__ import annotations

from kickstarter_etl_pipeline_spark.functions.udtf_chunker import register
from kickstarter_etl_pipeline_spark.operators.corpus import chunk_documents
from kickstarter_etl_pipeline_spark.sources.readers import load_table
from tests.conftest import SF_SMOKE


def test_udtf_matches_native_chunker(spark):
    register(spark)
    docs = load_table(spark, SF_SMOKE, "documents")
    docs.createOrReplaceTempView("_udtf_docs")

    native = chunk_documents(docs, chunk_tokens=64, stride=48).collect()
    via_udtf = spark.sql(
        """
        SELECT c.* FROM _udtf_docs,
        LATERAL chunk_udtf(doc_id, text, 64, 48) c
        """
    ).collect()

    key = lambda r: (r.doc_id, r.chunk_id)
    assert sorted(native, key=key) == sorted(via_udtf, key=key)
    assert len(native) > len(docs.collect())  # multi-chunk docs exist
