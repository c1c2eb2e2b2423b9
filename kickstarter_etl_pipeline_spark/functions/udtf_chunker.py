"""Python UDTF (user-defined table function, Spark 4) — the row→rows
extension point, demonstrated as a twin of a native operator.

``operators.corpus.chunk_documents`` is the FAST path: explode() +
higher-order expressions, JVM-side, whole-stage codegen. This module
implements the identical sliding-window chunker as a ``@udtf`` so the
engine documents all three extension tiers with the same semantics:

1. native Column expressions (default — always prefer),
2. Arrow-batched pandas (``mapInPandas``, operators/multimodal.py),
3. row-at-a-time Python UDTF (this file — the LAST resort, for logic
   that is genuinely per-row imperative and non-vectorizable).

Equivalence against the native path is asserted row-for-row in
tests/test_udtf_chunker.py, which is the point: when a fast path and
an escape hatch coexist, a test must pin them together or they drift.
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf


@udtf(
    returnType=(
        "doc_id bigint, chunk_id bigint, start_tok bigint, chunk_len bigint, "
        "first_token string, last_token string"
    )
)
class ChunkDocumentUDTF:
    """LATERAL chunk_udtf(doc_id, text, chunk_tokens, stride).

    Mirrors chunk_documents exactly: whitespace tokens of the trimmed
    lowercased text; 1 chunk when the doc fits, else
    1 + ceil_div(n - chunk, stride); per chunk the token span plus
    first/last token witnesses.
    """

    def eval(self, doc_id: int, text: str, chunk_tokens: int, stride: int):
        toks = re.split(r"\s+", (text or "").strip().lower())
        n = len(toks)
        if n <= chunk_tokens:
            n_chunks = 1
        else:
            n_chunks = 1 + (n - chunk_tokens + stride - 1) // stride
        for chunk_id in range(n_chunks):
            start = chunk_id * stride
            chunk_len = min(chunk_tokens, n - start)
            yield (
                doc_id,
                chunk_id,
                start,
                chunk_len,
                toks[start],
                toks[start + chunk_len - 1],
            )


def register(spark) -> None:
    """Register as the SQL table function ``chunk_udtf``."""
    spark.udtf.register("chunk_udtf", ChunkDocumentUDTF)
