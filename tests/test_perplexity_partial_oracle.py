"""Partial DuckDB oracle for the perplexity proxy.

`perplexity_proxy` is rows-only in the driver because ln/exp are not
bit-deterministic across engines (the registry's determinism rule) —
but the MODEL is fully checkable: DuckDB recomputes the same corpus
unigram LM and per-doc mean surprisal, and every value must agree to
float tolerance, with token counts matching exactly.
"""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as ENTRY

SQL = r"""
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
  FROM documents
),
lm AS (SELECT token, count(*) AS tf FROM tok GROUP BY token),
total AS (SELECT sum(tf)::DOUBLE AS n FROM lm),
scored AS (
  SELECT t.doc_id, -ln(lm.tf / total.n) AS surprisal
  FROM tok t JOIN lm USING (token), total
)
SELECT doc_id, count(*) AS n_tokens,
       avg(surprisal) AS mean_surprisal, exp(avg(surprisal)) AS ppl
FROM scored GROUP BY doc_id
"""


def test_perplexity_matches_duckdb_model(spark, sf_dir):
    got = {r["doc_id"]: r for r in ENTRY.queries()["perplexity_proxy"](spark, sf_dir).collect()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    exp = {int(d): (int(n), s, p) for d, n, s, p in con.sql(SQL).fetchall()}
    assert set(got) == set(exp)
    for doc_id, (n, s, p) in exp.items():
        r = got[doc_id]
        assert r["n_tokens"] == n, f"doc {doc_id} token count"
        # Spark rounds to 4/2 dp; DuckDB raw — agree within the rounding
        # step plus float slack.
        assert math.isclose(r["mean_surprisal_nats"], s, abs_tol=5.1e-5), (doc_id, r, s)
        assert math.isclose(r["ppl_proxy"], p, abs_tol=5.1e-3), (doc_id, r, p)
