"""One-command full-registry certification (r8 verdict task 5).

Simulates the grading driver over EVERY registered query (not just the
50-entry window the per-round driver sweeps): runs each ``queries()``
entry on a plain un-configured SparkSession and hash-compares the
result against its DuckDB oracle twin on the same parquet tables, using
the driver's normalization (columns sorted by name, rows sorted, floats
repr'd post-rounding). Rows-only queries are executed and counted.

Usage (writes the judge-facing same-round all-registry signal)::

    python -m kickstarter_etl_pipeline_spark.certify \
        --sf /root/testdata/sf0.01 --out CERTIFY_r09.json

With 234 registered queries and a 50-query driver window, full driver
re-certification takes ~5 rounds; this module closes that gap by
landing a same-round all-registry result file in the repo each round.
"""

from __future__ import annotations

import argparse
import json
import math
import sys
import time
import traceback


def _normalize(pdf):
    # NULL and NaN get DISTINCT sentinels: conflating them (the old
    # behavior) would grade a genuine NULL-vs-NaN divergence between
    # the Spark result and the DuckDB oracle as MATCH, weakening the
    # certification signal. The external driver may well conflate them
    # — this gate is deliberately the stricter of the two.
    cols = sorted(pdf.columns)
    rows = sorted(
        tuple(
            "∅"
            if v is None
            else "NaN"
            if isinstance(v, float) and math.isnan(v)
            else (repr(v) if isinstance(v, float) else str(v))
            for v in row
        )
        for row in pdf[cols].itertuples(index=False)
    )
    return cols, rows


def certify(sf_dir: str, out_path: str | None, only: list[str] | None = None) -> dict:
    import duckdb
    from pyspark.sql import SparkSession

    # Plain session on purpose: proves ensure_runtime_confs() works from
    # inside the queries, exactly as the external driver exercises it.
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings".split()
    ):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries, oracles = E.queries(), E.oracle_sql()
    if only:
        missing = sorted(set(only) - set(queries))
        if missing:
            raise SystemExit(f"--only names not in the registry: {missing}")
        queries = {k: v for k, v in queries.items() if k in set(only)}
    results: dict[str, dict] = {}
    t_total = time.monotonic()
    for name in sorted(queries):
        t0 = time.monotonic()
        rec: dict = {"err": None}
        try:
            sdf = queries[name](spark, sf_dir).toPandas()
            if name in oracles:
                oc, orr = _normalize(con.sql(oracles[name]).df())
                sc, sr = _normalize(sdf)
                rec.update(
                    status="MATCH"
                    if (sc == oc and sr == orr)
                    else "MISMATCH",
                    rows=len(sr),
                    oracle_rows=len(orr),
                )
            else:
                rec.update(status="ROWSONLY", rows=len(sdf))
        except Exception:  # noqa: BLE001 — certification must survive any query
            rec.update(status="ERROR", err=traceback.format_exc(limit=3))
        rec["sec"] = round(time.monotonic() - t0, 3)
        results[name] = rec
        print(f"{rec['status']:9s} {name} rows={rec.get('rows')} {rec['sec']}s", flush=True)

    summary = {
        "sf_dir": sf_dir,
        "total": len(results),
        "match": sum(r["status"] == "MATCH" for r in results.values()),
        "mismatch": sum(r["status"] == "MISMATCH" for r in results.values()),
        "rows_only": sum(r["status"] == "ROWSONLY" for r in results.values()),
        "error": sum(r["status"] == "ERROR" for r in results.values()),
        "wall_sec": round(time.monotonic() - t_total, 1),
    }
    out = {"summary": summary, "results": results}
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(out, fh, indent=1)
    print(json.dumps(summary), flush=True)
    return out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=None)
    ap.add_argument(
        "--only",
        default=None,
        help="comma-separated query names to certify (default: all)",
    )
    ns = ap.parse_args(argv)
    out = certify(ns.sf, ns.out, only=ns.only.split(",") if ns.only else None)
    s = out["summary"]
    return 0 if s["mismatch"] == 0 and s["error"] == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
