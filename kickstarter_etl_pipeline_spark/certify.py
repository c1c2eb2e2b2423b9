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

Sharding (r12, VERDICT r11 task 3 — the sweep is ~330 s at 309 queries
and the registry keeps growing): ``--shard I/N`` certifies every N-th
query of the full sorted registry starting at index I, so N processes
sharing only the parquet inputs (each builds its own SparkSession and
DuckDB connection) cover the registry in ~1/N the wall clock::

    python -m ...certify --shard 0/2 --out /tmp/c0.json &
    python -m ...certify --shard 1/2 --out /tmp/c1.json &
    wait
    python -m ...certify --merge /tmp/c0.json /tmp/c1.json --out CERTIFY.json

``--merge`` unions the shard files into a JSON byte-identical to a
single unsharded run except for the timing fields (per-query ``sec``,
summary ``wall_sec``).

Tier routing (r14, VERDICT r13 task 5): the ~20 streaming entries each
pay a fixed query-startup cost (state store, checkpoint, AvailableNow
run — the two-phase stop/resume queries pay it twice), which inflates
every round-robin batch shard. ``--tier streaming`` runs ONLY the
queries in queries.STREAMING_QUERIES; ``--tier batch`` runs the rest
(and is what ``--shard`` should split). The close-tree recipe::

    python -m ...certify --tier batch --shard 0/2 --out /tmp/b0.json &
    python -m ...certify --tier batch --shard 1/2 --out /tmp/b1.json &
    python -m ...certify --tier streaming --out /tmp/st.json &
    wait
    python -m ...certify --merge /tmp/b0.json /tmp/b1.json /tmp/st.json \
        --out CERTIFY.json

Tiers and shards are disjoint and jointly exhaustive by construction,
so the merge equals an unsharded sweep modulo timings
(tests/test_certify_shard.py pins all of it).
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


def _parse_shard(spec: str) -> tuple[int, int]:
    """Parse ``I/N`` → (I, N), validating 0 <= I < N."""
    try:
        idx, n = (int(p) for p in spec.split("/"))
    except ValueError:
        raise SystemExit(f"--shard must look like I/N, got {spec!r}")
    if not 0 <= idx < n:
        raise SystemExit(f"--shard index out of range: {spec!r}")
    return idx, n


def _shard_names(names: list[str], shard: tuple[int, int] | None) -> list[str]:
    """Deterministic round-robin shard selection over the SORTED name
    list — every process computes the same assignment from the registry
    alone, so shards are disjoint and jointly exhaustive by
    construction."""
    if shard is None:
        return names
    idx, n = shard
    return [name for i, name in enumerate(names) if i % n == idx]


def merge_shards(paths: list[str], out_path: str | None) -> dict:
    """Union shard output files into one result JSON with the exact
    shape of an unsharded run (timing fields excepted): results sorted
    by name, summary counts recomputed from the union, ``wall_sec`` =
    sum of shard walls (the serial-equivalent cost)."""
    shards = [json.load(open(p)) for p in paths]
    sf_dirs = {s["summary"]["sf_dir"] for s in shards}
    if len(sf_dirs) > 1:
        raise SystemExit(f"shards certified different sf dirs: {sorted(sf_dirs)}")
    results: dict[str, dict] = {}
    for s in shards:
        overlap = set(results) & set(s["results"])
        if overlap:
            raise SystemExit(f"duplicate query across shards: {sorted(overlap)[:5]}")
        results.update(s["results"])
    results = dict(sorted(results.items()))
    summary = {
        "sf_dir": sf_dirs.pop(),
        "total": len(results),
        "match": sum(r["status"] == "MATCH" for r in results.values()),
        "mismatch": sum(r["status"] == "MISMATCH" for r in results.values()),
        "rows_only": sum(r["status"] == "ROWSONLY" for r in results.values()),
        "error": sum(r["status"] == "ERROR" for r in results.values()),
        "wall_sec": round(sum(s["summary"]["wall_sec"] for s in shards), 1),
    }
    out = {"summary": summary, "results": results}
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(out, fh, indent=1)
    print(json.dumps(summary), flush=True)
    return out


def certify(
    sf_dir: str,
    out_path: str | None,
    only: list[str] | None = None,
    shard: tuple[int, int] | None = None,
    tier: str = "all",
) -> dict:
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
    if tier != "all":
        from kickstarter_etl_pipeline_spark.queries import STREAMING_QUERIES

        keep = (
            STREAMING_QUERIES
            if tier == "streaming"
            else set(queries) - STREAMING_QUERIES
        )
        queries = {k: v for k, v in queries.items() if k in keep}
    names = _shard_names(sorted(queries), shard)
    results: dict[str, dict] = {}
    t_total = time.monotonic()
    for name in names:
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
    if shard is not None:
        summary["shard"] = f"{shard[0]}/{shard[1]}"
    if tier != "all":
        summary["tier"] = tier
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
    ap.add_argument(
        "--shard",
        default=None,
        help="I/N — certify every N-th sorted registry entry from index I",
    )
    ap.add_argument(
        "--tier",
        choices=("all", "batch", "streaming"),
        default="all",
        help="restrict to the batch or streaming tier (queries.STREAMING_QUERIES)",
    )
    ap.add_argument(
        "--merge",
        nargs="+",
        default=None,
        metavar="SHARD_JSON",
        help="merge shard output files into one unsharded-shaped JSON",
    )
    ns = ap.parse_args(argv)
    if ns.merge:
        if ns.only or ns.shard:
            raise SystemExit("--merge takes only shard files and --out")
        out = merge_shards(ns.merge, ns.out)
    else:
        out = certify(
            ns.sf,
            ns.out,
            only=ns.only.split(",") if ns.only else None,
            shard=_parse_shard(ns.shard) if ns.shard else None,
            tier=ns.tier,
        )
    s = out["summary"]
    return 0 if s["mismatch"] == 0 and s["error"] == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
