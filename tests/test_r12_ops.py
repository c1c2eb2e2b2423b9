"""Round-12 continuation operators: synthetic-fixture reference tests.

The driver's oracle gate proves cross-engine equality on the TPC-H-ish
fixtures; these tests prove the DEVICES against independent pure-Python
replays on synthetic data the fixtures don't cover (different series
lengths, different vocabularies), so a fixture-shaped coincidence
cannot hide a recurrence or greedy-trajectory bug.
"""

from __future__ import annotations

import datetime
import math
import re

from pyspark.sql import functions as F


def _lcg(seed: int):
    s = seed
    while True:
        s = (s * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        yield s


def _tdiv(a: int, k: int) -> int:
    """Truncating integer division (toward zero), matching Spark's
    (a − a % k) decimal divide and DuckDB's ``//``."""
    q = abs(a) // k
    return q if a >= 0 else -q


def _round_det(x: float, k: int) -> float:
    scale = 10**k
    return math.floor(x * scale + 0.5) / float(scale)


def test_holt_matches_python_reference(spark, tmp_path):
    """q_holt_linear_forecast on a synthetic orders table equals the
    pure-Python integer recurrence — series lengths and values far
    from the fixture shape (two priorities, 37/23 days, adversarial
    price noise including days that force negative trend)."""
    from kickstarter_etl_pipeline_spark.operators.timeseries_queries import (
        q_holt_linear_forecast,
    )

    rng = _lcg(7)
    rows = []
    series: dict[str, dict[datetime.date, int]] = {}
    for pri, n_days in (("A-FAST", 37), ("B-SLOW", 23)):
        daily = {}
        for d in range(n_days):
            day = datetime.date(1997, 1, 1) + datetime.timedelta(days=d)
            cents = 0
            for _ in range(1 + next(rng) % 3):
                c = 100 + next(rng) % 900_000  # 1.00 .. 9000.99 dollars
                cents += c
                rows.append(
                    (
                        len(rows) + 1,
                        datetime.datetime(day.year, day.month, day.day),
                        c / 100.0,
                        pri,
                    )
                )
            daily[day] = cents
        series[pri] = daily
    sdf = spark.createDataFrame(
        rows, ["o_orderkey", "o_orderdate", "o_totalprice", "o_orderpriority"]
    )
    path = str(tmp_path)
    sdf.write.mode("overwrite").parquet(path + "/orders.parquet")

    expect = {}
    for pri, daily in series.items():
        ys = [daily[d] * 10_000 for d in sorted(daily)]  # cents → micros
        l, b, sae = ys[0], 0, 0
        for y in ys[1:]:
            pred = l + b
            sae += abs(y - pred)
            l2 = _tdiv(3 * y + 7 * pred, 10)
            b = _tdiv(l2 - l + 9 * b, 10)
            l = l2
        n = len(ys)
        expect[pri] = (
            n,
            _round_det(l / 1_000_000.0, 6),
            _round_det(b / 1_000_000.0, 6),
            _round_det((l + 7 * b) / 1_000_000.0, 6),
            _round_det(sae / float(n - 1) / 1_000_000.0, 6),
        )
    got = {
        r["o_orderpriority"]: (
            r["n_days"],
            r["level"],
            r["trend"],
            r["forecast_7d"],
            r["mae_one_step"],
        )
        for r in q_holt_linear_forecast(spark, path).collect()
    }
    assert got == expect


def test_greedy_max_coverage_matches_python_reference(spark, tmp_path):
    """greedy_max_coverage via q_coverage_selection_report on a
    synthetic corpus equals the pure-Python Nemhauser greedy over the
    same 5-gram shingle universe, including ties broken to the
    smallest doc id and the running covered totals."""
    from kickstarter_etl_pipeline_spark.operators.corpus_queries import (
        q_coverage_selection_report,
    )

    rng = _lcg(13)
    vocab = [f"w{i:02d}" for i in range(17)]
    docs = []
    for doc_id in range(1, 31):
        n_words = 6 + next(rng) % 10
        words = [vocab[next(rng) % len(vocab)] for _ in range(n_words)]
        docs.append((doc_id, " ".join(words), "en", "synthetic", n_words))
    sdf = spark.createDataFrame(
        docs, ["doc_id", "text", "lang", "source", "n_chars"]
    )
    path = str(tmp_path)
    sdf.write.mode("overwrite").parquet(path + "/documents.parquet")

    def shingles(text: str) -> set:
        toks = re.split(r"\s+", text.lower().strip())
        return {
            " ".join(toks[i : i + 5]) for i in range(len(toks) - 4)
        } if len(toks) >= 5 else set()

    universe = {d: shingles(t) for d, t, *_ in docs}
    covered: set = set()
    expect = []
    for step in range(1, 9):
        best_doc, best_gain = None, -1
        for d in sorted(universe):
            g = len(universe[d] - covered)
            if g > best_gain:
                best_doc, best_gain = d, g
        if best_gain == 0:
            # saturation: the engine emits no row once every shingle is
            # covered (the gain table is empty), so the reference stops
            # at zero remaining gain too — fewer than k rows is the
            # documented output contract.
            break
        covered |= universe[best_doc]
        expect.append((step, best_doc, best_gain, len(covered)))
    got = sorted(
        (r["step"], r["doc_id"], r["marginal_gain"], r["covered_total"])
        for r in q_coverage_selection_report(spark, path).collect()
    )
    assert got == expect


def test_truncating_decimal_divide_matches_python_everywhere(spark):
    """The (a − a % k) decimal-divide device (Holt/HW/Croston folds)
    must equal Python's toward-zero integer division for any long —
    including negatives and magnitudes far beyond double's 2^53 exact
    range, which is the whole reason the division routes through
    decimal(38,0). Vectorized property check over adversarial and
    LCG-generated operands."""
    from pyspark.sql import functions as F

    vals = [0, 1, -1, 9, -9, 10, -10, 11, -11, 2**62, -(2**62), 2**62 + 7,
            -(2**62) - 7, 123456789012345678, -123456789012345678]
    rng = _lcg(99)
    for _ in range(200):
        v = next(rng) % (2**63)
        vals.append(v - 2**62)
    df = spark.createDataFrame([(v,) for v in vals], ["a"])

    def td(col, k):
        return ((col - col % k).cast("decimal(38,0)") / F.lit(k)).cast("long")

    rows = df.select(
        "a", td(F.col("a"), 5).alias("d5"), td(F.col("a"), 10).alias("d10")
    ).collect()

    def pytrunc(a, k):
        q = abs(a) // k
        return q if a >= 0 else -q

    for r in rows:
        assert r["d5"] == pytrunc(r["a"], 5), (r["a"], r["d5"])
        assert r["d10"] == pytrunc(r["a"], 10), (r["a"], r["d10"])
