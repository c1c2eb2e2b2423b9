"""Round-15 DuckDB oracle twins.

Same contract as every other ledger: each entry is the ANSI-SQL twin
of the identically-named ``queries()`` entry, producing IDENTICAL
column names and bit-identical values under the driver normalization
(columns sorted by name, rows sorted, floats repr'd post-rounding).
"""

from __future__ import annotations

ORACLES_R15: dict[str, str] = {}


# FULL twin of q_bpe_train_merges: the 8 BPE training rounds unrolled
# as a CTE chain. Each round r: p{r} = corpus-frequency-weighted
# adjacent-pair counts over the current symbolization v{r-1};
# b{r} = the 1-row argmax (count DESC, lhs, rhs); v{r} = every word's
# symbol string with the winning merge applied via the SAME
# left-to-right string fold the Spark operator runs (accumulator keeps
# every symbol space-prefixed, so ends_with(acc, ' '||lhs) tests the
# LAST SYMBOL exactly and appending rhs with no space forms the merged
# token; a fresh merge can never re-match lhs because lhs||rhs has no
# internal space — 'a a a' + (a,a) → 'aa a'). m{r} re-derives
# symbols_after from v{r}, so a selection-only replay that skipped the
# application step cannot hash-match. v{r} is MATERIALIZED because it
# feeds both p{r+1} and m{r}'s scalar subquery (device 7).
def _bpe_train_oracle_sql(rounds: int = 8) -> str:
    head = """
    WITH toks AS (
      SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
      FROM documents),
    v0 AS MATERIALIZED (
      SELECT CAST(count(*) AS BIGINT) AS freq,
             trim(regexp_replace(w, '(.)', '\\1 ', 'g')) AS seq
      FROM toks WHERE length(w) >= 2 GROUP BY w)"""
    steps = []
    for r in range(1, rounds + 1):
        steps.append(f""",
    p{r} AS (
      SELECT syms[i] AS lhs, syms[i + 1] AS rhs,
             CAST(sum(freq) AS BIGINT) AS pair_count
      FROM (SELECT freq, string_split(seq, ' ') AS syms FROM v{r - 1}),
           UNNEST(generate_series(1, len(syms) - 1)) AS t(i)
      GROUP BY 1, 2),
    b{r} AS (SELECT lhs, rhs, pair_count FROM p{r}
             ORDER BY pair_count DESC, lhs, rhs LIMIT 1),
    v{r} AS MATERIALIZED (
      SELECT freq,
             ltrim(list_reduce(list_prepend('', string_split(seq, ' ')),
               (acc, s) -> CASE
                 WHEN ends_with(acc, ' ' || b.lhs) AND s = b.rhs
                 THEN acc || b.rhs
                 ELSE acc || ' ' || s END)) AS seq
      FROM v{r - 1}, b{r} b),
    m{r} AS (
      SELECT CAST({r} AS INTEGER) AS merge_rank, lhs, rhs,
             lhs || rhs AS merged, pair_count,
             (SELECT CAST(sum(freq * len(string_split(seq, ' '))) AS BIGINT)
              FROM v{r}) AS symbols_after
      FROM b{r})""")
    tail = (
        "\n    SELECT * FROM ("
        + " UNION ALL ".join(f"SELECT * FROM m{r}" for r in range(1, rounds + 1))
        + ") ORDER BY merge_rank"
    )
    return head + "".join(steps) + tail


ORACLES_R15["bpe_train_merges"] = _bpe_train_oracle_sql()
