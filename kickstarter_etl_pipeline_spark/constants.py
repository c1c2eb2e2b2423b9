"""Engine-neutral shared constants (ZERO imports, by design).

Both the Spark operators and the DuckDB oracle ledgers consume these —
a single definition site means the two engines can never drift — and
keeping this module import-free keeps the oracle ledgers loadable
without a Spark installation (r7 self-review finding: oracles_lm.py
had started importing a pyspark-heavy operator module mid-file just to
fetch two tuples).
"""

#: Tiny per-language stopword marker lists for the n-gram/stopword
#: language heuristic (operators/text.py) and, via their union, the
#: RAKE phrase delimiters. Real corpora would use larger lists; the
#: operator shape is what matters.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "is"],
    "de": ["der", "die", "das", "und", "ist", "ein"],
    "es": ["el", "la", "los", "de", "que", "es"],
    "fr": ["le", "la", "les", "et", "est", "une"],
}

#: RAKE delimiter set: the union of the marker lists — deliberately
#: shared with the lang-ID heuristic so the two features agree on what
#: a "function word" is.
RAKE_STOPWORDS: tuple[str, ...] = tuple(
    sorted({w for words in LANG_MARKERS.values() for w in words})
)

#: Benford first-digit probabilities log10(1 + 1/d), d = 1..9 — Python
#: float literals shared VERBATIM between the Spark expression tree and
#: the SQL twin (the repo's float-literal contract rule: constants are
#: part of the interface).
BENFORD_P: tuple[float, ...] = (
    0.3010299956639812,
    0.17609125905568124,
    0.12493873660829992,
    0.09691001300805642,
    0.07918124604762482,
    0.06694678963061322,
    0.05799194697768673,
    0.05115252244738129,
    0.04575749056067514,
)
