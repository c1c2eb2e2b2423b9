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


#: Fellegi-Sunter record-linkage pattern scores (round 10). Four
#: comparison fields over blocked part-name pairs, in bit order:
#: [name-edit-distance ≤ 2, brand equal, type equal, |size diff| ≤ 1].
#: Per-field (m, u) probabilities — m = P(agree | match), u =
#: P(agree | non-match) — are the engineering estimates
#: [(0.9, 0.05), (0.95, 0.04), (0.9, 0.013), (0.85, 0.06)]; the score
#: of a pattern is Σ log2(m/u) over agreeing fields plus
#: Σ log2((1−m)/(1−u)) over disagreeing ones, PRECOMPUTED here to 6 dp
#: so both engines consume identical literals and no cross-engine
#: transcendental is ever evaluated (the Benford/bootstrap literal
#: device). Decision thresholds: score ≥ 4 → MATCH, ≥ 0 → POSSIBLE,
#: else NON_MATCH.
FS_PATTERN_SCORES: dict[str, float] = {
    "0000": -13.46171,
    "0001": -6.989584,
    "0010": -4.045319,
    "0011": 2.426808,
    "0100": -4.62882,
    "0101": 1.843306,
    "0110": 4.787571,
    "0111": 11.259698,
    "1000": -6.043858,
    "1001": 0.428269,
    "1010": 3.372534,
    "1011": 9.844661,
    "1100": 2.789032,
    "1101": 9.261159,
    "1110": 12.205424,
    "1111": 18.677551,
}
