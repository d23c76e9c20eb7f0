"""Property test: Spark tokenization == StringTokenizer semantics (G1).

The reference tokenizes with ``java.util.StringTokenizer`` (delimiters
" \\t\\n\\r\\f", never yields empty tokens, keeps case/punctuation —
``TopkCommonWords.java:64``). Hypothesis drives the Spark pipeline with
adversarial strings (delimiter runs, leading/trailing whitespace,
unicode) against a Python reference of those exact semantics.
"""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings, strategies as st

from hadoop_cs4225_spark.operators.wordcount import tokenize

#: StringTokenizer's default delimiter set.
_DELIMS = " \t\n\r\x0c"

_text = st.text(
    alphabet=st.characters(codec="utf-8", exclude_characters="\x00"),
    max_size=60,
)


def _reference_tokens(s: str) -> list[str]:
    """Python model of StringTokenizer: split on delimiter runs, no empties."""
    return [t for t in re.split(f"[{re.escape(_DELIMS)}]+", s) if t]


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(_text, min_size=1, max_size=8))
def test_tokenize_matches_stringtokenizer(spark, texts):
    # The session fixture is a process-wide singleton; reuse across
    # hypothesis examples is intended (hence the suppressed health check).
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, text string"
    )
    got = [
        (r.i, r.word)
        for r in tokenize(df, keep=("i",)).orderBy("i", "word").collect()
    ]
    want = sorted(
        (i, w) for i, t in enumerate(texts) for w in _reference_tokens(t)
    )
    assert sorted(got) == want
