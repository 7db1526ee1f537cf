"""Property-based tests (hypothesis) for the round-12 operator: on
ARBITRARY generated word multisets — not just the committed testdata —
the vocab-first BPE pair counting must agree with the direct per-token
Python model (count every adjacent character pair of every token
occurrence), which is the definitional form the vocab aggregation is an
optimization of.
"""

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from counsel_data_pipeline_spark.ops.text_analysis import bpe_pair_counts

# Small alphabet so generated words collide into a real vocabulary with
# repeated words, repeated pairs inside one word ("aaa" → "aa" ×2), and
# multi-byte characters to pin char-based (not byte-based) indexing.
_words = st.lists(
    st.text(alphabet="abcé1", min_size=1, max_size=6),
    min_size=1,
    max_size=60,
)


def py_bpe(words: list[str]) -> dict[str, tuple[int, int]]:
    occ: Counter = Counter()
    by_word: dict[str, set] = {}
    for w in words:
        for i in range(len(w) - 1):
            pair = w[i : i + 2]
            occ[pair] += 1
            by_word.setdefault(pair, set()).add(w)
    return {p: (n, len(by_word[p])) for p, n in occ.items()}


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(words=_words)
def test_bpe_pair_counts_match_python(spark, words):
    df = spark.createDataFrame([(w,) for w in words], "word string")
    got = {
        r["pair"]: (r["n_occurrences"], r["n_words"])
        for r in bpe_pair_counts(df).collect()
    }
    assert got == py_bpe(words)
