"""Round-13 property tests: BPE iteration two (ops/text_analysis.
bpe_second_merge_pair_counts) against a definitional Python model —
greedy left-to-right merge application over symbol sequences, pair
counts weighted by word frequency, distinct-word counts per pair."""

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from counsel_data_pipeline_spark.ops.text_analysis import (
    bpe_second_merge_pair_counts,
    bpe_vocab,
)

# Small alphabet so generated words collide into a real vocabulary with
# repeated words, self-overlapping merges ("aaa"), and a multi-byte char
# to pin char-based (not byte-based) indexing through replace/substring.
_words = st.lists(
    st.text(alphabet="abé1", min_size=1, max_size=6),
    min_size=1,
    max_size=60,
)


def _py_iter2(words):
    vocab = Counter(words)
    occ: Counter = Counter()
    for w, c in vocab.items():
        for i in range(len(w) - 1):
            occ[w[i : i + 2]] += c
    if not occ:
        return None, {}
    merge = min(occ.items(), key=lambda kv: (-kv[1], kv[0]))[0]
    out: Counter = Counter()
    by_word: dict = {}
    for w, c in vocab.items():
        syms = []
        i = 0
        while i < len(w):  # greedy left-to-right, the str.replace order
            if w[i : i + 2] == merge:
                syms.append(merge)
                i += 2
            else:
                syms.append(w[i])
                i += 1
        for j in range(len(syms) - 1):
            key = (syms[j], syms[j + 1])
            out[key] += c
            by_word.setdefault(key, set()).add(w)
    return merge, {k: (n, len(by_word[k])) for k, n in out.items()}


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(words=_words)
def test_bpe_iter2_matches_python(spark, words):
    merge, expect = _py_iter2(words)
    df = spark.createDataFrame([(w,) for w in words], "word string")
    rows = bpe_second_merge_pair_counts(bpe_vocab(df)).collect()
    got = {
        (r["left_sym"], r["right_sym"]): (r["n_occurrences"], r["n_words"])
        for r in rows
    }
    assert got == expect
    if expect:
        assert {r["merge_pair"] for r in rows} == {merge}
