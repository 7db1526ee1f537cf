"""Round-13 property tests: BPE iteration two (ops/text_analysis.
bpe_second_merge_pair_counts) against a definitional Python model —
greedy left-to-right merge application over symbol sequences, pair
counts weighted by word frequency, distinct-word counts per pair."""

from collections import Counter

from pyspark.sql import functions as F

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


# ---------------------------------------------------------------------------
# Full trainer (ops/text_analysis.bpe_train) + tokenizer apply (bpe_segment)
# ---------------------------------------------------------------------------

_MARKER_BASE = 0xE000
_SCRUB = __import__("re").compile("[\ue000-\uf8ff]")


def _py_bpe_train(words, n_merges):
    """Definitional model mirroring the engine's marker encoding, so the
    (count desc, encoded-pair asc) tiebreak compares identically."""
    vocab = Counter(_SCRUB.sub("", w) for w in words)
    enc = {w: w for w in vocab}
    decode = {}
    table = []
    for i in range(n_merges):
        occ = Counter()
        for w, c in vocab.items():
            e = enc[w]
            for j in range(len(e) - 1):
                occ[e[j : j + 2]] += c
        if not occ:
            break
        pair = min(occ.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        marker = chr(_MARKER_BASE + i)
        left = decode.get(pair[0], pair[0])
        right = decode.get(pair[1], pair[1])
        decode[marker] = left + right
        table.append(
            {
                "merge_idx": i,
                "left": left,
                "right": right,
                "merged": left + right,
                "pair_enc": pair,
                "n_occurrences": occ[pair],
            }
        )
        enc = {w: e.replace(pair, marker) for w, e in enc.items()}
    return table, decode


def _py_bpe_segment(word, table):
    e = _SCRUB.sub("", word)
    decode = {}
    for m in table:
        marker = chr(_MARKER_BASE + m["merge_idx"])
        decode[marker] = m["merged"]
        e = e.replace(m["pair_enc"], marker)
    return [decode.get(ch, ch) for ch in e]


def test_bpe_train_planted_sennrich(spark):
    """The classic low/lower/newest/widest corpus: merges are
    ('e','s') at 9 (tiebreak vs 'st'), then ('es','t') at 9, then
    ('l','o') at 7 (tiebreak vs 'ow'); segmenting the UNSEEN word
    'lowest' under that table yields [lo, w, est]."""
    from counsel_data_pipeline_spark.ops.text_analysis import (
        bpe_segment,
        bpe_train,
    )

    corpus = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    words = spark.createDataFrame([(w,) for w in corpus], "word string")
    table = bpe_train(words, n_merges=3)
    assert [(m["left"], m["right"], m["n_occurrences"]) for m in table] == [
        ("e", "s", 9),
        ("es", "t", 9),
        ("l", "o", 7),
    ]
    seg = spark.createDataFrame([("lowest",), ("low",)], "word string").select(
        F.col("word"), bpe_segment(F.col("word"), table).alias("syms")
    )
    got = {r["word"]: r["syms"] for r in seg.collect()}
    assert got["lowest"] == ["lo", "w", "est"]
    assert got["low"] == ["lo", "w"]


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(words=st.lists(
    # include a PUA char to pin the scrub and 'é' to pin char indexing
    st.text(alphabet="ab1\u00e9\ue005", min_size=0, max_size=6),
    min_size=1, max_size=40,
))
def test_bpe_train_and_segment_match_python(spark, words):
    from counsel_data_pipeline_spark.ops.text_analysis import (
        bpe_segment,
        bpe_train,
    )

    expect_table, _ = _py_bpe_train(words, 4)
    df = spark.createDataFrame([(w,) for w in words], "word string")
    table = bpe_train(df, n_merges=4)
    assert table == expect_table
    if not table:
        return
    seg = df.select("word", bpe_segment(F.col("word"), table).alias("syms"))
    for r in seg.collect():
        assert r["syms"] == _py_bpe_segment(r["word"], table), r["word"]


# ---------------------------------------------------------------------------
# Incremental trainer (ops/text_analysis.bpe_train_incremental): must learn
# the EXACT same merge table as the full-re-aggregate form — the delta fold
# (retraction + assertion rows from affected words only) is exact, not
# approximate.
# ---------------------------------------------------------------------------


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(words=st.lists(
    # the alphabet that pins scrub + char indexing, plus repeats ("aaa")
    # whose self-overlapping merges stress the retraction arithmetic
    st.text(alphabet="ab1é", min_size=0, max_size=6),
    min_size=1, max_size=40,
))
def test_bpe_train_incremental_matches_python(spark, words):
    from counsel_data_pipeline_spark.ops.text_analysis import (
        bpe_train_incremental,
    )

    expect_table, _ = _py_bpe_train(words, 4)
    df = spark.createDataFrame([(w,) for w in words], "word string")
    assert bpe_train_incremental(df, n_merges=4) == expect_table


def test_bpe_train_incremental_planted_equals_sequential(spark):
    """Sennrich corpus, 5 merges — past the point where merges consume
    earlier markers (('lo','w') merges marker+raw), so the count deltas
    must retract pairs that straddle freshly-encoded symbols."""
    from counsel_data_pipeline_spark.ops.text_analysis import (
        bpe_train,
        bpe_train_incremental,
    )

    corpus = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    words = spark.createDataFrame([(w,) for w in corpus], "word string")
    seq = bpe_train(words, n_merges=5)
    inc = bpe_train_incremental(words, n_merges=5)
    assert inc == seq
    assert [(m["left"], m["right"], m["n_occurrences"]) for m in seq] == [
        ("e", "s", 9),
        ("es", "t", 9),
        ("l", "o", 7),
        ("lo", "w", 7),
        ("e", "w", 6),
    ]


def test_bpe_train_incremental_exhausts_vocab(spark):
    """Early-stop parity: a vocabulary that fully merges before the
    merge budget is spent must stop at the same table on both forms."""
    from counsel_data_pipeline_spark.ops.text_analysis import (
        bpe_train,
        bpe_train_incremental,
    )

    words = spark.createDataFrame([("ab",), ("ab",), ("a",)], "word string")
    seq = bpe_train(words, n_merges=6)
    inc = bpe_train_incremental(words, n_merges=6)
    assert inc == seq
    assert len(seq) == 1  # ('a','b') then nothing adjacent remains


def test_bpe_train_rejects_nonpositive_pin_every(spark):
    """pin_every=0 plausibly reads as 'never pin'; silently coercing it
    to pin-EVERY-merge would invert the caller's intent, so both
    trainers reject it (r13 ADVICE)."""
    import pytest

    from counsel_data_pipeline_spark.ops.text_analysis import (
        bpe_train,
        bpe_train_incremental,
    )

    words = spark.createDataFrame([("ab",)], "word string")
    with pytest.raises(ValueError, match="pin_every"):
        bpe_train(words, n_merges=2, pin_every=0)
    with pytest.raises(ValueError, match="pin_every"):
        bpe_train_incremental(words, n_merges=2, pin_every=-1)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(words=st.lists(
    st.text(alphabet="ab1é", min_size=0, max_size=6),
    min_size=1, max_size=40,
))
def test_bpe_train_segment_counts_match_python(spark, words):
    """The registered round-trip composition (plans/llm_text.
    text_bpe_train_segment): train 4 merges, segment the vocabulary,
    corpus-weighted symbol counts — against the definitional model. A
    symbol occurring twice in one word counts once per POSITION toward
    n_occurrences but once toward that word's n_words membership."""
    from collections import Counter as C

    from counsel_data_pipeline_spark.ops.text_analysis import (
        bpe_segment,
        bpe_train,
    )

    table_expect, _ = _py_bpe_train(words, 4)
    vocab = C(_SCRUB.sub("", w) for w in words)
    occ, members = C(), {}
    for w, c in vocab.items():
        syms = _py_bpe_segment(w, table_expect)
        for s in syms:
            occ[s] += c
        for s in set(syms):
            members.setdefault(s, set()).add(w)
    expect = {s: (n, len(members[s])) for s, n in occ.items()}

    df = spark.createDataFrame([(w,) for w in words], "word string")
    scrubbed = df.select(
        F.regexp_replace("word", "[\\ue000-\\uf8ff]", "").alias("word")
    )
    table = bpe_train(scrubbed, n_merges=4)
    assert table == table_expect
    seg = (
        scrubbed.groupBy("word")
        .agg(F.count(F.lit(1)).alias("wcount"))
        .select(
            "word", "wcount",
            F.explode(bpe_segment(F.col("word"), table)).alias("symbol"),
        )
    )
    got = {
        r["symbol"]: (r["n"], r["nw"])
        for r in seg.groupBy("symbol")
        .agg(F.sum("wcount").alias("n"), F.countDistinct("word").alias("nw"))
        .collect()
    }
    assert got == expect
