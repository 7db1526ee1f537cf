"""r15 registration: the incremental-BPE round trip
(text_bpe_train_incremental_segment) — the race's table-equality
assertion promoted to a pytest that runs the REGISTERED path (same
corpus, same constants, same trainer call), per the r14 verdict ask #2.
"""

import pyspark.sql.functions as F

SF_DIR = "/root/testdata/sf0.001"


def _registered_words(spark):
    """The exact words frame the registered plan builds (llm_text.
    bpe_train_incremental_segment), minus the spread() that only
    affects partitioning."""
    from counsel_data_pipeline_spark.io.sources import load_table
    from counsel_data_pipeline_spark.ops import text_analysis as ta

    docs = load_table(spark, SF_DIR, "documents")
    scrub = "[\\ue000-\\uf8ff]"
    return docs.select(
        F.explode(
            F.split(
                F.regexp_replace(ta.norm_text(F.col("text")), scrub, ""),
                " ",
            )
        ).alias("word")
    )


def test_incremental_trainer_equals_sequential_on_registered_corpus(spark):
    """The delta-maintained trainer must learn the IDENTICAL merge table
    as the sequential definition on the registered query's own corpus
    and constants (5 merges, pin_every=2 — mid-chain pins plus the
    trailing unpinned window)."""
    from counsel_data_pipeline_spark.ops.text_analysis import (
        bpe_train,
        bpe_train_incremental,
    )
    from counsel_data_pipeline_spark.plans.llm_text import (
        _BPE_INC_MERGES,
        _BPE_INC_PIN_EVERY,
    )

    words = _registered_words(spark)
    seq = bpe_train(words, n_merges=_BPE_INC_MERGES)
    inc = bpe_train_incremental(
        words, n_merges=_BPE_INC_MERGES, pin_every=_BPE_INC_PIN_EVERY
    )
    assert inc == seq
    assert len(inc) == _BPE_INC_MERGES  # corpus is rich enough: no early stop


def test_registered_incremental_round_trip_equals_sequential_round_trip(
    spark,
):
    """Swapping the trainer must not change the registered query's
    OUTPUT either: run the registered plan fn, then recompute the same
    segment+count composition from the sequential trainer's table, and
    compare row sets exactly."""
    from counsel_data_pipeline_spark.catalog import all_queries
    from counsel_data_pipeline_spark.ops import text_analysis as ta
    from counsel_data_pipeline_spark.plans.llm_text import (
        _BPE_INC_MERGES,
        _BPE_TOPK,
    )

    q = all_queries()["text_bpe_train_incremental_segment"]
    got = sorted(
        (r["symbol"], r["n_occurrences"], r["n_words"])
        for r in q.fn(spark, SF_DIR).collect()
    )

    words = _registered_words(spark)
    table = ta.bpe_train(words, n_merges=_BPE_INC_MERGES)
    vocab = words.groupBy("word").agg(F.count(F.lit(1)).alias("wcount"))
    seg = vocab.select(
        "word",
        "wcount",
        F.explode(ta.bpe_segment(F.col("word"), table)).alias("symbol"),
    )
    expect = sorted(
        (r["symbol"], r["n_occurrences"], r["n_words"])
        for r in (
            seg.groupBy("symbol")
            .agg(
                F.sum("wcount").cast("bigint").alias("n_occurrences"),
                F.countDistinct("word").alias("n_words"),
            )
            .orderBy(F.col("n_occurrences").desc(), "symbol")
            .limit(_BPE_TOPK)
            .collect()
        )
    )
    assert got == expect
    # sf0.001's vocabulary yields fewer distinct symbols than the top-k
    # cap; the cap only bounds, never pads
    assert 0 < len(got) <= _BPE_TOPK


def _oracle_segment_counts(vocab_values_sql: str, k: int):
    """Run the round-replaying BPE oracle CTE chain over a literal
    vocabulary in DuckDB and return (symbol, n_occurrences) rows."""
    import duckdb

    from counsel_data_pipeline_spark.plans.llm_text import (
        _bpe_oracle_rounds,
        _bpe_seg_decode_case,
    )

    sql = f"""
    WITH vocab AS (
      SELECT * FROM (VALUES {vocab_values_sql}) AS t(orig, word, wcount)
    ),
    {_bpe_oracle_rounds(k)},
    seg AS (
      SELECT orig, wcount, word, unnest(range(1, length(word) + 1)) AS i
      FROM v{k}
    ),
    sym AS (
      SELECT orig, wcount, {_bpe_seg_decode_case(k)} AS symbol FROM seg
    )
    SELECT symbol, CAST(sum(wcount) AS BIGINT) AS n_occurrences
    FROM sym GROUP BY symbol ORDER BY n_occurrences DESC, symbol
    """
    return duckdb.sql(sql).fetchall()


def test_oracle_early_stop_matches_trainer_on_degenerate_corpora(spark):
    """r14 ADVICE #3 regression pin: when a training round finds no pair
    (vocabulary exhausted before the merge budget), the m{r} scalar
    subquery is empty — replace(word, NULL, ..) used to NULL the whole
    oracle vocabulary and return an EMPTY result while the trainer
    early-stopped and still segmented. The COALESCE-to-unused-PUA fix
    must make the oracle's early stop a fixed point that matches the
    trainer exactly, in both degenerate shapes."""
    from counsel_data_pipeline_spark.ops.text_analysis import (
        bpe_segment,
        bpe_train,
    )

    cases = [
        # dry from round 1: every word shorter than 2 chars
        ("('a','a',3), ('b','b',2)", [("a",), ("a",), ("a",), ("b",), ("b",)]),
        # one merge then dry: 'ab' fully merges in round 1
        ("('ab','ab',5), ('c','c',2)",
         [("ab",)] * 5 + [("c",)] * 2),
    ]
    k = 3
    for values_sql, corpus in cases:
        oracle = _oracle_segment_counts(values_sql, k)
        assert oracle, "oracle must not come back empty on early stop"

        words = spark.createDataFrame(corpus, "word string")
        table = bpe_train(words, n_merges=k)
        vocab = words.groupBy("word").agg(F.count(F.lit(1)).alias("wcount"))
        got = sorted(
            (r["symbol"], r["n"])
            for r in vocab.select(
                "wcount",
                F.explode(bpe_segment(F.col("word"), table)).alias("symbol"),
            )
            .groupBy("symbol")
            .agg(F.sum("wcount").cast("bigint").alias("n"))
            .collect()
        )
        assert got == sorted(oracle)
