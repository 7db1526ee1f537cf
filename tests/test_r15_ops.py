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
