"""Scale race for `text_bpe_merge_candidates`: the naive per-token pair
explode (every adjacent character pair of every token OCCURRENCE is
generated and fed to the aggregate — O(corpus chars) explode+hash work)
vs the shipped vocab-first form (`ops/text_analysis.bpe_pair_counts`:
aggregate word→count first, then explode pairs over the VOCABULARY
weighted by count — O(vocab chars), identical totals by distributivity
of the weighted sum). Note the post-combine SHUFFLE is bounded for BOTH
forms (partial aggregation collapses to the pair domain / distinct
(pair, word) partials); the measured win is the explode + combine-hash
work on corpus-sized rows.

Growth model: k corpus copies. Replication grows token occurrences
k-fold while the vocabulary stays FIXED, so the naive form's
explode+combine work grows k-fold while the vocab-first form's pair
stage stays constant (only the word-count aggregate sees more input) —
the separation a real corpus shows, where vocabulary grows sublinearly
(Heaps' law). Results asserted equal at every scale.

  python tools/bpe_scale_race.py [sf_dir] [k]
  # defaults: /root/testdata/sf0.1, k=10
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from counsel_data_pipeline_spark.io.sources import load_table
from counsel_data_pipeline_spark.ops import text_analysis as ta
from counsel_data_pipeline_spark.session import get_spark

_TOPK = 30  # mirror plans/llm_text._BPE_TOPK


def naive_bpe(words: DataFrame) -> DataFrame:
    """The definitional form: explode pairs per token occurrence, count.
    Generates one row per corpus character; the combine-hash sees them
    all, and n_words needs (pair, word) distinct partials besides."""
    pairs = words.filter(F.length("word") >= 2).select(
        "word",
        F.explode(
            F.expr(
                "transform(sequence(1, length(word) - 1), "
                "i -> substring(word, i, 2))"
            )
        ).alias("pair"),
    )
    return pairs.groupBy("pair").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
        F.countDistinct("word").cast("bigint").alias("n_words"),
    )


def _topk(df: DataFrame) -> list:
    return [
        (r["pair"], r["n_occurrences"], r["n_words"])
        for r in df.orderBy(F.col("n_occurrences").desc(), "pair")
        .limit(_TOPK)
        .collect()
    ]


def plan_stats(df: DataFrame) -> tuple[int, int]:
    spark = df.sparkSession
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = df._jdf.queryExecution().explainString(mode)
    return (
        len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M))
        + len(re.findall(r"^\(\d+\) Scan ExistingRDD", plan, re.M))
        + len(re.findall(r"^\(\d+\) InMemoryTableScan", plan, re.M)),
        len(re.findall(r"^\(\d+\) Exchange", plan, re.M)),
    )


def shuffle_bytes(spark) -> int:
    """Cumulative shuffle-write bytes across executors — reported to
    SHOW both forms' post-combine shuffles are equally bounded (the
    separation is explode+hash CPU, not shuffle bytes)."""
    time.sleep(0.5)  # let the status store drain listener events
    store = spark.sparkContext._jsc.sc().statusStore()
    it = store.executorList(False).iterator()
    tot = 0
    while it.hasNext():
        tot += it.next().totalShuffleWrite()
    return tot


def run(spark, words: DataFrame, label: str) -> None:
    n = words.count()

    # warm BOTH plans untimed first: at this query's size codegen/JIT
    # warmup dwarfs the real difference and whichever form runs first
    # eats it (the unwarmed first cut of this race read 'naive faster
    # at 10x'; a warmed A/B/A/B shows vocab-first ~3x faster)
    naive_bpe(words).write.format("noop").mode("overwrite").save()
    ta.bpe_pair_counts(words).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()

    s0 = shuffle_bytes(spark)
    t0 = time.time()
    nr = _topk(naive_bpe(words))
    t_naive = time.time() - t0
    s1 = shuffle_bytes(spark)
    spark.catalog.clearCache()

    t0 = time.time()
    pr = _topk(ta.bpe_pair_counts(words))
    t_prod = time.time() - t0
    s2 = shuffle_bytes(spark)
    spark.catalog.clearCache()

    assert nr == pr, f"BPE forms diverged: {nr[:3]} vs {pr[:3]}"

    ns, ne = plan_stats(naive_bpe(words))
    ps, pe = plan_stats(ta.bpe_pair_counts(words))
    print(
        f"{label}: {n} token occurrences — naive {ns} pass/{ne} exchanges "
        f"({t_naive:.2f}s, {(s1 - s0) / 1e6:.1f} MB shuffled); vocab-first "
        f"{ps} pass/{pe} exchanges ({t_prod:.2f}s, "
        f"{(s2 - s1) / 1e6:.1f} MB shuffled); top-{_TOPK} equal"
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark("bpe-scale-race")
    docs = load_table(spark, sf_dir, "documents").select("text")
    base = docs.select(
        F.explode(F.split(ta.norm_text(F.col("text")), " ")).alias("word")
    )

    run(spark, base, "base corpus")

    big = base
    for _ in range(1, k):
        big = big.unionByName(base)
    # replication grows occurrences k-fold with a FIXED vocabulary — the
    # axis that separates the two forms (real corpora grow vocabulary
    # sublinearly, Heaps' law)
    run(spark, big.persist(), f"{k}x occurrences (fixed vocabulary)")

    print(
        "# both forms' post-combine shuffles are bounded (partial "
        "aggregation); the separation is CPU: the naive form explodes and "
        "combine-hashes one row per corpus character, the vocab-first "
        "form one per vocabulary character, and only its word-count "
        "aggregate (map-side combined) sees the full stream. Measured "
        "~2-3x at 10x occurrences with a fixed vocabulary; real corpora "
        "grow vocabulary sublinearly (Heaps' law), widening it"
    )


if __name__ == "__main__":
    main()
